"""Unit tests for the stdlib OOXML writer (S4) — package validity,
width rule parity with modules/export_excel.py:102-118, escaping."""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET

from juniper_syslog_filter_spark.xlsx import (
    col_letter,
    column_width,
    read_xlsx_rows,
    read_xlsx_styles,
    write_xlsx,
)


def test_col_letter():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_column_width_reference_rule():
    # export_excel.py:102-118: min(max(maxlen + 2, 10), 50)
    assert column_width("AB", ["x"]) == 10  # short → min clamp
    assert column_width("H", ["x" * 20]) == 22  # maxlen 20 + 2
    assert column_width("H" * 30, ["x"]) == 32  # header counts for maxlen
    assert column_width("H", ["x" * 200]) == 50  # max clamp
    # non-ASCII in DATA → ×1.5 (int-truncated) BEFORE +2
    assert column_width("H", ["あいう" * 3]) == int(9 * 1.5) + 2
    # non-ASCII only in the header does NOT trigger ×1.5 (reference
    # checks df[col] only)
    assert column_width("ヘッダ", ["x"]) == 10
    assert column_width("H", []) == 10


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.xlsx")
    cols = ["A", "B"]
    rows = [["x", "1"], ["", "two words"], [" lead", "trail "]]
    write_xlsx(p, cols, rows)
    header, got = read_xlsx_rows(p)
    assert header == cols
    assert got == rows  # '' and whitespace preserved exactly


def test_xml_escaping(tmp_path):
    p = str(tmp_path / "esc.xlsx")
    rows = [["<b>&'\"</b>", "a\tb"]]
    write_xlsx(p, ["X<&>", "Y"], rows)
    header, got = read_xlsx_rows(p)
    assert header[0] == "X<&>"
    assert got == rows


def test_package_structure_valid(tmp_path):
    """Every part is well-formed XML and the mandatory parts exist —
    what any OOXML consumer (Excel, openpyxl) requires to open it."""
    p = str(tmp_path / "s.xlsx")
    write_xlsx(p, ["A"], [["v"]], sheet_name="logs")
    with zipfile.ZipFile(p) as zf:
        names = set(zf.namelist())
        assert {
            "[Content_Types].xml",
            "_rels/.rels",
            "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/styles.xml",
            "xl/worksheets/sheet1.xml",
        } <= names
        for n in names:
            ET.fromstring(zf.read(n))  # raises on malformed XML
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        sheet = wb.find(f"{ns}sheets/{ns}sheet")
        assert sheet.get("name") == "logs"


def test_styles_fonts(tmp_path):
    p = str(tmp_path / "f.xlsx")
    write_xlsx(p, ["A"], [["v"]], font_name="游ゴシック", font_size=12)
    st = read_xlsx_styles(p)
    assert st["fonts"] == [
        {"name": "游ゴシック", "size": 12.0, "bold": False},
        {"name": "游ゴシック", "size": 12.0, "bold": True},
    ]
    assert st["cell_fonts"][0][0]["bold"] is True  # header
    assert st["cell_fonts"][1][0]["bold"] is False  # body
