"""Minimal dependency-free .xlsx writer (stdlib ``zipfile`` + hand-built
OOXML parts) for the S4 last-mile Excel sink.

An .xlsx file is a ZIP of XML parts; this module emits the five
mandatory ones (content types, package rels, workbook, workbook rels,
styles) plus one worksheet with inline strings — no sharedStrings table
needed for a write-once export. The formatting contract replicates the
reference exactly (modules/export_excel.py:88-118):

* header row bold, body rows plain, both in ``font_name``/``font_size``
  (reference default 游ゴシック 11pt);
* per-column width = ``min(max(maxlen + 2, 10), 50)`` where ``maxlen``
  is the max cell length over header+data, multiplied by 1.5 first when
  the DATA contains any non-ASCII character (the reference checks
  ``df[col]`` only, not the header — export_excel.py:113).

Asserts ported from the reference's tests
(tests/test_export_excel.py:32-101) run against this writer via the
:func:`read_xlsx_rows` / :func:`read_xlsx_styles` inspection helpers
(openpyxl is absent in this sandbox, so tests parse the XML parts
directly — strictly stronger than openpyxl's view of the same bytes).

Scale note: this is a driver-side formatter for the post-filter tail of
the pipeline (≤800k rows per file, the reference's Excel-limit chunking
— merge_files.py:96-111). The distributed sinks are the parquet/CSV
fan-out in :mod:`sinks`.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

MIN_WIDTH = 10
MAX_WIDTH = 50

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_DOC_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"

_CONTENT_TYPES = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="{_NS_CT}">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_NS_PKG_REL}">
<Relationship Id="rId1" Type="{_NS_DOC_REL}/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_NS_PKG_REL}">
<Relationship Id="rId1" Type="{_NS_DOC_REL}/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="{_NS_DOC_REL}/styles" Target="styles.xml"/>
</Relationships>"""


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_DOC_REL}">'
        f'<sheets><sheet name="{escape(sheet_name, {chr(34): "&quot;"})}" '
        'sheetId="1" r:id="rId1"/></sheets></workbook>'
    )


def _styles_xml(font_name: str, font_size: int) -> str:
    """Two cell formats: style 0 = body font, style 1 = bold header —
    the two xlsxwriter formats at export_excel.py:88-95."""
    name = escape(font_name, {'"': "&quot;"})
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<styleSheet xmlns="{_NS_MAIN}">'
        '<fonts count="2">'
        f'<font><sz val="{font_size}"/><name val="{name}"/></font>'
        f'<font><b/><sz val="{font_size}"/><name val="{name}"/></font>'
        "</fonts>"
        '<fills count="2"><fill><patternFill patternType="none"/></fill>'
        '<fill><patternFill patternType="gray125"/></fill></fills>'
        '<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>'
        '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>'
        '<cellXfs count="2">'
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0" applyFont="1"/>'
        '<xf numFmtId="0" fontId="1" fillId="0" borderId="0" xfId="0" applyFont="1"/>'
        "</cellXfs>"
        "</styleSheet>"
    )


def col_letter(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


_NON_ASCII = re.compile("[^\x00-\x7f]")


def column_width(header: str, values: list[str]) -> int:
    """Reference width rule, export_excel.py:102-118: maxlen over
    header+data, ×1.5 (int-truncated) when the DATA has non-ASCII,
    then +2 padding clamped to [10, 50]."""
    column_len = max([len(header)] + [len(v) for v in values]) if values else len(header)
    if any(_NON_ASCII.search(v) for v in values):
        column_len = int(column_len * 1.5)
    return min(max(column_len + 2, MIN_WIDTH), MAX_WIDTH)


def _cell(ref: str, text: str, style: int) -> str:
    sp = ' xml:space="preserve"' if text != text.strip() else ""
    return (
        f'<c r="{ref}" s="{style}" t="inlineStr">'
        f"<is><t{sp}>{escape(text)}</t></is></c>"
    )


def write_xlsx(
    path: str,
    columns: list[str],
    rows: list[list[str]],
    sheet_name: str = "Sheet1",
    font_name: str = "Yu Gothic",
    font_size: int = 11,
) -> str:
    """Write ``columns`` + string ``rows`` to ``path`` as a styled .xlsx.

    All values are emitted as inline strings — the reference pipeline's
    columns are all-string by contract (SURVEY §1.2), so no numeric
    cell types are needed.
    """
    n_cols = len(columns)
    cols_xml = []
    for c in range(n_cols):
        w = column_width(columns[c], [r[c] for r in rows])
        cols_xml.append(
            f'<col min="{c + 1}" max="{c + 1}" width="{w}" customWidth="1"/>'
        )

    body = ['<row r="1">']
    body.extend(_cell(f"{col_letter(c)}1", columns[c], 1) for c in range(n_cols))
    body.append("</row>")
    for r, row in enumerate(rows, start=2):
        body.append(f'<row r="{r}">')
        body.extend(
            _cell(f"{col_letter(c)}{r}", row[c], 0) for c in range(n_cols)
        )
        body.append("</row>")

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<worksheet xmlns="{_NS_MAIN}">'
        f"<cols>{''.join(cols_xml)}</cols>"
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/styles.xml", _styles_xml(font_name, font_size))
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path


# ---------------------------------------------------------------------------
# Inspection helpers (the test-side twin of openpyxl.load_workbook)
# ---------------------------------------------------------------------------


def read_xlsx_rows(path: str) -> tuple[list[str], list[list[str]]]:
    """(header, data rows) from sheet1 — inline and shared strings."""
    m = f"{{{_NS_MAIN}}}"
    with zipfile.ZipFile(path) as zf:
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    rows: list[list[str]] = []
    for row in sheet.iter(f"{m}row"):
        vals = []
        for c in row.iter(f"{m}c"):
            t = c.find(f"{m}is/{m}t")
            vals.append(t.text or "" if t is not None else "")
        rows.append(vals)
    if not rows:
        return [], []
    return rows[0], rows[1:]


def read_xlsx_styles(path: str) -> dict:
    """Formatting facts the reference tests assert
    (tests/test_export_excel.py:52-101): per-font (name, size, bold),
    the style index of every cell by row, and per-column widths."""
    m = f"{{{_NS_MAIN}}}"
    with zipfile.ZipFile(path) as zf:
        styles = ET.fromstring(zf.read("xl/styles.xml"))
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))

    fonts = []
    for f in styles.find(f"{m}fonts").iter(f"{m}font"):
        fonts.append(
            {
                "name": f.find(f"{m}name").get("val"),
                "size": float(f.find(f"{m}sz").get("val")),
                "bold": f.find(f"{m}b") is not None,
            }
        )
    xf_font = [
        int(xf.get("fontId", "0"))
        for xf in styles.find(f"{m}cellXfs").iter(f"{m}xf")
    ]
    cell_fonts: list[list[dict]] = []
    for row in sheet.iter(f"{m}row"):
        cell_fonts.append(
            [fonts[xf_font[int(c.get("s", "0"))]] for c in row.iter(f"{m}c")]
        )
    widths = {
        int(col.get("min")): float(col.get("width"))
        for col in sheet.iter(f"{m}col")
    }
    return {"fonts": fonts, "cell_fonts": cell_fonts, "col_widths": widths}
