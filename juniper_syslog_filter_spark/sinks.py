"""Sinks — S3 (CSV), S4 (styled xlsx), and the partitioned-parquet
fan-out the north rule's route stage uses.

S4 caveat: xlsxwriter/openpyxl are absent in this sandbox, so the Excel
sink is import-gated; without the lib it degrades to CSV next to a
``.xlsx.MISSING`` marker rather than failing a 6-hour job for the last
mile. The formatting spec (bold header, font, per-column width =
clamp(max len, 10, 50) ×1.5 when non-ASCII) replicates
modules/export_excel.py:81-118 and runs driver-side over ≤800k-row
chunks — the same Excel-limit chunking the reference enforces
(merge_files.py:96-111).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

try:  # pragma: no cover - sandbox has no xlsxwriter
    import xlsxwriter  # type: ignore  # noqa: F401

    HAVE_XLSXWRITER = True
except ImportError:
    HAVE_XLSXWRITER = False

MAX_XLSX_ROWS = 800_000  # Excel 1,048,576-row headroom (run.py:129)


def write_stage_csv(df: DataFrame, path: str, max_records_per_file: int = MAX_XLSX_ROWS) -> None:
    """S3: header CSV, utf-8, '' for null (to_csv(index=False, na_rep='')
    twin — modules/extract_routing.py:101)."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("emptyValue", "")
        .option("nullValue", "")
        .option("maxRecordsPerFile", max_records_per_file)
        .csv(path)
    )


def write_routed_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = MAX_XLSX_ROWS,
) -> None:
    """The primary fan-out sink: one partitioned write, never N filtered
    re-scans (pipeline.py uses this shape with batch-keyed overwrite)."""
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def _col_width(values: list[str], header: str) -> float:
    """modules/export_excel.py:102-118: width = clamp(maxlen, 10, 50),
    ×1.5 if any non-ASCII content."""
    lens = [len(header)] + [len(v) for v in values]
    width = float(min(50, max(10, max(lens))))
    if any(ord(ch) > 127 for v in [header, *values] for ch in v):
        width *= 1.5
    return width


def export_xlsx(
    df: DataFrame,
    output_dir: str,
    base_name: str = "final",
    font_name: str = "Yu Gothic",
    font_size: int = 11,
) -> list[str]:
    """S4: final small result → styled .xlsx chunks (driver-side; the
    input MUST already be the post-filter tail of the pipeline, which
    the reference also assumes).

    Returns written paths. Without xlsxwriter: writes CSV fallback plus
    a ``.xlsx.MISSING`` marker so operators notice.
    """
    os.makedirs(output_dir, exist_ok=True)
    # fillna BEFORE astype: astype(str) alone would stringify nulls as
    # "None"/"nan", violating the ''-for-null convention this sink
    # replicates (reference na_rep='', modules/export_excel.py).
    pdf = df.toPandas()
    pdf = pdf.astype(object).where(pdf.notna(), "").astype(str)
    chunks = [
        pdf.iloc[i : i + MAX_XLSX_ROWS] for i in range(0, max(len(pdf), 1), MAX_XLSX_ROWS)
    ]
    written: list[str] = []
    for idx, chunk in enumerate(chunks):
        stem = f"{base_name}_{idx:03d}"
        if not HAVE_XLSXWRITER:
            csv_path = os.path.join(output_dir, f"{stem}.csv")
            chunk.to_csv(csv_path, index=False, encoding="utf-8")
            marker = os.path.join(output_dir, f"{stem}.xlsx.MISSING")
            with open(marker, "w", encoding="utf-8") as fh:
                fh.write("xlsxwriter not installed; CSV fallback written\n")
            written.append(csv_path)
            continue
        import xlsxwriter  # type: ignore

        xlsx_path = os.path.join(output_dir, f"{stem}.xlsx")
        book = xlsxwriter.Workbook(xlsx_path)
        sheet = book.add_worksheet("logs")
        header_fmt = book.add_format(
            {"bold": True, "font_name": font_name, "font_size": font_size}
        )
        body_fmt = book.add_format({"font_name": font_name, "font_size": font_size})
        for c, name in enumerate(chunk.columns):
            vals = chunk[name].tolist()
            sheet.set_column(c, c, _col_width(vals, name))
            sheet.write(0, c, name, header_fmt)
            for r, v in enumerate(vals, start=1):
                sheet.write(r, c, v, body_fmt)
        book.close()
        written.append(xlsx_path)
    return written
