"""S1/S2 — ZIP-of-CSVs source (reference modules/extract.py:22-170).

The reference loops ZIPs single-threaded: open archive, read each
``*.csv`` member with pandas, rewrite to disk, delete the archive.
Spark reads ``.csv.gz`` natively but not ``.zip``, so the rebuild is:

    binaryFile scan (one row per archive) → mapInPandas unzip+parse →
    one output row per CSV record

which distributes per-ARCHIVE: each task decompresses whole archives,
so parallelism = number of zips (the reference's 24 hourly files → 24
tasks). For huge single archives you'd re-shard upstream; web-scale
inputs are many small archives (Common Crawl WARCs), which is exactly
this shape.

Error isolation mirrors extract_all_zips (modules/extract.py:147-161):
a corrupt archive or non-CSV member yields an error row (zip path +
message) instead of failing the job; callers split good/bad on
``_error``.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# Reference stage-1 columns (scripts/genarate_logs.py header).
SYSLOG_COLUMNS = [
    "Timestamp", "Hostname", "AppName", "SeverityLevel", "Severity", "LogType", "Message",
]


def extract_zip_csvs(
    spark: SparkSession,
    zip_glob: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed S1/S2: every ``*.csv`` member of every matched ZIP →
    rows. Output = member columns + lineage (``src_zip``, ``src_member``)
    + ``_error`` ('' when clean).

    All member fields are read as strings with ``keep_default_na=False``
    — the reference's exact read convention (modules/split_ip.py:70):
    empty stays ``""``, never NaN/null.
    """
    cols = columns or SYSLOG_COLUMNS

    schema = (
        ", ".join(f"`{c}` string" for c in cols)
        + ", src_zip string, src_member string, _error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = {c: pd.Series(dtype=object) for c in cols}

        def err_frame(zpath: str, member: str, msg: str) -> pd.DataFrame:
            out = pd.DataFrame({c: [""] for c in cols})
            out["src_zip"] = zpath
            out["src_member"] = member
            out["_error"] = msg
            return out

        for pdf in batches:
            for zpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(blob))
                    members = [n for n in zf.namelist() if n.lower().endswith(".csv")]
                    if not members:
                        yield err_frame(zpath, "", "no csv members")
                        continue
                except zipfile.BadZipFile as e:
                    yield err_frame(zpath, "", f"bad zip: {e}")
                    continue
                for name in sorted(members):
                    try:
                        raw = zf.read(name)
                        df = pd.read_csv(
                            io.BytesIO(raw), dtype=str, keep_default_na=False
                        )
                        missing = [c for c in cols if c not in df.columns]
                        if missing:
                            yield err_frame(zpath, name, f"missing columns: {missing}")
                            continue
                        out = df[cols].copy()
                    except Exception as e:  # noqa: BLE001 - per-member isolation
                        yield err_frame(zpath, name, str(e))
                        continue
                    out["src_zip"] = zpath
                    out["src_member"] = name
                    out["_error"] = ""
                    yield out
        # typed empty frame keeps the schema when a partition has no zips
        yield pd.DataFrame({**empty, "src_zip": pd.Series(dtype=object),
                            "src_member": pd.Series(dtype=object),
                            "_error": pd.Series(dtype=object)})

    src = spark.read.format("binaryFile").option("pathGlobFilter", "*.zip").load(zip_glob)
    return src.select("path", "content").mapInPandas(run, schema=schema)
