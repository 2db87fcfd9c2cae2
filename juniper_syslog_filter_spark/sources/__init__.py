from .csv_source import read_stage_csv  # noqa: F401
from .warc_source import read_warc, read_warc_indexed, write_warc_file  # noqa: F401
from .zip_source import extract_zip_csvs  # noqa: F401
