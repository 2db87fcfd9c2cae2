from .csv_source import read_stage_csv  # noqa: F401
from .zip_source import extract_zip_csvs  # noqa: F401
