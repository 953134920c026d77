"""Source scans: text-lines, permissive CSV, parquet/json."""

from big_data_validator_spark.sources.csv_source import (
    probe_header,
    scan_csv_permissive,
    scan_text_lines,
)
from big_data_validator_spark.sources.readers import scan_json, scan_parquet

__all__ = [
    "probe_header",
    "scan_csv_permissive",
    "scan_text_lines",
    "scan_json",
    "scan_parquet",
]
