from .toa5 import read_toa5, read_processed_csv
from .files import (
    file_date_from_daily_name,
    file_date_from_stem,
    with_source_file,
    anti_join_processed,
)
from .sinks import build_aggregate_filename, write_aggregate_csv, write_partitioned

__all__ = [
    "read_toa5",
    "read_processed_csv",
    "file_date_from_daily_name",
    "file_date_from_stem",
    "with_source_file",
    "anti_join_processed",
    "build_aggregate_filename",
    "write_aggregate_csv",
    "write_partitioned",
]
