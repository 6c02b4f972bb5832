"""File-name–derived pruning and idempotence (SURVEY.md §2.1 S3/S4/S9).

The reference downloads month-partitioned blobs, parses ``*_YYYY_MM_DD_*``
dates out of blob names, and skips files already present locally
(src/AzureDataLakeAccess.py:152-188). With a distributed filesystem
connector the download disappears: path globs (``.../{yyyy}/{mm}/*.dat``)
give partition pruning at plan time, and these expressions recover the
file date from ``input_file_name()`` for finer predicates. Idempotence
becomes an anti-join against a processed-file log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SRC = "source_file"


def with_source_file(df: DataFrame, col_name: str = _SRC) -> DataFrame:
    return df.withColumn(col_name, F.input_file_name())


def file_date_from_daily_name(c: Column | str = _SRC) -> Column:
    """Date from raw daily names ``..._YYYY_MM_DD_...``
    (reference parse at src/AzureDataLakeAccess.py:164-168)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.to_date(
        F.regexp_extract(c, r"_(\d{4}_\d{2}_\d{2})_", 1), "yyyy_MM_dd"
    )


def file_date_from_stem(c: Column | str = _SRC) -> Column:
    """Date from trailing ``_YYYYMMDD`` stems of aggregate names
    (reference ``get_datetime_from_filename``,
    src/AzureDataLakeAccess.py:303-312)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.to_date(
        F.regexp_extract(c, r"_(\d{8})\.[A-Za-z0-9]+$", 1), "yyyyMMdd"
    )


def anti_join_processed(
    candidates: DataFrame, processed_log: DataFrame, key: str = "path"
) -> DataFrame:
    """Skip already-ingested files (reference exists-check
    src/AzureDataLakeAccess.py:174-183) as a broadcastable left anti-join."""
    return candidates.join(
        F.broadcast(processed_log.select(key).distinct()), on=key, how="left_anti"
    )
