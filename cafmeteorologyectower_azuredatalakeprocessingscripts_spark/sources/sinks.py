"""Sinks (SURVEY.md §2.1 S5/S6, §2.10 T5).

Primary sink: parquet partitioned by (site, wateryear) with *dynamic*
partition overwrite — re-running a water year replaces exactly that
partition (idempotent re-run, the reference's dated-filename + overwrite
contract at src/AzureDataLakeAccess.py:473-516). A CSV export kept for
compatibility with the reference's single-file naming scheme
(src/AzureDataLakeAccess.py:479).
"""

from __future__ import annotations

import datetime
from collections.abc import Sequence

from pyspark.sql import DataFrame


def build_aggregate_filename(
    site: str,
    table: str,
    wateryear: int | str,
    ver: str,
    on_date: datetime.date | None = None,
) -> str:
    """``{Site}_{Table}_AggregateQC_CY{wateryear}_{Ver}_{YYYYMMDD}.csv``
    (reference naming at src/AzureDataLakeAccess.py:479)."""
    today = (on_date or datetime.date.today()).strftime("%Y%m%d")
    return f"{site}_{table}_AggregateQC_CY{wateryear}_{ver}_{today}.csv"


def write_aggregate_csv(df: DataFrame, path: str, ts_col: str = "TIMESTAMP") -> None:
    """Single-file CSV export, time-ordered — compatibility surface only;
    ``coalesce(1)`` is deliberate and NOT the scale path (use
    ``write_partitioned`` for real data)."""
    (
        df.orderBy(ts_col)
        .coalesce(1)
        .write.option("header", "true")
        .mode("overwrite")
        .csv(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("site", "wateryear"),
    mode: str = "overwrite",
) -> None:
    """Scale sink: partitioned parquet; with
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (session default)
    only the partitions present in ``df`` are replaced."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
