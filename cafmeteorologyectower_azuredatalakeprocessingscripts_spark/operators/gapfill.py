"""Time-spine gap fill (SURVEY.md §2.3 J4).

Reference semantics (src/AzureDataLakeAccess.py:56-59): rebuild the index as
``date_range(floor(first,'D'), ceil(last,'D'), freq)`` and reindex — missing
ticks become all-null rows, and the series is padded to midnight at both
ends.

Spark design: generate the spine *distributed* — per partition group,
``sequence(day_floor(min_ts), day_ceil(max_ts), interval)`` + ``explode`` —
then LEFT JOIN the data onto the spine. No driver-side materialization, so
a 1000-site × multi-year spine never touches the driver. The join keys are
``partition_cols + ts`` so the shuffle co-locates by site; with few/no
partition cols and a small spine, AQE picks a broadcast join of the spine
side automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.time import day_ceil, day_floor


def time_spine(
    df: DataFrame,
    ts_col: str = "TIMESTAMP",
    freq_minutes: int = 15,
    partition_cols: Sequence[str] = (),
    pad_to_day: bool = True,
) -> DataFrame:
    """Complete tick grid spanning each group's [min, max] timestamp."""
    partition_cols = list(partition_cols)
    lo, hi = F.min(ts_col), F.max(ts_col)
    if pad_to_day:
        lo, hi = day_floor(lo), day_ceil(hi)
    bounds = df.groupBy(*partition_cols).agg(
        lo.alias("__lo"), hi.alias("__hi")
    )
    seq = F.sequence(
        F.col("__lo"),
        F.col("__hi"),
        F.expr(f"INTERVAL {int(freq_minutes)} MINUTES"),
    )
    return bounds.select(
        *partition_cols, F.explode(seq).alias(ts_col)
    )


def gap_fill(
    df: DataFrame,
    ts_col: str = "TIMESTAMP",
    freq_minutes: int = 15,
    partition_cols: Sequence[str] = (),
    pad_to_day: bool = True,
) -> DataFrame:
    """Left-join data onto its complete spine; missing ticks = null rows.

    Input must be unique per (partition_cols, ts) — run
    ``dedup_keep_richest`` first (the reference does the same inside
    ``indx_fill``, src/AzureDataLakeAccess.py:50-59).
    """
    spine = time_spine(df, ts_col, freq_minutes, partition_cols, pad_to_day)
    return spine.join(df, on=[*partition_cols, ts_col], how="left")
