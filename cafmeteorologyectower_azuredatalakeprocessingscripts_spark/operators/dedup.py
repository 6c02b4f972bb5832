"""Keep-richest-row deduplication (SURVEY.md §2.5 D1).

Reference semantics (src/AzureDataLakeAccess.py:50-54): for duplicate
timestamps (overlapping downloads / incremental re-runs), sort by
``(RECORD, nan_count)`` and keep the first — i.e. the row with the lowest
RECORD counter, then the fewest missing values. pandas sorts NaN last, so
null RECORD loses to any non-null RECORD.

Spark design: classic top-1-per-group window — NOT ``dropDuplicates``
(which keeps an arbitrary row). One hash shuffle on the key columns;
at 100 TB the key should include the site/partition column so the shuffle
distributes (and AQE splits any skewed key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.nulls import null_count_expr

_NAN_COUNT = "__nan_count"
_RN = "__rn"


def dedup_keep_richest(
    df: DataFrame,
    keys: Sequence[str] = ("TIMESTAMP",),
    record_col: str | None = "RECORD",
    value_cols: Sequence[str] | None = None,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep one row per ``keys``: lowest ``record_col`` (nulls last), then
    fewest nulls across ``value_cols`` (default: all non-key columns), then
    optional deterministic ``tiebreakers``.

    The reference's pandas sort is stable on file order for full ties; in a
    distributed engine that order does not exist, so pass ``tiebreakers``
    for reproducible output when exact ties are possible.
    """
    keys = list(keys)
    vcols = list(value_cols) if value_cols is not None else [
        c for c in df.columns if c not in keys
    ]
    order = []
    if record_col is not None:
        order.append(F.col(record_col).asc_nulls_last())
    order.append(F.col(_NAN_COUNT).asc())
    order.extend(F.col(c).asc_nulls_last() for c in tiebreakers)

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(_NAN_COUNT, null_count_expr(df, vcols))
        .withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_NAN_COUNT, _RN)
    )
