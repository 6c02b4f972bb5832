"""Top-1-per-group selection (SURVEY.md §2.1 S9 / §2.4 A4).

Reference: ``get_latest_file`` picks the max filename-date in a loop
(src/AzureDataLakeAccess.py:291-301). Engine form: ``max_by`` for a single
payload column, or a row_number window for whole-row top-k. Both are one
shuffle on the group key; map-side partial aggregation makes ``max_by``
the cheaper choice when only one column is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int = 1,
    descending: bool = True,
) -> DataFrame:
    """Whole-row top-k per group by ``order_col`` (deterministic ties by
    remaining columns' natural order is NOT guaranteed — pass a unique
    order_col or accept arbitrary tie-break)."""
    keys = list(keys)
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*keys).orderBy(oc)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
