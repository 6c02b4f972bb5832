"""Schema-tolerant unions (SURVEY.md §2.7 U1/U2).

Reference: ``pd.concat([...], sort=False)`` unions frames whose schemas may
differ (old aggregate has QC columns the new raw data lacks —
src/AzureDataLakeAccess.py:83, :458). Spark equivalent:
``unionByName(allowMissingColumns=True)`` — absent columns become null.
Union is a no-shuffle narrow op.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union any number of frames by column name, null-filling gaps."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the input has fewer partitions than the
    session's parallelism (or ``min_partitions``).

    Single large files with one parquet row group scan as ONE task — a
    row group cannot be split — so everything up to the first exchange
    runs on one core. The round-robin shuffle is cheap relative to the
    serialized compute it unblocks; on well-partitioned data this is a
    no-op (no shuffle added).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
