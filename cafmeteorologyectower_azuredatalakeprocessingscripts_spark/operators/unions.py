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
