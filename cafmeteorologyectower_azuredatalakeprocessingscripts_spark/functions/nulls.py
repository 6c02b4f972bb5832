"""Null-semantics helpers.

pandas boolean comparisons silently coerce NaN: ``NaN >= x -> False`` but
``NaN != 0 -> True``. Spark three-valued logic returns NULL instead. The QC
library (qc/) must reproduce the pandas outcome exactly (the reference's
tests rely on it — e.g. src/AzureDataLakeAccess.py:643 spike test passes on
the first row because the lag-diff is NaN), so every comparison is wrapped
with an explicit null default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def false_if_null(c: Column) -> Column:
    """pandas ``NaN <cmp> x -> False`` equivalent."""
    return F.coalesce(c, F.lit(False))


def true_if_null(c: Column) -> Column:
    """pandas ``NaN != x -> True`` equivalent."""
    return F.coalesce(c, F.lit(True))


def null_count_expr(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Horizontal per-row null count (reference ``pd.isna(df).sum(1)``,
    src/AzureDataLakeAccess.py:51). Counts SQL NULL, plus NaN for
    float/double columns (pandas ``isna`` treats both the same).

    Pure projection — no shuffle.
    """
    cols = cols if cols is not None else df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    terms = []
    for c in cols:
        dt = fields.get(c)
        is_missing = F.col(c).isNull()
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            is_missing = is_missing | F.isnan(F.col(c))
        terms.append(F.when(is_missing, 1).otherwise(0))
    if not terms:
        return F.lit(0)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out
