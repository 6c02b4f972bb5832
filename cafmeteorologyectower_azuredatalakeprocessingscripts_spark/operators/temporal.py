"""Temporal joins Spark lacks natively: as-of join and range
(interval) join, composed from DataFrame ops.

- as-of: expressed as union + partitioned forward-fill window — the
  classical sort-merge formulation. One shuffle keyed by the join key;
  no inequality join, no explosion. At scale this is exactly the plan
  a native as-of operator would produce (co-partition by key, locally
  sort by time, merge).
- range: equi-join on coarse time buckets + residual overlap filter.
  A raw inequality join is a broadcast-nested-loop (O(n·m)) in Spark;
  bucketing turns it into a hash join whose fan-out is bounded by
  interval_length / bucket_width + 1 copies of each interval — the
  standard interval-partitioning trick.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with ``right.ts <= left.ts`` within the same ``by`` group
    (inclusive match, like DuckDB's ``ASOF JOIN`` on ``>=``). Left rows
    with no prior right row keep nulls.

    ``right`` must be unique per (by, ts) — enforce upstream (e.g. a
    groupBy snapshot) — otherwise the fill picks the last of the
    co-timestamped right rows in input order, which is not
    deterministic.

    Mechanics: tag the two inputs, union them, and forward-fill the
    right-side values over a window partitioned by ``by`` ordered by
    (ts, tag) — right rows sort before left rows at equal timestamps,
    which is what makes the match inclusive. Then keep only left rows.
    """
    l_tag = left
    for v in value_cols:
        if v in l_tag.columns:
            raise ValueError(f"value column {v!r} collides with a left column")
        l_tag = l_tag.withColumn(v, F.lit(None))
    l_tag = l_tag.withColumn("__src", F.lit(1))
    r_tag = right.select(
        by, F.col(ts).alias(ts), *value_cols
    ).withColumn("__src", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(ts, "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.filter(F.col("__src") == 1).drop("__src")


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket: str = "2 hours",
) -> DataFrame:
    """Inner-join left rows to right intervals containing them:
    ``start <= ts < end``. Left and right column names must be disjoint.

    Each interval is exploded to every ``bucket``-wide time slot it
    overlaps; each left row maps to its single slot; an equi-join on the
    slot then a residual filter gives exact semantics. Pick ``bucket``
    near the typical interval length: fan-out per interval is
    len/bucket + 1 slots, and slot-key cardinality (time-spread ×
    1/bucket) is what the shuffle hashes on — both bounded, no
    nested-loop.
    """
    slot = _epoch_us(ts)
    width = F.lit(_interval_micros(bucket))
    lhs = left.withColumn("__slot", F.floor(slot / width))
    s0 = F.floor(_epoch_us(start) / width)
    s1 = F.floor((_epoch_us(end) - 1) / width)
    rhs = right.withColumn(
        "__slot", F.explode(F.sequence(s0.cast("bigint"), s1.cast("bigint")))
    )
    # residual filter on the SAME cast expressions the buckets were
    # computed from: under a non-UTC session zone with DST the
    # NTZ->TIMESTAMP cast is non-linear near transitions, so comparing
    # the raw columns here while bucketing on cast values could disagree
    # and silently drop matching pairs near a DST boundary.
    return (
        lhs.join(rhs, "__slot", "inner")
        .filter(
            (_epoch_us(ts) >= _epoch_us(start))
            & (_epoch_us(ts) < _epoch_us(end))
        )
        .drop("__slot")
    )


def _epoch_us(col: str):
    # unix_micros rejects TIMESTAMP_NTZ; the cast is a no-op on TIMESTAMP
    # and a wall-clock identity on NTZ under a UTC session zone (the
    # shared rule — functions/time.py:ts_normalizer). Interval math is
    # shift-invariant either way, and range_join compares bucketing and
    # residual on these same cast values so they can never disagree.
    return F.unix_micros(F.col(col).cast("timestamp"))


def _interval_micros(spec: str) -> int:
    qty, unit = spec.split()
    per = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    return int(qty) * per
