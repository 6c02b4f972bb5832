"""Skew-mitigation join: explicit key salting.

AQE's skew-join handling (on by default in this engine's sessions)
splits oversized *partitions* after a shuffle materializes; salting goes
further — it splits a single hot *key* across ``n_salts`` reducers
before the shuffle happens, which is the only fix when one key alone
exceeds an executor (the "one user is 30% of events" shape common in
event logs and web corpora).

Semantically transparent: the salted join returns exactly the rows of
the plain join (the oracle for any query using it is the unsalted SQL
join). Cost model: the build/right side is replicated ``n_salts``×, so
use it with a small-to-medium right side and a skewed left side; for a
big-big skewed join, salt only the hot keys (``hot_keys``) so the
replication applies to a handful of keys instead of the whole table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Join ``left`` (skewed side) to ``right`` on column ``on``,
    spreading each hot key across ``n_salts`` shuffle partitions.

    Each left row gets a deterministic salt in [0, n_salts): xxhash64
    over all its columns — content-derived, so re-runs and retries land
    rows in the same bucket (``monotonically_increasing_id`` or ``rand``
    would not). Right rows are exploded once per salt value so every
    (key, salt) bucket finds its match. With ``hot_keys`` given, only
    those keys are salted/exploded and the rest join on salt 0 —
    replication cost then scales with the hot keys' matches, not the
    whole right side.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_src = F.xxhash64(*[F.col(c) for c in left.columns])
    if hot_keys is not None:
        is_hot_l = F.col(on).isin(list(hot_keys))
        l_salt = F.when(is_hot_l, F.pmod(salt_src, F.lit(n_salts))).otherwise(
            F.lit(0)
        )
        is_hot_r = F.col(on).isin(list(hot_keys))
        r_salts = F.when(
            is_hot_r, F.sequence(F.lit(0), F.lit(n_salts - 1))
        ).otherwise(F.array(F.lit(0)))
    else:
        l_salt = F.pmod(salt_src, F.lit(n_salts))
        r_salts = F.sequence(F.lit(0), F.lit(n_salts - 1))
    lhs = left.withColumn("__salt", l_salt.cast("int"))
    rhs = right.withColumn("__salt", F.explode(r_salts)).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    out = lhs.join(rhs, [on, "__salt"], how)
    return out.drop("__salt")


def repartition_pinned(df: DataFrame, *cols, factor: int = 1) -> DataFrame:
    """``df.repartition(N, *cols)`` with ``N`` pinned to the session's
    shuffle width — the pre-amplification exchange AQE gets wrong.

    ``repartition(col)`` with no explicit count lets AQE pick the
    partition number from the exchange's INPUT bytes. That heuristic is
    blind to downstream row amplification: a corpus of docs is a few MB
    of parquet on the wire, so AQE coalesces the doc-keyed exchange to
    ~1 partition — and then the tokenizer explode (~10²-10³ rows per
    doc) and every window/agg/vector op after it run in ONE task. The
    same applies to embedding tables: 10⁵ vectors are "small" as bytes
    but each row costs O(dim) math downstream. Measured at sf0.1: the
    whole Gopher repetition family (posexplode → 9-way gram explode →
    2.2M-row agg) executed as a single task until this pin.

    An explicit ``numPartitions`` disables AQE coalescing for this one
    exchange while keeping the column clustering (downstream doc-keyed
    aggs stay exchange-free). ``N = factor × spark.sql.shuffle.partitions``
    — the user's cluster-sizing knob, so a 1000-executor job spreads
    exactly as wide as its other shuffles; ``factor`` is for callers
    whose amplification is extreme enough to warrant finer tasks.
    """
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(max(1, n * factor), *cols)
