"""Bucketed-table co-located join: the pre-shuffle primitive for
repeated big-big joins at scale. Writing both sides bucketed (and
sorted) by the join key lets every subsequent join run with ZERO
exchanges — the shuffle is paid once at write time, amortized across
every downstream query. This is plan-shape evidence the engine uses
Spark's bucketing correctly; the partitioned-sink contract query
(`sink_roundtrip`) covers the data-correctness side of writes.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    names = ("bkt_fact", "bkt_dim")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    fact = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    (
        fact.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "fact"))
        .saveAsTable("bkt_fact")
    )
    (
        dim.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "dim"))
        .saveAsTable("bkt_dim")
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_runs_without_exchange(spark, bucketed_pair):
    fact, dim = bucketed_pair
    # disable broadcast so the join must pick a shuffle-or-bucketed plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(fact)
            .join(spark.table(dim), "k")
            .groupBy()
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself reads bucketed scans directly: no Exchange
        # between the scans and the SortMergeJoin (the final single-row
        # agg still exchanges — that's the groupBy, not the join)
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(k" not in plan
        [row] = j.collect()
        # exact expected total: sum over k of (v + 10k) for 20 rows per k
        fact_sum = sum(range(10_000))
        dim_contrib = sum(k * 10 for k in range(500)) * 20
        assert row.s == fact_sum + dim_contrib
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
