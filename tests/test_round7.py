"""Round-7 fixes: semdedup cache handle, winsorize NULL pass-through,
embed_neardup_pairs approx_count (no eager count job)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


# ------------------------------------------------- semdedup cache handle
def test_semdedup_cells_out_handle_releases_cache(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        semdedup,
    )

    spark.catalog.clearCache()
    df = _vecs(
        spark,
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]), (4, [0.0, 1.0])],
    )
    handle: list = []
    out = semdedup(df, n_centroids=1, threshold=0.95, cells_out=handle)
    rows = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert rows == {1: True, 2: False, 3: True, 4: False}
    assert len(handle) == 1
    # the persisted cells frame is cached until released via the handle
    assert handle[0].storageLevel.useMemory
    handle[0].unpersist(blocking=True)
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().isEmpty()


def test_semdedup_persist_false_leaves_no_cache(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        semdedup,
    )

    spark.catalog.clearCache()
    df = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    handle: list = []
    semdedup(df, n_centroids=1, persist_cells=False, cells_out=handle).collect()
    assert handle == []
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().isEmpty()


# --------------------------------------------- winsorize NULL semantics
def test_winsorize_drops_null_rows_by_default(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        winsorize_by_group,
    )

    df = spark.createDataFrame(
        [Row(g="a", x=float(i)) for i in range(1, 11)]
        + [Row(g="a", x=None)]
    )
    out = winsorize_by_group(df, "g", "x", 0.1, 0.9)
    assert out.count() == 10


def test_winsorize_keep_nulls_passes_rows_through(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        winsorize_by_group,
    )

    df = spark.createDataFrame(
        [Row(g="a", x=float(i)) for i in range(1, 11)]
        + [Row(g="a", x=None), Row(g="b", x=None)]
    )
    out = winsorize_by_group(df, "g", "x", 0.1, 0.9, keep_nulls=True)
    assert out.count() == 12
    nulls = out.filter(F.col("x").isNull()).collect()
    assert len(nulls) == 2
    for r in nulls:
        assert r["lo_cut"] is None and r["hi_cut"] is None
        assert r["winsorized"] is None
    # non-null rows clamp exactly as without the flag
    clamped = {
        r["x"]: r["winsorized"]
        for r in out.filter(F.col("x").isNotNull()).collect()
    }
    assert clamped[1.0] == 1.0  # lo rank ceil(0.1*10)=1 -> cut at 1.0
    assert clamped[10.0] == 9.0  # hi rank ceil(0.9*10)=9 -> cut at 9.0


# --------------------------------- embed_neardup_pairs approx_count path
def test_embed_neardup_approx_count_skips_count_job(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        embed_neardup_pairs,
    )

    df = _vecs(
        spark, [(i, [1.0 if j == i % 4 else 0.0 for j in range(4)]) for i in range(20)]
    )

    def _boom():
        raise AssertionError("df.count() must not run when approx_count is given")

    df.count = _boom  # instance shadow: any eager count would trip it
    out = embed_neardup_pairs(
        df, threshold=0.99, dim=4, approx_count=20, tables=2
    )
    assert out.count() > 0  # materializes without ever calling df.count


def test_embed_neardup_approx_count_matches_exact_sizing(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        srp_planes_for,
    )

    # the docstring contract: planes moves by at most 1 per 2x estimate error
    assert abs(srp_planes_for(10_000) - srp_planes_for(20_000)) <= 1
    assert srp_planes_for(10_000) == srp_planes_for(10_000)
