"""Round-17 (optimization round 2/2) regression tests, pinning this
round's changes:

- VERDICT r16 #1: the embed_neardup_pairs SRP auto-sizer no longer runs
  an EAGER full df.count() when Catalyst stats are unavailable — it
  estimates from a bounded sampled-partition job (no warning, no full
  pass).
- ADVICE r16: _maybe_size validates the n_partitions sentinel (a typo'd
  string raises instead of becoming a column name), and
  sized_codec_partitions degrades to None on any internal-API failure.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import Row


# --------------------------- VERDICT r16 #1: bounded SRP size fallback


def test_sampled_count_estimate_exact_on_small_frames(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        _plan_size_bytes,
        _sampled_count_estimate,
    )

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(300)]
    )
    # the precondition this fallback exists for: RDD-backed plans carry
    # no Catalyst sizeInBytes
    assert _plan_size_bytes(df) is None
    est = _sampled_count_estimate(df)
    assert est is not None
    # every partition of a small frame is sampled -> the estimate is
    # within the documented 2x band (and typically exact)
    assert 150 <= est <= 600


def test_embed_neardup_statsless_sizing_never_full_counts(spark):
    """Stats-less input + planes=None + approx_count=None must size the
    SRP buckets WITHOUT a full df.count() and WITHOUT the RuntimeWarning
    (VERDICT r16 #1 — the old fallback ran a full upstream pass before
    the real job). The instance shadow trips if the full count runs;
    simplefilter('error') trips if the eager-count warning fires."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        embed_neardup_pairs,
    )

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0, 0.5, 0.25]) for i in range(64)]
    )

    def _boom():
        raise AssertionError("stats-less sizing must not run a full df.count()")

    df.count = _boom
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = embed_neardup_pairs(df, threshold=0.9, dim=4)
    assert out is not None
    # the result itself still computes (bounded job sized the planes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------- VERDICT r16 #5: fused BPE rewrite+pair-count


def test_bpe_fused_pair_count_identical_to_jvm_explode(spark):
    """_top_pair_after_merges (rewrite + adjacent-pair count fused into
    ONE Python stage, histogram-only Arrow return) must agree with the
    r16 shape (_apply_merges then the JVM transform/explode _top_pair)
    for every pending-tail length — same winning pair, same frequency,
    same tie-break."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.bpe import (
        _apply_merges,
        _pair_counts_after_merges,
        _top_pair,
        _top_pair_after_merges,
        _word_table,
    )

    df = spark.createDataFrame(
        [("low low lower lowest newer newest new",), ("wider wide widest low",)],
        ["text"],
    )
    words = _word_table(df, "text", False)
    pending: list[tuple[str, str]] = []
    for _ in range(6):
        old = _top_pair(_apply_merges(words, pending))
        new = _top_pair_after_merges(words, pending)
        assert old == new
        if old is None:
            break
        pending.append((old[0], old[1]))
    assert len(pending) >= 4  # the loop exercised real multi-merge tails

    # and the full histogram (not just the winner) matches the explode
    from pyspark.sql import functions as F

    counts_fused = {
        (r["left"], r["right"]): r["freq"]
        for r in _pair_counts_after_merges(words, pending)
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("freq"))
        .collect()
    }

    rewritten = _apply_merges(words, pending)
    exploded = (
        rewritten.filter(F.size("syms") >= 2)
        .select(
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.col("syms").getItem(i).alias("left"),
                        F.col("syms").getItem(i + 1).alias("right"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("freq"))
    )
    counts_jvm = {(r["left"], r["right"]): r["freq"] for r in exploded.collect()}
    assert counts_fused == counts_jvm


def test_bpe_train_merges_unchanged_by_fused_count(spark):
    """End-to-end: bpe_train's learned merge sequence is byte-identical
    to the hybrid trainer's (the standing cross-implementation identity
    — the hybrid path has no distributed pair-count stage at all, so it
    is an independent witness that the fused count changed nothing)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.bpe import (
        bpe_train,
        bpe_train_hybrid,
    )

    df = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog",),
            ("the quicker browner foxes jumped over lazy dogs",),
            ("pack my box with five dozen liquor jugs",),
        ],
        ["text"],
    )
    assert bpe_train(df, n_merges=12, min_freq=1) == bpe_train_hybrid(
        df, n_merges=12, min_freq=1
    )


# ------------------------------- ADVICE r16: codec width sizing guards


def test_maybe_size_rejects_typod_sentinel(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.multimodal import (
        _BPT_CHEAP,
        _maybe_size,
    )

    df = spark.range(4).selectExpr("id as doc_id", "string(id) as text")
    with pytest.raises(ValueError, match="auto"):
        _maybe_size(df, "Auto", _BPT_CHEAP)
    with pytest.raises(ValueError, match="auto"):
        _maybe_size(df, "text", _BPT_CHEAP)  # a REAL column name: must not hash-partition by it
    # the supported spellings still work
    assert _maybe_size(df, None, _BPT_CHEAP) is df
    assert _maybe_size(df, 2, _BPT_CHEAP).rdd.getNumPartitions() == 2
    _maybe_size(df, "auto", _BPT_CHEAP)  # sentinel path constructs fine


def test_sized_codec_partitions_degrades_to_none_on_planning_failure(
    spark, monkeypatch
):
    """Any internal-API failure inside the sizer (stats probe OR the
    RDD-conversion partition count) must degrade to the None no-op,
    never raise (ADVICE r16 — getNumPartitions used to sit outside the
    try)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.multimodal import (
        sized_codec_partitions,
    )

    # wide enough that the sized width beats 1 and the sizer actually
    # consults the input partitioning (the failure site under test)
    df = (
        spark.range(1024)
        .coalesce(1)  # narrower than the sized width, so the sizer engages
        .selectExpr("id as doc_id", "repeat('x', 512) as text")
    )
    # bytes_per_task small enough that the plan-estimated input (~18 KB
    # — Catalyst's default string width, not the literal payload) sizes
    # a width > 1 and the sizer actually consults the input partitioning
    assert sized_codec_partitions(df, 1024) is not None  # healthy path

    def _broken_rdd(self):
        raise RuntimeError("internal API moved")

    monkeypatch.setattr(type(df), "rdd", property(_broken_rdd))
    assert sized_codec_partitions(df, 1024) is None
