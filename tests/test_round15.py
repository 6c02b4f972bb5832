"""Round-15 tests: VERDICT r14 worklist — the charlm_score persist
leak (#3), the SRP eager-count fallback guard (#6) — and the ADVICE
r14 items (BPE oracle delimiter corpus guard, oov null-id pinning,
scan_audit eager-query exception)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "pack my box with five dozen liquor jugs"),
            (4, "sphinx of black quartz judge my vow"),
            (5, ""),
            (6, "the the the quick quick zebra"),
        ],
        "doc_id long, text string",
    )


# ------------------------------------- VERDICT r14 #3: charlm persist leak


def test_charlm_score_leaves_no_persistent_rdds(spark):
    """charlm_score(model='broadcast') must not leak a session-lifetime
    cache on the default call (the jaccard/BPE/incremental_dedup
    contract: library ops own their storage; persists are cache_out
    opt-ins whose lifecycle the CALLER controls)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        charlm_score,
    )

    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    charlm_score(_docs(spark)).collect()
    charlm_score(_docs(spark), model="window").collect()
    assert len(sc._jsc.getPersistentRDDs()) == before


def test_charlm_score_cache_out_handle(spark):
    """cache_out=[] is the opt-in: the per-(doc, bigram) frame persists
    during the run, the caller unpersists the handle, and the result
    matches the cache-free default bit-for-bit."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        charlm_score,
    )

    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    expected = sorted(tuple(r) for r in charlm_score(_docs(spark)).collect())
    handles: list = []
    got = sorted(
        tuple(r)
        for r in charlm_score(_docs(spark), cache_out=handles).collect()
    )
    assert got == expected
    assert len(handles) == 1
    for f in handles:
        f.unpersist()
    assert len(sc._jsc.getPersistentRDDs()) == before
