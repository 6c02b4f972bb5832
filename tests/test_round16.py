"""Round-16 tests: VERDICT r15 worklist — the hybrid-BPE registry
promotion (#3) — and the ADVICE r15 items (span-removal cross-engine
replay coverage, the histogram-trainer count precondition guard)."""

import pytest


# --------------------- VERDICT r15 #3: hybrid BPE behind the hash gate


def test_bpe_hybrid_query_matches_duckdb_replay(spark):
    """The r16 registry addition end-to-end at sf0.001: the hybrid
    trainer (one histogram job + driver merge loop) and the unrolled
    double-delimiter SQL replay must agree merge for merge
    (rank, left, right, freq). Together with r14's
    test_bpe_query_matches_duckdb_replay this pins
    hybrid == greedy-SQL-replay == distributed through one oracle."""
    import duckdb

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in entrymod.queries()["bpe_train_hybrid"](spark, sf).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["bpe_train_hybrid"]).fetchall()
    assert got == [tuple(w) for w in want]
    assert len(got) == entrymod._BPE_MERGES_Q


def test_bpe_hybrid_and_distributed_queries_share_one_oracle():
    """The equivalence claim is transitive THROUGH the oracle: both
    registry entries must replay against the identical SQL text, and
    at the identical shared budget — if either drifts, a green pair of
    rows stops proving hybrid == distributed."""
    import __spark_entry__ as entrymod

    sqls = entrymod.oracle_sql()
    assert sqls["bpe_train_hybrid"] == sqls["bpe_train_merges"]


# ----------------- ADVICE r15 #1: span-removal cross-engine replay test


def test_span_removal_query_matches_duckdb_replay(spark):
    """The r15 registry addition end-to-end at sf0.001: the fused
    dual-mode Spark span removal and its DuckDB oracle must agree
    row for row. Mirrors r14's BPE replay test — without this, a
    future edit to either side is only caught by the driver's external
    hash gate (ADVICE r15 #1 verified the agreement manually; this
    pins it in-repo)."""
    import duckdb

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["dedup_span_removal"](spark, sf)
    cols = df.columns
    got = sorted(tuple(r[c] for c in cols) for r in df.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    cur = con.execute(entrymod.oracle_sql()["dedup_span_removal"])
    assert [d[0] for d in cur.description] == cols
    want = sorted(tuple(w) for w in cur.fetchall())
    assert got == want
    assert len(got) > 0


# -------------- ADVICE r15 #2: histogram-trainer count precondition


def test_histogram_trainer_rejects_nonpositive_counts():
    """_train_from_histogram's incremental retraction bookkeeping
    (del on running total <= 0) is only sound for strictly positive
    counts; the public boundary must refuse a zero/negative count
    loudly instead of desyncing pair_words from pair_count and
    silently skipping rewrites."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.bpe import (
        _train_from_histogram,
    )

    for bad in (0, -3):
        with pytest.raises(ValueError, match=">= 1"):
            _train_from_histogram(["ab", "cd"], [2, bad], 5, 1)
    # the guard must not reject the valid boundary
    assert _train_from_histogram(["ab"], [1], 1, 1) == [(0, "a", "b", 1)]


# ------------- VERDICT r15 #2: fixed-cost abs bands in the triage tool


def test_bench_diff_abs_bands_load_from_frozen_file():
    """The fixed-cost bands must come from BASELINE_RATIO.json at
    runtime (ADVICE r15 #3: no hand-copied literals that silently go
    stale on a re-freeze) and cover the whole payload-synthesis
    family, each with a sane lo < hi."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    try:
        from bench_diff import abs_bands
    finally:
        sys.path.remove("/root/repo/tools")

    bands = abs_bands()
    for name in (
        "multimodal_png_pixels", "multimodal_bmp_pixels",
        "multimodal_tiff_pixels", "multimodal_jpeg_pixels",
        "multimodal_gif_pixels", "multimodal_gif_frames",
        "multimodal_wav_features", "variant_props_extract",
    ):
        assert name in bands, name
        lo, hi = bands[name]
        assert 0 < lo < hi < 10, (name, lo, hi)
