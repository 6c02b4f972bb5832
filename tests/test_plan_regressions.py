"""Physical-plan regression guards for the audited headline plans
(PLANS.md): the properties that make these queries scale — pushdown
reaching the parquet scan, bounded exchange counts, no accidental
cross joins — asserted so a refactor cannot silently regress them.

Counts are upper bounds (AQE may coalesce but never adds exchanges);
substring checks target the stable operator names in executedPlan().
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_single_exchange(spark):
    plan = _plan(spark, "pricing_summary")
    # the date predicate must reach the parquet reader
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    assert plan.count("Exchange") <= 2  # one agg shuffle (+ AQE read)
    assert "CartesianProduct" not in plan


def test_flag_strings_zero_exchange_projection(spark):
    # QC is one projection: the reference's index-aligned joins must
    # stay eliminated — no Exchange, no Join of any kind
    plan = _plan(spark, "flag_strings")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_top_revenue_broadcasts_dims(spark):
    plan = _plan(spark, "top_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repetition_family_single_generate(spark):
    # all nine gram lengths ride ONE explode; doc repartition satisfies
    # both aggregations so gram rows never reshuffle. The repartition
    # must be the PINNED form (explicit numPartitions): AQE sizes the
    # exchange by its pre-explode input bytes and would coalesce the
    # doc exchange to ~1 partition, serializing the whole gram pipeline
    # through one task (repartition_pinned docstring).
    plan = _plan(spark, "text_repetition_family")
    assert plan.count("Generate explode") == 1
    assert "REPARTITION_BY_NUM" in plan
    assert "REPARTITION_BY_COL" not in plan


def test_span_corpus_single_generate_no_self_join(spark):
    # the window-count form: one explode, no join between span rows
    plan = _plan(spark, "dedup_span_corpus")
    assert plan.count("Generate explode") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_c4_filter_map_only(spark):
    plan = _plan(spark, "c4_line_filter")
    assert "Exchange" not in plan and "Join" not in plan


def test_vocab_top_k_is_take_ordered(spark):
    plan = _plan(spark, "vocab_top_terms")
    assert "TakeOrderedAndProject" in plan


def test_blocked_neardup_no_nested_loop(spark):
    # the scale path must stay an equi-join on (table, bucket)
    plan = _plan(spark, "embed_neardup_blocked")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_map_only(spark):
    # RAG chunking must stay a pure projection: split -> posexplode ->
    # slice with no shuffle anywhere
    plan = _plan(spark, "chunk_documents")
    assert "Exchange" not in plan
    assert plan.count("Generate") == 1


def test_charlm_leakfree_plan_bounded_reevaluation(spark):
    # r15 contract (charlm persist became a cache_out opt-in): the
    # DEFAULT plan persists NOTHING — no InMemoryTableScan may appear,
    # because that is the session-lifetime cache the opt-in removed.
    # The price is the bigram subtree re-evaluating under the model
    # broadcasts, bounded at 3 textual repeats + the one-row alphabet
    # explode (the docstring's "3x one scan" bound); the model
    # join-backs must broadcast, never sort-merge.
    plan = _plan(spark, "charlm_quality")
    assert "InMemoryTableScan" not in plan
    assert plan.count("Generate") <= 4
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_levenshtein_pairs_equi_join_only(spark):
    # prefix blocking must compile to an equi-join on the block key —
    # an all-pairs comparison would show up as a nested-loop/cartesian
    plan = _plan(spark, "dedup_levenshtein_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_oov_rate_vocab_broadcasts(spark):
    plan = _plan(spark, "oov_rate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_cube_single_exchange(spark):
    # CUBE expands grouping sets BEFORE the shuffle: one scan, one agg
    # exchange for all four levels
    plan = _plan(spark, "corpus_cube_stats")
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") <= 2  # agg shuffle (+ AQE read)


def test_rolling_despike_one_shuffle_one_window(spark):
    plan = _plan(spark, "rolling_despike")
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_bm25_no_explode_take_ordered(spark):
    # literal-query BM25: tf via array expressions (no Generate), 1-row
    # stats broadcast, distributed partial top-k — never a global sort
    plan = _plan(spark, "bm25_topk")
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") <= 2
    assert "SortMergeJoin" not in plan


def test_sliding_window_expands_before_shuffle(spark):
    # F.window's 2-per-event expansion is a projection, not a join:
    # one scan, one agg exchange
    plan = _plan(spark, "sliding_window_counts")
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_exact_quantiles_windows_share_exchange(spark):
    plan = _plan(spark, "exact_quantiles")
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_topk_per_group_gets_group_limit_pushdown(spark):
    # rank()<=k over a window compiles to WindowGroupLimit (partial
    # top-k BEFORE the shuffle) on this Spark — guard it
    plan = _plan(spark, "topk_per_group")
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") <= 2


def test_zorder_key_map_only(spark):
    plan = _plan(spark, "zorder_layout_key")
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1


def test_html_strip_map_only(spark):
    plan = _plan(spark, "html_strip")
    assert "Exchange" not in plan


def test_json_props_single_agg_exchange(spark):
    # get_json_object stays JVM-side: no PythonUDF node, one agg shuffle
    plan = _plan(spark, "json_props_extract")
    assert "Python" not in plan
    assert plan.count("Exchange") <= 2


# round-6 fourth wave


def test_unicode_scrub_and_token_compression_map_only(spark):
    for name in ("unicode_scrub", "token_compression"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan and "Join" not in plan


def test_soft_dedup_single_window_exchange(spark):
    plan = _plan(spark, "soft_dedup_weights")
    # one hash shuffle by fingerprint feeding one WindowExec — no
    # groupBy+join-back double scan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_temperature_mix_broadcasts_rates(spark):
    plan = _plan(spark, "temperature_mix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_trend_slope_single_agg_exchange_no_window(spark):
    plan = _plan(spark, "trend_slope_qc")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan and "Join" not in plan


def test_unpivot_expands_before_single_agg_exchange(spark):
    plan = _plan(spark, "unpivot_profile")
    assert "Expand" in plan  # the native melt node, not a union of scans
    assert plan.count("Exchange") <= 2  # agg shuffle (+ AQE read)


def test_hard_negatives_broadcasts_anchor_side(spark):
    plan = _plan(spark, "hard_negatives")
    # the cross join IS the design (anchors broadcast, corpus streams):
    # assert the broadcast is on the nested-loop build side and the
    # corpus is never shuffled for the join itself
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_pairs_keyed_by_cluster(spark):
    plan = _plan(spark, "semantic_dedup")
    # pair stage must be an equi-join on centroid_id, not a cross join
    # (the only nested-loop joins allowed are the broadcast-centroid
    # assignment cross joins, which build on the tiny centroid side)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cusum_single_exchange_shared_windows(spark):
    plan = _plan(spark, "cusum_level_shift")
    # ordered cumsum + unbounded total/count share the user_id
    # partitioning: one shuffle, no join-back
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_winsorize_single_exchange(spark):
    plan = _plan(spark, "winsorize_values")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_climatology_no_join_back(spark):
    plan = _plan(spark, "climatology_anomaly")
    assert "Join" not in plan  # climatology rides as windows, not a self-join


def test_forward_fill_single_exchange_no_join(spark):
    plan = _plan(spark, "forward_fill_locf")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_scd2_single_exchange(spark):
    plan = _plan(spark, "scd2_history")
    # run-id window and the per-run agg both key by user_id: the agg
    # reuses the window's partitioning instead of re-shuffling
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_percentile_norm_single_exchange(spark):
    plan = _plan(spark, "percentile_norm")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_flatline_runs_two_exchanges_no_join(spark):
    plan = _plan(spark, "flatline_runs")
    # (user) sort+window, then (user, day, run) agg, then (user, day)
    # agg — the last two share hash partitioning prefixes with AQE
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Join" not in plan


def test_state_durations_no_self_join(spark):
    plan = _plan(spark, "state_durations")
    assert "Join" not in plan  # intervals + durations all ride windows/aggs


def test_simhash128_valve_is_window_not_antijoin(spark):
    """The occupancy valve must stay the count-over-window form riding
    the join's own (blk, val) exchange: the count-aggregate →
    broadcast-anti-join form re-plans the 128-conditional-sum signature
    agg into the hot-key branch and made CAPPED slower than EXACT
    (62 vs 41 s at 500k — SCALING.md round-9 addendum 5)."""
    plan = _plan(spark, "dedup_simhash128_pairs")
    assert "Window" in plan  # the valve's count-over-window
    assert "LeftAnti" not in plan  # the rejected broadcast anti-join form
    assert "CartesianProduct" not in plan
    # pigeonhole join keyed by (blk, val) — pair stage is an equi-join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
