"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

FINAL stdout line is the compact headline JSON the driver parses:
{"metric": ..., "value": min_total_sec, "median": median_total_sec,
"unit": "sec", "queries": {name: min_sec}, "sf": ..., "n": ...},
plus drift fields (r10): "drift_probe" = min-of-3 of the fixed probe
query (pricing_summary, unchanged since r6) timed immediately BEFORE
AND AFTER each phase and averaged ("drift_probe_pre_post" carries the
bracket — the shakedown run measured 2.10 s pre vs 1.35 s post, 1.5x
drift WITHIN one bench run), "drift_factor" = probe / 0.987 (the
r8-record box), and "value_normalized" / "value_r8_basis_normalized" =
raw totals divided by the factor. r11 adds "ratio_to_probe" /
"extra_ratio_to_probe" (min(query) / probe-bracket-mean) as the
PRIMARY per-query cross-round metric — box drift cancels out of the
ratio, so regression triage is a diff of two bench JSONs. Reading
rule: raw totals stay authoritative within a single phase (interleaved
A/Bs); *_normalized totals are indicative only (ADVICE r10: the
uniform-drift assumption carries ±10-15%); any suspected per-query
regression is decided by ratio_to_probe and, if close, the
interleaved ratio test (tools/adjudicate_r10.py). The per-query [min, median, max] spread and the
extra-section timings are emitted on a PRECEDING line and mirrored to
BENCH_extra.json (the driver's tail capture truncated the old single
giant line in r3 and r6, losing the headline "value"). Each query is
fully materialized via the noop sink (no column pruning of the output,
no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark

# min-of-N per query: single-run noise on this box is ±40%, and a
# 2-sample min still caught a 3x outlier (embed_neardup_blocked 8.1s vs
# steady 2.6s). r7 showed n=3 still can't separate co-tenant load from
# real regression (spread maxes ran 2-4x the mins), so HEADLINE queries
# now take 5 samples and the parsed line carries BOTH the min total
# ("value") and the median total ("median"): a shifted median with a
# steady min = machine load; both shifted = a real plan change.
N_RUNS = 5
N_RUNS_EXTRA = 3  # extra section stays at 3 to bound total bench time

# new-in-r6 queries timed separately so the HEADLINE total stays
# comparable across rounds; reported under "extra" in the JSON line
EXTRA_QUERIES = [
    "text_repetition_family",
    "dedup_span_corpus",
    "c4_line_filter",
    "vocab_top_terms",
    "chunk_documents",
    "oov_rate",
    "dedup_levenshtein_pairs",
    "corpus_cube_stats",
    "rolling_despike",
    "bm25_topk",
    "sliding_window_counts",
    "exact_quantiles",
    "topk_per_group",
    "zorder_layout_key",
    "html_strip",
    "json_props_extract",
    "intersect_active_users",
    "hard_negatives",
    "soft_dedup_weights",
    "temperature_mix",
    "unicode_scrub",
    "token_compression",
    "trend_slope_qc",
    "unpivot_profile",
    "cusum_level_shift",
    "sample_per_group",
    "winsorize_values",
    "climatology_anomaly",
    "percentile_norm",
    "forward_fill_locf",
    "scd2_history",
    "flatline_runs",
    "state_durations",
    # new in r7 (stream_interval_join_left excluded: multi-batch
    # checkpointed streaming replay, not a throughput number)
    "ann_recall_report",
    "multimodal_png_pixels",
    "interpolate_linear",
    "variant_props_extract",
    # new in r8
    "ann_ivf_arrow_recall",
    "flagship_interpolated",
    # new in r10
    "multimodal_bmp_pixels",
    "multimodal_tiff_pixels",
    # new in r11
    "multimodal_wav_features",
    # new in r12
    "multimodal_jpeg_pixels",
    "multimodal_gif_pixels",
    # new in r13
    "multimodal_gif_frames",
    # new in r14 (the BPE registry addition; ratio freezes from its
    # first records per the amend-never-rebase rule)
    "bpe_train_merges",
    # new in r15 (ExactSubstr span removal promoted across the hash
    # gate; ratio freezes from its first records)
    "dedup_span_removal",
    # added in r15 without being new (ADVICE r14 #2): the r14 cache
    # removal changed this plan materially (exchanges 7 -> 17, shared
    # subtrees now recomputed) and it had NO bench record — first
    # records freeze its ratio like any new entry
    "incremental_corpus_dedup",
    # new in r16 (the hybrid BPE trainer promoted across the hash
    # gate; ratio freezes from its first records)
    "bpe_train_hybrid",
]

HEADLINE = [
    "flagship_tower_pipeline",
    "flagship_partitioned",
    "pricing_summary",
    "top_revenue",
    "dedup_keep_richest",
    "gapfill_spine",
    "lag_spike_qc",
    "flag_strings",
    "dedup_exact",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_cosine_topk",
    "embed_neardup_blocked",
    "multimodal_features",
    # promoted from the extra section in r9 (VERDICT r8 #3): the two
    # hottest LLM ops were judged on min-of-3 singles; they now get the
    # full n=5 + spread treatment. The parsed line also carries
    # "value_r8_basis" (total over the 16 pre-r9 headline queries) so
    # round-over-round totals stay apples-to-apples.
    "charlm_quality",
    "semantic_dedup",
]

# the pre-r9 headline set: basis for cross-round total comparison
_R8_BASIS = HEADLINE[:16]

# --- drift probe (VERDICT r9 #2) -------------------------------------
# The box slows uniformly over session hours (DECISIONS r9s3: identical
# code totals drifted 10.9 -> 12.2 -> 14.3 s; r9's recorded 1.25x
# "regression" was weather). Fix: immediately before EACH bench phase,
# time a fixed probe query and publish (a) the raw probe numbers and
# (b) drift-normalized totals = raw_total / (probe_min / PROBE_REF).
# PROBE_REF is pinned to the r8-record box's pricing_summary min
# (BENCH_r08.json) — the same box state the cross-round records were
# set on. pricing_summary is the probe because it has had ZERO code
# changes since r6, a pushed-predicate 6-column scan + one agg (pure
# engine+box throughput), and its r9 drift (1.42x with no code change)
# matched the builder's measured same-code drift band.
DRIFT_PROBE = "pricing_summary"
DRIFT_PROBE_REF_SEC = 0.987  # r8-record box, min of 5
N_RUNS_PROBE = 3


def _py_probe_safe() -> float | None:
    """tools.drift.py_probe when importable (repo checkout), else None
    — bench.py must stay runnable standalone."""
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.drift import py_probe

        return py_probe()
    except Exception:
        return None


def _probe(qs, spark, sf_dir) -> float:
    samples = []
    for _ in range(N_RUNS_PROBE):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[DRIFT_PROBE](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("caf-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM/codegen once on the smallest query, and the Python
    # worker pool with a trivial Arrow batch (so the mapInPandas query
    # measures steady-state throughput, not one-time worker spawn)
    qs["wateryear_rollup"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # N timed runs per query, report the min — later runs amortize
    # codegen/JIT so numbers reflect steady-state throughput, and the min
    # suppresses machine-load noise between rounds. The per-query
    # [min, median, max] spread is emitted alongside so an environmental
    # blip (±30% load drift documented in DECISIONS round-5) is
    # self-diagnosing: a high max with a steady min = machine load, a
    # shifted min = a real plan change.
    probe_headline_pre = _probe(qs, spark, sf_dir)
    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        samples: list[float] = []
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        times[name] = round(samples[0], 3)
        medians[name] = round(samples[len(samples) // 2], 3)
        spread[name] = [
            round(samples[0], 3),
            round(samples[len(samples) // 2], 3),
            round(samples[-1], 3),
        ]
    total = round(sum(times.values()), 3)
    total_median = round(sum(medians.values()), 3)
    total_r8_basis = round(sum(times[n] for n in _R8_BASIS), 3)
    # extras keep n=3 but now record the FULL [min, median, max] spread
    # (VERDICT r8 #3: min-of-3 singles could not distinguish co-tenant
    # load from a real regression — the three samples were already being
    # taken, only the min was kept)
    # post-phase probe: the r10 shakedown run measured the probe at
    # 2.10 s BEFORE the headline phase and 1.35 s after it — the box
    # drifts 1.5x WITHIN one bench run, so a phase is normalized by the
    # mean of its bracketing probes, not a single pre-phase sample.
    probe_headline_post = _probe(qs, spark, sf_dir)
    probe_headline = round(
        (probe_headline_pre + probe_headline_post) / 2, 3
    )
    probe_extra_pre = probe_headline_post  # brackets both phases
    extra: dict[str, float] = {}
    extra_spread: dict[str, list[float]] = {}
    # r17 (VERDICT r16 #9): the extras phase demonstrably degrades
    # late-run on this box (2-3x swings — jpeg extras spread
    # [4.5, 23.1, 37.0] in the r16 pre record), so a pre/post probe
    # bracket around the WHOLE phase cannot localize which entries ran
    # degraded. One single-sample probe reading every
    # PROBE_TRACE_EVERY entries gives each entry a nearest-probe drift
    # context (sidecar "extra_probe_trace": [entries_done, probe_sec])
    # at ~1-2 s per sample — additive fields only, the headline JSON
    # line and every existing field are unchanged.
    PROBE_TRACE_EVERY = 8
    extra_probe_trace: list[list] = []
    for i, name in enumerate(EXTRA_QUERIES):
        if i % PROBE_TRACE_EVERY == 0:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[DRIFT_PROBE](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            extra_probe_trace.append([i, round(time.perf_counter() - t0, 3)])
        samples = []
        for _ in range(N_RUNS_EXTRA):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        extra[name] = round(samples[0], 3)
        extra_spread[name] = [round(x, 3) for x in samples]
    # The driver tail-captures stdout and parses the LAST JSON line; in
    # r3 and r6 a single giant line (headline + spread + extra) outgrew
    # the capture window and truncated away the "value" field (VERDICT r6
    # item 1). So: spread + extra go to a sidecar file AND a preceding
    # stdout line, and the FINAL line is the compact headline only.
    probe_extra_post = _probe(qs, spark, sf_dir)
    probe_extra = round((probe_extra_pre + probe_extra_post) / 2, 3)
    drift_headline = round(probe_headline / DRIFT_PROBE_REF_SEC, 3)
    drift_extra = round(probe_extra / DRIFT_PROBE_REF_SEC, 3)
    sidecar = {
        "spread": spread,
        "extra": extra,
        "extra_spread": extra_spread,
        "drift_probe_extra": probe_extra,
        "drift_probe_extra_pre_post": [probe_extra_pre, probe_extra_post],
        # r17: single-sample probe readings taken every 8 extras
        # entries ([entries_done_before_reading, probe_sec]) so each
        # entry has a nearest-probe drift context — see the loop above
        "extra_probe_trace": extra_probe_trace,
        "drift_factor_extra": drift_extra,
        "extra_normalized": {
            k: round(v / drift_extra, 3) for k, v in extra.items()
        },
        # VERDICT r10 #4: min(query)/probe-bracket-mean — the PRIMARY
        # cross-round per-query metric. The adjudicator already decides
        # on exactly this ratio (box drift cancels out of it); emitting
        # it per query makes next-round regression triage a diff of two
        # JSON files instead of a manual tool run. Compare a query's
        # ratio_to_probe against the prior round's: >2x = adjudicate
        # with the interleaved ratio test; totals stay for continuity.
        "extra_ratio_to_probe": {
            k: round(v / probe_extra, 3) for k, v in extra.items()
        },
        "sf": sf,
        "n": N_RUNS,
        "n_extra": N_RUNS_EXTRA,
        # r13: a pure-CPython probe alongside the JVM one — host steal
        # does not degrade the interpreter and the JVM 1:1 (measured
        # 1.4-1.7x divergence on Python-stage queries under load), so
        # mapInPandas-heavy queries normalize against THIS number in
        # cross-round reads. tools/drift.py py_probe, same
        # zero-change rule as the Spark probe.
        "drift_probe_py": _py_probe_safe(),
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_extra.json"),
            "w",
        ) as f:
            json.dump(sidecar, f, indent=1)
    except OSError:
        pass
    print(json.dumps(sidecar))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "median": total_median,
                "value_r8_basis": total_r8_basis,
                "drift_probe": probe_headline,
                "drift_probe_pre_post": [
                    probe_headline_pre,
                    probe_headline_post,
                ],
                "drift_probe_ref": DRIFT_PROBE_REF_SEC,
                "drift_factor": drift_headline,
                "value_normalized": round(total / drift_headline, 3),
                "value_r8_basis_normalized": round(
                    total_r8_basis / drift_headline, 3
                ),
                "unit": "sec",
                "queries": times,
                # per-query min / probe-bracket-mean (VERDICT r10 #4):
                # the primary cross-round metric — see sidecar docs
                "ratio_to_probe": {
                    k: round(v / probe_headline, 3) for k, v in times.items()
                },
                "sf": sf,
                "n": N_RUNS,
            }
        )
    )


if __name__ == "__main__":
    main()
