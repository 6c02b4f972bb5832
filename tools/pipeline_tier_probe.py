"""Tier-probe the COMPOSED pipelines (VERDICT r9 #4):
`training_data_pipeline` (10 exchanges) and `corpus_curation` (9) have
only ever run at sf0.1 — and every scale bug so far (semdedup r7,
levenshtein blocks r8, simhash quadratic + AQE coalesce r9) was
invisible one decade early. This probe runs BOTH real query functions
(entrymod's own callables, zero re-implementation) over an
English-ish synthetic corpus at 125k/500k/2M docs and records tier
ratios, plus a cumulative stage breakdown at each tier to localize the
dominant stage.

Synth: the r9 tier synth's skeleton (Zipf body via rank = V^u,
boilerplate openings, ~5.9 % seeded mutants) but emitted as ALPHABETIC
pseudo-words with every 4th word an English stopword — so `lang_id`
resolves 'en', `quality_score` clears 0.6 (alpha ratio ~1, no digits),
and `dup_token_fraction` sits in natural-prose range; the pipelines'
filters keep the corpus instead of short-circuiting the probe. Table
schema matches /root/testdata documents (doc_id, text, lang, source,
n_chars).

Stage breakdown (cumulative prefixes, built from the same library ops
+ entrymod constants), timed on a cleared cache so the deltas bound
each stage's cost:
- training_data_pipeline: enrich+filter -> +exact dedup -> +near-dup
  clusters (minhash/CC) -> full (contamination + sample + shard +
  pack);
- corpus_curation (NEW r11 — VERDICT r10 #2: its 4.6x tier step at
  125k->500k had no per-stage breakdown to read): lang/quality
  enrich+filter -> +exact dedup -> +LSH candidates + Jaccard verify ->
  full (anti-join drops + stats).

VERDICT r10 #3: every timed cell is BRACKETED by the fixed synthetic
drift probe (tools/drift.py) and records {sec, probe_bracket,
sec_per_probe} — tier ratios are computed on sec_per_probe (drift
cancels), raw sec stays for continuity. TIER10's cost column ran
99->61->327 s non-monotone across caps for exactly this lack.

Usage: PYTHONPATH=/root/repo python tools/pipeline_tier_probe.py [out]
Env: TIERS="125000,500000,2000000".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm import (
    connected_components,
    minhash_lsh_pairs,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
    contamination,
    dup_token_fraction,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    jaccard_pairs,
    shingles,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    token_count,
)
from tools.drift import bracket_fields, bracketed

VOCAB = 50_000
# stopwords double as English lang-id markers; hash-rotated per slot
STOPS = ("the", "and", "of", "to", "in", "is", "with", "for")
OPEN = ("welcome to the", "about us and", "terms of the", "", "", "", "", "")


def synth_docs_en(spark, n: int):
    """English-ish synth: Zipf rank -> letters (digits transliterated),
    every 4th word a stopword, ~5.9 % seeded near-dup mutants."""
    u32 = lambda key: F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % 17 == 1) & (F.col("id") > 0), F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    base = base.select(
        "doc_id",
        "seed",
        (F.col("doc_id") != F.col("seed")).alias("is_mut"),
        (u32(F.concat(F.lit("len:"), F.col("seed"))) % 60 + 60).cast("int").alias("n_words"),
        F.element_at(
            F.array(*[F.lit(o) for o in OPEN]),
            (u32(F.concat(F.lit("open:"), F.col("seed"))) % 8 + 1).cast("int"),
        ).alias("op"),
    )

    def word(i):
        # rank = VOCAB^u (Zipf-ish), rendered alphabetic: digits -> letters
        rank = F.pow(
            F.lit(float(VOCAB)),
            u32(F.concat(F.col("seed"), F.lit(":"), i)) % 1_000_000 / 1_000_000.0,
        ).cast("bigint")
        zipf = F.concat(
            F.lit("w"), F.translate(rank.cast("string"), "0123456789", "abcdefghij")
        )
        stop = F.element_at(
            F.array(*[F.lit(s) for s in STOPS]),
            (u32(F.concat(F.lit("s"), F.col("seed"), F.lit(":"), i)) % 8 + 1).cast("int"),
        )
        mut = F.concat(
            F.lit("x"),
            F.translate(
                (u32(F.concat(F.col("doc_id"), F.lit("#"), i)) % VOCAB).cast("string"),
                "0123456789",
                "abcdefghij",
            ),
        )
        body = F.when(i % 4 == F.lit(0), stop).otherwise(zipf)
        return F.when(
            F.col("is_mut")
            & (u32(F.concat(F.lit("m"), F.col("doc_id"), F.lit(":"), i)) % 25 == 0),
            mut,
        ).otherwise(body)

    text = F.concat(
        F.when(F.col("op") == "", F.lit("")).otherwise(F.concat(F.col("op"), F.lit(" "))),
        F.array_join(F.transform(F.sequence(F.lit(1), F.col("n_words")), word), " "),
    )
    return base.select(
        "doc_id",
        text.alias("text"),
        F.when(u32(F.concat(F.lit("lang:"), F.col("doc_id"))) % 10 < 9, F.lit("en"))
        .otherwise(F.lit("de"))
        .alias("lang"),
        F.lit("synth").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))


_SPARK = None  # set in main(); lets timed() bracket without threading


def timed(build) -> dict:
    """Time CONSTRUCTION + execution: `connected_components` (inside
    training_data_pipeline) runs its iterative label-propagation loop
    eagerly while the plan is being BUILT, so timing only the noop
    materialization would let the pipeline's most expensive stage
    escape the clock (bench.py clocks the same way). Bracketed by the
    drift probe (VERDICT r10 #3); returns
    {sec, probe_bracket, sec_per_probe}."""
    sec, bracket, _ = bracketed(
        _SPARK, lambda: build().write.format("noop").mode("overwrite").save()
    )
    return bracket_fields(sec, bracket)


def tdp_prefixes(spark, sf_dir: str) -> dict:
    """Cumulative prefixes of the real training_data_pipeline dataflow
    (same constants, same ops) — deltas localize the dominant stage."""
    e = entrymod
    d = e.T(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)

    def enr():
        return corpus.select(
            "doc_id", "text", "lang",
            quality_score(F.col("text")).alias("quality"),
            dup_token_fraction("text").alias("dup_tok"),
            token_count(F.col("text")).alias("n_tok"),
            fingerprint_md5(F.col("text")).alias("fp"),
        ).filter(
            (F.col("quality") >= e._TDP_QUALITY_MIN)
            & (F.col("dup_tok") <= e._TDP_MAX_DUP)
        )

    out = {}
    spark.catalog.clearCache()
    out["p1_enrich_filter"] = timed(enr)
    spark.catalog.clearCache()
    kept0 = enr().cache()

    def build_kept1():
        keepers = kept0.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        return kept0.join(keepers, ["fp", "doc_id"])

    out["p2_exact_dedup"] = timed(build_kept1)
    kept1 = build_kept1().cache()

    def build_kept2():
        labels = connected_components(
            minhash_lsh_pairs(kept1, n=e._SHINGLE_N_Q)
        ).withColumnRenamed("id", "doc_id")
        return (
            kept1.join(labels, "doc_id", "left")
            .filter(F.coalesce("cluster", F.col("doc_id")) == F.col("doc_id"))
            .drop("cluster")
        )

    out["p3_neardup_clusters"] = timed(build_kept2)
    kept2 = build_kept2().cache()

    def build_full():
        clean = (
            contamination(kept2, bench, n=3, flag_threshold=e._TDP_CONTAM_MAX)
            .filter(~F.col("contaminated"))
            .select("doc_id")
        )
        return e.pack_chunks(
            e.assign_shards(
                e.sample_stratified(
                    kept2.join(clean, "doc_id"), "doc_id", "lang",
                    e._TDP_FRACS, e._TDP_DEFAULT_FRAC, seed=e._TDP_SEED,
                ),
                "doc_id", e._TDP_SHARDS, seed=e._TDP_SEED,
            ),
            "n_tok", budget=e._TDP_BUDGET,
        )

    out["p4_contam_to_end"] = timed(build_full)
    spark.catalog.clearCache()
    return out


def cc_prefixes(spark, sf_dir: str) -> dict:
    """Cumulative prefixes of the real corpus_curation dataflow (same
    constants, same ops as entrymod.q_corpus_curation) — VERDICT r10
    #2: the 4.6x tier step needed a per-stage breakdown to be readable.
    Deltas between prefixes bound each stage's cost."""
    e = entrymod
    d = e.T(spark, sf_dir, "documents")

    def enr():
        return d.select(
            "doc_id", "text",
            lang_id(F.col("text")).alias("lang_pred"),
            quality_score(F.col("text")).alias("quality"),
            token_count(F.col("text")).alias("n_tokens"),
            fingerprint_md5(F.col("text")).alias("fp"),
        ).filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.6))

    out = {}
    spark.catalog.clearCache()
    out["c1_lang_quality_filter"] = timed(enr)
    spark.catalog.clearCache()
    kept0 = enr().cache()

    def build_kept():
        keepers = kept0.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        return kept0.join(keepers, ["fp", "doc_id"])

    out["c2_exact_dedup"] = timed(build_kept)
    kept = build_kept().cache()

    def build_ver():
        sh = shingles(kept, n=e._SHINGLE_N_Q).cache()
        cand = minhash_lsh_pairs(kept, n=e._SHINGLE_N_Q, shingles_df=sh)
        return jaccard_pairs(
            kept, n=e._SHINGLE_N_Q, threshold=0.1, candidates=cand, shingles_df=sh
        )

    out["c3_lsh_jaccard_verify"] = timed(build_ver)

    def build_full():
        drops = build_ver().select(F.col("id_b").alias("doc_id")).distinct()
        return kept.join(drops, "doc_id", "left_anti").select(
            "doc_id", "n_tokens", "quality"
        )

    out["c4_antijoin_stats"] = timed(build_full)
    spark.catalog.clearCache()
    return out


def codec_stage(spark, sf_dir: str) -> dict:
    """r13 (VERDICT r12 #5): a composed synthesize -> decode ->
    features stage with the REAL JPEG codec in the loop, so the
    CPU-bound Arrow stage's scaling is MEASURED, not asserted. Every
    3rd doc is a color 4:2:0 JPEG, every 5th progressive (SOF2) —
    the same mix as q_multimodal_jpeg. Returns the bracketed timing
    plus docs/sec/core (cores = defaultParallelism)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.multimodal import (
        extract_features,
        text_to_jpeg_payload,
    )

    e = entrymod
    d = e.T(spark, sf_dir, "documents")
    cores = spark.sparkContext.defaultParallelism

    def build():
        payload = text_to_jpeg_payload(
            d,
            "text",
            color_every=3,
            progressive_every=5,
            n_partitions=cores,
        )
        return extract_features(payload).select("doc_id", "pixel_sum")

    spark.catalog.clearCache()
    n = d.count()
    rec = timed(build)
    rec["n_docs"] = n
    rec["docs_per_sec_per_core"] = round(n / max(rec["sec"], 1e-6) / cores, 1)
    return rec


def main() -> None:
    global _SPARK
    tiers = [int(x) for x in os.environ.get("TIERS", "125000,500000,2000000").split(",")]
    codec_only = os.environ.get("CODEC_ONLY", "") == "1"
    spark = get_spark("pipeline-tier-probe")
    _SPARK = spark
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    tmp = tempfile.mkdtemp(prefix="caf_ptier_")
    results: dict = {}
    try:
        for n in tiers:
            tier_dir = os.path.join(tmp, f"t{n}")
            os.makedirs(tier_dir, exist_ok=True)
            spark.conf.set("spark.sql.shuffle.partitions", str(max(32, n // 8000)))
            synth_docs_en(spark, n).repartition(max(8, n // 25_000)).write.parquet(
                os.path.join(tier_dir, "documents.parquet")
            )
            docs = spark.read.parquet(os.path.join(tier_dir, "documents.parquet"))
            row = docs.select(
                F.count(F.lit(1)).alias("n"),
                F.sum((quality_score("text") >= 0.6).cast("int")).alias("q_pass"),
            ).first()
            res = {"n_docs": n, "quality_pass_frac": round(row["q_pass"] / row["n"], 3)}
            if not codec_only:
                for qname in ("corpus_curation", "training_data_pipeline"):
                    reps = []
                    for _ in range(2):
                        spark.catalog.clearCache()
                        reps.append(timed(lambda: qs[qname](spark, tier_dir)))
                    best = min(reps, key=lambda r: r["sec_per_probe"])
                    res[qname] = {**best, "rep_secs": [r["sec"] for r in reps]}
                res["tdp_stages"] = tdp_prefixes(spark, tier_dir)
                res["cc_stages"] = cc_prefixes(spark, tier_dir)
            res["jpeg_codec_stage"] = codec_stage(spark, tier_dir)
            results[str(n)] = res
            print(json.dumps({"tier_done": n, **res}), flush=True)
            shutil.rmtree(tier_dir, ignore_errors=True)
        # tier ratios on the drift-cancelled number (raw kept alongside)
        ratios = {}
        for lo, hi in zip(tiers, tiers[1:]):
            ratios[f"{hi}/{lo}"] = {
                k: {
                    "sec_per_probe": round(
                        results[str(hi)][k]["sec_per_probe"]
                        / max(results[str(lo)][k]["sec_per_probe"], 1e-3),
                        1,
                    ),
                    "raw": round(
                        results[str(hi)][k]["sec"]
                        / max(results[str(lo)][k]["sec"], 1e-3),
                        1,
                    ),
                }
                for k in (
                    ("jpeg_codec_stage",)
                    if codec_only
                    else ("corpus_curation", "training_data_pipeline", "jpeg_codec_stage")
                )
            }
        payload = {"tiers": results, "ratios": ratios}
        line = json.dumps(payload)
        print(line)
        dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipeline_tier.json"
        with open(dest, "w") as f:
            f.write(line)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
