"""Round-9 tier probe: one more decade (to 2M docs) for the four
pair-formers VERDICT r8 #2 called out — n-gram Jaccard inverted index
(`max_doc_freq` occupancy), cross-doc span dedup (was 2.7x last decade
— super-linear drift?), MinHash LSH banding occupancy, and the
levenshtein prefix-block valve's pair-loss curve vs cap.

Both real scale bugs so far (semdedup n*k assignment in r7, levenshtein
degenerate blocks in r8) were invisible one decade earlier — that is
the argument for extending the probe before trusting the 100 TB story.

Corpus synthesis (fully Spark-side — the r8 word-shuffle-replica synth
is prep-dominating past ~500k docs, so this probe generates directly):

- **Zipf-ish vocabulary**: word rank = floor(V^u) with u uniform from
  md5 — log-uniform over ranks, i.e. the harmonic (Zipf s~1) shape, so
  hot words/shingles exist and the `max_doc_freq` valve has real work.
- **Boilerplate openings**: each doc starts with one of 8 fixed
  phrases (common page openings) — this is exactly the degenerate
  shared-prefix disease the r8 valve was built for, reproduced at
  controlled scale so block occupancy is measurable.
- **Seeded near-dups**: docs with id % 17 == 1 replay their neighbor's
  (id-1) text with ~4% of words substituted — real pairs for all four
  families to find, so the levenshtein pair-loss curve counts genuine
  kept/lost pairs, not zeros.

All content is md5-deterministic: tiers are reproducible bit-for-bit.

Occupancy is measured from the BLOCK-SIZE aggregates (sum of C(bn, 2)
per shingle/bucket/prefix), not by running the pair join twice — the
candidate count is a cheap groupBy over the index, the join is the
expensive thing being predicted.

Usage: PYTHONPATH=/root/repo python tools/tier_probe_r9.py [out.json]
Env: TIERS="50000,500000,2000000" to override.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pair-former hash-agg state at the 2M tier needs headroom; must be
# set before the JVM starts (same rationale as tools/scale_probe.py).
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    cross_doc_span_fraction,
    jaccard_pairs,
    levenshtein_blocked_pairs,
    lsh_buckets,
    minhash_lsh_pairs,
    minhash_signatures,
    shingles,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.text import norm_text

VOCAB = 50_000
MAX_DOC_FREQ = 40  # = _MAX_DOC_FREQ_Q, the oracle-checked valve
LEV_CAP = 256  # the r8-tuned default block cap
# openings are SHORTER than the 16-char levenshtein prefix so blocks
# split on the first Zipf body word (a boilerplate opening LONGER than
# the prefix degenerates to 8 corpus-sized blocks — measured in the
# first smoke run: every candidate pair over-cap at every tier, which
# tests nothing). Half the docs get no opening at all (empty string):
# their prefix is pure body, giving the fine-grained block population.
OPENINGS = (
    "welcome to",
    "about us",
    "faq on",
    "terms of",
    "privacy",
    "notice",
    "intro to",
    "",
    "",
    "",
    "",
    "",
    "",
    "",
    "",
    "",
)


def synth_docs(spark, n: int):
    """n synthetic docs: Zipf-ish body, boilerplate opening, ~5.9%
    seeded near-dup mutants of their id-1 neighbor."""
    opening = F.element_at(
        F.array(*[F.lit(o) for o in OPENINGS]),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("open:"), F.col("seed"))), 1, 6), 16, 10).cast("bigint")
            % 16
            + 1
        ).cast("int"),
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when((F.col("id") % 17 == 1) & (F.col("id") > 0), F.col("id") - 1)
            .otherwise(F.col("id"))
            .alias("seed"),
        )
        .select(
            "doc_id",
            "seed",
            (F.col("doc_id") != F.col("seed")).alias("is_mut"),
            (
                F.conv(F.substring(F.md5(F.concat(F.lit("len:"), F.col("seed"))), 1, 8), 16, 10).cast("bigint")
                % 60
                + 60
            ).cast("int").alias("n_words"),
            opening.alias("op"),
        )
        .select(
            "doc_id",
            F.concat(
                F.when(F.col("op") == "", F.lit("")).otherwise(F.concat(F.col("op"), F.lit(" "))),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.col("n_words")),
                        lambda i: F.when(
                            F.col("is_mut")
                            & (
                                F.conv(
                                    F.substring(F.md5(F.concat(F.lit("m"), F.col("doc_id"), F.lit(":"), i)), 1, 4),
                                    16,
                                    10,
                                ).cast("bigint")
                                % 25
                                == 0
                            ),
                            # substituted word: doc-specific, disjoint prefix
                            F.concat(
                                F.lit("x"),
                                (
                                    F.conv(
                                        F.substring(F.md5(F.concat(F.col("doc_id"), F.lit("#"), i)), 1, 8), 16, 10
                                    ).cast("bigint")
                                    % VOCAB
                                ),
                            ),
                        ).otherwise(
                            # Zipf-ish body word from the SEED stream
                            F.concat(
                                F.lit("w"),
                                F.pow(
                                    F.lit(float(VOCAB)),
                                    F.conv(
                                        F.substring(F.md5(F.concat(F.col("seed"), F.lit(":"), i)), 1, 12), 16, 10
                                    ).cast("bigint")
                                    % 1_000_000
                                    / 1_000_000.0,
                                ).cast("bigint"),
                            )
                        ),
                    ),
                    " ",
                ),
            ).alias("text"),
        )
    )


def timed_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def occupancy(counts_df, col: str) -> dict:
    """max block size, #blocks, and candidate-pair mass sum(C(bn,2))
    from a (key -> bn) count frame."""
    row = counts_df.agg(
        F.max(col).alias("max_bn"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col(col) * (F.col(col) - 1) / 2).alias("cand_pairs"),
        F.sum(F.when(F.col(col) > MAX_DOC_FREQ, F.col(col) * (F.col(col) - 1) / 2).otherwise(F.lit(0))).alias(
            "pairs_over_cap"
        ),
    ).first()
    return {
        "max": int(row["max_bn"]),
        "n_blocks": int(row["n_blocks"]),
        "cand_pairs": int(row["cand_pairs"]),
        "pairs_over_df_cap": int(row["pairs_over_cap"]),
    }


def probe_tier(spark, docs, n: int) -> dict:
    out = {"n_docs": n}
    # shuffle partitions scale with the tier (the one knob a real
    # cluster scales with data; AQE coalesces excess)
    parts = max(32, n // 8000)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    out["shuffle_partitions"] = parts

    # --- occupancy FIRST (cheap aggs that predict the joins) ---
    sh = shingles(docs, "text", "doc_id", 3)
    df_counts = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("bn"))
    out["shingle_occupancy"] = occupancy(df_counts, "bn")

    sig = minhash_signatures(docs)
    bkt = lsh_buckets(sig).groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bn"))
    out["lsh_bucket_occupancy"] = occupancy(bkt, "bn")

    nrm = docs.select(F.substring(norm_text("text"), 1, 16).alias("bk"))
    blk = nrm.groupBy("bk").agg(F.count(F.lit(1)).alias("bn"))
    row = blk.agg(
        F.max("bn").alias("max_bn"),
        F.sum(F.col("bn") * (F.col("bn") - 1) / 2).alias("cand_pairs"),
        F.sum(F.when(F.col("bn") > LEV_CAP, F.col("bn") * (F.col("bn") - 1) / 2).otherwise(F.lit(0))).alias(
            "pairs_over_cap"
        ),
    ).first()
    out["lev_block_occupancy"] = {
        "max": int(row["max_bn"]),
        "cand_pairs": int(row["cand_pairs"]),
        "pairs_dropped_by_cap": int(row["pairs_over_cap"]),
    }

    # --- timed operators (noop-materialized, best of 2) ---
    for name, build in {
        "span_dedup": lambda: cross_doc_span_fraction(docs, n=13),
        "jaccard_capped": lambda: jaccard_pairs(docs, n=3, threshold=0.1, max_doc_freq=MAX_DOC_FREQ),
        "minhash_lsh": lambda: minhash_lsh_pairs(docs),
        "lev_capped": lambda: levenshtein_blocked_pairs(docs, max_block_size=LEV_CAP),
    }.items():
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            best = min(best, timed_noop(build()))
        out[name] = best
    return out


def lev_loss_curve(spark, docs) -> dict:
    """Kept-pair count + time per block cap: the valve's recall floor
    as a measured curve, normalized to the largest cap probed."""
    from tools.drift import bracket_fields, bracketed

    curve = {}
    for cap in (64, 256, 1024, 4096):
        spark.catalog.clearCache()
        sec, bracket, kept = bracketed(
            spark,
            lambda: levenshtein_blocked_pairs(docs, max_block_size=cap).count(),
        )
        curve[str(cap)] = {"pairs": kept, **bracket_fields(sec, bracket)}
    ref = max(c["pairs"] for c in curve.values()) or 1
    for c in curve.values():
        c["loss_vs_max_cap"] = round(1 - c["pairs"] / ref, 4)
    return curve


def main():
    tiers = [int(x) for x in os.environ.get("TIERS", "50000,500000,2000000").split(",")]
    spark = get_spark("tier-probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="caf_tier9_")
    results = {}
    loss = None
    try:
        for n in tiers:
            d = os.path.join(tmp, f"docs{n}")
            synth_docs(spark, n).repartition(max(8, n // 25_000)).write.parquet(d)
            docs = spark.read.parquet(d)
            results[str(n)] = probe_tier(spark, docs, n)
            print(json.dumps({"tier_done": n, **results[str(n)]}), flush=True)
            if n == 500_000:
                loss = lev_loss_curve(spark, docs)
                print(json.dumps({"lev_loss_curve": loss}), flush=True)
        keys = ("span_dedup", "jaccard_capped", "minhash_lsh", "lev_capped")
        ratios = {}
        for lo, hi in zip(tiers, tiers[1:]):
            ratios[f"{hi}/{lo}"] = {
                k: round(results[str(hi)][k] / max(results[str(lo)][k], 1e-3), 1) for k in keys
            }
        payload = {"tiers": results, "ratios": ratios, "lev_loss_curve_500k": loss}
        out = sys.argv[1] if len(sys.argv) > 1 else None
        line = json.dumps(payload)
        print(line)
        if out:
            with open(out, "w") as f:
                f.write(line)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
