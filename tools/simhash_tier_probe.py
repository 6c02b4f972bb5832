"""SimHash pigeonhole occupancy probe (round-9 follow-up to the
third-decade tier probe): the one pair-former missing from the r9
occupancy table, and the one with a structurally different scale story.

MinHash banding keys on 32-bit band hashes — bucket COUNT grows with
content diversity, so occupancy stays O(1) (measured 2-3 across three
decades). SimHash pigeonhole blocking keys on a FIXED bit-slice of the
signature: at 64 bits and max_hamming=6 the 7 blocks are ~9 bits wide,
so there are at most 2^9 = 512 buckets per block FOREVER. Candidate
mass is therefore Theta(n^2 / 2^w) — quadratic in the corpus with a
constant the signature width fixes at build time. Worse, SimHash bits
are majority votes over Zipf-distributed token hashes, so bucket
occupancy is skewed far above the uniform n/2^w floor.

This probe measures, per tier (50k/500k/2M synthetic docs — the same
md5-deterministic synth as tools/tier_probe_r9.py):
  - per-(blk, val) occupancy of the shipped simhash64_pairs layout
    (max, filled buckets, sum C(b,2) candidate mass),
  - the same for a 128-bit signature layout (4 x 32-bit md5 slices —
    the md5 the projection computes already HAS 128 bits; the wider
    signature is free) whose blocks are ~18 bits at h=6,
  - wall time of the full pair join where the predicted mass is sane
    (the 2M/64-bit join is predicted O(10^10) candidates — reported,
    not run).

Usage: PYTHONPATH=/root/repo python tools/simhash_tier_probe.py [out.json]
Env: TIERS="50000,500000,2000000", JOIN_TIERS="50000,500000" to override.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    pigeonhole_blocks,
    simhash64,
    simhash64_blocks,
    simhash64_pairs,
)
from tools.tier_probe_r9 import synth_docs

MAX_HAMMING = 6


def block_occupancy(sig, blocks, cols) -> dict:
    """Tag every signature row with its (blk, val) keys and aggregate
    bucket occupancy — the cheap agg that predicts the pair join."""
    tagged = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("blk"),
                        F.shiftright(F.col(col), s)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("val"),
                    )
                    for j, (col, s, w) in enumerate(blocks)
                ]
            )
        ).alias("b")
    ).select(F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    counts = tagged.groupBy("blk", "val").agg(F.count(F.lit(1)).alias("bn"))
    row = counts.agg(
        F.max("bn").alias("max_bn"),
        F.count(F.lit(1)).alias("filled"),
        F.sum(F.col("bn") * (F.col("bn") - 1) / 2).alias("cand"),
    ).first()
    return {
        "n_blocks": len(blocks),
        "block_widths": sorted({w for _, _, w in blocks}),
        "max_bucket": int(row["max_bn"]),
        "filled_buckets": int(row["filled"]),
        "cand_pairs": int(row["cand"]),
    }


def simhash128_blocks(max_hamming: int) -> list[tuple[str, int, int]]:
    """(slice_column, start, width) for max_hamming+1 pigeonhole blocks
    balanced over FOUR 32-bit md5 slices (probe-local twin of the
    library layout so the probe can predict before the operator ships)."""
    n = max_hamming + 1
    per = [(n + 3 - i) // 4 for i in range(4)]  # balanced split over 4 slices
    cols = ["sh_a", "sh_b", "sh_c", "sh_d"]
    out = []
    for col, k in zip(cols, per):
        if k:
            out += [(col, s, w) for s, w in pigeonhole_blocks(32, k)]
    return out


def simhash128_sig(docs):
    """(id, sh_a..sh_d): 4 x 32-bit per-bit majority votes, one md5."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.text import norm_text

    toks = F.split(norm_text("text"), " ")
    tok = docs.select(F.col("doc_id").alias("id"), F.explode(toks).alias("tok")).select(
        "id",
        *[
            F.conv(F.substring(F.md5(F.col("tok")), 1 + 8 * i, 8), 16, 10)
            .cast("bigint")
            .alias(f"h_{c}")
            for i, c in enumerate("abcd")
        ],
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col(f"h_{c}"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{c}_{i}")
        for c in "abcd"
        for i in range(32)
    ]
    sig = tok.groupBy("id").agg(*votes)
    outs = []
    for c in "abcd":
        acc = F.lit(0).cast("bigint")
        for i in range(32):
            acc = acc + F.when(F.col(f"v_{c}_{i}") > 0, F.lit(2**i).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        outs.append(acc.alias(f"sh_{c}"))
    return sig.select("id", *outs)


def loss_curve_128(spark, docs) -> dict:
    """Kept-pair count + wall time per occupancy cap for
    simhash128_pairs — the valve's measured recall floor, normalized to
    the exact (uncapped) run, plus recovery of the synth's SEEDED
    near-dup pairs (id-1, id) — the pairs that matter, not just mass."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        simhash128_pairs,
    )

    from tools.drift import bracket_fields, bracketed

    curve = {}
    for cap in (64, 256, 1024, None):
        spark.catalog.clearCache()

        def cell():
            pairs = simhash128_pairs(
                docs, max_hamming=MAX_HAMMING, max_bucket_size=cap
            )
            return pairs.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(
                        (F.col("id_b") - F.col("id_a") == 1)
                        & (F.col("id_b") % 17 == 1),
                        1,
                    ).otherwise(0)
                ).alias("seeded"),
            ).first()

        sec, bracket, agg = bracketed(spark, cell)
        curve[str(cap)] = {
            "pairs": int(agg["n"]),
            "seeded_pairs": int(agg["seeded"] or 0),
            **bracket_fields(sec, bracket),
        }
    ref = curve["None"]
    for c in curve.values():
        c["loss_vs_exact"] = round(1 - c["pairs"] / max(ref["pairs"], 1), 4)
        c["seeded_loss_vs_exact"] = round(
            1 - c["seeded_pairs"] / max(ref["seeded_pairs"], 1), 4
        )
    return curve


def main():
    tiers = [int(x) for x in os.environ.get("TIERS", "50000,500000,2000000").split(",")]
    join_tiers = {
        int(x)
        for x in os.environ.get("JOIN_TIERS", "50000,500000").split(",")
        if x.strip()
    }
    spark = get_spark("simhash-tier-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="caf_simhash_tier_")
    results = {}
    try:
        for n in tiers:
            parts = max(32, n // 8000)
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            d = os.path.join(tmp, f"docs{n}")
            synth_docs(spark, n).repartition(max(8, n // 25_000)).write.parquet(d)
            docs = spark.read.parquet(d)
            out = {"n_docs": n, "shuffle_partitions": parts}

            sig64 = simhash64(docs).cache()
            sig64.count()
            out["occ64"] = block_occupancy(sig64, simhash64_blocks(MAX_HAMMING), None)

            sig128 = simhash128_sig(docs).cache()
            sig128.count()
            out["occ128"] = block_occupancy(sig128, simhash128_blocks(MAX_HAMMING), None)

            if n in join_tiers:
                from tools.drift import bracket_fields, bracketed

                sec, bracket, n_pairs = bracketed(
                    spark,
                    lambda: simhash64_pairs(docs, max_hamming=MAX_HAMMING).count(),
                )
                out["join64"] = {"pairs": n_pairs, **bracket_fields(sec, bracket)}
            if os.environ.get("LOSS") and n == 500_000:
                out["loss_curve_128"] = loss_curve_128(spark, docs)
            sig64.unpersist()
            sig128.unpersist()
            results[str(n)] = out
            print(json.dumps({"tier_done": n, **out}), flush=True)
        dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/simhash_tier_probe.json"
        with open(dest, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {dest}")
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
