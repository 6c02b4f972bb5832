"""r17 A/B: fused rewrite+pair-count stage in the per-merge BPE trainer
(VERDICT r16 #5).

Old shape (r16): the pair-count job after merge k applied the pending
merge tail in ONE Python stage (_apply_merges) and then shipped the
rewritten symbol arrays back to the JVM for the transform/explode
adjacent-pair count (_top_pair) — a word-table-sized Arrow return plus
a word-table-sized explode per iteration.
New shape (shipped): _pair_counts_after_merges folds the adjacent-pair
count into the same Python pass — each batch emits a dict-aggregated
(left, right, freq) histogram, so only histogram rows cross back and
the explode disappears.

This probe replicates the OLD loop inline (identical checkpoint
cadence) and interleaves it with the shipped bpe_train at the registry
budget (_BPE_MERGES_Q merges, min_freq=1) on the sf0.1 documents
corpus. Merge-list identity between legs is asserted every round.

A second phase sweeps checkpoint_every (4/8/16) on the shipped loop
(VERDICT r16 #5's other half).

Usage: PYTHONPATH=/root/repo python tools/bpe_paircount_ab.py
Writes /tmp/bpe_paircount_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm import bpe
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark

N_ROUNDS = int(os.environ.get("N_ROUNDS", "5"))
SWEEP = [int(x) for x in os.environ.get("SWEEP", "4,8,16").split(",") if x]


def old_bpe_train(df, n_merges, min_freq, checkpoint_every=8):
    """The r16 loop, verbatim shape: fused rewrite tail, JVM pair count."""
    spark = df.sparkSession
    outside = bpe._persistent_rdd_ids(spark)
    held: set[int] = set()

    def checkpoint(frame):
        nonlocal held
        out = frame.localCheckpoint()
        now = bpe._persistent_rdd_ids(spark) - outside
        stale = held & now
        bpe._release_rdds(spark, stale)
        held = now - stale
        return out

    try:
        base = checkpoint(bpe._word_table(df, "text", False))
        pending = []
        merges = []
        for k in range(n_merges):
            best = bpe._top_pair(bpe._apply_merges(base, pending))
            if best is None or best[2] < min_freq:
                break
            left, right, freq = best
            merges.append((k, left, right, freq))
            pending.append((left, right))
            if (k + 1) % checkpoint_every == 0:
                base = checkpoint(bpe._apply_merges(base, pending))
                pending = []
        return merges
    finally:
        bpe._release_rdds(spark, bpe._persistent_rdd_ids(spark) - outside)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-bpe-ab-r17")
    spark.sparkContext.setLogLevel("ERROR")
    d = entrymod.T(spark, sf_dir, "documents")
    budget = entrymod._BPE_MERGES_Q
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    res = {"old": [], "new": []}
    for _ in range(N_ROUNDS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        m_old = old_bpe_train(d, budget, 1)
        res["old"].append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        m_new = bpe.bpe_train(d, n_merges=budget, min_freq=1)
        res["new"].append(round(time.perf_counter() - t0, 3))
        assert m_old == m_new, (m_old, m_new)

    sweep = {}
    for ce in SWEEP:
        samples = []
        ref = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            m = bpe.bpe_train(d, n_merges=budget, min_freq=1, checkpoint_every=ce)
            samples.append(round(time.perf_counter() - t0, 3))
            if ref is None:
                ref = m
            assert m == ref
        sweep[str(ce)] = {"min": min(samples), "samples": samples}

    out = {
        "old_min": min(res["old"]),
        "new_min": min(res["new"]),
        "speedup": round(min(res["old"]) / min(res["new"]), 2),
        "merge_identity": "asserted every round",
        "budget": budget,
        "checkpoint_every_sweep": sweep,
        **res,
    }
    with open("/tmp/bpe_paircount_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
