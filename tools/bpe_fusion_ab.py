"""r16 A/B: fused pending-merge rewrite in the per-merge BPE trainer.

Old shape: one chained MapInPandas per merge between checkpoints, so
the pair-count job after merge k re-pays k JVM<->Python crossings.
New shape (shipped): the un-checkpointed tail is ONE fused Python
stage (bpe._apply_merges). This probe replicates the OLD loop inline
(per-merge _apply_merge chain, identical checkpoint cadence) and
interleaves it with the shipped bpe_train at the registry budget
(_BPE_MERGES_Q merges, min_freq=1) on the sf0.1 documents corpus.
Merge-list identity between legs is asserted every round.

Usage: PYTHONPATH=/root/repo python tools/bpe_fusion_ab.py
Writes /tmp/bpe_fusion_ab.json.
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

N_ROUNDS = int(os.environ.get("N_ROUNDS", "4"))


def old_bpe_train(df, n_merges, min_freq, checkpoint_every=8):
    """The pre-r16 loop, verbatim shape: chained single-merge rewrites."""
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
        words = checkpoint(bpe._word_table(df, "text", False))
        merges = []
        for k in range(n_merges):
            best = bpe._top_pair(words)
            if best is None or best[2] < min_freq:
                break
            left, right, freq = best
            merges.append((k, left, right, freq))
            words = bpe._apply_merge(words, left, right)
            if (k + 1) % checkpoint_every == 0:
                words = checkpoint(words)
        return merges
    finally:
        bpe._release_rdds(spark, bpe._persistent_rdd_ids(spark) - outside)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-bpe-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    d = entrymod.T(spark, sf_dir, "documents")
    budget = entrymod._BPE_MERGES_Q
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    res = {"old": [], "new": []}
    for r in range(N_ROUNDS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        m_old = old_bpe_train(d, budget, 1)
        res["old"].append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        m_new = bpe.bpe_train(d, n_merges=budget, min_freq=1)
        res["new"].append(round(time.perf_counter() - t0, 3))
        assert m_old == m_new, (m_old, m_new)
    out = {
        "old_min": min(res["old"]),
        "new_min": min(res["new"]),
        "speedup": round(min(res["old"]) / min(res["new"]), 2),
        "merge_identity": "asserted every round",
        "budget": budget,
        **res,
    }
    with open("/tmp/bpe_fusion_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
