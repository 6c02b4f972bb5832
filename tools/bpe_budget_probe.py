"""BPE merge-budget probe (VERDICT r14 #4): measure how training cost
scales with n_merges one decade up (100 -> 1000) for the per-merge-job
trainer (`bpe_train`), and show the hybrid trainer
(`bpe_train_hybrid`: one histogram job + driver merge loop) at the
same and production-scale budgets — with a merge-for-merge identity
check between the two, so the speed path provably changes nothing.

The question being answered: the suite's 10-merge oracle hides a
structural bound — bpe_train pays one Spark job + driver round-trip
PER MERGE, so a 30-50k-merge production budget is hours of
driver-bound latency regardless of cluster size. The hybrid moves the
merge loop into driver memory over the corpus-size-independent word
histogram (the standard single-node trainer structure), keeping Spark
for the only corpus-sized stage (tokenize + count).

Usage: PYTHONPATH=/root/repo python tools/bpe_budget_probe.py
Writes /tmp/bpe_budget_r15.json; copy to BPE_BUDGET_r15.json on accept.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.bpe import (
    bpe_train,
    bpe_train_hybrid,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIST_BUDGETS = [int(x) for x in os.environ.get("DIST_BUDGETS", "100,1000").split(",")]
HYB_BUDGETS = [int(x) for x in os.environ.get("HYB_BUDGETS", "100,1000,10000,50000").split(",")]


def main() -> None:
    spark = get_spark("caf-bpe-budget")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    out: dict = {"sf_dir": SF_DIR, "distributed": {}, "hybrid": {}}

    dist_merges: dict[int, list] = {}
    for n in DIST_BUDGETS:
        t0 = time.perf_counter()
        m = bpe_train(docs, n_merges=n, min_freq=2)
        dt = time.perf_counter() - t0
        dist_merges[n] = m
        out["distributed"][str(n)] = {
            "sec": round(dt, 3),
            "merges_learned": len(m),
            "sec_per_merge": round(dt / max(len(m), 1), 4),
        }
        print(f"[dist] n={n}: {dt:.1f}s, learned {len(m)}", flush=True)

    hyb_merges: dict[int, list] = {}
    for n in HYB_BUDGETS:
        t0 = time.perf_counter()
        m = bpe_train_hybrid(docs, n_merges=n, min_freq=2)
        dt = time.perf_counter() - t0
        hyb_merges[n] = m
        out["hybrid"][str(n)] = {
            "sec": round(dt, 3),
            "merges_learned": len(m),
            "sec_per_merge": round(dt / max(len(m), 1), 4),
        }
        print(f"[hyb]  n={n}: {dt:.1f}s, learned {len(m)}", flush=True)

    # synthetic large-vocabulary leg: the sf0.1 corpus exhausts at
    # ~107 learnable merges (min_freq=2), so the production-budget
    # claim needs a vocabulary that can sustain tens of thousands of
    # merges. Build a Zipf-ish histogram of distinct words directly
    # (the trainer's input shape after the Spark aggregation) and
    # time the driver loop alone at production budgets.
    if os.environ.get("SYNTH", "1") == "1":
        import random

        rng = random.Random(42)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        n_words = int(os.environ.get("SYNTH_WORDS", "200000"))
        # one row per distinct word (uniform counts): the driver
        # loop's cost is governed by vocabulary size and merge count
        # — count magnitudes only change WHICH pair wins, not the
        # per-merge update work — so a uniform histogram times the
        # loop honestly without materializing Zipf-many corpus rows
        words = {
            "".join(rng.choice(alphabet) for _ in range(4 + (i % 9)))
            for i in range(n_words)
        }
        sdf = spark.createDataFrame([(w,) for w in words], "text string")
        out["synthetic"] = {"n_distinct_words": len(words)}
        for n in (1000, 10000, 30000):
            t0 = time.perf_counter()
            m = bpe_train_hybrid(sdf, n_merges=n, min_freq=1)
            dt = time.perf_counter() - t0
            out["synthetic"][str(n)] = {
                "sec": round(dt, 3),
                "merges_learned": len(m),
                "sec_per_merge": round(dt / max(len(m), 1), 5),
            }
            print(f"[synth] n={n}: {dt:.1f}s, learned {len(m)}", flush=True)

    # identity: the hybrid must reproduce the merge list of the
    # distributed trainer exactly at every shared budget
    ident = {}
    for n in DIST_BUDGETS:
        if n in hyb_merges:
            ident[str(n)] = hyb_merges[n] == dist_merges[n]
    out["merge_identity"] = ident
    assert all(ident.values()), f"merge lists diverged: {ident}"

    # headline ratio: wall-clock decade scaling of the distributed form
    if len(DIST_BUDGETS) >= 2:
        a, b = str(DIST_BUDGETS[0]), str(DIST_BUDGETS[-1])
        out["dist_decade_scaling"] = round(
            out["distributed"][b]["sec"] / out["distributed"][a]["sec"], 2
        )

    with open("/tmp/bpe_budget_r15.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
