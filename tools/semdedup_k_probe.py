"""Follow-up probe: SemDeDup centroid-count scaling rule at the 100x
tier (500k vectors).

The r6 rule "n_centroids ∝ corpus" keeps the within-cluster PAIR cost
flat (Σ cluster² = k·(n/k)² = n²/k → linear in n when k ∝ n), but the
ASSIGNMENT stage is n·k cosine evaluations — quadratic in n under the
same rule. Total work  W(k) = a·n·k + b·n²/k  is minimized at
k* = √(b/a)·√n: the classic IVF balance point. This probe times
semdedup at 100x under both rules so SCALING.md's guidance is
measured, not argued:

- k ∝ n      (k=1600): pair stage flat, assignment dominates
- k ∝ √n     (k=160):  both stages n^1.5 — the balanced rule

and under both assignment implementations (expression-form vs the
numpy/Arrow `ivf_assign_arrow` throughput path), so the guidance in
SCALING.md is a measured 2x2, not an argument.

Usage: PYTHONPATH=/root/repo python tools/semdedup_k_probe.py
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

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from tools.scale_probe import synth_embeddings


def main() -> None:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        semdedup,
    )

    spark = get_spark("semdedup-k-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="caf_kprobe_")
    n = 500_000
    path = os.path.join(tmp, "embs")
    synth_embeddings(spark, n).repartition(64).write.parquet(path)
    embs = spark.read.parquet(path)
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    out = {}
    # the fourth cell of the 2x2 — (expr, k=1600) — is what
    # tools/scale_probe.py's 100x tier measures; reuse that number
    for klabel, k, assign in (
        ("k_sqrt_n_160", 160, "arrow"),
        ("k_prop_n_1600", 1600, "arrow"),
        ("k_sqrt_n_160", 160, "expr"),
    ):
        from tools.drift import bracket_fields, bracketed

        spark.catalog.clearCache()
        sec, bracket, _ = bracketed(
            spark,
            lambda: semdedup(
                embs,
                n_centroids=k,
                threshold=0.4,
                persist_cells=False,
                assign=assign,
            ).write.format("noop").mode("overwrite").save(),
        )
        out[f"{klabel}_{assign}"] = bracket_fields(sec, bracket)
        print(json.dumps(out), flush=True)
    print(json.dumps({"n_vectors": n, "times_sec": out}))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
