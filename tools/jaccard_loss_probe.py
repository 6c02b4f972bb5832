"""n-gram Jaccard `max_doc_freq` valve: TRUE-pair loss vs cap (VERDICT
r9 #3) — the one valve that discarded 98.6 % of candidate mass at the
2M tier with no recall number attached. Levenshtein (0.44 % at cap 256)
and SimHash (3.1 % at cap 1024) already have this curve; this probe
closes the set.

Design (mirrors the simhash seeded-pair loss probe): the r9 tier synth
(tools/tier_probe_r9.synth_docs) plants ~5.9 % mutant docs that replay
their id-1 neighbor with ~4 % word substitution. Those (id-1, id) pairs
are the KNOWN true near-dups.

- TRUTH: `jaccard_pairs(candidates=seeded)` — the candidates path
  verifies exact Jaccard per pair against the FULL shingle index (the
  cap only applies to the all-pairs form, dedup.py:272), with join
  fan-out bounded by |seeded| x shingles-per-doc. So exact truth is
  cheap even at a tier where the uncapped all-pairs join is the
  quadratic the valve exists to avoid.
- PER CAP: run the capped all-pairs form, inner-join its output to the
  truth pairs; loss = 1 - kept/|truth|. A true pair is lost when every
  shingle its two docs share is over-cap (it never forms a candidate)
  or when the undercounted intersection drops its lower-bound Jaccard
  below the threshold.

Usage: PYTHONPATH=/root/repo python tools/jaccard_loss_probe.py [out]
Env: N_DOCS (default 500000), CAPS (default "10,20,40,80,160").
Writes one JSON line; default out /tmp/jaccard_loss.json.
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

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import jaccard_pairs
from tools.tier_probe_r9 import synth_docs

THRESHOLD = 0.1  # the oracle-checked operating point (__spark_entry__)
SHINGLE_N = 3


def main() -> None:
    n_docs = int(os.environ.get("N_DOCS", "500000"))
    caps = [int(c) for c in os.environ.get("CAPS", "10,20,40,80,160").split(",")]
    spark = get_spark("jaccard-loss-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, n_docs // 8000)))
    tmp = tempfile.mkdtemp(prefix="caf_jacloss_")
    try:
        path = os.path.join(tmp, "docs")
        synth_docs(spark, n_docs).repartition(max(8, n_docs // 25_000)).write.parquet(path)
        docs = spark.read.parquet(path)

        seeded = (
            spark.range(n_docs)
            .filter((F.col("id") % 17 == 1) & (F.col("id") > 0))
            .select(
                (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
            )
        )
        truth = (
            jaccard_pairs(
                docs, n=SHINGLE_N, threshold=THRESHOLD, candidates=seeded
            )
            .select("id_a", "id_b")
            .cache()
        )
        n_truth = truth.count()
        out = {"n_docs": n_docs, "threshold": THRESHOLD, "n_true_pairs": n_truth, "caps": {}}
        print(json.dumps({"truth": n_truth}), flush=True)

        for cap in caps:
            spark.catalog.clearCache()
            truth.cache().count()  # keep truth resident across the clear
            t0 = time.perf_counter()
            capped = jaccard_pairs(
                docs, n=SHINGLE_N, threshold=THRESHOLD, max_doc_freq=cap
            )
            kept = capped.join(truth, ["id_a", "id_b"]).count()
            sec = round(time.perf_counter() - t0, 2)
            out["caps"][str(cap)] = {
                "kept_true": kept,
                "loss": round(1 - kept / max(n_truth, 1), 4),
                "sec": sec,
            }
            print(json.dumps({"cap": cap, **out["caps"][str(cap)]}), flush=True)

        dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaccard_loss.json"
        with open(dest, "w") as f:
            f.write(json.dumps(out))
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
