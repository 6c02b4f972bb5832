"""VERDICT r15 #6: price `incremental_dedup`'s leak-free recompute at
a PRODUCTION-shaped tier. INCREMENTAL_AB_r15.json measured the
recompute multiplier at sf0.1's base/new ratio (~3:1) and read 1.27x;
the docstring's daily-refresh argument (base >> new) predicts the
multiplier grows with the base side, because the recomputed shared
subtrees include the BASE-sized shingle/signature tables.

This probes base=2M / new=20k synth docs (100:1, the daily-refresh
shape) in three arms, interleaved in one process, min basis:

- default: the leak-free plan the registry query runs (shared
  subtrees re-evaluated);
- cache_out: the five intermediates persisted via ``cache_out=[]``
  and explicitly unpersisted after the materialization (the
  documented in-memory opt-in);
- checkpoint: the base side pre-written to parquet ONCE outside the
  timed window and read back — the docstring's recommended 100 TB
  materialization (a daily refresh would reuse yesterday's parquet
  base anyway), then the default leak-free plan over the parquet
  base. Prices what fraction of the multiplier is pure base-rescan.

The verdict decides the SCALING.md guidance line, not the default:
the registry/driver query stays leak-free regardless (a library op
may not leak persists into the caller's session).

Usage: PYTHONPATH=/root/repo python tools/incremental_tier_probe.py [out]
Env: BASE_N=2000000, NEW_N=20000, N_AB=3.
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
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    incremental_dedup,
)
from tools.drift import drift_probe
from tools.pipeline_tier_probe import synth_docs_en

BASE_N = int(os.environ.get("BASE_N", "2000000"))
NEW_N = int(os.environ.get("NEW_N", "20000"))
N_AB = int(os.environ.get("N_AB", "3"))


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/incremental_tier_probe.json"
    )
    spark = get_spark("caf-incremental-tier")
    spark.sparkContext.setLogLevel("ERROR")

    # one synth of BASE_N + NEW_N docs; ids split disjointly
    all_docs = synth_docs_en(spark, BASE_N + NEW_N)
    base = all_docs.filter(F.col("doc_id") < BASE_N)
    new = all_docs.filter(F.col("doc_id") >= BASE_N)

    tmp = tempfile.mkdtemp(prefix="caf_inc_tier_")
    base_pq = os.path.join(tmp, "base.parquet")
    # the checkpoint arm's base materialization happens ONCE, untimed:
    # a production daily refresh reads yesterday's parquet base
    base.write.mode("overwrite").parquet(base_pq)
    base_from_pq = spark.read.parquet(base_pq)

    def survivors(df) -> int:
        return df.agg(F.count(F.lit(1))).collect()[0][0]

    def timed(fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fn()
        return round(time.perf_counter() - t0, 2), n

    arms: dict[str, list[float]] = {"default": [], "cache_out": [], "checkpoint": []}
    counts: dict[str, int] = {}
    probes: list[float] = []
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    for r in range(N_AB):
        probes.append(drift_probe(spark))
        sec, n = timed(lambda: survivors(incremental_dedup(new, base)))
        arms["default"].append(sec)
        counts["default"] = n

        handles: list = []
        sec, n = timed(
            lambda: survivors(incremental_dedup(new, base, cache_out=handles))
        )
        for h in handles:
            h.unpersist()
        arms["cache_out"].append(sec)
        counts["cache_out"] = n

        sec, n = timed(lambda: survivors(incremental_dedup(new, base_from_pq)))
        arms["checkpoint"].append(sec)
        counts["checkpoint"] = n
        print(
            json.dumps({"round": r, **{k: v[-1] for k, v in arms.items()}}),
            flush=True,
        )
    probes.append(drift_probe(spark))
    leaked = len(spark.sparkContext._jsc.getPersistentRDDs()) - before

    assert len(set(counts.values())) == 1, f"arms disagree on survivors: {counts}"
    mins = {k: min(v) for k, v in arms.items()}
    out = {
        "_provenance": (
            f"interleaved 3-arm x {N_AB} at base={BASE_N}/new={NEW_N} "
            "synth docs (tools/pipeline_tier_probe.synth_docs_en), min "
            "basis, survivors-count materialization. checkpoint arm's "
            "parquet base written once OUTSIDE the timed window (the "
            "daily-refresh reuse shape)."
        ),
        "base_docs": BASE_N,
        "new_docs": NEW_N,
        "survivors": counts["default"],
        "probe_per_round": [round(p, 3) for p in probes],
        "arms_sec": {k: v for k, v in arms.items()},
        "min_sec": mins,
        "recompute_multiplier_vs_cache": round(
            mins["default"] / mins["cache_out"], 2
        ),
        "recompute_multiplier_vs_checkpoint": round(
            mins["default"] / mins["checkpoint"], 2
        ),
        "persistent_rdds_leaked": leaked,
    }
    assert leaked == 0, out
    shutil.rmtree(tmp, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
