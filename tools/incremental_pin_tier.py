"""r16: does the pinned-exchange leak-free form of incremental_dedup
reclaim the 1.98x recompute multiplier at the production shape?

Three arms at base=2M / new=20k synth docs (the INCREMENTAL_TIER_r16
shape), interleaved, min basis:
- old: the pre-r16 leak-free body (shared subtrees re-evaluated) —
  inline copy from tools/incremental_pin_ab.py;
- pinned: the shipped r16 leak-free form (shared frames end in a
  deterministic repartition(id); AQE stage reuse materializes each
  once, zero session storage);
- cache_out: the persisted opt-in (the 82 s reference arm from
  INCREMENTAL_TIER_r16.json).

Usage: PYTHONPATH=/root/repo python tools/incremental_pin_tier.py [out]
Env: BASE_N, NEW_N, N_AB (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    incremental_dedup,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from tools.incremental_pin_ab import old_incremental_dedup
from tools.pipeline_tier_probe import synth_docs_en

BASE_N = int(os.environ.get("BASE_N", "2000000"))
NEW_N = int(os.environ.get("NEW_N", "20000"))
N_AB = int(os.environ.get("N_AB", "2"))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/incremental_pin_tier.json"
    spark = get_spark("caf-incr-pin-tier")
    spark.sparkContext.setLogLevel("ERROR")
    # one synth of BASE_N + NEW_N docs; ids split disjointly (the
    # INCREMENTAL_TIER_r16 construction)
    from pyspark.sql import functions as F

    all_docs = synth_docs_en(spark, BASE_N + NEW_N)
    base = all_docs.filter(F.col("doc_id") < BASE_N)
    new = all_docs.filter(F.col("doc_id") >= BASE_N)

    def run_default(fn):
        t0 = time.perf_counter()
        n = fn(new, base).count()
        return round(time.perf_counter() - t0, 2), n

    def arm_old():
        return run_default(lambda a, b: old_incremental_dedup(a, b))

    def arm_pinned():
        return run_default(lambda a, b: incremental_dedup(a, b))

    def arm_cache():
        handles = []
        t0 = time.perf_counter()
        n = incremental_dedup(new, base, cache_out=handles).count()
        dt = round(time.perf_counter() - t0, 2)
        for h in handles:
            h.unpersist()
        return dt, n

    arms = {"old": arm_old, "pinned": arm_pinned, "cache_out": arm_cache}
    res = {k: [] for k in arms}
    counts = set()
    for r in range(N_AB):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            dt, n = fn()
            res[name].append(dt)
            counts.add(n)
            print(f"round {r} {name}: {dt}s survivors={n}", flush=True)
    assert len(counts) == 1, counts
    out = {
        "base_docs": BASE_N,
        "new_docs": NEW_N,
        "survivors": counts.pop(),
        "arms_sec": res,
        "min_sec": {k: min(v) for k, v in res.items()},
        "persistent_rdds_leaked": len(
            [1 for _ in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()]
        ),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
