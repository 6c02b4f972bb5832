"""r17 A/B: the incremental_dedup recompute DIET (VERDICT r16 #3) vs
the r15/r16 leak-free body.

Old shape (r15/r16, inline copy in tools/incremental_pin_ab.py): set
sizes evaluated as a separate sig_new ∪ sig_base frame and attached by
two joins (each join re-evaluates BOTH signature pipelines), and the
verify join's two sides each evaluate the full sh_new ∪ sh_base union
although id_a can only match new docs and id_b only base docs —
17 corpus scans, 3 base-sized signature aggregations per execution.

New shape (shipped): n_sh rides the lsh_buckets membership rows
(carry=) into the candidate pairs (no sizes frame at all), and the
verify sides are passed bipartite (shingles_df=sh_new,
shingles_b_df=sh_base) — 8 corpus scans, 1 base-sized signature
aggregation. Pure work-avoidance: no caching, no pinning, no reliance
on ReuseExchange (the mechanism the r16 probe rejected).

Phase 1: interleaved A/B at the registry shape (sf0.1 documents,
src>=15 new vs src<15 base), rows asserted equal once.
Phase 2 (TIER=1): the 2M:20k production-shape tier, interleaved
old/new/cache_out arms (the INCREMENTAL_PIN_r16 method), .count()
materialization.

Usage: PYTHONPATH=/root/repo python tools/incremental_diet_ab.py
Env: N_ROUNDS (default 5), TIER=1 to add the tier phase, BASE_N/NEW_N.
Writes /tmp/incremental_diet_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    incremental_dedup,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from tools.incremental_pin_ab import old_incremental_dedup

N_ROUNDS = int(os.environ.get("N_ROUNDS", "5"))
TIER = os.environ.get("TIER", "") == "1"
BASE_N = int(os.environ.get("BASE_N", "2000000"))
NEW_N = int(os.environ.get("NEW_N", "20000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-incr-diet-r17")
    spark.sparkContext.setLogLevel("ERROR")
    d = entrymod.T(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    base = d.filter(src_num < 15)
    new = d.filter(src_num >= 15)
    nq = entrymod._SHINGLE_N_Q

    def build_old():
        return old_incremental_dedup(new, base, n=nq, threshold=0.1).select(
            "doc_id", "source"
        )

    def build_new():
        return incremental_dedup(new, base, n=nq, threshold=0.1).select(
            "doc_id", "source"
        )

    rows_old = sorted(map(tuple, build_old().collect()))
    rows_new = sorted(map(tuple, build_new().collect()))
    assert rows_old == rows_new, "result mismatch between legs"

    plan = build_new()._jdf.queryExecution().executedPlan().toString()
    n_scans_new = plan.count("Scan parquet")
    plan_old = build_old()._jdf.queryExecution().executedPlan().toString()
    n_scans_old = plan_old.count("Scan parquet")

    def t(build) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    res = {"old": [], "new": []}
    for _ in range(N_ROUNDS):
        res["old"].append(t(build_old))
        res["new"].append(t(build_new))
        print(json.dumps({"old": res["old"][-1], "new": res["new"][-1]}),
              flush=True)

    out = {"executed_plan_scans": {"old": n_scans_old, "new": n_scans_new}}
    if res["old"]:
        out["sf01_ab"] = {
            "old_min": min(res["old"]),
            "new_min": min(res["new"]),
            "speedup": round(min(res["old"]) / min(res["new"]), 2),
            "rows_equal": True,
            **res,
        }

    if TIER:
        from tools.pipeline_tier_probe import synth_docs_en

        all_docs = synth_docs_en(spark, BASE_N + NEW_N)
        if os.environ.get("PARQUET", "") == "1":
            # parquet-backed tier: the 100 TB shape — the base side is
            # REAL I/O per scan, so eliminated subtree evaluations
            # show up as eliminated reads (the synth-recompute tier
            # hides them: a range->project lineage re-evaluates for
            # ~free)
            pq = "/tmp/incr_diet_tier_docs"
            if not os.path.exists(pq):
                all_docs.write.mode("overwrite").parquet(pq)
            all_docs = spark.read.parquet(pq)
        tbase = all_docs.filter(F.col("doc_id") < BASE_N)
        tnew = all_docs.filter(F.col("doc_id") >= BASE_N)

        def run(fn):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(tnew, tbase).count()
            return round(time.perf_counter() - t0, 2), n

        def arm_cache():
            handles = []
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = incremental_dedup(tnew, tbase, cache_out=handles).count()
            dt = round(time.perf_counter() - t0, 2)
            for h in handles:
                h.unpersist()
            return dt, n

        arms = {
            "old": lambda: run(old_incremental_dedup),
            "new": lambda: run(incremental_dedup),
            "cache_out": arm_cache,
        }
        tres = {k: [] for k in arms}
        counts = set()
        n_ab = int(os.environ.get("N_AB", "2"))
        for r in range(n_ab):
            for name, fn in arms.items():
                dt, n = fn()
                tres[name].append(dt)
                counts.add(n)
                print(f"tier round {r} {name}: {dt}s survivors={n}", flush=True)
        assert len(counts) == 1, counts
        out["tier"] = {
            "base_docs": BASE_N,
            "new_docs": NEW_N,
            "survivors": counts.pop(),
            "arms_sec": tres,
            "min_sec": {k: min(v) for k, v in tres.items()},
        }

    out["persistent_rdds_leaked"] = len(
        [1 for _ in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()]
    )
    with open("/tmp/incremental_diet_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
