"""r17 phase profile of semantic_dedup / charlm_quality (VERDICT r16
#4): split each query's wall-clock into
  (1) Python-side DataFrame construction (queries()[name](spark, dir)),
  (2) driver-side planning (force queryExecution().executedPlan()),
  (3) execution (noop sink on the already-planned frame).
The r16 claim was ~0.8 s driver-side plan build per query; this probe
locates it (construction vs Catalyst) before any rewrite is attempted.

Usage: PYTHONPATH=/root/repo python tools/semdedup_phase_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark

NAMES = ["semantic_dedup", "charlm_quality"]
N_ROUNDS = int(os.environ.get("N_ROUNDS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-semdedup-profile-r17")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["wateryear_rollup"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict = {}
    for name in NAMES:
        phases = {"construct": [], "plan": [], "execute": [], "total": []}
        for _ in range(N_ROUNDS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            phases["construct"].append(round(t1 - t0, 3))
            phases["plan"].append(round(t2 - t1, 3))
            phases["execute"].append(round(t3 - t2, 3))
            phases["total"].append(round(t3 - t0, 3))
        out[name] = {k: v for k, v in phases.items()}
        out[name]["min"] = {k: min(v) for k, v in phases.items()}
        print(json.dumps({name: out[name]}), flush=True)

    with open("/tmp/semdedup_phase_profile.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
