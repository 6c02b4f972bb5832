"""ADVICE r14 #2 follow-through: the r14 cache removal left
`incremental_dedup`'s shared intermediates (exact-surviving new docs,
per-side shingle tables, signatures) re-evaluated in several subtrees
of the one returned plan. BENCH_LOCAL_r15a froze the cache-free
driver query at ratio 1.481 (1.956 s min at sf0.1); this measures the
RECOMPUTE MULTIPLIER directly — default (leak-free, recompute) vs
``cache_out=[]`` (caller-owned persists, released after the run) —
interleaved ABAB in one process, min basis.

The verdict decides the docstring guidance, not the default: the
default stays leak-free (the jaccard/BPE/charlm contract), and scale
callers opt in via cache_out exactly as the docstring recommends. If
the multiplier is small at the daily-refresh shape, that
recommendation can soften; if large, the driver query ALSO stays
default (a registry query may not leak persists into the driver's
session — bench.py runs it 3x and the handles would pile up).

Usage: PYTHONPATH=/root/repo python tools/incremental_cache_ab.py
Writes /tmp/incremental_cache_ab.json; copy into the round record on
accept.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm import incremental_dedup

N_AB = int(os.environ.get("N_AB", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-incremental-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def t_df(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm like bench.py
    entrymod.queries()["wateryear_rollup"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    d = entrymod.T(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    base = d.filter(src_num < 15)
    new = d.filter(src_num >= 15)

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    default_times, cached_times = [], []
    for _ in range(N_AB):
        spark.catalog.clearCache()
        default_times.append(
            t_df(
                incremental_dedup(new, base, n=entrymod._SHINGLE_N_Q, threshold=0.1)
            )
        )
        spark.catalog.clearCache()
        handles: list = []
        cached_times.append(
            t_df(
                incremental_dedup(
                    new,
                    base,
                    n=entrymod._SHINGLE_N_Q,
                    threshold=0.1,
                    cache_out=handles,
                )
            )
        )
        for f in handles:
            f.unpersist()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())

    out = {
        "_provenance": (
            f"interleaved ABAB x {N_AB} at {sf_dir}, min basis; "
            "default = leak-free recompute plan (what the driver query "
            "runs), cached = cache_out=[] with explicit unpersist after "
            "each materialization. base=src0-14, new=src15-19 (the "
            "registry query's daily-refresh shape)."
        ),
        "default_min_sec": round(min(default_times), 3),
        "cached_min_sec": round(min(cached_times), 3),
        "default_all": [round(x, 3) for x in default_times],
        "cached_all": [round(x, 3) for x in cached_times],
        "recompute_multiplier": round(min(default_times) / min(cached_times), 2),
        "persistent_rdds_leaked": after - before,
    }
    assert out["persistent_rdds_leaked"] == 0, out
    with open("/tmp/incremental_cache_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
