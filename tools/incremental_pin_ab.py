"""r16 A/B: pinned-exchange sharing in incremental_dedup's leak-free
default vs the old recompute form (identity _shared).

Old shape: shared intermediates (new_exact, per-side shingles and
signatures) re-evaluated per consumer — 17 corpus scans / 12 shingle
explodes in one executed plan. New shape (shipped): each shared frame
ends in a deterministic repartition(id), so AQE's stage reuse
materializes the common shuffle once per execution — sharing with
zero session storage. This probe replicates the OLD body inline and
interleaves both at the registry shape (sf documents, src>=15 new vs
src<15 base), asserting result equality (sorted rows) once.

Usage: PYTHONPATH=/root/repo python tools/incremental_pin_ab.py
Writes /tmp/incremental_pin_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
    SHINGLE_N,
    LSH_BANDS,
    LSH_ROWS,
    fingerprint_md5,
    incremental_dedup,
    jaccard_pairs,
    lsh_buckets,
    minhash_signatures,
    shingles,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark

N_ROUNDS = int(os.environ.get("N_ROUNDS", "5"))


def old_incremental_dedup(new_df, base_df, text_col="text", id_col="doc_id",
                          n=SHINGLE_N, bands=LSH_BANDS, rows=LSH_ROWS,
                          threshold=0.1):
    """The pre-r16 leak-free body: shared frames NOT pinned."""
    base_fps = base_df.select(fingerprint_md5(text_col).alias("__fp")).distinct()
    new_exact = (
        new_df.withColumn("__fp", fingerprint_md5(text_col))
        .join(base_fps, "__fp", "left_anti")
        .drop("__fp")
    )
    sh_new = shingles(new_exact, text_col, id_col, n)
    sh_base = shingles(base_df, text_col, id_col, n)
    sig_new = minhash_signatures(
        new_exact, text_col, id_col, bands * rows, n, sh_new, with_sizes=True
    )
    sig_base = minhash_signatures(
        base_df, text_col, id_col, bands * rows, n, sh_base, with_sizes=True
    )
    bn = lsh_buckets(sig_new.drop("n_sh"), bands, rows).select(
        F.col("id").alias("id_a"), "band", "bucket"
    )
    bb = lsh_buckets(sig_base.drop("n_sh"), bands, rows).select(
        F.col("id").alias("id_b"), "band", "bucket"
    )
    w = Window.partitionBy("id_a").orderBy("id_b")
    cand = (
        bn.join(bb, ["band", "bucket"])
        .select("id_a", "id_b")
        .withColumn("__prev", F.lag("id_b").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("id_b")))
        .drop("__prev")
    )
    sizes = sig_new.select("id", "n_sh").union(sig_base.select("id", "n_sh"))
    ver = jaccard_pairs(
        None, text_col, id_col, n, threshold=threshold, candidates=cand,
        shingles_df=sh_new.union(sh_base), sizes_df=sizes,
    )
    drops = ver.select(F.col("id_a").alias(id_col))
    return new_exact.join(drops, id_col, "left_anti")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-incr-ab-r16")
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

    def t(build) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    res = {"old": [], "new": []}
    for r in range(N_ROUNDS):
        res["old"].append(t(build_old))
        res["new"].append(t(build_new))
    out = {
        "old_min": min(res["old"]),
        "new_min": min(res["new"]),
        "speedup": round(min(res["old"]) / min(res["new"]), 2),
        "rows_equal": True,
        **res,
    }
    with open("/tmp/incremental_pin_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
