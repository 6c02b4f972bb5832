"""r16 A/B: the two entry/plan-shape changes of this round's second
batch, old-vs-new interleaved at sf0.1, noop sink, min basis:

- bm25_topk: tokenization materialized once per row behind a column
  attribute (old: inline toks in every tf_i -> ~9 regex+split evals
  per row after filter pushdown);
- ann_recall_report: broadcast(truth) on the two left-semi hit joins
  (old: SortMergeJoin LeftSemi with an exchange+sort per consumer).

Old variants are inlined below, code-identical to the pre-r16 bodies.
Result equality (sorted rows) asserted once per query.

Usage: PYTHONPATH=/root/repo python tools/entry_ab_r16.py
Writes ENTRY_AB_r16.json. Env: N_ROUNDS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from __spark_entry__ import T, _EMB_DIM
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.retrieval import (
    BM25_K1,
    BM25_B,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
    cosine_topk,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.text import (
    norm_text,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ROUNDS = int(os.environ.get("N_ROUNDS", "5"))


def old_term_counts(df, terms, text_col, id_col):
    """Pre-r16 _term_counts: toks inlined into every consumer."""
    toks = F.filter(F.split(norm_text(text_col), " "), lambda t: t != "")
    cols = [F.col(id_col), F.size(toks).alias("dl")]
    for i, t in enumerate(terms):
        lit_t = F.lit(t)
        cols.append(
            F.size(F.filter(toks, lambda x: x == lit_t)).alias(f"tf_{i}")
        )
    return df.select(*cols)


def old_bm25_topk(df, query_terms, k=20, text_col="text", id_col="doc_id"):
    terms = [t.lower() for t in query_terms]
    per_doc = old_term_counts(df, terms, text_col, id_col)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    n = F.col("n_docs").cast("double")

    def term_score(i):
        tf = F.col(f"tf_{i}").cast("double")
        dfq = F.col(f"df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfq + F.lit(0.5)) / (dfq + F.lit(0.5)))
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl
        )
        s = idf * tf * F.lit(BM25_K1 + 1.0) / denom
        return F.when(
            F.col(f"tf_{i}") > 0, F.floor(s * 1e6).cast("bigint")
        ).otherwise(F.lit(0))

    hit = sum((F.col(f"tf_{i}") > 0).cast("int") for i in range(len(terms)))
    micro = sum(term_score(i) for i in range(len(terms)))
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            hit.alias("n_hit_terms"),
            micro.alias("score_micro"),
        )
        .filter(F.col("n_hit_terms") > 0)
        .withColumn("score", F.round(F.col("score_micro") / 1e6, 6))
    )
    return scored.orderBy(F.col("score_micro").desc(), F.col(id_col).asc()).limit(k)


def old_q_bm25(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return old_bm25_topk(d, ["spark", "join", "window", "dup"], k=20)


def old_q_ann_recall(spark, sf_dir):
    """Pre-r16 body: un-hinted left-semi hit joins."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm import (
        ivf_ann_topk,
        lsh_ann_topk,
    )

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = cosine_topk(emb, queries, k=5).select("query_id", "vec_id").cache()
    lsh = lsh_ann_topk(emb, queries, dim=_EMB_DIM, k=5, planes=4).select(
        "query_id", "vec_id"
    )
    ivf = ivf_ann_topk(
        emb, queries, n_centroids=16, n_probe=4, k=5, dim=_EMB_DIM
    ).select("query_id", "vec_id")

    def hits(approx: DataFrame, method: str) -> DataFrame:
        return (
            approx.join(truth, ["query_id", "vec_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(method).alias("method"), "n_hits")
        )

    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        hits(lsh, "lsh")
        .unionByName(hits(ivf, "ivf"))
        .crossJoin(F.broadcast(n_truth))
        .select(
            "method",
            "n_hits",
            "n_truth",
            F.expr("n_hits * 1000000 DIV n_truth").alias("recall_micro"),
        )
    )


def main() -> None:
    spark = get_spark("caf-entry-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    pairs = {
        "bm25_topk": (old_q_bm25, qs["bm25_topk"]),
        "ann_recall_report": (old_q_ann_recall, qs["ann_recall_report"]),
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name, (old_fn, new_fn) in pairs.items():
        o_rows = sorted(map(str, old_fn(spark, SF_DIR).collect()))
        n_rows = sorted(map(str, new_fn(spark, SF_DIR).collect()))
        assert o_rows == n_rows, f"{name}: result mismatch"
        spark.catalog.clearCache()
        olds, news = [], []
        for r in range(N_ROUNDS):
            for legs, fn in ((olds, old_fn), (news, new_fn)):
                spark.sparkContext.setJobDescription(
                    f"{name} {'old' if legs is olds else 'new'} r{r}"
                )
                t0 = time.perf_counter()
                noop(fn(spark, SF_DIR))
                legs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        out[name] = {
            "old_min": min(olds),
            "new_min": min(news),
            "speedup": round(min(olds) / min(news), 2),
            "rows_equal": True,
            "old": olds,
            "new": news,
        }
        print(name, out[name]["old_min"], "->", out[name]["new_min"], flush=True)
    out["_n_rounds"] = N_ROUNDS
    with open("/root/repo/ENTRY_AB_r16.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
