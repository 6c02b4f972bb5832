"""Lexical retrieval over the document corpus: BM25 scoring + top-k —
the standard sparse-retrieval baseline a RAG pipeline runs next to its
embedding ANN (llm/similarity.py). No reference analogue; north-star
training-data surface.

Scale shape: because the query is a literal handful of terms, there is
no inverted index, no explode and no term join at all — per-term
frequencies are array expressions inside ONE map-only projection; the
corpus statistics (N, total length, per-term document frequencies) are
a single 1-row aggregation that broadcasts back; ranking is
orderBy+limit → TakeOrderedAndProject (distributed partial top-k,
never a global sort). Two corpus scans total (the 1-row stat and the
scoring pass), zero data-sized shuffles — the same global-stat
crossJoin(broadcast) shape as the repo's gap-fill min/max spine.

Determinism: tf/df/dl are exact BIGINTs; avgdl is one int-ratio
double; idf and each per-term score are fixed-shape double expressions
(identical in any engine); the per-doc reduction over terms is a
column-ordered sum of floor(score·1e6) BIGINT micro-units, so the
ranking key is an integer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import norm_text

#: Standard Robertson/Sparck-Jones constants.
BM25_K1 = 1.2
BM25_B = 0.75


def _term_counts(
    df: DataFrame, terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """(id, dl, tf_0..tf_{m-1}): doc length + per-query-term counts as
    pure array expressions — no explode, no shuffle.

    The regex-normalize + split tokenization is materialized ONCE per
    row in its own projection (r16): inlining it into every tf_i made
    the scoring pass re-tokenize per term, and the pushed-down
    n_hit_terms filter re-tokenized again below the projection — ~9
    regex+split evaluations per row. A two-step select leaves the
    expensive expression behind a column attribute; CollapseProject
    keeps it single because a non-cheap expression referenced by every
    consumer is not inlined. tf/dl values are unchanged."""
    toks_df = df.select(
        F.col(id_col),
        F.filter(F.split(norm_text(text_col), " "), lambda t: t != "").alias(
            "__toks"
        ),
    )
    toks = F.col("__toks")
    cols = [F.col(id_col), F.size(toks).alias("dl")]
    for i, t in enumerate(terms):
        lit_t = F.lit(t)
        cols.append(
            F.size(F.filter(toks, lambda x: x == lit_t)).alias(f"tf_{i}")
        )
    return toks_df.select(*cols)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_hit_terms, score_micro, score): top-``k`` documents by
    BM25 against ``query_terms`` (matched on normalized whitespace
    tokens), ties broken by id ascending.

    idf uses the +1 form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` so terms
    present in most documents still contribute positively (Lucene's
    convention). ``score_micro`` (BIGINT micro-units) is the exact
    ranking key; ``score`` is its rounded display form.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(t.lower() for t in query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct after lowering")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = [t.lower() for t in query_terms]
    per_doc = _term_counts(df, terms, text_col, id_col)
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

    def term_score(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        dfq = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (n - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
        )
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl
        )
        s = idf * tf * F.lit(BM25_K1 + 1.0) / denom
        return F.when(
            F.col(f"tf_{i}") > 0, F.floor(s * 1e6).cast("bigint")
        ).otherwise(F.lit(0))

    hit = sum(
        (F.col(f"tf_{i}") > 0).cast("int") for i in range(len(terms))
    )
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
    return scored.orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    ).limit(k)
