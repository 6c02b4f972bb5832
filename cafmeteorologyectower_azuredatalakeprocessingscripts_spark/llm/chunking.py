"""RAG-style document chunking: split each document into overlapping
token windows (the retrieval-corpus prep step every LLM data pipeline
needs before embedding).

Pure Column expressions — one ``posexplode`` over the chunk-start
sequence, zero shuffles, no Python UDFs. At 100 TB this is a map-only
projection whose output fan-out is bounded by ``ceil(n_tokens /
stride)`` per document; Spark's per-task Generate keeps memory flat
because the token array is built once per row and sliced per chunk.

No reference analogue (the reference processes fixed-schema sensor
rows); this is north-star training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import norm_text


def chunk_starts(n_tokens: Column, stride: int) -> Column:
    """1-based chunk start positions ``[1, 1+stride, ...]`` up to
    ``n_tokens``. Empty docs produce a single out-of-range start (1)
    that the caller filters — keeps the sequence bounds non-degenerate.
    """
    return F.sequence(
        F.lit(1), F.greatest(n_tokens, F.lit(1)), F.lit(stride)
    )


def chunk_tokens(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, start_tok, n_tok, chunk_text): overlapping
    token-window chunks of the normalized text.

    Contract (documented, oracle-replayed): starts are ``1, 1+stride,
    2·stride+1, …`` while ``start ≤ n_tokens``; every chunk carries up
    to ``chunk_size`` tokens, so with ``stride < chunk_size`` adjacent
    chunks overlap by ``chunk_size - stride`` tokens and the final
    chunk may be a short suffix (trailing partial chunks are KEPT —
    retrieval recall beats tidiness). Documents with zero tokens emit
    no chunks.

    Scale shape: map-only (split → posexplode(sequence) → slice);
    predicate/column pruning reach the scan untouched because nothing
    here shuffles or aggregates.
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError(
            f"chunk_size and stride must be >= 1, got {chunk_size}/{stride}"
        )
    toks = F.filter(
        F.split(norm_text(text_col), " "), lambda t: t != ""
    )
    base = df.select(
        F.col(id_col), toks.alias("w")
    ).withColumn("n", F.size("w"))
    exploded = base.select(
        id_col,
        "w",
        "n",
        F.posexplode(chunk_starts(F.col("n"), stride)).alias(
            "chunk_idx", "start_tok"
        ),
    ).filter(F.col("start_tok") <= F.col("n"))
    return exploded.select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.least(
            F.lit(chunk_size), F.col("n") - F.col("start_tok") + F.lit(1)
        ).alias("n_tok"),
        F.array_join(
            F.slice(F.col("w"), F.col("start_tok"), F.lit(chunk_size)), " "
        ).alias("chunk_text"),
    )
