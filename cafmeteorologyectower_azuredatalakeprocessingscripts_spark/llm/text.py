"""Text-analysis operators for a training-data pipeline (BASELINE.json
north star): token counting, normalization/fingerprinting, quality
scoring, language ID.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs. Each has an exact ANSI-SQL oracle (see __spark_entry__.py). At
100 TB these are embarrassingly parallel projections; the only care
needed is keeping regexes linear-time (they are: character classes only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .params import LANG_MARKERS, LANG_PRECEDENCE
from ..operators.skew import repartition_pinned


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def norm_text(c: Column | str) -> Column:
    """Whitespace-collapsed, trimmed, lower-cased canonical form."""
    return F.lower(F.trim(F.regexp_replace(_c(c), r"\s+", " ")))


def token_count(c: Column | str) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(F.regexp_extract_all(_c(c), F.lit(r"\S+"), 0))


def fingerprint_md5(c: Column | str) -> Column:
    """Exact-dup document fingerprint: md5 of the normalized text."""
    return F.md5(norm_text(c))


def prefix_fingerprint(c: Column | str, n_words: int = 5) -> Column:
    """Near-dup blocking key: md5 of the first ``n_words`` normalized
    tokens (documents sharing a long prefix collide)."""
    toks = F.split(norm_text(c), " ")
    return F.md5(F.array_join(F.slice(toks, 1, n_words), " "))


def quality_score(c: Column | str) -> Column:
    """Heuristic [0,1] quality: token volume, alphabetic density, digit
    penalty. Deterministic + oracle-exact (rounded to 6)."""
    c = _c(c)
    n_chars = F.length(c).cast("double")
    n_tokens = token_count(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_tokens / 100.0)
        + 0.4 * alpha_ratio
        + 0.2 * (1.0 - F.least(F.lit(1.0), digit_ratio * 5.0))
    )
    return F.round(score, 6)


#: English stopwords for the stopword-ratio signal (natural prose sits
#: roughly in [0.2, 0.6]; keyword soup and boilerplate fall outside).
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that", "be",
]


def stopword_ratio(c: Column | str) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords —
    the classic prose-vs-junk signal alongside length/punct ratios."""
    c = _c(c)
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    hits = F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 0)).cast("double")
    n = token_count(c).cast("double")
    return F.round(F.when(n > 0, hits / n).otherwise(F.lit(0.0)), 6)


def _marker_score(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 0))


def lang_id(c: Column | str) -> Column:
    """Marker-vocabulary language ID: count hits per language's marker
    list, argmax with fixed precedence for ties. (A content heuristic —
    n-gram profiles would go the same way; the operator shape is the
    point: pure projection, no shuffle.)"""
    c = _c(c)
    scores = {lang: _marker_score(c, LANG_MARKERS[lang]) for lang in LANG_PRECEDENCE}
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # build reversed so earlier precedence wins via later when() override
    for lang in reversed(LANG_PRECEDENCE):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("unknown")).otherwise(expr)


def tfidf_top_terms(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
):
    """Top-``k`` TF-IDF terms per document: (id, term, tf, df, tfidf,
    term_rank).

    Shape: one explode → per-(doc, token) counts (map-side combined) →
    per-token document frequency (second aggregation, also combined) →
    broadcast-friendly join back → per-doc top-k window. Term frequency
    is the raw in-doc count; idf = ln(N / df) with exact integer N and
    df so any engine reproduces it bit-for-bit (rounded to 6).
    """
    from pyspark.sql import Window

    toks = F.split(norm_text(text_col), " ")
    t = repartition_pinned(df, F.col(id_col)).select(
        F.col(id_col).alias("id"), F.explode(toks).alias("term")
    )
    tf = t.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("id", "term", "tf", "df", "tfidf", "term_rank")
    )


def bpe_ish_token_count(c: Column | str) -> Column:
    """Subword-flavored token count: word pieces + standalone
    punctuation/symbol runs (``[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]``) — the
    regex approximation of a BPE pre-tokenizer. Linear-time character
    classes only."""
    return F.size(
        F.regexp_extract_all(
            _c(c), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
        )
    )


def vocab_top_terms(
    df,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus-level vocabulary builder (tokenizer prep): the ``k`` most
    frequent normalized tokens with total count, document frequency,
    and rank — ties broken lexically so any engine emits the same list.

    Shape: one explode → per-(doc, token) counts collapse map-side
    inside the doc partitioning (shuffle ∝ docs·distinct-terms, not
    token occurrences) → one term-keyed aggregation (shuffle keys are
    the distinct terms only) → global top-k via TakeOrderedAndProject
    (no full sort). The heavy-hitter list a 100 TB corpus feeds to BPE
    training or stopword discovery.

    Null-id contract (shared by :func:`oov_rate` and
    :func:`oov_rate_against_top`): documents with a null ``id_col``
    contribute NO tokens — so the fused and composed OOV forms agree
    on any corpus, not just ones where ids are a primary key.
    """
    from pyspark.sql import Window

    t = repartition_pinned(
        df.filter(F.col(id_col).isNotNull()), F.col(id_col)
    ).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(norm_text(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = t.groupBy("id", "term").agg(F.count(F.lit(1)).alias("c"))
    totals = per_doc.groupBy("term").agg(
        F.sum("c").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    # top-k FIRST via orderBy+limit (compiles to TakeOrderedAndProject —
    # distributed partial top-k, never a global sort or single-partition
    # window); the rank window then runs over only the k survivors
    top = totals.orderBy(
        F.col("n_occurrences").desc(), F.col("term").asc()
    ).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term", "n_occurrences", "n_docs", "rank"
    )


def oov_rate(
    df,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(id_col, n_tok, n_oov, oov_rate): per-document out-of-vocabulary
    token fraction against a vocabulary DataFrame (one ``term`` column,
    e.g. :func:`vocab_top_terms`'s output) — the tokenizer-coverage
    check run before committing a vocab to a training run.

    Scale shape: the vocabulary is small by construction (top-k heavy
    hitters), so it BROADCASTS; the corpus side is one explode plus one
    doc-keyed agg that collapses map-side inside the doc partitioning —
    shuffle bytes ∝ documents, never token occurrences. Empty docs
    report 0/0 with rate 0. Null-id docs contribute no tokens (the
    shared contract — see :func:`vocab_top_terms`); their output row
    is (null, 0, 0, 0.0) in every form.
    """
    from pyspark.sql import functions as F

    toks = (
        repartition_pinned(df.filter(F.col(id_col).isNotNull()), F.col(id_col))
        .select(
            F.col(id_col),
            F.explode(F.split(norm_text(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    marked = toks.join(
        F.broadcast(vocab.select("term").withColumn("in_v", F.lit(1))),
        "term",
        "left",
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tok", F.lit(0)).cast("bigint").alias("n_tok"),
        F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
        F.round(
            F.coalesce(
                F.col("n_oov") / F.col("n_tok").cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("oov_rate"),
    )


def oov_rate_against_top(
    df,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Fused form of ``oov_rate(df, vocab_top_terms(df, k))`` — same
    result, ONE corpus tokenization instead of two.

    Composing the two operators naively pays the heavy scan+explode
    twice: once inside the broadcast build (vocab) and once on the
    probe side. Here both branches consume the SAME per-(doc, term)
    count table, whose producing shuffle exchange is structurally
    identical in the two subtrees — Spark's ReuseExchange rule dedupes
    it into one ``ReusedExchange``, so the tokenize/explode/partial-agg
    runs once and the vocab branch reads the shuffle output a second
    time for free (verified in the physical plan; a regression test
    pins the ReusedExchange node).

    Exchange census: one doc-keyed repartition (reused by both
    branches; the per-doc final agg is exchange-free on top of it), one
    term-keyed agg feeding TakeOrderedAndProject for the top-k, one
    broadcast of the k-row vocab. n_tok/n_oov aggregate the per-term
    counts (``sum(c)``) instead of re-counting token occurrences —
    bitwise-identical results, shuffle bytes ∝ docs·distinct-terms.
    """
    # the explicit isNotNull(id) matters: the probe branch's final join
    # pushes an isnotnull(id) filter into ITS copy of the scan, and a
    # filter present on one subtree but not the other breaks sameResult
    # — no ReusedExchange, corpus scanned twice. Pre-filtering the
    # SHARED source puts the same filter in both subtrees. Semantics:
    # null-id docs contribute no tokens — the SAME contract
    # vocab_top_terms and oov_rate enforce (ADVICE r14 #4), so the
    # fused and composed forms agree on ANY corpus, null ids included.
    t = (
        repartition_pinned(
            df.filter(F.col(id_col).isNotNull()), F.col(id_col)
        )
        .select(
            F.col(id_col),
            F.explode(F.split(norm_text(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    per_doc_term = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        per_doc_term.groupBy("term")
        .agg(F.sum("c").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(k)
        .select("term")
    )
    marked = per_doc_term.join(
        F.broadcast(vocab.withColumn("in_v", F.lit(1))), "term", "left"
    )
    per_doc = marked.groupBy(id_col).agg(
        F.sum("c").alias("n_tok"),
        F.sum(
            F.when(F.col("in_v").isNull(), F.col("c")).otherwise(0)
        ).alias("n_oov"),
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tok", F.lit(0)).cast("bigint").alias("n_tok"),
        F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
        F.round(
            F.coalesce(
                F.col("n_oov") / F.col("n_tok").cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("oov_rate"),
    )


# control chars (C0/C1, EXCLUDING \t\n\r which are whitespace and
# belong to the collapse step, not deletion) + zero-width
# space/joiners + BOM — the classes web-crawl text pipelines strip
# before tokenization. Explicit \xNN ranges instead of \p{Cc}&&[^..]
# because RE2 (the DuckDB oracle's engine) has no class intersection;
# \x escapes and literal codepoints parse identically in Java regex
# and RE2. Post-strip whitespace is [\t\n\f\r ] — the set where Java's
# and RE2's \s agree (they differ only on \x0B, stripped here).
_SCRUB_CLASS = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f​‌‍﻿]"
)


def unicode_scrub(c: Column | str) -> Column:
    """Cleaned text: control/zero-width chars stripped, whitespace runs
    collapsed to single spaces, trimmed. Pure projection — zero shuffle,
    whole-stage codegen."""
    stripped = F.regexp_replace(_c(c), _SCRUB_CLASS, "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def mojibake_flags(c: Column | str) -> tuple[Column, Column]:
    """(has_replacement_char, n_stripped): U+FFFD presence marks a
    decode error upstream; n_stripped counts removed scrub-class chars
    (length delta — no second regex pass)."""
    c = _c(c)
    has_fffd = c.contains("�")
    n_stripped = F.length(c) - F.length(
        F.regexp_replace(c, _SCRUB_CLASS, "")
    )
    return has_fffd, n_stripped


def token_compression(c: Column | str) -> tuple[Column, Column]:
    """(chars_per_ws_token, chars_per_subword): the tokenizer
    compression ratios used to flag boilerplate/code/minified text —
    natural prose sits near ~5-6 chars per whitespace token; minified
    or repeated-symbol content falls far outside. Round-6 doubles,
    NULL on empty text (no tokens)."""
    c = _c(c)
    n_chars = F.length(c).cast("double")
    ws = token_count(c).cast("double")
    sub = bpe_ish_token_count(c).cast("double")
    return (
        F.round(n_chars / F.nullif(ws, F.lit(0.0)), 6),
        F.round(n_chars / F.nullif(sub, F.lit(0.0)), 6),
    )
