"""Curation-operator semantics: repetition signals, decontamination,
deterministic sampling / sharding / packing, PII redaction."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
    HASH_SPACE,
    assign_shards,
    contamination,
    dup_line_fraction,
    dup_token_fraction,
    hash_u32,
    pack_chunks,
    redact_pii,
    sample_hash,
    sample_stratified,
    top_ngram_share,
)


def docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# ------------------------------------------------------- repetition


def test_dup_fractions(spark):
    d = docs(spark, [
        "a\nb\n\n  \na",          # 3 non-empty lines, one repeat
        "x y z",                   # all distinct tokens
        "w w w w",                 # 3 of 4 tokens are repeats
        "",
    ])
    out = {
        r.doc_id: (r.dl, r.dt)
        for r in d.select(
            "doc_id",
            dup_line_fraction("text").alias("dl"),
            dup_token_fraction("text").alias("dt"),
        ).collect()
    }
    assert out[0][0] == pytest.approx(1 / 3, abs=1e-6)
    assert out[1] == (0.0, 0.0)
    assert out[2][1] == 0.75
    assert out[3] == (0.0, 0.0)


def test_top_ngram_share(spark):
    d = docs(spark, [
        "a b a b a b",      # bigrams: ab ba ab ba ab -> 3/5
        "p q r s",          # all distinct -> 1/3
        "solo",             # no bigrams -> 0
    ])
    out = {r.doc_id: r.top_2gram_share for r in top_ngram_share(d, 2).collect()}
    assert out[0] == 0.6
    assert out[1] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2] == 0.0


# -------------------------------------------------- decontamination


def test_contamination_flags_overlap(spark):
    corpus = docs(spark, [
        "the quick brown fox jumps over the lazy dog",   # = benchmark doc
        "a completely different sentence with no overlap at all",
    ])
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    out = {r.doc_id: r for r in contamination(corpus, bench, n=3).collect()}
    assert out[0].contaminated_frac == 1.0 and out[0].contaminated
    assert out[1].n_hit == 0 and not out[1].contaminated
    assert out[1].contaminated_frac == 0.0


# ------------------------------------- sampling / sharding / packing


def test_sample_hash_fraction_and_determinism(spark):
    d = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    s1 = sample_hash(d, "doc_id", 0.25, seed="t")
    n = s1.count()
    assert abs(n / 4000 - 0.25) < 0.05          # ~uniform
    assert s1.count() == n                       # stable on re-run
    # disjoint seeds give different (but valid) samples
    s2 = sample_hash(d, "doc_id", 0.25, seed="u")
    assert s1.join(s2, "doc_id").count() != n


def test_sample_stratified_respects_per_stratum_fractions(spark):
    d = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 == 0 else "fr") for i in range(2000)]
    )
    out = sample_stratified(
        d, "doc_id", "lang", {"en": 0.1, "fr": 0.8}, seed="t"
    )
    counts = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert abs(counts["en"] / 1000 - 0.1) < 0.05
    assert abs(counts["fr"] / 1000 - 0.8) < 0.05


def test_assign_shards_uniform_and_deterministic(spark):
    d = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    out = assign_shards(d, "doc_id", 8, seed="t")
    sizes = [r.c for r in out.groupBy("shard").agg(F.count("*").alias("c")).collect()]
    assert len(sizes) == 8
    assert max(sizes) - min(sizes) < 200        # near-uniform
    # shard is a pure function of the key
    again = assign_shards(d, "doc_id", 8, seed="t")
    assert out.select("doc_id", "shard").exceptAll(
        again.select("doc_id", "shard")
    ).count() == 0


def test_pack_chunks_layout(spark):
    d = spark.createDataFrame(
        [Row(doc_id=i, n_tok=10 + (i % 5)) for i in range(200)]
    )
    packed = pack_chunks(
        assign_shards(d, "doc_id", 4, seed="t"),
        "n_tok",
        budget=64,
    ).collect()
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: (r.shuffle_key, r.doc_id))
        # offsets are the exact running layout: contiguous, gap-free
        pos = 0
        for r in rows:
            assert r.offset == pos
            assert r.chunk_id == pos // 64
            pos += r.n_tok


# --------------------------------------------------------- redaction


def test_redact_pii(spark):
    d = docs(spark, [
        "mail me at a.b+c@example.org or see https://ex.org/x?q=1 now",
        "call 555-123-4567 today",
        "nothing sensitive here",
    ])
    red, counts = redact_pii("text")
    out = {
        r.doc_id: r
        for r in d.select(
            "doc_id",
            red.alias("redacted"),
            counts["EMAIL"].alias("n_email"),
            counts["URL"].alias("n_url"),
            counts["PHONE"].alias("n_phone"),
        ).collect()
    }
    assert out[0].redacted == "mail me at <EMAIL> or see <URL> now"
    assert (out[0].n_email, out[0].n_url) == (1, 1)
    assert out[1].redacted == "call <PHONE> today"
    assert out[1].n_phone == 1
    assert out[2].redacted == "nothing sensitive here"
    assert (out[2].n_email, out[2].n_url, out[2].n_phone) == (0, 0, 0)


def test_connected_components(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm import (
        connected_components,
    )

    # two components: a 4-node chain (diameter 3 — needs >1 round)
    # and a 2-node edge; labels converge to each component's min id
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in [(4, 3), (3, 2), (2, 1), (9, 8)]]
    )
    out = {r.id: r.cluster for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_hash_u32_matches_duckdb(spark):
    """The cross-engine contract: Spark's hash_u32 == DuckDB's hex-cast
    replay for the same key/seed."""
    import duckdb

    d = spark.range(0, 50).withColumnRenamed("id", "k")
    got = {
        r.k: r.h
        for r in d.select("k", hash_u32("k", "s7").alias("h")).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            "SELECT k, CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '|s7'), 1, 8)) AS BIGINT) "
            "FROM range(50) t(k)"
        ).fetchall()
    )
    assert got == want
    assert all(0 <= v < HASH_SPACE for v in got.values())


def test_assign_splits_bands_and_stability(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        assign_splits,
    )

    d = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = assign_splits(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t")
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # growth stability: the first 1000 rows keep their assignment when
    # the corpus is 5x larger (hash bands are per-row, not rank-based)
    small = assign_splits(
        spark.range(0, 1000).withColumnRenamed("id", "doc_id"),
        "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t")
    joined = (out.filter(F.col("doc_id") < 1000).withColumnRenamed("split", "s_big")
              .join(small, "doc_id"))
    assert joined.filter(F.col("s_big") != F.col("split")).count() == 0
    with pytest.raises(ValueError):
        assign_splits(d, "doc_id", {"a": 0.9, "b": 0.2})


def test_char_entropy(spark):
    import math
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        char_entropy,
    )

    d = docs(spark, [
        "aaaa",        # one symbol -> 0 nats
        "ab",          # uniform over 2 -> ln 2
        "abcd",        # uniform over 4 -> ln 4
    ])
    out = {r.doc_id: r.char_entropy for r in char_entropy(d).collect()}
    assert out[0] == 0.0
    assert out[1] == pytest.approx(math.log(2), abs=1e-5)
    assert out[2] == pytest.approx(math.log(4), abs=1e-5)


def test_repetition_signals_family_vs_brute(spark):
    """Gopher family (top-share n=2-4, dup-frac n=5-10) in one explode
    pass must equal a per-doc brute-force computation, including the
    short-doc (no n-gram) zero and the empty-doc row."""
    import re
    from collections import Counter

    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        repetition_signals,
    )

    texts = [
        "spam spam spam spam spam spam spam spam",          # degenerate
        "the quick brown fox jumps over the lazy dog and "
        "the quick brown fox jumps over the lazy dog again",  # long repeat
        "one two three four five six seven eight nine ten",   # no repeats
        "tiny doc",                                           # < 5 tokens
        "",                                                   # empty
    ]
    d = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {r.doc_id: r.asDict() for r in repetition_signals(d).collect()}

    def norm(t):
        return re.sub(r"\s+", " ", t).strip().lower()

    for i, t in enumerate(texts):
        w = norm(t).split(" ") if norm(t) else [""]
        for n in range(2, 11):
            grams = [" ".join(w[j : j + n]) for j in range(len(w) - n + 1)]
            c = Counter(grams)
            if grams:
                top = round(max(c.values()) / len(grams), 6)
                dup = round(
                    sum(v for v in c.values() if v > 1) / len(grams), 6
                )
            else:
                top = dup = 0.0
            if n in (2, 3, 4):
                assert got[i][f"top_{n}gram_share"] == pytest.approx(
                    top, abs=1e-9
                ), (i, n)
            else:
                assert got[i][f"dup_{n}gram_frac"] == pytest.approx(
                    dup, abs=1e-9
                ), (i, n)


def test_dup_paragraph_fraction(spark):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        dup_paragraph_fraction,
    )

    texts = [
        "para one\n\npara two\n\npara one",        # 1 of 3 repeated
        "a\n\n  \n\na",                            # blank-ish separator, dup
        "only one paragraph\nwith two lines",      # no dup
        "",                                        # empty
    ]
    d = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = {
        r.doc_id: r.f
        for r in d.select(
            "doc_id", dup_paragraph_fraction("text").alias("f")
        ).collect()
    }
    assert out[0] == pytest.approx(round(1 / 3, 6))
    assert out[1] == pytest.approx(0.5)
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_repetition_family_consistent_with_single_n(spark):
    """The one-pass family must agree column-for-column with the
    standalone per-n top_ngram_share operator (same normalization, same
    slot-share definition) — guards against the tagged-explode refactor
    drifting from the long-standing single-n path."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        repetition_signals,
        top_ngram_share,
    )

    texts = [
        "to be or not to be that is the question to be or not",
        "alpha beta alpha beta alpha beta gamma",
        "one",
        "",
    ]
    d = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    fam = {r.doc_id: r.asDict() for r in repetition_signals(d).collect()}
    for n in (2, 3, 4):
        single = {
            r.doc_id: r[f"top_{n}gram_share"]
            for r in top_ngram_share(d, n).collect()
        }
        for i in fam:
            assert fam[i][f"top_{n}gram_share"] == pytest.approx(
                single[i], abs=1e-9
            ), (i, n)


def test_c4_line_filter(spark):
    """Published C4 heuristics: terminal punctuation, min words,
    javascript lines, page-level lorem-ipsum / brace / min-line rules."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        c4_line_filter,
    )

    good = (
        "This is a perfectly normal first sentence.\n"
        "Here is another full sentence with enough words!\n"
        'A third line ends with a quote."\n'
        "short line.\n"                      # < 5 words -> dropped
        "Enable javascript to view this content please.\n"  # js -> dropped
        "No terminal punctuation here at all"                # -> dropped
    )
    texts = [
        good,                                            # kept
        "One sentence only appears right here today.",   # < 3 lines
        good + "\nlorem ipsum dolor sit amet filler.",   # lorem ipsum
        good.replace("another", "an{other"),             # brace
        "",                                              # empty
    ]
    d = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = {r.doc_id: r.asDict() for r in c4_line_filter(d).collect()}
    assert out[0]["kept"] and out[0]["n_lines_kept"] == 3
    assert out[0]["clean_text"].count("\n") == 2
    assert "javascript" not in out[0]["clean_text"]
    assert not out[1]["kept"] and out[1]["n_lines_kept"] == 1
    assert not out[2]["kept"]   # lorem ipsum page flag
    assert not out[3]["kept"]   # brace page flag
    assert not out[4]["kept"] and out[4]["clean_text"] == ""
