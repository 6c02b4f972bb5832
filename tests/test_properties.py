"""Property tests (SURVEY.md §5.2.3): invariants over randomized inputs.

hypothesis drives input generation; each property materializes a small
Spark plan, so examples are capped to keep the suite interactive.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.operators import (
    dedup_keep_richest,
    gap_fill,
    union_by_name,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.functions.time import (
    water_year_of,
    first_date_of_water_year,
    last_date_of_water_year,
)

_T0 = datetime.datetime(2022, 1, 1)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# rows: (tick_index in a 2-day grid, record, value-or-none)
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=95),
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-50, max_value=50)),
    ),
    min_size=1,
    max_size=40,
)


def _mk(spark, rows):
    data = [
        (_T0 + datetime.timedelta(minutes=30 * i), r, v) for i, r, v in rows
    ]
    return spark.createDataFrame(
        data, "TIMESTAMP timestamp, RECORD bigint, Tair double"
    )


@settings(**_SETTINGS)
@given(rows=_rows)
def test_dedup_idempotent_and_keeps_richest(spark, rows):
    df = _mk(spark, rows)
    once = dedup_keep_richest(df, tiebreakers=("Tair",))
    twice = dedup_keep_richest(once, tiebreakers=("Tair",))
    got = sorted(map(tuple, once.collect()))
    # idempotence
    assert sorted(map(tuple, twice.collect())) == got
    # exactly one row per timestamp
    ts = [t for t, *_ in got]
    assert len(ts) == len(set(ts))
    # survivor minimizes (record nulls-last, nan_count) per key
    by_key: dict = {}
    for t, r, v in ((_T0 + datetime.timedelta(minutes=30 * i), r, v)
                    for i, r, v in rows):
        k = (
            (1, 0) if r is None else (0, r),
            int(v is None),
            -9e9 if v is None else v,
        )
        if t not in by_key or k < by_key[t][0]:
            by_key[t] = (k, r)
    for t, r, v in got:
        assert by_key[t][1] == r


@settings(**_SETTINGS)
@given(rows=_rows)
def test_gapfill_spine_is_complete_and_monotone(spark, rows):
    df = dedup_keep_richest(_mk(spark, rows), tiebreakers=("Tair",))
    filled = gap_fill(df, freq_minutes=30)
    out = [r["TIMESTAMP"] for r in filled.orderBy("TIMESTAMP").collect()]
    # exactly ceil((max-min)/freq)+1 rows from day-floor to day-ceil
    lo = out[0]
    assert lo.hour == 0 and lo.minute == 0
    step = datetime.timedelta(minutes=30)
    assert out == [lo + step * i for i in range(len(out))]
    # every input tick survives with its value
    n_in = df.count()
    assert filled.filter(F.col("RECORD").isNotNull() | F.col("Tair").isNotNull()).count() <= n_in
    assert len(out) == len(set(out))


@settings(**_SETTINGS)
@given(rows=_rows, split=st.integers(min_value=0, max_value=40))
def test_union_dedup_order_independent(spark, rows, split):
    split = min(split, len(rows))
    a, b = _mk(spark, rows[:split]), _mk(spark, rows[split:])
    ab = dedup_keep_richest(union_by_name([a, b]), tiebreakers=("Tair",))
    ba = dedup_keep_richest(union_by_name([b, a]), tiebreakers=("Tair",))
    assert sorted(map(tuple, ab.collect())) == sorted(map(tuple, ba.collect()))


@given(d=st.dates(min_value=datetime.date(1990, 1, 1),
                  max_value=datetime.date(2100, 12, 31)))
@settings(max_examples=200, deadline=None)
def test_water_year_round_trip(d):
    wy = water_year_of(d)
    assert first_date_of_water_year(wy) <= d <= last_date_of_water_year(wy)
    # boundaries: Oct 1 starts the next water year
    assert water_year_of(datetime.date(wy - 1, 10, 1)) == wy
    assert water_year_of(datetime.date(wy, 9, 30)) == wy


_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_docs = st.lists(
    st.lists(_words, min_size=0, max_size=8).map(" ".join),
    min_size=2, max_size=8,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_docs)
def test_jaccard_matches_python_model(spark, texts):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, n=2, threshold=0.0).collect()
    }

    def shingle_set(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    sets = {i: shingle_set(t) for i, t in enumerate(texts)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if inter:
                    want[(a, b)] = round(
                        inter / (len(sets[a] | sets[b])), 6
                    )
    assert got == want


# ---- curation layout invariants (llm/curation.py) ----

_keys = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60,
    unique=True,
)


@settings(**_SETTINGS)
@given(keys=_keys, n_shards=st.integers(min_value=1, max_value=6),
       budget=st.integers(min_value=8, max_value=200))
def test_prop_shard_pack_partition(spark, keys, n_shards, budget):
    """Sharding partitions the input (every key in exactly one shard);
    packing is the exact concat-and-chunk layout per shard."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        assign_shards, pack_chunks,
    )

    df = spark.createDataFrame([(k, 1 + k % 17) for k in keys],
                               "doc_id bigint, n_tok int")
    out = pack_chunks(
        assign_shards(df, "doc_id", n_shards, seed="p"), "n_tok", budget=budget
    ).collect()
    assert sorted(r.doc_id for r in out) == sorted(keys)   # partition
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < n_shards
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: (r.shuffle_key, r.doc_id))
        pos = 0
        for r in rows:
            assert r.offset == pos and r.chunk_id == pos // budget
            pos += r.n_tok


@settings(**_SETTINGS)
@given(keys=_keys)
def test_prop_splits_partition_and_stability(spark, keys):
    """Split bands partition the key space; assignment of a key never
    depends on what other keys are present."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        assign_splits,
    )

    w = {"train": 0.7, "val": 0.2, "test": 0.1}
    df = spark.createDataFrame([(k,) for k in keys], "doc_id bigint")
    full = {r.doc_id: r.split
            for r in assign_splits(df, "doc_id", w, seed="p").collect()}
    assert all(v in ("train", "val", "test") for v in full.values())
    half_keys = keys[: max(1, len(keys) // 2)]
    half = {r.doc_id: r.split
            for r in assign_splits(
                spark.createDataFrame([(k,) for k in half_keys],
                                      "doc_id bigint"),
                "doc_id", w, seed="p").collect()}
    assert all(full[k] == half[k] for k in half_keys)


@given(
    bits=st.integers(min_value=1, max_value=59),
    n=st.integers(min_value=1, max_value=59),
)
@settings(max_examples=60, deadline=None)
def test_prop_pigeonhole_blocks_partition_bits(bits, n):
    """Valid layouts are exact partitions of [0, bits): disjoint,
    covering, every width >= 1 (degenerate params must raise)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        pigeonhole_blocks,
    )

    if n > bits:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pigeonhole_blocks(bits, n)
        return
    blocks = pigeonhole_blocks(bits, n)
    assert len(blocks) == n
    covered = []
    for s, w in blocks:
        assert w >= 1
        covered += range(s, s + w)
    assert covered == list(range(bits))


@given(h=st.integers(min_value=0, max_value=63))
@settings(max_examples=30, deadline=None)
def test_prop_simhash64_blocks_disjoint(h):
    """64-bit layouts: max_hamming+1 blocks, disjoint within each half,
    widths >= 1 — the exact precondition of the pigeonhole recall
    argument."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        simhash64_blocks,
    )

    blocks = simhash64_blocks(h)
    assert len(blocks) == h + 1
    for half in ("simhash_lo", "simhash_hi"):
        spans = sorted(
            (s, s + w) for col, s, w in blocks if col == half
        )
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 <= b0  # disjoint
        assert all(0 <= a0 < a1 <= 32 for a0, a1 in spans)


@given(
    start=st.dates(
        min_value=datetime.date(2015, 1, 1), max_value=datetime.date(2030, 12, 31)
    ),
    span=st.integers(min_value=0, max_value=900),
)
@settings(max_examples=60, deadline=None)
def test_prop_month_globs_cover_window(start, span):
    """One glob per calendar month intersecting [start, end], in order,
    each shaped base/yyyy/mm/pattern."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.config import (
        month_globs,
    )

    end = start + datetime.timedelta(days=span)
    globs = month_globs("abfss://c@a.dfs.core.windows.net/p", start, end)
    months = {(start + datetime.timedelta(days=i)).strftime("%Y/%m")
              for i in range(span + 1)}
    assert [g.rsplit("/", 3)[1] + "/" + g.rsplit("/", 3)[2] for g in globs] == sorted(
        months
    )
    assert all(g.endswith("/*.dat") for g in globs)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_docs)
def test_prop_span_fraction_bounds_and_corpus_duplication(spark, texts):
    """cross_doc_span_fraction ∈ [0, 1]; after duplicating the whole
    corpus every document with at least one span scores exactly 1.0
    (its spans all occur in its twin), and sub-n-token docs stay 0."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        cross_doc_span_fraction,
    )

    n = 2
    base = [(i, t) for i, t in enumerate(texts)]
    twin = [(1000 + i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(base, "doc_id long, text string")
    out = {r.doc_id: r.dup_span_frac
           for r in cross_doc_span_fraction(df, n=n).collect()}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    dup = spark.createDataFrame(base + twin, "doc_id long, text string")
    out2 = {r.doc_id: r.dup_span_frac
            for r in cross_doc_span_fraction(dup, n=n).collect()}
    for i, t in base:
        has_span = len(t.split()) >= n and t.strip() != ""
        assert out2[i] == (1.0 if has_span else 0.0), (i, t)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_docs)
def test_prop_repetition_whitespace_invariant(spark, texts):
    """repetition_signals is invariant under whitespace inflation (the
    norm_text collapse is the contract all text operators share)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        repetition_signals,
    )

    a = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, t.replace(" ", "   ")) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    ra = sorted(map(tuple, repetition_signals(a).collect()))
    rb = sorted(map(tuple, repetition_signals(b).collect()))
    assert ra == rb


# ------------------------------------------------- r6 fourth/fifth wave


@given(
    vals=st.lists(
        st.floats(min_value=-500, max_value=500, allow_nan=False),
        min_size=2,
        max_size=40,
    ),
    nparts=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_prop_cusum_partition_invariant(spark, vals, nparts):
    """The integer-exact CUSUM flag must be identical under ANY input
    partitioning — the property the micro-unit/multiply-through design
    buys (a float cumsum would not survive this test at thresholds near
    the deviation)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.operators.rolling import (
        cusum_flags,
    )

    rows = [
        (_T0 + datetime.timedelta(minutes=i), 1, float(v), i)
        for i, v in enumerate(vals)
    ]
    schema = "ts timestamp, user_id bigint, value double, event_id bigint"
    base = spark.createDataFrame(rows, schema)
    out1 = sorted(
        (r["i"], r["cum_micro"], r["shift_flag"])
        for r in cusum_flags(base, order_tiebreak="event_id", h=50.0).collect()
    )
    out2 = sorted(
        (r["i"], r["cum_micro"], r["shift_flag"])
        for r in cusum_flags(
            base.repartition(nparts), order_tiebreak="event_id", h=50.0
        ).collect()
    )
    assert out1 == out2


@given(
    groups=st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=4, max_size=60
    )
)
@settings(**_SETTINGS)
def test_prop_soft_dedup_weights_sum_to_distinct(spark, groups):
    """Σ weights == number of distinct contents (the soft-dedup
    invariant: each distinct document contributes exactly one effective
    doc regardless of its copy count)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        soft_dedup_weights,
    )

    rows = [(i, f"text {g}") for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = soft_dedup_weights(df).collect()
    assert len(out) == len(groups)  # every row kept
    total = sum(r["weight"] for r in out)
    assert abs(total - len(set(groups))) < 1e-4


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=50), min_size=2, max_size=6),
    alpha=st.floats(min_value=0.1, max_value=1.0),
)
@settings(**_SETTINGS)
def test_prop_temperature_mix_rates_bounded_and_monotone(spark, sizes, alpha):
    """keep_rate ∈ (0, 1], the max rate is exactly 1 (no upsampling),
    and bigger groups never get HIGHER keep rates than smaller ones
    (alpha ≤ 1 flattens toward uniform)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        temperature_mix,
    )

    rows = []
    did = 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((did, f"s{g}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    rates = {
        r["source"]: (r["n_docs"], r["keep_rate"])
        for r in temperature_mix(df, group_col="source", alpha=alpha)
        .select("source", "n_docs", "keep_rate")
        .distinct()
        .collect()
    }
    vals = list(rates.values())
    assert all(0.0 < kr <= 1.0 for _, kr in vals)
    assert max(kr for _, kr in vals) == 1.0
    for n1, k1 in vals:
        for n2, k2 in vals:
            if n1 < n2:
                assert k1 >= k2 - 1e-9


@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_prop_winsorize_bounds_and_interior_identity(spark, vals):
    """Winsorized values always lie in [lo_cut, hi_cut]; values already
    inside the cuts are untouched; cuts are actual data values."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
        winsorize_by_group,
    )

    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, id bigint, value double")
    out = winsorize_by_group(df, group_col="g", value_col="value").collect()
    dataset = {r["value"] for r in out}
    for r in out:
        assert r["lo_cut"] <= r["winsorized"] <= r["hi_cut"]
        assert r["lo_cut"] in dataset and r["hi_cut"] in dataset
        if r["lo_cut"] <= r["value"] <= r["hi_cut"]:
            assert r["winsorized"] == r["value"]


# ---- r8: linear interpolation invariants -----------------------------
_li_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # minute offset
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-100, max_value=100)),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


def _li_reference(rows):
    """Pure-python reference: prev/next non-null neighbor by time."""
    srt = sorted(rows)
    out = {}
    for i, (m, v) in enumerate(srt):
        if v is not None:
            out[m] = v
            continue
        prev = next(((pm, pv) for pm, pv in reversed(srt[:i]) if pv is not None), None)
        nxt = next(((nm, nv) for nm, nv in srt[i + 1:] if nv is not None), None)
        if prev is None or nxt is None:
            out[m] = None
        else:
            (pm, pv), (nm, nv) = prev, nxt
            out[m] = pv + (nv - pv) * ((m - pm) / (nm - pm))
    return out


@settings(**_SETTINGS)
@given(rows=_li_rows, nparts=st.integers(min_value=1, max_value=4))
def test_interpolate_linear_matches_reference_any_partitioning(
    spark, rows, nparts
):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.operators.gapfill import (
        interpolate_linear,
    )

    data = [
        (1, _T0 + datetime.timedelta(minutes=m), v) for m, v in rows
    ]
    df = spark.createDataFrame(
        data, "k int, ts timestamp, v double"
    ).repartition(nparts)
    got = {
        int((r.ts - _T0).total_seconds() // 60): r.v_li
        for r in interpolate_linear(df, "ts", "k", "v", round6=False).collect()
    }
    want = _li_reference(rows)
    assert set(got) == set(want)
    for m in want:
        if want[m] is None:
            assert got[m] is None
        else:
            assert got[m] == __import__("pytest").approx(want[m], abs=1e-9)


@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=17),
    c=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, c, data):
    """encode_bmp → decode_bmp is identity for ANY pixel buffer at any
    (width, height, channels) — covers every row-padding residue class
    and both palette (gray) and direct (RGB/RGBA) layouts."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.bmp import (
        decode_bmp,
        encode_bmp,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * c,
                max_size=w * h * c,
            )
        )
    )
    assert decode_bmp(encode_bmp(w, h, c, px)) == (w, h, c, px)


@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=17),
    c=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip_property(w, h, c, data):
    """encode_tiff → decode_tiff is identity for ANY pixel buffer at
    any (width, height, channels)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.tiff import (
        decode_tiff,
        encode_tiff,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * c,
                max_size=w * h * c,
            )
        )
    )
    assert decode_tiff(encode_tiff(w, h, c, px)) == (w, h, c, px)


# corpora of short pseudo-words, including empty docs, all-identical
# docs, and single-word docs — the edge shapes the r14 plan rewrites
# (fused OOV, window-sized jaccard) must hold on
_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24),
    min_size=1,
    max_size=10,
)


@settings(**_SETTINGS)
@given(texts=_texts, k=st.integers(min_value=1, max_value=6))
def test_oov_fusion_equals_composition(spark, texts, k):
    """r14 plan fusion invariant: oov_rate_against_top(df, k) ==
    oov_rate(df, vocab_top_terms(df, k)) on arbitrary corpora (empty
    docs, whitespace-only docs, total-duplicate corpora)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.text import (
        oov_rate,
        oov_rate_against_top,
        vocab_top_terms,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    old = {tuple(r) for r in oov_rate(df, vocab_top_terms(df, k=k)).collect()}
    new = {tuple(r) for r in oov_rate_against_top(df, k=k).collect()}
    assert new == old


@settings(**_SETTINGS)
@given(texts=_texts, cap=st.one_of(st.none(), st.integers(1, 4)))
def test_jaccard_window_sizes_equal_exact_set_sizes(spark, texts, cap):
    """r14 storage rewrite invariant: the window-attached n_sh must make
    jaccard_pairs emit exactly the pairs a pandas set computation gives
    (full set sizes even under the doc-frequency cap, cap only filters
    the index)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        jaccard_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs(
            df, n=2, threshold=0.0, max_doc_freq=cap
        ).collect()
    }
    # pandas mini-oracle: normalized 2-gram shingle sets
    import re as _re

    def sh(t):
        toks = [w for w in _re.sub(r"\s+", " ", t.strip().lower()).split(" ") if w]
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    if cap is not None:
        from collections import Counter

        dfreq = Counter(s for v in sets.values() for s in v)
        index = {i: {s for s in v if dfreq[s] <= cap} for i, v in sets.items()}
    else:
        index = sets
    want = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(index[a] & index[b])
            if inter == 0:
                continue
            jac = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            want.add((a, b, jac))
    assert got == want
