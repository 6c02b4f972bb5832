"""Distributed BPE tokenizer training — tokenizer FITTING as a
pipeline op, completing the token-counting story (`text.token_count`
counts with a fixed regex; this learns the vocabulary).

Algorithm (Sennrich et al. 2016, the word-frequency formulation): the
corpus collapses ONCE to a (word, count) table — after that first
aggregation every merge iteration runs over the distinct-word table
only, so the per-merge cost is corpus-size-INDEPENDENT (at 100 TB the
distinct-word table is ~1e8 rows, not 1e12 docs). Each iteration is:

1. one distributed pair-count: explode adjacent symbol pairs weighted
   by word count, aggregate, take the global top-1 (deterministic
   tie-break: highest count, then lexicographically smallest
   (left, right) — pinned so any two engines agree);
2. a driver-side scalar collect of that single winning row (same
   bounded pattern as the incremental high-watermark read);
3. an Arrow-batched merge application over the symbol arrays
   (non-overlapping, left-to-right — per-word Python inside
   ``mapInPandas``, no vectorized builtin exists for adjacent-pair
   rewriting);
4. every ``checkpoint_every`` merges, ``localCheckpoint()`` cuts the
   lineage so the plan does not grow linearly with merges.

Registry note: iterative + driver-scalar-per-round makes this the
documented non-SQL-expressible shape (a DuckDB oracle cannot replay a
50-round loop in one query); it ships library + reference-checked
tests in r13 and is the standing candidate for a weaker rows-only
driver query in r14 if the freeze lifts.

Scale: never an all-pairs or per-doc loop — the only per-row Python is
the Arrow-batched merge rewriter over the word table. Tie-break
determinism means reruns and engines converge on identical merge
sequences.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_END = "</w>"

_WORDS_SCHEMA = T.StructType(
    [
        T.StructField("syms", T.ArrayType(T.StringType())),
        T.StructField("n", T.LongType()),
    ]
)


def _word_table(df: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    """(symbol-array, count) over the corpus's distinct words: split on
    whitespace, drop empties, one global aggregation. Symbols start as
    single characters with an end-of-word marker."""
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    words = (
        df.select(F.explode(F.split(txt, r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # chars + end marker, all JVM-side
    return words.select(
        F.concat(
            F.split(F.col("w"), "(?!$)"), F.array(F.lit(_END))
        ).alias("syms"),
        "n",
    )


def _top_pair(words: DataFrame) -> tuple[str, str, int] | None:
    """One distributed pair-count round: the winning adjacent pair by
    (count desc, left asc, right asc) — or None when no pair exists."""
    # the >=2 guard runs BEFORE the explode (ADVICE r13: filtering
    # after the select leaned on missing-reference resolution, and a
    # 1-symbol word would build the descending sequence(0,-1) first —
    # vacuous today since every word is chars+'</w>', but the guard
    # belongs where it protects)
    pairs = words.filter(F.size("syms") >= 2).select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.col("syms").getItem(i).alias("left"),
                    F.col("syms").getItem(i + 1).alias("right"),
                ),
            )
        ).alias("p"),
    )
    row = (
        pairs.groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
        .limit(1)
        .collect()
    )
    if not row:
        return None
    r = row[0]
    return r["left"], r["right"], int(r["freq"])


def _rewrite_syms(syms, pairs):
    """Apply ``pairs`` — ``(left, right, fused)`` triples IN ORDER —
    to one symbol list: each merge replaces adjacent (left, right)
    with the fused symbol, non-overlapping left-to-right. The ONE
    rewrite loop shared by :func:`_apply_merges` and the fused
    pair-count stage (:func:`_pair_counts_after_merges`), so the two
    paths are merge-identical by construction."""
    syms = list(syms)
    for left, right, fused in pairs:
        res = []
        i = 0
        ln = len(syms)
        while i < ln:
            if i + 1 < ln and syms[i] == left and syms[i + 1] == right:
                res.append(fused)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def _apply_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Rewrite every symbol array applying ``merges`` IN ORDER, each
    replacing adjacent (left, right) with the fused symbol,
    non-overlapping left-to-right — Arrow-batched; there is no built-in
    for adjacent-pair rewriting.

    Takes the whole pending-merge list so the un-checkpointed tail of
    the training loop is ONE MapInPandas stage instead of a chain of
    one per merge (r16: each chained stage is a separate JVM->Python
    ->JVM crossing per task; with ``checkpoint_every=8`` the pair-count
    job after merge k re-paid k crossings. Applying the list inside a
    single Python function is order-identical, so the learned merge
    sequence is byte-for-byte unchanged — pinned by the hybrid/
    distributed identity tests)."""
    if not merges:
        return words
    pairs = [(left, right, left + right) for left, right in merges]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_rewrite_syms(syms, pairs) for syms in pdf["syms"]]
            yield pd.DataFrame({"syms": out, "n": pdf["n"]})

    return words.mapInPandas(run, _WORDS_SCHEMA)


_PAIR_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("left", T.StringType()),
        T.StructField("right", T.StringType()),
        T.StructField("freq", T.LongType()),
    ]
)


def _pair_counts_after_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Partial (left, right) → Σn pair histogram of the word table
    AFTER applying the pending ``merges`` — the rewrite and the
    adjacent-pair count fused into ONE Python stage (r17, VERDICT r16
    #5): the rewritten symbol arrays never cross the Arrow boundary
    back to the JVM and the JVM-side transform/explode fan-out
    disappears; each batch emits one dict-aggregated histogram (a
    Python map-side partial aggregate, ≤ distinct-pairs rows per
    batch), leaving the JVM a histogram-sized final aggregation
    instead of a word-table-sized explode. Counts are exactly the
    Σ word-count per adjacent pair that :func:`_top_pair` computes —
    the rewrite loop is :func:`_rewrite_syms`, shared with
    :func:`_apply_merges`, so the fused path is merge-identical by
    construction (and pinned by the r17 identity test)."""
    pairs = [(left, right, left + right) for left, right in merges]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[tuple[str, str], int] = {}
            for syms, n in zip(pdf["syms"], pdf["n"]):
                if pairs:
                    syms = _rewrite_syms(syms, pairs)
                n = int(n)
                for i in range(len(syms) - 1):
                    key = (syms[i], syms[i + 1])
                    acc[key] = acc.get(key, 0) + n
            if acc:
                yield pd.DataFrame(
                    {
                        "left": [k[0] for k in acc],
                        "right": [k[1] for k in acc],
                        "freq": list(acc.values()),
                    }
                )

    return words.mapInPandas(run, _PAIR_COUNTS_SCHEMA)


def _top_pair_after_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> tuple[str, str, int] | None:
    """The winning adjacent pair of the word table with the pending
    ``merges`` applied — same (count desc, left asc, right asc) rule as
    :func:`_top_pair`. With a pending tail the rewrite+count runs as
    the fused Python stage above; with no tail (the round right after
    a checkpoint) the pure-JVM explode path is kept — it pays no
    Python crossing at all."""
    if not merges:
        return _top_pair(words)
    row = (
        _pair_counts_after_merges(words, merges)
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
        .limit(1)
        .collect()
    )
    if not row:
        return None
    r = row[0]
    return r["left"], r["right"], int(r["freq"])


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Single-merge form of :func:`_apply_merges` (kept for API and
    test compatibility)."""
    return _apply_merges(words, [(left, right)])


def _persistent_rdd_ids(spark) -> set[int]:
    return {
        int(x)
        for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def _release_rdds(spark, ids: set[int]) -> None:
    """Unpersist localCheckpoint storage by RDD id —
    ``DataFrame.unpersist`` does NOT release a localCheckpoint, and a
    training loop must not leak cached blocks into the caller's
    session (the word table is vocabulary-sized, but sessions are
    long-lived)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
    lowercase: bool = False,
    checkpoint_every: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns
    ``[(rank, left, right, freq), ...]`` in merge order. Stops early
    when the best remaining pair's frequency drops below
    ``min_freq``. All checkpoint storage is released before returning
    — the session's persistent-RDD set is left exactly as found.

    ``checkpoint_every`` bounds the pending-merge tail: each pair-count
    round re-applies the whole tail from the last checkpoint, so
    per-window Python rewrite work is O(checkpoint_every²) passes per
    word (ADVICE r16 — the old lazy chain recomputed the same work;
    keep the value modest rather than raising it substantially, the
    r17 sweep measured the budget-10 optimum at the default)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    outside = _persistent_rdd_ids(spark)
    held: set[int] = set()

    def checkpoint(frame: DataFrame) -> DataFrame:
        nonlocal held
        out = frame.localCheckpoint()  # eager: once this materializes,
        now = _persistent_rdd_ids(spark) - outside
        stale = held & now  # ... the older checkpoints are no longer inputs
        _release_rdds(spark, stale)
        held = now - stale
        return out

    try:
        base = checkpoint(_word_table(df, text_col, lowercase))
        pending: list[tuple[str, str]] = []
        merges: list[tuple[int, str, str, int]] = []
        for k in range(n_merges):
            # the un-checkpointed merge tail rides as ONE fused Python
            # stage over the last checkpoint (r16 — see _apply_merges),
            # and since r17 the adjacent-pair count itself is folded
            # into that same stage (_pair_counts_after_merges): only a
            # histogram crosses back to the JVM, not the rewritten
            # symbol arrays + their explode
            best = _top_pair_after_merges(base, pending)
            if best is None or best[2] < min_freq:
                break
            left, right, freq = best
            merges.append((k, left, right, freq))
            pending.append((left, right))
            if (k + 1) % checkpoint_every == 0:
                # materialize the pending tail before the plan grows
                base = checkpoint(_apply_merges(base, pending))
                pending = []
        return merges
    finally:
        _release_rdds(spark, _persistent_rdd_ids(spark) - outside)


def bpe_train_hybrid(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
    lowercase: bool = False,
    min_word_freq: int = 1,
    max_distinct_words: int | None = None,
) -> list[tuple[int, str, str, int]]:
    """Merge-identical fast path for production merge budgets: ONE
    distributed pass builds the (word, count) histogram, then the merge
    loop runs in driver memory with incremental pair-count maintenance
    (a lazy-deletion heap + per-affected-word updates — the classic
    single-node BPE trainer structure).

    Why this exists (VERDICT r14 #4): :func:`bpe_train` pays one Spark
    job + a driver round-trip PER MERGE (~0.1-0.3 s floor each), which
    is the right shape for auditing a handful of merges against an
    oracle but puts a 30-50k-merge production budget at hours of
    driver-bound latency. The histogram, however, is corpus-size-
    INDEPENDENT after the first aggregation (~1e8 distinct words at
    100 TB, a few GB as strings) — so the scalable split is: Spark does
    the corpus-sized work (tokenize + count, one shuffle), the driver
    does the vocabulary-sized work (merge loop, microseconds per round
    after the first). Identical tie-break (freq desc, left asc, right
    asc), identical non-overlapping left-to-right merge application,
    identical ``min_freq`` stop — a regression test pins the merge list
    against :func:`bpe_train` round-for-round.

    Escape hatches when the histogram itself is too big to collect:
    ``min_word_freq`` drops hapax/rare words from the histogram (the
    standard trainer cutoff; changes learned merges only where rare
    words would have contributed pair mass — documented, off by
    default) and ``max_distinct_words`` keeps the top-N words by
    (count desc, word asc) — a deterministic truncation, same caveat.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    hist = (
        df.select(F.explode(F.split(txt, r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_word_freq > 1:
        hist = hist.filter(F.col("n") >= min_word_freq)
    if max_distinct_words is not None:
        hist = hist.orderBy(F.desc("n"), F.asc("w")).limit(max_distinct_words)
    pdf = hist.toPandas()
    return _train_from_histogram(
        list(pdf["w"]), [int(x) for x in pdf["n"]], n_merges, min_freq
    )


def _train_from_histogram(
    hist_words: list[str],
    hist_counts: list[int],
    n_merges: int,
    min_freq: int,
) -> list[tuple[int, str, str, int]]:
    """The driver-side exact merge loop over a (word, count) histogram
    — the in-memory half of :func:`bpe_train_hybrid`, factored out so
    property tests can drive it directly against an independent
    reference with no Spark in the loop. Same pinned tie-break
    (freq desc, left asc, right asc), same non-overlapping
    left-to-right merge application, same ``min_freq`` stop as
    :func:`bpe_train`.

    Precondition (ADVICE r15 #2): every histogram count must be >= 1.
    The retraction bookkeeping below (``del pair_count[p]`` once a
    running total hits <= 0) is only sound under that invariant — a
    zero/negative count would desync ``pair_words`` from
    ``pair_count`` and silently skip rewrites. Spark ``groupBy``
    counts and ``Counter`` values always satisfy it; guard the public
    boundary so a direct caller cannot violate it silently."""
    import heapq

    for c in hist_counts:
        if c < 1:
            raise ValueError(
                f"histogram counts must all be >= 1, got {c}; "
                "zero/negative counts would desync the incremental "
                "pair bookkeeping"
            )

    words: list[list[str]] = [list(w) + [_END] for w in hist_words]
    counts: list[int] = list(hist_counts)
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        cw = counts[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_count[p] = pair_count.get(p, 0) + cw
            pair_words.setdefault(p, set()).add(wi)
    # lazy-deletion heap: entries are (-count, left, right, count); an
    # entry is live iff its count still equals pair_count[pair]
    heap = [(-c, l, r, c) for (l, r), c in pair_count.items()]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        c = pair_count.get(p, 0)
        if c > 0:
            heapq.heappush(heap, (-c, p[0], p[1], c))

    merges: list[tuple[int, str, str, int]] = []
    for k in range(n_merges):
        best = None
        while heap:
            negc, l, r, c = heap[0]
            if pair_count.get((l, r), 0) != c:
                heapq.heappop(heap)  # stale entry
                continue
            best = (l, r, c)
            break
        if best is None or best[2] < min_freq:
            break
        left, right, freq = best
        merges.append((k, left, right, freq))
        fused = left + right
        touched: set[tuple[str, str]] = set()
        for wi in list(pair_words.get((left, right), ())):
            syms = words[wi]
            cw = counts[wi]
            # retract this word's pair mass, rewrite, re-add — O(len)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_count[p] -= cw
                if pair_count[p] <= 0:
                    del pair_count[p]
                    pair_words.pop(p, None)
                else:
                    pair_words[p].discard(wi)
                touched.add(p)
            res: list[str] = []
            i = 0
            ln = len(syms)
            while i < ln:
                if i + 1 < ln and syms[i] == left and syms[i + 1] == right:
                    res.append(fused)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[wi] = res
            for i in range(len(res) - 1):
                p = (res[i], res[i + 1])
                pair_count[p] = pair_count.get(p, 0) + cw
                pair_words.setdefault(p, set()).add(wi)
                touched.add(p)
        for p in touched:
            push(p)
    return merges


def bpe_segment(word: str, merges: list[tuple[int, str, str, int]]) -> list[str]:
    """Segment ONE word with a learned merge list (greedy by merge
    rank — the standard BPE inference). Driver/worker-side helper for
    :func:`bpe_apply`."""
    syms = list(word) + [_END]
    rank = {(l, r): k for k, l, r, _ in merges}
    while len(syms) >= 2:
        best_k = None
        best_i = -1
        for i in range(len(syms) - 1):
            k = rank.get((syms[i], syms[i + 1]))
            if k is not None and (best_k is None or k < best_k):
                best_k, best_i = k, i
        if best_k is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = False,
) -> DataFrame:
    """Tokenize documents with a learned merge list -> (id, n_tokens,
    n_unk_chars). Merges ship to the workers inside the closure (a
    merge list is vocabulary-sized — broadcast-small by construction);
    per-word segmentation is memoized per batch since corpora repeat
    words heavily."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("n_words", T.IntegerType()),
        ]
    )
    df = df.select(id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            ids, ntok, nw = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                s = "" if t is None else str(t)
                if lowercase:
                    s = s.lower()
                words = [w for w in s.split() if w]
                total = 0
                for w in words:
                    c = memo.get(w)
                    if c is None:
                        c = len(bpe_segment(w, merges))
                        memo[w] = c
                    total += c
                ids.append(i)
                ntok.append(total)
                nw.append(len(words))
            yield pd.DataFrame({"doc_id": ids, "n_tokens": ntok, "n_words": nw})

    return df.mapInPandas(run, schema)
