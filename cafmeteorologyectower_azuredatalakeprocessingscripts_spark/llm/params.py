"""Shared deterministic parameters for the dedup/similarity operators.

Cross-engine determinism contract: every hash in the LLM operators is
derived from md5 (identical bytes in any engine), mapped to integers via
the first 15 hex digits (60 bits — safely inside int64, no overflow under
ANSI mode). The universal-hash family below uses 31-bit inputs so
``a*x + b`` stays under 2^62. The same literals feed both the Spark
implementation and the DuckDB oracle SQL.
"""

# universal hash family h_i(x) = (A[i] * x + B[i]) mod P over 31-bit x
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
NUM_HASHES = 16
LSH_BANDS = 4
LSH_ROWS = 4  # NUM_HASHES = LSH_BANDS * LSH_ROWS

# fixed pseudo-random odd constants (generated once, frozen here)
MINHASH_A = [
    1103515245, 1299709, 1500450271, 2038074743,
    48271, 69621, 16807, 1583534621,
    997918189, 1223334444, 214013, 134775813,
    1093, 214903, 1171, 62089911,
]
MINHASH_B = [
    12345, 362437, 524287, 8191,
    2531011, 13849, 65537, 4099,
    9176, 7919, 104729, 1299721,
    15485863, 32452843, 49979687, 67867967,
]

SHINGLE_N = 3  # word n-gram size for Jaccard/MinHash shingling

SIMHASH_BITS = 32
SIMHASH_HAMMING_MAX = 6
SIMHASH_BUCKET_BITS = 8  # blocking prefix for the pair self-join

# language-ID marker vocabularies (content heuristic; precedence order
# breaks score ties deterministically)
LANG_MARKERS = {
    "zh": ["join", "window", "stream", "batch"],
    "fr": ["query", "window", "group", "agg"],
    "es": ["data", "stream", "row", "filter"],
    "de": ["vector", "hash", "key", "sort"],
    "en": ["the", "a", "value", "table"],
}
LANG_PRECEDENCE = ["zh", "fr", "es", "de", "en"]
