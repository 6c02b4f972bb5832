"""Oracle-SQL data module for `__spark_entry__.py` (VERDICT r11 #7).

Every `_*_SQL` string literal and `*_sql()` builder that backs
`oracle_sql()` lives here, plus the shared tuning constants the SQL
and the Spark-side queries both read (moved as a closure so the two
sides keep one source of truth). This is a PURE MOVE from
`__spark_entry__.py` — the strings are byte-identical, and the entry
module re-injects every name here into its own namespace at import
time, so the driver contract (entry/queries/oracle_sql importable from
`__spark_entry__`) is unchanged. Definition order is the original
file order.
"""

from __future__ import annotations

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.params import (
    LANG_MARKERS,
    LANG_PRECEDENCE,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    SIMHASH_BITS,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.curation import (
    HASH_SPACE,
    hash_u32_sql,
)


_NULLS_SQL = """
    SELECT event_id, user_id, event_type, ts,
           CASE WHEN value <= 450 THEN value END AS value_n,
           CASE WHEN user_id % 7 <> 0 THEN props END AS props_n
    FROM events
"""

_FLAGSHIP_PARTITIONED_SQL = """
WITH bucketed AS (
  SELECT event_type,
         make_timestamp(CAST(floor(epoch(ts)/900)*900*1000000 AS BIGINT)) AS TIMESTAMP,
         count(*) AS n_events,
         round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type,
         date_trunc('day', min(TIMESTAMP)) AS lo,
         CASE WHEN max(TIMESTAMP) = date_trunc('day', max(TIMESTAMP))
              THEN max(TIMESTAMP)
              ELSE date_trunc('day', max(TIMESTAMP)) + INTERVAL 1 DAY END AS hi
  FROM bucketed GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS TIMESTAMP
  FROM bounds
), filled AS (
  SELECT s.event_type, s.TIMESTAMP, coalesce(b.n_events, 0) AS n_events, b.avg_value
  FROM spine s LEFT JOIN bucketed b USING (event_type, TIMESTAMP)
)
SELECT event_type, TIMESTAMP, n_events, avg_value,
       round(avg_value - lag(avg_value)
             OVER (PARTITION BY event_type ORDER BY TIMESTAMP), 6) AS delta,
       coalesce(abs(round(avg_value - lag(avg_value)
                          OVER (PARTITION BY event_type ORDER BY TIMESTAMP), 6)) >= 100.0,
                false) AS spike
FROM filled
"""

_FLAGSHIP_INTERPOLATED_SQL = """
WITH bucketed AS (
  SELECT event_type,
         make_timestamp(CAST(floor(epoch(ts)/900)*900*1000000 AS BIGINT)) AS TIMESTAMP,
         count(*) AS n_events,
         round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type,
         date_trunc('day', min(TIMESTAMP)) AS lo,
         CASE WHEN max(TIMESTAMP) = date_trunc('day', max(TIMESTAMP))
              THEN max(TIMESTAMP)
              ELSE date_trunc('day', max(TIMESTAMP)) + INTERVAL 1 DAY END AS hi
  FROM bucketed GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS TIMESTAMP
  FROM bounds
), filled AS (
  SELECT s.event_type, s.TIMESTAMP, coalesce(b.n_events, 0) AS n_events, b.avg_value
  FROM spine s LEFT JOIN bucketed b USING (event_type, TIMESTAMP)
), nbrs AS (
  SELECT event_type, TIMESTAMP, n_events, avg_value,
         last_value(avg_value IGNORE NULLS) OVER w_p AS pv,
         last_value(CASE WHEN avg_value IS NOT NULL THEN TIMESTAMP END IGNORE NULLS)
           OVER w_p AS pts,
         first_value(avg_value IGNORE NULLS) OVER w_n AS nv,
         first_value(CASE WHEN avg_value IS NOT NULL THEN TIMESTAMP END IGNORE NULLS)
           OVER w_n AS nts
  FROM filled
  WINDOW w_p AS (PARTITION BY event_type ORDER BY TIMESTAMP
                 ROWS UNBOUNDED PRECEDING),
         w_n AS (PARTITION BY event_type ORDER BY TIMESTAMP
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), li AS (
  SELECT event_type, TIMESTAMP, n_events, avg_value,
         CASE WHEN avg_value IS NOT NULL THEN avg_value
              ELSE pv + (nv - pv) *
                   ((epoch_us(TIMESTAMP) - epoch_us(pts)) * 1.0 /
                    (epoch_us(nts) - epoch_us(pts)))
         END AS avg_li
  FROM nbrs
), m AS (
  SELECT event_type, TIMESTAMP, n_events, avg_value,
         CAST(floor(avg_li * 1e6) AS BIGINT) AS li_micro
  FROM li
)
SELECT event_type, TIMESTAMP, n_events, avg_value, li_micro,
       li_micro - lag(li_micro)
         OVER (PARTITION BY event_type ORDER BY TIMESTAMP) AS delta_micro,
       coalesce(abs(li_micro - lag(li_micro)
                    OVER (PARTITION BY event_type ORDER BY TIMESTAMP)) >= 100000000,
                false) AS spike
FROM m
"""

_TOA5_ROUNDTRIP_SQL = """
WITH raw(TIMESTAMP, RECORD, Tair, RH) AS (VALUES
  (TIMESTAMP '2022-06-01 00:00:00', CAST(100 AS BIGINT), 21.5, 45.2),
  (TIMESTAMP '2022-06-01 00:30:00', CAST(101 AS BIGINT), CAST(NULL AS DOUBLE), 44.0),
  (TIMESTAMP '2022-06-01 01:30:00', CAST(103 AS BIGINT), 20.1, CAST(NULL AS DOUBLE)),
  (TIMESTAMP '2022-06-01 01:30:00', CAST(9103 AS BIGINT), 19.9, 41.0),
  (TIMESTAMP '2022-06-01 02:00:00', CAST(9104 AS BIGINT), 19.5, 40.5)
),
dedup AS (
  SELECT TIMESTAMP, RECORD, Tair, RH FROM (
    SELECT *, row_number() OVER (
      PARTITION BY TIMESTAMP
      ORDER BY RECORD ASC NULLS LAST,
               (CASE WHEN Tair IS NULL THEN 1 ELSE 0 END
                + CASE WHEN RH IS NULL THEN 1 ELSE 0 END) ASC) AS rn
    FROM raw) WHERE rn = 1
),
spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2022-06-01 00:00:00',
                                TIMESTAMP '2022-06-02 00:00:00',
                                INTERVAL 30 MINUTE)) AS TIMESTAMP
)
SELECT spine.TIMESTAMP, RECORD, Tair, RH
FROM spine LEFT JOIN dedup USING (TIMESTAMP)
"""

_SINK_ROUNDTRIP_SQL = """
SELECT CAST(CASE WHEN month(ts) >= 10 THEN year(ts) + 1 ELSE year(ts) END AS INTEGER)
         AS wateryear,
       event_type, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

_FLAGSHIP_SQL = """
WITH bucketed AS (
  SELECT make_timestamp(CAST(floor(epoch(ts)/900)*900*1000000 AS BIGINT)) AS TIMESTAMP,
         count(*) AS n_events,
         round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS avg_value
  FROM events GROUP BY 1
), bounds AS (
  SELECT date_trunc('day', min(TIMESTAMP)) AS lo,
         CASE WHEN max(TIMESTAMP) = date_trunc('day', max(TIMESTAMP))
              THEN max(TIMESTAMP)
              ELSE date_trunc('day', max(TIMESTAMP)) + INTERVAL 1 DAY END AS hi
  FROM bucketed
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS TIMESTAMP FROM bounds
), filled AS (
  SELECT s.TIMESTAMP, coalesce(b.n_events, 0) AS n_events, b.avg_value
  FROM spine s LEFT JOIN bucketed b USING (TIMESTAMP)
)
SELECT TIMESTAMP, n_events, avg_value,
       round(avg_value - lag(avg_value) OVER (ORDER BY TIMESTAMP), 6) AS delta,
       coalesce(abs(round(avg_value - lag(avg_value) OVER (ORDER BY TIMESTAMP), 6)) >= 100.0,
                false) AS spike,
       CASE WHEN month(TIMESTAMP) >= 10 THEN year(TIMESTAMP) + 1 ELSE year(TIMESTAMP) END AS wateryear
FROM filled
"""

_DEDUP_RICHEST_SQL = f"""
WITH base AS ({_NULLS_SQL}),
scored AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, event_id,
         (CASE WHEN value_n IS NULL THEN 1 ELSE 0 END +
          CASE WHEN props_n IS NULL THEN 1 ELSE 0 END) AS nan_count
  FROM base
)
SELECT user_id, hour, event_id
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, hour
                                   ORDER BY nan_count, event_id) AS rn
      FROM scored)
WHERE rn = 1
"""

_GAPFILL_SQL = """
WITH bucketed AS (
  SELECT make_timestamp(CAST(floor(epoch(ts)/900)*900*1000000 AS BIGINT)) AS TIMESTAMP,
         count(*) AS n_events
  FROM events GROUP BY 1
), bounds AS (
  SELECT date_trunc('day', min(TIMESTAMP)) AS lo,
         CASE WHEN max(TIMESTAMP) = date_trunc('day', max(TIMESTAMP))
              THEN max(TIMESTAMP)
              ELSE date_trunc('day', max(TIMESTAMP)) + INTERVAL 1 DAY END AS hi
  FROM bucketed
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS TIMESTAMP FROM bounds
)
SELECT s.TIMESTAMP, b.n_events
FROM spine s LEFT JOIN bucketed b USING (TIMESTAMP)
"""

_LAG_SPIKE_SQL = """
WITH d AS (
  SELECT user_id, event_id,
         round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta
  FROM events
)
SELECT user_id, event_id, delta,
       (NOT coalesce(delta >= 100.0, false)) AND coalesce(delta <> 0.0, true) AS change_ok
FROM d
"""

_DAY_FLATLINE_SQL = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS day_avg
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, day_avg,
       coalesce(day_avg - lag(day_avg) OVER (PARTITION BY event_type ORDER BY day) <> 0, true) AS day_change
FROM daily
"""

_FLAG_STRINGS_SQL = """
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         coalesce(l_quantity < 5 OR l_quantity > 45, true) AS qty_bad,
         coalesce(l_discount > 0.05, true) AS disc_bad,
         coalesce(l_tax > 0.04, true) AS tax_bad,
         coalesce(l_returnflag = 'R', true) AS ret_bad,
         l_extendedprice
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       (CASE WHEN qty_bad THEN '1' ELSE '0' END ||
        CASE WHEN disc_bad THEN '1' ELSE '0' END ||
        CASE WHEN tax_bad THEN '1' ELSE '0' END ||
        CASE WHEN ret_bad THEN '1' ELSE '0' END) AS flags,
       CASE WHEN NOT qty_bad AND NOT disc_bad AND NOT tax_bad AND NOT ret_bad
            THEN round(l_extendedprice, 2) END AS graded_price
FROM t
"""

_BOUNDS_SQL = """
SELECT event_id,
       coalesce(value >= 0 AND value < 100, false) AS value_hard_limit,
       CASE WHEN coalesce(value >= 0 AND value < 100, false)
            THEN round(value, 2) END AS value_filtered
FROM events
"""

_WATERYEAR_SQL = """
SELECT CASE WHEN month(o_orderdate) >= 10 THEN year(o_orderdate) + 1
            ELSE year(o_orderdate) END AS wateryear,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS total_price
FROM orders GROUP BY 1
"""

_UNION_OVERLAP_SQL = """
WITH unioned AS (
  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-20'
  UNION ALL
  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-19'
), deduped AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
                 FROM unioned)
  WHERE rn = 1
)
SELECT event_type, count(*) AS n_events FROM deduped GROUP BY 1
"""

_MSLP_SQL = """
SELECT event_id,
       round((80.0 + value/25.0) /
             exp(-0.777 / ((8.314*(value/10.0 + 273.15))/(0.029*9.81)/1000.0)), 6) AS mslp
FROM events
"""

_LATEST_SQL = """
SELECT user_id, event_id, ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

_NULL_PROFILE_SQL = f"""
WITH base AS ({_NULLS_SQL})
SELECT (CASE WHEN value_n IS NULL THEN 1 ELSE 0 END +
        CASE WHEN props_n IS NULL THEN 1 ELSE 0 END) AS nan_count,
       count(*) AS n_rows
FROM base GROUP BY 1
"""

_LAST10D_SQL = """
SELECT event_type, count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS avg_value
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 10 DAY
GROUP BY 1
"""

_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY 1, 2
"""

_TOP_REVENUE_SQL = """
SELECT o_orderkey, c_name,
       round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

_NTOK_SQL = "len(regexp_extract_all(text, '\\S+'))"

_QUALITY_SQL = f"""round(0.4 * least(1.0, {_NTOK_SQL}/100.0)
           + 0.4 * (CASE WHEN length(text) > 0
                         THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))*1.0/length(text)
                         ELSE 0 END)
           + 0.2 * (1.0 - least(1.0, (CASE WHEN length(text) > 0
                          THEN length(regexp_replace(text, '[^0-9]', '', 'g'))*1.0/length(text)
                          ELSE 0 END) * 5.0)), 6)"""

def _stopword_ratio_sql() -> str:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.text import (
        STOPWORDS,
    )

    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    hits = f"len(regexp_extract_all(lower(text), '{pat}'))"
    return (
        f"round(CASE WHEN {_NTOK_SQL} > 0 "
        f"THEN {hits} * 1.0 / {_NTOK_SQL} ELSE 0 END, 6)"
    )

_TEXT_STATS_SQL = f"""
SELECT doc_id,
       {_NTOK_SQL} AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       length(text) AS n_chars_measured,
       {_QUALITY_SQL} AS quality,
       {_stopword_ratio_sql()} AS stopword_ratio
FROM documents
"""

def _lang_id_sql(source: str = "documents") -> str:
    score_exprs = {
        lang: (
            "len(regexp_extract_all(lower(text), "
            f"'\\b({'|'.join(LANG_MARKERS[lang])})\\b'))"
        )
        for lang in LANG_PRECEDENCE
    }
    scores = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score_exprs.items())
    greatest = "greatest(" + ", ".join(f"s_{lg}" for lg in LANG_PRECEDENCE) + ")"
    case = "CASE "
    for lang in LANG_PRECEDENCE:
        case += f"WHEN s_{lang} = best THEN '{lang}' "
    case += "ELSE 'unknown' END"
    return f"""
WITH scored AS (SELECT doc_id, {scores} FROM {source}),
g AS (SELECT *, {greatest} AS best FROM scored)
SELECT doc_id, CASE WHEN best = 0 THEN 'unknown' ELSE ({case}) END AS lang_pred
FROM g
"""

_FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5({_NORM_SQL}) AS fp,
       md5(array_to_string((string_split({_NORM_SQL}, ' '))[1:5], ' ')) AS prefix_fp
FROM documents
"""

_DEDUP_EXACT_SQL = f"""
SELECT md5({_NORM_SQL}) AS fp, min(doc_id) AS keeper_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""

# shared shingle CTE (word n-grams over normalized text), n = 2 for the
# oracle-checked fuzzy-dedup queries (word-soup docs need small n to
# produce overlap)
_SHINGLE_N_Q = 2

def _shingle_cte(n: int, source: str = "documents") -> str:
    # shingles are hashed to 60-bit ints (same md5-prefix hash as the
    # engine) before the distinct — collisions, if any, match exactly
    return f"""
toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM {source}),
sh AS (
  SELECT DISTINCT doc_id AS id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - {n - 1}, 0) + 1),
                                     i -> array_to_string(w[i:i+{n - 1}], ' '))) AS shingle
        FROM toks)
)
"""

_JACCARD_SQL = f"""
WITH {_shingle_cte(_SHINGLE_N_Q)},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (sh_h)
  WHERE a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1
"""

def _minhash_sql() -> str:
    mins = ", ".join(
        f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_P}) AS mh_{i}"
        for i in range(LSH_BANDS * LSH_ROWS)
    )
    bands = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(mh_{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        + f") AS bucket_{b}"
        for b in range(LSH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, bucket_{b} AS bucket FROM banded"
        for b in range(LSH_BANDS)
    )
    return f"""
WITH {_shingle_cte(_SHINGLE_N_Q)},
hashed AS (
  SELECT id, sh_h % {MINHASH_P} AS x
  FROM sh
),
sig AS (SELECT id, {mins} FROM hashed GROUP BY id),
banded AS (SELECT id, {bands} FROM sig),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.id < b.id
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (sh_h)
  WHERE a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN cand USING (id_a, id_b)
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.0
"""

def _corpus_curation_sql() -> str:
    mins = ", ".join(
        f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_P}) AS mh_{i}"
        for i in range(LSH_BANDS * LSH_ROWS)
    )
    bands = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(mh_{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        + f") AS bucket_{b}"
        for b in range(LSH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, bucket_{b} AS bucket FROM banded"
        for b in range(LSH_BANDS)
    )
    return f"""
WITH langs AS ({_lang_id_sql()}),
enr AS (
  SELECT d.doc_id, d.text, l.lang_pred, {_QUALITY_SQL} AS quality,
         {_NTOK_SQL} AS n_tokens, md5({_NORM_SQL}) AS fp
  FROM documents d JOIN langs l ON l.doc_id = d.doc_id
),
kept0 AS (SELECT * FROM enr WHERE lang_pred = 'en' AND quality >= 0.6),
keepers AS (SELECT fp, min(doc_id) AS doc_id FROM kept0 GROUP BY 1),
kept AS (SELECT kept0.* FROM kept0 JOIN keepers USING (fp, doc_id)),
{_shingle_cte(_SHINGLE_N_Q, "kept").strip().rstrip()},
hashed AS (SELECT id, sh_h % {MINHASH_P} AS x FROM sh),
sig AS (SELECT id, {mins} FROM hashed GROUP BY id),
banded AS (SELECT id, {bands} FROM sig),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.id < b.id
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (sh_h)
  WHERE a.id < b.id
  GROUP BY 1, 2
),
ver AS (
  SELECT id_a, id_b
  FROM inter
  JOIN cand USING (id_a, id_b)
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1
)
SELECT doc_id, n_tokens, quality FROM kept
WHERE doc_id NOT IN (SELECT id_b FROM ver)
"""

_MAX_DOC_FREQ_Q = 40

_JACCARD_CAPPED_SQL = f"""
WITH {_shingle_cte(_SHINGLE_N_Q)},
rare AS (SELECT sh_h FROM sh GROUP BY sh_h HAVING count(*) <= {_MAX_DOC_FREQ_Q}),
idx AS (SELECT id, sh_h FROM sh JOIN rare USING (sh_h)),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM idx a JOIN idx b USING (sh_h)
  WHERE a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1
"""

def _simhash_sql() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN w ELSE -w END) AS v_{i}"
        for i in range(SIMHASH_BITS)
    )
    recombine = " + ".join(
        f"CASE WHEN v_{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
),
counted AS (SELECT id, tok, count(*) AS w FROM toks GROUP BY 1, 2),
hashed AS (
  SELECT id, w,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {2 ** SIMHASH_BITS} AS h
  FROM counted
),
sig AS (SELECT id, {votes} FROM hashed GROUP BY id)
SELECT id, ({recombine}) AS simhash FROM sig
"""

_SIMHASH_MAX_HAMMING_Q = 6

def _simhash_pairs_sql() -> str:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        pigeonhole_blocks,
    )

    sig = _simhash_sql().strip().rstrip()
    h = _SIMHASH_MAX_HAMMING_Q
    tagged = "\n  UNION ALL ".join(
        f"SELECT id, simhash, {j} AS blk, (simhash >> {s}) & {(1 << w) - 1} AS val FROM sig"
        for j, (s, w) in enumerate(pigeonhole_blocks(SIMHASH_BITS, h + 1))
    )
    return f"""
WITH sig AS ({sig}),
tagged AS (
  {tagged}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM tagged a JOIN tagged b USING (blk, val)
  WHERE a.id < b.id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {h}
"""

def _simhash64_sql() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN ((h_{side} >> {i}) & 1) = 1 THEN w ELSE -w END) "
        f"AS v_{side}_{i}"
        for side in ("lo", "hi")
        for i in range(32)
    )
    rec = {
        side: " + ".join(
            f"CASE WHEN v_{side}_{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END"
            for i in range(32)
        )
        for side in ("lo", "hi")
    }
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
),
counted AS (SELECT id, tok, count(*) AS w FROM toks GROUP BY 1, 2),
hashed AS (
  SELECT id, w,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h_lo,
         CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h_hi
  FROM counted
),
sig AS (SELECT id, {votes} FROM hashed GROUP BY id)
SELECT id, ({rec['hi']}) AS simhash_hi, ({rec['lo']}) AS simhash_lo FROM sig
"""

def _simhash64_pairs_sql() -> str:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        simhash64_blocks,
    )

    sig = _simhash64_sql().strip()
    h = _SIMHASH_MAX_HAMMING_Q
    tagged = "\n  UNION ALL ".join(
        f"SELECT id, simhash_hi, simhash_lo, {j} AS blk, "
        f"({col} >> {s}) & {(1 << w) - 1} AS val FROM sig"
        for j, (col, s, w) in enumerate(simhash64_blocks(h))
    )
    return f"""
WITH sig AS ({sig}),
tagged AS (
  {tagged}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.simhash_hi AS hi_a, a.simhash_lo AS lo_a,
         b.simhash_hi AS hi_b, b.simhash_lo AS lo_b
  FROM tagged a JOIN tagged b USING (blk, val)
  WHERE a.id < b.id
)
SELECT id_a, id_b,
       bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS hamming
FROM cand
WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= {h}
"""

# occupancy cap for the driver-checked simhash128 valve query — chosen
# so the cap demonstrably BITES at sf0.01 (drops hot vote-saturated
# buckets) while keeping most true pairs; the probe-measured loss curve
# lives in SCALING.md.
_SIMHASH128_BUCKET_CAP_Q = 24

_SIMHASH128_SLICES_Q = (("s0", 1), ("s1", 9), ("s2", 17), ("s3", 25))

def _simhash128_sql() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN ((h_{name} >> {i}) & 1) = 1 THEN w ELSE -w END) "
        f"AS v_{name}_{i}"
        for name, _ in _SIMHASH128_SLICES_Q
        for i in range(32)
    )
    rec = {
        name: " + ".join(
            f"CASE WHEN v_{name}_{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END"
            for i in range(32)
        )
        for name, _ in _SIMHASH128_SLICES_Q
    }
    hashes = ",\n         ".join(
        f"CAST(('0x' || substr(md5(tok), {off}, 8)) AS BIGINT) AS h_{name}"
        for name, off in _SIMHASH128_SLICES_Q
    )
    outs = ", ".join(
        f"({rec[name]}) AS simhash_{name}" for name, _ in _SIMHASH128_SLICES_Q
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
),
counted AS (SELECT id, tok, count(*) AS w FROM toks GROUP BY 1, 2),
hashed AS (
  SELECT id, w,
         {hashes}
  FROM counted
),
sig AS (SELECT id, {votes} FROM hashed GROUP BY id)
SELECT id, {outs} FROM sig
"""

def _simhash128_pairs_sql() -> str:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.dedup import (
        simhash128_blocks,
    )

    sig = _simhash128_sql().strip()
    h = _SIMHASH_MAX_HAMMING_Q
    cap = _SIMHASH128_BUCKET_CAP_Q
    cols = ", ".join(f"simhash_{n}" for n, _ in _SIMHASH128_SLICES_Q)
    tagged = "\n  UNION ALL ".join(
        f"SELECT id, {cols}, {j} AS blk, "
        f"({col} >> {s}) & {(1 << w) - 1} AS val FROM sig"
        for j, (col, s, w) in enumerate(simhash128_blocks(h))
    )
    ab = ", ".join(
        f"a.simhash_{n} AS {n}_a, b.simhash_{n} AS {n}_b"
        for n, _ in _SIMHASH128_SLICES_Q
    )
    ham = " + ".join(f"bit_count(xor({n}_a, {n}_b))" for n, _ in _SIMHASH128_SLICES_Q)
    return f"""
WITH sig AS ({sig}),
tagged AS (
  {tagged}
),
kept AS (
  SELECT t.id, {", ".join("t." + f"simhash_{n}" for n, _ in _SIMHASH128_SLICES_Q)},
         t.blk, t.val
  FROM tagged t
  JOIN (
    SELECT blk, val FROM tagged GROUP BY blk, val HAVING count(*) <= {cap}
  ) ok USING (blk, val)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, {ab}
  FROM kept a JOIN kept b USING (blk, val)
  WHERE a.id < b.id
)
SELECT id_a, id_b, {ham} AS hamming
FROM cand
WHERE {ham} <= {h}
"""

_COSINE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), sims AS (
  SELECT query_id, vec_id,
         round(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*cv[i])) /
               (sqrt(list_sum(list_transform(qv, x -> x*x))) *
                sqrt(list_sum(list_transform(cv, x -> x*x)))), 6) AS cosine
  FROM c CROSS JOIN q
  WHERE vec_id <> query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= 5
"""

_EMBED_NEARDUP_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_sum(list_transform(range(1, len(a.vec)+1), i -> a.vec[i]*b.vec[i])) /
             (sqrt(list_sum(list_transform(a.vec, x -> x*x))) *
              sqrt(list_sum(list_transform(b.vec, x -> x*x)))), 6) AS cosine
FROM v a CROSS JOIN v b
WHERE a.vec_id < b.vec_id
  AND round(list_sum(list_transform(range(1, len(a.vec)+1), i -> a.vec[i]*b.vec[i])) /
            (sqrt(list_sum(list_transform(a.vec, x -> x*x))) *
             sqrt(list_sum(list_transform(b.vec, x -> x*x)))), 6) >= 0.45
"""

_MULTIMODAL_SQL = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS byte_len,
       md5(text) AS content_md5
FROM documents
"""

_MULTIMODAL_PNG_SQL = """
SELECT doc_id, 8 AS width, 8 AS height, 1 AS channels,
       CAST(list_sum(list_transform(range(1, 65),
            i -> ascii(substr(rpad(coalesce(text, ''), 64, ' '), i, 1)) % 256))
         AS BIGINT) AS pixel_sum
FROM documents
"""

# WAV twin: doc_id % 4 == 0 -> IEEE float (quantizes back to the
# codepoints), % 4 == 1 -> G.711 mu-law, % 4 == 2 -> A-law (codepoints
# stored AS the codes; the oracle replays the closed-form segment
# expansions — the same formulas llm/wav.py builds its LUTs from,
# independently verified against CPython audioop), else 8-bit PCM.
_MULTIMODAL_WAV_SQL = """
WITH base AS (
  SELECT doc_id,
         list_transform(range(1, 65),
           i -> ascii(substr(rpad(coalesce(text, ''), 64, ' '), CAST(i AS INTEGER), 1)) % 256) AS cp
  FROM documents
), lin AS (
  SELECT doc_id,
    CASE
      WHEN doc_id % 4 = 1 THEN list_transform(cp, c ->
        CASE WHEN (xor(c, 255) & 128) > 0
             THEN 132 - ((((xor(c, 255) & 15) << 3) + 132) << ((xor(c, 255) >> 4) & 7))
             ELSE ((((xor(c, 255) & 15) << 3) + 132) << ((xor(c, 255) >> 4) & 7)) - 132
        END)
      WHEN doc_id % 4 = 2 THEN list_transform(cp, c ->
        (CASE WHEN (xor(c, 85) & 128) > 0 THEN 1 ELSE -1 END) *
        (CASE ((xor(c, 85) >> 4) & 7)
              WHEN 0 THEN ((xor(c, 85) & 15) << 4) + 8
              WHEN 1 THEN ((xor(c, 85) & 15) << 4) + 264
              ELSE (((xor(c, 85) & 15) << 4) + 264) << (((xor(c, 85) >> 4) & 7) - 1)
         END))
      ELSE cp
    END AS lv
  FROM base
)
SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
       CASE WHEN doc_id % 4 = 0 THEN 32
            WHEN doc_id % 8 = 3 THEN 16 ELSE 8 END AS bits,
       CAST(64 AS BIGINT) AS n_frames,
       64 * 1000.0 / 8000 AS duration_ms,
       CAST(list_sum(lv) AS BIGINT) AS sample_sum,
       CAST(list_sum(list_transform(lv, v -> v * v)) AS BIGINT) AS sample_sumsq
FROM lin
"""

# JPEG twin: 16x16 = four constant 8x8 blocks, one per codepoint of
# the first 4 chars; DC-only blocks make the lossy codec exact, so
# pixel_sum = 64 * sum(codepoints), tripled on the color (4:2:0,
# R=G=B) docs where doc_id % 3 = 0. r13: doc_id % 7 = 0 docs are
# Adobe CMYK (4 constant component planes = the 4 codepoints, stored
# inverted; decoder composite RGB = (c*k+127)//255 per channel) and
# take precedence over the color residue.
_MULTIMODAL_JPEG_SQL = """
WITH cps AS (
  SELECT doc_id,
         list_transform(range(1, 5),
           i -> ascii(substr(rpad(coalesce(text, ''), 4, ' '), CAST(i AS INTEGER), 1)) % 256) AS cp
  FROM documents
)
SELECT doc_id, 16 AS width, 16 AS height,
       CASE WHEN doc_id % 7 = 0 THEN 3
            WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS channels,
       CAST(CASE
         WHEN doc_id % 7 = 0 THEN 256 * (
              ((cp[1] * cp[4] + 127) // 255)
            + ((cp[2] * cp[4] + 127) // 255)
            + ((cp[3] * cp[4] + 127) // 255))
         WHEN doc_id % 3 = 0 THEN 3 * 64 * (cp[1] + cp[2] + cp[3] + cp[4])
         ELSE 64 * (cp[1] + cp[2] + cp[3] + cp[4])
       END AS BIGINT) AS pixel_sum
FROM cps
"""

_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
),
tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT id, term, tf, df,
         round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n
)
SELECT id, term, tf, df, tfidf, term_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term ASC) AS term_rank
  FROM scored
) WHERE term_rank <= 3
"""

_EMBED_CENTROIDS_SQL = """
WITH long AS (
  SELECT label,
         unnest(range(0, len(embedding))) AS dim_pos,
         unnest(embedding) AS x
  FROM embeddings
)
SELECT label, CAST(dim_pos AS INTEGER) AS dim_pos,
       CAST(sum(floor(CAST(x AS DOUBLE) * 1e6)) AS BIGINT) AS sum_micro,
       count(*) AS n
FROM long GROUP BY 1, 2
"""

_TYPE_SUMMARY_SQL = """
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY 1
"""

_ROLLUP_SQL = """
SELECT coalesce(event_type, 'ALL') AS event_type, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS avg_value
FROM events GROUP BY ROLLUP (event_type)
"""

_EXCEPT_SQL = """
WITH mid AS (
  SELECT min(epoch_us(ts)) + (max(epoch_us(ts)) - min(epoch_us(ts))) * 99 // 100 AS mid_us
  FROM events
)
SELECT DISTINCT user_id FROM events, mid WHERE epoch_us(ts) < mid_us
EXCEPT ALL
SELECT DISTINCT user_id FROM events, mid WHERE epoch_us(ts) >= mid_us
"""

_PIVOT_SQL = """
SELECT date_trunc('day', ts) AS day,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY 1
"""

_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
  FROM gaps
)
SELECT user_id, sess_no, count(*) AS n_events,
       min(ts) AS sess_start, max(ts) AS sess_end
FROM numbered GROUP BY 1, 2
"""

_SESSION_WINDOW_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM gaps
)
SELECT user_id, min(ts) AS sess_start,
       max(ts) + INTERVAL 30 MINUTE AS sess_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, sess_no
"""

_ANTI_JOIN_SQL = """
SELECT DISTINCT user_id FROM events
WHERE user_id NOT IN (SELECT user_id FROM events
                      WHERE event_type = 'purchase' AND value > 250)
"""

_MULTIMODAL_FRAMES_SQL = """
-- documents are pure ASCII (verified: octet_length == length), so
-- VARCHAR substring is byte-exact and the BLOB cast matches Spark's
-- byte slicing
SELECT doc_id, CAST(k AS INTEGER) AS frame_no,
       md5(substring(text, CAST(k AS INTEGER)*16 + 1, 16)) AS frame_md5,
       CAST(length(substring(text, CAST(k AS INTEGER)*16 + 1, 16)) AS INTEGER) AS frame_len
FROM documents, unnest(range(0, length(text) // 16, 2)) AS t(k)
"""

# Animated-GIF frame demux twin (r13): four composited 8x8 canvas
# snapshots per doc, each canvas byte-sum a closed-form codepoint
# expression. cp = 1-based list of the first 88 codepoints mod 256
# (space-padded). Frame 0 = full canvas cp[1..64]; frame 1 draws a
# 4x4 rect at (2,2) from cp[65..80] with TRANSPARENT index 0 (holes
# keep frame-0 content) and disposal 2 (rect -> background after the
# snapshot); frame 2 draws 2x2 at (0,0) from cp[81..84] with disposal
# 3 (canvas restored after); frame 3 draws 2x2 at (6,0) from
# cp[85..88]. Canvases are RGB (identity palette), so sums triple.
_MULTIMODAL_GIF_FRAMES_SQL = """
WITH base AS (
  SELECT doc_id,
         list_transform(range(1, 89),
           i -> ascii(substr(rpad(coalesce(text, ''), 88, ' '), CAST(i AS INTEGER), 1)) % 256) AS cp
  FROM documents
), sums AS (
  SELECT doc_id, cp,
    CAST(list_sum(list_transform(range(1, 65), i -> cp[CAST(i AS INTEGER)])) AS BIGINT) AS s0,
    -- frame-1 rect rows 2-5 x cols 2-5 (0-based): flat p = r*8+c, cp index p+1
    CAST(list_sum(list_transform(range(0, 16),
      j -> cp[CAST((2 + j // 4) * 8 + (2 + j % 4) + 1 AS INTEGER)])) AS BIGINT) AS old1,
    CAST(list_sum(list_transform(range(0, 16),
      j -> CASE WHEN cp[CAST(65 + j AS INTEGER)] = 0 THEN 0
                ELSE cp[CAST(65 + j AS INTEGER)]
                     - cp[CAST((2 + j // 4) * 8 + (2 + j % 4) + 1 AS INTEGER)] END)) AS BIGINT) AS d1
  FROM base
), f AS (
  SELECT doc_id, s0, s0 + d1 AS s1,
    -- pre-frame-2 canvas = frame-0 canvas with rect1 zeroed (disposal 2, bg=0)
    s0 - old1 - (cp[1] + cp[2] + cp[9] + cp[10])
              + (cp[81] + cp[82] + cp[83] + cp[84]) AS s2,
    -- frame-2 disposal 3 restores the pre-frame-2 canvas before frame 3
    s0 - old1 - (cp[7] + cp[8] + cp[15] + cp[16])
              + (cp[85] + cp[86] + cp[87] + cp[88]) AS s3
  FROM sums
)
SELECT doc_id, 0 AS frame_no, 192 AS frame_len, CAST(3 * s0 AS BIGINT) AS frame_sum FROM f
UNION ALL SELECT doc_id, 1, 192, CAST(3 * s1 AS BIGINT) FROM f
UNION ALL SELECT doc_id, 2, 192, CAST(3 * s2 AS BIGINT) FROM f
UNION ALL SELECT doc_id, 3, 192, CAST(3 * s3 AS BIGINT) FROM f
"""

_EMB_DIM = 64

# 8 planes = 256 buckets/table: at threshold 0.45 recall is modest (LSH
# blocking is a high-threshold tool — see the 0.95-threshold recall test),
# but candidate pairs stay ~bucket-sized as the corpus grows — the point
# of the scale path. 4 planes measured 16x more candidates at sf0.1.
_NEARDUP_PLANES = 8

_NEARDUP_TABLES = 8

def _srp_values_sql(planes: int, tables: int, dim: int) -> str:
    """(tbl, plane, weights) VALUES rows replaying srp_weights()."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        srp_weights,
    )

    rows = []
    for t in range(tables):
        for p, wrow in enumerate(srp_weights(dim, planes, offset=t * planes)):
            lst = "[" + ", ".join(repr(x) for x in wrow) + "]"
            rows.append(f"({t}, {p}, CAST({lst} AS DOUBLE[]))")
    return ",\n  ".join(rows)

_DOT_VW = "list_sum(list_transform(range(1, {dim}+1), i -> {a}[i] * {b}[i]))"

def _cos_sql(a: str, b: str, dim: int = _EMB_DIM) -> str:
    dot = _DOT_VW.format(dim=dim, a=a, b=b)
    na = f"sqrt(list_sum(list_transform({a}, x -> x*x)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x*x)))"
    return f"round({dot} / ({na} * {nb}), 6)"

def _embed_neardup_blocked_sql() -> str:
    vals = _srp_values_sql(_NEARDUP_PLANES, _NEARDUP_TABLES, _EMB_DIM)
    proj = _DOT_VW.format(dim=_EMB_DIM, a="vec", b="wv")
    return f"""
WITH w(tbl, plane, wv) AS (VALUES
  {vals}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
proj AS (
  SELECT vec_id, tbl,
         CAST(sum(CASE WHEN {proj} > 0 THEN 1 << plane ELSE 0 END) AS BIGINT) AS bkt
  FROM v CROSS JOIN w GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM proj a JOIN proj b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b, {_cos_sql('va.vec', 'vb.vec')} AS cosine
  FROM cand
  JOIN v va ON va.vec_id = cand.id_a
  JOIN v vb ON vb.vec_id = cand.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.45
"""

def _embed_neardup_clusters_sql() -> str:
    inner = _embed_neardup_blocked_sql().strip()
    head, _ = inner.split("\nSELECT id_a, id_b, cosine FROM scored", 1)
    return (
        "WITH RECURSIVE "
        + head[len("WITH "):]
        + """,
pairs AS (SELECT id_a, id_b FROM scored WHERE cosine >= 0.45),
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(src, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.label FROM sym s JOIN reach r ON r.src = s.dst
),
lab AS (SELECT src AS id, min(label) AS cluster FROM reach GROUP BY 1)
SELECT e.vec_id,
       coalesce(lab.cluster, e.vec_id) AS cluster,
       coalesce(lab.cluster, e.vec_id) = e.vec_id AS is_keeper
FROM embeddings e LEFT JOIN lab ON lab.id = e.vec_id
"""
    )

def _ann_lsh_sql() -> str:
    vals = _srp_values_sql(4, 1, _EMB_DIM)
    proj = _DOT_VW.format(dim=_EMB_DIM, a="vec", b="wv")
    return f"""
WITH w(tbl, plane, wv) AS (VALUES
  {vals}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
proj AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN {proj} > 0 THEN 1 << plane ELSE 0 END) AS BIGINT) AS bkt
  FROM v CROSS JOIN w GROUP BY 1
),
c AS (SELECT v.vec_id, vec, bkt FROM v JOIN proj USING (vec_id)),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id, {_cos_sql('q.vec', 'c.vec')} AS cosine
  FROM c JOIN c q ON c.bkt = q.bkt
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= 5
"""

def _ann_ivf_sql() -> str:
    aff_c = _cos_sql("v.vec", "c.ctr")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id, vec AS ctr
  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)
),
cells AS (
  SELECT vec_id, centroid_id, vec FROM (
    SELECT v.vec_id, c.centroid_id, v.vec,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {aff_c} DESC, c.centroid_id ASC) AS cr
    FROM v CROSS JOIN cents c
  ) WHERE cr <= 1
),
probes AS (
  SELECT query_id, centroid_id, qv FROM (
    SELECT v.vec_id AS query_id, c.centroid_id, v.vec AS qv,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {aff_c} DESC, c.centroid_id ASC) AS cr
    FROM v CROSS JOIN cents c WHERE v.vec_id < 5
  ) WHERE cr <= 4
),
sims AS (
  SELECT query_id, cells.vec_id, {_cos_sql('qv', 'cells.vec')} AS cosine
  FROM cells JOIN probes USING (centroid_id)
  WHERE cells.vec_id <> query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= 5
"""

def _kmeans_cte_sql(iters: int) -> str:
    """Shared deterministic-Lloyd CTE prefix (v, cents0, iters x
    assign/means/cents) — the ONE copy of the quantizer-training SQL
    that must stay bit-identical to kmeans_centroids/ivf_assign
    (floor(x*1e6) integral means, round-6 affinity, centroid-id
    tie-break). Both the IVF-kmeans and the SemDeDup oracles splice
    their probe/pair CTEs onto this."""
    aff = _cos_sql("v.vec", "c.ctr")
    sql = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id, vec AS ctr
  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)
)"""
    for r in range(iters):
        sql += f""",
assign{r} AS (
  SELECT vec_id, centroid_id, vec FROM (
    SELECT v.vec_id, c.centroid_id, v.vec,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {aff} DESC, c.centroid_id ASC) AS cr
    FROM v CROSS JOIN cents{r} c
  ) WHERE cr = 1
),
means{r} AS (
  SELECT centroid_id, pos,
         CAST(sum(floor(x * 1e6)) AS BIGINT) / 1e6 / count(*) AS m
  FROM (SELECT centroid_id, unnest(range(0, len(vec))) AS pos, unnest(vec) AS x
        FROM assign{r})
  GROUP BY 1, 2
),
cents{r + 1} AS (
  SELECT centroid_id, list(m ORDER BY pos) AS ctr FROM means{r} GROUP BY 1
)"""
    return sql

def _ann_ivf_kmeans_sql(iters: int = 2) -> str:
    aff = _cos_sql("v.vec", "c.ctr")
    sql = _kmeans_cte_sql(iters)
    sql += f""",
cells AS (
  SELECT vec_id, centroid_id, vec FROM (
    SELECT v.vec_id, c.centroid_id, v.vec,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {aff} DESC, c.centroid_id ASC) AS cr
    FROM v CROSS JOIN cents{iters} c
  ) WHERE cr <= 1
),
probes AS (
  SELECT query_id, centroid_id, qv FROM (
    SELECT v.vec_id AS query_id, c.centroid_id, v.vec AS qv,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {aff} DESC, c.centroid_id ASC) AS cr
    FROM v CROSS JOIN cents{iters} c WHERE v.vec_id < 5
  ) WHERE cr <= 4
),
sims AS (
  SELECT query_id, cells.vec_id, {_cos_sql('qv', 'cells.vec')} AS cosine
  FROM cells JOIN probes USING (centroid_id)
  WHERE cells.vec_id <> query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= 5
"""
    return sql

def _ann_recall_report_sql() -> str:
    return f"""
WITH truth AS (SELECT query_id, vec_id FROM ({_COSINE_TOPK_SQL})),
lsh AS (SELECT query_id, vec_id FROM ({_ann_lsh_sql()})),
ivf AS (SELECT query_id, vec_id FROM ({_ann_ivf_sql()})),
nt AS (SELECT count(*) AS n_truth FROM truth),
h AS (
  SELECT 'lsh' AS method, count(*) AS n_hits
  FROM lsh JOIN truth USING (query_id, vec_id)
  UNION ALL
  SELECT 'ivf' AS method, count(*) AS n_hits
  FROM ivf JOIN truth USING (query_id, vec_id)
)
SELECT method, n_hits, n_truth, n_hits * 1000000 // n_truth AS recall_micro
FROM h, nt
"""

def _ann_ivf_arrow_recall_sql() -> str:
    aff_c = _cos_sql("v.vec", "c.ctr")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id, vec AS ctr
  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)
),
cells AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {aff_c} DESC, c.centroid_id ASC) AS cr
    FROM v CROSS JOIN cents c
  ) WHERE cr <= 1
)
SELECT centroid_id, count(*) AS n_vecs, count(*) AS n_agree,
       count(*) * 1000000 // count(*) AS agree_micro
FROM cells GROUP BY centroid_id
"""

_STREAM_INTERVAL_JOIN_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

_STREAM_INTERVAL_JOIN_LEFT_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
"""

_INTERPOLATE_SQL = f"""
WITH base AS ({_NULLS_SQL}),
nbrs AS (
  SELECT user_id, event_id, ts, value_n,
         last_value(value_n IGNORE NULLS) OVER w_p AS pv,
         last_value(CASE WHEN value_n IS NOT NULL THEN ts END IGNORE NULLS)
           OVER w_p AS pts,
         first_value(value_n IGNORE NULLS) OVER w_n AS nv,
         first_value(CASE WHEN value_n IS NOT NULL THEN ts END IGNORE NULLS)
           OVER w_n AS nts
  FROM base
  WINDOW w_p AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING),
         w_n AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id, ts, value_n,
       CASE WHEN value_n IS NOT NULL THEN value_n
            ELSE round(pv + (nv - pv) *
                 ((epoch_us(ts) - epoch_us(pts)) * 1.0 /
                  (epoch_us(nts) - epoch_us(pts))), 6)
       END AS value_n_li
FROM nbrs
"""

_STREAM_DDWM_SQL = """
SELECT event_id, user_id, event_type, ts FROM events
"""

_VARIANT_PROPS_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, count(*) AS n, count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
FROM x GROUP BY event_type
"""

_STREAM_WINDOWED_SQL = """
SELECT make_timestamp(CAST(floor(epoch(ts)/900)*900*1000000 AS BIGINT)) AS TIMESTAMP,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS avg_value
FROM events GROUP BY 1
"""

_STREAM_DEDUP_SQL = """
SELECT event_type, count(*) AS n_events
FROM (SELECT DISTINCT event_id, event_type FROM events)
GROUP BY 1
"""

_TEXT_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w,
         list_filter(string_split(text, chr(10)), x -> length(trim(x)) > 0) AS lines
  FROM documents),
base AS (
  SELECT doc_id,
         round(CASE WHEN len(lines) > 0
                    THEN (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines)
                    ELSE 0 END, 6) AS dup_line_frac,
         round(CASE WHEN len(w) > 0
                    THEN (len(w) - len(list_distinct(w))) * 1.0 / len(w)
                    ELSE 0 END, 6) AS dup_token_frac
  FROM toks),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                               i -> array_to_string(w[i:i+1], ' '))) AS g
  FROM toks),
counts AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
top AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_2gram_share
        FROM counts GROUP BY 1)
SELECT b.doc_id, dup_line_frac, dup_token_frac,
       coalesce(top_2gram_share, 0.0) AS top_2gram_share
FROM base b LEFT JOIN top USING (doc_id)
"""

def _repetition_family_sql() -> str:
    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    ns_values = ", ".join(f"({n})" for n in sorted(set(top_ns) | set(dup_ns)))
    top_cols = ",\n       ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN top_share END), 0.0)"
        f" AS top_{n}gram_share"
        for n in top_ns
    )
    dup_cols = ",\n       ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN dup_frac END), 0.0)"
        f" AS dup_{n}gram_frac"
        for n in dup_ns
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, ns.n,
         unnest(list_transform(range(1, greatest(len(w) - ns.n + 1, 0) + 1),
                               i -> array_to_string(w[i:i+ns.n-1], ' '))) AS g
  FROM toks CROSS JOIN (VALUES {ns_values}) ns(n)),
counts AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3),
per_n AS (
  SELECT doc_id, n,
         round(max(c) * 1.0 / sum(c), 6) AS top_share,
         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
           AS dup_frac
  FROM counts GROUP BY 1, 2),
wide AS (
  SELECT doc_id,
       {top_cols},
       {dup_cols}
  FROM per_n GROUP BY 1),
paras AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '\\n\\s*\\n'),
                                    x -> trim(x)),
                     x -> length(x) > 0) AS ps
  FROM documents)
SELECT d.doc_id,
       coalesce(top_2gram_share, 0.0) AS top_2gram_share,
       coalesce(top_3gram_share, 0.0) AS top_3gram_share,
       coalesce(top_4gram_share, 0.0) AS top_4gram_share,
       coalesce(dup_5gram_frac, 0.0) AS dup_5gram_frac,
       coalesce(dup_6gram_frac, 0.0) AS dup_6gram_frac,
       coalesce(dup_7gram_frac, 0.0) AS dup_7gram_frac,
       coalesce(dup_8gram_frac, 0.0) AS dup_8gram_frac,
       coalesce(dup_9gram_frac, 0.0) AS dup_9gram_frac,
       coalesce(dup_10gram_frac, 0.0) AS dup_10gram_frac,
       round(CASE WHEN len(ps) > 0
                  THEN (len(ps) - len(list_distinct(ps))) * 1.0 / len(ps)
                  ELSE 0 END, 6) AS dup_para_frac
FROM documents d LEFT JOIN wide USING (doc_id) JOIN paras USING (doc_id)
"""

_VOCAB_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
  FROM documents WHERE doc_id IS NOT NULL),
pd AS (SELECT doc_id, term, count(*) AS c FROM t WHERE term <> '' GROUP BY 1, 2),
totals AS (
  SELECT term, CAST(sum(c) AS BIGINT) AS n_occurrences, count(*) AS n_docs
  FROM pd GROUP BY 1)
SELECT term, n_occurrences, n_docs,
       row_number() OVER (ORDER BY n_occurrences DESC, term ASC) AS rank
FROM totals
ORDER BY n_occurrences DESC, term ASC
LIMIT 100
"""

_C4_FILTER_SQL = r"""
WITH l AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> length(x) > 0
                          AND regexp_matches(x, '[.!?"]$')
                          AND len(regexp_split_to_array(x, '\s+')) >= 5
                          AND NOT contains(lower(x), 'javascript')) AS ks
  FROM documents)
SELECT doc_id,
       coalesce(len(ks) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
                AND NOT contains(text, '{'), false) AS kept,
       coalesce(len(ks), 0) AS n_lines_kept,
       -- DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
       coalesce(array_to_string(ks, chr(10)), '') AS clean_text
FROM l
"""

_SPAN_N_Q = 5  # test-scale span length (published signal uses 50 tokens)

def _span_corpus_sql() -> str:
    n = _SPAN_N_Q
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
spans AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS sp_h
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - {n - 1}, 0) + 1),
                                     i -> array_to_string(w[i:i+{n - 1}], ' '))) AS s
        FROM toks)),
pds AS (SELECT doc_id, sp_h, count(*) AS c FROM spans GROUP BY 1, 2),
freq AS (SELECT sp_h, count(*) AS n_docs FROM pds GROUP BY 1),
frac AS (
  SELECT doc_id,
         round(sum(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
           AS dup_span_frac
  FROM pds JOIN freq USING (sp_h) GROUP BY 1)
SELECT d.doc_id, coalesce(dup_span_frac, 0.0) AS dup_span_frac
FROM documents d LEFT JOIN frac USING (doc_id)
"""

# ExactSubstr span REMOVAL (r15 registry promotion of the r14 library
# op). 13-token spans at test scale: long enough that only the synth's
# seeded duplication matches, short enough that sf0.01 docs carry them.
_SPAN_REMOVAL_N = 13
_SPAN_REMOVAL_MIN_DOCS = 2


def _span_removal_sql() -> str:
    """DuckDB replay of llm/dedup.remove_duplicate_spans, BOTH
    keep_first modes unioned under a `dedup_mode` discriminator.
    Cross-engine-validated single-mode at r14
    (tests/test_round14.py::test_remove_duplicate_spans_matches_duckdb_replay);
    this builder shares the token/span/dup CTEs across the two
    reconstructions. Span identity keys on the span STRING here vs the
    60-bit md5 in Spark — equivalent absent md5 collisions, the same
    contract every shingle oracle relies on."""
    n, md = _SPAN_REMOVAL_N, _SPAN_REMOVAL_MIN_DOCS
    return f"""
WITH nrm AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ss FROM documents),
tk AS (
  SELECT doc_id, i, ss[i] AS tok
  FROM nrm, unnest(range(1, len(ss) + 1)) t(i)
  WHERE ss[i] <> ''),
sp AS (
  SELECT doc_id, i AS p, array_to_string(list_slice(ss, i, i + {n} - 1), ' ') AS s
  FROM nrm, unnest(range(1, len(ss) - {n} + 2)) t(i)
  WHERE len(ss) >= {n} AND ss[1] <> ''),
dup AS (
  SELECT s, min(doc_id) AS first
  FROM sp GROUP BY s HAVING count(DISTINCT doc_id) >= {md}),
cov_all AS (
  SELECT DISTINCT sp.doc_id, u.cpos
  FROM sp JOIN dup USING (s), unnest(range(sp.p, sp.p + {n})) u(cpos)),
cov_kf AS (
  SELECT DISTINCT sp.doc_id, u.cpos
  FROM sp JOIN dup USING (s), unnest(range(sp.p, sp.p + {n})) u(cpos)
  WHERE sp.doc_id <> dup.first),
reb_all AS (
  SELECT tk.doc_id,
         coalesce(string_agg(CASE WHEN c.cpos IS NULL THEN tk.tok END,
                             ' ' ORDER BY tk.i), '') AS text_clean,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN c.cpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM tk LEFT JOIN cov_all c ON tk.doc_id = c.doc_id AND tk.i = c.cpos
  GROUP BY 1),
reb_kf AS (
  SELECT tk.doc_id,
         coalesce(string_agg(CASE WHEN c.cpos IS NULL THEN tk.tok END,
                             ' ' ORDER BY tk.i), '') AS text_clean,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN c.cpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM tk LEFT JOIN cov_kf c ON tk.doc_id = c.doc_id AND tk.i = c.cpos
  GROUP BY 1)
SELECT d.doc_id, 'all' AS dedup_mode, coalesce(text_clean, '') AS text_clean,
       coalesce(n_tokens, 0) AS n_tokens, coalesce(n_removed, 0) AS n_removed
FROM documents d LEFT JOIN reb_all USING (doc_id)
UNION ALL
SELECT d.doc_id, 'keep_first' AS dedup_mode, coalesce(text_clean, '') AS text_clean,
       coalesce(n_tokens, 0) AS n_tokens, coalesce(n_removed, 0) AS n_removed
FROM documents d LEFT JOIN reb_kf USING (doc_id)
"""


_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48

_CHUNK_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split({_NORM_SQL}, ' '), t -> t <> '') AS w
  FROM documents),
s AS (SELECT doc_id, w, len(w) AS n FROM w),
c AS (SELECT doc_id, w, n,
             unnest(range(1, greatest(n, 1) + 1, {_CHUNK_STRIDE})) AS start_tok
      FROM s)
SELECT doc_id,
       CAST((start_tok - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(start_tok AS INT) AS start_tok,
       CAST(least({_CHUNK_SIZE}, n - start_tok + 1) AS INT) AS n_tok,
       array_to_string(w[start_tok:start_tok + {_CHUNK_SIZE - 1}], ' ')
         AS chunk_text
FROM c WHERE start_tok <= n
"""

_CHARLM_SQL = f"""
WITH cs AS (
  SELECT doc_id, list_filter(string_split({_NORM_SQL}, ''), c -> c <> '') AS cs
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(cs)), i -> cs[i] || cs[i + 1])) AS bg
  FROM cs WHERE len(cs) >= 2),
pd AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
mb AS (SELECT bg, CAST(sum(c) AS BIGINT) AS cb FROM pd GROUP BY 1),
mu AS (SELECT substr(bg, 1, 1) AS c1, CAST(sum(cb) AS BIGINT) AS cu
       FROM mb GROUP BY 1),
-- corpus alphabet: distinct chars over ALL docs (1-char docs included)
v AS (SELECT count(DISTINCT ch) AS v
      FROM (SELECT unnest(cs) AS ch FROM cs)),
sc AS (
  SELECT doc_id,
         CAST(sum(CAST(floor(c * ln(CAST(cb + 1 AS DOUBLE)
                                    / CAST(cu + v AS DOUBLE)) * 1e6)
                       AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(c) AS BIGINT) AS n
  FROM pd
  JOIN mb USING (bg)
  JOIN mu ON substr(pd.bg, 1, 1) = mu.c1
  CROSS JOIN v
  GROUP BY 1)
SELECT d.doc_id,
       coalesce(n, 0) AS n_bigrams,
       coalesce(round(-s / (n * 1e6), 6), 0.0) AS avg_neglogprob
FROM documents d LEFT JOIN sc USING (doc_id)
"""

_OOV_VOCAB_K = 256

_OOV_SQL = f"""
WITH tt AS (
  -- doc_id IS NOT NULL mirrors the engine's shared null-id contract
  -- (null-id docs contribute no tokens to vocab or counts); a no-op
  -- on testdata, but it keeps the oracle correct on any corpus
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
  FROM documents WHERE doc_id IS NOT NULL),
t AS (SELECT doc_id, term FROM tt WHERE term <> ''),
pd AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
totals AS (SELECT term, CAST(sum(c) AS BIGINT) AS n_occ FROM pd GROUP BY 1),
vocab AS (SELECT term FROM totals
          ORDER BY n_occ DESC, term ASC LIMIT {_OOV_VOCAB_K}),
agg AS (
  SELECT doc_id, count(*) AS n_tok,
         CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM t LEFT JOIN vocab v USING (term) GROUP BY 1)
SELECT d.doc_id,
       coalesce(n_tok, 0) AS n_tok,
       coalesce(n_oov, 0) AS n_oov,
       round(coalesce(n_oov / CAST(n_tok AS DOUBLE), 0.0), 6) AS oov_rate
FROM documents d LEFT JOIN agg USING (doc_id)
"""

_LEV_PREFIX, _LEV_PROBE, _LEV_MAX = 16, 120, 20

_LEV_SQL = f"""
WITH p AS (
  SELECT doc_id AS id,
         substr({_NORM_SQL}, 1, {_LEV_PREFIX}) AS bk,
         substr({_NORM_SQL}, 1, {_LEV_PROBE}) AS probe
  FROM documents)
SELECT a.id AS doc_a, b.id AS doc_b,
       CAST(levenshtein(a.probe, b.probe) AS INT) AS dist
FROM p a JOIN p b ON a.bk = b.bk AND a.id < b.id
WHERE levenshtein(a.probe, b.probe) <= {_LEV_MAX}
"""

_CUBE_SQL = """
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(source, 'ALL') AS source,
       CAST(GROUPING(lang) * 2 + GROUPING(source) AS INT) AS lvl,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
         AS avg_chars
FROM documents GROUP BY CUBE (lang, source)
"""

_ROLL_LOOKBACK_S, _ROLL_MIN_PRIOR = 3600, 3

_ROLLING_SQL = f"""
WITH r AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         count(value) OVER w AS prev_n,
         min(value) OVER w AS prev_min,
         max(value) OVER w AS prev_max
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {_ROLL_LOOKBACK_S * 1000000} PRECEDING
                         AND 1 PRECEDING))
SELECT event_id, user_id, ts_us, value, prev_n, prev_min, prev_max,
       coalesce(prev_n >= {_ROLL_MIN_PRIOR}
                AND (value > CAST(2.0 AS DOUBLE) * prev_max
                     OR value < CAST(0.5 AS DOUBLE) * prev_min),
                FALSE) AS spike
FROM r
"""

#: BM25 demo query: three common terms + one rare ('dup', ~26 corpus
#: occurrences) so idf actually differentiates.
_BM25_TERMS = ["spark", "join", "window", "dup"]

_BM25_K = 20

def _bm25_sql() -> str:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.retrieval import (
        BM25_B,
        BM25_K1,
    )

    m = len(_BM25_TERMS)
    tf_cols = ",\n              ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n              ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(m)
    )
    # expression order mirrors llm/retrieval.py exactly: left-assoc
    # ((idf * tf) * (k1+1)) / (tf + k1*((1-b) + b*dl/(total/n)))
    k1p1 = repr(BM25_K1 + 1.0)
    one_minus_b = repr(1.0 - BM25_B)

    def ts(i: int) -> str:
        return (
            f"(CASE WHEN tf_{i} > 0 THEN CAST(floor("
            f"ln(1.0 + (CAST(n_docs AS DOUBLE)"
            f" - CAST(df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
            f" * CAST(tf_{i} AS DOUBLE) * {k1p1}"
            f" / (CAST(tf_{i} AS DOUBLE) + {BM25_K1!r} * ({one_minus_b}"
            f" + {BM25_B!r} * CAST(dl AS DOUBLE)"
            f" / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
            f" * 1e6) AS BIGINT) ELSE 0 END)"
        )

    micro = " + ".join(ts(i) for i in range(m))
    hits = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(m)
    )
    return f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split({_NORM_SQL}, ' '), t -> t <> '') AS w
  FROM documents),
pd AS (SELECT doc_id, len(w) AS dl,
              {tf_cols}
       FROM w),
st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl,
              {df_cols}
       FROM pd),
sc AS (SELECT doc_id,
              CAST({hits} AS INT) AS n_hit_terms,
              CAST({micro} AS BIGINT) AS score_micro
       FROM pd CROSS JOIN st)
SELECT doc_id, n_hit_terms, score_micro,
       round(score_micro / 1e6, 6) AS score
FROM sc WHERE n_hit_terms > 0
ORDER BY score_micro DESC, doc_id ASC LIMIT {_BM25_K}
"""

_SLIDE_DUR_S, _SLIDE_STEP_S = 1800, 900

_SLIDING_SQL = f"""
WITH e AS (
  SELECT event_type, value, epoch_us(ts) AS us FROM events),
x AS (
  SELECT event_type, value, us,
         (us // {_SLIDE_STEP_S * 1000000}) * {_SLIDE_STEP_S * 1000000}
           - unnest([0, {_SLIDE_STEP_S * 1000000}]) AS ws
  FROM e)
SELECT ws AS win_start_us,
       ws + {_SLIDE_DUR_S * 1000000} AS win_end_us,
       event_type,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
         AS sum_value
FROM x
WHERE us >= ws AND us < ws + {_SLIDE_DUR_S * 1000000}
GROUP BY 1, 2, 3
"""

_QUANTILES_SQL = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rn = CAST(ceil(0.5 * CAST(n AS DOUBLE)) AS BIGINT)
                THEN value END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.9 * CAST(n AS DOUBLE)) AS BIGINT)
                THEN value END) AS p90,
       max(CASE WHEN rn = CAST(ceil(0.99 * CAST(n AS DOUBLE)) AS BIGINT)
                THEN value END) AS p99
FROM r GROUP BY 1
"""

_TOPK_PER_GROUP_K = 3

_TOPK_GROUP_SQL = f"""
SELECT event_type, event_id, value, rank FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rank
  FROM events)
WHERE rank <= {_TOPK_PER_GROUP_K}
"""

_ZORDER_BITS = 16

def _zorder_sql() -> str:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.operators import (
        zorder_key2_sql,
    )

    key = zorder_key2_sql(
        "user_id", "CAST(floor(value) AS BIGINT)", bits=_ZORDER_BITS
    )
    return f"""
SELECT event_id, user_id,
       CAST(floor(value) AS BIGINT) AS value_int,
       {key} AS zkey
FROM events
"""

#: Synthetic markup wrapped around each document so strip_markup is
#: exercised on real tag/entity/script structure (the corpus itself is
#: plain text). No single-quote chars — keeps the SQL literal clean.
_HTML_PRE = (
    '<html><head><title>t</title><style type="text/css">'
    "p { color: red; }</style></head><body><!-- header -->"
    '<p class="main">'
)

_HTML_SUF = (
    "</p><script>var x = 1 &lt; 2;</script><br/>&nbsp;&amp;&#39;fin&#39;"
    "</body></html>"
)

def _html_strip_sql() -> str:
    marked = f"'{_HTML_PRE}' || text || '{_HTML_SUF}'"
    s = f"regexp_replace({marked}, '<script[^>]*>.*?</script>', ' ', 'gis')"
    s = f"regexp_replace({s}, '<style[^>]*>.*?</style>', ' ', 'gis')"
    s = f"regexp_replace({s}, '<!--.*?-->', ' ', 'gs')"
    s = f"regexp_replace({s}, '<[^>]+>', ' ', 'g')"
    # same decode order as llm/curation._ENTITIES (&amp; last)
    s = f"replace({s}, '&lt;', '<')"
    s = f"replace({s}, '&gt;', '>')"
    s = f"replace({s}, '&quot;', chr(34))"
    s = f"replace({s}, '&#39;', chr(39))"
    s = f"replace({s}, '&nbsp;', ' ')"
    s = f"replace({s}, '&amp;', '&')"
    s = f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
    return f"""
SELECT doc_id, length({s}) AS n_chars_clean, {s} AS clean_text
FROM documents
"""

_JSON_PROPS_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k,
       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_50
FROM x GROUP BY 1
"""

_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""

_TEXT_ENTROPY_SQL = f"""
WITH chars AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, '')) AS ch FROM documents),
fc AS (SELECT doc_id, ch, count(*) AS c FROM chars WHERE ch <> '' GROUP BY 1, 2),
pd AS (SELECT doc_id,
              CAST(sum(CAST(floor(c * ln(c) * 1e6) AS BIGINT)) AS BIGINT) AS s,
              CAST(sum(c) AS BIGINT) AS n
       FROM fc GROUP BY 1)
SELECT d.doc_id,
       coalesce(round(ln(n) - s / (n * 1e6), 6), 0.0) AS char_entropy
FROM documents d LEFT JOIN pd USING (doc_id)
"""

def _decontaminate_sql() -> str:
    def sh_cte(pred: str, toks: str, sh: str, cols: str) -> str:
        return f"""
{toks} AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
           FROM documents WHERE {pred}),
{sh} AS (
  SELECT DISTINCT {cols}
  FROM (SELECT doc_id,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                                           i -> array_to_string(w[i:i+2], ' '))) AS shingle
              FROM {toks})))"""

    return f"""
WITH {sh_cte("doc_id % 20 <> 0", "ctoks", "csh", "doc_id AS id, sh_h")},
{sh_cte("doc_id % 20 = 0", "btoks", "bsh", "sh_h")},
sizes AS (SELECT id, count(*) AS n_sh FROM csh GROUP BY 1),
hits AS (SELECT id, count(*) AS n_hit FROM csh JOIN bsh USING (sh_h) GROUP BY 1)
SELECT s.id AS doc_id, n_sh, coalesce(n_hit, 0) AS n_hit,
       round(coalesce(n_hit, 0) * 1.0 / n_sh, 6) AS contaminated_frac,
       round(coalesce(n_hit, 0) * 1.0 / n_sh, 6) >= 0.5 AS contaminated
FROM sizes s LEFT JOIN hits USING (id)
"""

#: per-language keep fractions for the stratified-sample query:
#: downsample the head language, keep the tail intact.
_STRATA_FRACS = {"en": 0.35, "zh": 1.0}

_STRATA_DEFAULT = 0.75

_PACK_SEED = "r2"

_PACK_SHARDS = 4

_PACK_BUDGET = 256

def _sample_shard_pack_sql() -> str:
    h = hash_u32_sql("doc_id", _PACK_SEED)
    cases = " ".join(
        f"WHEN lang = '{v}' THEN {int(f * HASH_SPACE)}"
        for v, f in _STRATA_FRACS.items()
    )
    thr = f"CASE {cases} ELSE {int(_STRATA_DEFAULT * HASH_SPACE)} END"
    return f"""
WITH h AS (
  SELECT doc_id, lang, {_NTOK_SQL} AS n_tok, {h} AS shuffle_key
  FROM documents),
samp AS (SELECT * FROM h WHERE shuffle_key < {thr}),
sh AS (SELECT *, CAST(shuffle_key % {_PACK_SHARDS} AS INT) AS shard FROM samp)
SELECT doc_id, lang, n_tok, shuffle_key, shard,
       CAST(sum(n_tok) OVER w - n_tok AS BIGINT) AS offset,
       CAST(floor((sum(n_tok) OVER w - n_tok) * 1.0 / {_PACK_BUDGET}) AS BIGINT) AS chunk_id
FROM sh
WINDOW w AS (PARTITION BY shard ORDER BY shuffle_key, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

_URL_RE = r"https?://[^\s]+"

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_REDACT_SQL = f"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com via https://site' || CAST(doc_id % 10 AS VARCHAR)
              || '.org/p' || CAST(doc_id AS VARCHAR)
              || CASE WHEN doc_id % 3 = 0 THEN ' or 555-123-4567' ELSE '' END AS t
  FROM documents),
s1 AS (SELECT doc_id, len(regexp_extract_all(t, '{_URL_RE}')) AS n_url,
              regexp_replace(t, '{_URL_RE}', '<URL>', 'g') AS t
       FROM pii),
s2 AS (SELECT doc_id, n_url,
              len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_email,
              regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t
       FROM s1),
s3 AS (SELECT doc_id, n_url, n_email,
              len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phone,
              regexp_replace(t, '{_PHONE_RE}', '<PHONE>', 'g') AS t
       FROM s2)
SELECT doc_id, t AS redacted, n_url, n_email, n_phone FROM s3
"""

_SALTED_JOIN_SQL = """
SELECT c_mktsegment, event_type, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""

def _dedup_clusters_sql() -> str:
    # same CTE chain as _minhash_sql up to the candidate pairs, then
    # reachability closure: reach(src, label) holds every label
    # reachable from src, so min(label) is the component minimum
    mins = ", ".join(
        f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_P}) AS mh_{i}"
        for i in range(LSH_BANDS * LSH_ROWS)
    )
    bands = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(mh_{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        + f") AS bucket_{b}"
        for b in range(LSH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, bucket_{b} AS bucket FROM banded"
        for b in range(LSH_BANDS)
    )
    return f"""
WITH RECURSIVE {_shingle_cte(_SHINGLE_N_Q)},
hashed AS (SELECT id, sh_h % {MINHASH_P} AS x FROM sh),
sig AS (SELECT id, {mins} FROM hashed GROUP BY id),
banded AS (SELECT id, {bands} FROM sig),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.id < b.id
),
sym AS (SELECT id_a AS src, id_b AS dst FROM cand
        UNION SELECT id_b, id_a FROM cand),
reach(src, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.label FROM sym s JOIN reach r ON r.src = s.dst
),
lab AS (SELECT src AS id, min(label) AS cluster FROM reach GROUP BY 1)
SELECT d.doc_id,
       coalesce(lab.cluster, d.doc_id) AS cluster,
       coalesce(lab.cluster, d.doc_id) = d.doc_id AS is_keeper
FROM documents d LEFT JOIN lab ON lab.id = d.doc_id
"""

def _incremental_dedup_sql() -> str:
    def sig_chain(pfx: str, sh: str) -> str:
        mins = ", ".join(
            f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_P}) AS mh_{i}"
            for i in range(LSH_BANDS * LSH_ROWS)
        )
        bands = ", ".join(
            "md5("
            + " || ',' || ".join(
                f"CAST(mh_{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
            )
            + f") AS bucket_{b}"
            for b in range(LSH_BANDS)
        )
        band_rows = " UNION ALL ".join(
            f"SELECT id, {b} AS band, bucket_{b} AS bucket FROM {pfx}banded"
            for b in range(LSH_BANDS)
        )
        return f"""
{pfx}hashed AS (SELECT id, sh_h % {MINHASH_P} AS x FROM {sh}),
{pfx}sig AS (SELECT id, {mins} FROM {pfx}hashed GROUP BY id),
{pfx}banded AS (SELECT id, {bands} FROM {pfx}sig),
{pfx}buckets AS ({band_rows})"""

    def sh2(src: str, toks: str, sh: str) -> str:
        k = _SHINGLE_N_Q - 1
        return f"""
{toks} AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM {src}),
{sh} AS (
  SELECT DISTINCT doc_id AS id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - {k}, 0) + 1),
                                     i -> array_to_string(w[i:i+{k}], ' '))) AS shingle
        FROM {toks}))"""

    return f"""
WITH newd AS (SELECT * FROM documents WHERE CAST(substr(source, 4) AS INT) >= 15),
based AS (SELECT * FROM documents WHERE CAST(substr(source, 4) AS INT) < 15),
bfp AS (SELECT DISTINCT md5({_NORM_SQL}) AS fp FROM based),
ne AS (SELECT * FROM newd WHERE md5({_NORM_SQL}) NOT IN (SELECT fp FROM bfp)),
{sh2("ne", "ntoks", "nsh").strip()},
{sh2("based", "btoks", "bsh").strip()},
{sig_chain("n", "nsh").strip()},
{sig_chain("b", "bsh").strip()},
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM nbuckets a JOIN bbuckets b USING (band, bucket)
),
sizes AS (SELECT id, count(*) AS n_sh
          FROM (SELECT * FROM nsh UNION ALL SELECT * FROM bsh) GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN nsh a ON a.id = c.id_a
  JOIN bsh b ON b.id = c.id_b AND b.sh_h = a.sh_h
  GROUP BY 1, 2
),
ver AS (
  SELECT id_a FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1
)
SELECT doc_id, source FROM ne WHERE doc_id NOT IN (SELECT id_a FROM ver)
"""

_ASOF_SQL = """
WITH r AS (
  SELECT user_id, min(ts) AS rts, min(value) AS cp
  FROM events GROUP BY user_id, date_trunc('day', ts)
)
SELECT e.event_type, count(*) AS n_events,
       round(CAST(sum(CAST(cp AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_cp,
       CAST(sum(CASE WHEN cp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM events e ASOF JOIN r ON e.user_id = r.user_id AND e.ts >= r.rts
GROUP BY 1
"""

_RANGE_JOIN_SQL = """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
win AS (SELECT d + INTERVAL 6 HOUR AS w_start, d + INTERVAL 8 HOUR AS w_end
        FROM days)
SELECT event_type, count(*) AS n_in_window,
       count(DISTINCT event_id) AS n_distinct
FROM events e JOIN win w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY 1
"""

_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}

_SPLIT_SEED = "sp1"

def _split_sql() -> str:
    h = hash_u32_sql("doc_id", _SPLIT_SEED)
    hi = 0
    cases = []
    for label, w in _SPLIT_WEIGHTS.items():
        lo, hi = hi, hi + int(w * HASH_SPACE)
        cases.append(f"WHEN {h} >= {lo} AND {h} < {hi} THEN '{label}'")
    return f"""
SELECT doc_id, lang,
       CASE {' '.join(cases)} ELSE NULL END AS split
FROM documents
"""

_SKETCH_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       round(quantile_cont(value, 0.5), 4) AS p50_exact,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) * 1.0
         / count(DISTINCT user_id) <= 0.15 AS distinct_ok,
       abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
         / abs(quantile_cont(value, 0.5)) <= 0.05 AS p50_ok
FROM events
GROUP BY 1
"""

_TDP_QUALITY_MIN = 0.6

_TDP_MAX_DUP = 0.65

_TDP_CONTAM_MAX = 0.5

_TDP_FRACS = {"en": 0.5}

_TDP_DEFAULT_FRAC = 1.0

_TDP_SEED = "tdp"

_TDP_SHARDS = 4

_TDP_BUDGET = 512

def _training_data_pipeline_sql() -> str:
    mins = ", ".join(
        f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_P}) AS mh_{i}"
        for i in range(LSH_BANDS * LSH_ROWS)
    )
    bands = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(mh_{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        + f") AS bucket_{b}"
        for b in range(LSH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, bucket_{b} AS bucket FROM banded"
        for b in range(LSH_BANDS)
    )

    def sh3(src: str, toks: str, sh: str, cols: str) -> str:
        return f"""
{toks} AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM {src}),
{sh} AS (
  SELECT DISTINCT {cols}
  FROM (SELECT doc_id,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                                           i -> array_to_string(w[i:i+2], ' '))) AS shingle
              FROM {toks})))"""

    h = hash_u32_sql("doc_id", _TDP_SEED)
    cases = " ".join(
        f"WHEN lang = '{v}' THEN {int(f * HASH_SPACE)}"
        for v, f in _TDP_FRACS.items()
    )
    thr = f"CASE {cases} ELSE {int(_TDP_DEFAULT_FRAC * HASH_SPACE)} END"
    return f"""
WITH RECURSIVE
corp AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
toks0 AS (SELECT doc_id, text, lang, string_split({_NORM_SQL}, ' ') AS w FROM corp),
enr AS (
  SELECT doc_id, text, lang,
         {_QUALITY_SQL} AS quality,
         round(CASE WHEN len(w) > 0
                    THEN (len(w) - len(list_distinct(w))) * 1.0 / len(w)
                    ELSE 0 END, 6) AS dup_tok,
         {_NTOK_SQL} AS n_tok, md5({_NORM_SQL}) AS fp
  FROM toks0),
kept0 AS (SELECT * FROM enr
          WHERE quality >= {_TDP_QUALITY_MIN} AND dup_tok <= {_TDP_MAX_DUP}),
keepers AS (SELECT fp, min(doc_id) AS doc_id FROM kept0 GROUP BY 1),
kept1 AS (SELECT kept0.* FROM kept0 JOIN keepers USING (fp, doc_id)),
{_shingle_cte(_SHINGLE_N_Q, "kept1").strip().rstrip()},
hashed AS (SELECT id, sh_h % {MINHASH_P} AS x FROM sh),
sig AS (SELECT id, {mins} FROM hashed GROUP BY id),
banded AS (SELECT id, {bands} FROM sig),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.id < b.id
),
sym AS (SELECT id_a AS src, id_b AS dst FROM cand
        UNION SELECT id_b, id_a FROM cand),
reach(src, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.label FROM sym s JOIN reach r ON r.src = s.dst
),
lab AS (SELECT src AS id, min(label) AS cluster FROM reach GROUP BY 1),
kept2 AS (SELECT kept1.* FROM kept1 LEFT JOIN lab ON lab.id = kept1.doc_id
          WHERE coalesce(lab.cluster, kept1.doc_id) = kept1.doc_id),
{sh3("kept2", "dtoks", "csh3", "doc_id AS id, sh_h").strip()},
{sh3("(SELECT * FROM documents WHERE doc_id % 20 = 0)", "btoks", "bsh3", "sh_h").strip()},
sizes3 AS (SELECT id, count(*) AS n_sh FROM csh3 GROUP BY 1),
hits3 AS (SELECT id, count(*) AS n_hit FROM csh3 JOIN bsh3 USING (sh_h) GROUP BY 1),
clean AS (SELECT s.id AS doc_id
          FROM sizes3 s LEFT JOIN hits3 USING (id)
          WHERE round(coalesce(n_hit, 0) * 1.0 / n_sh, 6) < {_TDP_CONTAM_MAX}),
kept3 AS (SELECT kept2.* FROM kept2 JOIN clean USING (doc_id)),
hk AS (SELECT doc_id, lang, n_tok, {h} AS shuffle_key FROM kept3),
samp AS (SELECT * FROM hk WHERE shuffle_key < {thr}),
shrd AS (SELECT *, CAST(shuffle_key % {_TDP_SHARDS} AS INT) AS shard FROM samp)
SELECT doc_id, lang, n_tok, shard,
       CAST(sum(n_tok) OVER w - n_tok AS BIGINT) AS offset,
       CAST(floor((sum(n_tok) OVER w - n_tok) * 1.0 / {_TDP_BUDGET}) AS BIGINT) AS chunk_id
FROM shrd
WINDOW w AS (PARTITION BY shard ORDER BY shuffle_key, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

_STREAM_CORPUS_DEDUP_SQL = f"""
WITH ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
  FROM documents)
SELECT lang, count(*) AS n_docs FROM ranked WHERE rn = 1 GROUP BY 1
"""

def _semdedup_sql(iters: int = 1, threshold: float = 0.4) -> str:
    aff = _cos_sql("v.vec", "c.ctr")
    sql = _kmeans_cte_sql(iters)
    sql += f""",
cells AS (
  SELECT vec_id, centroid_id, vec FROM (
    SELECT v.vec_id, c.centroid_id, v.vec,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {aff} DESC, c.centroid_id ASC) AS cr
    FROM v CROSS JOIN cents{iters} c
  ) WHERE cr = 1
),
pair_sim AS (
  SELECT a.vec_id AS vec_id, max({_cos_sql('a.vec', 'b.vec')}) AS max_sim_lower
  FROM cells a JOIN cells b USING (centroid_id)
  WHERE b.vec_id < a.vec_id
  GROUP BY 1
)
SELECT c.vec_id, c.centroid_id, p.max_sim_lower,
       coalesce(p.max_sim_lower, -1.0) < {threshold!r} AS keep
FROM cells c LEFT JOIN pair_sim p USING (vec_id)
"""
    return sql

_HARD_NEGATIVES_SQL = f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS ql, vec AS qv FROM v WHERE vec_id < 5),
sims AS (
  SELECT query_id, v.vec_id, v.label, {_cos_sql('qv', 'v.vec')} AS cosine
  FROM v CROSS JOIN q WHERE v.label <> q.ql)
SELECT query_id, vec_id, label, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= 5
"""

_SOFT_DEDUP_SQL = f"""
SELECT doc_id, fp, n_copies, round(1.0 / n_copies, 6) AS weight
FROM (SELECT doc_id, md5({_NORM_SQL}) AS fp,
             count(*) OVER (PARTITION BY md5({_NORM_SQL})) AS n_copies
      FROM documents)
"""

_TEMPERATURE_MIX_SQL = f"""
WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
base AS (
  SELECT lang, n_docs,
         CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS p,
         pow(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 0.5) AS pa
  FROM counts),
qs AS (
  SELECT lang, n_docs, p, pa / sum(pa) OVER () AS q FROM base),
rates AS (
  SELECT lang, n_docs,
         round(p, 6) AS p_share,
         round(q, 6) AS q_temp,
         round((q / p) / max(q / p) OVER (), 6) AS keep_rate
  FROM qs)
SELECT d.doc_id, d.lang, r.n_docs, r.p_share, r.q_temp, r.keep_rate,
       {hash_u32_sql('d.doc_id', 'mix')}
         < CAST(floor(r.keep_rate * 4294967296.0) AS BIGINT) AS keep
FROM documents d JOIN rates r USING (lang)
"""

_NOISY_SQL = (
    "chr(65279) || '  ' || text || "
    "CASE WHEN doc_id % 3 = 0 THEN chr(7) || chr(8203) || 'zz' "
    "WHEN doc_id % 3 = 1 THEN chr(9) || ' tail' || chr(31) "
    "ELSE ' ' END || "
    "CASE WHEN doc_id % 5 = 0 THEN chr(65533) ELSE '' END"
)

def _unicode_scrub_sql() -> str:
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.text import (
        _SCRUB_CLASS,
    )

    strip = f"regexp_replace(t, '{_SCRUB_CLASS}', '', 'g')"
    clean = f"trim(regexp_replace({strip}, '\\s+', ' ', 'g'))"
    return f"""
WITH noisy AS (SELECT doc_id, {_NOISY_SQL} AS t FROM documents),
s AS (
  SELECT doc_id, {clean} AS clean,
         contains(t, chr(65533)) AS has_replacement,
         length(t) - length({strip}) AS n_stripped
  FROM noisy)
SELECT doc_id, clean AS clean_text, length(clean) AS n_chars_clean,
       has_replacement, n_stripped
FROM s
"""

_TOKEN_COMPRESSION_SQL = r"""
SELECT doc_id, length(text) AS n_chars,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS n_subwords,
       round(CAST(length(text) AS DOUBLE)
             / nullif(len(regexp_extract_all(text, '\S+')), 0), 6)
         AS chars_per_token,
       round(CAST(length(text) AS DOUBLE)
             / nullif(len(regexp_extract_all(
                 text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 0), 6)
         AS chars_per_subword
FROM documents
"""

_TREND_SLOPE_SQL = """
WITH x AS (
  SELECT event_type, date_trunc('day', ts) AS bucket,
         CAST(epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS DOUBLE) / 1e6
           AS xs,
         CAST(value AS DOUBLE) AS y
  FROM events WHERE value IS NOT NULL)
SELECT event_type, bucket, count(*) AS n,
       round(regr_slope(y, xs), 6) AS slope,
       round(regr_intercept(y, xs), 6) AS intercept,
       round(regr_r2(y, xs), 6) AS r2
FROM x GROUP BY 1, 2
"""

_UNPIVOT_SQL = """
WITH long AS (
  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT measure, count(*) AS n,
       CAST(sum(CAST(floor(val * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       min(val) AS min_val, max(val) AS max_val
FROM long GROUP BY 1
"""

_CUSUM_SQL = """
WITH x AS (
  SELECT user_id, ts, value, event_id,
         CAST(floor(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS xm
  FROM events WHERE value IS NOT NULL),
w AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         CAST(sum(xm) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_micro,
         sum(xm) OVER (PARTITION BY user_id) AS total,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM x)
SELECT user_id, ts, value, i, cum_micro,
       abs(CAST(n AS HUGEINT) * cum_micro - CAST(i AS HUGEINT) * total)
         > CAST(250000000 AS HUGEINT) * n AS shift_flag
FROM w
"""

_SAMPLE_PER_GROUP_SQL = f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {hash_u32_sql('doc_id', 's0')} ASC,
                                     doc_id ASC) AS rk
  FROM documents) WHERE rk <= 30
"""

_WINSORIZE_SQL = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL),
cuts AS (
  SELECT event_type, event_id, value,
         max(CASE WHEN rk <= greatest(CAST(ceil(n * 0.05) AS BIGINT), 1)
                  THEN value END)
           OVER (PARTITION BY event_type) AS lo_cut,
         max(CASE WHEN rk <= greatest(CAST(ceil(n * 0.95) AS BIGINT), 1)
                  THEN value END)
           OVER (PARTITION BY event_type) AS hi_cut
  FROM ranked)
SELECT event_type, event_id, value, lo_cut, hi_cut,
       least(greatest(value, lo_cut), hi_cut) AS winsorized
FROM cuts
"""

_CLIMATOLOGY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         sum(CAST(value AS DECIMAL(38,6))) AS s, count(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
wv AS (
  SELECT event_type, hour_ts, n,
         round(CAST(s AS DOUBLE) / n, 6) AS mean_val,
         round(CAST(sum(s) OVER (PARTITION BY event_type, hour(hour_ts))
                    AS DOUBLE)
               / sum(n) OVER (PARTITION BY event_type, hour(hour_ts)), 6)
           AS clim
  FROM hourly)
SELECT event_type, hour_ts, n, mean_val, clim,
       round(mean_val - clim, 6) AS anomaly
FROM wv
"""

_FORWARD_FILL_SQL = f"""
WITH base AS ({_NULLS_SQL})
SELECT user_id, event_id, ts, value_n,
       last_value(value_n IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS value_n_ff
FROM base
"""

def _runid_cte_sql(attr: str) -> str:
    """Shared change-mark + run-id CTE ('marked', 'runs') for the SCD2 /
    flatline / state-duration oracles — ONE copy of the run-assignment
    SQL (the k-means-oracle lesson, D-note: copies drift). Every window
    orders by (ts, event_id): ts alone is ambiguous on tied timestamps
    and the run-id running sum would nondeterministically split runs."""
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id, {attr},
         CASE WHEN row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) = 1
                   OR {attr} IS DISTINCT FROM
                      lag({attr}) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS start
  FROM events),
runs AS (
  SELECT user_id, ts, {attr},
         CAST(sum(start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM marked)"""

_SCD2_SQL = _runid_cte_sql("event_type") + """,
grouped AS (
  SELECT user_id, run_id, event_type,
         min(ts) AS valid_from, count(*) AS n_rows
  FROM runs GROUP BY 1, 2, 3)
SELECT user_id, run_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, run_id) AS valid_to,
       n_rows
FROM grouped
"""

_FLATLINE_RUNS_SQL = _runid_cte_sql("value") + """,
lens AS (
  SELECT user_id, date_trunc('day', ts) AS day, run_id, count(*) AS run_len
  FROM runs GROUP BY 1, 2, 3)
SELECT user_id, day, CAST(max(run_len) AS BIGINT) AS max_run,
       CAST(count(*) AS BIGINT) AS n_runs
FROM lens GROUP BY 1, 2
"""

_STATE_DURATIONS_SQL = _runid_cte_sql("event_type") + """,
grouped AS (
  SELECT user_id, run_id, event_type, min(ts) AS valid_from
  FROM runs GROUP BY 1, 2, 3),
iv AS (
  SELECT user_id, event_type, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, run_id) AS valid_to,
         max(valid_from) OVER (PARTITION BY user_id) AS last_from
  FROM grouped)
SELECT user_id, event_type,
       CAST(sum(epoch_us(coalesce(valid_to, last_from))
                - epoch_us(valid_from)) AS BIGINT) AS total_us,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM iv GROUP BY 1, 2
"""

_PERCENTILE_NORM_SQL = """
WITH p AS (
  SELECT doc_id, source, n_chars,
         percent_rank() OVER (PARTITION BY source ORDER BY n_chars ASC)
           AS pct
  FROM documents)
SELECT doc_id, source, n_chars, round(pct, 6) AS pct_rank,
       CAST(least(10, CAST(floor(pct * 10) AS BIGINT) + 1) AS INT) AS decile
FROM p
"""

# BPE training replay (r14, VERDICT r13 #2 — the one capability that
# shipped library-only in r13). The oracle UNROLLS the greedy loop:
# merge k is a three-CTE block (pair explode -> global argmax -> merge
# application), chained _BPE_MERGES_Q times. Merge application uses a
# double-delimiter string encoding of the symbol sequence —
# "<D><D>sym<D><D>sym<D><D>" with D = chr(31). The encoding's actual
# invariant (guarded by the corpus assert in
# tests/test_round14.py::test_bpe_corpus_safe_for_delimiter_encoding,
# ADVICE r14 #1): no document may contain (a) chr(31) itself — it IS
# ASCII and would alias the delimiter, (b) a standalone '</w>' token —
# it would alias the end-of-word marker, or (c) chr(11) \x0B — Java's
# \s splits on vertical tab but DuckDB/RE2's \s does not, so the two
# engines would tokenize such a document differently before training
# even starts. replace() works here because it is leftmost
# non-overlapping, EXACTLY the BPE merge rule, once each boundary is
# two delimiters (the pattern "<D>l<D><D>r<D>" consumes one delimiter
# from each boundary, leaving the outer ones to re-form "<D><D>"; a
# single-delimiter encoding loses the shared boundary between abutting
# matches and under-merges runs like 'aaaa'). Tie-break mirrors
# llm/bpe._top_pair: freq DESC, left ASC, right ASC — binary string
# compare in both engines.
_BPE_MERGES_Q = 10


def _bpe_train_sql(n_merges: int = _BPE_MERGES_Q) -> str:
    d = "chr(31)"
    parts = [
        f"""
w0 AS (
  SELECT w, count(*)::BIGINT AS n
  FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents)
  WHERE len(w) > 0 GROUP BY 1),
r0 AS (
  SELECT {d} || {d} || array_to_string(string_split(w, ''), {d} || {d})
         || {d} || {d} || '</w>' || {d} || {d} AS s, n
  FROM w0)"""
    ]
    sel = []
    for k in range(n_merges):
        parts.append(
            f"""
e{k} AS (
  SELECT n, unnest(range(1, len(ss))) AS i, ss
  FROM (SELECT list_slice(ss0, 2, len(ss0) - 1) AS ss, n
        FROM (SELECT string_split(s, {d} || {d}) AS ss0, n FROM r{k}))),
f{k} AS (
  SELECT ss[i] AS l, ss[i + 1] AS r, CAST(sum(n) AS BIGINT) AS freq
  FROM e{k} GROUP BY 1, 2),
m{k} AS (SELECT l, r, freq FROM f{k} ORDER BY freq DESC, l ASC, r ASC LIMIT 1),
r{k + 1} AS (
  SELECT replace(s, {d} || l || {d} || {d} || r || {d},
                    {d} || l || r || {d}) AS s, n
  FROM r{k} CROSS JOIN m{k})"""
        )
        sel.append(
            f'SELECT {k} AS rank, l AS "left", r AS "right", freq FROM m{k}'
        )
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(sel)
