"""Driver-contract smoke: entry() returns rows with a stable schema, and
a sample of queries() hash-matches its oracle_sql() via DuckDB at
sf0.001 (the full sweep lives in tools/check_correctness.py)."""

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_correctness import TABLES, frame_to_rows

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "flagship_tower_pipeline",
    "dedup_keep_richest",
    "wateryear_rollup",
    "dedup_exact",
    "embed_cosine_topk",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "TIMESTAMP" in df.columns


def test_queries_have_oracles_or_documented_absence():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is oracle-checked — the approximate ANN ops replay
    # their deterministic buckets/cells in DuckDB (round 2)
    assert set(qs) == set(oracles)


def test_reads_nanos_parquet_on_foreign_session(spark):
    """Regression (round-1 driver failure): the correctness harness injects
    its OWN SparkSession without session.py's nanosAsLong default, so
    events.parquet (TIMESTAMP(NANOS)) raised PARQUET_TYPE_ILLEGAL in 21/41
    queries. T() must set the conf itself on whatever session it is given."""
    foreign = spark.newSession()
    # emulate a session that never saw the workaround
    foreign.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = entrymod.T(foreign, SF, "events")
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[
        "ts"
    ] == "timestamp"
    assert df.limit(5).count() == 5


def test_ts_normalizer_covers_all_historical_physical_types(spark, tmp_path):
    """The driver's events.parquet has shipped `ts` as TIMESTAMP micros,
    TIMESTAMP(NANOS) (surfacing as bigint under nanosAsLong), and
    isAdjustedToUTC=false micros (surfacing as TIMESTAMP_NTZ — the r3
    regression). One shared rule (functions/time.py:ts_normalizer) must
    map all three to the same session-UTC TIMESTAMP values."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.functions import (
        normalize_ts,
        ts_normalizer,
    )

    wall = ["2024-03-01 12:00:00", "2024-07-04 23:59:59", "2020-01-01 00:00:00"]
    base = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wall)], "id int, w string"
    )
    variants = {
        "micros": base.select(
            "id", F.to_timestamp("w").alias("ts")
        ),
        "nanos_as_long": base.select(
            "id",
            (F.unix_micros(F.to_timestamp("w")) * 1000).alias("ts"),
        ),
        "ntz": base.select(
            "id", F.to_timestamp("w").cast("timestamp_ntz").alias("ts")
        ),
    }
    collected = {}
    for label, df in variants.items():
        p = str(tmp_path / label)
        df.write.parquet(p)
        out = normalize_ts(spark.read.parquet(p))
        assert (
            dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)[
                "ts"
            ]
            == "timestamp"
        ), label
        collected[label] = {
            r["id"]: r["ts"] for r in out.select("id", "ts").collect()
        }
    assert collected["micros"] == collected["nanos_as_long"] == collected["ntz"]
    # already-TIMESTAMP: normalizer signals "skip the projection"
    ts_df = spark.read.parquet(str(tmp_path / "micros"))
    assert ts_normalizer(ts_df.schema) is None
    # absent column: no-op, not an error
    assert ts_normalizer(base.schema) is None


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).df()
    scols, srows = frame_to_rows(sdf)
    ocols, orows = frame_to_rows(odf)
    assert scols == ocols
    assert srows == orows


def test_utc_alias_sessions_do_not_warn():
    """ADVICE r5: equivalent-UTC zones ('Etc/UTC', 'GMT', ...) on a
    foreign session must not raise the false divergence warning; a
    genuinely non-UTC zone still must."""
    import warnings

    class _Conf:
        def __init__(self, tz):
            self._tz = tz

        def set(self, k, v):
            raise RuntimeError("immutable conf on this build")

        def get(self, k):
            return self._tz

    class _Spark:
        def __init__(self, tz):
            self.conf = _Conf(tz)

    for alias in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            entrymod._ensure_nanos_readable(_Spark(alias))
    with pytest.warns(RuntimeWarning, match="timeZone"):
        entrymod._ensure_nanos_readable(_Spark("America/Los_Angeles"))


def test_rotation_order_covers_full_registry():
    """The r16 rotation list must cover exactly the registry: a new
    query added without a rotation slot would silently land at the
    tail (never driver-checked first), and a stale name in the list
    would shrink the checked window."""
    q = entrymod.queries()
    assert set(q) == set(entrymod._R16_ORDER)
    assert list(q) == entrymod._R16_ORDER
    assert list(entrymod.oracle_sql()) == entrymod._R16_ORDER
    # VERDICT r15 #3: the new hybrid-BPE query leads (first driver row
    # in its first round), then the 18 entries whose newest driver row
    # is r13 — the SLA-ceiling cohort rotation_debt ranks first.
    assert entrymod._R16_ORDER[:19] == [
        "bpe_train_hybrid",
        "json_props_extract", "text_repetition_family",
        "dedup_clusters", "embed_neardup", "ann_ivf_topk",
        "stream_interval_join", "dedup_simhash128_pairs",
        "state_durations", "flatline_runs", "stream_interval_join_left",
        "ann_recall_report", "multimodal_png_pixels", "sessionize",
        "range_join_windows", "flagship_tower_pipeline",
        "flagship_partitioned", "toa5_roundtrip", "sink_roundtrip",
    ]
