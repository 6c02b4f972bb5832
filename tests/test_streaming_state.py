"""Custom stateful streaming operator: keep-richest dedup
(applyInPandasWithState form of D1/T2 — SURVEY.md §2.10)."""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.streaming import (
    stream_dedup_keep_richest,
)

_SCHEMA = "TIMESTAMP timestamp, RECORD bigint, Tair double, RH double"


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_keep_richest_displaces_on_late_richer_row(spark, tmp_path):
    t1 = datetime.datetime(2022, 1, 1, 0, 0)
    t2 = datetime.datetime(2022, 1, 1, 0, 30)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # file 0: t1 has a sparse high-RECORD row; t2 a normal row
    _write_file(spark, os.path.join(src, "f0.parquet"),
                [(t1, 9051, 10.0, None), (t2, 2, 11.0, 60.0)])
    # file 1 (later micro-batch): duplicate t1 with lower RECORD and
    # full values — must displace the earlier state
    _write_file(spark, os.path.join(src, "f1.parquet"),
                [(t1, 1051, 12.0, 55.0)])

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = stream_dedup_keep_richest(
        stream,
        keys=("TIMESTAMP",),
        record_col="RECORD",
        value_cols=("Tair", "RH"),
    )

    batches: list[pd.DataFrame] = []
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_updates = pd.concat([b for b in batches if len(b)], ignore_index=True)
    # the FINAL update for t1 carries the richer late row
    final_t1 = all_updates[all_updates["TIMESTAMP"] == t1].iloc[-1]
    assert final_t1["RECORD"] == 1051
    assert final_t1["RH"] == 55.0
    # both generations of t1 were emitted across batches (update mode)
    assert set(all_updates[all_updates["TIMESTAMP"] == t1]["RECORD"]) == {9051, 1051}
    # t2 passes through untouched
    final_t2 = all_updates[all_updates["TIMESTAMP"] == t2].iloc[-1]
    assert final_t2["RECORD"] == 2


def test_stream_keep_richest_fewest_nulls_tiebreak(spark, tmp_path):
    t1 = datetime.datetime(2022, 3, 1, 12, 0)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # same RECORD, differing completeness: fewest nulls must win
    _write_file(spark, os.path.join(src, "f0.parquet"),
                [(t1, 7, None, None), (t1, 7, 9.5, None)])

    stream = spark.readStream.schema(_SCHEMA).parquet(src + "/*")
    out = stream_dedup_keep_richest(
        stream, keys=("TIMESTAMP",), record_col="RECORD",
        value_cols=("Tair", "RH"),
    )
    batches: list[pd.DataFrame] = []
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = pd.concat(batches, ignore_index=True).iloc[-1]
    assert final["Tair"] == 9.5


def test_stream_ingest_checkpoint_idempotent(spark, tmp_path):
    """T5 streaming form: re-running the availableNow ingest over the
    same source + checkpoint ingests nothing new (exactly-once file
    tracking)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.streaming import (
        stream_ingest_dedup,
    )

    t1 = datetime.datetime(2022, 5, 1, 0, 0)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, os.path.join(src, "f0.parquet"),
                [(t1, 1, 10.0, 50.0), (t1, 1, 10.0, 50.0)])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    from pyspark.sql import types as T

    schema = T.StructType.fromDDL(_SCHEMA)
    stream_ingest_dedup(
        spark, src + "/*", schema, out, ckpt, key_cols=("TIMESTAMP", "RECORD")
    )
    n1 = spark.read.parquet(out).count()
    assert n1 == 1  # in-stream duplicate dropped
    # second run: nothing new
    stream_ingest_dedup(
        spark, src + "/*", schema, out, ckpt, key_cols=("TIMESTAMP", "RECORD")
    )
    assert spark.read.parquet(out).count() == n1
    # new file arrives -> exactly its new key is appended
    t2 = t1 + datetime.timedelta(minutes=30)
    _write_file(spark, os.path.join(src, "f1.parquet"), [(t2, 2, 11.0, 51.0)])
    stream_ingest_dedup(
        spark, src + "/*", schema, out, ckpt, key_cols=("TIMESTAMP", "RECORD")
    )
    assert spark.read.parquet(out).count() == n1 + 1


def test_stream_keep_richest_drops_beyond_watermark_event(spark, tmp_path):
    """T2 late-data bound: once the watermark has advanced past a key's
    event time, (a) its state is evicted (event-time timeout) and (b) a
    later-arriving duplicate beyond the watermark is DROPPED — it must
    never displace the already-emitted row, exactly like the reference's
    fixed 1-day reprocess overlap ignores older data."""
    t1 = datetime.datetime(2022, 1, 1, 0, 0)
    # a fresh event 2.5 days later: after batch 1 the 1-day watermark
    # sits at t_adv - 1 day = 2022-01-02 12:00, well past t1
    t_adv = datetime.datetime(2022, 1, 3, 12, 0)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, os.path.join(src, "f0.parquet"),
                [(t1, 9051, 10.0, None), (t_adv, 3, 12.0, 61.0)])
    # batch 2: a "richer" duplicate of t1 arriving beyond the watermark
    _write_file(spark, os.path.join(src, "f1.parquet"),
                [(t1, 1051, 12.0, 55.0)])
    # the file source orders micro-batches by modification time: force
    # f1 strictly after f0 so "arrives later" is deterministic
    import time as _time

    future = _time.time() + 10
    for root, _, files in os.walk(os.path.join(src, "f1.parquet")):
        for fn in files:
            os.utime(os.path.join(root, fn), (future, future))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = stream_dedup_keep_richest(
        stream,
        keys=("TIMESTAMP",),
        record_col="RECORD",
        value_cols=("Tair", "RH"),
    )
    batches: list[pd.DataFrame] = []
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_updates = pd.concat(
        [b for b in batches if len(b)], ignore_index=True
    )
    t1_updates = all_updates[all_updates["TIMESTAMP"] == t1]
    # the beyond-watermark duplicate never surfaces: t1's only emission
    # is the original batch-1 row, RH stays null
    assert set(t1_updates["RECORD"]) == {9051}
    assert t1_updates["RH"].isna().all()
    # contrast row passes through
    assert 3 in set(all_updates["RECORD"])


# ------------------------------------------------- stream-stream joins


def test_stream_interval_join_matches_across_batches(spark, tmp_path):
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.streaming import (
        stream_interval_join,
    )

    schema = "event_id bigint, user_id bigint, ts timestamp, event_type string"
    base = datetime.datetime(2024, 3, 1, 12, 0)

    def m(minutes):
        return base + datetime.timedelta(minutes=minutes)

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc), os.makedirs(rsrc)
    # the purchases (left) arrive in micro-batch 1 alongside a decoy
    # right file; the MATCHING click arrives only in micro-batch 2
    # (maxFilesPerTrigger=1 on the right source + mtime ordering), so a
    # match can only come from LEFT rows buffered in join state across
    # batches — a regression that drops left state fails this test
    spark.createDataFrame(
        [
            (11, 1, m(-60), "click"),   # 85 min before → outside lookback
            (12, 2, m(20), "click"),    # other user
        ],
        schema,
    ).coalesce(1).write.parquet(os.path.join(rsrc, "f0.parquet"))
    spark.createDataFrame(
        [(10, 1, m(0), "click")], schema  # 25 min before purchase → match
    ).coalesce(1).write.parquet(os.path.join(rsrc, "f1.parquet"))
    spark.createDataFrame(
        [(20, 1, m(25), "purchase"), (21, 3, m(25), "purchase")], schema
    ).coalesce(1).write.parquet(os.path.join(lsrc, "f0.parquet"))
    # force the decoy older than the matching file so batch order is
    # deterministic (the source orders LEAF files by modification time —
    # touch the part files inside the .parquet directories, not the dirs)
    now = 1_700_000_000
    for d, t in (("f0.parquet", now - 100), ("f1.parquet", now)):
        for root, _, files in os.walk(os.path.join(rsrc, d)):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    left = spark.readStream.schema(schema).parquet(lsrc + "/*")
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc + "/*")
    )
    out = stream_interval_join(
        left, right, key="user_id", lookback="30 minutes"
    ).select("l_event_id", "r_event_id", "l_user_id")

    rows = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert [(r["l_event_id"], r["r_event_id"], r["l_user_id"]) for r in rows] == [
        (20, 10, 1)
    ]


def test_stream_interval_join_left_outer_nulls_are_watermark_gated(
    spark, tmp_path
):
    """Left-outer null emission only happens once the query watermark
    (min across both sides) passes ``left_ts + lookback``: batch 1 over
    the real rows emits ONLY the inner match; the null row for the
    unmatched purchase appears after a later batch whose far-future
    rows advance both watermarks (the sentinel-flush pattern)."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.streaming import (
        stream_interval_join,
    )

    schema = "event_id bigint, user_id bigint, ts timestamp, event_type string"
    t0 = datetime.datetime(2024, 1, 1, 12, 0)
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc)
    os.makedirs(rsrc)

    def write(d, name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(d, name)
        )

    # user 1's purchase has a click 10 min before; user 2's has none
    write(rsrc, "f0.parquet",
          [(10, 1, t0 - datetime.timedelta(minutes=10), "click")])
    write(lsrc, "f0.parquet",
          [(20, 1, t0, "purchase"), (21, 2, t0, "purchase")])

    out = stream_interval_join(
        spark.readStream.schema(schema).parquet(lsrc + "/*"),
        spark.readStream.schema(schema).parquet(rsrc + "/*"),
        key="user_id",
        lookback="30 minutes",
        how="left_outer",
    ).select("l_event_id", "r_event_id", "l_user_id")

    batches: list[list] = []

    def run_once():
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: batches.append(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    emitted = [
        (r["l_event_id"], r["r_event_id"]) for b in batches for r in b
    ]
    # watermark has not passed t0 + lookback: inner match only, the
    # unmatched purchase 21 is still held back
    assert emitted == [(20, 10)]

    far = t0 + datetime.timedelta(hours=10)
    write(lsrc, "f1.parquet", [(-1, -1, far, "purchase")])
    write(rsrc, "f1.parquet", [(-2, -1, far, "click")])
    run_once()
    emitted = sorted(
        (r["l_event_id"], r["r_event_id"])
        for b in batches
        for r in b
        if r["l_user_id"] > 0
    )
    assert emitted == [(20, 10), (21, None)]
