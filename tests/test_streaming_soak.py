"""50-batch streaming soak (VERDICT r8 #7): the stateful keep-richest
operator run over a long file-source stream with out-of-order rows,
in-watermark duplicates, and beyond-watermark stragglers injected —
asserting state size stays WATERMARK-BOUNDED (eviction works) instead
of growing with stream history, and that late duplicates inside the
watermark still displace state while stragglers beyond it are dropped.

This was the one 100 TB surface previously proven only on 2-3
micro-batches; 50 batches is enough for the event-time-timeout eviction
to cycle state ~15 times. The per-batch state-row curve is asserted
here and summarized in SCALING.md (round-9 addendum).
"""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.streaming import (
    stream_dedup_keep_richest,
)

_SCHEMA = "TIMESTAMP timestamp, RECORD bigint, Tair double, RH double"

N_BATCHES = 50
KEYS_PER_BATCH = 12  # distinct event-time keys minted per batch
WATERMARK = "2 hours"  # batches advance 1 hour -> state spans ~3 batches


def _batch_rows(i: int):
    """Batch i (hour i): fresh keys, out-of-order within the batch,
    duplicates of batch i-1 keys (inside the 2h watermark — must
    displace), and a straggler from hour i-30 (far beyond — dropped)."""
    base = datetime.datetime(2024, 3, 1, 0, 0) + datetime.timedelta(hours=i)
    rows = []
    for m in range(KEYS_PER_BATCH):
        t = base + datetime.timedelta(minutes=m)
        # first sighting: sparse, high RECORD
        rows.append((t, 9000 + m, float(i), None))
    rows.reverse()  # out-of-order inside the batch
    if i >= 1:
        prev = base - datetime.timedelta(hours=1)
        for m in range(3):  # in-watermark duplicates: richer, lower RECORD
            t = prev + datetime.timedelta(minutes=m)
            rows.append((t, 100 + m, float(i - 1), 50.0))
    if i >= 30:
        old = base - datetime.timedelta(hours=30)
        rows.append((old, 1, -1.0, -1.0))  # beyond watermark: must drop
    return rows


@pytest.mark.soak
def test_stream_keep_richest_50_batch_soak_state_bounded(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(N_BATCHES):
        spark.createDataFrame(_batch_rows(i), _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"b{i:03d}.parquet"))

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
        watermark=WATERMARK,
    )
    batches: list[pd.DataFrame] = []
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    # ---- state-boundedness: the curve must plateau, not grow ----
    curve = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators") and p["numInputRows"]
    ]
    assert len(curve) >= 40  # one progress entry per micro-batch
    # watermark spans 2h of 1h-spaced batches: steady state holds ~3
    # batches of keys (+ the 3 duplicate keys). 5x per-batch keys is a
    # generous plateau; 50 batches minted 600 distinct keys, so an
    # eviction failure would blow straight past it.
    plateau = 5 * KEYS_PER_BATCH
    assert max(curve[10:]) <= plateau, curve
    # no monotone growth: the back half must not exceed the front half
    # by more than one batch of keys
    assert max(curve[25:]) <= max(curve[5:25]) + KEYS_PER_BATCH, curve

    all_updates = pd.concat([b for b in batches if len(b)], ignore_index=True)

    # ---- in-watermark duplicates displaced state (update re-emitted) ----
    probe = datetime.datetime(2024, 3, 1, 0, 0) + datetime.timedelta(hours=7)
    recs = list(all_updates[all_updates["TIMESTAMP"] == probe]["RECORD"])
    assert recs[0] == 9000 and recs[-1] == 100  # first sighting, then richer

    # ---- beyond-watermark stragglers dropped: no key ever shows the
    # straggler's RECORD=1 / negative values ----
    assert not (all_updates["RECORD"] == 1).any()
    assert not (all_updates["Tair"] < 0).any()

    # ---- every minted key emitted at least once ----
    assert all_updates["TIMESTAMP"].nunique() == N_BATCHES * KEYS_PER_BATCH

    # expose the curve for SCALING.md (printed under -s; summarized there)
    print("state_rows_curve:", curve)
