"""Structured Streaming variant of the incremental-ingest contract
(SURVEY.md §2.10).

The reference's manual protocol — high-watermark from the last output,
1-day overlap re-download, dedup of the overlap (T1/T2,
src/AzureDataLakeAccess.py:315-322, :50-54) — maps onto Spark primitives:

- file-source checkpointing replaces the watermark bookkeeping (T1)
- ``withWatermark(ts, '1 day')`` bounds late data exactly like the
  1-day overlap window (T2)
- ``dropDuplicates`` on the key replaces the overlap dedup, and
  ``stream_dedup_keep_richest`` upgrades it to the reference's
  keep-*richest* preference (D1: lowest RECORD, then fewest nulls)
  as a custom stateful operator on ``applyInPandasWithState`` —
  per-key state holds the current best row, late duplicates within
  the watermark displace it, and event-time timeout evicts state
  once the watermark passes (bounded memory at 100 TB).

``availableNow`` trigger = incremental batch run: process everything new
since the checkpoint, then stop — the closest streaming analogue of the
reference's cron-style driver loop.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_ingest_dedup(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "TIMESTAMP",
    key_cols: tuple[str, ...] = ("TIMESTAMP",),
    watermark: str = "1 day",
    fmt: str = "parquet",
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Incrementally ingest files from ``src_dir``: watermark late data,
    drop duplicate keys within the watermark, append to parquet. Runs one
    availableNow batch and blocks until complete (idempotent via
    checkpoint: re-running ingests only new files). ``transform`` runs
    before the watermark (e.g. raw-nanos → timestamp conversion)."""
    stream = spark.readStream.schema(schema).format(fmt).load(src_dir)
    if transform is not None:
        stream = transform(stream)
    stream = stream.withWatermark(ts_col, watermark).dropDuplicates(
        list(key_cols)
    )
    (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_dedup_keep_richest(
    stream: DataFrame,
    keys: tuple[str, ...],
    record_col: str | None,
    value_cols: tuple[str, ...],
    ts_col: str = "TIMESTAMP",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming form of D1 keep-richest dedup
    (src/AzureDataLakeAccess.py:50-54): for each key, keep the row with
    the lowest ``record_col`` (nulls last), then the fewest nulls across
    ``value_cols``, then smallest values of the remaining columns as a
    deterministic tiebreak.

    Built on ``applyInPandasWithState`` (update mode): state = the
    current best row per key; each micro-batch folds its rows into the
    state and emits the (possibly new) best. Event-time timeout removes
    state once the watermark passes the key's timestamp — the streaming
    analogue of the reference's bounded 1-day reprocess overlap (T2), and
    what keeps state memory proportional to the overlap window rather
    than the stream's history.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = stream.withWatermark(ts_col, watermark).schema
    cols = schema.fieldNames()
    ordered = list(keys) + [c for c in cols if c not in keys]
    out_schema = T.StructType([schema[c] for c in ordered])
    tiebreak = [
        c for c in cols if c not in keys and c != record_col and c not in value_cols
    ]

    import numbers

    def key_of(v):
        # nulls last; numbers numerically (numpy scalars included);
        # everything else lexically — matches SQL ORDER BY so the batch
        # oracle reproduces the result
        if v is None or (not isinstance(v, str) and pd.isna(v)):
            return (2, 0.0, "")
        if isinstance(v, numbers.Number) and not isinstance(v, bool):
            return (0, float(v), "")
        return (1, 0.0, str(v))

    def rank(row: pd.Series):
        rec = row[record_col] if record_col else None
        nan_count = sum(int(pd.isna(row[c])) for c in value_cols)
        return (
            key_of(rec),
            nan_count,
            tuple(key_of(row[c]) for c in tiebreak),
        )

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows and not state.exists:
            return
        batch = (
            pd.concat(rows, ignore_index=True)[ordered]
            if rows
            else pd.DataFrame(columns=ordered)
        )
        # arbitrary stateful ops get NO automatic late-row filtering
        # (unlike aggregations/dropDuplicates — verified empirically):
        # enforce the T2 bound ourselves. An event strictly before the
        # current watermark is dropped — it can never displace an
        # already-emitted row, exactly like the reference's fixed 1-day
        # reprocess overlap ignores anything older.
        wm = state.getCurrentWatermarkMs()
        if len(batch) and wm > 0:
            ts_vals = pd.to_datetime(batch[ts_col])
            batch = batch[
                ts_vals.isna() | (ts_vals >= pd.Timestamp(wm, unit="ms"))
            ]
        if not len(batch):
            # nothing new survived the watermark: state (if any) is
            # unchanged — emit nothing rather than re-emitting the best
            return
        if state.exists:
            prev = pd.DataFrame([list(state.get)], columns=ordered)
            batch = pd.concat([prev, batch], ignore_index=True)
        best = min(batch.to_dict("records"), key=lambda r: rank(pd.Series(r)))
        state.update(tuple(best[c] for c in ordered))
        # evict once the watermark passes this key's event time (the
        # timeout must sit strictly beyond the current watermark)
        ts = best[ts_col]
        if ts is not None and not pd.isna(ts):
            ts_ms = int(pd.Timestamp(ts).value // 1_000_000)
            state.setTimeoutTimestamp(max(ts_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame([best], columns=ordered)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=out_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native exact streaming dedup via Spark 3.5+
    ``dropDuplicatesWithinWatermark`` — the built-in complement to the
    custom keep-richest state op (T2): first arrival of a key emits,
    later duplicates within the watermark window are dropped, and —
    unlike ``dropDuplicates`` on a streaming frame, whose per-key state
    grows with DISTINCT KEYS forever — a key's state is evicted once
    the watermark passes it, so state is bounded by the late window.
    The event-time column does not need to be part of the key."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
