"""Structured Streaming variant of the incremental-ingest contract
(SURVEY.md §2.10).

The reference's manual protocol — high-watermark from the last output,
1-day overlap re-download, dedup of the overlap (T1/T2,
src/AzureDataLakeAccess.py:315-322, :50-54) — maps onto Spark primitives:

- file-source checkpointing replaces the watermark bookkeeping (T1)
- ``withWatermark(ts, '1 day')`` bounds late data exactly like the
  1-day overlap window (T2)
- ``dropDuplicates`` on the key replaces the overlap dedup. (The
  keep-*richest* preference needs per-key state; for parity-grade
  richest-row semantics run the batch ``dedup_keep_richest`` in
  ``foreachBatch`` MERGE — here we keep the streaming-native form.)

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
