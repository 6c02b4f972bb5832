"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction run as Arrow-batched
``mapInPandas`` stages (the only place Python touches data, amortized
per-batch). The actual codec work is STUBBED — the container has no
image/audio libs — behind ``decode_stub`` (raises) and a deterministic
feature extractor (byte length, md5, md5-derived fake embedding) so the
Spark-side plumbing (schema, batch shape, partitioning) is real and
testable end-to-end.

At 100 TB: payloads stay columnar in parquet (no driver collect), the
mapInPandas stage is map-only (no shuffle), and batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_embedding", T.ArrayType(T.DoubleType())),
    ]
)


def to_binary_payload(df: DataFrame, src_col: str, id_col: str = "doc_id") -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct —
    the ingest shape for multimodal data. Pure projection: downstream
    feature extraction is a map-only stage that inherits the scan's
    partitioning, so no shuffle is introduced here."""
    return df.select(
        F.col(id_col),
        F.col(src_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(src_col).cast("binary")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> object:
    """Placeholder for a real image/audio decode (PIL/librosa/ffmpeg are
    not in this container)."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; extract_features uses a deterministic fake instead"
    )


def _fake_embedding(digest: bytes, dim: int = 4) -> list[float]:
    # first `dim` bytes of the md5 digest, scaled to [0, 1]
    return [round(b / 255.0, 6) for b in digest[:dim]]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.md5(p).digest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "content_md5": [d.hex() for d in digests],
                    "fake_embedding": [_fake_embedding(d) for d in digests],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Image-resize stage: Arrow-batched, map-only, schema-preserving.

    The real decode+resample needs an image codec (absent here;
    ``decode_stub`` raises NotImplementedError) — the deterministic
    stand-in scales each payload to ``width*height`` bytes by repeating/
    truncating, so batch shapes, output schema, and metadata handling
    are exercised end-to-end."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                scaled = (b * (target // max(len(b), 1) + 1))[:target]
                out_payload.append(scaled)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out_payload,
                    "meta": [
                        {
                            "mime": "image/raw-stub",
                            "n_bytes": target,
                            "width": width,
                            "height": height,
                        }
                        for _ in out_payload
                    ],
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every_n: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling stage: one input payload fans out to every
    ``every_n``-th fixed-size frame — a 1:N Arrow-batched flatMap.

    Real containers need a demuxer (absent; see ``decode_stub``); the
    stand-in treats the payload as a flat array of ``frame_bytes``-byte
    frames, which keeps the fan-out dataflow (row multiplication inside
    mapInPandas) and the output schema real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                n_frames = len(b) // frame_bytes
                for k in range(0, n_frames, every_n):
                    ids.append(i)
                    nos.append(k)
                    frames.append(b[k * frame_bytes:(k + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame": frames}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
