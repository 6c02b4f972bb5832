from .incremental import (
    stream_dedup_keep_richest,
    stream_dedup_within_watermark,
    stream_ingest_dedup,
)
from .joins import stream_interval_join

__all__ = [
    "stream_dedup_keep_richest",
    "stream_dedup_within_watermark",
    "stream_ingest_dedup",
    "stream_interval_join",
]
