from .incremental import stream_dedup_keep_richest, stream_ingest_dedup

__all__ = ["stream_dedup_keep_richest", "stream_ingest_dedup"]
