from .incremental import stream_ingest_dedup

__all__ = ["stream_ingest_dedup"]
