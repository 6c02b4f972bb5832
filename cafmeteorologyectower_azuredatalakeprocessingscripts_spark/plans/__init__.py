from .pipeline import aggregate_pipeline

__all__ = ["aggregate_pipeline"]
