from .driver import run_tower_job, run_tower_jobs
from .pipeline import aggregate_pipeline

__all__ = ["aggregate_pipeline", "run_tower_job", "run_tower_jobs"]
