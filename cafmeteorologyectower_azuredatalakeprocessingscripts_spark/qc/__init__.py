from .metqc import met_qaqc, MET_FLUX_MAPPING, MET_MET_MAPPING
from .grade import grade_cs, FluxQCConfig

__all__ = [
    "met_qaqc",
    "grade_cs",
    "FluxQCConfig",
    "MET_FLUX_MAPPING",
    "MET_MET_MAPPING",
]
