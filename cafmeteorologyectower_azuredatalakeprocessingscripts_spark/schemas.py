"""Schema registry (SURVEY.md §1.2-1.3).

The reference hard-codes ~913 lines of per-column dtype dicts
(``get_dtypes``, src/AzureDataLakeAccess.py:806-1719) for
(Flux|Met) x (Raw|Aggregated) x (V40826|V2 logger program). We keep the
same *contract* — explicit schema per (table, version), never inference —
but build the StructTypes from compact ordered (name, type) tables
instead of 900 hand-written lines. The columns here are the ones the
QC/aggregation operators actually read (FIXTURES.md A1/A2); extra sensor
columns are appended via ``extend`` at call sites.

IMPORTANT: CSV scans bind schema fields to file columns BY POSITION
(TOA5 files carry names only in header line 2, which the scan skips), so
field order here must match the physical column order of the files.
``sources.toa5.read_toa5(validate_header=True)`` cross-checks the names
against a sample file's header line.

dtype mapping: pandas float -> DoubleType, nullable 'Int64' -> LongType,
str/object -> StringType, index -> TimestampType.
"""

from __future__ import annotations

from pyspark.sql import types as T

_TYPES = {
    "ts": T.TimestampType(),
    "f8": T.DoubleType(),
    "i8": T.LongType(),
    "str": T.StringType(),
}

# Flux raw, in file column order (FluxRaw_V40826 subset,
# src/AzureDataLakeAccess.py:809-1054)
FLUX_RAW_COLUMNS: list[tuple[str, str]] = [
    ("TIMESTAMP", "ts"), ("RECORD", "i8"),
    ("H", "f8"), ("LE", "f8"), ("Fc_molar", "f8"), ("u_star", "f8"),
    ("amb_tmpr_Avg", "f8"), ("RH_Avg", "f8"), ("amb_press_Avg", "f8"),
    ("rslt_wnd_spd", "f8"), ("wnd_dir_compass", "f8"),
    ("Precipitation_Tot", "f8"), ("PAR_density_Avg", "f8"),
    ("Rn_meas_Avg", "f8"), ("VPD_air", "f8"), ("e_Avg", "f8"),
    ("e_sat_Avg", "f8"), ("CO2_sig_strgth_Min", "f8"),
    ("H2O_sig_strgth_Min", "f8"), ("door_is_open_Hst", "f8"),
    ("H_qc_grade", "i8"), ("LE_qc_grade", "i8"), ("Fc_qc_grade", "i8"),
    ("sonic_samples_Tot", "i8"), ("Fc_samples_Tot", "i8"),
]

# Met raw, in file column order (MetRaw_V40826 subset,
# src/AzureDataLakeAccess.py:1546-1601)
MET_RAW_COLUMNS: list[tuple[str, str]] = [
    ("TIMESTAMP", "ts"), ("RECORD", "i8"),
    ("amb_tmpr_Avg", "f8"), ("RH_Avg", "f8"), ("amb_press_Avg", "f8"),
    ("rslt_wnd_spd", "f8"), ("wnd_dir_compass", "f8"),
    ("Precipitation_Tot", "f8"), ("PAR_density_Avg", "f8"),
    ("Rn_meas_Avg", "f8"), ("VPD_air", "f8"), ("e", "f8"), ("e_sat", "f8"),
]


def build_schema(
    columns: list[tuple[str, str]],
    extend: list[T.StructField] | None = None,
) -> T.StructType:
    fields = [T.StructField(n, _TYPES[t], True) for n, t in columns]
    return T.StructType(fields + (extend or []))


def flux_raw_schema(extend: list[T.StructField] | None = None) -> T.StructType:
    return build_schema(FLUX_RAW_COLUMNS, extend)


def met_raw_schema(extend: list[T.StructField] | None = None) -> T.StructType:
    return build_schema(MET_RAW_COLUMNS, extend)


_REGISTRY = {
    ("Flux", "Raw"): flux_raw_schema,
    ("Met", "Raw"): met_raw_schema,
}


def get_schema(table: str, kind: str = "Raw") -> T.StructType:
    """Registry lookup mirroring ``get_dtypes(f'{col}Raw')`` call sites
    (src/AzureDataLakeAccess.py:456)."""
    try:
        return _REGISTRY[(table, kind)]()
    except KeyError:
        raise KeyError(f"no schema registered for ({table}, {kind})") from None
