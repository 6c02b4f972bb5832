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

import json
import os

from pyspark.sql import types as T

_TYPES = {
    "ts": T.TimestampType(),
    "f8": T.DoubleType(),
    "i8": T.LongType(),
    "str": T.StringType(),
    "bool": T.BooleanType(),
}

# full reference layouts (every column, in file order) extracted from the
# get_dtypes dict literals into a data resource by tools/extract_schemas.py
# — see DECISIONS.md D-15: schema facts are data, not code
_DATA_PATH = os.path.join(os.path.dirname(__file__), "schemas_data.json")
with open(_DATA_PATH) as _f:
    _FULL: dict[str, list[list[str]]] = json.load(_f)

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


# ---------------------------------------------------------- V2 generation
#
# The second-generation logger programs rename columns (schemas without
# the _V40826 suffix: FluxRaw at src/AzureDataLakeAccess.py:1055-1149,
# MetRaw at :1603-1659). Versioning is by logger-program signature (the
# config 'Ver' value); downstream QC/aggregation is written against the
# V40826 (canonical) names, so V2 frames are renamed to canonical right
# after the scan and the whole operator library applies unchanged.

#: V2 name -> canonical (V40826) name, for the columns the operator
#: library reads. Mapping pairs are taken from the two schema dicts'
#: corresponding entries (e.g. u_star -> USTAR, amb_tmpr_Avg -> TA_1_1_1).
V2_TO_CANONICAL: dict[str, str] = {
    "USTAR": "u_star",
    "TA_1_1_1": "amb_tmpr_Avg",
    "RH_1_1_1": "RH_Avg",
    "PA": "amb_press_Avg",
    "WS_RSLT": "rslt_wnd_spd",
    "WD": "wnd_dir_compass",
    "P": "Precipitation_Tot",
    "PPFD_IN": "PAR_density_Avg",
    "NETRAD": "Rn_meas_Avg",
    "VPD": "VPD_air",
    "e": "e_Avg",
    "e_sat": "e_sat_Avg",
    "H_QC": "H_qc_grade",
    "LE_QC": "LE_qc_grade",
    "FC_QC": "Fc_qc_grade",
    "FC_samples": "Fc_samples_Tot",
}

# V2 flux raw subset, in file column order (src/AzureDataLakeAccess.py:1055-1149)
FLUX_RAW_V2_COLUMNS: list[tuple[str, str]] = [
    ("TIMESTAMP", "ts"), ("RECORD", "i8"),
    ("FC_mass", "f8"), ("FC_QC", "i8"), ("FC_samples", "i8"),
    ("LE", "f8"), ("LE_QC", "i8"), ("LE_samples", "i8"),
    ("H", "f8"), ("H_QC", "i8"), ("H_samples", "i8"),
    ("NETRAD", "f8"), ("USTAR", "f8"),
    ("TA_1_1_1", "f8"), ("RH_1_1_1", "f8"), ("PA", "f8"), ("VPD", "f8"),
    ("WS_RSLT", "f8"), ("WD", "f8"),
    ("CO2_sig_strgth_Min", "f8"), ("H2O_sig_strgth_Min", "f8"),
    ("P", "f8"), ("PPFD_IN", "f8"),
]

# V2 met raw subset, in file column order (src/AzureDataLakeAccess.py:1603-1659)
MET_RAW_V2_COLUMNS: list[tuple[str, str]] = [
    ("TIMESTAMP", "ts"), ("RECORD", "i8"),
    ("amb_tmpr_Avg", "f8"), ("rslt_wnd_spd", "f8"), ("wnd_dir_compass", "f8"),
    ("RH_Avg", "f8"), ("Precipitation", "f8"), ("press_amb_Avg", "f8"),
    ("PAR_density", "f8"), ("VPD_air", "f8"), ("Rn", "f8"),
    ("e_sat", "f8"), ("e", "f8"),
]

#: V2 Met renames differ from V2 Flux (same physical quantity, third
#: spelling — e.g. Precipitation vs P vs Precipitation_Tot).
MET_V2_TO_CANONICAL: dict[str, str] = {
    "Precipitation": "Precipitation_Tot",
    "press_amb_Avg": "amb_press_Avg",
    "PAR_density": "PAR_density_Avg",
    "Rn": "Rn_meas_Avg",
    "e": "e_Avg",
    "e_sat": "e_sat_Avg",
}


def flux_raw_v2_schema(extend: list[T.StructField] | None = None) -> T.StructType:
    return build_schema(FLUX_RAW_V2_COLUMNS, extend)


def met_raw_v2_schema(extend: list[T.StructField] | None = None) -> T.StructType:
    return build_schema(MET_RAW_V2_COLUMNS, extend)


_REGISTRY = {
    ("Flux", "Raw", "V40826"): flux_raw_schema,
    ("Met", "Raw", "V40826"): met_raw_schema,
    ("Flux", "Raw", "V2"): flux_raw_v2_schema,
    ("Met", "Raw", "V2"): met_raw_v2_schema,
}


def get_schema(table: str, kind: str = "Raw", ver: str = "V40826") -> T.StructType:
    """Registry lookup mirroring ``get_dtypes(f'{col}Raw')`` call sites
    (src/AzureDataLakeAccess.py:456); ``ver`` is the logger-program
    signature from config ('Ver', src/LTARCAFTowerReport.py:70-77).

    Returns the curated *operator view* (the columns the QC/aggregation
    library reads, in file order — fine for fixtures and column-pruned
    parquet). Real TOA5 files bind positionally across the FULL layout —
    use :func:`get_full_schema` for those.
    """
    try:
        return _REGISTRY[(table, kind, ver)]()
    except KeyError:
        raise KeyError(
            f"no schema registered for ({table}, {kind}, {ver})"
        ) from None


def full_columns(dataset_type: str) -> list[tuple[str, str]]:
    """Every column of a reference dataset layout, in file order. The
    reference dicts omit TIMESTAMP when it is the read index
    (``index_col='TIMESTAMP'``, src/AzureDataLakeAccess.py:74) — it is
    the first physical column, so it is (re)prepended as TimestampType."""
    cols = [(n, t) for n, t in _FULL[dataset_type]]
    if cols and cols[0][0] == "TIMESTAMP":
        cols = cols[1:]
    return [("TIMESTAMP", "ts"), *cols]


def get_full_schema(table: str, kind: str = "Raw", ver: str = "V40826") -> T.StructType:
    """Exact full-layout schema for reading real logger/aggregate files
    positionally: (Flux|Met) x (Raw|Aggregated) x (V40826 | V2 — the
    suffix-less second-generation names)."""
    name = f"{table}{kind}" + ("_V40826" if ver == "V40826" else "")
    if name not in _FULL:
        raise KeyError(f"no full layout for ({table}, {kind}, {ver})")
    return build_schema(full_columns(name))


def to_canonical(df, table: str, ver: str):
    """Rename a V2-generation frame to canonical (V40826) column names
    so every downstream operator applies unchanged. No-op for V40826.
    Pure metadata rename — zero execution cost."""
    if ver != "V2":
        return df
    renames = dict(V2_TO_CANONICAL) if table == "Flux" else dict(MET_V2_TO_CANONICAL)
    present = {k: v for k, v in renames.items() if k in df.columns}
    return df.withColumnsRenamed(present)
