"""Grade_cs — flux quality grading + flag strings (SURVEY.md §2.8 W3/W4,
§2.2 P5).

Reference: src/AzureDataLakeAccess.py:532-615. For each of the three flux
variables (H, LE, Fc) it builds a string flag column by appending one
'0'/'1' character per QC test, in a fixed order, and a ``{flux}_Graded``
copy nulled where the composite verdict fails.

Character order (a char only appears if its source column exists — the
reference gates each append on column presence):

  1. bounds / null check (HL)                         :549-558
  2. turbulence grade > threshold                     :560-565
  3. precipitation during interval                    :567-572
  4. CO2 signal strength <= 0.7                       :574-579
  5. H2O signal strength <= 0.7                       :580-585
  6. sonic samples <= 14400 (80% of 10Hz x 30min)     :586-591
  7. IRGA (Fc) samples <= 14400                       :592-597
  8. door open (site visit)                           :599-604

Composite ``Good`` (:605-609): with a door column —
``Precip & Grade & Door & ~HL & c_sig & w_sig & (Sonic | IRGA)``;
without — ``Grade & ~HL & (Sonic | IRGA)``. pandas NaN comparisons
coerce to False (a null sensor value fails its test); reproduced with
explicit null defaults. (The reference's no-door branch NameErrors if the
sample columns are also absent — we treat absent sample columns as
passing instead; DECISIONS.md.)

Everything is a single projection — no joins, no shuffle; the string
flags stay StringType (the aggregated schema's later 'Int64' cast is a
reference quirk we do not replicate — SURVEY.md §1.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.nulls import false_if_null


@dataclass
class FluxQCConfig:
    """QC parameters from the config workbook (readinfo,
    src/AzureDataLakeAccess.py:521-530; template values FIXTURES.md A3)."""

    grade: int = 7
    le_bounds: tuple[float, float] = (-150.0, 1000.0)
    h_bounds: tuple[float, float] = (-150.0, 1000.0)
    fc_bounds: tuple[float, float] = (-60.0, 20.0)
    ustar: float = 0.0
    # (flux column, its grade column, its flag column) triples
    flux_cols: tuple[str, ...] = ("H", "LE", "Fc_molar")
    grade_cols: tuple[str, ...] = ("H_qc_grade", "LE_qc_grade", "Fc_qc_grade")
    flag_cols: tuple[str, ...] = ("H_Flags", "LE_Flags", "Fc_Flags")
    precip_col: str = "Precipitation_Tot"
    co2_sig_col: str = "CO2_sig_strgth_Min"
    h2o_sig_col: str = "H2O_sig_strgth_Min"
    sonic_samples_col: str = "sonic_samples_Tot"
    irga_samples_col: str = "Fc_samples_Tot"
    door_col: str = "door_is_open_Hst"
    min_samples: float = 14400.0
    sig_strength_min: float = 0.7

    def bounds_for(self, i: int) -> tuple[float, float]:
        return (self.h_bounds, self.le_bounds, self.fc_bounds)[i]

    def validate(self) -> None:
        if not 1 <= self.grade <= 9:
            raise ValueError("grade must be between 1 and 9")
        if self.ustar < 0:
            raise ValueError("ustar must be non-negative")


def _flag_char(fail: Column) -> Column:
    return F.when(fail, "1").otherwise("0")


def grade_cs(df: DataFrame, cfg: FluxQCConfig | None = None) -> DataFrame:
    """Append ``{flux}_Graded`` + ``{H,LE,Fc}_Flags`` columns."""
    cfg = cfg or FluxQCConfig()
    cfg.validate()
    cols = set(df.columns)

    def dcol(name: str) -> Column:
        return F.col(name).cast("double")

    # shared (per-row, flux-independent) tests — null ⇒ test fails,
    # matching pandas NaN coercion
    shared: dict[str, Column] = {}
    if cfg.precip_col in cols:
        shared["precip_ok"] = false_if_null(dcol(cfg.precip_col) < 0.001)
    if cfg.co2_sig_col in cols:
        shared["c_sig_ok"] = false_if_null(
            dcol(cfg.co2_sig_col) > cfg.sig_strength_min
        )
    if cfg.h2o_sig_col in cols:
        shared["w_sig_ok"] = false_if_null(
            dcol(cfg.h2o_sig_col) > cfg.sig_strength_min
        )
    if cfg.sonic_samples_col in cols:
        shared["sonic_ok"] = false_if_null(
            dcol(cfg.sonic_samples_col) > cfg.min_samples
        )
    if cfg.irga_samples_col in cols:
        shared["irga_ok"] = false_if_null(
            dcol(cfg.irga_samples_col) > cfg.min_samples
        )
    if cfg.door_col in cols:
        shared["door_ok"] = false_if_null(dcol(cfg.door_col) == 0)

    out: dict[str, Column] = {}
    for i, flux in enumerate(cfg.flux_cols):
        lo, hi = cfg.bounds_for(i)
        fx = dcol(flux)
        hl = false_if_null((fx < lo) | (fx > hi)) | fx.isNull()
        grade_ok = false_if_null(dcol(cfg.grade_cols[i]) <= cfg.grade)

        chars = [_flag_char(hl), _flag_char(~grade_ok)]
        if "precip_ok" in shared:
            chars.append(_flag_char(~shared["precip_ok"]))
        if "c_sig_ok" in shared:
            chars.append(_flag_char(~shared["c_sig_ok"]))
        if "w_sig_ok" in shared:
            chars.append(_flag_char(~shared["w_sig_ok"]))
        if "sonic_ok" in shared:
            chars.append(_flag_char(~shared["sonic_ok"]))
        if "irga_ok" in shared:
            chars.append(_flag_char(~shared["irga_ok"]))
        if "door_ok" in shared:
            chars.append(_flag_char(~shared["door_ok"]))
        out[cfg.flag_cols[i]] = F.concat(*chars)

        samples_ok = None
        if "sonic_ok" in shared or "irga_ok" in shared:
            samples_ok = shared.get("sonic_ok", F.lit(False)) | shared.get(
                "irga_ok", F.lit(False)
            )
        if "door_ok" in shared:
            good = (
                shared.get("precip_ok", F.lit(True))
                & grade_ok
                & shared["door_ok"]
                & ~hl
                & shared.get("c_sig_ok", F.lit(True))
                & shared.get("w_sig_ok", F.lit(True))
            )
        else:
            good = grade_ok & ~hl
        if samples_ok is not None:
            good = good & samples_ok
        out[f"{flux}_Graded"] = F.when(good, F.col(flux))

    produced = list(out.keys())
    clean = df.drop(*[c for c in produced if c in df.columns])
    return clean.withColumns(out)
