"""Met_QAQC — meteorology quality control (SURVEY.md §2.8 W1-W5, §2.2 P4).

Reference: src/AzureDataLakeAccess.py:637-804. Per variable it derives
``{Var}_Hard_Limit`` (physical bounds), ``{Var}_Change`` (step/spike and
stuck-sensor test on the lag difference), ``{Var}_Day_Change`` (daily-mean
flatline test), and ``{Var}_Filtered`` (the value where every test passed,
else null), plus MSLP derivation from pressure + temperature and special
RH/precip logic.

The whole battery is ONE projection over the frame (plus one ``lag``
window and, in fixed mode, one day-level window) — no joins. The
reference's pandas column-joins (J1/J3) are alignment artifacts with no
Spark counterpart.

Bug-compat mode (default True) reproduces the reference's actual pandas
arithmetic, which differs from its evident intent:

- ``np.abs(diff >= 15)`` applies ``abs`` AFTER the comparison, so only
  *positive* spikes trip the test (:643 et al.). With ``bug_compat=False``
  the test is ``abs(diff) >= thr``.
- ``X.resample('D').mean().diff != 0`` compares the *method object* — a
  scalar True — so Day_Change is constant True (:644 et al.). With
  ``bug_compat=False`` it is a real daily-mean lag test, broadcast to all
  ticks of the day.
- pandas null coercion: ``NaN >= x → False`` but ``NaN != 0 → True``
  (first row of every series). Reproduced in both modes via explicit
  null defaults.

Precip zero-restore (:755) uses ``Series.replace`` with a value *list*;
when that list contains NaN, pandas replaces every NaN in the column — a
data-dependent global side effect. We implement the documented intent
(zero precip stays 0; failing rows null) — see DECISIONS.md.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.nulls import false_if_null, true_if_null

# logical var -> Flux-table column (reference METQC 'Flux' branch, :622-624)
MET_FLUX_MAPPING = {
    "Tair": "amb_tmpr_Avg",
    "RH": "RH_Avg",
    "P": "amb_press_Avg",
    "WS": "rslt_wnd_spd",
    "WD": "wnd_dir_compass",
    "Precip": "Precipitation_Tot",
    "PAR": "PAR_density_Avg",
    "Rn": "Rn_meas_Avg",
    "VPD": "VPD_air",
    "e": "e_Avg",
    "e_s": "e_sat_Avg",
}

# Met-table naming differs only for vapor pressures (:626-628)
MET_MET_MAPPING = {**MET_FLUX_MAPPING, "e": "e", "e_s": "e_sat"}

# (hard lo, lo inclusive, hard hi, hi inclusive) per variable (:642-799)
_HARD_LIMITS = {
    "Tair": (-40.0, True, 50.0, True),
    "RH": (0.0, True, 103.0, True),
    "P": (80.0, True, 100.0, True),
    "MSLP": (80.0, True, 110.0, True),
    "WS": (0.0, True, 60.0, False),
    "WD": (0.0, True, 360.0, False),
    "PAR": (0.0, True, 5000.0, False),
    "Rn": (-150.0, True, 1500.0, True),
    "Precip": (0.0, True, 100.0, False),
    "VPD": (0.0, True, 50.0, False),
    "e": (0.0, True, 50.0, False),
    "e_s": (0.0, True, 50.0, False),
}

# step-change threshold per variable (:643-800); None = no threshold clause
_CHANGE_THRESHOLDS = {
    "Tair": 15.0,
    "RH": 50.0,
    "P": 3.1,
    "MSLP": 31.0,
    "WS": 15.0,
    "WD": None,  # only the stuck-sensor (diff != 0) clause (:712)
    "PAR": 1500.0,
    "Rn": 500.0,
    "VPD": 10.0,
    "e": 10.0,
    "e_s": 10.0,
}

# variables whose Change test includes the stuck-sensor (diff != 0) clause;
# PAR's does not (:724)
_HAS_NEQ_ZERO = {"Tair", "RH", "P", "MSLP", "WS", "WD", "Rn", "VPD", "e", "e_s"}

# variables with a Day_Change test (:644-801; P, MSLP, WD, Precip have none)
_HAS_DAY_CHANGE = {"Tair", "RH", "WS", "PAR", "Rn", "VPD", "e", "e_s"}

_ORDER = ["Tair", "RH", "P", "WS", "WD", "PAR", "Rn", "Precip", "VPD", "e", "e_s"]


def _hard_limit(c: Column, var: str) -> Column:
    lo, lo_inc, hi, hi_inc = _HARD_LIMITS[var]
    lo_ok = c >= lo if lo_inc else c > lo
    hi_ok = c <= hi if hi_inc else c < hi
    return false_if_null(lo_ok & hi_ok)


def _change_test(diff: Column, var: str, bug_compat: bool) -> Column:
    """Spike + stuck-sensor test on the lag difference.

    bug-compat: comparison on the RAW diff (positive spikes only for the
    upper-bound forms), pandas null coercion per clause. Fixed: abs(diff).
    """
    thr = _CHANGE_THRESHOLDS[var]
    d = diff if bug_compat else F.abs(diff)
    clauses = []
    if thr is not None:
        if var == "Tair":
            # reference writes ~(diff >= 15) (:643) — others use diff <= thr
            clauses.append(~false_if_null(d >= thr))
        else:
            clauses.append(false_if_null(d <= thr))
    if var in _HAS_NEQ_ZERO:
        clauses.append(true_if_null(diff != 0))
    out = clauses[0]
    for cl in clauses[1:]:
        out = out & cl
    return out


def met_qaqc(
    df: DataFrame,
    mapping: dict[str, str] | None = None,
    ts_col: str = "TIMESTAMP",
    z: float = 0.777,
    partition_cols: Sequence[str] = (),
    bug_compat: bool = True,
) -> DataFrame:
    """Append the full Met QC column battery.

    ``mapping``: logical var -> physical column (vars missing from the
    mapping or the frame are skipped, like the reference's kwarg checks).
    ``partition_cols``: site/table keys — the lag windows partition by
    them so a 1000-site dataset never funnels through one partition.
    Re-running is idempotent: previously produced QC columns are dropped
    first (reference drop-then-recompute, :629-632).
    """
    mapping = {
        k: v
        for k, v in (mapping or MET_FLUX_MAPPING).items()
        if v in df.columns
    }
    pcols = list(partition_cols)
    w_lag = Window.partitionBy(*pcols).orderBy(ts_col)

    val: dict[str, Column] = {
        v: F.col(mapping[v]).cast("double") for v in mapping
    }
    # MSLP derived from P + Tair via the barometric formula (:676-681):
    # scale height H = 8.314*(Tair+273.15)/(0.029*9.81)/1000 [km]
    if "P" in val and "Tair" in val:
        h_km = (8.314 * (val["Tair"] + 273.15)) / (0.029 * 9.81) / 1000.0
        val["MSLP"] = val["P"] / F.exp(-F.lit(z) / h_km)

    day = F.date_trunc("DAY", F.col(ts_col))
    out: dict[str, Column] = {}
    tests: dict[str, Column] = {}  # var -> conjunction of its tests

    def add_var(var: str) -> None:
        c = val[var]
        if var == "MSLP":
            # the derived MSLP value itself is part of the output
            # (reference joins the MSLP frame and keeps it, :681-682)
            out["MSLP"] = c
        hl = _hard_limit(c, var)
        out[f"{var}_Hard_Limit"] = hl
        conj = hl
        if var == "RH":
            out["RH_gt_100"] = false_if_null((c >= 100) & (c <= 103))
        if var != "Precip":
            diff = c - F.lag(c).over(w_lag)
            ch = _change_test(diff, var, bug_compat)
            out[f"{var}_Change"] = ch
            conj = conj & ch
        if var in _HAS_DAY_CHANGE:
            if bug_compat:
                # reference compares the .diff *method* to 0 → constant True
                dc = F.lit(True)
            else:
                # intended semantics: daily mean changed vs the previous
                # day, broadcast to every tick of the day. Day mean via a
                # day-keyed window; previous-day mean via a range window
                # over the unix day number (handles missing days; absent
                # previous day → pass, like a NaN diff would).
                day_avg = F.avg(c).over(Window.partitionBy(*pcols, day))
                day_num = F.datediff(day, F.lit("1970-01-01"))
                prev = F.max(day_avg).over(
                    Window.partitionBy(*pcols)
                    .orderBy(day_num)
                    .rangeBetween(-1, -1)
                )
                dc = true_if_null((day_avg - prev) != 0)
            out[f"{var}_Day_Change"] = dc
            conj = conj & dc
        tests[var] = conj

    for var in _ORDER:
        if var in val:
            add_var(var)
            if var == "P" and "MSLP" in val:
                add_var("MSLP")

    # Filtered columns (value where all tests pass, else null)
    for var in _ORDER + ["MSLP"]:
        if var not in val or var == "Precip":
            continue
        filt = F.when(tests[var], val[var])
        if var == "RH":
            # clamp (100, 103] -> 100 on passing rows (:656, :660)
            filt = F.when(tests["RH"] & out["RH_gt_100"], F.lit(100.0)).otherwise(
                filt
            )
        out[f"{var}_Filtered"] = filt

    # Precip interaction logic (:744-770)
    if "Precip" in val:
        p = val["Precip"]
        hl = tests["Precip"]
        conds = hl
        if "RH" in val:
            rh_gt_90 = false_if_null(
                (p > 0) & (out["RH_Filtered"] >= 90)
            )
            out["Precip_RH_gt_90"] = rh_gt_90
            conds = conds & rh_gt_90
        if "Tair" in val:
            tair_lt_0 = false_if_null((p > 0) & (out["Tair_Filtered"] < 0))
            out["Precip_Tair_lt_Zero"] = tair_lt_0
            conds = conds & ~tair_lt_0
        out["Precip_Filtered"] = (
            F.when(p == 0, F.lit(0.0)).when(conds, p)
        )

    produced = list(out.keys())
    clean = df.drop(*[c for c in produced if c in df.columns])
    return clean.withColumns(out)
