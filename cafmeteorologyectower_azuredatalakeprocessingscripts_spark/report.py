"""Tower report surface (SURVEY.md §2.1 S8, §3.3; Phase 4).

The reference renders a multi-page PDF: 9 table-driven variable groups,
one subplot per variable, one line per station, clipped to the last 10
days of data (src/TowerReportPlots.py:18-128). Presentation is a
driver-side concern; the engine's job is the *query*: latest aggregate
per station (S9), last-10-day clip (A3+P3), column pruning to the
grouped variables — all of which Catalyst pushes into the parquet scan.

``report_frames`` does the Spark-side work and hands tiny pandas frames
to the renderer; ``render_pdf`` is gated on matplotlib (not in this
container) and degrades to a clear error, while ``render_csv`` always
works.
"""

from __future__ import annotations

import datetime
import os
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Table-driven variable groups (src/TowerReportPlots.py:75-85). The
#: names are the V2-generation (current logger program) column names.
VARIABLE_GROUPS: dict[str, list[str]] = {
    "Heat and Energy Fluxes": ["H", "LE", "FC_mass"],
    "Temperature Variables": ["TA_1_1_1", "TA_1_1_2", "T_SONIC"],
    "Humidity and Precipitation": ["RH_1_1_1", "RH_1_1_3", "P"],
    "Wind and Friction": ["USTAR", "FETCH_90"],
    "Radiation and Photosynthetically Active Radiation": ["PPFD_IN"],
    "Wind Components": ["Ux", "Uy", "Uz"],
    "Flux Sample Totals": ["FC_samples", "LE_samples", "H_samples"],
    "Signal Strengths": ["CO2_sig_strgth_Min", "H2O_sig_strgth_Min"],
    "Soil Temperature and Water Content (Shallow)": ["TS_TDR31X_1_1_1"],
}


def clip_last_days(
    df: DataFrame, ts_col: str = "TIMESTAMP", days: int = 10
) -> DataFrame:
    """Window ending at the data's own max timestamp (the reference
    anchors on ``index[-1]``, src/TowerReportPlots.py:58-62), computed
    without collecting the data: scalar max via a tiny agg, then a
    scan-pushable range predicate."""
    row = df.agg(F.max(ts_col).alias("mx")).first()
    if row is None or row["mx"] is None:
        return df
    lo = row["mx"] - datetime.timedelta(days=days)
    return df.filter(F.col(ts_col).between(F.lit(lo), F.lit(row["mx"])))


def report_frames(
    stations: Mapping[str, DataFrame],
    groups: Mapping[str, list[str]] | None = None,
    ts_col: str = "TIMESTAMP",
    days: int = 10,
    start: datetime.datetime | None = None,
    end: datetime.datetime | None = None,
):
    """Per-station pandas frames pruned to the report variables.

    Mirrors the reference's tolerance: stations whose frames are empty
    are skipped with a note (src/TowerReportPlots.py:30-37); variables a
    station lacks are simply absent. Returns ``(frames, missing)``.

    The clip window is ANCHORED: the reference computes
    [last-10d, last] from the FIRST valid station's final tick and
    slices every station to that shared range
    (src/TowerReportPlots.py:56-62) — a station with stale data shows
    the same x-range as the others (possibly empty), not its own.
    """
    groups = dict(groups or VARIABLE_GROUPS)
    wanted = [v for vs in groups.values() for v in vs]

    def bounded(df: DataFrame) -> DataFrame:
        if start is not None:
            df = df.filter(F.col(ts_col) > F.lit(start))
        if end is not None:
            df = df.filter(F.col(ts_col) < F.lit(end))
        return df

    # anchor = first station with any data: one scalar max agg, no collect
    anchor = None
    for station, df in stations.items():
        row = bounded(df).agg(F.max(ts_col).alias("mx")).first()
        if row is not None and row["mx"] is not None:
            anchor = row["mx"]
            break

    frames: dict[str, object] = {}
    missing: list[str] = []
    for station, df in stations.items():
        cols = [c for c in wanted if c in df.columns]
        clipped = bounded(df.select(ts_col, *cols))
        if anchor is not None:
            lo = anchor - datetime.timedelta(days=days)
            clipped = clipped.filter(F.col(ts_col).between(F.lit(lo), F.lit(anchor)))
        pdf = clipped.orderBy(ts_col).toPandas()
        if len(pdf) == 0:
            missing.append(station)
            continue
        frames[station] = pdf.set_index(ts_col)
    return frames, missing


def report_filename(last_ts: datetime.datetime, days: int = 7) -> str:
    """``CAFLTARTowerReport{YYYYMMDD}_{YYYYMMDD}.pdf`` — 7-day stamp
    ending at the last tick (src/TowerReportPlots.py:64-66)."""
    s = (last_ts - datetime.timedelta(days=days)).strftime("%Y%m%d")
    e = last_ts.strftime("%Y%m%d")
    return f"CAFLTARTowerReport{s}_{e}.pdf"


def render_csv(frames, out_dir: str, groups=None) -> list[str]:
    """Renderer that needs no plotting stack: one CSV per variable
    group, stations' series joined side-by-side on TIMESTAMP."""
    groups = dict(groups or VARIABLE_GROUPS)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for label, vs in groups.items():
        parts = []
        for station, pdf in frames.items():
            have = [v for v in vs if v in pdf.columns]
            if have:
                parts.append(pdf[have].add_prefix(f"{station}_"))
        if not parts:
            continue
        out = parts[0]
        for p in parts[1:]:
            out = out.join(p, how="outer")
        path = os.path.join(
            out_dir, label.lower().replace(" ", "_")[:48] + ".csv"
        )
        out.to_csv(path, index_label="TIMESTAMP")
        written.append(path)
    return written


def render_pdf(frames, out_path: str, groups=None) -> str:
    """Multi-page PDF, one page per group / subplot per variable / line
    per station (src/TowerReportPlots.py:87-124). Gated on matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.backends.backend_pdf import PdfPages
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "PDF rendering requires matplotlib (not in this container); "
            "use render_csv for a plot-free report"
        ) from exc

    groups = dict(groups or VARIABLE_GROUPS)
    with PdfPages(out_path) as pdf_pages:  # pragma: no cover - env-dependent
        for label, vs in groups.items():
            fig = plt.figure(figsize=(8, 8))
            fig.suptitle(label, fontsize=14, fontweight="bold")
            plotted_any = False
            for idx, var in enumerate(vs, 1):
                ax = plt.subplot(len(vs), 1, idx)
                for station, pdf in frames.items():
                    if var in pdf.columns and pdf[var].notna().any():
                        ax.plot(pdf.index, pdf[var].astype(float), label=station)
                        plotted_any = True
                ax.set_ylabel(var, fontsize=12)
                if plotted_any:
                    ax.legend(fontsize=8)
            if plotted_any:
                fig.tight_layout(rect=[0, 0.03, 1, 0.95])
                pdf_pages.savefig(fig)
            plt.close(fig)
    return out_path
