"""Trailing event-time range-frame windows: the rolling-context QC the
reference approximates with its fixed lag-1 spike test
(src/AzureDataLakeAccess.py:618-644 compares each sample to its single
predecessor). A range frame generalizes that to "all samples in the
previous N seconds", which is the standard meteorological despike
window — and, unlike a ROWS frame, is correct under irregular sampling
and data gaps.

Determinism note (why extrema, not z-scores): rolling mean/stddev
spike tests compare a float to an order-dependent float reduction —
two engines (or two partitionings) can disagree at the threshold
boundary. min/max/count are exact selections, and the flag compares
IEEE-exact products (factor · extremum), so the output is bit-stable
across engines and cluster sizes. The frame excludes the current
timestamp entirely (bound ends at 1 µs preceding), so simultaneous
readings never vote on each other and peer-row order cannot matter.

Scale shape: one shuffle keyed by the series id, then a
partition-local sort feeding a single WindowExec computing all three
aggregates over one shared frame; no joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_S = 1_000_000


def rolling_extrema_flags(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    lookback_s: int = 3600,
    min_prior: int = 3,
    hi_factor: float = 2.0,
    lo_factor: float = 0.5,
) -> DataFrame:
    """Adds (prev_n, prev_min, prev_max, spike) per row: context from
    the trailing ``lookback_s`` event-time window (current-timestamp
    rows excluded), and a despike flag raised when at least
    ``min_prior`` prior readings exist and the value escapes
    ``[lo_factor·prev_min, hi_factor·prev_max]``.

    The frame is event-time (``rangeBetween`` over epoch microseconds),
    so gaps in the series shrink the context instead of silently
    reaching further back the way a ROWS frame would.
    """
    if lookback_s < 1 or min_prior < 1:
        raise ValueError(
            f"need lookback_s >= 1 and min_prior >= 1, got "
            f"{lookback_s}/{min_prior}"
        )
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-lookback_s * US_PER_S, -1)
    )
    v = F.col(value_col)
    prev_n = F.count(v).over(w)
    prev_min = F.min(v).over(w)
    prev_max = F.max(v).over(w)
    spike = (prev_n >= F.lit(min_prior)) & (
        (v > F.lit(hi_factor) * prev_max) | (v < F.lit(lo_factor) * prev_min)
    )
    return df.select(
        "*",
        prev_n.alias("prev_n"),
        prev_min.alias("prev_min"),
        prev_max.alias("prev_max"),
        F.coalesce(spike, F.lit(False)).alias("spike"),
    )


def trend_slope(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    bucket: str = "DAY",
) -> DataFrame:
    """Per-(key, bucket) least-squares trend of value over time — the
    drift/trend QC a met pipeline layers over spike tests (is this
    sensor ramping within the day?). x = seconds into the bucket, so
    slopes are in value-units per second and buckets are comparable.

    ``regr_slope``/``regr_intercept``/``regr_r2`` are single-pass
    commutative aggregates (sum/sum-of-product sufficient statistics) —
    partial aggregation map-side, ONE shuffle keyed by (key, bucket),
    no window, no self-join. Slopes round to 6 so the oracle's
    float reduction order cannot flip the comparison.

    NULL slope (constant x or < 2 points) rows are kept — a flat-lined
    clock is itself a finding.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    # exact integer microseconds, then ONE double division — the same
    # two ops in any engine give the same double (unix_timestamp would
    # truncate sub-second parts the oracle keeps)
    x = (
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(b)).cast("double")
        / F.lit(1e6)
    )
    y = F.col(value_col).cast("double")
    return (
        df.filter(y.isNotNull())
        .groupBy(F.col(key_col), b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
    )


def cusum_flags(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    order_tiebreak: str | None = None,
    h: float = 5.0,
) -> DataFrame:
    """CUSUM level-shift detection per series: flag samples where the
    cumulative deviation from the series mean exceeds ``h`` (in value
    units × sample count — the classic Page test with the series mean
    as reference). The sensor-drift complement to point-wise spike
    tests: a slow step change never trips a lag test but accumulates
    here.

    Bit-exact across engines and partitionings: both the running sum
    and the mean ride as exact integers — values become micro-units
    (floor(x·1e6), int64), and the comparison is multiplied through by
    n so no division ever happens: flag iff
    |n·cumsum_i − i·total| > h·n·1e6. Integer addition is associative,
    so parallel partials cannot perturb the flag the way a float
    cumsum would.

    One shuffle keyed by the series, one WindowExec computing the
    ordered cumsum and row number, with the series total/count as
    unbounded frames over the same partitioning (no second scan,
    no join-back — D-28).
    """
    w_ord = Window.partitionBy(key_col).orderBy(
        *([ts_col, order_tiebreak] if order_tiebreak else [ts_col])
    )
    w_all = Window.partitionBy(key_col)
    xm = F.floor(F.col(value_col).cast("double") * 1e6).cast("bigint")
    cum = F.sum(xm).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    i = F.row_number().over(w_ord)
    total = F.sum(xm).over(w_all)
    n = F.count(F.lit(1)).over(w_all)
    # decimal intermediates: n·cumsum at micro-unit scale can exceed
    # int64 for long, large-valued series
    dev = (
        n.cast("decimal(38,0)") * cum.cast("decimal(38,0)")
        - i.cast("decimal(38,0)") * total.cast("decimal(38,0)")
    )
    # threshold resolved to an exact integer literal driver-side — no
    # engine-dependent double→decimal cast in the comparison
    thr = F.lit(int(round(h * 1e6))).cast("decimal(20,0)") * n.cast(
        "decimal(18,0)"
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col),
            F.col(ts_col),
            F.col(value_col),
            i.alias("i"),
            cum.alias("cum_micro"),
            (F.abs(dev) > thr).alias("shift_flag"),
        )
    )
