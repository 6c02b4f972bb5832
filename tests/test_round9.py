"""Round-9 additions: the key-less interpolate_linear guard
(VERDICT r8 #5), rotation invariants, and PNG Paeth batch parity."""

import warnings

import pytest
from pyspark.sql import functions as F

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.operators.gapfill import (
    interpolate_linear,
)


def _interp(df, key):
    return interpolate_linear(
        df, ts_col="ts", key_col=key, value_col="v"
    )


def test_keyless_interpolate_warns_on_large_frame(spark):
    """A corpus-sized frame with key_col=None plans a single-partition
    window — the guard must say so (plan-side estimate, no job)."""
    big = spark.range(100_000_000).select(
        F.timestamp_micros(F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.warns(RuntimeWarning, match="single-\npartition|single-partition"):
        _interp(big, None)


def test_keyed_or_small_interpolate_stays_silent(spark):
    big = spark.range(100_000_000).select(
        F.timestamp_micros(F.col("id")).alias("ts"),
        (F.col("id") % 50).alias("site"),
        F.col("id").cast("double").alias("v"),
    )
    small = spark.range(10_000).select(
        F.timestamp_micros(F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _interp(big, "site")  # keyed: distributed window, no warning
        _interp(small, None)  # oracle-scale: under the byte floor
