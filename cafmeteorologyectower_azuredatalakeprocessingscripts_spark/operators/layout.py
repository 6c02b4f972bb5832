"""Data-layout optimization: Morton (z-order) interleaved sort keys.

Parquet data skipping works off per-file / per-row-group min-max
statistics; a table range-sorted on ONE column skips perfectly on that
column and not at all on others. Interleaving the bits of two columns
into one sort key keeps BOTH columns' value ranges tight inside every
file, so selective filters on either column (or both) prune files —
the technique Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``.
Here it is a plain Column expression: pair it with
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` before a
parquet write (asserted against real parquet footer statistics in
tests/test_round6b.py).

Pure integer bit arithmetic — engine-exact, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(x: Column, y: Column, bits: int = 16) -> Column:
    """BIGINT Morton key interleaving the low ``bits`` of two
    non-negative integral columns: bit i of ``x`` lands at position 2i,
    bit i of ``y`` at 2i+1. Inputs are masked to ``bits`` wide, so the
    caller chooses the quantization (e.g. bucket a double first).

    ``bits <= 31`` keeps the key within a signed 64-bit range.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    xm = x.cast("bigint").bitwiseAND(F.lit(mask))
    ym = y.cast("bigint").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = key + F.shiftright(xm, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i)
        )
        key = key + F.shiftright(ym, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
    return key


def zorder_key2_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """ANSI-SQL mirror of :func:`zorder_key2` (same masks, same bit
    placements) for oracle replay."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x_sql}) & {mask}) >> {i} & 1) * {1 << (2 * i)}")
        terms.append(
            f"((({y_sql}) & {mask}) >> {i} & 1) * {1 << (2 * i + 1)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def unpivot_measures(
    df,
    ids: list[str],
    values: list[str],
    var_col: str = "measure",
    val_col: str = "val",
):
    """Wide→long melt via the native ``DataFrame.unpivot`` (Spark 3.4+
    Unpivot logical node — zero shuffle, each input row fans out to
    ``len(values)`` output rows inside the same partition, and column
    pruning still reaches the scan for the id+value set only).

    The met-tower use: one row per (timestamp, sensor) from the
    reference's wide TOA5 column layout, so per-sensor QC and storage
    become key-partitioned instead of column-addressed (the reference
    loops over pandas columns — src/AzureDataLakeAccess.py's per-column
    QC sweeps — which a long layout turns into one groupBy).
    """
    return df.unpivot(ids, values, var_col, val_col)
