"""Stream-stream event-time joins.

The reference processes each download batch independently (eager pandas
per file, src/AzureDataLakeAccess.py) and has no cross-stream
correlation primitive; this is the Structured Streaming surface a
continuously-ingesting tower network needs — e.g. joining a live flux
stream to a live met stream within a time tolerance, or (the
training-data shape) attributing conversion events to the preceding
click within a window.

Scale shape: Spark co-partitions both streams by the equality key, and
the watermarks bound the join state — left rows older than
(left watermark) and right rows outside the interval's reach are
evicted, so state size is O(key-cardinality × interval), not O(stream).
An inner join emits matches immediately (watermarks gate only state
eviction and outer-null emission), so a single availableNow batch over
a bounded source reproduces the batch join exactly — which is what the
DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right rows in ``[left_ts - lookback,
    left_ts]`` for the same ``key`` (the attribution shape: every left
    event matched to the right events that preceded it within the
    window).

    ``how='inner'`` (default) emits matches immediately.
    ``how='left_outer'`` additionally emits each unmatched left row
    ONCE with nulls on the right side — but only after the query
    watermark (min across both sides) passes ``left_ts + lookback``,
    when Spark can prove no further right match can arrive. In a
    bounded replay this means null rows need a LATER micro-batch whose
    data advances the watermark past the row — a single availableNow
    batch emits only the inner matches (see
    ``tests/test_streaming_state.py`` for the two-batch proof and the
    driver query for the sentinel-flush pattern).

    Both inputs must be streaming DataFrames. The right watermark must
    cover ``right_watermark >= left_watermark + lookback`` or correct
    results are not guaranteed (Spark evicts right state the interval
    still needs); the defaults satisfy it for any lookback ≤ 1 hour.

    Columns from both sides are kept with ``l_``/``r_`` prefixes to
    avoid ambiguity (stream-stream joins forbid dropping the join keys
    pre-join).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    # rename BEFORE the watermark: watermark delay metadata rides on the
    # specific attribute it was declared on, so declare it on the final
    # (prefixed) event-time column
    l = left.select(
        [F.col(c).alias(f"l_{c}") for c in left.columns]
    ).withWatermark(f"l_{left_ts}", left_watermark)
    r = right.select(
        [F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withWatermark(f"r_{right_ts}", right_watermark)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            >= F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return l.join(r, cond, how)
