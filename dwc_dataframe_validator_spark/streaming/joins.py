"""Stream-stream joins (SURVEY.md §2.9 north-star; reference is
batch-only).

Spark's stream-stream join buffers both sides in state; unbounded
buffering is the failure mode at scale, so every join here REQUIRES
watermarks on both sides plus an event-time range condition — that
pair is exactly what lets the engine evict state (a buffered left row
can be dropped once the right watermark passes ``left_ts + upper``).

The same function works on two batch DataFrames (identical code path,
no watermark) — batch≡stream equivalence is what the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Key-equal event-time interval join: match right rows with
    ``left_ts + lower <= right_ts <= left_ts + upper`` for the same
    ``key`` — the click→purchase attribution shape.

    Streaming: both sides watermarked; state for a (key, ts) pair is
    evicted when the opposite watermark clears its interval, so state
    size is O(rate × (upper + watermark)), independent of stream
    length.  Batch: the same range condition becomes an ordinary
    equi-join with a post-join filter — one shuffle on ``key``.
    Outer variants (``how='leftOuter'``...) emit the unmatched row
    only at watermark expiry, per Spark semantics.
    """
    l_ts, r_ts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (r_ts >= l_ts + F.expr(f"INTERVAL {lower}"))
        & (r_ts <= l_ts + F.expr(f"INTERVAL {upper}"))
    )
    lhs, rhs = left, right
    if left.isStreaming or right.isStreaming:
        lhs = left.withWatermark(left_ts, watermark)
        rhs = right.withWatermark(right_ts, watermark)
    return lhs.alias("l").join(rhs.alias("r"), cond, how)
