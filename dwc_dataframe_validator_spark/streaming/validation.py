"""Structured Streaming validation (SURVEY.md §2.9 north-star).

The batch engine's check expressions (functions/expressions.py) are
plain Catalyst aggregates, so they compose directly into streaming
windowed aggregations — same semantics, incremental execution.  The
reference is batch-only; these operators define the streaming surface:
watermarked tumbling-window invalid/valid counts and streaming dedup.

Scale notes: tumbling windows + watermark keep state bounded (one
aggregate row per (window, group) until the watermark passes);
streaming dedup state is bounded by ``dropDuplicatesWithinWatermark``.
Output mode 'update' emits per-trigger deltas; 'append' waits for
window close (watermark) — choose per sink semantics.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_check_counts(
    stream: DataFrame,
    checks: Mapping[str, Column],
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = "2 hours",
    group_cols: tuple[str, ...] = (),
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) window counts of rows
    passing each boolean check, plus the window total — the streaming
    twin of the batch MetricPlan.

    ``checks`` maps metric name → boolean row predicate (build them
    from functions.expressions: in_range, vocab_member, any_populated).
    Works identically on a batch DataFrame (same code path, full-table
    'stream') — that equivalence is what the DuckDB oracle checks.

    ``watermark=None`` means the stream is ALREADY watermarked
    upstream (chained stateful pipelines, e.g. after
    ``streaming_dedup`` — Spark disallows redefining a watermark).
    """
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for name, predicate in checks.items():
        aggs.append(F.count(F.when(predicate, 1)).alias(name))
    src = stream
    if stream.isStreaming and watermark is not None:
        src = stream.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return src.groupBy(
        win.start.alias("w_start"),
        *[F.col(c) for c in group_cols],
    ).agg(*aggs)


def session_check_counts(
    stream: DataFrame,
    checks: Mapping[str, Column],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Session-window (gap-based) check counts per group — sessions
    close after ``gap`` of inactivity.  State per open session only;
    watermark bounds it on streams.  ``watermark=None``: stream is
    already watermarked upstream (see ``windowed_check_counts``)."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for name, predicate in checks.items():
        aggs.append(F.count(F.when(predicate, 1)).alias(name))
    src = stream
    if stream.isStreaming and watermark is not None:
        src = stream.withWatermark(ts_col, watermark)
    w = F.session_window(F.col(ts_col), gap)
    return src.groupBy(
        w, *[F.col(c) for c in group_cols]
    ).agg(*aggs).select(
        F.col("session_window.start").alias("s_start"),
        F.col("session_window.end").alias("s_end"),
        *[F.col(c) for c in group_cols],
        "cnt",
        *[F.col(name) for name in checks.keys()],
    )


def streaming_dedup(
    stream: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "2 hours",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup on key columns with bounded state.

    ``dropDuplicatesWithinWatermark`` expires key state once the
    watermark passes (bounded memory — the only safe form for an
    unbounded key domain); plain ``dropDuplicates`` keeps state forever
    and is only for finite key domains."""
    src = stream.withWatermark(ts_col, watermark)
    if within_watermark:
        return src.dropDuplicatesWithinWatermark(list(keys))
    return src.dropDuplicates(list(keys))
