"""Bounded-state quantile profiles — the 100 TB twins of the exact
``percentile`` family.

The exact queries (``numeric_profile``, ``quantiles_by_event_type``,
``value_deciles``, ``numeric_outliers_iqr`` in the registry) use Spark's
sort-based ``percentile``, whose aggregation state is EVERY value in the
group — deliberate there (deterministic, oracle-checkable against
DuckDB ``quantile_cont``), but unbounded at scale: a 100 TB column
cannot be buffered per aggregation state.

These twins swap in ``approx_percentile`` (Greenwald-Khanna sketch,
state O(accuracy·log n) regardless of input size) and keep the exact
same downstream plan shape.  The guarantee is on RANK, not value: the
returned value's true rank r satisfies |r/n − q| ≤ 1/accuracy — pinned
by tests/test_quantiles.py.  Profiling a column users reach for this
first; the exact forms remain for small groups and the oracle gate.

Every function here is a drop-in for its exact sibling: same output
schema, same single-aggregate / broadcast-bounds plan, only the
percentile primitive differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rank-error knob: |true_rank/n − q| ≤ 1/DEFAULT_ACCURACY.  10000 is
# Spark's own default — ~0.01% rank error for a few KB of sketch state.
DEFAULT_ACCURACY = 10000


def _approx(col: str, qs: list[float], accuracy: int):
    arr = ", ".join(map(str, qs))
    return F.expr(f"approx_percentile({col}, array({arr}), {accuracy})")


def numeric_profile_approx(
    df: DataFrame, col: str, accuracy: int = DEFAULT_ACCURACY
) -> DataFrame:
    """count/min/max/sum + approximate quartiles in ONE aggregate —
    same single-pass shape as the exact ``numeric_profile``, but the
    percentile state is a fixed-size sketch instead of the sorted
    column."""
    p = _approx(col, [0.25, 0.5, 0.75], accuracy)
    return df.agg(
        F.count(col).alias("cnt"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.sum(F.col(col).cast("decimal(18,4)")).cast("double").alias("total"),
        p.getItem(0).cast("double").alias("p25"),
        p.getItem(1).cast("double").alias("p50"),
        p.getItem(2).cast("double").alias("p75"),
    )


def grouped_quantiles_approx(
    df: DataFrame,
    group_col: str,
    col: str,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Per-group approximate quartiles — one hash-aggregate shuffle on
    the group key, per-group state bounded by the sketch size (the
    exact form's state is the whole group, fatal for a skewed key)."""
    p = _approx(col, [0.25, 0.5, 0.75], accuracy)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        p.getItem(0).cast("double").alias("q1"),
        p.getItem(1).cast("double").alias("q2"),
        p.getItem(2).cast("double").alias("q3"),
    )


def value_deciles_approx(
    df: DataFrame, col: str, accuracy: int = DEFAULT_ACCURACY
) -> DataFrame:
    """Decile binning with sketched boundaries: one approx-percentile
    aggregate → broadcast bounds → map-side bucket assignment → one
    groupBy.  Identical plan to the exact ``value_deciles`` (still no
    global ntile sort); only the boundary source changes."""
    qs = [i / 10 for i in range(1, 10)]
    p = _approx(col, qs, accuracy)
    bounds = df.agg(
        *[p.getItem(i).cast("double").alias(f"b{i}") for i in range(9)]
    )
    decile = (
        sum((F.col(col) > F.col(f"b{i}")).cast("int") for i in range(9))
        + F.lit(1)
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(F.col(col).isNotNull())
        .select(F.col(col).alias("value"), decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


def iqr_outliers_approx(
    df: DataFrame, col: str, accuracy: int = DEFAULT_ACCURACY
) -> DataFrame:
    """Tukey-fence outliers from sketched quartiles: bounds aggregate →
    broadcast into the second scan's map-side filter — the same
    two-scan-by-necessity shape as the exact ``numeric_outliers_iqr``."""
    p = _approx(col, [0.25, 0.75], accuracy)
    bounds = (
        df.agg(
            p.getItem(0).cast("double").alias("q1"),
            p.getItem(1).cast("double").alias("q3"),
        )
        .select(
            (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
            (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
        )
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter((F.col(col) < F.col("lo")) | (F.col(col) > F.col("hi")))
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.min(col).alias("min_out"),
            F.max(col).alias("max_out"),
        )
    )
