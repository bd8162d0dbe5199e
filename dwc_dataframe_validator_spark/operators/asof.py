"""As-of join — for each left row, the most recent right row at or
before the left row's timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the classic
distributed formulation is union + ordered window:

1. tag both sides and union on (key, ts, side, payload-struct);
2. one window per key ordered by (ts, side) — right rows sort before
   left rows at equal ts, giving inclusive (>=) match semantics;
3. ``last(right_payload, ignorenulls=True)`` over the unbounded-
   preceding frame carries the latest right payload forward;
4. keep left rows, unpack both payloads.

Cost: ONE shuffle on the key (the window), versus a naive
range-condition join which Spark plans as a broadcast nested loop or
cartesian product.  This is the standard trick for event-to-reference
alignment (trades, quotes / purchases, clicks) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the columns of the
    latest ``right`` row with ``right.ts <= left.ts`` for the same key
    (nulls when no such row).  Right columns come back prefixed.

    Ties inside ``right`` on (key, ts) are broken by keeping the row
    that sorts last under the remaining right columns — deterministic,
    and callers needing a specific survivor should pre-deduplicate."""
    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("_lp")
    r_payload = F.struct(*[F.col(c) for c in right.columns]).alias("_rp")
    r_type = right.select(r_payload).schema["_rp"].dataType
    l_type = left.select(l_payload).schema["_lp"].dataType

    lhs = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_payload,
        F.lit(None).cast(r_type).alias("_rp"),
    )
    rhs = right.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_lp"),
        r_payload,
    )
    combined = lhs.unionByName(rhs)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_rp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined.withColumn(
        "_m", F.last("_rp", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.select(*out_cols)
