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
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the columns of the
    latest ``right`` row with ``right.ts <= left.ts`` for the same key
    (nulls when no such row).  Right columns come back prefixed.

    Ties inside ``right`` on (key, ts) are broken by the extra
    ``tiebreak`` columns (right-side column names, ascending): the row
    sorting last wins.  With no tiebreak, which duplicate survives is
    unspecified — callers needing a specific survivor should either
    pass ``tiebreak`` or pre-deduplicate.  All key/ts/tiebreak columns
    must be of orderable types; payload columns may be anything
    (maps, binaries) since they are never sorted on."""
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
    # Sort only on scalar columns — never the full payload struct, which
    # could carry unorderable types (maps) and widens the sort for nothing.
    # Tiebreak fields are read out of _rp (null on the left side, where
    # intra-ts order is irrelevant: left rows all sort after right rows).
    order = [F.col("_ts"), F.col("_side")]
    order += [F.col(f"_rp.{c}") for c in (tiebreak or [])]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
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
