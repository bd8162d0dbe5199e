"""Range (interval-containment) join via bucketing.

``points JOIN intervals ON point.ts BETWEEN start AND end`` has no
equi-key, so Spark plans a broadcast nested loop (or cartesian) —
quadratic at scale.  The bucketed formulation makes it an equi-join:

1. quantize time into fixed buckets of ``bucket_width``;
2. replicate each interval into every bucket it overlaps
   (``explode(sequence(...))`` — replication factor is
   interval_length / bucket_width, bounded and chosen by the caller);
3. equi-join points to interval replicas on (key, bucket) — each point
   has ONE bucket, so it meets each overlapping interval exactly once,
   no post-join dedup needed;
4. exact ``BETWEEN`` filter inside the same stage discards
   bucket-grazing false candidates.

Pick ``bucket_width`` near the median interval length: too small →
heavy interval replication; too large → many false candidates per
bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    bucket_width: str = "1 hour",
) -> DataFrame:
    """Inner join of point rows to every interval containing them
    (inclusive bounds), optionally also matching on ``key``.  Output:
    all point columns + all interval columns (caller disambiguates
    names beforehand)."""
    width = F.expr(f"INTERVAL {bucket_width}")
    zero = F.lit("1970-01-01 00:00:00").cast("timestamp")
    width_us = F.unix_micros(zero + width) - F.unix_micros(zero)

    p = points.withColumn(
        "_b", F.floor(F.unix_micros(F.col(ts_col)) / width_us)
    )
    # Drop malformed intervals (end < start) BEFORE the explode:
    # sequence(hi, lo) generates a DESCENDING range, so a garbage
    # interval would be replicated into every bucket it "spans"
    # backwards — the BETWEEN filter discards the rows, but only after
    # paying the fan-out.
    i = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / width_us),
                F.floor(F.unix_micros(F.col(end_col)) / width_us),
            )
        ),
    )
    on = ["_b", key] if key else ["_b"]
    out = p.join(i, on=on).filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return out.drop("_b")
