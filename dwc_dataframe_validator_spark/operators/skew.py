"""Skew mitigation: salted two-stage aggregation and salted joins.

AQE's skew-join handles most storage-level skew at runtime; these
helpers cover the cases AQE cannot re-plan:

- ``salted_groupby_count``: a groupBy on a heavily-skewed key sends a
  hot key's entire mass through one reducer.  Salting splits each key
  into ``salt_buckets`` sub-groups (stage 1, spreads the hot key over
  the cluster), then merges the partials (stage 2, tiny input —
  |keys| × salt rows).  Total shuffle volume is unchanged; the maximum
  single-reducer load drops by the salt factor.
- ``salted_join``: replicate the small side per salt value and salt the
  big side's key, so one hot key fans across ``salt_buckets`` tasks.

The salt column is ``pmod(hash(whole row id-ish cols), salt)`` — any
cheap per-row value works; ``F.rand`` is avoided to keep plans
deterministic and resumable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 16,
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """count() per key group via two-stage salted aggregation.

    ``salt_source``: columns whose hash spreads rows across salt
    buckets (defaults to all non-key columns; must vary within a key
    group for the salt to spread anything)."""
    src = salt_source or [c for c in df.columns if c not in keys]
    if not src:
        raise ValueError("salt_source must name at least one column")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial").cast("long").alias("cnt"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 16,
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated ``salt_buckets``× — use when one key dominates the big
    side and the small side is too large to broadcast outright."""
    src = salt_source or [c for c in big.columns if c != big_key]
    if not src:
        raise ValueError("salt_source must name at least one column")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt_buckets))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = b.join(s, (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]))
    return out.drop("_salt")
