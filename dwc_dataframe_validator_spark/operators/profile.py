"""Whole-table column profiling in one pass.

The reference computes per-column populated counts for the DwC frame
it validates (``field_populated_counts``, reference breakdown.py:37-51
— folded into the validator's single-pass MetricPlan); this
generalizes that to ANY table as a first-class profiling operator:
one aggregation over the table produces a LONG-format profile row per
column — name, Spark type, non-null count, distinct count — plus the
table row count on every row for ratio math.

Scale shapes (pick per corpus size):

- ``profile_table(df)`` (default, ``exact_distinct=False``) uses
  ``approx_count_distinct`` — ONE aggregation pass, no Expand, HLL
  state per column.  That is the 100 TB path.
- ``exact_distinct=True`` uses ``count(DISTINCT col)`` per column;
  Spark plans multiple distinct aggregates via an Expand operator
  that REPLICATES every input row once per column — cost ×
  |columns|.  Exact is what the SQL oracle replays
  (``table_profile_orders``), so the registry query uses it at
  oracle scale; at 100 TB use the default and accept ±2% distincts.

The wide 1-row aggregate is pivoted to long form with a single
``explode`` of per-column structs — no extra job, no driver loop over
data (only over the SCHEMA, which is driver-resident by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """Per-column profile of ``df`` in one aggregation pass:
    ``(column, dtype, n_rows, n_nonnull, n_distinct)``, one row per
    column, in schema order.  See the module docstring for the
    exact-vs-approx distinct trade-off."""
    if not df.columns:
        raise ValueError("cannot profile a zero-column DataFrame")
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, f in enumerate(df.schema.fields):
        c = F.col(f"`{f.name}`")
        aggs.append(F.count(c).alias(f"_nn{i}"))
        if isinstance(f.dataType, T.MapType):
            # Spark cannot hash/compare maps for distinct aggregation
            # — profile the column's completeness and report NULL
            # distincts rather than failing the whole table
            aggs.append(F.lit(None).cast("long").alias(f"_nd{i}"))
        elif exact_distinct:
            aggs.append(F.count_distinct(c).alias(f"_nd{i}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"_nd{i}"))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("_rows").alias("n_rows"),
            F.col(f"_nn{i}").alias("n_nonnull"),
            F.col(f"_nd{i}").alias("n_distinct"),
        )
        for i, f in enumerate(df.schema.fields)
    ]
    return wide.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")


# --------------------------------------------------------------------------
# mergeable per-slice profiles (KLL/mergeable-state pattern)
# --------------------------------------------------------------------------
#
# ``profile_table`` is one-shot: corpus-lifetime profiling would rescan
# everything each batch.  The mergeable form splits profiling into
# (1) per-slice STATE — exact counters plus a Datasketches HLL binary
# per column — (2) an algebraic MERGE (sums, min/max, hll_union_agg)
# and (3) a read-time ESTIMATE.  Every field except the distinct
# estimate is exactly mergeable: counts and integer sums are
# order-free longs, min/max are semilattice ops, and the HLL register
# merge is the sketch's defining property — so merged-state profiles
# equal the one-shot profile of the concatenated corpus (pytest-pinned
# exactly for the exact fields).
#
# Type discipline for a long-form (one row per column) state:
# - numeric columns: min/max/sum in ``*_num`` doubles (integral sums
#   are exact longs in ``sum_long``; float sums are omitted — a
#   float sum is order-dependent, and a "mergeable" field that changes
#   with partitioning would poison the merged==oneshot contract)
# - everything else: min/max as rendered strings in ``*_str`` (ISO
#   timestamp/date rendering is order-preserving, as is 'false'<'true')
# - map columns: no sketch (unhashable), counters only.

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)


def profile_state(
    df: DataFrame, slice_id: str, lg_k: int = 12
) -> DataFrame:
    """Per-slice mergeable profile state: one row per column —
    ``(slice_id, column, dtype, n_rows, n_nonnull, sum_long, min_num,
    max_num, min_str, max_str, hll)``.  ONE aggregation pass over the
    slice; the HLL binaries are ~2^lg_k bytes per column."""
    if not df.columns:
        raise ValueError("cannot profile a zero-column DataFrame")
    aggs = [F.count(F.lit(1)).alias("_rows")]
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_b = F.lit(None).cast("binary")
    for i, f in enumerate(df.schema.fields):
        c = F.col(f"`{f.name}`")
        aggs.append(F.count(c).alias(f"_nn{i}"))
        numeric = isinstance(f.dataType, _NUMERIC)
        aggs.append(
            (
                F.sum(c).cast("long")
                if isinstance(f.dataType, _INTEGRAL)
                else null_l
            ).alias(f"_sl{i}")
        )
        aggs.append(
            (F.min(c).cast("double") if numeric else null_d).alias(f"_mn{i}")
        )
        aggs.append(
            (F.max(c).cast("double") if numeric else null_d).alias(f"_mx{i}")
        )
        aggs.append(
            (
                null_s if numeric else F.min(c.cast("string"))
            ).alias(f"_ms{i}")
        )
        aggs.append(
            (
                null_s if numeric else F.max(c.cast("string"))
            ).alias(f"_xs{i}")
        )
        if isinstance(f.dataType, T.MapType):
            aggs.append(null_b.alias(f"_h{i}"))
        elif isinstance(f.dataType, _INTEGRAL):
            aggs.append(F.hll_sketch_agg(c, lg_k).alias(f"_h{i}"))
        else:
            # hll_sketch_agg accepts int/long/string/binary only —
            # sketch the rendered string for every other type (the
            # rendering is deterministic, so merged ≡ one-shot holds)
            aggs.append(
                F.hll_sketch_agg(c.cast("string"), lg_k).alias(f"_h{i}")
            )
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(slice_id).alias("slice_id"),
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("_rows").alias("n_rows"),
            F.col(f"_nn{i}").alias("n_nonnull"),
            F.col(f"_sl{i}").alias("sum_long"),
            F.col(f"_mn{i}").alias("min_num"),
            F.col(f"_mx{i}").alias("max_num"),
            F.col(f"_ms{i}").alias("min_str"),
            F.col(f"_xs{i}").alias("max_str"),
            F.col(f"_h{i}").alias("hll"),
        )
        for i, f in enumerate(df.schema.fields)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def histogram_state(
    df: DataFrame, cols: dict, slice_id: str, group_col: str | None = None
) -> DataFrame:
    """Per-slice mergeable NUMERIC HISTOGRAM state — the quantile half
    of the mergeable-profile pattern (``profile_state`` carries
    count/sum/min/max/HLL; this carries the distribution): for each
    ``cols`` entry ``{column: granularity}``, rows ``(slice_id,
    column, g, bucket, n)`` with ``bucket = floor(value / g)``.

    Exactly mergeable (bucket counts are order-free sums) and exactly
    cross-engine: choose ``g`` as a POWER OF TWO so ``value / g`` is
    exact in binary floating point and the floor is bit-identical in
    Spark and DuckDB.  State size is bounded by the value range / g
    per column, independent of row count.  One map-side expand (a
    |cols|-entry struct array) + ONE shuffle on the compact
    (column, bucket) pairs.

    ``group_col`` adds a ``grp`` dimension (per-source / per-domain
    score distributions): state rows become ``(slice_id, grp, column,
    g, bucket, n)`` and the merge/quantile stages key on it
    automatically — state size × |groups|."""
    if not cols:
        raise ValueError("cols must map at least one column to a granularity")
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(float(g)).alias("g"),
            F.floor(F.col(c).cast("double") / F.lit(float(g)))
            .cast("long")
            .alias("bucket"),
        )
        for c, g in cols.items()
    ]
    keys = ["column", "g", "bucket"]
    sel = [F.explode(F.array(*structs)).alias("h")]
    if group_col is not None:
        sel = [F.col(group_col).alias("grp")] + sel
        keys = ["grp"] + keys
    return (
        df.select(*sel)
        .select(*([c for c in ("grp",) if group_col is not None] + ["h.*"]))
        .filter(F.col("bucket").isNotNull())
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit(slice_id).alias("slice_id"), "*")
    )


def merge_histogram_states(states: DataFrame) -> DataFrame:
    """Algebraic merge of per-slice histogram states: sum the bucket
    counts per (column, g, bucket).  Associative/commutative — merged
    histograms equal the one-shot histogram of the concatenated data
    EXACTLY (not approximately: the bucketing is deterministic and
    counts are integers).  A ``grp`` dimension, when present, joins
    the key automatically."""
    keys = [c for c in ("grp", "column", "g", "bucket") if c in states.columns]
    return states.groupBy(*keys).agg(F.sum("n").cast("long").alias("n"))


def histogram_quantiles(
    hist: DataFrame, qs: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Quantile estimates from a (merged) histogram: for each q, the
    first bucket whose cumulative count reaches ``max(1, ceil(q ·
    total))``, reported with its value bounds ``[bucket·g,
    (bucket+1)·g)`` — the true q-quantile lies within the bucket, so
    the estimate error is bounded by ``g`` by construction.

    Deterministic integer/double arithmetic end-to-end (the rank rule
    is pinned), so a DuckDB oracle replays the selected buckets
    bit-for-bit.  The cumulative window is partitioned per column over
    BUCKET rows (bounded by range/g), never data rows."""
    part = [c for c in ("grp", "column", "g") if c in hist.columns]
    w = (
        Window.partitionBy(*part)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # total via a second window over the same partitioning — no
    # separate aggregate+join, the exchange is shared
    w_all = Window.partitionBy(*part)
    cum = hist.withColumn("_cum", F.sum("n").over(w)).withColumn(
        "_total", F.sum("n").over(w_all)
    )
    # ONE pass for every q: broadcast the literal q set against the
    # bounded bucket frame instead of a union of per-q branches (the
    # union form re-ran the whole cum pipeline per quantile)
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    rank = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("q") * F.col("_total").cast("double")).cast("long"),
    )
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("_cum") >= rank)
        .groupBy(*part, "q")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            *part,
            "q",
            "bucket",
            (F.col("bucket").cast("double") * F.col("g")).alias("value_lo"),
            ((F.col("bucket") + 1).cast("double") * F.col("g")).alias(
                "value_hi"
            ),
        )
    )


def histogram_tv_distance(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXACT total-variation distance between two histogram states —
    the drift alert: ``TV = ½ Σ_b |p_b − q_b|`` per (grp?, column, g),
    computed with an INTEGER numerator ``Σ_b |n_a·N_b − n_b·N_a|``
    (decimal(38,0) — exact to counts ~10^18 a side) so the only
    float is one final division with pinned operand order; a DuckDB
    oracle replays it in HUGEINT bit-for-bit.  TV ∈ [0, 1]: 0 =
    identical distributions, 1 = disjoint support.

    Inputs are (merged) ``histogram_state`` frames over the same
    granularity; buckets missing on one side count 0.  Group keys join
    NULL-safely (a NULL grp — e.g. the NULL-domain bucket of
    ``operators/web.py`` — is a real group, not droppable), and a
    group present on only ONE side is reported with ``tv = 1.0``
    (disjoint support — a vanished or brand-new source is the loudest
    drift there is, ``tv_num`` is 0/undefined there by convention).
    Cost: one full-outer join on the bounded bucket keys + a window
    and an aggregate sharing that partitioning — never touches data
    rows."""
    keys = [c for c in ("grp", "column", "g") if c in a.columns]
    if [c for c in ("grp", "column", "g") if c in b.columns] != keys:
        raise ValueError("histogram key shapes differ between sides")

    # dataframe aliases: a and b may share lineage (drift of a slice
    # against itself / a superset), which breaks column-object
    # resolution in a self-join
    an = a.select(*keys, "bucket", F.col("n").alias("_na")).alias("_tvl")
    bn = b.select(*keys, "bucket", F.col("n").alias("_nb")).alias("_tvr")
    cond = None
    for k in [*keys, "bucket"]:
        c = F.col(f"_tvl.{k}").eqNullSafe(F.col(f"_tvr.{k}"))
        cond = c if cond is None else cond & c
    j = an.join(bn, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"_tvl.{k}"), F.col(f"_tvr.{k}")).alias(k)
            for k in keys
        ],
        F.coalesce(F.col("_tvl._na"), F.lit(0)).cast("long").alias("_na"),
        F.coalesce(F.col("_tvr._nb"), F.lit(0)).cast("long").alias("_nb"),
    )
    # group totals from the joined frame itself via a window over the
    # key partitioning (shared exchange with the final groupBy; NULL
    # and one-sided groups handled natively) — replaces two per-side
    # aggregate+join legs that dropped both
    w_keys = Window.partitionBy(*keys)
    j = j.withColumn("_ta", F.sum("_na").over(w_keys)).withColumn(
        "_tb", F.sum("_nb").over(w_keys)
    )
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("_na").cast(dec) * F.col("_tb").cast(dec)
        - F.col("_nb").cast(dec) * F.col("_ta").cast(dec)
    )
    return (
        # totals are constant within a key group — grouping on them is
        # free and avoids a nondeterministic first()
        j.groupBy(*keys, "_ta", "_tb")
        .agg(F.sum(num).cast(dec).alias("tv_num"))
        .withColumnRenamed("_ta", "n_a")
        .withColumnRenamed("_tb", "n_b")
        .select(
            *keys,
            "tv_num",
            "n_a",
            "n_b",
            F.when(
                (F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(1.0)
            )
            .otherwise(
                F.col("tv_num").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                )
            )
            .alias("tv"),
        )
    )


def merge_profile_states(states: DataFrame) -> DataFrame:
    """Algebraic merge of any number of per-slice states into one
    state row per column (``slice_id`` becomes the slice count).
    Associative and commutative — merge order, partitioning and
    incremental re-merges cannot change the result (HLL register
    union included)."""
    return states.groupBy("column", "dtype").agg(
        F.count_distinct("slice_id").alias("n_slices"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("n_nonnull").cast("long").alias("n_nonnull"),
        F.sum("sum_long").cast("long").alias("sum_long"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
        F.min("min_str").alias("min_str"),
        F.max("max_str").alias("max_str"),
        F.hll_union_agg("hll", True).alias("hll"),
    )


def profile_estimate(merged: DataFrame) -> DataFrame:
    """Read-time view of a merged state: the exact counters plus the
    HLL distinct estimate (NULL for sketch-less map columns)."""
    return merged.select(
        "column",
        "dtype",
        "n_slices",
        "n_rows",
        "n_nonnull",
        "sum_long",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
        F.when(
            F.col("hll").isNotNull(),
            F.hll_sketch_estimate("hll"),
        ).alias("n_distinct_approx"),
    )
