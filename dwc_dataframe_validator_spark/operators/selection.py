"""Token-budget corpus selection: fill a training-token budget with
the highest-quality documents.

The final step of a quality-driven data pipeline ("take the best
documents until the budget is full" — the selection rule behind
quality-classifier filtering at a fixed token count) is a PREFIX of
the corpus in (score DESC, id ASC) order whose running token sum
stays within the budget.  Naively that is a GLOBAL SORT plus a
running-sum window over the whole corpus — a single-partition
order-by at 100 TB, the one plan shape this engine bans.

Reference parity: none — selection extends the LLM-pipeline family
(SURVEY.md "beyond the reference" brief).

Two-phase algorithm (no global sort):

1. **Coarse score buckets** ``b = floor(score / granularity)`` — one
   map-side expression + one groupBy: per-bucket token sums and row
   counts.  The bucket table is BOUNDED by the score-range contract
   (score_range / granularity rows; quality logits span a few units,
   so the default granularity keeps it in the low thousands) and is
   collected to the driver — the same bounded-collect contract as a
   broadcast side.  The contract is ENFORCED, not assumed: the
   collect is capped at ``max_buckets + 1`` rows and a wider range /
   tinier granularity raises instead of OOMing the driver.
2. **Driver prefix** over buckets sorted descending: buckets whose
   cumulative sum fits entirely are included WHOLESALE (a map-side
   filter ``b > b*`` — no sort, no shuffle); the single BOUNDARY
   bucket pays the exact ordered running-sum window with the
   remaining budget.

Floor-bucketing is monotone in score, so a document in a higher
bucket always precedes one in a lower bucket in the exact order, and
equal scores share a bucket — the two-phase result is therefore
EXACTLY the naive prefix, which is what the DuckDB oracle computes
(`token_budget_selection`).

**Degenerate distributions** (a point-mass score, or a granularity
coarser than the spread) concentrate the corpus in ONE boundary
bucket, turning phase 2 into the global window the design bans.  The
phase-1 histogram reveals that before any window runs, so when the
boundary bucket exceeds ``boundary_cap`` rows the operator recurses
ONE level with the same histogram-prefix trick:

- scores vary inside the bucket → re-bucket 4096× finer and prefix
  again (monotone in score, so still exact);
- a true point mass (every score equal) orders by ``id`` ASC inside
  the bucket, and floor-bucketing the NUMERIC id range is monotone in
  that order — so the same wholesale-prefix + one-sub-bucket-window
  shape applies to the tie-break key.  A non-numeric id on a
  too-large point mass raises with the measured mass instead of
  silently sorting it on one partition.

Rows with a NULL score or NULL token count are excluded up front:
they can never be part of the (score DESC) prefix, matching the
naive oracle's NULLS-LAST ordering, and a NULL would otherwise
poison both the driver prefix arithmetic and the running sum.

``select_token_budget_by_group`` vectorizes the same two phases over
a per-group budget table, with the boundary window PARTITIONED BY
GROUP and (since round 8) the same one-level score refinement for
any group whose boundary bucket exceeds ``boundary_cap`` — see its
docstring for the per-group shapes and the point-mass escape hatch.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bounded_collect(df: DataFrame, cap: int) -> list:
    """Collect at most ``cap`` rows to the driver WITHOUT the
    single-partition ``GlobalLimit`` exchange a ``.limit(cap)`` before
    ``.collect()`` forces (the r7 bench regression on
    ``token_budget_selection``): stream partitions through
    ``toLocalIterator`` and stop pulling after ``cap`` rows — same
    driver-memory bound, no extra exchange in the plan."""
    return list(
        itertools.islice(df.toLocalIterator(prefetchPartitions=True), cap)
    )


def _driver_prefix(hist, budget, bucket_key, descending):
    """The shared phase-2 arithmetic: walk buckets in selection order,
    include whole buckets while they fit, return (boundary bucket
    value, boundary row count, remaining budget).  Boundary None means
    every bucket fits."""
    hist = sorted(hist, key=lambda r: r[bucket_key], reverse=descending)
    running = 0
    for row in hist:
        if running + row["_toks"] <= budget:
            running += row["_toks"]
        else:
            return row[bucket_key], row["_n"], budget - running
    return None, 0, budget - running


def select_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    tokens_col: str,
    id_col: str = "doc_id",
    granularity: float = 0.001,
    max_buckets: int = 100_000,
    boundary_cap: int = 1_000_000,
) -> DataFrame:
    """The maximal prefix of ``df`` in (``score_col`` DESC,
    ``id_col`` ASC) order with cumulative ``tokens_col`` ≤
    ``budget``.  See the module docstring for the two-phase shape and
    the degenerate-distribution guard; returns the selected rows with
    their original columns.  Rows with NULL score or NULL tokens are
    never selected."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    valid = df.filter(
        F.col(score_col).isNotNull() & F.col(tokens_col).isNotNull()
    )
    b = F.floor(F.col(score_col) / F.lit(float(granularity)))
    bucketed = valid.withColumn("_b", b)
    hist = _bounded_collect(
        bucketed.groupBy("_b").agg(
            F.sum(F.col(tokens_col)).alias("_toks"),
            F.count(F.lit(1)).alias("_n"),
        ),
        max_buckets + 1,  # driver holds at most this many rows
    )
    if len(hist) > max_buckets:
        raise ValueError(
            f"score bucketing produced more than max_buckets="
            f"{max_buckets} buckets (score range / granularity="
            f"{granularity} too wide) — coarsen granularity or raise "
            "max_buckets; refusing an unbounded driver collect"
        )
    boundary, boundary_n, remaining = _driver_prefix(
        hist, budget, "_b", descending=True
    )
    if boundary is None:
        # every bucket fits: the whole (non-null) frame is selected
        return bucketed.drop("_b")

    full = bucketed.filter(F.col("_b") > F.lit(boundary))
    boundary_rows = bucketed.filter(F.col("_b") == F.lit(boundary))
    extra_full = None

    if boundary_n > boundary_cap:
        # one refinement level before the window: same histogram-
        # prefix trick over a finer monotone key inside the bucket
        stats = boundary_rows.agg(
            F.min(score_col).alias("smin"),
            F.max(score_col).alias("smax"),
            F.min(id_col).alias("imin"),
            F.max(id_col).alias("imax"),
        ).collect()[0]
        if stats["smin"] < stats["smax"]:
            g2 = float(granularity) / 4096.0
            # floor(score/g2) is computed independently of the coarse
            # floor(score/granularity), so IEEE rounding at bucket
            # edges can land a row's sub-bucket just outside the
            # nominal [boundary*4096, (boundary+1)*4096) span.  Clamp
            # to that span: clamping a monotone key is monotone (ties
            # still share a sub-bucket), so exactness is preserved,
            # and the histogram is ≤ 4096 rows BY CONSTRUCTION — no
            # limit that could silently drop buckets.
            lo, hi = boundary * 4096, (boundary + 1) * 4096 - 1
            b2 = F.greatest(
                F.lit(lo),
                F.least(F.lit(hi), F.floor(F.col(score_col) / F.lit(g2))),
            )
            sub = boundary_rows.withColumn("_b2", b2)
            hist2 = _bounded_collect(
                sub.groupBy("_b2").agg(
                    F.sum(F.col(tokens_col)).alias("_toks"),
                    F.count(F.lit(1)).alias("_n"),
                ),
                4097,
            )
            if len(hist2) > 4096:  # impossible given the clamp
                raise AssertionError(
                    "clamped sub-bucketing produced >4096 buckets"
                )
            boundary2, _, remaining = _driver_prefix(
                hist2, remaining, "_b2", descending=True
            )
            # boundary2 cannot be None: the coarse bucket didn't fit
            extra_full = sub.filter(F.col("_b2") > F.lit(boundary2)).drop("_b2")
            boundary_rows = sub.filter(F.col("_b2") == F.lit(boundary2)).drop(
                "_b2"
            )
        else:
            # true point mass: selection order inside the bucket is
            # id ASC — range-bucket the numeric id span (monotone)
            id_type = dict(df.dtypes).get(id_col, "")
            if not isinstance(
                df.schema[id_col].dataType,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.FloatType, T.DoubleType, T.DecimalType),
            ):
                raise ValueError(
                    f"boundary score bucket holds {boundary_n} rows "
                    f"(> boundary_cap={boundary_cap}) at a single score "
                    f"value, and id column {id_col!r} ({id_type}) is not "
                    "numeric — cannot range-refine the tie-break; raise "
                    "boundary_cap or provide a numeric id"
                )
            imin, imax = stats["imin"], stats["imax"]
            g_id = max(1, math.ceil((int(imax) - int(imin) + 1) / 4096))
            # integer DIV keeps the bucket id exact (the `/` operator
            # promotes longs to double and can mis-round near 2^53);
            # clamp to [0, 4095] for the same monotone-safety reason
            # as the score refinement — the histogram is then bounded
            # by construction, no silent-drop limit.
            b2 = F.greatest(
                F.lit(0),
                F.least(
                    F.lit(4095),
                    F.expr(
                        f"(cast(`{id_col}` as bigint) - {int(imin)}L) "
                        f"div {g_id}L"
                    ),
                ),
            )
            sub = boundary_rows.withColumn("_b2", b2)
            hist2 = _bounded_collect(
                sub.groupBy("_b2").agg(
                    F.sum(F.col(tokens_col)).alias("_toks"),
                    F.count(F.lit(1)).alias("_n"),
                ),
                4097,
            )
            if len(hist2) > 4096:  # impossible given the clamp
                raise AssertionError(
                    "clamped id sub-bucketing produced >4096 buckets"
                )
            boundary2, _, remaining = _driver_prefix(
                hist2, remaining, "_b2", descending=False  # id ASC
            )
            extra_full = sub.filter(F.col("_b2") < F.lit(boundary2)).drop("_b2")
            boundary_rows = sub.filter(F.col("_b2") == F.lit(boundary2)).drop(
                "_b2"
            )

    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    partial = (
        boundary_rows.withColumn("_cum", F.sum(F.col(tokens_col)).over(w))
        .filter(F.col("_cum") <= F.lit(remaining))
        .drop("_cum")
    )
    out = full.unionByName(partial)
    if extra_full is not None:
        out = out.unionByName(extra_full)
    return out.drop("_b")


def select_token_budget_by_group(
    df: DataFrame,
    budgets: dict,
    score_col: str,
    tokens_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    granularity: float = 0.001,
    max_buckets: int = 100_000,
    boundary_cap: int = 1_000_000,
) -> DataFrame:
    """Mixture construction: fill a SEPARATE token budget per group
    (source/domain/language) with each group's best documents — the
    "2:1 web:code at fixed token counts" step of corpus assembly.
    For every group g in ``budgets``, the result is the maximal
    (``score_col`` DESC, ``id_col`` ASC) prefix of g's rows with
    cumulative ``tokens_col`` ≤ ``budgets[g]``; groups not in
    ``budgets`` are dropped (budget 0).

    Same two-phase shape as ``select_token_budget``, vectorized over
    groups: ONE histogram on (group, bucket) — bounded by
    ``max_buckets`` total collected rows, enforced — a driver prefix
    per group, then a single plan where whole buckets enter through a
    broadcast-joined map-side filter and only each group's boundary
    bucket pays the running-sum window.  The window PARTITIONS BY
    GROUP, so even the boundary work distributes across the cluster —
    there is no single-partition sort anywhere (one Sort node, keyed
    (group, score, id), pinned in tests).  Rows with NULL score or
    tokens are never selected (matching the oracle's NULLS-LAST
    order).

    A group whose boundary bucket exceeds ``boundary_cap`` rows (a
    dominant group with near-point-mass scores — a classifier that
    emits 0.0 for half the corpus) would otherwise funnel its whole
    membership into that group's single window partition.  Such
    groups are REFINED one level before the window, exactly like
    ``select_token_budget``: re-bucket 4096× finer (clamped to the
    coarse bucket's span — monotone, so still exact), prefix the
    sub-histogram driver-side, and let only the sub-boundary bucket
    pay the window.  All refined groups share ONE extra bounded
    histogram job and ONE plan.  A TRUE point mass inside a group
    (every score identical — one sub-bucket) cannot be score-refined
    and raises with the measured mass; select that group separately
    with ``select_token_budget``, whose id-range refinement handles
    the tie-break key."""
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget must be >= 0 for group {g!r}, got {b}")
    spark = df.sparkSession
    valid = df.filter(
        F.col(score_col).isNotNull()
        & F.col(tokens_col).isNotNull()
        & F.col(group_col).isin(list(budgets))
    )
    bucketed = valid.withColumn(
        "_b", F.floor(F.col(score_col) / F.lit(float(granularity)))
    )
    hist = _bounded_collect(
        bucketed.groupBy(group_col, "_b").agg(
            F.sum(F.col(tokens_col)).alias("_toks"),
            F.count(F.lit(1)).alias("_n"),
        ),
        max_buckets + 1,  # driver holds at most this many rows
    )
    if len(hist) > max_buckets:
        raise ValueError(
            f"(group, bucket) histogram exceeded max_buckets="
            f"{max_buckets} (groups × score range / granularity too "
            "wide) — coarsen granularity or raise max_buckets; "
            "refusing an unbounded driver collect"
        )
    by_group: dict = {}
    for row in hist:
        by_group.setdefault(row[group_col], []).append(row)
    bounds = []
    remaining_by_group: dict = {}
    for g, rows in by_group.items():
        boundary, boundary_n, remaining = _driver_prefix(
            rows, budgets[g], "_b", descending=True
        )
        remaining_by_group[g] = remaining
        refine = boundary is not None and boundary_n > boundary_cap
        lo = (int(boundary) * 4096) if refine else 0
        # fits_all: every bucket of g fits -> no boundary window at all
        # _boundary is a Spark floor() result (integral by contract);
        # _remaining is budget - sum(tokens) which is a FLOAT whenever
        # the tokens column (or the budget) is floating — ship it as
        # double so createDataFrame never type-errors, and cast the
        # values explicitly (Spark's schema verifier rejects a Python
        # int in a double field).
        bounds.append(
            (g, int(boundary) if boundary is not None else 0,
             float(remaining), boundary is None,
             refine, lo, lo + 4095)
        )
    if not bounds:
        return bucketed.drop("_b")
    gtype = dict(df.dtypes)[group_col]
    bnd = spark.createDataFrame(
        bounds, f"{group_col} {gtype}, "
                "_boundary long, _remaining double, _fits_all boolean, "
                "_refine boolean, _lo long, _hi long"
    )
    joined = bucketed.join(F.broadcast(bnd), group_col)
    full = joined.filter(
        F.col("_fits_all") | (F.col("_b") > F.col("_boundary"))
    )
    boundary_rows = joined.filter(
        ~F.col("_fits_all") & (F.col("_b") == F.col("_boundary"))
    )
    drop = ["_b", "_boundary", "_remaining", "_fits_all",
            "_refine", "_lo", "_hi"]
    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )

    if not any(b[4] for b in bounds):
        partial = (
            boundary_rows.withColumn("_cum", F.sum(F.col(tokens_col)).over(w))
            .filter(F.col("_cum") <= F.col("_remaining"))
            .drop("_cum")
        )
        return full.unionByName(partial).drop(*drop)

    # --- one refinement level for every over-cap group at once ---
    g2 = float(granularity) / 4096.0
    # clamp to the group's own coarse-bucket span (broadcast columns):
    # monotone, ties co-bucketed — same exactness argument as the
    # flat version's refinement
    b2 = F.greatest(
        F.col("_lo"),
        F.least(F.col("_hi"), F.floor(F.col(score_col) / F.lit(g2))),
    )
    unref_rows = boundary_rows.filter(~F.col("_refine"))
    sub = boundary_rows.filter(F.col("_refine")).withColumn("_b2", b2)
    hist2 = _bounded_collect(
        sub.groupBy(group_col, "_b2").agg(
            F.sum(F.col(tokens_col)).alias("_toks"),
            F.count(F.lit(1)).alias("_n"),
        ),
        max_buckets + 1,  # ≤ 4096 × |refined groups|, and capped
    )
    if len(hist2) > max_buckets:
        raise ValueError(
            f"(group, sub-bucket) refinement histogram exceeded "
            f"max_buckets={max_buckets} — raise max_buckets or "
            "boundary_cap; refusing an unbounded driver collect"
        )
    by2: dict = {}
    for row in hist2:
        by2.setdefault(row[group_col], []).append(row)
    bounds2 = []
    for g, rows2 in by2.items():
        if len(rows2) == 1 and rows2[0]["_n"] > boundary_cap:
            raise ValueError(
                f"group {g!r} holds {rows2[0]['_n']} rows "
                f"(> boundary_cap={boundary_cap}) at a single score "
                "value — score refinement cannot split a point mass; "
                "select this group separately with select_token_budget "
                "(id-range refinement) or raise boundary_cap"
            )
        boundary2, _, rem2 = _driver_prefix(
            rows2, remaining_by_group[g], "_b2", descending=True
        )
        # the chosen SUB-boundary bucket is what the window actually
        # pays for — a near-point-mass score can still concentrate the
        # coarse bucket into one sub-bucket even when len(rows2) > 1,
        # so gate on the selected bucket's row count, not the shape
        if boundary2 is not None:
            n_at_boundary = next(
                (r["_n"] for r in rows2 if r["_b2"] == boundary2), 0
            )
            if n_at_boundary > boundary_cap:
                raise ValueError(
                    f"group {g!r}: refined sub-boundary bucket holds "
                    f"{n_at_boundary} rows (> boundary_cap="
                    f"{boundary_cap}) — near-point-mass scores; select "
                    "this group separately with select_token_budget "
                    "(id-range refinement) or raise boundary_cap"
                )
        # boundary2 is USUALLY non-None (the coarse bucket didn't
        # fit), but with a floating tokens column the sub-bucket sums
        # are independently rounded Spark doubles accumulated in a
        # different order than phase 1 — a few ULPs can let every
        # sub-bucket fit.  That just means the whole bucket is
        # selected: flag fits-all instead of crashing on int(None).
        bounds2.append(
            (g, int(boundary2) if boundary2 is not None else 0,
             float(rem2), boundary2 is None)
        )
    bnd2 = spark.createDataFrame(
        bounds2, f"{group_col} {gtype}, _boundary2 long, "
                 "_remaining2 double, _fits_all2 boolean"
    )
    sub2 = sub.join(F.broadcast(bnd2), group_col)
    extra_full = sub2.filter(
        F.col("_fits_all2") | (F.col("_b2") > F.col("_boundary2"))
    ).drop("_b2", "_boundary2", "_remaining2", "_fits_all2")
    refined_window = (
        sub2.filter(~F.col("_fits_all2") & (F.col("_b2") == F.col("_boundary2")))
        .withColumn("_rem", F.col("_remaining2"))
        .drop("_b2", "_boundary2", "_remaining2", "_fits_all2")
    )
    win_in = unref_rows.withColumn("_rem", F.col("_remaining")).unionByName(
        refined_window
    )
    partial = (
        win_in.withColumn("_cum", F.sum(F.col(tokens_col)).over(w))
        .filter(F.col("_cum") <= F.col("_rem"))
        .drop("_cum", "_rem")
    )
    return full.unionByName(extra_full).unionByName(partial).drop(*drop)


def select_top_fraction(
    df: DataFrame,
    fraction: float,
    score_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Quantile-cutoff selection — "keep the best X% by score", the
    fraction-based sibling of the token-budget selectors: every row
    whose score is ≥ the (1 − fraction) quantile of the (non-null)
    score distribution, optionally PER GROUP.

    Exact and cheap at any scale: ONE interpolated-percentile
    aggregate (cardinality 1, or |groups| with ``group_col``) feeds a
    broadcast join, and selection is a map-side comparison — no sort,
    no window over data rows.  Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` are both the sort-based interpolated estimator,
    so the cutoff double (and therefore the selected SET) is
    oracle-exact — the same cross-engine contract ``numeric_profile``
    already pins.  Ties at the cutoff are all kept (≥), so the
    selected fraction can exceed ``fraction`` on tied scores — the
    deterministic reading of "top X%".

    Percentile state is the group's score column; at extreme group
    cardinality prefer ``approx_percentile`` behind the same shape
    (the ``numeric_profile_approx`` pattern)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    q = F.expr(f"percentile(`{score_col}`, {1.0 - fraction!r})").alias("_cut")
    return _apply_quantile_cutoff(df, q, score_col, group_col)


def _apply_quantile_cutoff(df, q, score_col, group_col):
    """Shared back half of the fraction selectors: aggregate the
    cutoff (globally or per group), broadcast it, keep rows scoring
    ≥ their cutoff.  The group join is NULL-SAFE: a NULL group value
    is a legitimate group (missing source) and gets its own cutoff —
    an equi-join would silently drop those rows."""
    valid = df.filter(F.col(score_col).isNotNull())
    if group_col is None:
        cut = valid.agg(q)
        return valid.crossJoin(F.broadcast(cut)).filter(
            F.col(score_col) >= F.col("_cut")
        ).drop("_cut")
    cuts = valid.groupBy(group_col).agg(q).withColumnRenamed(
        group_col, "_cut_grp"
    )
    return (
        valid.join(
            F.broadcast(cuts),
            F.col(group_col).eqNullSafe(F.col("_cut_grp")),
        )
        .filter(F.col(score_col) >= F.col("_cut"))
        .drop("_cut", "_cut_grp")
    )


def select_top_fraction_approx(
    df: DataFrame,
    fraction: float,
    score_col: str,
    group_col: str | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Bounded-state twin of ``select_top_fraction`` for extreme
    scales: the cutoff comes from ``approx_percentile``
    (Greenwald-Khanna, O(accuracy) state per group instead of the
    group's whole score column).  Same plan shape — tiny aggregate,
    broadcast join, map-side ≥ — but the cutoff is an approximation
    (rank error ≤ 1/accuracy), so the selected fraction can deviate
    accordingly and the result is NOT SQL-oracle-exact; the error
    bound is pinned in pytest instead (the ``numeric_profile_approx``
    pattern)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if not isinstance(accuracy, int) or accuracy <= 0:
        raise ValueError(
            f"accuracy must be a positive int, got {accuracy!r}"
        )
    q = F.expr(
        f"approx_percentile(`{score_col}`, {1.0 - fraction!r}, {accuracy})"
    ).alias("_cut")
    return _apply_quantile_cutoff(df, q, score_col, group_col)
