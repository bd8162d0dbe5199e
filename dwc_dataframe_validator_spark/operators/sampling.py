"""Deterministic sampling for training-data pipelines.

The reference has no sampling surface (SURVEY §2 — none); these are the
north-star operations a 100 TB corpus pipeline needs when "give me 1%"
must mean the SAME 1% on every run, every engine, and every partitioning:

- ``hash_sample``      — Bernoulli sampling by content hash.  Unlike
  ``DataFrame.sample`` (seed + partition-layout dependent, so a
  repartition or speculative retry changes the sample), the md5
  threshold depends only on the key VALUE: stable across runs, engines,
  cluster sizes, and incremental loads (a re-ingested row samples
  identically).  Pure map-side filter — no shuffle, no UDF, codegen'd.
- ``stratified_sample`` — exactly ``n`` rows per group (fewer if the
  group is smaller), chosen by hash order so the per-group subset is
  also value-deterministic.  One shuffle on the group key; a skewed
  group costs a single window pass over its partition, never a driver
  collect.  For n ≪ group size, pass ``prefilter_fraction`` to
  hash-prune rows map-side BEFORE the shuffle (safe whenever the
  surviving fraction still leaves ≥ n rows per group — the filter keeps
  the hash-smallest rows, which is exactly the set the window keeps).

Both are portable to the DuckDB oracle verbatim (md5 hex is md5 hex),
so the registry checks them value-for-value, not statistically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # compare on the first 8 hex chars = 32-bit resolution


def hash_threshold(fraction: float, digits: int = _HEX_DIGITS) -> str:
    """The hex-string threshold t such that P[md5_prefix < t] ≈ fraction
    for a uniform hash.  Lexicographic comparison of same-length
    lowercase hex equals numeric comparison, in Spark and DuckDB both."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction == 1.0:
        # 16**digits would render one char wider ('100000000') and the
        # LEXICOGRAPHIC compare against an 8-char prefix would then drop
        # every prefix starting above '1'.  'g' sorts after every hex
        # digit, so prefix < 'g' keeps all rows.
        return "g"
    return format(int(fraction * (16**digits)), f"0{digits}x")


def _hash_prefix(key_col: Column | str) -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.substring(F.md5(c.cast("string").cast("binary")), 1, _HEX_DIGITS)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ≈``fraction`` Bernoulli sample keyed on
    ``key_col``'s value.  Rows with equal keys sample together (useful:
    sampling by ``user_id`` keeps whole users)."""
    return df.filter(_hash_prefix(key_col) < F.lit(hash_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n_per_group: int,
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """The ``n_per_group`` hash-smallest rows of each group, with the
    rank exposed as ``sample_rank`` (1-based).  Ties on the hash prefix
    (birthday-rare at 32 bits) break on the raw key value, so the result
    is fully deterministic."""
    if prefilter_fraction is not None:
        df = hash_sample(df, key_col, prefilter_fraction)
    h = _hash_prefix(key_col)
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates in ONE map-side filter — the
    data-mixture step of a training pipeline ("web at 3%, books at
    50%, code at 100%"), expressed as a single CASE over the stratum
    column so no per-source scan or union is needed.

    Strata absent from ``fractions`` sample at ``default_fraction``
    (0.0 = drop, the safe default for an explicit mixture).  Same
    value-determinism contract as ``hash_sample``: the subset depends
    only on key values, so re-runs, repartitions, and incremental loads
    all agree, and the DuckDB oracle replays the identical thresholds.
    No shuffle, no UDF; at 100 TB this is a codegen'd scan-filter that
    reads only ``stratum_col``/``key_col`` plus requested columns.
    """
    thr: Column = F.lit(hash_threshold(default_fraction))
    for stratum, fraction in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(stratum),
            F.lit(hash_threshold(fraction)),
        ).otherwise(thr)
    return df.filter(_hash_prefix(key_col) < thr)


#: weight quantization scale for temperature_fractions — a POWER OF
#: TWO so `weight * _W_SCALE` is exact in IEEE double on both engines
_W_SCALE = 1 << 20


def temperature_fractions(
    df: DataFrame,
    stratum_col: str,
    tokens_col: str,
    token_budget: int,
    alpha: float = 0.5,
    max_strata: int = 100_000,
) -> dict:
    """Per-stratum sampling rates from the corpus's own token mass —
    the temperature-weighting step of mixture construction (GPT-3 /
    multilingual-style): stratum s with token mass T_s gets weight
    w_s ∝ T_s^alpha, a share ``token_budget · w_s / Σw`` of the
    budget, and therefore Bernoulli rate
    ``min(1, budget·w_s / (Σw · T_s))``.  alpha < 1 up-weights small
    strata (alpha=0 → equal budgets, alpha=1 → proportional =
    uniform over documents).

    One bounded-output aggregation (≤ ``max_strata`` rows, enforced)
    — the corpus is never collected.  Feed the result straight to
    ``mixture_sample`` (or use ``temperature_mixture_sample``).

    CROSS-ENGINE DETERMINISM: weights are quantized to integers
    (``floor(T^alpha · 2^20)``) so their SUM is exact in any
    accumulation order, and the remaining arithmetic is a pinned
    sequence of individually-correctly-rounded double ops — with
    ``alpha=0.5`` (sqrt is correctly rounded by IEEE 754; ``pow`` is
    not) the fractions are BIT-IDENTICAL in Python, Spark, and
    DuckDB, which is what lets the registry oracle replay the exact
    thresholds.  Bounds: token sums and Σw must stay below 2^53
    (10^15 tokens per stratum — petabyte-of-text territory)."""
    masses, weights, sum_w = _stratum_weights(
        df, stratum_col, tokens_col, token_budget, alpha, max_strata
    )
    # every positive mass yields weight >= 2^20, so sum_w == 0 iff no
    # strata survived — the empty dict states that directly
    if not masses:
        return {}
    return {
        # pinned op order: (budget·w) / Σw / T — each step correctly
        # rounded, so the oracle reproduces it bit-for-bit
        s: min(1.0, float(token_budget) * weights[s] / sum_w / masses[s])
        for s in masses
    }


def _stratum_weights(
    df, stratum_col, tokens_col, token_budget, alpha, max_strata
):
    """Shared front half of the temperature planners: exact integer
    token masses per stratum (bounded collect, enforced) and the
    integer-quantized weights.  alpha=0.5 goes through sqrt
    EXPLICITLY — IEEE 754 requires sqrt correctly rounded, pow(x, 0.5)
    carries no such guarantee, and the cross-engine bit-parity
    contract rests on every step being correctly rounded.

    NULL strata are excluded up front: a None key would break the
    sorted CASE construction downstream (None is unorderable against
    strings), and a null source is unassignable mass, not a stratum —
    consistent with ``mixture_sample``, where an unlisted stratum
    samples at the default rate."""
    import itertools
    import math

    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    sums = (
        df.filter(
            F.col(tokens_col).isNotNull() & F.col(stratum_col).isNotNull()
        )
        .groupBy(stratum_col)
        .agg(F.sum(F.col(tokens_col)).cast("long").alias("_toks"))
    )
    rows = list(
        itertools.islice(
            sums.toLocalIterator(prefetchPartitions=True), max_strata + 1
        )
    )
    if len(rows) > max_strata:
        raise ValueError(
            f"more than max_strata={max_strata} strata — refusing an "
            "unbounded driver collect; raise max_strata if intended"
        )
    masses = {
        r[stratum_col]: int(r["_toks"])
        for r in rows
        if r["_toks"] and r["_toks"] > 0
    }
    if alpha == 0.5:
        weights = {
            s: int(math.floor(math.sqrt(float(t)) * _W_SCALE))
            for s, t in masses.items()
        }
    else:
        weights = {
            s: int(math.floor(float(t) ** alpha * _W_SCALE))
            for s, t in masses.items()
        }
    return masses, weights, sum(weights.values())


def temperature_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    tokens_col: str,
    token_budget: int,
    alpha: float = 0.5,
    max_strata: int = 100_000,
) -> DataFrame:
    """``temperature_fractions`` composed with ``mixture_sample``:
    deterministic Bernoulli sampling whose per-stratum rates are
    derived from the corpus's own token mass, targeting
    ``token_budget`` total tokens in expectation.  One aggregation
    pass (bounded output) + one map-side CASE filter — no corpus
    shuffle anywhere."""
    fr = temperature_fractions(
        df, stratum_col, tokens_col, token_budget,
        alpha=alpha, max_strata=max_strata,
    )
    return mixture_sample(df, stratum_col, key_col, fr)


def temperature_plan(
    df: DataFrame,
    stratum_col: str,
    tokens_col: str,
    token_budget: int,
    alpha: float = 0.5,
    max_strata: int = 100_000,
    max_epochs: int = 100,
) -> dict:
    """Multi-epoch extension of ``temperature_fractions``: when a
    stratum's temperature share EXCEEDS its token mass, a Bernoulli
    rate saturates at 1.0 and silently under-delivers — real pipelines
    instead REPEAT small high-quality sources across epochs (the
    LLaMA-style repeat-factor table).  Per stratum s with mass T_s and
    target ``budget·w_s/Σw``: ``q = target/T_s``, emitted as
    ``n_epochs = floor(q)`` full passes plus a deterministic
    hash-sample of the remainder fraction ``q - floor(q)``.

    Returns ``{stratum: (n_epochs, rem_fraction)}``.  With no
    saturation anywhere this degenerates to ``temperature_fractions``
    (all n_epochs 0, rem = the Bernoulli rate).  Same bounded-collect
    and cross-engine bit-determinism contract (alpha=0.5): q, floor(q)
    and the remainder are pinned sequences of correctly-rounded double
    ops over integer-quantized weights.  ``max_epochs`` guards the
    materializer against a budget orders beyond the corpus (an
    explode blowup) — raise it only deliberately."""
    import math

    masses, weights, sum_w = _stratum_weights(
        df, stratum_col, tokens_col, token_budget, alpha, max_strata
    )
    # every positive mass yields weight >= 2^20, so sum_w > 0 whenever
    # any stratum survived
    plan = {}
    for s, t in masses.items():
        # pinned op order mirrored by the SQL oracle
        q = float(token_budget) * weights[s] / sum_w / t
        n_epochs = int(math.floor(q))
        if n_epochs > max_epochs:
            raise ValueError(
                f"stratum {s!r} would repeat {n_epochs} epochs "
                f"(> max_epochs={max_epochs}) — the budget is orders "
                "beyond this stratum's share of the corpus; raise "
                "max_epochs only if the explode cost is intended"
            )
        plan[s] = (n_epochs, q - n_epochs)
    return plan


def epoch_repeat_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    tokens_col: str,
    token_budget: int,
    alpha: float = 0.5,
    max_strata: int = 100_000,
    max_epochs: int = 100,
) -> DataFrame:
    """Materialize a ``temperature_plan``: every row of stratum s is
    emitted once per full epoch (``epoch`` = 1..n_epochs, via an
    exploded sequence — a generator, NO shuffle) and rows passing the
    remainder-fraction hash filter are emitted once more with
    ``epoch = n_epochs + 1``.  Expected emitted tokens ≈
    ``token_budget``; strata the plan drops (zero mass) emit nothing.
    Null-token rows carry no mass but are stratum members and repeat
    with their stratum.  Wholly map-side: one bounded aggregation
    (inside the plan) + CASE literals + explode."""
    plan = temperature_plan(
        df, stratum_col, tokens_col, token_budget,
        alpha=alpha, max_strata=max_strata, max_epochs=max_epochs,
    )
    if not plan:
        return df.withColumn("epoch", F.lit(1)).filter(F.lit(False))
    ne: Column = F.lit(-1)
    thr: Column = F.lit("")  # nothing < '' — unplanned strata drop
    for s, (n, rem) in sorted(plan.items()):
        cond = F.col(stratum_col) == F.lit(s)
        ne = F.when(cond, F.lit(n)).otherwise(ne)
        thr = F.when(cond, F.lit(hash_threshold(rem))).otherwise(thr)
    base = df.withColumn("_ne", ne)
    full = (
        base.filter(F.col("_ne") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_ne"))))
    )
    partial = (
        base.filter(F.col("_ne") >= 0)
        .filter(_hash_prefix(key_col) < thr)
        .withColumn("epoch", F.col("_ne") + 1)
    )
    return full.unionByName(partial).drop("_ne")


def mixture_sample_hex(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    thresholds: dict,
    default_hex: str = "00000000",
) -> DataFrame:
    """``mixture_sample`` with PRECOMPUTED hex thresholds instead of
    float fractions — the exact-arithmetic entry point: solvers that
    derive rates with integer arithmetic (``target_mixture_thresholds``)
    hand their thresholds through unchanged, so no float rounding sits
    between the solver and the sampled set.  Same one-CASE map-side
    filter, same value-determinism contract."""
    thr = F.lit(default_hex)
    for stratum, hexthr in sorted(thresholds.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(stratum), F.lit(hexthr)
        ).otherwise(thr)
    return df.filter(_hash_prefix(key_col) < thr)


def target_mixture_thresholds(
    df: DataFrame,
    stratum_col: str,
    tokens_col: str,
    target_weights: dict,
    token_budget: int,
    max_strata: int = 100_000,
) -> dict:
    """EXACT water-filling mixture solver: given per-stratum TARGET
    shares (positive integer weights w_s — "web:1, books:3, code:2")
    and a token budget B, the Bernoulli rates whose expected token
    draw matches the recipe as closely as the corpus allows.

    The naive rate ``min(1, B·w_s/(Σw·T_s))`` under-fills: a stratum
    too small for its share caps at 1 and its unused budget vanishes.
    Water-filling redistributes it: rates are ``min(1, a·w_s/T_s)``
    with the water level ``a`` solving ``Σ_s min(T_s, a·w_s) =
    min(B, ΣT)`` — small strata are taken whole, the remainder is
    split across the rest proportional to their target weights.

    Closed form, no iteration: sort strata by ``x_s = T_s/w_s``
    (exact Fraction order), then the capped prefix k and level
    ``a = (B* − Σ_{i≤k} T_i) / Σ_{i>k} w_i`` follow from prefix sums.
    EVERYTHING is arbitrary-precision integer arithmetic on the
    driver (masses and weights are ints, ``a`` a rational, each
    threshold ``⌊a·w_s/T_s · 2^32⌋`` an exact integer) — no float
    anywhere, so an engine-portable oracle can replay the solver with
    128-bit integer SQL, and the sampled SET is value-pinned.

    One bounded-output aggregation over the corpus (≤ ``max_strata``,
    enforced); strata absent from ``target_weights`` get rate 0 (an
    explicit recipe drops unlisted feeds).  Returns {stratum: 8-hex
    threshold} for ``mixture_sample_hex``."""
    import itertools
    from fractions import Fraction

    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    for s, w in target_weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(
                f"target weight for {s!r} must be a positive int, got {w!r}"
            )
    sums = (
        df.filter(
            F.col(tokens_col).isNotNull() & F.col(stratum_col).isNotNull()
        )
        .filter(F.col(stratum_col).isin(*target_weights.keys()))
        .groupBy(stratum_col)
        .agg(F.sum(F.col(tokens_col)).cast("long").alias("_toks"))
    )
    rows = list(
        itertools.islice(
            sums.toLocalIterator(prefetchPartitions=True), max_strata + 1
        )
    )
    if len(rows) > max_strata:
        raise ValueError(
            f"more than max_strata={max_strata} strata — refusing an "
            "unbounded driver collect; raise max_strata if intended"
        )
    masses = {
        r[stratum_col]: int(r["_toks"])
        for r in rows
        if r["_toks"] and r["_toks"] > 0
    }
    if not masses:
        return {}
    total_t = sum(masses.values())
    b_star = min(int(token_budget), total_t)
    # sort by x_s = T_s/w_s ascending (exact), ties by stratum name
    order = sorted(
        masses, key=lambda s: (Fraction(masses[s], target_weights[s]), s)
    )
    n = len(order)
    pref_t = [0] * (n + 1)
    pref_w = [0] * (n + 1)
    for i, s in enumerate(order):
        pref_t[i + 1] = pref_t[i] + masses[s]
        pref_w[i + 1] = pref_w[i] + target_weights[s]
    w_total = pref_w[n]
    chosen = None
    for k in range(n + 1):
        num = b_star - pref_t[k]          # a = num / den (den may be 0)
        den = w_total - pref_w[k]
        if k > 0:
            s_k = order[k - 1]            # x_k <= a ?
            if masses[s_k] * den > num * target_weights[s_k]:
                continue
        if k < n:
            s_n = order[k]                # a < x_{k+1} ?
            if not (num * target_weights[s_n] < masses[s_n] * den):
                continue
        chosen = (k, num, den)
        break
    if chosen is None:  # input-dependent invariant — never assert
        raise RuntimeError(
            "water-filling level not found — boundary comparison "
            "invariant violated (please report: masses="
            f"{masses!r}, target_weights={target_weights!r})"
        )
    k, num, den = chosen
    out = {}
    for i, s in enumerate(order):
        if i < k:
            out[s] = hash_threshold(1.0)  # taken whole
        elif num <= 0:
            out[s] = format(0, "08x")
        else:
            q = (num * target_weights[s] * (1 << 32)) // (den * masses[s])
            out[s] = (
                hash_threshold(1.0) if q >= (1 << 32) else format(q, "08x")
            )
    return out


def target_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    tokens_col: str,
    target_weights: dict,
    token_budget: int,
    max_strata: int = 100_000,
) -> DataFrame:
    """``target_mixture_thresholds`` composed with
    ``mixture_sample_hex``: one bounded aggregation + one map-side
    CASE filter — recipe in, deterministic sampled corpus out."""
    thr = target_mixture_thresholds(
        df, stratum_col, tokens_col, target_weights, token_budget,
        max_strata=max_strata,
    )
    return mixture_sample_hex(df, stratum_col, key_col, thr)


def split_bounds(splits: dict) -> list:
    """(name, upper_threshold) intervals for ``hash_split``, in sorted
    name order.  Fractions that nominally sum to 1 can accumulate to
    just under 1.0 in float, leaving a ~2^-32 sliver of the prefix
    space unassigned — when the user clearly intends full coverage
    (|Σf − 1| ≤ 1e-9), the last interval's upper bound is pinned to
    cover the whole space ('g' sorts above every hex digit)."""
    if not splits:
        raise ValueError("splits must name at least one fraction")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bounds = []
    cum = 0.0
    for name in sorted(splits):
        if splits[name] < 0:
            raise ValueError(f"negative fraction for split {name!r}")
        cum = cum + splits[name]
        bounds.append((name, hash_threshold(min(cum, 1.0))))
    if abs(total - 1.0) <= 1e-9:
        bounds[-1] = (bounds[-1][0], hash_threshold(1.0))
    return bounds


def hash_split(
    df: DataFrame, key_col: str, splits: dict, other: str | None = None
) -> DataFrame:
    """Deterministic named partitioning of a corpus — the
    train/val/test split step: each split name gets a DISJOINT
    interval of the md5-prefix space sized to its fraction, assigned
    in sorted-name order, so every row lands in exactly one split (or
    ``other``/is dropped when fractions sum below 1).  Value-keyed
    like every sampler here: re-runs, repartitions, engines, and
    incremental loads all agree, rows with equal keys travel together,
    and ADDING a split later leaves existing assignments stable only
    if appended at the end of the name order — document your split
    names.  Appends a ``split`` column; rows past the covered interval
    get ``other`` (or are dropped when ``other`` is None).

    One map-side CASE over the hash prefix — no shuffle, no sampling
    pass, and exactly reproducible in the SQL oracle."""
    bounds = split_bounds(splits)
    h = _hash_prefix(key_col)
    expr = F.lit(other).cast("string") if other is not None else F.lit(None).cast("string")
    for name, upper in reversed(bounds):
        expr = F.when(h < F.lit(upper), F.lit(name)).otherwise(expr)
    out = df.withColumn("split", expr)
    if other is None:
        out = out.filter(F.col("split").isNotNull())
    return out


def mixture_drift(
    df: DataFrame,
    stratum_col: str,
    tokens_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Recipe-vs-reality report: each stratum's OBSERVED token share
    against the TEMPERATURE-TARGET share ``w_s/Σw`` (w ∝ T^alpha) —
    the monitoring face of mixture construction ("is the crawl feed
    drowning the curated sources relative to the recipe?").  Output
    per stratum: token mass, target share, observed share, drift
    (observed − target) and ratio.

    WHOLLY Spark-side, bounded output (= |strata|): one aggregation,
    quantized weights as Catalyst expressions (JVM ``Math.sqrt`` is
    IEEE-correctly-rounded, ×2^20 exact, floor exact → integer
    weights whose sum is order-independent), then a broadcast of the
    1-row totals — no driver collect, no window over a single
    partition.  The same pinned arithmetic as the planners, so the
    oracle replays every double bit-for-bit (alpha=0.5)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    agg = (
        df.filter(F.col(tokens_col).isNotNull())
        .groupBy(stratum_col)
        .agg(F.sum(F.col(tokens_col)).cast("long").alias("toks"))
        .filter(F.col("toks") > 0)
    )
    t_dbl = F.col("toks").cast("double")
    if alpha == 0.5:
        ws = F.floor(F.sqrt(t_dbl) * F.lit(float(_W_SCALE)))
    else:
        ws = F.floor(F.pow(t_dbl, F.lit(alpha)) * F.lit(float(_W_SCALE)))
    weighted = agg.withColumn("_ws", ws)
    totals = weighted.agg(
        F.sum("_ws").alias("_sum_ws"), F.sum("toks").alias("_sum_toks")
    )
    target = F.col("_ws") / F.col("_sum_ws")
    observed = F.col("toks") / F.col("_sum_toks")
    return (
        weighted.crossJoin(F.broadcast(totals))  # 1-row totals
        .select(
            stratum_col,
            "toks",
            target.alias("target_share"),
            observed.alias("observed_share"),
            (observed - target).alias("drift"),
            (observed / target).alias("drift_ratio"),
        )
    )


def assign_shards(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data
    export: ``shard = md5_int(key) mod n_shards`` and ``shard_pos`` =
    the full md5 hex digest, an order key that is uniform-random with
    respect to any natural ordering of the data (the "shuffle" a data
    loader needs) yet stable across runs and engines.

    Downstream: ``df.repartition(n_shards, "shard").sortWithinPartitions
    ("shard_pos")`` then ``write.partitionBy("shard")`` gives one
    deterministic, internally-shuffled file set per shard — the exact
    layout a streaming data loader consumes.  Map-side only here; the
    single shuffle is the repartition the caller explicitly pays at
    write time.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    c = F.col(key_col).cast("string").cast("binary")
    digest = F.md5(c)
    shard = (
        F.conv(F.substring(digest, 1, _HEX_DIGITS), 16, 10).cast("long")
        % n_shards
    )
    return df.withColumn("shard", shard).withColumn("shard_pos", digest)
