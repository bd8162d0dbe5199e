"""Property-based tests (hypothesis) for the aggregate-count
identities the report derivations rely on (SURVEY.md §5: e.g.
``recognised + unrecognised + nulls == record_count`` from reference
validate.py:313)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dwc_dataframe_validator_spark.functions import expressions as E

VOCAB = ["wgs84", "epsg:4326"]

value_st = st.one_of(
    st.none(),
    st.sampled_from(["WGS84", "EPSG:4326", "GIRAFFE", "nan", "", "12.5", "-91"]),
    st.floats(min_value=-200, max_value=200, allow_nan=False).map(str),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(values=st.lists(value_st, min_size=0, max_size=30))
def test_count_identities(spark, values):
    df = spark.createDataFrame(
        [(v,) for v in values], "v: string"
    )
    row = df.agg(
        E.record_count().alias("n"),
        E.populated_count("v").alias("pop"),
        E.null_count("v").alias("nulls"),
        E.valid_numeric_count("v").alias("numeric"),
        E.valid_range_count("v", -90, 90).alias("in_range"),
        E.distinct_count("v").alias("distinct"),
        E.duplicate_count("v").alias("dups"),
        E.vocab_recognised_count("v", VOCAB).alias("recognised"),
        E.group_populated_count(["v"]).alias("grp"),
    ).collect()[0]

    n = len(values)
    n_null = sum(1 for v in values if v is None)
    assert row["n"] == n
    assert row["pop"] == n - n_null
    assert row["nulls"] == n_null
    # vocab identity: recognised + unrecognised + nulls == record_count
    unrecognised = row["n"] - (row["nulls"] + row["recognised"])
    assert 0 <= row["recognised"] <= row["pop"]
    assert unrecognised == sum(
        1 for v in values if v is not None and v.lower() not in VOCAB
    )
    # range counts are bounded by numeric-coercible, bounded by populated
    assert row["in_range"] <= row["numeric"] <= row["pop"]
    # distinct + duplicates == populated
    assert row["distinct"] + row["dups"] == row["pop"]
    # single-column group-populated equals populated
    assert row["grp"] == row["pop"]
    # cross-check recognised against Python
    assert row["recognised"] == sum(
        1 for v in values if v is not None and v.lower() in VOCAB
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lists=st.lists(
        st.tuples(value_st, value_st), min_size=0, max_size=20
    )
)
def test_group_populated_matches_python(spark, lists):
    df = spark.createDataFrame(lists, "a: string, b: string")
    row = df.agg(
        E.group_populated_count(["a", "b"]).alias("grp"),
        E.record_count().alias("n"),
    ).collect()[0]
    expected = sum(1 for a, b in lists if a is not None or b is not None)
    assert row["grp"] == expected
    assert row["grp"] <= row["n"]


def test_hash_sample_fraction_monotone_subset(spark):
    """The md5 threshold is monotone in fraction, so a smaller sample is
    EXACTLY a subset of a larger one — the invariant that makes
    deterministic sampling composable across pipeline stages."""
    from dwc_dataframe_validator_spark.operators.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    small = {r["k"] for r in hash_sample(df, "k", 0.1).collect()}
    big = {r["k"] for r in hash_sample(df, "k", 0.4).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_cms_monotone_under_more_data(spark):
    """Adding rows can only raise (never lower) any CMS estimate —
    counters only increment."""
    from dwc_dataframe_validator_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    base = [("a",)] * 30 + [("b",)] * 10
    extra = base + [("c",)] * 25
    d1 = spark.createDataFrame(base, "v string")
    d2 = spark.createDataFrame(extra, "v string")
    e1 = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(cms_build(d1, "v", 3, 4), d2, "v", 3, 4).collect()
    }
    e2 = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(cms_build(d2, "v", 3, 4), d2, "v", 3, 4).collect()
    }
    assert all(e2[v] >= e1[v] for v in e1)


# --- round-6 operators: span dedup coverage + bloom membership -----------

token_st = st.sampled_from(["a", "b", "c", "dog", "cat", "xy"])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(token_st, min_size=0, max_size=24), min_size=1, max_size=6
    ),
    w=st.integers(min_value=2, max_value=5),
)
def test_span_dup_stats_matches_bruteforce(spark, docs, w):
    """dup_tokens must equal the brute-force union of duplicated
    [pos, pos+w) intervals, for arbitrary corpora and window sizes —
    the LEAD-window interval merge against first principles."""
    from collections import Counter

    from dwc_dataframe_validator_spark.operators.spans import (
        duplicated_span_stats,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in duplicated_span_stats(df, "doc_id", "text", w=w).collect()}

    occ = Counter()
    for toks in docs:
        for i in range(max(0, len(toks) - w + 1)):
            occ[" ".join(toks[i:i + w])] += 1
    for d, toks in enumerate(docs):
        covered, ndw = set(), 0
        for i in range(max(0, len(toks) - w + 1)):
            if occ[" ".join(toks[i:i + w])] >= 2:
                ndw += 1
                covered.update(range(i, i + w))
        assert out[d]["n_dup_windows"] == ndw, (d, docs, w)
        assert out[d]["dup_tokens"] == len(covered), (d, docs, w)
        assert out[d]["n_tokens"] == len(toks)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    members=st.sets(st.integers(min_value=0, max_value=500), max_size=40),
    probes=st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    m=st.sampled_from([64, 256, 1024]),
)
def test_bloom_never_false_negative(spark, members, probes, m):
    """For ANY member/probe sets and filter size: every member probe is
    positive (the structural bloom guarantee the decontamination
    pipeline's survivors depend on)."""
    from dwc_dataframe_validator_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
    )

    mdf = spark.createDataFrame([(v,) for v in members] or [(None,)], "v int")
    pdf = spark.createDataFrame([(v,) for v in probes], "v int")
    filt = bloom_build(mdf, "v", k=4, m=m)
    got = {r["v"]: r["bloom_positive"]
           for r in bloom_contains(filt, pdf, "v", k=4, m=m).collect()}
    for v in probes & members:
        assert got[v], (v, m, sorted(members))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.sampled_from(["a b", "a  B ", "c d", "e f g", "C D", "h", ""]),
        min_size=0,
        max_size=16,
    ),
    cut=st.tuples(
        st.integers(min_value=0, max_value=16),
        st.integers(min_value=0, max_value=16),
    ),
)
def test_incremental_dedup_converges_to_global(spark, texts, cut):
    """For ANY corpus and ANY split into (up to three) ingestion
    slices: the union of per-slice survivors carries exactly the
    corpus's distinct fingerprints, and each fingerprint's surviving
    doc is the lowest id in the EARLIEST slice containing it — i.e.
    slice-by-slice construction converges to the global dedup result
    regardless of how the data was sliced."""
    from dwc_dataframe_validator_spark.operators.incremental import (
        fingerprint_store,
        incremental_dedup,
    )
    from dwc_dataframe_validator_spark.operators.text import fingerprint

    rows = [(i, t) for i, t in enumerate(texts)]
    a, b = sorted(min(c, len(rows)) for c in cut)
    slices = [s for s in (rows[:a], rows[a:b], rows[b:]) if s]

    schema = "doc_id long, text string"
    store = spark.createDataFrame([], "fingerprint string")
    survivors: dict[str, int] = {}
    for chunk in slices:
        batch = spark.createDataFrame(chunk, schema)
        got = incremental_dedup(batch, store).collect()
        for r in got:
            assert r["fingerprint"] not in survivors, "re-admitted dup"
            survivors[r["fingerprint"]] = r["doc_id"]
        new = spark.createDataFrame(
            [(fp,) for fp in (r["fingerprint"] for r in got)],
            "fingerprint string",
        )
        store = store.unionByName(new).distinct().localCheckpoint()

    full = spark.createDataFrame(rows or [(0, "x")], schema)
    if not rows:
        assert survivors == {}
        return
    fps = fingerprint(full).collect()
    want: dict[str, int] = {}
    order = {id_: pos for pos, (id_, _) in enumerate(
        [r for s in slices for r in s]
    )}
    for r in sorted(fps, key=lambda r: (order[r["doc_id"]],)):
        want.setdefault(r["fingerprint"], None)
    assert set(survivors) == set(want), "fingerprint coverage mismatch"
    # earliest-slice, lowest-id winner
    slice_of = {}
    for si, s in enumerate(slices):
        for id_, _ in s:
            slice_of[id_] = si
    by_fp: dict[str, list[int]] = {}
    for r in fps:
        by_fp.setdefault(r["fingerprint"], []).append(r["doc_id"])
    for fp, ids in by_fp.items():
        first_slice = min(slice_of[i] for i in ids)
        expect = min(i for i in ids if slice_of[i] == first_slice)
        assert survivors[fp] == expect, (fp, ids, survivors[fp], expect)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=-2.0, max_value=2.0, allow_nan=False,
                      allow_infinity=False),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=0,
        max_size=25,
    ),
    budget=st.integers(min_value=0, max_value=400),
)
def test_token_budget_selection_matches_naive(spark, rows, budget):
    """For ANY scores/token-counts/budget: the two-phase bucketed
    selection equals the naive (score DESC, id ASC) running-sum
    prefix computed in plain Python."""
    from dwc_dataframe_validator_spark.operators.selection import (
        select_token_budget,
    )

    data = [(i, s, t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data or [(0, 0.0, 0)], "doc_id long, score double, tokens long"
    )
    if not data:
        df = df.filter("doc_id < 0")
    got = sorted(
        r["doc_id"]
        for r in select_token_budget(df, budget, "score", "tokens").collect()
    )
    cum, want = 0, []
    for i, s, t in sorted(data, key=lambda r: (-r[1], r[0])):
        if cum + t > budget:
            break
        cum += t
        want.append(i)
    assert got == sorted(want), (rows, budget, got, want)


@settings(max_examples=200, deadline=None)
@given(
    masses=st.lists(
        st.integers(min_value=1, max_value=10**12),
        min_size=1,
        max_size=30,
    ),
    budget=st.integers(min_value=0, max_value=10**13),
)
def test_temperature_fraction_bit_parity_with_duckdb(masses, budget):
    """The cross-engine determinism contract of temperature_fractions
    (alpha=0.5): for ANY stratum masses and budget, the Python-side
    fractions and md5 thresholds are BIT-IDENTICAL to the same
    arithmetic evaluated by DuckDB — integer-quantized weights
    (order-independent exact sum) + a pinned sequence of correctly-
    rounded double ops (sqrt, *, /, min)."""
    import math

    import duckdb

    from dwc_dataframe_validator_spark.operators.sampling import (
        _W_SCALE,
        hash_threshold,
    )

    # Python side — the exact arithmetic of temperature_fractions
    # after the (exact, integer) token-sum aggregation
    ws = {i: int(math.floor(math.sqrt(float(t)) * _W_SCALE))
          for i, t in enumerate(masses)}
    sum_w = sum(ws.values())
    frs = {i: min(1.0, float(budget) * ws[i] / sum_w / t)
           for i, t in enumerate(masses)}
    thrs = {i: hash_threshold(f) for i, f in frs.items()}

    values = ", ".join(f"({i}, {t})" for i, t in enumerate(masses))
    rows = duckdb.sql(f"""
        WITH t(s, toks) AS (VALUES {values}),
        w AS (
          SELECT s, toks,
                 CAST(floor(sqrt(CAST(toks AS DOUBLE)) * {_W_SCALE}.0)
                      AS BIGINT) AS ws
          FROM t),
        tot AS (SELECT CAST(sum(ws) AS BIGINT) AS sum_ws FROM w)
        SELECT s,
               least(1.0, CAST({budget} AS DOUBLE) * ws / sum_ws / toks)
                 AS frac,
               CASE WHEN least(1.0, CAST({budget} AS DOUBLE) * ws / sum_ws
                          / toks) >= 1.0 THEN 'g'
                    ELSE printf('%08x', CAST(floor(
                      least(1.0, CAST({budget} AS DOUBLE) * ws / sum_ws
                            / toks) * 4294967296.0) AS BIGINT))
               END AS thr
        FROM w, tot
    """).fetchall()
    for s, frac, thr in rows:
        assert frs[s] == frac, (s, masses[s], budget, frs[s], frac)
        assert thrs[s] == thr, (s, masses[s], budget, thrs[s], thr)


@settings(max_examples=150, deadline=None)
@given(
    masses=st.lists(
        st.integers(min_value=1, max_value=10**12),
        min_size=1,
        max_size=20,
    ),
    budget=st.integers(min_value=0, max_value=10**13),
)
def test_epoch_plan_bit_parity_with_duckdb(masses, budget):
    """temperature_plan's epoch counts and remainder fractions follow
    the same bit-parity contract as the rates: floor(q) and q-floor(q)
    evaluate identically in Python and DuckDB for any masses/budget."""
    import math

    import duckdb

    from dwc_dataframe_validator_spark.operators.sampling import _W_SCALE

    ws = {i: int(math.floor(math.sqrt(float(t)) * _W_SCALE))
          for i, t in enumerate(masses)}
    sum_w = sum(ws.values())
    plan = {}
    for i, t in enumerate(masses):
        q = float(budget) * ws[i] / sum_w / t
        plan[i] = (int(math.floor(q)), q - int(math.floor(q)))

    values = ", ".join(f"({i}, {t})" for i, t in enumerate(masses))
    rows = duckdb.sql(f"""
        WITH t(s, toks) AS (VALUES {values}),
        w AS (
          SELECT s, toks,
                 CAST(floor(sqrt(CAST(toks AS DOUBLE)) * {_W_SCALE}.0)
                      AS BIGINT) AS ws
          FROM t),
        tot AS (SELECT CAST(sum(ws) AS BIGINT) AS sum_ws FROM w)
        SELECT s,
               CAST(floor(CAST({budget} AS DOUBLE) * ws / sum_ws / toks)
                    AS BIGINT) AS n_epochs,
               (CAST({budget} AS DOUBLE) * ws / sum_ws / toks)
                 - floor(CAST({budget} AS DOUBLE) * ws / sum_ws / toks)
                 AS rem
        FROM w, tot
    """).fetchall()
    for s, n, rem in rows:
        assert plan[s] == (n, rem), (s, masses[s], budget, plan[s], (n, rem))


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=8,
    )
)
def test_bigram_surprisal_matches_bruteforce(spark, docs):
    """For ANY small corpus: bigram surprisal equals the brute-force
    Python computation — prefix-count denominators, floor-log2 grid,
    tf weighting, <2-token NULL contract."""
    from collections import Counter

    from dwc_dataframe_validator_spark.operators.text import bigram_surprisal

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: tuple(r)[1:] for r in bigram_surprisal(df).collect()}

    big = Counter()
    for toks in docs:
        big.update(zip(toks, toks[1:]))
    prefix = Counter()
    for (p, _), c in big.items():
        prefix[p] += c
    flog2 = lambda c: c.bit_length() - 1  # noqa: E731
    for i, toks in enumerate(docs):
        trans = list(zip(toks, toks[1:]))
        bits = sum(flog2(prefix[p]) - flog2(big[(p, c)]) for p, c in trans)
        n = len(trans)
        want = (n, bits, bits / n if n else None)
        assert got[i] == want, (i, toks, got[i], want)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=8,
    )
)
def test_kneser_ney_surprisal_matches_bruteforce(spark, docs):
    """r12: for ANY small corpus the interpolated Kneser-Ney bigram
    scorer equals the brute-force Python computation of the exact
    integer ratio — num = (4c−3)·N_B + 3·N1+(v·)·N1+(·w),
    den = 4·c(v·)·N_B, bits = flog2(den) − flog2(num), tf-weighted;
    <2-token docs get the (0, 0, NULL) contract."""
    from collections import Counter, defaultdict

    from dwc_dataframe_validator_spark.operators.text import (
        kneser_ney_surprisal,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(r)[1:] for r in kneser_ney_surprisal(df).collect()
    }

    big = Counter()
    for toks in docs:
        big.update(zip(toks, toks[1:]))
    prefix, cont_right, cont_left = Counter(), defaultdict(set), defaultdict(set)
    for (v, w), c in big.items():
        prefix[v] += c
        cont_right[v].add(w)
        cont_left[w].add(v)
    n_b = len(big)
    flog2 = lambda c: c.bit_length() - 1  # noqa: E731
    for i, toks in enumerate(docs):
        trans = list(zip(toks, toks[1:]))
        bits = 0
        for v, w in trans:
            num = (4 * big[(v, w)] - 3) * n_b + 3 * len(cont_right[v]) * len(
                cont_left[w]
            )
            den = 4 * prefix[v] * n_b
            bits += flog2(den) - flog2(num)
        n = len(trans)
        want = (n, bits, bits / n if n else None)
        assert got[i] == want, (i, toks, got[i], want)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    model=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]),
                 min_size=0, max_size=8),
        min_size=1, max_size=6,
    ),
    target=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                 min_size=0, max_size=8),
        min_size=1, max_size=6,
    ),
)
def test_trigram_surprisal_matches_bruteforce(spark, model, target):
    """r9: for ANY (model, target) corpus pair the stupid-backoff
    trigram scorer equals the brute-force Python computation — live
    backoff levels (target vocab ⊃ model vocab forces bigram/unigram
    backoffs and OOVs), floor-log2 grid, +1-bit-per-level penalty,
    <3-token zero contract, per-level tallies."""
    from collections import Counter

    from dwc_dataframe_validator_spark.operators.text import trigram_surprisal

    mdf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(model)],
        "doc_id long, text string",
    )
    tdf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(target)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in trigram_surprisal(tdf, model_df=mdf).collect()
    }

    tri, big, uni = Counter(), Counter(), Counter()
    n_total = 0
    for toks in model:
        tri.update(zip(toks, toks[1:], toks[2:]))
        big.update(zip(toks, toks[1:]))
        uni.update(toks)
        n_total += len(toks)
    trip = Counter()
    for (p2, p1, _), c in tri.items():
        trip[(p2, p1)] += c
    bigp = Counter()
    for (p1, _), c in big.items():
        bigp[p1] += c
    # engine convention: bin(0) renders as "0" → flog2(0) = 0 (an
    # all-empty model makes n_total = 0 on the OOV branch)
    flog2 = lambda c: max(c.bit_length() - 1, 0)  # noqa: E731

    for i, toks in enumerate(target):
        grams = list(zip(toks, toks[1:], toks[2:]))
        bits = n_b2 = n_b1 = n_oov = 0
        for p2, p1, cur in grams:
            if (p2, p1, cur) in tri:
                bits += flog2(trip[(p2, p1)]) - flog2(tri[(p2, p1, cur)])
            elif (p1, cur) in big:
                bits += 1 + flog2(bigp[p1]) - flog2(big[(p1, cur)])
                n_b2 += 1
            elif cur in uni:
                bits += 2 + flog2(n_total) - flog2(uni[cur])
                n_b1 += 1
            else:
                bits += 2 + flog2(n_total)
                n_oov += 1
        n = len(grams)
        want = (n, bits, n_b2, n_b1, n_oov, bits / n if n else None)
        assert got[i] == want, (i, toks, got[i], want)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50_000),   # mass
            st.integers(min_value=1, max_value=7),        # target weight
        ),
        min_size=1, max_size=8,
    ),
    budget_frac=st.floats(min_value=0.0, max_value=1.5),
)
def test_target_mixture_waterfilling_invariants(spark, data, budget_frac):
    """r9: for ANY (masses, weights, budget) the exact water-filling
    solver satisfies the defining invariants — rates in [0,1], the
    expected token draw hits min(B, ΣT) up to threshold quantization,
    whole-taken strata are exactly those with the smallest T/w, and
    uncapped strata share the SAME water level a = r·T/w."""
    from fractions import Fraction

    from dwc_dataframe_validator_spark.operators.sampling import (
        target_mixture_thresholds,
    )

    masses = {f"s{i}": m for i, (m, _) in enumerate(data)}
    weights = {f"s{i}": w for i, (_, w) in enumerate(data)}
    total = sum(masses.values())
    budget = int(budget_frac * total)
    rows = [(s, m) for s, m in masses.items()]
    df = spark.createDataFrame(rows, "src string, toks long")
    thr = target_mixture_thresholds(df, "src", "toks", weights, budget)
    assert set(thr) == set(masses)

    def rate(s):
        if thr[s] == "g":
            return Fraction(1)
        return Fraction(int(thr[s], 16), 1 << 32)

    b_star = min(budget, total)
    drawn = sum(rate(s) * masses[s] for s in masses)
    # each uncapped threshold floors away < 2^-32 of rate: total
    # shortfall < n·T_max/2^32 + 1
    slack = len(masses) * max(masses.values()) / (1 << 32) + 1
    assert b_star - slack <= drawn <= b_star, (thr, drawn, b_star)

    capped = {s for s in masses if thr[s] == "g"}
    x = {s: Fraction(masses[s], weights[s]) for s in masses}
    if capped and capped != set(masses):
        assert max(x[s] for s in capped) <= min(
            x[s] for s in masses if s not in capped
        )
    # common water level across uncapped strata: thresholds are
    # floor(a·w/T·2^32), so a is recoverable within 2^-32 resolution
    levels = [
        (rate(s) * masses[s] / weights[s], s)
        for s in masses
        if s not in capped and rate(s) > 0
    ]
    if len(levels) > 1:
        lo = min(l for l, _ in levels)
        hi = max(l for l, _ in levels)
        tol = max(
            Fraction(masses[s], (1 << 32) * weights[s]) for _, s in levels
        )
        assert hi - lo <= 2 * tol, (thr, levels)

    # edges: budget >= corpus -> everything whole; zero budget -> none
    assert set(target_mixture_thresholds(
        df, "src", "toks", weights, total
    ).values()) == {"g"}
    assert set(target_mixture_thresholds(
        df, "src", "toks", weights, 0
    ).values()) == {format(0, "08x")}


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    tgt=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]),
                 min_size=0, max_size=6),
        min_size=1, max_size=5,
    ),
    raw=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "dd", "ee"]),
                 min_size=0, max_size=6),
        min_size=1, max_size=5,
    ),
)
def test_dsir_scores_match_bruteforce(spark, tgt, raw):
    """r9: for ANY (target, raw) corpus pair the DSIR importance
    scorer equals the brute-force Python computation — md5-prefix
    bucket hash, add-one-smoothed floor-log2 weight grid, per-doc
    long sums, zero-token NULL contract."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F

    from dwc_dataframe_validator_spark.operators.text import (
        dsir_importance_scores,
    )

    B = 16
    rows = [(i, " ".join(toks), True) for i, toks in enumerate(tgt)] + [
        (len(tgt) + i, " ".join(toks), False)
        for i, toks in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in dsir_importance_scores(
            df, F.col("is_t"), n_buckets=B
        ).collect()
    }

    bucket = lambda t: int(  # noqa: E731
        hashlib.md5(t.encode()).hexdigest()[:8], 16) % B
    flog2 = lambda c: c.bit_length() - 1  # noqa: E731
    t_c, r_c = Counter(), Counter()
    for toks in tgt:
        t_c.update(bucket(t) for t in toks)
    for toks in raw:
        r_c.update(bucket(t) for t in toks)
    tn = sum(t_c.values()) + B
    rn = sum(r_c.values()) + B
    w = {
        b: (flog2(t_c[b] + 1) - flog2(tn))
        - (flog2(r_c[b] + 1) - flog2(rn))
        for b in set(t_c) | set(r_c)
    }
    for i, toks in enumerate([*tgt, *raw]):
        bits = sum(w[bucket(t)] for t in toks)
        n = len(toks)
        want = (n, bits, bits / n if n else None)
        assert got[i] == want, (i, toks, got[i], want)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    rgb=st.booleans(),
    sub=st.booleans(),
    prog=st.booleans(),
    rst=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_wrapper_modes_decode_identically(h, w, rgb, sub, prog, rst, seed):
    """r13 property: every JPEG wrapper mode carries the SAME
    quantized coefficients, so for ANY image the progressive /
    restart-interval / combined encodings must decode pixel-identical
    to the plain baseline encoding — over random sizes (ragged MCU
    edges), gray/RGB, 4:4:4/4:2:0, and restart intervals 1-3."""
    import numpy as np

    from dwc_dataframe_validator_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    ch = 3 if rgb else 1
    px = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
    sub = sub and rgb
    base = mm.jpeg_decode_pixels(mm.jpeg_encode(px, subsample=sub))
    assert base is not None and base.shape == px.shape
    variant = mm.jpeg_encode(
        px, subsample=sub, progressive=prog,
        restart_interval=rst,
    )
    dec = mm.jpeg_decode_pixels(variant)
    assert dec is not None
    assert np.array_equal(dec, base), (h, w, rgb, sub, prog, rst)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    body=st.binary(min_size=0, max_size=4000),
    chunk_size=st.integers(min_value=1, max_value=300),
    enc=st.sampled_from(["identity", "gzip", "deflate", "raw-deflate"]),
    chunked=st.booleans(),
)
def test_wire_decode_inverts_random_bodies(body, chunk_size, enc, chunked):
    """r13 property: for ANY byte string, chunked framing and/or
    gzip / zlib-deflate / raw-deflate content encoding must invert
    EXACTLY through decode_http_body (wire layering order: chunked
    wraps the compressed bytes), with body_decoded=True and the
    original bytes back."""
    import gzip as _gz
    import zlib as _zl

    from dwc_dataframe_validator_spark.sources.warc import decode_http_body

    wire = body
    headers = ["Content-Type: application/octet-stream"]
    if enc == "gzip":
        wire = _gz.compress(wire)
        headers.append("Content-Encoding: gzip")
    elif enc == "deflate":
        wire = _zl.compress(wire)
        headers.append("Content-Encoding: deflate")
    elif enc == "raw-deflate":
        co = _zl.compressobj(wbits=-15)
        wire = co.compress(wire) + co.flush()
        headers.append("Content-Encoding: deflate")
    if chunked:
        out = bytearray()
        for i in range(0, len(wire), chunk_size):
            c = wire[i:i + chunk_size]
            out += format(len(c), "x").encode() + b"\r\n" + c + b"\r\n"
        wire = bytes(out) + b"0\r\n\r\n"
        headers.append("Transfer-Encoding: chunked")
    payload = ("HTTP/1.1 200 OK\r\n" + "\r\n".join(headers)
               + "\r\n\r\n").encode() + wire
    head, got, ce, ch, decoded = decode_http_body(payload)
    assert decoded and got == body
    assert ch == chunked
    assert (ce == "deflate") == (enc in ("deflate", "raw-deflate"))
    assert (ce == "gzip") == (enc == "gzip")


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    kind=st.sampled_from(["gray", "rgb", "rgba", "ga"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_adam7_equals_sequential(h, w, kind, seed):
    """r13 property: PNG is lossless, so for ANY image the Adam7
    interlaced encoding must decode bit-identical to the sequential
    one — random sizes hit every empty/ragged pass combination."""
    import numpy as np

    from dwc_dataframe_validator_spark.operators import multimodal as mm

    ch = {"gray": 1, "rgb": 3, "rgba": 4, "ga": 2}[kind]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
    seq = mm.png_decode_pixels(mm.png_encode(px))
    il = mm.png_decode_pixels(mm.png_encode(px, interlace=True))
    assert il is not None and np.array_equal(seq, il)
    assert np.array_equal(seq, px)  # and lossless vs the source


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    sw=st.integers(min_value=2, max_value=12),
    sh=st.integers(min_value=2, max_value=12),
    n_frames=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_animation_matches_reference_compositor(sw, sh, n_frames, seed):
    """r13 property: gif_encode_anim → gif_decode_frames must equal an
    INDEPENDENT scalar reference compositor implemented here straight
    from the GIF89a spec (disposal 0/1 leave, 2 restore-to-background,
    3 restore-to-previous; transparency holes; sub-rectangles) over
    random screens, frame rects, disposals and transparency."""
    import numpy as np

    from dwc_dataframe_validator_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    pal = bytes(rng.integers(0, 256, size=48).tolist())  # 16 colors
    frames = []
    for _ in range(n_frames):
        fw = int(rng.integers(1, sw + 1))
        fh = int(rng.integers(1, sh + 1))
        left = int(rng.integers(0, sw - fw + 1))
        top = int(rng.integers(0, sh - fh + 1))
        idx = rng.integers(0, 16, size=(fh, fw)).astype(np.uint8)
        disposal = int(rng.integers(0, 4))
        tidx = int(rng.integers(0, 16)) if rng.integers(0, 2) else None
        frames.append((left, top, idx, disposal, tidx))
    bg_idx = int(rng.integers(0, 16))
    blob = mm.gif_encode_anim(frames, pal, sw, sh, bg_idx=bg_idx)
    got = mm.gif_decode_frames(blob)
    assert got is not None and len(got) == n_frames

    # independent reference compositor (scalar, straight from spec)
    p = [pal[3 * i:3 * i + 3] for i in range(16)]
    bg = p[bg_idx]
    canvas = [[bg for _ in range(sw)] for _ in range(sh)]
    want = []
    for left, top, idx, disposal, tidx in frames:
        prev = [row[:] for row in canvas] if disposal == 3 else None
        fh, fw = idx.shape
        for y in range(fh):
            for x in range(fw):
                v = int(idx[y, x])
                if tidx is not None and v == tidx:
                    continue
                canvas[top + y][left + x] = p[v]
        want.append([row[:] for row in canvas])
        if disposal == 2:
            for y in range(fh):
                for x in range(fw):
                    canvas[top + y][left + x] = bg
        elif disposal == 3:
            canvas = prev
    for k in range(n_frames):
        ref = np.array(
            [[list(c) for c in row] for row in want[k]], dtype=np.uint8
        )
        assert np.array_equal(got[k], ref), k


# ---------------------------------------------------------------------------
# round-14 codec/container tiers: hypothesis property tests
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300000))
def test_prop_brotli_zstd_stored_roundtrip(payload):
    """Stored-frame codecs roundtrip ANY byte string byte-exactly
    through the pure tiers (multi-chunk framing included via the
    64 KiB emitter split)."""
    from dwc_dataframe_validator_spark.sources import warc as w

    assert w._brotli_decode(w.brotli_store(payload)) == payload
    assert w._zstd_decode(w.zstd_frame_store(payload)) == payload


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=5000), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=6),
)
def test_prop_media_mux_walk_roundtrip(samples, per_fragment):
    """All three video packagings (classic MP4, fragmented MP4, WebM)
    enumerate EXACTLY the encoded sample bytes they were muxed from,
    for arbitrary sample lists — so cross-container hashes can never
    disagree."""
    from dwc_dataframe_validator_spark.operators import multimodal as mm

    for blob in (
        mm.mp4_mux(samples),
        mm.mp4_mux(samples, single_chunk=True),
        mm.fmp4_mux(samples, per_fragment=per_fragment),
        mm.webm_mux(samples),
    ):
        ranges = mm.media_sample_ranges(blob)
        assert ranges is not None
        assert [blob[o:o + s] for o, s in ranges] == samples


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=2000), min_size=1, max_size=10),
    st.integers(min_value=1, max_value=255),
    st.booleans(),
)
def test_prop_ogg_mux_walk_roundtrip(packets, spp, retag):
    """ogg_mux → ogg_packet_ranges is the identity on packet byte
    lists for arbitrary packets (incl. empty and 255-multiples) under
    every pagination, with codec headers always skipped — so
    Ogg↔WebM cross-container hashes can never disagree."""
    from dwc_dataframe_validator_spark.operators import multimodal as mm

    blob = mm.ogg_mux(
        packets, segs_per_page=spp, headers=mm._opus_headers(retag)
    )
    r = mm.ogg_packet_ranges(blob)
    assert r is not None
    assert [mm._sample_bytes(blob, x) for x in r] == packets
    assert mm.media_sample_ranges(blob) == r


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z]{1,8}(/[a-z]{1,8}){0,2}", fullmatch=True),
            st.binary(min_size=0, max_size=4000),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda kv: kv[0],
    ),
    st.booleans(),
)
def test_prop_tar_roundtrip(members, gz):
    """tar_encode → iter_tar_members is the identity on (name, bytes)
    for arbitrary member lists, plain and gzip."""
    from dwc_dataframe_validator_spark.sources import tar as t

    rows = list(t.iter_tar_members(t.tar_encode(members, gz=gz)))
    assert [(r[1], r[3], r[4]) for r in rows] == [
        (n, d, True) for n, d in members
    ]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z]{1,8}(/[a-z]{1,8}){0,2}", fullmatch=True),
            st.binary(min_size=0, max_size=4000),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda kv: kv[0],
    ),
    st.booleans(),
)
def test_prop_zip_roundtrip(members, deflate):
    """zip_encode → iter_zip_members is the identity on (name, bytes)
    for arbitrary member lists, stored and deflate alike."""
    from dwc_dataframe_validator_spark.sources import zip as z

    rows = list(z.iter_zip_members(z.zip_encode(members, deflate=deflate)))
    assert [(r[1], r[3], r[4]) for r in rows] == [
        (n, d, True) for n, d in members
    ]


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=1000, max_value=48000),
    st.integers(min_value=1000, max_value=48000),
    st.integers(min_value=-32768, max_value=32767),
)
def test_prop_resample_constant_and_bounds(ch, n, src, dst, val):
    """A constant signal resamples to the same constant at any rate
    pair; output length follows floor(n·dst/src) (min 1); output
    values never leave the input's [min, max] envelope (linear
    interpolation is a convex combination)."""
    import numpy as np

    from dwc_dataframe_validator_spark.operators import multimodal as mm

    arr = np.full((n, ch), val, dtype=np.int16)
    out = mm.resample_pcm(arr, src, dst)
    assert (out == val).all()
    if src != dst:
        assert out.shape == (max(1, n * dst // src), ch)
    rnd = np.random.RandomState(42).randint(
        -30000, 30000, size=(n, ch)
    ).astype(np.int16)
    out2 = mm.resample_pcm(rnd, src, dst)
    assert out2.min() >= rnd.min() and out2.max() <= rnd.max()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=3),
)
def test_prop_resize_envelope_and_dims(w, h, ch):
    """Every resize mode lands inside the source value envelope and
    produces exactly the requested dims; identity dims are exact for
    nearest and bilinear."""
    import numpy as np

    from dwc_dataframe_validator_spark.operators import multimodal as mm

    rnd = np.random.RandomState(w * 1000 + h * 10 + ch)
    px = rnd.randint(0, 256, size=(12, 16, ch)).astype(np.uint8)
    for mode in ("nearest", "bilinear"):
        out = mm.image_resize_pixels(px, w, h, mode)
        assert out.shape == (h, w, ch)
        assert out.min() >= px.min() and out.max() <= px.max()
        same = mm.image_resize_pixels(px, 16, 12, mode)
        assert np.array_equal(same, px)
