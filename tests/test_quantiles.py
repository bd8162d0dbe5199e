"""Approx-percentile twins: the rank-error guarantee that justifies
them as the 100 TB path.

approx_percentile(accuracy) promises the returned value's true rank r
satisfies |r/n − q| ≤ 1/accuracy.  Each test computes the approx value,
then measures its actual rank in the exact data and asserts the bound
(with the value-ties convention: any rank within the tied run counts).
"""

import pytest
from pyspark.sql import functions as F

from dwc_dataframe_validator_spark.operators import quantiles as Q
from dwc_dataframe_validator_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
ACC = 10000


def _rank_bounds(values, v):
    """(lo, hi) fraction of values strictly below / at-or-below v —
    any true rank of v lies in [lo, hi]."""
    n = len(values)
    below = sum(1 for x in values if x < v)
    at_or_below = sum(1 for x in values if x <= v)
    return below / n, at_or_below / n


def _assert_rank(values, v, q, accuracy=ACC):
    lo, hi = _rank_bounds(values, v)
    # GK bound is ceil(n/accuracy) POSITIONS; at small n that floors at
    # one position, so the fractional slack is 1/accuracy + 1/n
    eps = 1.0 / accuracy + 1.0 / len(values) + 1e-9
    assert lo - eps <= q <= hi + eps, (q, v, lo, hi)


def test_numeric_profile_approx_quartile_ranks(spark):
    li = load_table(spark, SF, "lineitem")
    row = Q.numeric_profile_approx(li, "l_extendedprice", accuracy=ACC).first()
    values = [r[0] for r in li.select("l_extendedprice").collect()]
    assert row["cnt"] == len(values)
    assert row["mn"] == min(values) and row["mx"] == max(values)
    for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
        _assert_rank(values, row[col], q)


def test_grouped_quantiles_approx_ranks(spark):
    ev = load_table(spark, SF, "events")
    rows = Q.grouped_quantiles_approx(ev, "event_type", "value", accuracy=ACC).collect()
    by_group = {
        g["event_type"]: [r[0] for r in rows2]
        for g in ev.select("event_type").distinct().collect()
        for rows2 in [
            ev.filter(
                (F.col("event_type") == g["event_type"])
                & F.col("value").isNotNull()
            )
            .select("value")
            .collect()
        ]
    }
    assert len(rows) == len(by_group)
    for r in rows:
        vals = by_group[r["event_type"]]
        for q, col in [(0.25, "q1"), (0.5, "q2"), (0.75, "q3")]:
            _assert_rank(vals, r[col], q)


def test_value_deciles_approx_bucket_mass(spark):
    ev = load_table(spark, SF, "events")
    rows = Q.value_deciles_approx(ev, "value", accuracy=ACC).collect()
    n = ev.filter(F.col("value").isNotNull()).count()
    got = {r["decile"]: r["n"] for r in rows}
    assert sum(got.values()) == n  # partition of the non-null values
    # each decile holds ~10% ± (rank error + boundary-tie slack)
    for d, cnt in got.items():
        assert 1 <= d <= 10
        assert abs(cnt / n - 0.1) < 0.05, (d, cnt, n)
    # buckets are value-ordered and non-overlapping
    ordered = sorted(rows, key=lambda r: r["decile"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] <= b["lo"]


def test_iqr_outliers_approx_matches_exact_fences(spark):
    ev = load_table(spark, SF, "events")
    row = Q.iqr_outliers_approx(ev, "value", accuracy=ACC).first()
    values = sorted(
        r[0] for r in ev.filter(F.col("value").isNotNull()).select("value").collect()
    )
    # exact fences for comparison
    import statistics

    q1, _, q3 = statistics.quantiles(values, n=4, method="inclusive")
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    exact_n = sum(1 for v in values if v < lo or v > hi)
    # sketched fences may shift by the rank error at the quartiles; the
    # outlier COUNT shifts by at most the values inside that rank slack
    slack = max(2, int(2 * len(values) / ACC) + 2)
    assert abs(row["n_outliers"] - exact_n) <= slack


def test_numeric_profile_approx_registry_entry(spark):
    from dwc_dataframe_validator_spark.registry import QUERIES

    row = QUERIES["numeric_profile_approx"](spark, SF).first()
    assert row["p25"] <= row["p50"] <= row["p75"]
    assert row["cnt"] > 0


def test_approx_profile_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "v double")
    row = Q.numeric_profile_approx(empty, "v").first()
    assert row["cnt"] == 0 and row["p50"] is None
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    row = Q.numeric_profile_approx(nulls, "v").first()
    assert row["cnt"] == 0 and row["p50"] is None


def test_select_top_fraction_approx_error_bound(spark):
    """The bounded-state fraction selector's rank error is within the
    Greenwald-Khanna contract: selected count within n/accuracy-ish of
    the exact selector's, and every exactly-selected high scorer above
    the approx cutoff's error band is included."""
    from pyspark.sql import functions as F

    from dwc_dataframe_validator_spark.operators.selection import (
        select_top_fraction,
        select_top_fraction_approx,
    )

    df = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, 10_000).cast("double") / 100.0).alias("score"),
    )
    exact = select_top_fraction(df, 0.1, "score").count()
    approx = select_top_fraction_approx(df, 0.1, "score", accuracy=10_000)
    n = approx.count()
    # rank error <= total/accuracy = 2; allow 10x slack for ties
    assert abs(n - exact) <= 20, (n, exact)

    per = select_top_fraction_approx(
        df.withColumn("grp", F.pmod("doc_id", 4).cast("string")),
        0.25, "score", group_col="grp",
    )
    by = {r["grp"]: r["cnt"] for r in
          per.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    for g, c in by.items():
        assert abs(c - 1250) <= 30, (g, c)
