"""Catalyst expression builders — the operator core.

Every scalar metric the reference computes with an eager pandas pass
(SURVEY.md §2.4 A1-A10, §2.2 P3-P8) is re-expressed here as a *named
aggregate Column*.  The engine collects dozens of these in ONE
``df.agg(*exprs)`` — a single scan with partial aggregation on the
executors and a few longs of final state — instead of the reference's
≥10 full passes per table (``dwc_validator/validate.py:27-84``).

Design rules:
- zero Python UDFs: everything is a built-in expression so it stays
  inside whole-stage codegen;
- ``try_cast`` everywhere a lenient coercion is needed (Spark 4 runs
  with ANSI mode on; ``try_cast`` reproduces pandas
  ``to_numeric(errors='coerce')`` null-on-failure semantics,
  reference validate.py:185-186,351);
- every builder works on both all-string columns (DwC-A parity path)
  and typed columns (parquet driver tables) — casting a double to
  double is a no-op.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# lenient coercions (P8)
# --------------------------------------------------------------------------

def to_double(col: Column | str) -> Column:
    """string→float with null-on-failure (pandas ``to_numeric(errors='coerce')``,
    reference validate.py:185-186,351)."""
    return F.col(col).try_cast("double") if isinstance(col, str) else col.try_cast("double")


def to_timestamp_lenient(col: Column | str) -> Column:
    """string→timestamp with null-on-failure (pandas ``to_datetime(errors='coerce')``,
    reference breakdown.py:86).  Delegates to the multi-format parser
    (functions/dates.py) so non-ISO strings pandas accepts — ``1/5/2023``,
    ``Jan 5, 2023``, ``20230105`` — parse here too; the supported matrix
    is pinned by a three-engine (Spark/DuckDB/pandas) parity test."""
    from .dates import to_timestamp_multiformat

    return to_timestamp_multiformat(col)


# --------------------------------------------------------------------------
# scalar aggregate builders (A1-A10) — each returns an un-aliased Column
# --------------------------------------------------------------------------

def record_count() -> Column:
    """A1 — row count (reference validate.py:74,121 ``len(dataframe)``)."""
    return F.count(F.lit(1))


def populated_count(col: Column | str) -> Column:
    """A3 — non-null count of one column (reference validate.py:181-182)."""
    return F.count(col)


def null_count(col: Column | str) -> Column:
    """A7 — null count (reference validate.py:253 ``isna().sum()``)."""
    return F.count(F.lit(1)) - F.count(col)


def valid_numeric_count(col: Column | str) -> Column:
    """Count of values that survive numeric coercion — the *intended*
    semantics of the reference's dormant numeric check (validate.py:349-363,
    SURVEY.md §2.11.1)."""
    return F.count(to_double(col))


def valid_range_count(col: Column | str, lo: float, hi: float) -> Column:
    """A4 — count coercible AND within [lo, hi] inclusive
    (reference validate.py:185-192)."""
    return F.count(F.when(to_double(col).between(lo, hi), 1))


def group_populated_count(cols: Sequence[Column | str]) -> Column:
    """A5 — rows with ANY of the group columns populated
    (reference validate.py:134-159 ``notnull().any(axis=1)``).

    OR-reduction over ``isNotNull`` rather than ``coalesce(*cols)``:
    coalesce requires one common type, which crashes on mixed-type
    groups (eventDate timestamp + year int) — the boolean reduction is
    type-agnostic and costs the same in codegen."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    if not cols:
        return F.lit(0).cast("long")
    return F.count(F.when(_any_not_null(cols), 1))


def distinct_count(col: Column | str) -> Column:
    """A8 — exact distinct count, null-excluding like pandas ``nunique()``
    (reference validate.py:242)."""
    return F.countDistinct(col)


def approx_distinct_count(col: Column | str, rsd: float = 0.02) -> Column:
    """A8 at scale — HyperLogLog++ one-pass estimate; use as a cheap
    pre-check before the exact shuffle-based confirm."""
    return F.approx_count_distinct(col, rsd)


def duplicate_count(col: Column | str) -> Column:
    """A9 — occurrences after the first of each value, pandas
    ``duplicated().sum()`` = n - n_distinct when null-free
    (reference validate.py:249; nulls guaranteed absent on that path)."""
    return F.count(col) - F.countDistinct(col)


def vocab_recognised_count(col: Column | str, vocab_lowered: Iterable[str]) -> Column:
    """A10 — case-insensitive membership count
    (reference validate.py:280-293)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.count(F.when(F.lower(c.cast("string")).isin(list(vocab_lowered)), 1))


# --------------------------------------------------------------------------
# row-level predicates (P3-P7) — reusable filters
# --------------------------------------------------------------------------

def in_range(col: Column | str, lo: float, hi: float) -> Column:
    """P4 — inclusive range after lenient coercion."""
    return to_double(col).between(lo, hi)


def _any_not_null(cols: Sequence[Column]) -> Column:
    out = cols[0].isNotNull()
    for c in cols[1:]:
        out = out | c.isNotNull()
    return out


def any_populated(cols: Sequence[Column | str]) -> Column:
    """P5 — any-of-group populated (type-agnostic OR reduction; see
    group_populated_count for why not ``coalesce``)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    return _any_not_null(cols)


def vocab_member(col: Column | str, vocab_lowered: Iterable[str]) -> Column:
    """P6 — case-insensitive set membership."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c.cast("string")).isin(list(vocab_lowered))


def vocab_non_member(col: Column | str, vocab_lowered: Iterable[str]) -> Column:
    """P7 — populated but not in vocabulary."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~vocab_member(c, vocab_lowered)


# --------------------------------------------------------------------------
# follow-up jobs (A11-A14) — these need shuffles, so they are DataFrame ops
# --------------------------------------------------------------------------

def value_histogram(df: DataFrame, col: str) -> DataFrame:
    """A11 — value→count histogram, NaN-excluding like ``value_counts()``
    (reference breakdown.py:65-74).  Hash aggregation + AQE-coalesced
    shuffle; output cardinality = |distinct|, tiny vs input."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def top_k_values(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """A12 — top-k values by frequency (reference breakdown.py:54-62).
    ``orderBy(desc).limit(k)`` plans TakeOrderedAndProject: each partition
    keeps a k-heap, no global sort.  Ties broken by value asc for
    determinism (pandas tie order is first-seen — undefined under Spark)."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(k)
    )


def date_parts_histogram(
    df: DataFrame, date_col: str, date_parser="multiformat"
) -> DataFrame:
    """A13 — combined (year, month, day) histogram from a lenient-parsed
    date column (reference breakdown.py:77-102).

    ONE job — ``groupBy(year, month, day).count()`` — instead of three
    separate scans; output cardinality is at most |years|·12·31, so the
    three marginal histograms roll up driver-side for free.  At 100 TB
    this is the difference between one full scan and three.

    ``date_parser`` selects the parse (functions/dates.py
    ``resolve_timestamp_parser``): ``"multiformat"`` (deterministic
    default) or ``"pandas"`` (reference-exact dateutil free text)."""
    from .dates import resolve_timestamp_parser

    parse = resolve_timestamp_parser(date_parser)
    parsed = (
        df.select(parse(date_col).alias("_ts"))
        .filter(F.col("_ts").isNotNull())
    )
    return (
        parsed.groupBy(
            F.year("_ts").alias("year"),
            F.month("_ts").alias("month"),
            F.dayofmonth("_ts").alias("day"),
        ).agg(F.count(F.lit(1)).alias("count"))
    )


def offending_values_sample(
    df: DataFrame, col: str, vocab_lowered: Iterable[str], limit: int = 10
) -> DataFrame:
    """A14 — lexicographically-first ``limit`` distinct non-matching raw
    values (reference validate.py:297-300: ``numpy.unique`` sorts, takes
    the first 10, THEN drops the literal string 'nan').  The 'nan' strip
    happens AFTER the limit, mirroring the reference — so a 'nan' value
    that sorts within the first ``limit`` shrinks the result, exactly as
    pandas does.  distinct → TakeOrderedAndProject; never a full sort."""
    c = F.col(col).cast("string")
    return (
        df.filter(vocab_non_member(c, vocab_lowered))
        .select(c.alias("value"))
        .distinct()
        .orderBy("value")
        .limit(limit)
        .filter(F.col("value") != F.lit("nan"))
    )
