"""Breakdown (histogram / top-k) generation.

Parity target: reference ``dwc_validator/breakdown.py``:
- ``generate_breakdowns``          (breakdown.py:9-34)
- ``field_populated_counts``       (breakdown.py:37-51) — folded into the
  validator's single-pass MetricPlan (operators/validate.py)
- ``top_values_breakdown``         (breakdown.py:54-62)
- ``simple_breakdown``             (breakdown.py:65-74)
- ``generate_event_date_breakdown``(breakdown.py:77-102)

Quirk preserved (SURVEY.md §2.11.6): when both raw ``year``/``month``/
``day`` columns AND ``eventDate`` exist, the eventDate-derived
histograms OVERWRITE the raw-column ones.  The reference also mutates
the caller's frame (breakdown.py:86) — we do not (Spark frames are
immutable anyway).

Scale notes: each breakdown is a hash aggregation whose output
cardinality is the column's distinct count — tiny relative to input.
Top-k plans TakeOrderedAndProject (per-partition k-heaps, no global
sort).  The dict-typed return values mirror the reference's report
shape; callers that need dataframes use functions/expressions.py
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import expressions as E


def simple_breakdown(df: DataFrame, field: str) -> dict[str, int]:
    """value→count histogram, null-excluding (breakdown.py:65-74).
    Key order is irrelevant (dict)."""
    rows = E.value_histogram(df, field).collect()
    return {r["value"]: r["count"] for r in rows}


def top_values_breakdown(df: DataFrame, field: str, limit: int) -> dict[str, int]:
    """Top-``limit`` values by frequency (breakdown.py:54-62).  Tie order:
    value-ascending (deterministic), vs pandas first-seen."""
    rows = E.top_k_values(df, field, limit).collect()
    return {r["value"]: r["count"] for r in rows}


def generate_event_date_breakdown(
    df: DataFrame, date_col: str = "eventDate"
) -> tuple[dict[str, int], dict[str, int], dict[str, int]]:
    """year/month/day histograms of lenient-parsed dates
    (breakdown.py:77-102).  One projected frame feeds three small jobs."""
    hists = E.date_part_histograms(df, date_col)
    out = []
    for name in ("year", "month", "day"):
        rows = hists[name].collect()
        out.append({r["value"]: r["count"] for r in rows})
    return tuple(out)


def generate_breakdowns(df: DataFrame) -> dict[str, dict[str, int]]:
    """Reference breakdown.py:9-34, including the eventDate-overwrites-
    raw-columns quirk."""
    breakdowns: dict[str, dict[str, int]] = {}
    cols = set(df.columns)
    if "year" in cols:
        breakdowns["year"] = simple_breakdown(df, "year")
    if "month" in cols:
        breakdowns["month"] = simple_breakdown(df, "month")
    if "day" in cols:
        breakdowns["day"] = simple_breakdown(df, "day")
    if "scientificName" in cols:
        breakdowns["scientificName"] = top_values_breakdown(df, "scientificName", 20)
    if "family" in cols:
        breakdowns["family"] = top_values_breakdown(df, "family", 20)
    if "eventDate" in cols:
        year_bd, month_bd, day_bd = generate_event_date_breakdown(df)
        breakdowns["year"] = year_bd
        breakdowns["month"] = month_bd
        breakdowns["day"] = day_bd
    return breakdowns


def field_populated_counts(df: DataFrame) -> dict[str, int]:
    """Per-column non-null counts in ONE pass (breakdown.py:37-51).
    The validator computes these inside its MetricPlan; this standalone
    form exists for API parity."""
    row = df.agg(*[E.populated_count(f"`{c}`").alias(f"m{i}")
                   for i, c in enumerate(df.columns)]).collect()[0]
    return {c: int(row[f"m{i}"]) for i, c in enumerate(df.columns)}
