"""DataFrame validation — Spark rebuild of the reference's check battery.

Parity targets (reference ``dwc_validator/validate.py``):
- ``validate_occurrence_dataframe`` (validate.py:15-84)
- ``validate_event_dataframe``      (validate.py:87-131)
- ``check_id_fields``               (validate.py:209-255)
- ``validate_required_fields``      (validate.py:134-159)
- ``generate_coordinates_report``   (validate.py:162-206)
- ``create_vocabulary_report``      (validate.py:258-315)
- ``validate_numeric_fields``       (validate.py:318-365)

Execution model: every scalar metric for every check is compiled into a
single ``df.agg(...)`` pass via :class:`MetricPlan` (vs the reference's
≥10 eager scans per table).  The only follow-up jobs are the tiny
offender-sample top-k queries for vocabulary reports — and those run
only when the one-pass metrics prove offenders exist.

Documented deviations from the reference (SURVEY.md §2.11):
1. The reference's numeric-field check is a dormant no-op (its
   post-coercion per-element test is always True, validate.py:351-358).
   We implement the *intended* semantics: warn NON_NUMERIC_VALUES_IN_X
   when populated_count > numeric_coercible_count.
2. Vocabulary matching lowers via ``CAST(col AS STRING)``; for
   non-string typed columns pandas' ``.str.lower()`` would yield NaN
   (never matching).  String data — the entire parity surface — behaves
   identically.
3. pandas ``to_datetime`` parses more date formats than bare Spark
   ``try_to_timestamp``.  Closed (round 3) by the multi-format parser in
   ``functions/dates.py`` — a coalesce of format attempts covering the
   common non-ISO shapes (``1/5/2023``, ``20230105``, ``Jan 5, 2023``…),
   still pure Catalyst expressions.  Full dateutil inference is NOT
   claimed; the pinned matrix is tested against pandas engine-for-engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

from ..functions import expressions as E
from ..model import CoordinatesReport, DFValidationReport, VocabularyReport
from ..plans.compiler import MetricPlan
from ..vocab import (
    basis_of_record_vocabulary,
    geodetic_datum_vocabulary,
    lowered,
)

# Well-known column groups (reference validate.py:38-59,325-346)
TAXONOMY_FIELDS = [
    "scientificName", "scientificNameID", "taxonID", "genus",
    "family", "order", "class", "phylum", "kingdom",
]
TEMPORAL_FIELDS = ["eventDate", "year", "month", "day"]
RECORDED_BY_FIELDS = ["recordedBy", "recordedByID"]
NUMERIC_FIELDS = [
    "decimalLatitude", "decimalLongitude", "coordinateUncertaintyInMeters",
    "coordinatePrecision", "elevation", "depth", "minimumDepthInMeters",
    "maximumDepthInMeters", "minimumDistanceAboveSurfaceInMeters",
    "maximumDistanceAboveSurfaceInMeters", "individualCount",
    "organismQuantity", "organismSize", "sampleSizeValue",
    "temperatureInCelsius", "organismAge", "year", "month", "day",
    "startDayOfYear", "endDayOfYear",
]


def _q(col: str) -> str:
    """Backtick-quote a column name for expression safety."""
    return f"`{col}`"


def _register_metrics(
    plan: MetricPlan,
    df: DataFrame,
    id_fields: Optional[Sequence[str]],
    id_term: str,
    vocab_fields: Sequence[tuple[str, frozenset[str]]],
    taxonomy: bool,
) -> None:
    """Declare every scalar metric the report needs into one plan."""
    cols = set(df.columns)

    plan.add("record_count", E.record_count())

    # A2 — per-column populated counts (breakdown.py:37-51), one pass
    for i, c in enumerate(df.columns):
        plan.add(f"cc_{i}", E.populated_count(_q(c)))

    # id fields (check_id_fields, validate.py:209-255)
    for i, field in enumerate(id_fields or []):
        resolved = "id" if id_term == field else field
        if resolved in cols:
            plan.add(f"id_pop_{i}", E.populated_count(_q(resolved)))
            if len(id_fields) == 1:
                plan.add(f"id_dist_{i}", E.distinct_count(_q(resolved)))

    # numeric coercibility (intended semantics of validate.py:318-365)
    for i, field in enumerate(NUMERIC_FIELDS):
        if field in cols:
            plan.add(f"num_valid_{i}", E.valid_numeric_count(_q(field)))

    # required-field groups (validate.py:134-159)
    if taxonomy and any(f in cols for f in TAXONOMY_FIELDS):
        plan.add("taxonomy", E.group_populated_count(
            [_q(f) for f in TAXONOMY_FIELDS if f in cols]))
    if any(f in cols for f in TEMPORAL_FIELDS):
        plan.add("temporal", E.group_populated_count(
            [_q(f) for f in TEMPORAL_FIELDS if f in cols]))
    if any(f in cols for f in RECORDED_BY_FIELDS):
        plan.add("recorded_by", E.group_populated_count(
            [_q(f) for f in RECORDED_BY_FIELDS if f in cols]))

    # coordinates (validate.py:162-206)
    if "decimalLatitude" in cols and "decimalLongitude" in cols:
        plan.add("lat_pop", E.populated_count("`decimalLatitude`"))
        plan.add("lon_pop", E.populated_count("`decimalLongitude`"))
        plan.add("lat_valid", E.valid_range_count("`decimalLatitude`", -90, 90))
        plan.add("lon_valid", E.valid_range_count("`decimalLongitude`", -180, 180))

    # vocabularies (validate.py:258-315)
    for field, vocab in vocab_fields:
        if field in cols:
            plan.add(f"vnull_{field}", E.null_count(_q(field)))
            plan.add(f"vrec_{field}",
                     E.vocab_recognised_count(_q(field), lowered(vocab)))


def _check_id_fields(
    plan: MetricPlan,
    record_count: int,
    id_fields: Optional[Sequence[str]],
    id_term: str,
    columns: Sequence[str],
    errors: list[str],
) -> int:
    """Driver-side replay of check_id_fields' early-return accounting
    (validate.py:209-255, quirks SURVEY.md §2.11.2-3): first missing
    column → error count = all rows; first field with nulls → its null
    count; duplicates only checked when exactly one id field."""
    if not id_fields:
        return 0
    cols = set(columns)
    for i, field in enumerate(id_fields):
        resolved = "id" if id_term == field else field
        if id_term != field and field not in cols:
            errors.append(f"MISSING_{field.upper()}_FIELD")
            return record_count
        if id_term == field and "id" not in cols:
            # reference raises KeyError here (validate.py:229) — only
            # reachable outside the DwC-A path, where `id` always exists
            raise KeyError("id")
        populated = plan[f"id_pop_{i}"]
        if populated < record_count:
            errors.append(f"MISSING_{field.upper()}_FIELD_VALUES")
            return record_count - populated
        if len(id_fields) == 1:
            distinct = plan[f"id_dist_{i}"]
            if distinct != record_count:
                errors.append(f"DUPLICATE_{field.upper()}_VALUES")
                return populated - distinct
    return 0


def _numeric_warnings(
    plan: MetricPlan,
    columns: Sequence[str],
    column_counts: dict[str, int],
    warnings: list[str],
) -> None:
    """Intended semantics of validate_numeric_fields (validate.py:318-365;
    dormant in the reference, see module docstring deviation #1)."""
    cols = list(columns)
    for i, field in enumerate(NUMERIC_FIELDS):
        if field in cols:
            if column_counts[field] > plan[f"num_valid_{i}"]:
                warnings.append(f"NON_NUMERIC_VALUES_IN_{field.upper()}")


def _coordinates_report(
    plan: MetricPlan, columns: Sequence[str], warnings: list[str]
) -> CoordinatesReport:
    """Quirk-preserving shapes (validate.py:162-206, SURVEY.md §2.11.4)."""
    cols = set(columns)
    if "decimalLatitude" not in cols or "decimalLongitude" not in cols:
        return CoordinatesReport(False, 0, 0)
    lat_pop, lon_pop = plan["lat_pop"], plan["lon_pop"]
    lat_valid, lon_valid = plan["lat_valid"], plan["lon_valid"]
    if lat_valid == lat_pop and lon_valid == lon_pop:
        return CoordinatesReport(True, 0, 0)
    warnings.append("INVALID_OR_OUT_OF_RANGE_COORDINATES")
    return CoordinatesReport(True, int(lat_pop - lat_valid), int(lon_pop - lon_valid))


def _vocabulary_report(
    plan: MetricPlan,
    df: DataFrame,
    field: str,
    vocab: frozenset[str],
) -> VocabularyReport:
    """Assemble VocabularyReport (validate.py:258-315).

    ``unrecognised_count`` is DERIVED — record_count − (nulls +
    recognised), validate.py:313 — not independently counted.  The
    offender sample (lexicographic first-10 distinct, 'nan' stripped,
    validate.py:297-300) is a follow-up top-k job, run only when the
    one-pass metrics show offenders exist.
    """
    if field not in df.columns:
        return VocabularyReport(field, False, 0, 0, [])
    record_count = plan["record_count"]
    nulls = plan[f"vnull_{field}"]
    recognised = plan[f"vrec_{field}"]
    unrecognised = int(record_count - (nulls + recognised))
    non_matching: list[str] = []
    if unrecognised > 0:
        sample = E.offending_values_sample(df, field, lowered(vocab), 10)
        non_matching = [r["value"] for r in sample.collect()]
    return VocabularyReport(
        field=field,
        has_field=True,
        recognised_count=int(recognised),
        unrecognised_count=unrecognised,
        non_matching_values=non_matching,
    )


def _validate_dataframe(
    df: DataFrame,
    record_type: str,
    id_fields: Optional[Sequence[str]],
    id_term: str,
    vocab_fields: Sequence[tuple[str, frozenset[str]]],
    taxonomy: bool,
    numeric_warnings: bool = True,
) -> DFValidationReport:
    errors: list[str] = []
    warnings: list[str] = []

    plan = MetricPlan()
    _register_metrics(plan, df, id_fields, id_term, vocab_fields, taxonomy)
    plan.execute(df)  # ONE scan for every scalar metric

    record_count = int(plan["record_count"])
    column_counts = {c: int(plan[f"cc_{i}"]) for i, c in enumerate(df.columns)}

    record_error_count = _check_id_fields(
        plan, record_count, id_fields, id_term, df.columns, errors)
    if numeric_warnings:
        _numeric_warnings(plan, df.columns, column_counts, warnings)
    coordinates_report = _coordinates_report(plan, df.columns, warnings)
    vocab_reports = [
        _vocabulary_report(plan, df, field, vocab)
        for field, vocab in vocab_fields
    ]

    return DFValidationReport(
        record_type=record_type,
        record_count=record_count,
        record_error_count=int(record_error_count),
        errors=errors,
        warnings=warnings,
        coordinates_report=coordinates_report,
        records_with_taxonomy_count=int(plan.get("taxonomy", 0) or 0) if taxonomy else 0,
        records_with_temporal_count=int(plan.get("temporal", 0) or 0),
        records_with_recorded_by_count=int(plan.get("recorded_by", 0) or 0),
        column_counts=column_counts,
        vocab_reports=vocab_reports,
    )


def occurrence_metrics_dataframe(
    df: DataFrame,
    id_fields: Optional[Sequence[str]] = None,
    id_term: str = "",
) -> DataFrame:
    """The validator's single-pass aggregate as a LAZY one-row
    DataFrame (every scalar metric of validate_occurrence_dataframe,
    un-collected, one column per metric aliased by metric name).  For
    callers that want the plan rather than the report — registered as
    the ``occurrence_full_metrics`` driver query."""
    plan = MetricPlan()
    _register_metrics(
        plan, df, id_fields, id_term,
        vocab_fields=[
            ("basisOfRecord", basis_of_record_vocabulary),
            ("geodeticDatum", geodetic_datum_vocabulary),
        ],
        taxonomy=True,
    )
    return plan.aggregate_dataframe(df)


def validate_occurrence_dataframe(
    df: DataFrame,
    id_fields: Optional[Sequence[str]] = None,
    id_term: str = "",
    numeric_warnings: bool = True,
) -> DFValidationReport:
    """Spark rebuild of reference validate.py:15-84.

    ``numeric_warnings=False`` suppresses the NON_NUMERIC_VALUES_IN_X
    warnings for byte-exact parity with the reference, whose own
    numeric check can never fire (dormant bug, SURVEY.md §2.11.1).
    """
    return _validate_dataframe(
        df,
        record_type="Occurrence",
        id_fields=id_fields,
        id_term=id_term,
        vocab_fields=[
            ("basisOfRecord", basis_of_record_vocabulary),
            ("geodeticDatum", geodetic_datum_vocabulary),
        ],
        taxonomy=True,
        numeric_warnings=numeric_warnings,
    )


def validate_event_dataframe(
    df: DataFrame, numeric_warnings: bool = True
) -> DFValidationReport:
    """Spark rebuild of reference validate.py:87-131: eventID hard-coded
    as the id field, geodeticDatum only, taxonomy pinned to 0."""
    return _validate_dataframe(
        df,
        record_type="Event",
        id_fields=["eventID"],
        id_term="",
        vocab_fields=[("geodeticDatum", geodetic_datum_vocabulary)],
        taxonomy=False,
        numeric_warnings=numeric_warnings,
    )
