"""Validation-report model.

Dataclass mirrors of the reference's plain-Python report classes
(``dwc_validator/model.py:8-98``) with identical JSON key names
(README.md:62-100).  Reports are assembled driver-side from collected
aggregate rows; they are deliberately *not* DataFrames — the report for
a 100 TB table is still a handful of scalars, histograms and top-k
lists.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any, Optional


@dataclass
class CoordinatesReport:
    """Mirror of reference model.py:8-20."""

    has_coordinates_fields: bool
    invalid_decimal_latitude_count: int
    invalid_decimal_longitude_count: int


@dataclass
class VocabularyReport:
    """Mirror of reference model.py:24-41."""

    field: str
    has_field: bool
    recognised_count: int
    unrecognised_count: int
    non_matching_values: list[str] = field(default_factory=list)


@dataclass
class DFValidationReport:
    """Mirror of reference model.py:45-76 (same JSON key names)."""

    record_type: str
    record_count: int
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    coordinates_report: Optional[CoordinatesReport] = None
    column_counts: dict[str, int] = field(default_factory=dict)
    record_error_count: int = 0
    records_with_taxonomy_count: int = 0
    records_with_temporal_count: int = 0
    records_with_recorded_by_count: int = 0
    vocab_reports: list[VocabularyReport] = field(default_factory=list)


@dataclass
class DwCAValidationReport:
    """Mirror of reference model.py:80-98.

    ``valid`` follows the reference quirk (validate_dwca.py:92): only
    *core errors* decide validity; warnings and extension errors are
    ignored.
    """

    valid: bool
    core_type: str
    dataset_type: str
    core: DFValidationReport
    extensions: list[DFValidationReport] = field(default_factory=list)
    breakdowns: dict[str, Any] = field(default_factory=dict)


def report_to_dict(report: Any) -> dict[str, Any]:
    """Plain-dict form, matching jsonpickle(unpicklable=False) output."""
    return asdict(report)


def report_to_json(report: Any, indent: int | None = 2) -> str:
    """JSON form of any report dataclass (reference README.md:58)."""
    return json.dumps(asdict(report), indent=indent, default=str)


def merge_df_reports(
    a: DFValidationReport,
    b: DFValidationReport,
    max_vocab_samples: int = 10,
) -> DFValidationReport:
    """Merge of two slice reports — the incremental-validation path at
    100 TB: validate each partition/day slice independently
    (embarrassingly parallel, no cross-slice shuffle), then fold the
    reports.  Counts sum, lists union — pinned by tests/test_sinks.py.

    CONTRACT — duplicate-ID errors are per-slice only.  The reference's
    ``check_id_fields`` (validate.py:246-249) counts duplicates within
    the validated frame; an ID appearing once in slice A and once in
    slice B is a duplicate of the union but of neither slice, so the
    merged ``record_error_count`` can undercount versus one validation
    over the union.  Merge-then-report equals report-on-union exactly
    IFF ID values are unique across slices (e.g. slicing by ingest file
    where IDs don't repeat across files); otherwise run the dedicated
    global pass — ``operators.integrity.global_duplicate_ids`` (one
    shuffle; same populated−distinct error accounting, pinned with
    this merge in tests/test_sinks.py) — alongside the fold.  All OTHER fields
    (populated counts, coordinate bounds, vocab, temporal/taxonomy
    flags) are row-local, hence exactly additive regardless.
    Distinct/duplicate counts are deliberately NOT part of the report
    dataclass (they live in the metrics queries, where merging needs
    HLL sketch union, not ints).

    ``non_matching_values`` follows the reference's first-N
    lexicographic sample contract (validate.py A14 semantics): union,
    sort, cap — identical to what a single pass over the union emits
    because the sample is the N smallest distinct values.
    """
    if a.record_type != b.record_type:
        raise ValueError(
            f"cannot merge reports of different record types: "
            f"{a.record_type!r} vs {b.record_type!r}"
        )
    cols = dict(a.column_counts)
    for k, v in b.column_counts.items():
        cols[k] = cols.get(k, 0) + v
    coords = None
    if a.coordinates_report or b.coordinates_report:
        ca, cb = a.coordinates_report, b.coordinates_report
        zero = CoordinatesReport(False, 0, 0)
        ca, cb = ca or zero, cb or zero
        coords = CoordinatesReport(
            has_coordinates_fields=ca.has_coordinates_fields
            or cb.has_coordinates_fields,
            invalid_decimal_latitude_count=ca.invalid_decimal_latitude_count
            + cb.invalid_decimal_latitude_count,
            invalid_decimal_longitude_count=ca.invalid_decimal_longitude_count
            + cb.invalid_decimal_longitude_count,
        )
    vb = {r.field: r for r in b.vocab_reports}
    vocab = []
    for ra in a.vocab_reports:
        rb = vb.pop(ra.field, None)
        if rb is None:
            vocab.append(ra)
            continue
        vocab.append(
            VocabularyReport(
                field=ra.field,
                has_field=ra.has_field or rb.has_field,
                recognised_count=ra.recognised_count + rb.recognised_count,
                unrecognised_count=ra.unrecognised_count
                + rb.unrecognised_count,
                non_matching_values=sorted(
                    set(ra.non_matching_values) | set(rb.non_matching_values)
                )[:max_vocab_samples],
            )
        )
    vocab.extend(vb.values())
    return DFValidationReport(
        record_type=a.record_type,
        record_count=a.record_count + b.record_count,
        errors=a.errors + [e for e in b.errors if e not in a.errors],
        warnings=a.warnings + [w for w in b.warnings if w not in a.warnings],
        coordinates_report=coords,
        column_counts=cols,
        record_error_count=a.record_error_count + b.record_error_count,
        records_with_taxonomy_count=a.records_with_taxonomy_count
        + b.records_with_taxonomy_count,
        records_with_temporal_count=a.records_with_temporal_count
        + b.records_with_temporal_count,
        records_with_recorded_by_count=a.records_with_recorded_by_count
        + b.records_with_recorded_by_count,
        vocab_reports=vocab,
    )
