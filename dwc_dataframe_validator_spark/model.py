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
