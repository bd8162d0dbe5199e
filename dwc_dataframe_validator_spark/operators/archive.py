"""Darwin Core Archive validation — Spark rebuild of reference
``dwc_validator/validate_dwca.py:15-98``.

Flow (same dispatch, distributed scans): parse meta.xml (driver) →
``spark.read.csv`` per table (all-string schema) → core-type dispatch
(Occurrence / Event / ``UNSUPPORTED_CORE_TYPE`` stub) → Event cores
additionally validate each Occurrence extension → assemble
:class:`DwCAValidationReport`.

Quirks preserved:
- ``valid`` = core errors empty; warnings and extension errors are
  ignored (validate_dwca.py:92, SURVEY.md §2.11.7);
- extension validation passes the caller's ``id_fields`` straight
  through — ``None`` by default, so occurrence *extensions* get no id
  check (validate_dwca.py:86, §2.11.8);
- breakdowns of every validated table merge into ONE dict, later
  tables overwriting earlier keys (validate_dwca.py:73,89);
- ``dataset_type`` is the core row-type URI tail; unknown/empty →
  ``"unknown"`` (validate_dwca.py:33-36).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import SparkSession

from ..model import DFValidationReport, DwCAValidationReport
from ..sources.dwca import get_id_dwc_term, read_archive_table, read_descriptor
from .breakdown import generate_breakdowns
from .validate import validate_event_dataframe, validate_occurrence_dataframe

_OCCURRENCE = "Occurrence"
_EVENT = "Event"


def validate_archive(
    spark: SparkSession,
    archive_path: str,
    id_fields: Optional[Sequence[str]] = None,
    numeric_warnings: bool = False,
    date_parser: str = "multiformat",
) -> DwCAValidationReport:
    """Validate a DwC-A directory or zip.

    ``numeric_warnings`` defaults to False here (byte-parity with the
    reference archive path, whose numeric check can never fire —
    SURVEY.md §2.11.1); pass True for the intended-semantics warnings.

    ``date_parser`` reaches the eventDate breakdown parse:
    ``"multiformat"`` (deterministic default) or ``"pandas"`` —
    the reference's own ``pd.to_datetime`` free-text behavior
    (reference breakdown.py:86) for archives whose dates are dateutil
    prose the format table leaves NULL.
    """
    desc = read_descriptor(archive_path)
    core_df = read_archive_table(spark, desc, desc.core)

    core_type = desc.core.row_type
    dataset_type = desc.core.type_tail if core_type else "unknown"

    if desc.core.type_tail == _OCCURRENCE:
        if not id_fields:
            id_fields = ["occurrenceID"]
        id_term = get_id_dwc_term(core_df.columns, desc.core.fields)
        core_report = validate_occurrence_dataframe(
            core_df, id_fields, id_term or "", numeric_warnings=numeric_warnings
        )
    elif desc.core.type_tail == _EVENT:
        core_report = validate_event_dataframe(
            core_df, numeric_warnings=numeric_warnings
        )
    else:
        core_report = DFValidationReport(
            record_type=core_type,
            errors=["UNSUPPORTED_CORE_TYPE"],
            warnings=[],
            column_counts={},
            record_count=0,
            record_error_count=0,
            coordinates_report=None,
            records_with_taxonomy_count=0,
            records_with_temporal_count=0,
            records_with_recorded_by_count=0,
        )

    breakdowns: dict = {}
    breakdowns.update(generate_breakdowns(core_df, date_parser=date_parser))

    extension_reports: list[DFValidationReport] = []
    if desc.core.type_tail == _EVENT and desc.extensions:
        for ext in desc.extensions:
            if ext.type_tail == _OCCURRENCE:
                ext_df = read_archive_table(spark, desc, ext)
                extension_reports.append(
                    validate_occurrence_dataframe(
                        ext_df, id_fields, numeric_warnings=numeric_warnings
                    )
                )
                breakdowns.update(
                    generate_breakdowns(ext_df, date_parser=date_parser)
                )

    return DwCAValidationReport(
        valid=len(core_report.errors) == 0,
        core_type=core_type,
        dataset_type=dataset_type,
        core=core_report,
        extensions=extension_reports,
        breakdowns=breakdowns,
    )
