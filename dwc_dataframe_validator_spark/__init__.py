"""dwc_dataframe_validator_spark — a PySpark-native rebuild of the
djtfmartin/dwc-dataframe-validator capabilities.

Declarative validation/profiling engine: checks compile to Catalyst
aggregate expressions, one scan per table computes all scalar metrics,
a handful of small shuffle jobs compute histograms/top-k, reports are
plain dataclasses with the reference's JSON shape.  Extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, streaming validation).
"""

from .model import (
    CoordinatesReport,
    DFValidationReport,
    DwCAValidationReport,
    VocabularyReport,
    report_to_dict,
    report_to_json,
)
from .operators.archive import validate_archive
from .operators.breakdown import field_populated_counts, generate_breakdowns
from .operators.validate import (
    validate_event_dataframe,
    validate_occurrence_dataframe,
)
from .vocab import basis_of_record_vocabulary, geodetic_datum_vocabulary

__version__ = "0.1.0"

__all__ = [
    "CoordinatesReport",
    "DFValidationReport",
    "DwCAValidationReport",
    "VocabularyReport",
    "basis_of_record_vocabulary",
    "field_populated_counts",
    "generate_breakdowns",
    "geodetic_datum_vocabulary",
    "report_to_dict",
    "report_to_json",
    "validate_archive",
    "validate_event_dataframe",
    "validate_occurrence_dataframe",
]
