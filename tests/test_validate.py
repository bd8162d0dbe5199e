"""Validator-core tests: golden assertions mirroring the reference's
test style (test_occurrence_archive.py) plus the gap fixtures the
reference never covered (FIXTURES.md §F3), plus a live parity test
against the reference library itself when importable."""

import json
import sys

import pytest

from dwc_dataframe_validator_spark import (
    report_to_dict,
    validate_event_dataframe,
    validate_occurrence_dataframe,
)

COLS = ["occurrenceID", "scientificName", "decimalLatitude", "decimalLongitude",
        "eventDate", "recordedBy", "geodeticDatum", "basisOfRecord"]

CLEAN = [
    ("1", "Ursus arctos", "51.0", "-1.1", "2023-01-01", "A", "WGS84", "HumanObservation"),
    ("2", "Ursus arctos", "52.0", "-1.2", "2023-01-02", "B", "WGS84", "HumanObservation"),
    ("3", "Ursus arctos", "53.0", "-1.3", "2023-01-03", "C", "WGS84", "Observation"),
    ("4", "Vulpes vulpes", "54.0", "-1.4", "2023-01-04", "D", "WGS84", "Observation"),
    ("5", "Vulpes vulpes", "55.0", "-1.5", "2023-01-05", "E", "WGS84", "MaterialSample"),
]


def _df(spark, rows, cols=COLS):
    return spark.createDataFrame(rows, cols)


def test_clean_occurrence(spark):
    rep = validate_occurrence_dataframe(_df(spark, CLEAN), ["occurrenceID"])
    assert rep.record_count == 5
    assert rep.errors == []
    assert rep.warnings == []
    assert rep.record_error_count == 0
    assert rep.coordinates_report.has_coordinates_fields
    assert rep.coordinates_report.invalid_decimal_latitude_count == 0
    assert rep.coordinates_report.invalid_decimal_longitude_count == 0
    assert rep.records_with_taxonomy_count == 5
    assert rep.records_with_temporal_count == 5
    assert rep.records_with_recorded_by_count == 5
    assert rep.column_counts["occurrenceID"] == 5
    bor = rep.vocab_reports[0]
    assert (bor.field, bor.recognised_count, bor.unrecognised_count) == ("basisOfRecord", 5, 0)


def test_bad_coordinates(spark):
    rows = [r[:2] + ("bad", r[3]) + r[4:] if r[0] == "4" else r for r in CLEAN]
    rows = [r[:3] + ("bad",) + r[4:] if r[0] == "5" else r for r in rows]
    rep = validate_occurrence_dataframe(_df(spark, rows), ["occurrenceID"])
    assert rep.coordinates_report.invalid_decimal_latitude_count == 1
    assert rep.coordinates_report.invalid_decimal_longitude_count == 1
    assert "INVALID_OR_OUT_OF_RANGE_COORDINATES" in rep.warnings


def test_out_of_range_coordinates(spark):
    rows = [r[:2] + ("91", r[3]) + r[4:] if r[0] == "4" else r for r in CLEAN]
    rows = [r[:3] + ("181",) + r[4:] if r[0] == "5" else r for r in rows]
    rep = validate_occurrence_dataframe(_df(spark, rows), ["occurrenceID"])
    assert rep.coordinates_report.invalid_decimal_latitude_count == 1
    assert rep.coordinates_report.invalid_decimal_longitude_count == 1


def test_bad_geodetic_datum(spark):
    rows = [r[:6] + ("GIRAFFE", r[7]) if r[0] == "5" else r for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows), ["occurrenceID"])
    gd = [v for v in rep.vocab_reports if v.field == "geodeticDatum"][0]
    assert gd.has_field
    assert gd.recognised_count == 4
    assert gd.unrecognised_count == 1
    assert gd.non_matching_values == ["GIRAFFE"]


def test_unrecognised_basis_of_record(spark):
    rows = [r[:7] + ("NONSENSE",) if r[0] in ("4", "5") else r for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows), ["occurrenceID"])
    bor = [v for v in rep.vocab_reports if v.field == "basisOfRecord"][0]
    assert bor.recognised_count == 3
    assert bor.unrecognised_count == 2
    assert bor.non_matching_values[0] == "NONSENSE"


def test_case_insensitive_vocab(spark):
    rows = [r[:7] + ("humanobservation",) if r[0] == "1" else r for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows), ["occurrenceID"])
    bor = [v for v in rep.vocab_reports if v.field == "basisOfRecord"][0]
    assert bor.recognised_count == 5


# ---- gap fixtures the reference never tested (FIXTURES.md §F3) ----

def test_duplicate_id(spark):
    rows = [("1" if r[0] == "2" else r[0],) + r[1:] for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows), ["occurrenceID"])
    assert "DUPLICATE_OCCURRENCEID_VALUES" in rep.errors
    assert rep.record_error_count == 1  # duplicated().sum() semantics: n - n_distinct


def test_missing_id_values(spark):
    rows = [(None,) + r[1:] if r[0] == "3" else r for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows), ["occurrenceID"])
    assert "MISSING_OCCURRENCEID_FIELD_VALUES" in rep.errors
    assert rep.record_error_count == 1


def test_missing_id_column(spark):
    rows = [r[1:] for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows, COLS[1:]), ["occurrenceID"])
    assert "MISSING_OCCURRENCEID_FIELD" in rep.errors
    assert rep.record_error_count == 5


def test_multiple_id_fields_skip_uniqueness(spark):
    # two id fields: completeness checked per-field, uniqueness skipped
    rows = [("1" if r[0] == "2" else r[0],) + r[1:] for r in CLEAN]
    rep = validate_occurrence_dataframe(
        _df(spark, rows), ["occurrenceID", "scientificName"])
    assert rep.errors == []
    assert rep.record_error_count == 0


def test_non_numeric_numeric_field_intended_semantics(spark):
    cols = COLS + ["individualCount"]
    rows = [r + ("many" if r[0] == "3" else "2",) for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows, cols), ["occurrenceID"])
    assert "NON_NUMERIC_VALUES_IN_INDIVIDUALCOUNT" in rep.warnings
    # parity mode suppresses (reference bug is dormant)
    rep2 = validate_occurrence_dataframe(
        _df(spark, rows, cols), ["occurrenceID"], numeric_warnings=False)
    assert all(not w.startswith("NON_NUMERIC") for w in rep2.warnings)


def test_missing_coordinates_columns(spark):
    cols = [c for c in COLS if not c.startswith("decimal")]
    rows = [tuple(v for c, v in zip(COLS, r) if not c.startswith("decimal")) for r in CLEAN]
    rep = validate_occurrence_dataframe(_df(spark, rows, cols), ["occurrenceID"])
    assert rep.coordinates_report.has_coordinates_fields is False


def test_event_dataframe(spark):
    cols = ["eventID", "eventDate", "decimalLatitude", "decimalLongitude"]
    rows = [(f"e{i}", f"2023-01-0{i}", "51.0", "-1.1") for i in range(1, 6)]
    rep = validate_event_dataframe(spark.createDataFrame(rows, cols))
    assert rep.record_type == "Event"
    assert rep.record_count == 5
    assert rep.records_with_taxonomy_count == 0
    assert rep.coordinates_report.invalid_decimal_latitude_count == 0
    assert [v.field for v in rep.vocab_reports] == ["geodeticDatum"]


def test_json_round_trip(spark, occurrence_df):
    rep = validate_occurrence_dataframe(occurrence_df, ["occurrenceID"])
    d = json.loads(json.dumps(report_to_dict(rep)))
    assert d["record_count"] == 5
    assert set(d) == {
        "record_type", "record_count", "errors", "warnings",
        "coordinates_report", "column_counts", "record_error_count",
        "records_with_taxonomy_count", "records_with_temporal_count",
        "records_with_recorded_by_count", "vocab_reports",
    }


def test_live_parity_with_reference(spark, occurrence_df):
    """Run the actual reference library on the same rows and compare
    every report field (modulo the documented numeric-warning
    deviation)."""
    sys.path.insert(0, "/root/reference")
    try:
        import pandas as pd
        from dwc_validator.validate import (
            validate_occurrence_dataframe as ref_validate,
        )
    except ImportError:
        pytest.skip("reference library not importable")
    pdf = occurrence_df.toPandas()
    ref = ref_validate(pd.DataFrame(pdf), ["occurrenceID"])
    ours = validate_occurrence_dataframe(
        occurrence_df, ["occurrenceID"], numeric_warnings=False)
    assert ours.record_count == ref.record_count
    assert ours.errors == ref.errors
    assert ours.warnings == ref.warnings
    assert ours.record_error_count == int(ref.record_error_count)
    assert ours.column_counts == {k: int(v) for k, v in ref.column_counts.items()}
    assert ours.records_with_taxonomy_count == int(ref.records_with_taxonomy_count)
    assert ours.records_with_temporal_count == int(ref.records_with_temporal_count)
    assert ours.records_with_recorded_by_count == int(ref.records_with_recorded_by_count)
    assert ours.coordinates_report.__dict__ == ref.coordinates_report.__dict__
    for mine, theirs in zip(ours.vocab_reports, ref.vocab_reports):
        assert mine.field == theirs.field
        assert mine.recognised_count == int(theirs.recognised_count)
        assert mine.unrecognised_count == int(theirs.unrecognised_count)
        assert mine.non_matching_values == list(theirs.non_matching_values)
