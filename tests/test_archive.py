"""Golden-fixture archive tests — ports of the reference's end-to-end
assertions (``test/test_occurrence_archive.py:23-107`` and
``test/test_event_archive.py:20-29``) run against the reference's own
fixture archives (read-only data under /root/reference)."""

import os

import pytest

from dwc_dataframe_validator_spark import validate_archive
from dwc_dataframe_validator_spark.sources.dwca import (
    get_id_dwc_term,
    read_archive_table,
    read_descriptor,
)

OCC = "/root/reference/dwc_validator/test/occurrence_archives"
EVT = "/root/reference/dwc_validator/test/event_archives"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(OCC), reason="reference fixture archives not present"
)


def test_descriptor_parse():
    desc = read_descriptor(f"{OCC}/dwca-simple")
    assert desc.core.type_tail == "Occurrence"
    assert desc.core.delimiter == ","
    assert desc.core.ignore_header_lines == 1
    assert desc.core.id_index == 0
    names = desc.core.column_names()
    assert names[0] == "id"
    assert "occurrenceID" in names and "basisOfRecord" in names


def test_archive_table_all_string(spark):
    desc = read_descriptor(f"{OCC}/dwca-simple")
    df = read_archive_table(spark, desc, desc.core)
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)
    assert df.count() == 5


def test_get_id_dwc_term():
    desc = read_descriptor(f"{OCC}/dwca-simple")
    # fixture declares <id index=0/> with no <field index=0> — no term
    assert get_id_dwc_term(desc.core.column_names(), desc.core.fields) is None
    assert get_id_dwc_term(["x"], desc.core.fields) is None


# --- ports of test_occurrence_archive.py ----------------------------------

def test_validate_ok(spark):
    rep = validate_archive(spark, f"{OCC}/dwca-simple", ["occurrenceID"])
    assert rep.core.record_count == 5
    assert rep.core.coordinates_report.invalid_decimal_latitude_count == 0
    assert rep.core.coordinates_report.invalid_decimal_longitude_count == 0
    assert rep.core.records_with_temporal_count == 5
    assert rep.core.records_with_recorded_by_count == 5
    assert rep.core.records_with_taxonomy_count == 5
    assert rep.valid
    assert rep.dataset_type == "Occurrence"


def test_validate_bad_coordinates(spark):
    rep = validate_archive(spark, f"{OCC}/dwca-bad-coordinates", ["occurrenceID"])
    assert rep.core.record_count == 5
    assert rep.core.coordinates_report.invalid_decimal_latitude_count == 1
    assert rep.core.coordinates_report.invalid_decimal_longitude_count == 1
    assert "INVALID_OR_OUT_OF_RANGE_COORDINATES" in rep.core.warnings


def test_validate_out_of_range_coordinates(spark):
    rep = validate_archive(spark, f"{OCC}/dwca-out-of-range-coordinates", ["occurrenceID"])
    assert rep.core.record_count == 5
    assert rep.core.coordinates_report.invalid_decimal_latitude_count == 1
    assert rep.core.coordinates_report.invalid_decimal_longitude_count == 1


def test_validate_geodetic_datum(spark):
    rep = validate_archive(spark, f"{OCC}/dwca-bad-geodetic-datum", ["occurrenceID"])
    assert rep.core.record_count == 5
    assert rep.core.coordinates_report.invalid_decimal_latitude_count == 0
    assert rep.core.coordinates_report.invalid_decimal_longitude_count == 0
    gd = next(x for x in rep.core.vocab_reports if x.field == "geodeticDatum")
    assert gd.has_field is True
    assert gd.recognised_count == 4
    assert gd.unrecognised_count == 1


def test_validate_unrecognised_basis_of_record(spark):
    rep = validate_archive(
        spark, f"{OCC}/dwca-unrecognised-basis-of-record", ["occurrenceID"]
    )
    assert rep.core.record_count == 5
    assert rep.core.coordinates_report.invalid_decimal_latitude_count == 0
    assert rep.core.coordinates_report.invalid_decimal_longitude_count == 0
    bor = next(x for x in rep.core.vocab_reports if x.field == "basisOfRecord")
    assert bor.has_field is True
    assert bor.recognised_count == 3
    assert bor.unrecognised_count == 2
    assert bor.non_matching_values[0] == "NONSENSE"


# --- port of test_event_archive.py ----------------------------------------

def test_validate_event_ok(spark):
    rep = validate_archive(spark, f"{EVT}/dwca-simple")
    assert rep.core.record_count == 5
    assert rep.core.coordinates_report.invalid_decimal_latitude_count == 0
    assert rep.core.coordinates_report.invalid_decimal_longitude_count == 0
    assert rep.core.record_type == "Event"
    # only the Occurrence extension is validated (MeasurementOrFact skipped)
    assert len(rep.extensions) == 1
    assert rep.extensions[0].record_type == "Occurrence"
    # extension id check skipped — id_fields passed through as None
    assert rep.extensions[0].record_error_count == 0
    # eventDate breakdowns merged from the core table
    assert "year" in rep.breakdowns and "month" in rep.breakdowns


def test_register_archive_views(spark):
    from dwc_dataframe_validator_spark.sources.dwca import register_archive_views

    names = register_archive_views(spark, f"{EVT}/dwca-simple")
    assert names[0] == "dwca_core"
    assert "dwca_Occurrence" in names and "dwca_MeasurementOrFact" in names
    assert spark.sql("SELECT count(*) AS n FROM dwca_core").collect()[0]["n"] == 5
    joined = spark.sql(
        "SELECT count(*) AS n FROM dwca_core c JOIN dwca_Occurrence o ON o.coreid = c.id"
    ).collect()[0]["n"]
    assert joined > 0


def test_zip_archive(spark, tmp_path):
    import shutil

    zip_base = str(tmp_path / "dwca-simple")
    shutil.make_archive(zip_base, "zip", f"{OCC}/dwca-simple")
    rep = validate_archive(spark, zip_base + ".zip", ["occurrenceID"])
    assert rep.core.record_count == 5
    assert rep.valid


def test_unsupported_core_type(spark, tmp_path):
    meta = """<?xml version="1.0" encoding="UTF-8"?>
<archive xmlns="http://rs.tdwg.org/dwc/text/">
  <core rowType="http://rs.tdwg.org/dwc/terms/Taxon" fieldsTerminatedBy=","
        linesTerminatedBy="\\n" ignoreHeaderLines="1">
    <files><location>taxon.txt</location></files>
    <id index="0" />
    <field index="1" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
  </core>
</archive>"""
    (tmp_path / "meta.xml").write_text(meta)
    (tmp_path / "taxon.txt").write_text("id,scientificName\n1,Ursus arctos\n")
    rep = validate_archive(spark, str(tmp_path))
    assert rep.core.errors == ["UNSUPPORTED_CORE_TYPE"]
    assert not rep.valid
    assert rep.dataset_type == "Taxon"
    assert rep.core.record_count == 0
