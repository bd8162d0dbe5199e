"""Tests over the repo-shipped DwC-A fixture (tests/fixtures/dwca-profile):
multi-<location> core, per-file header skip, <id index> materialization,
index-less default field, extension scan — plus the registered
``dwca_archive_profile`` query pinned to its expected literal values
(the DuckDB oracle only proves Spark≡DuckDB; this proves both are
*right*)."""

import os

from dwc_dataframe_validator_spark.registry import QUERIES, _DWCA_FIXTURE
from dwc_dataframe_validator_spark.sources.dwca import (
    read_archive_table,
    read_descriptor,
)


def test_fixture_descriptor_multi_location():
    desc = read_descriptor(_DWCA_FIXTURE)
    assert desc.core.locations == ["occurrence_1.txt", "occurrence_2.txt"]
    assert desc.core.delimiter == "\t"
    assert desc.core.ignore_header_lines == 1
    assert desc.core.default_columns() == [("countryCode", "AU")]
    assert [e.type_tail for e in desc.extensions] == ["Multimedia"]


def test_fixture_core_scan_spans_locations(spark):
    desc = read_descriptor(_DWCA_FIXTURE)
    core = read_archive_table(spark, desc, desc.core)
    rows = {r["id"]: r for r in core.collect()}
    # 5 rows per file, header skipped in EACH file
    assert len(rows) == 10 and "id" not in rows
    assert rows["r6"]["scientificName"] == "Telopea speciosissima"
    # short row r9: missing trailing field -> null, not a parse error
    assert rows["r9"]["eventDate"] is None
    # empty unquoted field -> null
    assert rows["r3"]["scientificName"] is None
    # index-less default field materializes as a constant column
    assert rows["r1"]["countryCode"] == "AU"


def test_fixture_profile_values(spark):
    row = QUERIES["dwca_archive_profile"](spark, "unused").collect()[0]
    assert row["record_count"] == 10
    assert row["occ_id_distinct"] == 9      # occ:001 repeats across files
    assert row["sci_name_populated"] == 9   # r3 empty
    assert row["event_date_null"] == 1      # r9 short row
    assert row["lat_valid"] == 8            # r4 out of range, r5 empty
    assert row["bor_unrecognised"] == 1     # r4 'badvalue'; r9 null skipped
    assert row["country_default"] == "AU"
    assert row["ext_rows"] == 5
    assert row["ext_core_ids"] == 4  # includes the deliberate orphan r99


def test_fixture_path_exists():
    assert os.path.isfile(os.path.join(_DWCA_FIXTURE, "meta.xml"))


def test_ignore_header_lines_gt1(spark, tmp_path):
    # ignoreHeaderLines=3: a title line, a comment line, AND the column
    # header — all three must be skipped in EACH file
    meta = """<archive xmlns="http://rs.tdwg.org/dwc/text/">
  <core rowType="http://rs.tdwg.org/dwc/terms/Occurrence"
        fieldsTerminatedBy="," ignoreHeaderLines="3">
    <files><location>a.csv</location><location>b.csv</location></files>
    <id index="0" />
    <field index="1" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
  </core>
</archive>"""
    (tmp_path / "meta.xml").write_text(meta)
    (tmp_path / "a.csv").write_text(
        "export title\n# comment\nid,scientificName\n1,Ursus arctos\n2,Lynx lynx\n"
    )
    (tmp_path / "b.csv").write_text(
        "export title\n# comment\nid,scientificName\n3,Alces alces\n"
    )
    desc = read_descriptor(str(tmp_path))
    df = read_archive_table(spark, desc, desc.core)
    rows = {r["id"]: r["scientificName"] for r in df.collect()}
    assert rows == {"1": "Ursus arctos", "2": "Lynx lynx", "3": "Alces alces"}


def test_ignore_header_lines_gt1_with_quoting(spark, tmp_path):
    # the once-rejected dialect: N>1 header lines AND declared quoting,
    # including a quoted field with an EMBEDDED NEWLINE (the case that
    # makes naive line splitting impossible), across two files
    meta = """<archive xmlns="http://rs.tdwg.org/dwc/text/">
  <core rowType="http://rs.tdwg.org/dwc/terms/Occurrence"
        fieldsTerminatedBy="," fieldsEnclosedBy="&quot;"
        ignoreHeaderLines="2">
    <files><location>a.csv</location><location>b.csv</location></files>
    <id index="0" />
    <field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceRemarks"/>
  </core>
</archive>"""
    (tmp_path / "meta.xml").write_text(meta)
    (tmp_path / "a.csv").write_text(
        'export title\nid,occurrenceRemarks\n'
        '"1","seen at\ndusk, near creek"\n'
        '"2","plain remark"\n'
    )
    (tmp_path / "b.csv").write_text(
        'export title\nid,occurrenceRemarks\n"3","third, quoted"\n'
    )
    desc = read_descriptor(str(tmp_path))
    df = read_archive_table(spark, desc, desc.core)
    rows = {r["id"]: r["occurrenceRemarks"] for r in df.collect()}
    assert rows == {
        "1": "seen at\ndusk, near creek",
        "2": "plain remark",
        "3": "third, quoted",
    }


def test_duplicate_extension_rowtype_views(spark, tmp_path):
    from dwc_dataframe_validator_spark.sources.dwca import (
        register_archive_views,
    )

    meta = """<archive xmlns="http://rs.tdwg.org/dwc/text/">
  <core rowType="http://rs.tdwg.org/dwc/terms/Occurrence"
        fieldsTerminatedBy="," ignoreHeaderLines="1">
    <files><location>occ.csv</location></files>
    <id index="0" />
  </core>
  <extension rowType="http://rs.gbif.org/terms/1.0/Multimedia"
             fieldsTerminatedBy="," ignoreHeaderLines="1">
    <files><location>img.csv</location></files>
    <coreid index="0" />
    <field index="1" term="http://purl.org/dc/terms/identifier"/>
  </extension>
  <extension rowType="http://rs.gbif.org/terms/1.0/Multimedia"
             fieldsTerminatedBy="," ignoreHeaderLines="1">
    <files><location>audio.csv</location></files>
    <coreid index="0" />
    <field index="1" term="http://purl.org/dc/terms/identifier"/>
  </extension>
</archive>"""
    (tmp_path / "meta.xml").write_text(meta)
    (tmp_path / "occ.csv").write_text("id\n1\n")
    (tmp_path / "img.csv").write_text("coreid,identifier\n1,img.jpg\n")
    (tmp_path / "audio.csv").write_text("coreid,identifier\n1,a.wav\n1,b.wav\n")
    names = register_archive_views(spark, str(tmp_path), prefix="dup_")
    assert names == ["dup_core", "dup_Multimedia", "dup_Multimedia_1"]
    # both views live — the second did not overwrite the first
    assert spark.sql("SELECT count(*) c FROM dup_Multimedia").collect()[0]["c"] == 1
    assert spark.sql("SELECT count(*) c FROM dup_Multimedia_1").collect()[0]["c"] == 2


def test_full_metrics_oracle_tracks_view_and_walk(spark):
    """The occurrence_full_metrics oracle is generated from
    _OCC_VIEW_COLUMNS + the shared field lists; if occurrence_view or
    _register_metrics drift, positional metric names (cc_i,
    num_valid_i) silently shift.  Pin both couplings."""
    import duckdb

    from dwc_dataframe_validator_spark.registry import (
        ORACLES,
        _OCC_VIEW_COLUMNS,
        occurrence_view,
    )

    view = occurrence_view(spark, "/root/testdata/sf0.001")
    assert view.columns == _OCC_VIEW_COLUMNS
    spark_cols = QUERIES["occurrence_full_metrics"](
        spark, "/root/testdata/sf0.001"
    ).columns
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    oracle_cols = [
        d[0] for d in con.execute(ORACLES["occurrence_full_metrics"]).description
    ]
    assert sorted(spark_cols) == sorted(oracle_cols)


def test_orphan_multimedia_count_is_one(spark):
    from dwc_dataframe_validator_spark.registry import QUERIES

    row = QUERIES["dwca_orphan_multimedia"](spark, "unused").collect()[0]
    assert row["orphan_count"] == 1  # exactly the planted r99
