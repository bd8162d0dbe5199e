"""Darwin Core Archive (DwC-A) source — SURVEY.md §2.1 S1-S3.

A DwC-A is a directory (or zip) holding one core CSV table, N extension
CSV tables, and a ``meta.xml`` descriptor declaring row types, the
column-index→term mapping, and the CSV dialect (reference
``validate_dwca.py:27-28,78-82``; descriptor examples
``test/occurrence_archives/dwca-simple/meta.xml``).

Spark mapping:
- ``meta.xml`` is tiny driver-side metadata → ``xml.etree.ElementTree``
  (S3), no Spark involved;
- each table scan is a distributed ``spark.read.csv`` with options
  derived from the descriptor dialect and an ALL-STRING schema named
  from the descriptor terms (S1/S2).  All-string mirrors the
  reference's ``pd_read(..., parse_dates=False)`` semantics
  (SURVEY.md §1.2): values stay raw until a check coerces them.
  No ``inferSchema`` — schema inference would cost a second full pass
  over a 100 TB archive for types we would immediately discard.

Column naming replicates python-dwca-reader: the ``<id>``/``<coreid>``
index materializes as a literal ``id``/``coreid`` column (winning over
any ``<field>`` at the same index), every other ``<field index>`` is
named by the term-URI tail, and index-less fields with a ``default``
become constant columns.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from dataclasses import dataclass, field as dc_field
from typing import Optional
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_NS = "{http://rs.tdwg.org/dwc/text/}"

# meta.xml attribute values are XML-escaped control sequences
_ESCAPES = {"\\t": "\t", "\\n": "\n", "\\r": "\r", "\\r\\n": "\r\n"}


def _unescape(v: str) -> str:
    return _ESCAPES.get(v, v)


def term_tail(term: str) -> str:
    """Strip the DwC URI namespace (reference validate_dwca.py:36,117:
    ``qualified_term.rsplit("/", 1)[-1]``)."""
    return term.rsplit("/", 1)[-1]


@dataclass
class FieldSpec:
    index: Optional[int]
    term: str
    default: Optional[str] = None


@dataclass
class TableSpec:
    """One ``<core>`` or ``<extension>`` element of meta.xml."""

    row_type: str
    locations: list[str]
    fields: list[FieldSpec]
    id_index: Optional[int] = None      # <id index> (core) / <coreid index> (ext)
    is_core: bool = True
    delimiter: str = ","
    quote: str = ""                     # fieldsEnclosedBy; "" = no quoting
    encoding: str = "utf-8"
    ignore_header_lines: int = 0

    @property
    def type_tail(self) -> str:
        return term_tail(self.row_type)

    def column_names(self) -> list[str]:
        """Positional column names: id/coreid wins its index, fields
        take their term tail; collisions get a positional suffix."""
        by_index: dict[int, str] = {}
        for f in self.fields:
            if f.index is not None:
                by_index[f.index] = term_tail(f.term)
        if self.id_index is not None:
            by_index[self.id_index] = "id" if self.is_core else "coreid"
        n = max(by_index) + 1 if by_index else 0
        names, seen = [], set()
        for i in range(n):
            name = by_index.get(i, f"_c{i}")
            if name in seen:
                name = f"{name}_{i}"
            seen.add(name)
            names.append(name)
        return names

    def default_columns(self) -> list[tuple[str, str]]:
        """(name, value) for index-less fields with a declared default —
        python-dwca-reader appends these as constant columns."""
        return [
            (term_tail(f.term), f.default)
            for f in self.fields
            if f.index is None and f.default is not None
        ]


@dataclass
class ArchiveDescriptor:
    """Parsed meta.xml (S3)."""

    core: TableSpec
    extensions: list[TableSpec] = dc_field(default_factory=list)
    base_dir: str = ""


def _parse_table(el: ElementTree.Element, is_core: bool) -> TableSpec:
    locations = [
        loc.text.strip()
        for files in el.findall(f"{_NS}files")
        for loc in files.findall(f"{_NS}location")
        if loc.text
    ]
    fields = [
        FieldSpec(
            index=int(f.get("index")) if f.get("index") is not None else None,
            term=f.get("term", ""),
            default=f.get("default"),
        )
        for f in el.findall(f"{_NS}field")
    ]
    id_el = el.find(f"{_NS}id" if is_core else f"{_NS}coreid")
    id_index = int(id_el.get("index")) if id_el is not None and id_el.get("index") else None
    return TableSpec(
        row_type=el.get("rowType", ""),
        locations=locations,
        fields=fields,
        id_index=id_index,
        is_core=is_core,
        delimiter=_unescape(el.get("fieldsTerminatedBy", ",")) or ",",
        quote=_unescape(el.get("fieldsEnclosedBy", "")),
        encoding=el.get("encoding", "utf-8"),
        ignore_header_lines=int(el.get("ignoreHeaderLines", "0")),
    )


def read_descriptor(archive_path: str) -> ArchiveDescriptor:
    """Parse ``meta.xml`` from an archive directory or zip.  Zips are
    extracted to a temp dir driver-side — a convenience for small
    archives; at scale, archives live pre-extracted on distributed
    storage and this function takes the directory."""
    if archive_path.endswith(".zip") and zipfile.is_zipfile(archive_path):
        # deterministic extraction dir keyed on (path, mtime, size):
        # repeated validations of the same zip reuse one extraction
        # instead of growing /tmp monotonically
        st = os.stat(archive_path)
        digest = hashlib.sha1(
            f"{os.path.abspath(archive_path)}:{st.st_mtime_ns}:{st.st_size}".encode()
        ).hexdigest()[:16]
        tmp = os.path.join(tempfile.gettempdir(), f"dwca_{digest}")
        if not os.path.isdir(tmp):
            staging = tempfile.mkdtemp(prefix="dwca_stage_")
            with zipfile.ZipFile(archive_path) as zf:
                zf.extractall(staging)
            try:
                os.rename(staging, tmp)  # atomic publish; loser cleans up
            except OSError:
                import shutil

                shutil.rmtree(staging, ignore_errors=True)
        archive_path = tmp
    meta = os.path.join(archive_path, "meta.xml")
    root = ElementTree.parse(meta).getroot()
    core_el = root.find(f"{_NS}core")
    if core_el is None:
        raise ValueError(f"{meta}: no <core> element")
    return ArchiveDescriptor(
        core=_parse_table(core_el, is_core=True),
        extensions=[_parse_table(e, is_core=False) for e in root.findall(f"{_NS}extension")],
        base_dir=archive_path,
    )


def read_archive_table(
    spark: SparkSession, descriptor: ArchiveDescriptor, table: TableSpec
) -> DataFrame:
    """S1/S2 — distributed CSV scan of one archive table with the
    descriptor's dialect and an all-string schema."""
    paths = [os.path.join(descriptor.base_dir, loc) for loc in table.locations]
    names = table.column_names()
    schema = StructType([StructField(n, StringType(), True) for n in names])
    if table.ignore_header_lines > 1:
        df = _read_skipping_lines(spark, paths, table, schema)
        for name, value in table.default_columns():
            df = df.withColumn(name, F.lit(value))
        return df
    reader = (
        spark.read.options(
            header=table.ignore_header_lines == 1,
            sep=table.delimiter,
            encoding=table.encoding,
            # disable quoting entirely when fieldsEnclosedBy is empty
            quote=table.quote if table.quote else "\u0000",
            enforceSchema=True,
            mode="PERMISSIVE",
        )
        .schema(schema)
    )
    df = reader.csv(paths)
    for name, value in table.default_columns():
        df = df.withColumn(name, F.lit(value))
    return df


def _read_skipping_lines(
    spark: SparkSession,
    paths: list[str],
    table: TableSpec,
    schema: StructType,
) -> DataFrame:
    """CSV scan skipping the first N>1 lines of EACH file — Spark's
    ``header`` option only skips one.

    Unquoted dialect: distributed ``textFile`` per location,
    ``zipWithIndex`` (one counting pass per file — the known cost of a
    global line index), drop indexes < N, then parse surviving lines
    with ``from_csv`` so dialect/schema handling matches the fast path.

    Quoted dialect (``fieldsEnclosedBy`` declared): line splitting
    would break on quoted embedded newlines, so the CSV parser itself
    must delimit records — read with ``multiLine=true`` and drop the
    first N RECORDS per file.  ``multiLine`` makes each file one
    unsplittable partition (the cost every engine pays for quoted
    newlines; at scale, ship many files, not one giant one), which
    also makes ``monotonically_increasing_id`` file-ordered, so the
    per-file ``row_number`` skip is exact.  Assumes the header lines
    themselves contain balanced quotes (a lone quote in a header
    would swallow following records — pathological for a header)."""
    n = table.ignore_header_lines
    if table.quote:
        from pyspark.sql import Window

        df = (
            spark.read.options(
                header=False,
                sep=table.delimiter,
                encoding=table.encoding,
                quote=table.quote,
                multiLine=True,
                enforceSchema=True,
                mode="PERMISSIVE",
            )
            .schema(schema)
            .csv(paths)
            .select("*", F.col("_metadata.file_path").alias("_file"))
            .withColumn("_ord", F.monotonically_increasing_id())
        )
        w = Window.partitionBy("_file").orderBy("_ord")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > n)
            .drop("_file", "_ord", "_rn")
        )
    # quoting disabled (this path rejects declared quoting above, and
    # bare quote characters inside fields must stay literal)
    opts = {"sep": table.delimiter, "quote": "\u0000", "mode": "PERMISSIVE"}
    frames = []
    for path in paths:
        body = (
            spark.sparkContext.textFile(path)
            .zipWithIndex()
            .filter(lambda kv, _n=n: kv[1] >= _n)
            .map(lambda kv: (kv[0],))
        )
        lines = spark.createDataFrame(body, "value string")
        ddl = ", ".join(f"`{f.name}` STRING" for f in schema.fields)
        frames.append(
            lines.select(
                F.from_csv(F.col("value"), F.lit(ddl), opts).alias("_r")
            ).select("_r.*")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def register_archive_views(
    spark: SparkSession, archive_path: str, prefix: str = "dwca_"
) -> list[str]:
    """Register the core and every extension table of an archive as
    temp views (``<prefix>core``, ``<prefix><RowTypeTail>``) so archive
    contents are queryable from ``spark.sql``.

    Two extensions may legally share a row type (DwC-A allows it); a
    repeated type tail gets a positional suffix instead of silently
    overwriting the earlier view."""
    desc = read_descriptor(archive_path)
    names = [f"{prefix}core"]
    read_archive_table(spark, desc, desc.core).createOrReplaceTempView(names[0])
    seen = set(names)
    for i, ext in enumerate(desc.extensions):
        name = f"{prefix}{ext.type_tail}"
        if name in seen:
            name = f"{name}_{i}"
        seen.add(name)
        read_archive_table(spark, desc, ext).createOrReplaceTempView(name)
        names.append(name)
    return names


def get_id_dwc_term(columns: list[str], fields: list[FieldSpec]) -> Optional[str]:
    """Recover which DwC term the conventional ``id`` column represents
    (reference validate_dwca.py:101-118): find the field declared at the
    ``id`` column's position and take its term tail."""
    if "id" not in columns:
        return None
    col_idx = columns.index("id")
    for f in fields:
        if f.index == col_idx and f.term:
            return term_tail(f.term)
    return None
