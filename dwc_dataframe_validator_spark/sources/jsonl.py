"""JSON-lines source.

The reference reads only CSV archives (SURVEY §2.1); document corpora
in practice arrive as JSONL.  This is a thin, explicitly-schema'd
wrapper over ``spark.read.json`` — the schema is REQUIRED, not
inferred, because schema inference is a full extra pass over the data
(fatal at 100 TB) and silently widens types on dirty rows.  Spark's
JSON reader is splittable for uncompressed/bzip2 JSONL, so partitioning
follows file splits like any text source; corrupt lines land in
``_corrupt_record`` (PERMISSIVE) instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.  Missing
    fields are NULL; type-mismatched rows parse to NULL fields
    (PERMISSIVE).  ``keep_corrupt=True`` adds a ``_corrupt_record``
    column holding unparseable lines instead of dropping them."""
    if keep_corrupt:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        schema = schema.add("_corrupt_record", "string")
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.json(path)
