"""Lenient multi-format timestamp parsing — pandas ``to_datetime`` parity.

The reference parses dates with ``pd.to_datetime(col, errors='coerce')``
(reference breakdown.py:86), which infers many formats beyond ISO-8601.
Spark's bare ``try_to_timestamp`` is ISO-only, so messy real-world
archives (``1/5/2023``, ``Jan 5, 2023``, ``20230105``) would silently
drop rows the reference keeps.  This module closes that gap with a
coalesce over ``try_to_timestamp`` format attempts — still pure Catalyst
expressions (whole-stage-codegen'd, NULL-on-failure per attempt), never
a Python UDF.

Each entry is a (Spark pattern, DuckDB ``strptime`` pattern) pair kept
in lockstep so the registry can generate an exactly-equivalent DuckDB
oracle from the same table.  The format set is the one pandas infers
most often on biodiversity data; full pandas ``dateutil`` coverage is
explicitly NOT claimed — the supported matrix is pinned by
tests/test_operators.py comparing all three engines value-for-value.

Known deviations from pandas ``to_datetime(errors='coerce')`` — strings
pandas parses that THIS parser leaves NULL (each judged rare on
ISO-dominant archives; extend the table if a real corpus hits one):

- ordinal/dateutil free text: ``'5th of Jan 2023'``, ``'Jan 5th 2023'``
- weekday-prefixed: ``'Thu Jan 5 2023'``, RFC-2822 ``'Thu, 05 Jan 2023
  10:11:12 +0000'``
- two-digit years: ``'1/5/23'`` (ambiguous century — deliberately
  excluded rather than guessed)
- day-first forms like ``'31/12/2023'``: pandas itself only accepts
  them with ``dayfirst=True``, which the reference does not pass, so
  excluding them MATCHES the reference
- time-only strings (``'10:11:12'``): pandas anchors to today's date —
  non-deterministic across runs, deliberately excluded
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (spark_format, duckdb_strptime_format); ORDER MATTERS — first match
# wins in the coalesce, so put longer / more specific patterns before
# their prefixes (e.g. "M/d/yyyy H:m:s" before "M/d/yyyy").
LENIENT_TIMESTAMP_FORMATS: list[tuple[str, str]] = [
    ("M/d/yyyy H:m:s", "%m/%d/%Y %H:%M:%S"),
    ("M/d/yyyy", "%m/%d/%Y"),
    ("yyyyMMdd", "%Y%m%d"),
    ("MMM d, yyyy", "%b %d, %Y"),
    ("d MMM yyyy", "%d %b %Y"),
    ("yyyy/M/d", "%Y/%m/%d"),
    # round-4 widening (each with three-engine parity in pytest):
    ("MMMM d, yyyy", "%B %d, %Y"),   # January 5, 2023
    ("d MMMM yyyy", "%d %B %Y"),     # 5 January 2023
    ("yyyy.M.d", "%Y.%m.%d"),        # 2023.1.5
]


def to_timestamp_multiformat(col: Column | str) -> Column:
    """string → timestamp trying ISO-8601 first, then every format in
    ``LENIENT_TIMESTAMP_FORMATS``; NULL when nothing matches (pandas
    ``errors='coerce'``).  One coalesce expression — a single projection
    over the scan, no extra job, no shuffle."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    attempts = [F.try_to_timestamp(c)]
    attempts += [
        F.try_to_timestamp(c, F.lit(fmt)) for fmt, _ in LENIENT_TIMESTAMP_FORMATS
    ]
    return F.coalesce(*attempts)


def multiformat_oracle_sql(col_sql: str) -> str:
    """The DuckDB expression computing exactly what
    ``to_timestamp_multiformat`` computes over the same strings —
    generated from the same format table so the two can never drift."""
    attempts = [f"try_cast({col_sql} AS TIMESTAMP)"]
    attempts += [
        f"try_strptime({col_sql}, '{fmt}')" for _, fmt in LENIENT_TIMESTAMP_FORMATS
    ]
    return "coalesce(" + ", ".join(attempts) + ")"
