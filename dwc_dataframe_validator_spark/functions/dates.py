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
- day-first forms like ``'31/12/2023'``: pandas itself only accepts
  them with ``dayfirst=True``, which the reference does not pass, so
  excluding them MATCHES the reference
- time-only strings (``'10:11:12'``): pandas anchors to today's date —
  non-deterministic across runs, deliberately excluded
- two-digit-year slash dates (``'1/5/23'``) ARE parsed (round 6), with
  the C ``strptime`` century pivot: 00-68 → 20xx, 69-99 → 19xx —
  DuckDB's ``%y`` natively, Spark via a regex century rewrite (Java's
  ``yy`` would pivot 2000-2099).  pandas instead slides the century
  window with the CURRENT year (dateutil: now±50), so for years in
  [69, (now.year+50) % 100] pandas says 20xx where this parser says
  19xx.  A time-dependent pivot cannot be matched deterministically;
  the C convention is the stable, engine-portable choice.

Round 7: ``to_timestamp_pandas_permissive`` closes the free-text gap
as an OPT-IN — pandas' own per-element parser behind an Arrow
pandas_udf, reference-parity-pinned, for archives where the deviation
list above actually bites.  It is deliberately NOT the default and
never on the oracle path (dateutil inference is not engine-replayable).
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
    # round-6 widening — DD-Mon-YYYY and time-suffixed variants of the
    # existing date-only shapes (specific-before-prefix ordering kept):
    ("d-MMM-yyyy H:m:s", "%d-%b-%Y %H:%M:%S"),   # 05-Jan-2023 10:11:12
    ("d-MMM-yyyy", "%d-%b-%Y"),                  # 05-Jan-2023
    ("yyyy/M/d H:m:s", "%Y/%m/%d %H:%M:%S"),     # 2023/1/5 10:11:12
    ("yyyy.M.d H:m:s", "%Y.%m.%d %H:%M:%S"),     # 2023.1.5 10:11:12
    ("d MMM yyyy H:m:s", "%d %b %Y %H:%M:%S"),   # 5 Jan 2023 10:11:12
    ("MMM d, yyyy H:m:s", "%b %d, %Y %H:%M:%S"), # Jan 5, 2023 10:11:12
]

# Two-digit-year slash dates, optionally time-suffixed.  Spark's 'yy'
# maps 00-99 → 2000-2099 (DateTimeFormatter reduced-value base 2000),
# which disagrees with DuckDB's C-strptime '%y' pivot (00-68 → 20xx,
# 69-99 → 19xx); instead of parsing 'yy' the century is materialized by
# regex BEFORE a plain 4-digit parse, so both engines express the SAME
# pivot.  Ungated is safe: a 4-digit-year string passes through the
# rewrites unchanged and was already handled (identically on both
# engines) by the earlier 'M/d/yyyy' attempts in the coalesce.
_Y2_RE_19 = r"^(\d{1,2}/\d{1,2}/)(69|[7-9]\d)($| .*$)"
_Y2_RE_20 = r"^(\d{1,2}/\d{1,2}/)([0-5]\d|6[0-8])($| .*$)"
# Java replacement '$119$2$3' reads '$11' greedily only while the group
# exists — group 11 doesn't, so it resolves to $1 then literal '19'
# (pinned by the parity test).
_Y2_SPARK_FORMATS = ["M/d/yyyy H:m:s", "M/d/yyyy"]
_Y2_DUCKDB_FORMATS = ["%m/%d/%y %H:%M:%S", "%m/%d/%y"]


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
    y2 = F.regexp_replace(
        F.regexp_replace(c, _Y2_RE_19, r"$119$2$3"), _Y2_RE_20, r"$120$2$3"
    )
    attempts += [F.try_to_timestamp(y2, F.lit(fmt)) for fmt in _Y2_SPARK_FORMATS]
    return F.coalesce(*attempts)


# strptime directive → the regex of strings Spark's matching pattern
# letter accepts.  DuckDB's %Y is LAXER than Spark's 'yyyy' (it takes
# 1-3 digit years: '1/5/69' parses as year 69), so every oracle attempt
# is gated on the format translated to an anchored regex — the gate
# removes DuckDB-only successes, which are exactly the latent
# cross-engine drifts.  Unknown directives raise (fail loud on table
# widening, never silently unguarded).
_STRPTIME_TOKEN_RE: dict[str, str] = {
    "%Y": r"\d{4}",
    "%y": r"\d{2}",
    "%m": r"\d{1,2}",
    "%d": r"\d{1,2}",
    "%H": r"\d{1,2}",
    "%M": r"\d{1,2}",
    "%S": r"\d{1,2}",
    "%b": "[A-Za-z]{3}",
    "%B": "[A-Za-z]{3,}",
}


def _format_guard_regex(fmt: str) -> str:
    import re

    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            out.append(_STRPTIME_TOKEN_RE[fmt[i : i + 2]])
            i += 2
        else:
            out.append(re.escape(fmt[i]))
            i += 1
    return "^" + "".join(out) + "$"


def multiformat_oracle_sql(col_sql: str) -> str:
    """The DuckDB expression computing exactly what
    ``to_timestamp_multiformat`` computes over the same strings —
    generated from the same format table so the two can never drift.
    Each ``try_strptime`` attempt is gated on a regex derived from its
    own format (see ``_STRPTIME_TOKEN_RE``)."""

    def guarded(fmt: str) -> str:
        return (
            f"CASE WHEN regexp_matches({col_sql}, '{_format_guard_regex(fmt)}')"
            f" THEN try_strptime({col_sql}, '{fmt}') END"
        )

    # DuckDB's bare timestamp cast is laxer than Spark's ISO parser
    # too ('1/5/23' casts to year 1!) — gate it on a superset of the
    # shapes Spark's default to_timestamp accepts: 4-6 digit year,
    # dash-separated, optional space/T time tail, surrounding blanks.
    iso_guard = (
        r"^\s*[+-]?\d{4,6}(-\d{1,2}(-\d{1,2}([ T].*)?)?)?\s*$"
    )
    attempts = [
        f"CASE WHEN regexp_matches({col_sql}, '{iso_guard}')"
        f" THEN try_cast({col_sql} AS TIMESTAMP) END"
    ]
    attempts += [guarded(fmt) for _, fmt in LENIENT_TIMESTAMP_FORMATS]
    attempts += [guarded(fmt) for fmt in _Y2_DUCKDB_FORMATS]
    return "coalesce(" + ", ".join(attempts) + ")"


def resolve_timestamp_parser(parser):
    """Map a ``date_parser=`` argument to a column function.

    ``"multiformat"`` (the default everywhere) is the deterministic,
    oracle-exact Catalyst format table; ``"pandas"`` is the
    reference-exact dateutil free-text path
    (``to_timestamp_pandas_permissive`` — Arrow-vectorized, NOT
    SQL-oracleable).  A callable passes through, so custom parsers
    (e.g. a site-specific format list) plug into the same
    ``validate_archive``/``generate_breakdowns`` seam."""
    if callable(parser):
        return parser
    table = {
        "multiformat": to_timestamp_multiformat,
        "pandas": to_timestamp_pandas_permissive,
    }
    try:
        return table[parser]
    except KeyError:
        raise ValueError(
            f"unknown date_parser {parser!r}: expected one of "
            f"{sorted(table)} or a callable Column -> Column"
        ) from None


def to_timestamp_pandas_permissive(col: Column | str) -> Column:
    """string → timestamp through pandas itself — byte-for-byte the
    reference's parse (``pd.to_datetime(col, errors='coerce')``,
    reference breakdown.py:86), as an Arrow-vectorized pandas_udf.

    This is the OPT-IN escape hatch for archives full of dateutil
    free text (``'5th of Jan 2023'``, ``'Thu Jan 5 2023'``, RFC-2822)
    that the deterministic format table deliberately leaves NULL (see
    the module docstring's deviation list — several dateutil behaviors
    are time-dependent, so this path can never sit behind a value
    oracle and is NOT the default).  Use
    ``to_timestamp_multiformat`` on the oracled path; reach for this
    when reference-exact permissiveness matters more than
    engine-replayable determinism.  Parity with the reference call is
    pinned in tests/test_operators.py::test_pandas_permissive_parse.

    Scale shape: one Arrow batch transfer per task, one vectorized
    ``pd.to_datetime`` per batch — the documented fast-UDF exception
    class, never row-at-a-time Python."""
    import pandas as pd

    def _parse(s):
        # format="mixed" = per-ELEMENT dateutil inference.  Bare
        # pd.to_datetime on a whole pandas-2.x column infers the format
        # from the FIRST non-null element and coerces the rest — a
        # column-order-dependent semantics that cannot be distributed
        # (each Arrow batch would infer its own format).  Per-element
        # inference is the pandas-1.x behavior the reference was
        # written against and the only deterministic reading.
        out = pd.to_datetime(s, errors="coerce", format="mixed")
        # mixed tz-aware/naive inputs come back as object dtype; the
        # reference feeds the result straight into .dt accessors, so
        # normalize aware values to naive UTC the way pandas does when
        # the whole column is aware
        if out.dtype == object:
            out = pd.to_datetime(s, errors="coerce", format="mixed", utc=True)
        if getattr(out.dtype, "tz", None) is not None:
            out = out.dt.tz_convert("UTC").dt.tz_localize(None)
        return out

    # real (non-string) annotations: this module's `from __future__
    # import annotations` would stringify inline hints, which the
    # pandas_udf signature inference cannot resolve
    _parse.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_parse, "timestamp")
    return udf(F.col(col) if isinstance(col, str) else col)
