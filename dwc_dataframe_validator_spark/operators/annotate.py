"""Row-level check annotation — the quarantine/split primitive.

The reference reports only table-level aggregates; a training-data
pipeline also needs the row-level form: which checks did THIS row fail,
so bad rows can be filtered, quarantined, or repaired downstream.

Pure Catalyst: one ``array_compact(array(when(fail, name)...))``
projection — no shuffle, no UDF, stays inside whole-stage codegen, and
composes with any downstream filter (Catalyst pushes a
``size(errors) = 0`` filter into the same codegen stage).

Check predicates come from functions/expressions (in_range,
vocab_member, any_populated) — the same builders the aggregate
validator compiles, so row-level and table-level validation cannot
drift apart.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def annotate_errors(
    df: DataFrame,
    checks: Mapping[str, Column],
    out_col: str = "errors",
) -> DataFrame:
    """Append an ``array<string>`` column listing the name of every
    check whose predicate is NOT satisfied for the row (null predicate
    results count as failures, matching SQL three-valued logic where a
    check that cannot evaluate has not passed)."""
    flags = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in checks.items()
    ]
    return df.withColumn(out_col, F.array_compact(F.array(*flags)))


def split_valid(
    df: DataFrame,
    checks: Mapping[str, Column],
    out_col: str = "errors",
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantined_rows) — quarantined rows carry the
    ``errors`` column naming their failed checks."""
    annotated = annotate_errors(df, checks, out_col)
    valid = annotated.filter(F.size(out_col) == 0).drop(out_col)
    quarantined = annotated.filter(F.size(out_col) > 0)
    return valid, quarantined
