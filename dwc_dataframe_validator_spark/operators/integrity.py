"""Referential-integrity checks (SURVEY.md §2.3 J2 north-star).

The reference declares core↔extension FK linkage in meta.xml but never
joins (``validate_dwca.py:76-89``); these operators make the integrity
check first-class: orphan rows are child rows whose key has no match in
the parent — a LEFT ANTI join.

Scale notes: the anti join shuffles both sides on the key unless the
parent broadcasts.  ``broadcast_parent=True`` forces the broadcast for
dimension-sized parents (nation, region, vocab tables); leave False
and AQE picks sort-merge vs broadcast from runtime stats for the big
fact↔fact case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Child rows with no matching parent key (LEFT ANTI).
    NULL child keys count as orphans only if you pre-filter them in —
    anti join keeps NULL-keyed rows (no match possible), matching the
    'missing linkage' reading."""
    p = parent.select(F.col(parent_key).alias("_pk")).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    return child.join(p, child[child_key] == p["_pk"], "left_anti")


def fk_orphan_count(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """One-row orphan count — the report-friendly scalar form."""
    return fk_orphans(child, parent, child_key, parent_key, broadcast_parent).agg(
        F.count(F.lit(1)).alias("orphan_count")
    )


def global_duplicate_ids(
    df: DataFrame, id_col: str, sample_cap: int = 10
) -> DataFrame:
    """Corpus-wide ID-uniqueness report — the companion pass the
    incremental-validation sink points at (``model.merge_df_reports``
    contract: per-slice reports cannot see an ID repeated ACROSS
    slices).  One row: total rows, distinct/duplicated-value counts,
    the duplicate-row count in the reference's accounting
    (populated − distinct, ``check_id_fields`` validate.py:246-249),
    and the first ``sample_cap`` offending values lexicographically
    (the A14 sample contract).

    One shuffle on the ID value (partial-aggregated count per value),
    then a tiny two-phase rollup; the sample is a sorted ``slice`` on
    ≤ ``sample_cap`` survivors per partial — never a global sort of
    all offenders.  NULL ids are excluded (they are 'missing', not
    'duplicated' — the reference errors on them separately)."""
    per_value = (
        df.filter(F.col(id_col).isNotNull())
        .groupBy(F.col(id_col).cast("string").alias("_idv"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    dups = per_value.filter(F.col("_n") > 1)
    stats = dups.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("duplicate_rows"),
        F.count(F.lit(1)).alias("duplicated_values"),
        (F.coalesce(F.sum("_n"), F.lit(0)) - F.count(F.lit(1)))
        .cast("long")
        .alias("duplicate_error_count"),
    )
    sample = (
        dups.orderBy("_idv")
        .limit(sample_cap)  # TakeOrderedAndProject — partial top-N
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list("_idv"))
            ).alias("sample_values_csv")
        )
    )
    return stats.crossJoin(sample)
