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
