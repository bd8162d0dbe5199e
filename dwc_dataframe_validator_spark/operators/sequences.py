"""Ordered event-sequence assembly.

Training pipelines over behavioral / log data need per-entity ordered
sequences ("the user's click stream as a token sequence") — the
groupBy-collect step between raw events and sequence-model training
examples.  The reference has nothing comparable (SURVEY §2 — batch
scalar checks only).

Plan shape: ONE shuffle on the entity key; ``collect_list`` of
(order-key, payload) structs aggregated per entity with map-side
partial aggregation, sorted IN THE EXECUTOR via ``array_sort`` (structs
compare field-left-to-right, so (ts, tiebreak, payload) sorts by time
with a deterministic tiebreak), then projected to the payload sequence.
No window, no second shuffle, no UDF.

Memory bound: per-entity state is that entity's event count.  For
entities with unbounded histories pass ``max_len`` — the sequence is
truncated to the FIRST ``max_len`` elements after the sort (Spark
``slice``), which bounds the output row, though the transient aggregate
state still holds the full list; cap pathological entities upstream
(e.g. operators/sampling.py hash_sample on the entity key) when that
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_sequences(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    payload_col: str,
    tiebreak_col: str,
    max_len: int | None = None,
) -> DataFrame:
    """Per-entity ordered payload sequences:
    ``(entity_col, n_events, seq)`` where ``seq`` is the
    ``payload_col`` values ordered by (order_col, tiebreak_col).
    ``tiebreak_col`` must be unique per entity for a fully
    deterministic sequence (event ids are)."""
    sorted_structs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("_o"),
                F.col(tiebreak_col).alias("_t"),
                F.col(payload_col).alias("_p"),
            )
        )
    )
    if max_len is not None:
        sorted_structs = F.slice(sorted_structs, 1, max_len)
    seq = F.transform(sorted_structs, lambda x: x["_p"])
    return df.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        seq.alias("seq"),
    )
