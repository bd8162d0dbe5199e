"""Custom stateful streaming operator — ``applyInPandasWithState``.

Windowed aggregates (validation.py) cover everything expressible as an
aggregation; this module covers the genuinely custom-state shape: a
per-key RUNNING validation profile that survives across triggers and
emits the updated totals every time a key sees new data — e.g. "how
many invalid events has each user produced since stream start", used
for progressive quarantine decisions.

Scale notes: state per key is three longs (fixed size); keys are
hash-partitioned across executors by the groupBy, and state lives in
the state store (RocksDB on a real cluster).  ``GroupStateTimeout``
left at NoTimeout because the profile is meant to be lifetime-running;
switch to ProcessingTimeTimeout to expire idle keys when the key
domain is unbounded.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([
    StructField("n_total", LongType()),
    StructField("n_invalid", LongType()),
    StructField("n_batches", LongType()),
])

_OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("n_total", LongType()),
    StructField("n_invalid", LongType()),
    StructField("n_batches", LongType()),
])


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_total, n_invalid, n_batches = state.get
    else:
        n_total, n_invalid, n_batches = 0, 0, 0
    for pdf in pdfs:
        n_total += len(pdf)
        n_invalid += int(pdf["_invalid"].sum())
    n_batches += 1
    state.update((n_total, n_invalid, n_batches))
    yield pd.DataFrame(
        [(str(key[0]), n_total, n_invalid, n_batches)],
        columns=["key", "n_total", "n_invalid", "n_batches"],
    )


def running_invalid_counts(
    stream: DataFrame,
    key_col: str,
    invalid_predicate: Column,
) -> DataFrame:
    """Per-key running (total, invalid, batch) counts across the whole
    stream lifetime.  ``invalid_predicate`` is any boolean row predicate
    from functions/expressions (e.g. ``~in_range("value", 2, 8)``).

    Output mode must be ``update`` (one row per key per trigger in
    which the key saw data)."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("_k"),
        F.coalesce(invalid_predicate.cast("boolean"), F.lit(True)).alias("_invalid"),
    )
    return keyed.groupBy("_k").applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
