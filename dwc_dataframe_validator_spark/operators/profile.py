"""Whole-table column profiling in one pass.

The reference computes per-column populated counts for the DwC frame
it validates (``field_populated_counts``, reference breakdown.py:37-51
— folded into the validator's single-pass MetricPlan); this
generalizes that to ANY table as a first-class profiling operator:
one aggregation over the table produces a LONG-format profile row per
column — name, Spark type, non-null count, distinct count — plus the
table row count on every row for ratio math.

Scale shapes (pick per corpus size):

- ``profile_table(df)`` (default, ``exact_distinct=False``) uses
  ``approx_count_distinct`` — ONE aggregation pass, no Expand, HLL
  state per column.  That is the 100 TB path.
- ``exact_distinct=True`` uses ``count(DISTINCT col)`` per column;
  Spark plans multiple distinct aggregates via an Expand operator
  that REPLICATES every input row once per column — cost ×
  |columns|.  Exact is what the SQL oracle replays
  (``table_profile_orders``), so the registry query uses it at
  oracle scale; at 100 TB use the default and accept ±2% distincts.

The wide 1-row aggregate is pivoted to long form with a single
``explode`` of per-column structs — no extra job, no driver loop over
data (only over the SCHEMA, which is driver-resident by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """Per-column profile of ``df`` in one aggregation pass:
    ``(column, dtype, n_rows, n_nonnull, n_distinct)``, one row per
    column, in schema order.  See the module docstring for the
    exact-vs-approx distinct trade-off."""
    if not df.columns:
        raise ValueError("cannot profile a zero-column DataFrame")
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, f in enumerate(df.schema.fields):
        c = F.col(f"`{f.name}`")
        aggs.append(F.count(c).alias(f"_nn{i}"))
        if isinstance(f.dataType, T.MapType):
            # Spark cannot hash/compare maps for distinct aggregation
            # — profile the column's completeness and report NULL
            # distincts rather than failing the whole table
            aggs.append(F.lit(None).cast("long").alias(f"_nd{i}"))
        elif exact_distinct:
            aggs.append(F.count_distinct(c).alias(f"_nd{i}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"_nd{i}"))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("_rows").alias("n_rows"),
            F.col(f"_nn{i}").alias("n_nonnull"),
            F.col(f"_nd{i}").alias("n_distinct"),
        )
        for i, f in enumerate(df.schema.fields)
    ]
    return wide.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")
