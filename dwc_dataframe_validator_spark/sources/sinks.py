"""Output sinks: partitioned and bucketed parquet writers.

The reference's only sink is the JSON report (S5, ``model.py``); a
large-scale pipeline also needs data sinks whose layout pre-pays the
next job's shuffle:

- ``write_partitioned``: directory partitioning (hive-style) — gives
  downstream readers partition pruning on the partition columns;
- ``write_bucketed``: hash-bucketed table — two tables bucketed by the
  same key and count join WITHOUT a shuffle (SortMergeJoin with both
  sides already distributed); the standard co-location trick for a
  fact table joined on the same key every day.

Both are thin, opinionated wrappers; the point is the layout contract,
not the code.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet.  Partition columns should be
    low-cardinality (date, category) — one directory per value; a
    high-cardinality partition column creates millions of tiny files."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) managed table.  Joins and
    aggregations on the bucket columns between same-bucketed tables
    skip the shuffle entirely.  Requires a metastore-backed
    ``saveAsTable`` (bucket metadata lives in the catalog)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
