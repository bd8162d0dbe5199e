"""Sequence packing: turn a document corpus into fixed-token-budget
training sequences.

The reference has no notion of this (SURVEY §2 — none); it is the last
step of every LLM pre-training pipeline: documents are concatenated
into a token stream and the stream is cut into ``seq_budget``-token
sequences, so the trainer sees dense batches instead of padding.

Spark-first design, built for 100 TB:

- **No global order.**  A naive packer sorts the whole corpus and does
  one running sum — a single-partition window at scale.  Instead rows
  are first assigned a deterministic hash **bucket** (first 8 hex chars
  of ``md5(id)`` mod ``n_buckets``) and packing happens independently
  per bucket: one shuffle on ``pack_bucket``, then a per-bucket window.
  ``n_buckets`` is the parallelism knob — 10k buckets on a 100 TB corpus
  keeps every window partition at ~10 GB regardless of corpus size.
- **Value-deterministic.**  Bucket and within-bucket order depend only
  on the id VALUE (md5, then ``id`` ascending), never on partition
  layout — the same corpus packs identically on any cluster, and the
  DuckDB oracle reproduces the assignment bit-for-bit.
- **Concatenated-stream semantics.**  A document belongs to the
  sequence where its first token lands (``floor(start_offset /
  seq_budget)``); a document longer than the budget spills into the
  following sequence(s) rather than being dropped — the trainer's
  sequence cutter handles the split, the packer only decides placement.
  ``fill`` can therefore exceed 1.0 for sequences holding an oversized
  document's head; that is a property of stream packing, not a bug.

Everything is built-in expressions (md5/conv/window/floor) — zero UDFs,
whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(col: Column | str, n_buckets: int) -> Column:
    """Deterministic, engine-portable bucket: first 8 hex chars of
    ``md5(value)`` as an integer, mod ``n_buckets`` (same construction
    as the count-min sketch rows, ``sketch.py``)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(c.cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return h % n_buckets


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every row a ``(pack_bucket, pack_seq)`` training-sequence
    id plus its ``start_offset`` in the bucket's token stream.

    One shuffle (on ``pack_bucket``), one window pass per bucket.
    ``token_col`` is any precomputed token count (see
    ``text.token_count`` / ``text.bpe_ish_token_count``).
    """
    if seq_budget <= 0:
        raise ValueError(f"seq_budget must be positive, got {seq_budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("pack_bucket", _hash_bucket(id_col, n_buckets))
        .withColumn(
            "start_offset",
            F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "pack_seq",
            F.floor(F.col("start_offset") / F.lit(seq_budget)).cast("long"),
        )
    )


def materialize_sequences(
    packed: DataFrame, id_col: str, token_col: str
) -> DataFrame:
    """The training-export manifest: one row per packed sequence with
    its document composition in stream order — ``(pack_bucket,
    pack_seq, n_docs, seq_tokens, doc_ids_csv, token_counts_csv)``.
    This is the artifact a sequence-writer job consumes to emit actual
    token shards; keeping it as (csv-string) manifests rather than
    re-reading text keeps the export stage metadata-only.

    Stream order within a sequence is the packer's order (``id``
    ascending — the window order of ``pack_sequences``), rebuilt here
    with ``array_sort(collect_list(struct(id, tokens)))`` so the
    manifest is value-deterministic and the DuckDB oracle reproduces it
    with ``string_agg(... ORDER BY id)``.  No new shuffle: the groupBy
    keys start with ``pack_bucket``, so the window's hash partitioning
    already satisfies the aggregation's clustering requirement."""
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(id_col), F.col(token_col)))
    )
    return (
        packed.groupBy("pack_bucket", "pack_seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("long").alias("seq_tokens"),
            F.concat_ws(
                ",", F.transform(pairs, lambda t: t[id_col].cast("string"))
            ).alias("doc_ids_csv"),
            F.concat_ws(
                ",", F.transform(pairs, lambda t: t[token_col].cast("string"))
            ).alias("token_counts_csv"),
        )
    )


def packing_stats(packed: DataFrame, token_col: str, seq_budget: int) -> DataFrame:
    """Per-bucket packing summary: sequence count, document count,
    total tokens, and exact fill statistics.

    ``fill = seq_tokens / seq_budget`` values are dyadic rationals
    (integer tokens over a power-of-two-friendly budget) so the double
    sums are exact and engine-portable.  Reuses the ``pack_bucket``
    partitioning from ``pack_sequences`` — the second aggregation is a
    map-side combine on already-co-located data.
    """
    seqs = packed.groupBy("pack_bucket", "pack_seq").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("seq_tokens"),
    )
    fill = F.col("seq_tokens") / F.lit(float(seq_budget))
    return (
        seqs.groupBy("pack_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("seq_tokens").cast("long").alias("total_tokens"),
            F.max(fill).alias("max_fill"),
            F.avg(fill).alias("avg_fill"),
        )
    )
