"""Streaming faces of the per-source corpus dashboards: duplication
and benchmark-contamination rates folded micro-batch by micro-batch.

The batch dashboards (registry ``dedup_rate_by_source`` /
``contamination_rate_by_source``) answer "which feed is redundant /
contaminated" with one pass over the corpus.  On a live ingest that
pass would rescan the accumulated corpus per refresh; the streaming
face instead RECORDS a compact per-batch statistics slice as each
micro-batch flows through the ingest sink, and folds the slices on
read:

- ``docs/batch_id=N``  — per-source document counts (additive);
- ``pairs/batch_id=N`` — the batch's DISTINCT (source, fingerprint)
  pairs.  Distinct-fingerprint and cross-source-overlap counts are
  NOT additive, but they are exactly computable from the union of
  per-batch pair sets, and the pair tree is bounded by distinct
  fingerprints — the fingerprint-store size, never the corpus;
- ``contam/batch_id=N`` — per-source contamination aggregates
  (documents screened, documents with a confirmed heldout window
  overlap, total confirmed windows).  Each document lives in exactly
  one batch, so these ARE additive.

Replay safety inherits the ingest sink's shape: slices are keyed by
``batch_id`` and written with overwrite, so an at-least-once replay
rewrites the same directory with the same deterministic content —
the folded dashboards are value-idempotent.  Fold-equals-batch is
pinned in pytest (tests/test_sinks.py): driving N batches through the
sink and folding gives EXACTLY the batch dashboard over the
concatenated input.

Reference parity: none — dashboards extend the LLM-pipeline family
(SURVEY.md "beyond the reference" brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import fingerprint


def record_batch_stats(
    batch_df: DataFrame,
    batch_id: int,
    stats_path: str,
    heldout_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    profile: bool = False,
    histograms: dict | None = None,
    hist_group_col: str | None = None,
) -> None:
    """Write one micro-batch's dashboard slice.  Computed over the
    RAW batch (before decontamination/dedup filtering — the dashboards
    report on what ARRIVED, the same population the batch dashboards
    scan).  Cost: one fingerprint pass plus, with ``heldout_path``,
    the same bloom-prescreened window screen the sink already pays;
    with ``profile=True`` additionally one full-batch aggregation +
    write for the mergeable column-profile slice (opt-in, mirroring
    ``ingest_slice``'s ``profile`` flag — callers that never fold
    ``profile_dashboard`` should not pay it)."""
    if profile:
        from ..operators.profile import profile_state

        # r9: per-batch mergeable profile slice — the streaming face
        # of corpus-lifetime profiling (operators/profile.py).
        # Deterministic content + batch-id-keyed overwrite =
        # value-idempotent on replay, like every other slice here.
        profile_state(batch_df, f"batch-{batch_id}").write.mode(
            "overwrite"
        ).parquet(f"{stats_path}/profiles/batch_id={batch_id}")

    if histograms:
        from ..operators.profile import histogram_state

        # r9: per-batch mergeable NUMERIC HISTOGRAM slice (``{column:
        # power-of-two granularity}``, optionally per ``hist_group_col``)
        # — the distribution half of the profile, feeding the
        # cumulative quantile and TV-drift dashboards.  Opt-in like
        # ``profile``; same batch-id-keyed idempotent overwrite.
        histogram_state(
            batch_df,
            histograms,
            f"batch-{batch_id}",
            group_col=hist_group_col,
        ).write.mode("overwrite").parquet(
            f"{stats_path}/hist/batch_id={batch_id}"
        )

    fps = fingerprint(batch_df, text_col, id_col).join(
        batch_df.select(
            id_col, source_col, F.length(text_col).alias("_chars")
        ),
        id_col,
    )
    (
        fps.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # additive token-mass proxy for the mixture-drift fold
            # (r8); chars, not the regex token count — a per-batch
            # stats slice should cost a length(), not a regex pass
            F.coalesce(F.sum("_chars"), F.lit(0))
            .cast("long")
            .alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{stats_path}/docs/batch_id={batch_id}")
    )
    (
        fps.filter(F.col("fingerprint").isNotNull())
        .select(source_col, "fingerprint")
        .distinct()
        .write.mode("overwrite")
        .parquet(f"{stats_path}/pairs/batch_id={batch_id}")
    )
    if heldout_path is not None:
        from ..operators.incremental import screen_slice_contamination

        screened = screen_slice_contamination(
            batch_df.sparkSession,
            heldout_path,
            batch_df,
            text_col=text_col,
            id_col=id_col,
        ).join(batch_df.select(id_col, source_col), id_col)
        (
            screened.groupBy(source_col)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count_if(F.col("confirmed_windows") > 0).alias(
                    "contaminated_docs"
                ),
                F.sum("confirmed_windows").alias("confirmed_windows"),
            )
            .write.mode("overwrite")
            .parquet(f"{stats_path}/contam/batch_id={batch_id}")
        )


def dedup_dashboard(spark: SparkSession, stats_path: str) -> DataFrame:
    """Fold the recorded slices into the per-source duplication
    dashboard — same schema and values as the batch
    ``dedup_rate_by_source`` over the concatenated batches.  Runs on
    the compact pair tree (distinct fingerprints), never the corpus
    text."""
    docs = spark.read.parquet(f"{stats_path}/docs")
    pairs = spark.read.parquet(f"{stats_path}/pairs")
    per_src_docs = docs.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs")
    )
    # a fingerprint seen in several batches collapses here, exactly as
    # a corpus-wide countDistinct would
    dedup_pairs = pairs.select("source", "fingerprint").distinct()
    per_src_fps = dedup_pairs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_fingerprints")
    )
    other = (
        dedup_pairs.alias("a")
        .join(
            dedup_pairs.alias("b"),
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source"),
            F.col("a.fingerprint").alias("fingerprint"),
        )
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cross_source_fps"))
    )
    return (
        per_src_docs.join(per_src_fps, "source", "left")
        .join(other, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_fingerprints"), F.lit(0))
            .cast("long")
            .alias("n_fingerprints"),
            (F.col("n_docs") - F.coalesce(F.col("n_fingerprints"), F.lit(0)))
            .cast("long")
            .alias("dup_docs"),
            (
                (
                    F.col("n_docs")
                    - F.coalesce(F.col("n_fingerprints"), F.lit(0))
                ).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            F.coalesce(F.col("cross_source_fps"), F.lit(0))
            .cast("long")
            .alias("cross_source_fps"),
        )
    )


def mixture_drift_dashboard(
    spark: SparkSession, stats_path: str, alpha: float = 0.5
) -> DataFrame:
    """Fold the recorded per-batch (source, chars) slices into the
    recipe-vs-reality mixture report — same schema and arithmetic as
    the batch ``operators.sampling.mixture_drift`` over the
    concatenated batches, with chars as the token-mass proxy the
    slices record.  Char sums are additive (each document lives in
    exactly one batch), so the fold is exact; cost is the docs tree
    (|sources| × batches rows), never the corpus.

    Slices written before round 8 lack the ``n_chars`` column.  The
    explicit-schema read surfaces them as NULL (never a schema-
    inference lottery over which file gets sampled), and this fold
    REFUSES to run over a mix — silently dropping the old batches
    would report drift over a fraction of the corpus.  Re-record or
    backfill (the dashboards are derived artifacts, regenerable from
    the corpus)."""
    from ..operators.sampling import mixture_drift

    docs = spark.read.schema(
        "source string, n_docs long, n_chars long"
    ).parquet(f"{stats_path}/docs")
    legacy = docs.filter(
        F.col("n_chars").isNull() & F.col("n_docs").isNotNull()
    ).limit(1)
    if legacy.count() > 0:
        raise ValueError(
            f"{stats_path}/docs contains slices without the n_chars "
            "column (recorded before the drift dashboard existed) — "
            "folding only the newer batches would silently misreport "
            "shares; re-record the stats or backfill the old slices"
        )
    return mixture_drift(docs, "source", "n_chars", alpha=alpha)


def profile_dashboard(spark: SparkSession, stats_path: str) -> DataFrame:
    """Cumulative column profile folded from the per-batch profile
    slices — merge_profile_states over the ``profiles`` tree, so the
    lifetime profile costs |batches| × |columns| state rows, never a
    corpus rescan.  Cumulative ≡ batch-engine on the concatenated
    batches for every exact field (pytest-pinned; the HLL distinct
    estimate carries sketch error)."""
    from ..operators.profile import merge_profile_states, profile_estimate

    states = spark.read.parquet(f"{stats_path}/profiles")
    return profile_estimate(
        merge_profile_states(states.drop("batch_id"))
    ).withColumnRenamed("n_slices", "n_batches")


def quality_gate_dashboard(
    spark: SparkSession, stats_path: str
) -> DataFrame:
    """Cumulative quality-gate report folded from the per-batch gate
    slices (written by ``streaming.ingest.ingest_batch`` when both
    ``min_quality_logit`` and ``stats_path`` are set): per source,
    documents that arrived, documents the gate kept, and the kept
    rate.  Counts are additive (each doc is gated in exactly one
    batch), so the fold equals the batch engine on the concatenated
    input exactly."""
    gate = spark.read.parquet(f"{stats_path}/gate")
    return gate.groupBy("source").agg(
        F.sum("n_in").cast("long").alias("n_in"),
        F.sum("n_kept").cast("long").alias("n_kept"),
        (
            F.sum("n_kept").cast("double") / F.sum("n_in").cast("double")
        ).alias("kept_rate"),
    )


def contamination_dashboard(
    spark: SparkSession, stats_path: str
) -> DataFrame:
    """Fold the recorded contamination slices: per-source documents
    screened, contaminated documents, rate, confirmed windows — same
    schema as the batch ``contamination_rate_by_source``.  Pure sums:
    every document belongs to exactly one batch."""
    contam = spark.read.parquet(f"{stats_path}/contam")
    return contam.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("contaminated_docs").cast("long").alias("contaminated_docs"),
        (
            F.sum("contaminated_docs").cast("double")
            / F.sum("n_docs").cast("double")
        ).alias("contamination_rate"),
        F.sum("confirmed_windows").cast("long").alias("confirmed_windows"),
    )


def histogram_dashboard(
    spark: SparkSession, stats_path: str, qs: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Cumulative quantile estimates folded from the per-batch
    histogram slices (written by ``record_batch_stats(histograms=...)``)
    — corpus-lifetime score distributions without a rescan, error
    bounded by each column's granularity ``g``.  Exactly equal to the
    batch engine on the concatenated batches (bucket counts are
    integer sums — pytest-pinned), state is |batches| × buckets."""
    from ..operators.profile import (
        histogram_quantiles,
        merge_histogram_states,
    )

    states = spark.read.parquet(f"{stats_path}/hist")
    return histogram_quantiles(
        merge_histogram_states(states.drop("batch_id", "slice_id")), qs=qs
    )


def histogram_drift_dashboard(
    spark: SparkSession, stats_path: str
) -> DataFrame:
    """Distribution-drift alert over the stream: exact total-variation
    distance of the LATEST batch's histogram against the merged
    history before it (``operators.profile.histogram_tv_distance`` —
    NULL-safe groups, one-sided groups read tv=1.0).  The page-on
    number for "this feed's score distribution just shifted", computed
    entirely from bounded histogram state.  Needs ≥2 recorded batches
    (raises otherwise — one batch has no history to drift from)."""
    from ..operators.profile import (
        histogram_tv_distance,
        merge_histogram_states,
    )

    states = spark.read.parquet(f"{stats_path}/hist").withColumn(
        # partition-column type inference may read batch_id as string,
        # where max() picks lexicographically ("9" > "10") — force a
        # numeric newest-batch selection
        "batch_id", F.col("batch_id").cast("long")
    )
    # bounded collect: one scalar — the newest batch id from the
    # partition column
    ids = [r[0] for r in states.select("batch_id").distinct().collect()]
    if len(ids) < 2:
        raise ValueError(
            "histogram drift needs >=2 recorded batches, found "
            f"{len(ids)}"
        )
    latest = max(ids)
    prior = merge_histogram_states(
        states.filter(F.col("batch_id") != latest).drop(
            "batch_id", "slice_id"
        )
    )
    newest = merge_histogram_states(
        states.filter(F.col("batch_id") == latest).drop(
            "batch_id", "slice_id"
        )
    )
    return histogram_tv_distance(prior, newest)
