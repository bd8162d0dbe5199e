"""Incremental corpus ingestion: dedup and decontaminate a SLICE
against persisted index artifacts instead of re-processing the corpus.

A 100 TB corpus is not built in one job — it is ingested in slices
(a crawl snapshot, a vendor drop, a day of logs).  Re-running global
dedup over corpus+slice for every slice costs O(corpus) per slice,
O(corpus²/slice) overall; the production pattern is to persist a
COMPACT artifact of the corpus once and screen each slice against it
at O(slice) cost:

- **Exact-dedup fingerprint store** — one 32-hex md5 per kept
  document (operators/text.py ``fingerprint``: whitespace-normalized,
  lowercased text), parquet PARTITIONED BY ``fp_bucket`` (first hex
  byte, 256 directories).  ~16 bytes/doc: a billion-document corpus
  is a ~30 GB store next to 100 TB of text.
- **Bloom bits over the store** — the same Kirsch-Mitzenmacher
  md5-grid filter as the decontamination screen
  (operators/sketch.py), persisted as set-bit positions.  Bloom
  union is bitwise OR, so the update path is append-only: new
  positions are appended and deduplicated on load.

Screening a slice is then:

1. collapse the slice internally (first-per-fingerprint — one
   shuffle on the 16-byte key, slice-sized);
2. test each surviving fingerprint against the corpus bloom
   MAP-SIDE (one byte-packed filter literal in the probe expression
   — no join, no shuffle,
   no scan of the store);
3. only the bloom-POSITIVE residue (true duplicates + the controlled
   false-positive trickle, ~0.1% of novel docs at the default
   geometry) pays the exact anti-join against the store — and because
   positives carry ≤ 256 distinct ``fp_bucket`` values, the store
   scan is pruned to the touched partitions (``PartitionFilters``,
   pinned in tests) after a BOUNDED ≤ 256-row driver collect;
4. survivors (bloom-negatives + verified positives) append their
   fingerprints back to the store and their bit positions to the
   bloom — the artifacts stay current without a rewrite.

Bloom filters have no false negatives, so survivors are EXACTLY the
set the pure anti-join would produce — the bloom only changes how
much of the store is read.  That makes the whole operator
value-deterministic and lets the registry check
(``incremental_dedup_check``) sit behind an exact DuckDB oracle while
the persistence round-trip, append path, and partition pruning are
pinned in pytest.

Reference parity: none — the reference validator
(/root/reference/dwc_validator/validate.py) is single-archive,
single-pass; incremental ingestion extends the LLM-pipeline family
(SURVEY.md "beyond the reference" brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import sketch
from .text import fingerprint

#: bloom geometry defaults — k hash probes over m bits.  m must be a
#: power of two (km_positions relies on it) and sized ~14 bits per
#: expected distinct fingerprint for ~0.1% FP; at 100 TB you size m to
#: the corpus the same way BASELINE.md sizes IVF cells.
DEFAULT_K = 5
DEFAULT_M = 1 << 16


def _fp_bucket(fp) -> F.Column:
    """Partition bucket = first hex byte of the digest (0..255).
    Derived from the fingerprint itself, so both engines and both
    sides of any join agree without storing anything extra."""
    return F.conv(F.substring(fp, 1, 2), 16, 10).cast("int")


def fingerprint_store(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The corpus's compact dedup artifact as a DataFrame:
    ``(fingerprint, fp_bucket)`` distinct.  One shuffle (the
    distinct); 16 bytes + 4 per kept document."""
    fps = (
        fingerprint(df, text_col, id_col)
        .select("fingerprint")
        .filter(F.col("fingerprint").isNotNull())
        .distinct()
    )
    return fps.withColumn("fp_bucket", _fp_bucket(F.col("fingerprint")))


def save_fingerprint_index(
    store: DataFrame,
    path: str,
    mode: str = "overwrite",
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
) -> None:
    """Persist the dedup artifact: the fingerprint store partitioned
    by ``fp_bucket`` plus the bloom set-bit positions.

    ``mode="append"`` is the update path — new fingerprints land in
    per-bucket files and new bloom positions are appended (bloom union
    = OR, so append + distinct-on-load is exact).  No rewrite of
    existing data either way."""
    store.write.partitionBy("fp_bucket").mode(mode).parquet(
        f"{path}/fingerprints"
    )
    bits = sketch.bloom_build_hex(store, "fingerprint", k=k, m=m)
    bits.write.mode(mode).parquet(f"{path}/bloom")


def load_fingerprint_index(spark: SparkSession, path: str):
    """Reload ``save_fingerprint_index`` output: (store DataFrame —
    lazy, partition-prunable; the bloom set-bit positions frame —
    pack with ``sketch.bloom_pack_bytes`` before probing).

    Schemas are explicit so an EMPTY seed is a valid index: an empty
    partitioned write produces no data files, and schema inference
    would fail on them — but "start the corpus from nothing and let
    ingestion build it" is exactly the bootstrap the streaming sink
    documents."""
    store = spark.read.schema("fingerprint string, fp_bucket int").parquet(
        f"{path}/fingerprints"
    )
    bits = (
        spark.read.schema("pos bigint")
        .parquet(f"{path}/bloom")
        .distinct()
    )
    return store, bits


def incremental_dedup(
    batch: DataFrame,
    store: DataFrame,
    bloom_blob: bytes | None = None,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    text_col: str = "text",
    id_col: str = "doc_id",
    prune_store_partitions: bool = False,
) -> DataFrame:
    """Survivors of ``batch`` against a corpus fingerprint ``store``:
    ``(id_col, fingerprint, batch_copies)`` — first-per-fingerprint
    within the batch (lowest id), minus fingerprints already in the
    store.  ``batch_copies`` is how many batch rows collapsed into the
    keeper.

    With ``bloom_blob`` (from ``sketch.bloom_pack_bytes`` over the
    store's bits — the one-literal packing; the word-list form's
    k*m/64 expression nodes blow up driver-side planning at large m),
    only bloom-positive keepers join the store; negatives
    short-circuit as definitely-new map-side.  Without it, every
    keeper joins — same rows either way (no false negatives), which is
    what the exact oracle checks.

    ``prune_store_partitions`` additionally collects the positives'
    distinct ``fp_bucket`` values (BOUNDED: ≤ 256 rows by
    construction) and pushes them as a partition filter on the store
    scan — only meaningful when the store is the persisted
    partitioned-parquet form."""
    fps = fingerprint(batch, text_col, id_col).select(id_col, "fingerprint")
    fps = fps.filter(F.col("fingerprint").isNotNull())
    w = Window.partitionBy("fingerprint")
    keep = (
        fps.withColumn(
            "batch_copies", F.count(F.lit(1)).over(w).cast("long")
        )
        .withColumn(
            "_rk", F.row_number().over(w.orderBy(F.col(id_col)))
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )

    if bloom_blob is None:
        candidates, negatives = keep, None
    else:
        # the collapsed keepers feed BOTH bloom branches (and the
        # bucket collect below): checkpoint once so the slice-sized
        # collapse shuffle runs once, then both filters are map-side
        # passes over the materialized keepers
        keep = keep.localCheckpoint(eager=True)
        hit = sketch.bloom_test_hex_bytes(
            F.col("fingerprint"), bloom_blob, k, m
        )
        candidates = keep.filter(hit)
        negatives = keep.filter(~hit)

    if "fp_bucket" in store.columns:
        store_keyed = store.select("fingerprint", "fp_bucket")
    else:
        store_keyed = store.select(
            "fingerprint",
            _fp_bucket(F.col("fingerprint")).alias("fp_bucket"),
        )
    if prune_store_partitions and bloom_blob is not None:
        buckets = [
            r["fp_bucket"]
            for r in candidates.select(
                _fp_bucket(F.col("fingerprint")).alias("fp_bucket")
            )
            .distinct()
            .collect()  # bounded: fp_bucket has ≤ 256 values
        ]
        store_keyed = store_keyed.filter(F.col("fp_bucket").isin(buckets))

    fresh = candidates.join(
        store_keyed.select("fingerprint"), "fingerprint", "left_anti"
    )
    survivors = fresh if negatives is None else negatives.unionByName(fresh)
    return survivors.select(id_col, "fingerprint", "batch_copies")


def ingest_slice(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full per-slice ingestion step against a PERSISTED index:
    screen ``batch``, append the survivors' fingerprints and bloom
    positions back to the index, return the survivors (materialized —
    the append must not observe its own output).

    This is the loop body of 100 TB corpus construction: each slice
    pays one slice-sized shuffle, one map-side bloom screen, and a
    store read pruned to the touched buckets — never a scan of the
    accumulated corpus text."""
    store, bits = load_fingerprint_index(spark, path)
    blob = sketch.bloom_pack_bytes(bits, m)
    survivors = incremental_dedup(
        batch,
        store,
        bloom_blob=blob,
        k=k,
        m=m,
        text_col=text_col,
        id_col=id_col,
        prune_store_partitions=True,
    ).localCheckpoint(eager=True)
    new_store = survivors.select("fingerprint").distinct().withColumn(
        "fp_bucket", _fp_bucket(F.col("fingerprint"))
    )
    save_fingerprint_index(new_store, path, mode="append", k=k, m=m)
    return survivors


def save_heldout_index(
    heldout: DataFrame,
    path: str,
    w: int = 8,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Persist the decontamination artifact: the heldout/benchmark
    set's distinct w-token window fingerprints plus their bloom
    positions — what ``operators/pipeline.py span_contamination``
    derives inline, written once so every future slice reuses it.

    ``mode="append"`` grows the suite (a new benchmark added to the
    heldout set) without rewriting: both trees are VALUE sets, so
    readers de-duplicate on load — ``load_heldout_index`` is the one
    sanctioned read path; a raw ``spark.read`` of the windows tree
    after appends would double-count overlapping windows in the
    verify join."""
    from .spans import window_fingerprints

    hw = (
        window_fingerprints(heldout, id_col, text_col, w)
        .select("h")
        .distinct()
        .localCheckpoint()
    )
    hw.write.mode(mode).parquet(f"{path}/windows")
    sketch.bloom_build_hex(hw, "h", k=k, m=m).write.mode(
        mode
    ).parquet(f"{path}/bloom")


def load_heldout_index(spark: SparkSession, path: str):
    """Reload ``save_heldout_index`` output, de-duplicated (appends
    may overlap): (distinct window-fingerprint frame, distinct bloom
    set-bit positions frame).  Explicit schemas for the same
    empty-seed reason as ``load_fingerprint_index``."""
    hw = (
        spark.read.schema("h string")
        .parquet(f"{path}/windows")
        .distinct()
    )
    bits = (
        spark.read.schema("pos bigint")
        .parquet(f"{path}/bloom")
        .distinct()
    )
    return hw, bits


def screen_slice_contamination(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    w: int = 8,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``span_contamination`` of ``batch`` against a PERSISTED heldout
    index: same output contract ``(id_col, n_windows,
    candidate_windows, confirmed_windows)``, but the heldout side is
    two small parquet reads instead of a re-derivation — the slice
    pays its own scan plus the map-side bloom screen, nothing else.
    Equality with the inline form is pinned in pytest."""
    hw, bits = load_heldout_index(spark, path)
    blob = sketch.bloom_pack_bytes(bits, m)

    from .spans import window_fingerprints

    cw = window_fingerprints(batch, id_col, text_col, w)
    cand = cw.filter(sketch.bloom_test_hex_bytes(F.col("h"), blob, k, m))
    verified = cand.join(
        F.broadcast(hw.withColumn("_hit", F.lit(1))), "h", "left"
    )
    per_doc = verified.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("candidate_windows"),
        F.count("_hit").alias("confirmed_windows"),
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = batch.select(
        F.col(id_col),
        F.when(
            F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
            F.lit(0),
        )
        .otherwise(F.size(toks))
        .cast("long")
        .alias("_n_tokens"),
    ).select(
        id_col,
        F.greatest(F.lit(0), F.col("_n_tokens") - F.lit(w) + 1)
        .cast("long")
        .alias("n_windows"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_windows",
        F.coalesce(F.col("candidate_windows"), F.lit(0))
        .cast("long")
        .alias("candidate_windows"),
        F.coalesce(F.col("confirmed_windows"), F.lit(0))
        .cast("long")
        .alias("confirmed_windows"),
    )


def compact_fingerprint_index(
    spark: SparkSession, path: str, files_per_bucket: int = 1
) -> None:
    """Operational hygiene for the append-only store: every
    ``ingest_slice`` lands one small file per touched bucket (plus
    bloom-position rows), so N slices leave O(N·256) files — and at
    some point file-open overhead, not bytes, dominates the store
    scan.  Compaction rewrites each tree once: fingerprints
    de-duplicated (replayed appends may have left value-duplicates —
    harmless for correctness, wasted bytes) and coalesced to
    ``files_per_bucket`` files per partition; bloom positions
    distinct-ed into one file.  Correctness is unchanged by
    construction (both trees are VALUE sets); the rewrite stages into
    a sibling directory and swaps via rename so a crashed compaction
    leaves the original store intact."""
    store, bits = load_fingerprint_index(spark, path)
    tmp = f"{path}/_compact_tmp"
    (
        store.distinct()
        .repartition("fp_bucket")
        .coalesce(256 * files_per_bucket)
        .write.partitionBy("fp_bucket")
        .mode("overwrite")
        .parquet(f"{tmp}/fingerprints")
    )
    bits.write.mode("overwrite").parquet(f"{tmp}/bloom")

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for tree in ("fingerprints", "bloom"):
        src = jvm.org.apache.hadoop.fs.Path(f"{tmp}/{tree}")
        dst = jvm.org.apache.hadoop.fs.Path(f"{path}/{tree}")
        fs = dst.getFileSystem(conf)
        old = jvm.org.apache.hadoop.fs.Path(f"{path}/_old_{tree}")
        if fs.exists(old):
            fs.delete(old, True)
        fs.rename(dst, old)
        fs.rename(src, dst)
        fs.delete(old, True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)


def decontaminate_batch(
    batch: DataFrame,
    heldout_windows: DataFrame,
    bloom_blob: bytes,
    w: int = 8,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The CLEAN subset of ``batch``: documents sharing NO w-token
    window with the heldout set survive.  Same screen as
    ``screen_slice_contamination`` but shaped as a filter — the bloom
    prescreen keeps the corpus-side cost one map-side scan, the exact
    broadcast verify kills bloom false positives, and only confirmed
    doc ids reach the anti-join.  Bloom has no false negatives, so the
    surviving SET is bloom-independent (exact-oracle-able)."""
    from .spans import window_fingerprints

    cw = window_fingerprints(batch, id_col, text_col, w)
    cand = cw.filter(
        sketch.bloom_test_hex_bytes(F.col("h"), bloom_blob, k, m)
    )
    dirty = (
        cand.join(F.broadcast(heldout_windows.select("h")), "h")
        .select(id_col)
        .distinct()
    )
    return batch.join(dirty, id_col, "left_anti")


def ingest_slice_clean(
    spark: SparkSession,
    index_path: str,
    heldout_path: str,
    batch: DataFrame,
    w: int = 8,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed per-slice loop body: decontaminate against the
    persisted heldout index, THEN dedup against the persisted
    fingerprint store and grow it — slice in, clean novel survivors
    out, both artifacts current.  Decontamination runs first so
    dropped documents never pay fingerprint work and never enter the
    store — the store stays a registry of CLEAN text only, which is
    what later slices should dedup against."""
    hw, hbits = load_heldout_index(spark, heldout_path)
    blob = sketch.bloom_pack_bytes(hbits, m)
    clean = decontaminate_batch(
        batch, hw, blob, w=w, k=k, m=m, text_col=text_col, id_col=id_col
    )
    return ingest_slice(
        spark, index_path, clean, k=k, m=m, text_col=text_col,
        id_col=id_col,
    )


def fingerprint_index_stats(
    spark: SparkSession,
    path: str,
    k: int = DEFAULT_K,
    m: int = DEFAULT_M,
) -> dict:
    """Health report for a persisted index — the numbers that trigger
    maintenance:

    - ``n_fingerprints`` (distinct) and ``n_rows`` (with append
      duplicates): a widening gap says run ``compact_fingerprint_index``;
    - ``bloom_fill_ratio`` = set bits / m and the implied
      ``bloom_fp_rate`` ≈ fill^k: the docstrings' "size m to the
      corpus" contract, measured — past ~50% fill the FP trickle
      stops being a trickle and the bloom should be rebuilt at a
      larger m (rebuild = one pass over the compact store, never the
      corpus);
    - ``max_bucket_skew`` = largest bucket / mean: md5 buckets should
      sit near 1.0; drift says the fingerprint inputs are degenerate.

    Driver-side result (a handful of scalars from two aggregates) —
    this is a monitoring probe, not a data path."""
    store, bits = load_fingerprint_index(spark, path)
    row = store.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("fingerprint").alias("fps"),
    ).collect()[0]
    n_rows, n_fps = row["rows"], row["fps"]
    n_bits = bits.count()
    per_bucket = (
        store.groupBy("fp_bucket").count().agg(F.max("count")).collect()
    )[0][0]
    mean_bucket = n_rows / 256 if n_rows else 0
    fill = n_bits / m
    return {
        "n_rows": n_rows,
        "n_fingerprints": n_fps,
        "duplicate_rows": n_rows - n_fps,
        "bloom_set_bits": n_bits,
        "bloom_fill_ratio": fill,
        "bloom_fp_rate": fill**k,
        "max_bucket_skew": (per_bucket / mean_bucket) if mean_bucket else 0.0,
        "needs_compaction": n_rows > 1.2 * n_fps if n_fps else False,
        "needs_bloom_resize": fill > 0.5,
    }
