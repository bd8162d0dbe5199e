"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + noop write).  The
noop sink forces full evaluation of EVERY output column — under a bare
count(), Catalyst's ColumnPruning deletes unreferenced projection
expressions, so projection-only queries (token stats, quality scores)
would time scan+count instead of the actual work.  Timings from rounds
that counted instead of writing are therefore a lower bound for the
projection-heavy entries.

The headline set covers every execution shape: single-pass aggregate,
star join, window, LSH dedup, ANN (arrow + trained IVF), as-of and
interval joins, rollup, row-level annotation, text profiling,
streaming twin.
"""

from __future__ import annotations

import json
import os
import sys
import time

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

# FROZEN as of round 4: this 33-query set with the noop-sink timing is
# the per-query self-baseline recorded in BASELINE.md — compare new
# rounds query-by-query against that table, and do not change the set
# or the sink methodology (r2→r3 showed why: a sink change invalidates
# round-over-round comparison).
HEADLINE = [
    "q1_pricing_summary",
    "q_top_orders_by_revenue",
    "q_nation_revenue",
    "occurrence_validation_metrics",
    "a2_column_counts",
    "a13_date_parts",
    "fk_lineitem_orders",
    "dedup_exact_keepers",
    "dedup_minhash_lsh",
    "text_token_stats",
    "text_quality",
    "ann_cosine_topk_arrow",
    "ann_ivf_trained",
    "sessionize",
    "stream_window_counts",
    "asof_purchase_last_click",
    "range_join_event_sessions",
    "rollup_date_counts",
    "annotate_row_errors",
    "window_running_totals",
    "occurrence_full_metrics",
    # round-3 additions: vocabulary/tf-idf, deterministic sampling,
    # count-min sketch, component clustering, composed prep pipeline,
    # multi-format date parsing
    "text_vocab_top_terms",
    "text_tfidf_top_terms",
    "sample_stratified_events",
    "cms_event_type_counts",
    "dedup_clusters",
    "training_corpus_prep",
    "date_multiformat_parse",
    "user_event_sequences",
    "quantiles_by_event_type",
    "numeric_outliers_iqr",
    "doc_chunks",
    "contamination_hits",
    # round-6 addition (BASELINE.md addendum: not part of the frozen r3
    # 33-query total — compare this entry only against its own r6 time):
    # the scale-safe clustering form, trained cells ∝ corpus, so the
    # benched query and the 100 TB path are the same code
    "dedup_clusters_scaled",
    # round-6 additions (same addendum rule): span-level duplicate
    # detection (rolling-window fingerprints), the bloom-filter
    # membership sketch, bloom-prescreened window decontamination,
    # and unigram-surprisal quality scoring
    "span_dup_stats",
    "bloom_membership_check",
    "span_contamination_check",
    "unigram_surprisal_scores",
    # late round-6 addition (same addendum rule): incremental slice
    # ingestion — in-memory store + byte-packed bloom screen + exact
    # anti-join of the positive residue (the per-slice loop body of
    # slice-by-slice corpus construction)
    "incremental_dedup_check",
    # late round-6 additions (same addendum rule): the composed
    # decontaminate→dedup loop body, and the integer-grid hyperplane
    # LSH twin
    "incremental_pipeline_check",
    "ann_rp_lsh_check",
    # late round-6 addition (same addendum rule): two-phase
    # token-budget selection (no global sort)
    "token_budget_selection",
    # round-8 additions (same addendum rule): per-group mixture
    # selection (group-partitioned boundary window), policy-driven
    # exact dedup (priority CASE + one row_number shuffle), and
    # temperature-weighted mixture sampling (bounded agg + CASE filter)
    "token_budget_by_group",
    "dedup_priority_keepers",
    "temperature_mixture_stats",
    "epoch_repeat_stats",
    "hash_split_stats",
    "mixture_drift_by_source",
    "corpus_diff_summary",
    "table_profile_orders",
    "bigram_surprisal_scores",
    "top_fraction_by_source",
    # round-9 additions (same addendum rule): codec-free media header
    # decode (Arrow map-side), held-out trigram stupid-backoff scoring
    # (gram-key joins over compact aggregates), URL curation (regex
    # map-side + one groupBy each), filtered ANN serving, and the
    # merged per-slice profile (3 slice states + algebraic merge)
    "multimodal_header_meta",
    "trigram_surprisal_scores",
    "url_normalize_check",
    "url_dedup_keeper_rows",
    "domain_mix_report",
    "ann_filtered_topk",
    "merged_profile_orders",
    "histogram_quantiles_events",
    "target_mixture_stats",
    "quality_histogram_by_source",
    "quality_drift_tv_by_source",
    # late round-9 additions (same addendum rule): DSIR importance
    # scoring (two token passes, broadcast bucket weights),
    # boilerplate-line scrub (line-key join + per-doc reassembly),
    # WARC round-trip + WET extraction (Arrow parse / regex chains),
    # the composed crawl pipeline, per-domain cap (two-phase top-k),
    # and end-to-end fuzzy dedup (LSH pairs → components → keepers)
    "dsir_scores_lang",
    "boilerplate_scrub_corpus",
    "warc_roundtrip_check",
    "warc_wet_extract_check",
    "web_corpus_pipeline_check",
    "domain_cap_keepers",
    "minhash_dedup_keepers",
    # published-rule-set filters (same addendum rule): Gopher table-A1
    # document rules and C4 line cleanup — both single map-side
    # projections
    "gopher_quality_report",
    "c4_cleanup_corpus",
    "gopher_ngram_repetition",
    # round-12 additions (same addendum rule): the round-11 surface —
    # real PNG pixel decode + perceptual-hash image dedup, jusText
    # main-content extraction, the composed v2 crawl pipeline,
    # script-aware language ID, and Kneser-Ney bigram surprisal
    "image_pixel_hash_check",
    "image_phash_dedup_clusters",
    "wet_main_content_docs",
    "web_corpus_pipeline_v2_check",
    "text_language_id_v2",
    "kn_surprisal_scores",
    "crawl_ingest_check",
    "audio_pcm_feature_check",
    "audio_hash_dedup_clusters",
    "sentence_stats_docs",
    "gif_pixel_hash_check",
    "bmp_pixel_hash_check",
    "robots_filter_check",
    "jpeg_pixel_hash_check",
    "cross_format_image_dedup_check",
    # round-13 additions (same addendum rule): progressive-JPEG +
    # restart-interval decode (the decode-throughput row for the
    # vectorized einsum-IDCT path), charset-aware payload decode,
    # and the MJPEG-in-AVI video tier (frame hashes + near-dup)
    "jpeg_progressive_hash_check",
    "charset_decode_check",
    "video_frame_hash_check",
    "video_near_dup_clusters",
    "sentence_stats_abbrev_docs",
    "video_aligned_dedup_clusters",
    "http_wire_decode_check",
    "png_interlace_hash_check",
    "bmp_rle_pixel_hash_check",
    "audio_codec_feature_check",
    "gif_anim_frame_hash_check",
    "multimodal_header_meta_v2",
    "image_ingest_check",
    # round-14 additions (same addendum rule): br/zstd Content-Encoding
    # wire tier, the codec-free MP4 sample-table walk (hashes + byte
    # dedup), and the composed streaming-image finalization pipeline
    "http_content_encoding_check",
    "mp4_sample_hash_check",
    "mp4_byte_dedup_clusters",
    "image_ingest_finalize_check",
    "webm_sample_hash_check",
    "cross_container_video_dedup_check",
    "image_resize_check",
    "audio_resample_check",
    "tar_members_check",
    "webdataset_group_check",
    # round-15 additions (same addendum rule): the MPEG-audio
    # frame-sync walk (hashes + tag/trim-tolerant dedup), windowed
    # audio envelope hashing + the trim-tolerant aligned audio tier,
    # the laced-WebM re-verify, the Ogg page walk + cross-container
    # audio dedup, the zip shard source, the SRT/VTT subtitle parse +
    # caption-frame alignment, real IMA-ADPCM decode, and the BMP
    # RLE4/bitfields tier
    "mp3_frame_hash_check",
    "mp3_byte_dedup",
    "audio_window_hash_check",
    "audio_aligned_dedup_clusters",
    "ogg_sample_hash_check",
    "cross_container_audio_dedup_check",
    "zip_members_check",
    "zip_group_check",
    "subtitle_parse_check",
    "subtitle_frame_align_check",
    "adpcm_decode_check",
    "ms_adpcm_decode_check",
    "bmp_variant_pixel_hash_check",
    "exif_meta_check",
    "exif_oriented_dedup_check",
    "pdf_text_check",
    "pdf_token_stats_check",
    "id3_meta_check",
    "docx_text_check",
    # round-16 additions (own-round baselines in BASELINE.md):
    # office text over the zip source, PDF embedded images + the
    # standard security handler, MP3-in-RIFF, TIFF strips
    "xlsx_text_check",
    "pptx_text_check",
    "pdf_image_hash_check",
    "pdf_encrypted_text_check",
    "wav_mp3_frame_hash_check",
    "wav_mp3_cross_dedup",
    "tiff_pixel_hash_check",
    "pdf_cid_text_check",
    "epub_text_check",
    "rtf_text_check",
    "ico_pixel_hash_check",
    "office_corpus_token_check",
    "eml_text_check",
    # round-17 additions (own-round baselines): OpenDocument + mbox
    # text over the existing sources, and CCITT G4 / AES-256 / tiled-
    # planar-palette-JPEG TIFF / full-brotli re-verifies of the
    # reshaped fixtures (pdf_encrypted, pdf_image, tiff and
    # http_content_encoding rows above now carry the new tiers)
    "odf_text_check",
    "mbox_text_check",
    "zstd_dict_decode_check",
]

# The r3 frozen-baseline comparison set (BASELINE.md), named
# EXPLICITLY: slicing HEADLINE by position meant any future insertion
# before index 33 would silently corrupt the baseline comparison.
FROZEN33 = (
    "q1_pricing_summary",
    "q_top_orders_by_revenue",
    "q_nation_revenue",
    "occurrence_validation_metrics",
    "a2_column_counts",
    "a13_date_parts",
    "fk_lineitem_orders",
    "dedup_exact_keepers",
    "dedup_minhash_lsh",
    "text_token_stats",
    "text_quality",
    "ann_cosine_topk_arrow",
    "ann_ivf_trained",
    "sessionize",
    "stream_window_counts",
    "asof_purchase_last_click",
    "range_join_event_sessions",
    "rollup_date_counts",
    "annotate_row_errors",
    "window_running_totals",
    "occurrence_full_metrics",
    "text_vocab_top_terms",
    "text_tfidf_top_terms",
    "sample_stratified_events",
    "cms_event_type_counts",
    "dedup_clusters",
    "training_corpus_prep",
    "date_multiformat_parse",
    "user_event_sequences",
    "quantiles_by_event_type",
    "numeric_outliers_iqr",
    "doc_chunks",
    "contamination_hits",
)
assert len(FROZEN33) == 33 and set(FROZEN33) <= set(HEADLINE)


def _canary_sec(spark) -> float:
    """Fixed pure-JVM throughput probe (r20, VERDICT ask 4): one
    codegen'd aggregate over a deterministic in-memory range — no
    Python workers, no I/O, no data dependence — timed with the same
    noop-sink methodology.  Run before and after the query loop and
    recorded in the output JSON (additions-only; the per-query timing
    and the stdout contract are untouched), so a degraded-throughput
    window (the r19 frozen-33 artifact: untouched pure-JVM rows
    reading uniformly ~2x slow) is self-evident from the artifact
    instead of needing a control re-run."""
    import time as _t

    t0 = _t.perf_counter()
    (
        spark.range(0, 400_000_000, 1, 64)
        .selectExpr("sum(id * 3 + 1) as s", "count(1) as n")
        .write.format("noop").mode("overwrite").save()
    )
    return round(_t.perf_counter() - t0, 4)


def main() -> None:
    # validate --out BEFORE the (minutes-long) bench loop: a missing
    # value should be a usage error up front, not a crash at the end
    _local_bench_path()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = local_session("dwc-validator-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.get_queries()
    timings: dict[str, float] = {}
    # warm the JVM/codegen path once with a trivial job
    spark.range(1).count()
    canary_start = _canary_sec(spark)
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    canary_end = _canary_sec(spark)
    total = round(sum(timings.values()), 4)
    frozen = FROZEN33  # the r3 frozen-baseline set (BASELINE.md)
    frozen_total = round(sum(timings[n] for n in frozen), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    # Full per-query detail goes to a committed file — the driver's
    # tail capture truncates long stdout lines (BENCH_r9/r10 landed
    # "parsed": null), so stdout carries only a compact summary the
    # driver can always parse, plus the frozen-33 per-query dict
    # (~1.3KB, the baseline-comparison set).
    local_path = _local_bench_path()
    with open(local_path, "w") as fh:
        json.dump({
            "metric": "headline_queries_total",
            "value": total,
            "frozen33_total": frozen_total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_val,
            "canary_start_sec": canary_start,
            "canary_end_sec": canary_end,
        }, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "frozen33_total": frozen_total,
        "n_queries": len(timings),
        "detail_file": os.path.basename(local_path),
        "queries": {n: round(timings[n], 3) for n in frozen},
        "sf": sf_val,
        "canary_start_sec": canary_start,
        "canary_end_sec": canary_end,
    }, separators=(",", ":")))
    spark.stop()


def _local_bench_path() -> str:
    """Detail-file path. ``--out PATH`` wins; else the committed
    per-round name ``BENCH_LOCAL_r{N}.json`` (round from
    $SPARK_GRAFT_ROUND, else 1 + the highest driver-recorded
    BENCH_r{N}.json).  If that file ALREADY EXISTS it is someone's
    committed recording — do not shadow it (the r16→r17 recurrence):
    overflow to ``BENCH_LOCAL_r{N}@{git-short-head}.json`` (then
    ``...@{head}.2.json`` etc.), which .gitignore excludes so a
    driver bench run leaves the tree clean."""
    root = os.path.dirname(os.path.abspath(__file__))
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            raise SystemExit("usage: bench.py [--out PATH]")
        return sys.argv[i + 1]
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        import re

        seen = [
            int(m.group(1))
            for f in os.listdir(root)
            for m in [re.match(r"BENCH_r(\d+)\.json$", f)]
            if m
        ]
        rnd = str(max(seen, default=0) + 1)
    path = os.path.join(root, f"BENCH_LOCAL_r{int(rnd):02d}.json")
    if not os.path.exists(path):
        return path
    import subprocess

    try:
        head = subprocess.run(
            ["git", "-C", root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "nohead"
    except Exception:
        head = "nohead"
    stem = os.path.join(root, f"BENCH_LOCAL_r{int(rnd):02d}@{head}")
    path = stem + ".json"
    k = 2
    while os.path.exists(path):
        path = f"{stem}.{k}.json"
        k += 1
    return path


if __name__ == "__main__":
    main()
