"""Driver-contract registry (assembler).

The query implementations live in ``registry_parts/part1..6``
(a sequential append-only chain — the round-19 mechanical split
of the former 11.4k-line single file; zero name changes).  This
module re-exports everything, then applies the curated
``DRIVER_WINDOW`` ordering — the one deliberate, test-pinned
edit point (tests/test_plans.py mirrors the literal window).
See registry_parts/part1.py for the oracle design rules.
"""
from __future__ import annotations

from .registry_parts.part6 import *  # noqa: F401,F403
from .registry_parts.part6 import (  # noqa: F401 — underscore surface
    _ABBREV_PREFIXES,
    _BOR_LOWER,
    _BOR_SQL,
    _BPE_SF001_MERGES,
    _DWCA_EVENT_FIXTURE,
    _DWCA_FIXTURE,
    _EMB_PAIRS_SQL,
    _EPOCH_BUDGET,
    _EVENT_TYPES,
    _GROUP_BUDGETS,
    _JSONL_FIXTURE,
    _JUSTEXT_FIXTURE_SQL,
    _JUSTEXT_TAIL,
    _MIXTURE,
    _MULTISCRIPT_TEXTS,
    _MULTISCRIPT_TEXT_SQL,
    _OCC_VIEW_COLUMNS,
    _OCC_VIEW_SQL,
    _ORDERS_PROFILE_COLS,
    _ROBOTS_HOSTS,
    _ROBOTS_PATHS,
    _ROBOTS_RULES,
    _SPLITS,
    _TEMP_BUDGET,
    _TGT_BUDGET,
    _URL_FIXTURE_SQL,
    _URL_NORM_SQL,
    _adpcm_pinned_oracle,
    _audio_resample_oracle,
    _audio_window_pinned_oracle,
    _bmp_pinned_oracle,
    _bmp_rle_pinned_oracle,
    _bmp_variant_pinned_oracle,
    _bpe_learned_oracle_sql,
    _charset_pinned_oracle,
    _content_encoding_pinned_oracle,
    _dec,
    _docs_as_lines,
    _eml_pinned_oracle,
    _frame_sample_pinned_oracle,
    _full_metrics_oracle_sql,
    _gif_anim_pinned_oracle,
    _gif_pinned_oracle,
    _hash_case_oracle,
    _hash_split_oracle_sql,
    _ico_pinned_oracle,
    _image_finalize_oracle,
    _image_ingest_oracle,
    _image_resize_oracle,
    _jpeg_pinned_oracle,
    _jpeg_prog_pinned_oracle,
    _justext_oracles,
    _justext_payload_col,
    _mbox_pinned_oracle,
    _merged_profile_oracle_sql,
    _minhash_keepers_oracle,
    _mixture_oracle_sql,
    _mp3_frame_pinned_oracle,
    _mp4_sample_pinned_oracle,
    _ms_adpcm_pinned_oracle,
    _multiscript_text_col,
    _ngram_rep_oracle,
    _occurrence_checks,
    _odf_pinned_oracle,
    _office_corpus_pinned_oracle,
    _ogg_sample_pinned_oracle,
    _pdf_cid_pinned_oracle,
    _pdf_encrypted_pinned_oracle,
    _pdf_image_pinned_oracle,
    _pdf_text_pinned_oracle,
    _pdf_token_stats_oracle,
    _pii_oracle_sql,
    _pin_text_lit,
    _png_i_pinned_oracle,
    _png_pinned_oracle,
    _quality_drift_oracle_sql,
    _quality_histogram_oracle_sql,
    _quality_model_oracle_sql,
    _robots_effective,
    _robots_oracle,
    _robots_payloads,
    _sql_lit,
    _synthetic_url_col,
    _table_profile_oracle_sql,
    _tar_fixture_rows,
    _tar_members_oracle,
    _tiff_pinned_oracle,
    _token_budget_by_group_oracle_sql,
    _token_budget_oracle_sql,
    _top_fraction_oracle_sql,
    _video_frame_pinned_oracle,
    _wav_codec_pinned_oracle,
    _wav_mp3_frame_pinned_oracle,
    _wav_pinned_oracle,
    _web,
    _webdataset_group_oracle,
    _webm_sample_pinned_oracle,
    _wire_decode_pinned_oracle,
    _zip_fixture_rows,
    _zip_group_oracle,
    _zip_members_oracle,
    _zstd_dict_pinned_oracle,
)



# Driver-verified window — an EXPLICIT name list (round 13, replacing
# the round-12 positional-insert hack per ADVICE): the driver's
# correctness gate runs ``list(QUERIES)[:50]``, so the window is
# enforced by reordering QUERIES to lead with exactly these names.
# Coverage changes are now a deliberate edit of THIS list (mirrored by
# the pin in tests/test_plans.py in the same commit), never a
# dict-order side effect of an insertion elsewhere.  Every name here
# must be exact-oracled (asserted below at import).
#
# Round-13 rotation: in — jpeg_pixel_hash_check, robots_filter_check,
# sentence_stats_docs, audio_hash_dedup_clusters, crawl_ingest_check
# (the round-12 operators the verdict asked to driver-verify); out —
# a4_range_count, a5_group_populated, a11_value_histogram, a12_top_k,
# a14_offender_sample (long-stable A-series singletons, pytest-pinned
# and still swept every round by tools/verify_local.py).
#
# Round-14 rotation: in — the seven round-13 operators the r13 verdict
# asked to driver-verify (jpeg_progressive_hash_check,
# http_wire_decode_check, charset_decode_check, video_frame_hash_check,
# video_aligned_dedup_clusters, image_ingest_check,
# audio_codec_feature_check); out — a1_record_count,
# a8_a9_distinct_duplicates, p6_membership_filter, text_language_id
# (v2 stays), sample_hash_events, sample_stratified_events,
# pivot_event_types (long-stable singletons, pytest-pinned and still
# swept every round by tools/verify_local.py).
#
# Round-14 second rotation: in — the four NEW round-14 entries
# (http_content_encoding_check, mp4_sample_hash_check,
# mp4_byte_dedup_clusters, image_ingest_finalize_check); out —
# q_top_orders_by_revenue, dedup_fingerprint, date_multiformat_parse,
# a13_date_parts (each family keeps another window member or a pytest
# pin, all stay in the full local sweep); then image_resize_check and
# audio_resample_check in for cms_event_type_counts and
# text_tfidf_top_terms (same rule); finally tar_members_check and
# webdataset_group_check in for robots_filter_check and
# jpeg_pixel_hash_check (the web and JPEG families keep
# wet_main_content_docs and jpeg_progressive_hash_check).
#
# Round-15 rotation (the r14 verdict's ask): in — the STALE
# singletons p4_range_filter (last driver-green r03) and
# a4/a5/a11/a12/a14 (r12), plus the round-15 newcomers
# (mp3_frame_hash_check, mp3_byte_dedup, audio_window_hash_check,
# audio_aligned_dedup_clusters, webm_sample_hash_check — re-verify
# after the lacing expansion — ogg_sample_hash_check,
# cross_container_audio_dedup_check, zip_members_check,
# zip_group_check, subtitle_parse_check, subtitle_frame_align_check);
# out — seventeen r14-driver-green entries, the FRESHEST
# verifications and therefore the safest to bench: simhash,
# sentence_stats, doc_chunks, jpeg_progressive, http_wire/charset/
# content_encoding, video_frame/video_aligned (their tier is
# re-driven via subtitle_frame_align_check and the audio aligned
# sibling), image_ingest (finalize stays), audio_codec_feature,
# mp4_sample/mp4_byte (the dispatching tier re-enters through the
# webm/mp3/ogg walks), image_resize, audio_resample, tar_members /
# webdataset_group (the shard-source discipline re-enters as zip).
# All stay pytest-pinned and in the every-round local sweep.
# Late r15 swap: adpcm_decode_check (new real decoder) in for
# audio_hash_dedup_clusters (r14-green; its clustering core stays
# driver-driven via the aligned/windowed audio entries).
# Second late-r15 swap — the EXIF, PDF and BMP-variant tiers in for
# five r14-greens whose families keep window members or pins:
# exif_meta_check ← dedup_exact_keepers (minhash/dedup_clusters
# stay), exif_oriented_dedup_check ← image_phash_dedup_clusters
# (image_ingest_finalize stays; the oriented face drives the same
# hash grid), pdf_text_check ← crawl_ingest_check
# (wet_main_content_docs stays), pdf_token_stats_check ←
# text_token_stats (token_count is exactly what it drives),
# bmp_variant_pixel_hash_check ← text_ngram_top_neighbor.
# Round-16 rotation (r15 VERDICT ask 6): the four entries last
# driver-green in r13 — p6_membership_filter, a1_record_count,
# a8_a9_distinct_duplicates, a13_date_parts — swap back in for four
# r15-green singletons whose families keep window members:
# p6 ← a4_range_count (p4_range_filter keeps range coercion),
# a1 ← a5_group_populated (occurrence metrics keep group-populated),
# a8_a9 ← a11_value_histogram (a13 date-part histograms cover the
# histogram shape), a13 ← a12_top_k (a14_offender_sample keeps the
# order-limit family).
# Round-16 additions: xlsx_text_check ← zip_members_check (the
# office tier IS the zip source exercised harder; zip_group_check
# stays), pptx_text_check ← subtitle_parse_check
# (subtitle_frame_align_check keeps the subtitle grammar pinned),
# pdf_image_hash_check ← webm_sample_hash_check
# (cross_container_audio_dedup_check keeps the WebM walk driven),
# pdf_encrypted_text_check ← audio_window_hash_check
# (audio_aligned_dedup_clusters keeps the windowed-envelope tier),
# wav_mp3_frame_hash_check ← ogg_sample_hash_check (same keeper
# covers the Ogg walk), tiff_pixel_hash_check ← zip_group_check
# (the zip source is driven by the three office checks in-window),
# pdf_cid_text_check ← mp3_byte_dedup (the frame walk and the
# cross-container dedup stay via mp3_frame_hash_check +
# wav_mp3_frame_hash_check), epub_text_check ← exif_meta_check
# (exif_oriented_dedup_check keeps the EXIF walk driven),
# rtf_text_check ← dedup_embedding_cosine (dedup_clusters keeps the
# dedup family), ico_pixel_hash_check ← id3_meta_check (the ID3v2
# walk stays driven by mp3_frame_hash_check's re-tag variants),
# office_corpus_token_check ← subtitle_frame_align_check (driver-
# green r15; the composed office-union integration claim takes the
# slot), eml_text_check ← adpcm_decode_check
# (ms_adpcm_decode_check keeps the ADPCM family in-window).
# Round-17 rotation: odf_text_check ← epub_text_check (the zip
# office family keeps xlsx/pptx/office_corpus_token in-window),
# mbox_text_check ← eml_text_check (the mailbox check RUNS the EML
# extractor on every message, so the mail family keeper is the new
# entry itself), http_content_encoding_check ← rtf_text_check (the
# wire tier gained the full-brotli classes this round and needs a
# driver pass; office text keeps docx/xlsx/pptx in-window).  The
# r17-reshaped fixtures already in-window (pdf_encrypted, pdf_image,
# tiff) re-verify their new AES-256 / CCITT / tiled-planar-palette-
# JPEG tiers without a swap.
# Round-18 rotation (r17 VERDICT ask 1): the five stalest §2 parity
# entries regain hard driver rows — fk_lineitem_orders (last driver-
# green r3), a4_range_count, a5_group_populated, a11_value_histogram,
# a12_top_k (all r15) — in for five r17-green media checks whose
# families keep in-window keepers:
# fk_lineitem_orders ← ico_pixel_hash_check (tiff_pixel_hash_check
# keeps the pixel-grid family; ICO stays pytest-pinned + local sweep),
# a4_range_count ← ms_adpcm_decode_check (mp3_frame_hash_check,
# cross_container_audio_dedup_check and audio_aligned_dedup_clusters
# keep the audio decode family in-window),
# a5_group_populated ← exif_oriented_dedup_check
# (image_ingest_finalize_check keeps the image-dedup walk; the EXIF
# orientation grid stays pytest-pinned),
# a11_value_histogram ← bmp_variant_pixel_hash_check
# (tiff_pixel_hash_check keeps the pixel-hash family),
# a12_top_k ← wav_mp3_frame_hash_check (mp3_frame_hash_check keeps
# the MP3 frame walk).  Also r18: dwca_archive_profile (in-window)
# gains the event-core dispatch columns (§2.11 quirk 8) — the
# event-archive path is now driver-visible without a slot.
# Round-19 rotation (r18 VERDICT ask 1): the eleven stalest registry
# singletons regain hard driver rows — q_nation_revenue,
# set_ops_nations, quarantine_counts, salted_event_type_counts,
# stream_session_counts, dedup_exact_groups, ann_cosine_topk (all
# last driver-green r3), jsonl_source_profile (r10),
# multimodal_blob_meta, rollup_date_counts, window_running_totals
# (r11) — in for eleven r18-green media/office checks whose families
# keep in-window keepers:
# q_nation_revenue ← odf_text_check, rollup_date_counts ←
# xlsx_text_check, window_running_totals ← pptx_text_check,
# salted_event_type_counts ← mbox_text_check (docx_text_check +
# office_corpus_token_check keep the zip-office/mail union family),
# set_ops_nations ← pdf_token_stats_check, ann_cosine_topk ←
# pdf_cid_text_check, jsonl_source_profile ←
# pdf_encrypted_text_check (pdf_text_check + pdf_image_hash_check
# keep the PDF text/image family; the CID and AES paths stay
# pytest-pinned + local sweep),
# dedup_exact_groups ← mp3_frame_hash_check,
# multimodal_blob_meta ← audio_aligned_dedup_clusters
# (cross_container_audio_dedup_check keeps the audio frame walk and
# the aligned-dedup composition in-window),
# stream_session_counts ← image_ingest_finalize_check
# (tiff_pixel_hash_check keeps the pixel/ingest family),
# quarantine_counts ← wet_main_content_docs
# (http_content_encoding_check keeps the web/wire family; WET main-
# content extraction stays pytest-pinned + local sweep).
# Round-20 rotation (r19 VERDICT ask 2): the six queries the r19
# optimization round rewired (decode memo + CID fusion + exchange
# removals) AFTER their slots rotated out regain hard driver rows —
# the exact inverse of the r19 swaps, so the driver independently
# re-verifies the modified paths while the freshly-r19-green parity
# singletons rotate back out:
# pdf_cid_text_check ← ann_cosine_topk,
# pdf_token_stats_check ← set_ops_nations,
# xlsx_text_check ← rollup_date_counts,
# mp3_frame_hash_check ← dedup_exact_groups,
# audio_aligned_dedup_clusters ← multimodal_blob_meta,
# image_ingest_finalize_check ← stream_session_counts.
DRIVER_WINDOW: tuple[str, ...] = (
    "q1_pricing_summary",
    "a2_column_counts",
    "a10_vocab_membership",
    "p8_json_extract",
    "occurrence_validation_metrics",
    "occurrence_full_metrics",
    "fk_orders_customer",
    "dwca_archive_profile",
    "dwca_orphan_multimedia",
    "p4_range_filter",
    "p6_membership_filter",
    "a1_record_count",
    "a8_a9_distinct_duplicates",
    "a13_date_parts",
    "a14_offender_sample",
    "q_nation_revenue",
    "fk_lineitem_orders",
    "http_content_encoding_check",
    "dedup_clusters",
    "pdf_token_stats_check",
    "text_quality",
    "text_language_id_v2",
    "docx_text_check",
    "quarantine_counts",
    "a5_group_populated",
    "salted_event_type_counts",
    "pdf_text_check",
    "a11_value_histogram",
    "contamination_hits",
    "training_corpus_prep",
    "ann_cosine_topk_arrow",
    "a4_range_count",
    "annotate_row_errors",
    "stream_window_counts",
    "sessionize",
    "numeric_profile",
    "asof_purchase_last_click",
    "range_join_event_sessions",
    "image_ingest_finalize_check",
    "mp3_frame_hash_check",
    "pdf_cid_text_check",
    "jsonl_source_profile",
    "audio_aligned_dedup_clusters",
    "pdf_image_hash_check",
    "a12_top_k",
    "cross_container_audio_dedup_check",
    "xlsx_text_check",
    "tiff_pixel_hash_check",
    "window_running_totals",
    "office_corpus_token_check",
)

assert len(DRIVER_WINDOW) == 50, len(DRIVER_WINDOW)
assert all(n in QUERIES for n in DRIVER_WINDOW), [
    n for n in DRIVER_WINDOW if n not in QUERIES
]
assert all(n in ORACLES for n in DRIVER_WINDOW), [
    n for n in DRIVER_WINDOW if n not in ORACLES
]
_order = list(DRIVER_WINDOW) + [n for n in QUERIES if n not in DRIVER_WINDOW]
_rotated = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_rotated)


def get_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)

