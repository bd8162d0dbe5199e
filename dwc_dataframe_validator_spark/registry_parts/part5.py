"""Registry slice 5/6 — see registry_parts/__init__.py."""
from __future__ import annotations

from .part4 import *  # noqa: F401,F403 — append-only chain
from .part4 import (  # noqa: F401 — underscore chain
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
    _audio_resample_oracle,
    _bmp_pinned_oracle,
    _bpe_learned_oracle_sql,
    _dec,
    _docs_as_lines,
    _full_metrics_oracle_sql,
    _gif_pinned_oracle,
    _hash_split_oracle_sql,
    _jpeg_pinned_oracle,
    _justext_oracles,
    _justext_payload_col,
    _merged_profile_oracle_sql,
    _minhash_keepers_oracle,
    _mixture_oracle_sql,
    _multiscript_text_col,
    _ngram_rep_oracle,
    _occurrence_checks,
    _pii_oracle_sql,
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
    _token_budget_by_group_oracle_sql,
    _token_budget_oracle_sql,
    _top_fraction_oracle_sql,
    _wav_pinned_oracle,
    _web,
    _webdataset_group_oracle,
    _zip_fixture_rows,
    _zip_group_oracle,
    _zip_members_oracle,
)



def jpeg_pixel_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG pixel decode (operators/multimodal.py
    ``jpeg_decode_pixels``: Huffman entropy decode with Annex K
    tables, dequantization, orthonormal-matrix IDCT, 4:2:0 nearest
    upsample, JFIF YCbCr→RGB) through the shared hash grid — the tier
    that closes the last common pixel stub.  Classes mix grayscale,
    4:4:4 and 4:2:0; %% 17 truncates mid-scan (malformed → ok=false),
    %% 13 rewrites SOF0→SOF2 (progressive — the remaining documented
    stub → ok=false).  The oracle pins the 12 expected hash pairs
    computed driver-side through the same decode functions."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_pixel_hashes(multimodal.attach_jpeg_blob(docs))


QUERIES["jpeg_pixel_hash_check"] = jpeg_pixel_hash_check
ORACLES["jpeg_pixel_hash_check"] = _jpeg_pinned_oracle()


def cross_format_image_dedup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-FORMAT near-dup image dedup — the canonical crawl case a
    byte-level dedup can never catch: the same picture re-hosted as a
    pristine PNG and as a JPEG re-encode.  Each document contributes
    BOTH encodings of its class frame (operators/multimodal.py
    ``attach_xfmt_blobs``); the two REAL decoders produce pixel
    planes whose dHashes are identical by fixture construction (±14
    gradient steps dwarf JPEG's smooth-block quantization error;
    cross-class ≥ 27 bits), so ``image_phash_dedup`` must merge every
    class across formats — which the oracle states as the 8
    base-class clusters with twice the per-class document count."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = multimodal.image_phash_dedup(
        multimodal.attach_xfmt_blobs(docs), "content", "id",
        backend="pure",  # oracle determinism: never the native codec
    )
    return clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members")
    )


QUERIES["cross_format_image_dedup_check"] = cross_format_image_dedup_check

ORACLES["cross_format_image_dedup_check"] = """
    WITH m AS (
      SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS cls FROM documents)
    SELECT CAST(min(doc_id) * 2 AS BIGINT) AS cluster,
           2 * count(*) AS n_members
    FROM m GROUP BY cls
"""


def sentence_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats (operators/text.py
    ``sentence_stats``): terminal-punctuated runs plus the
    unterminated trailer, per-doc counts and integer mean/max words
    per sentence — the deterministic sentence-level quality signals
    (C4's ≥3-sentence rule's substrate).  One map-side projection;
    the oracle replays the two regexes and the list aggregation."""
    return text.sentence_stats(load_table(spark, sf_dir, "documents"))


QUERIES["sentence_stats_docs"] = sentence_stats_docs

ORACLES["sentence_stats_docs"] = """
    WITH s AS (
      SELECT doc_id,
             regexp_extract_all(text, '[^.!?]+[.!?]+') AS sents,
             reverse(regexp_extract(reverse(text), '^[^.!?]*'))
               AS trailer
      FROM documents),
    a AS (
      SELECT doc_id, coalesce(len(sents), 0) AS n_term,
             CASE WHEN length(trim(trailer)) > 0
                  THEN list_append(sents, trailer) ELSE sents END AS alls
      FROM s),
    w AS (
      SELECT doc_id, n_term, coalesce(len(alls), 0) AS n,
             list_transform(
               alls,
               x -> len(regexp_extract_all(x, '{nonws}+'))) AS wc
      FROM a)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_sentences,
           CAST(n_term AS BIGINT) AS n_terminated,
           CAST(coalesce(list_aggregate(wc, 'sum'), 0) AS BIGINT)
             AS total_words,
           CASE WHEN n > 0 THEN
             CAST(coalesce(list_aggregate(wc, 'sum'), 0) // n AS BIGINT)
           END AS mean_sentence_words,
           CASE WHEN n > 0 THEN
             CAST(list_aggregate(wc, 'max') AS BIGINT)
           END AS max_sentence_words
    FROM w
""".replace("{nonws}", text.PORTABLE_NONWS)


def _jpeg_prog_pinned_oracle() -> str:
    """Pinned-constant oracle for the progressive/restart JPEG tier.
    Progressive, baseline+DRI and progressive+DRI encodings of a frame
    all carry the SAME quantized coefficients, so every wrapper mode
    must hash identically to the plain baseline — the oracle verifies
    that by pinning one hash pair per frame class, computed driver-side
    through the very decode path under test."""
    rows = {}
    for cls in range(12):
        px = multimodal._jpeg_fixture_pixels(cls)
        blob = multimodal.jpeg_encode(
            px, subsample=(px.shape[2] == 3 and cls % 2 == 1),
            progressive=True,
        )
        dec = multimodal.jpeg_decode_pixels(blob)
        rows[cls] = (
            px.shape[2],
            format(multimodal.image_ahash(dec), "016x"),
            format(multimodal.image_dhash(dec), "016x"),
        )
    chan = " ".join(
        "WHEN doc_id %% 12 = %d THEN %d" % (c, v[0]) for c, v in rows.items()
    )
    ah = " ".join(
        "WHEN doc_id %% 12 = %d THEN '%s'" % (c, v[1]) for c, v in rows.items()
    )
    dh = " ".join(
        "WHEN doc_id %% 12 = %d THEN '%s'" % (c, v[2]) for c, v in rows.items()
    )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS id,
          CAST(CASE WHEN bad THEN 0 ELSE 16 END AS INTEGER) AS width,
          CAST(CASE WHEN bad THEN 0 ELSE 16 END AS INTEGER) AS height,
          CAST(CASE WHEN bad THEN 0 ELSE (CASE {chan} END)
               END AS INTEGER) AS channels,
          CASE WHEN bad THEN NULL ELSE (CASE {ah} END) END AS ahash,
          CASE WHEN bad THEN NULL ELSE (CASE {dh} END) END AS dhash,
          NOT bad AS ok
        FROM (SELECT doc_id, doc_id % 17 = 0 AS bad FROM documents)
    """


def jpeg_progressive_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG + restart-interval decode
    (operators/multimodal.py ``jpeg_decode_pixels``: SOF2 spectral
    selection + successive approximation with DC/AC refinement scans
    and EOB runs, DRI/RSTn resync in both modes) through the shared
    hash grid.  Fixture wrappers rotate progressive / baseline+DRI /
    progressive+DRI per doc_id %% 3; ALL must hash identically to the
    plain baseline of the same frame because the quantized
    coefficients are the same — the CDN-re-encode merge that was the
    round-12 verdict's top ask.  %% 17 truncates (ok=false).  The
    oracle pins the 12 per-class hash pairs computed driver-side
    through the same decode functions."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_pixel_hashes(
        multimodal.attach_jpeg_prog_blob(docs)
    )


QUERIES["jpeg_progressive_hash_check"] = jpeg_progressive_hash_check
ORACLES["jpeg_progressive_hash_check"] = _jpeg_prog_pinned_oracle()


def _wire_decode_pinned_oracle() -> str:
    """Pinned-constant oracle for the HTTP wire-decode tier: per
    fixture class the expected (content_encoding, chunked,
    body_decoded, encoding, wet text) computed driver-side through
    the same decode + strip path; the %11 corrupt-gzip plant keeps
    its raw bytes with body_decoded=false."""
    import re as _re

    from ..sources import warc as warcmod

    def strip(text):
        # replicates strip_html's collapse+trim EXACTLY: Java \s is
        # [ \t\n\x0B\f\r] and Spark's trim removes ONLY spaces —
        # Python's .strip() also eats \x1c-\x1f (its str.isspace() is
        # wider), which matters for the corrupt-gzip class whose raw
        # bytes start with \x1f
        body = text.split("\r\n\r\n", 1)[1]
        collapsed = _re.sub(
            "[ \\t\\n\\x0b\\f\\r]+", " ", _re.sub(r"<[^>]*>", " ", body)
        )
        return collapsed.strip(" ").replace("'", "''")

    rows = {}
    for cls in range(8):
        did = next(d for d in (cls, cls + 8, cls + 16) if d % 11)
        t, enc, _src, ce, ch, dec = warcmod.decode_payload_full(
            warcmod.build_encoded_http_blob(did)
        )
        rows[cls] = (ce, ch, dec, enc, strip(t))
    bt, benc, _bs, bce, bch, bdec = warcmod.decode_payload_full(
        warcmod.build_encoded_http_blob(0)  # 0 % 11 == 0: corrupt gzip
    )
    bad = (bce, bch, bdec, benc, strip(bt))
    ce_c = " ".join(
        "WHEN doc_id %% 8 = %d THEN %s"
        % (c, "'%s'" % v[0] if v[0] else "NULL")
        for c, v in rows.items()
    )
    ch_c = " ".join(
        "WHEN doc_id %% 8 = %d THEN %s" % (c, str(v[1]).upper())
        for c, v in rows.items()
    )
    dec_c = " ".join(
        "WHEN doc_id %% 8 = %d THEN %s" % (c, str(v[2]).upper())
        for c, v in rows.items()
    )
    enc_c = " ".join(
        "WHEN doc_id %% 8 = %d THEN '%s'" % (c, v[3])
        for c, v in rows.items()
    )
    txt_c = " ".join(
        "WHEN doc_id %% 8 = %d THEN '%s'" % (c, v[4])
        for c, v in rows.items()
    )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CASE WHEN corrupt THEN '{bad[0]}'
               ELSE (CASE {ce_c} END) END AS content_encoding,
          CASE WHEN corrupt THEN {str(bad[1]).upper()}
               ELSE (CASE {ch_c} END) END AS chunked,
          CASE WHEN corrupt THEN {str(bad[2]).upper()}
               ELSE (CASE {dec_c} END) END AS body_decoded,
          CASE WHEN corrupt THEN '{bad[3]}'
               ELSE (CASE {enc_c} END) END AS encoding,
          CASE WHEN corrupt THEN '{bad[4]}'
               ELSE (CASE {txt_c} END) END AS text
        FROM (SELECT doc_id, doc_id % 11 = 0 AS corrupt FROM documents)
    """


def http_wire_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP wire decode (sources/warc.py ``decode_http_body`` inside
    ``decode_warc_payload_text``): Transfer-Encoding chunked
    de-framing, then Content-Encoding gzip / zlib-deflate / RAW
    deflate decompression, composing with the charset sniff over the
    DECODED body (the gzip+latin-1 class) and with ``wet_extract``.
    The br class and the %%11 corrupt-gzip plant keep raw bytes with
    ``body_decoded=false`` — rows are counted and routed, never
    dropped.  All map-side."""
    from ..operators import web
    from ..sources import warc as warcmod

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    dec = warcmod.decode_warc_payload_text(
        warcmod.attach_encoded_http_blob(docs), id_col="id"
    )
    p = F.col("payload_text")
    status = web.http_status(p)
    ctype = web.http_header(p, "content-type")
    is_html = (
        (status >= 200) & (status < 300)
        & F.lower(F.coalesce(ctype, F.lit(""))).startswith("text/html")
    )
    return dec.select(
        F.col("id").alias("doc_id"),
        "content_encoding",
        "chunked",
        "body_decoded",
        "encoding",
        F.when(is_html, web.strip_html(web.http_body(p))).alias("text"),
    )


QUERIES["http_wire_decode_check"] = http_wire_decode_check
ORACLES["http_wire_decode_check"] = _wire_decode_pinned_oracle()


def _content_encoding_pinned_oracle() -> str:
    """Pinned-constant oracle for the br/zstd Content-Encoding tier:
    per fixture class the expected (content_encoding, chunked,
    body_decoded, encoding, wet text) computed driver-side through
    the same decode + strip path (sources/warc.py
    ``build_content_encoding_blob`` → ``decode_payload_full``).
    Classes 6/7 (a mislabeled Compressed_Block over raw HTML / junk
    brotli) and the %11 truncated-zstd plant pin
    ``body_decoded=false``; classes 10/11 are REAL compressed-block
    zstd frames the round-16 pure FSE/Huffman tier decodes — both
    asserted here to regenerate their class HTML exactly.  The junk
    payloads fail the native codecs too, so the pinned rows are
    environment-independent."""
    import re as _re

    from ..sources import warc as warcmod

    def strip(text):
        # replicates strip_html's collapse+trim EXACTLY (see
        # _wire_decode_pinned_oracle: Java \s, Spark space-only trim)
        body = text.split("\r\n\r\n", 1)[1]
        collapsed = _re.sub(
            "[ \\t\\n\\x0b\\f\\r]+", " ", _re.sub(r"<[^>]*>", " ", body)
        )
        return collapsed.strip(" ").replace("'", "''")

    rows = {}
    for cls in range(14):
        did = next(d for d in (cls, cls + 14, cls + 28) if d % 11)
        t, enc, _src, ce, ch, dec = warcmod.decode_payload_full(
            warcmod.build_content_encoding_blob(did)
        )
        # text pinned only for decoded bodies — the query NULLs the
        # text of undecoded ones (raw compressed bytes are not wet
        # text, and their replacement-char soup would be meaningless
        # to pin)
        rows[cls] = (ce, ch, dec, enc, strip(t) if dec else None)
        if cls in (10, 11, 12, 13):
            assert dec, cls  # the pure entropy tiers must decode these
    bt, benc, _bs, bce, bch, bdec = warcmod.decode_payload_full(
        warcmod.build_content_encoding_blob(0)  # 0 % 11 == 0: truncated
    )
    bad = (bce, bch, bdec, benc, strip(bt) if bdec else None)
    ce_c = " ".join(
        "WHEN doc_id %% 14 = %d THEN %s"
        % (c, "'%s'" % v[0] if v[0] else "NULL")
        for c, v in rows.items()
    )
    ch_c = " ".join(
        "WHEN doc_id %% 14 = %d THEN %s" % (c, str(v[1]).upper())
        for c, v in rows.items()
    )
    dec_c = " ".join(
        "WHEN doc_id %% 14 = %d THEN %s" % (c, str(v[2]).upper())
        for c, v in rows.items()
    )
    enc_c = " ".join(
        "WHEN doc_id %% 14 = %d THEN '%s'" % (c, v[3])
        for c, v in rows.items()
    )
    txt_c = " ".join(
        "WHEN doc_id %% 14 = %d THEN %s"
        % (c, "'%s'" % v[4] if v[4] is not None else "NULL")
        for c, v in rows.items()
    )
    bad_txt = "'%s'" % bad[4] if bad[4] is not None else "NULL"
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CASE WHEN corrupt THEN '{bad[0]}'
               ELSE (CASE {ce_c} END) END AS content_encoding,
          CASE WHEN corrupt THEN {str(bad[1]).upper()}
               ELSE (CASE {ch_c} END) END AS chunked,
          CASE WHEN corrupt THEN {str(bad[2]).upper()}
               ELSE (CASE {dec_c} END) END AS body_decoded,
          CASE WHEN corrupt THEN '{bad[3]}'
               ELSE (CASE {enc_c} END) END AS encoding,
          CASE WHEN corrupt THEN {bad_txt}
               ELSE (CASE {txt_c} END) END AS text
        FROM (SELECT doc_id, doc_id % 11 = 0 AS corrupt FROM documents)
    """


def http_content_encoding_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """br/zstd Content-Encoding decode (sources/warc.py
    ``_brotli_decode`` / ``_zstd_decode`` behind ``decode_http_body``):
    the optional-backend contract — native codec when importable,
    else the pure-Python stored-frame tier (brotli uncompressed
    metablocks RFC 7932 §9.2; zstd raw/RLE blocks + skippable frames
    RFC 8878), else honest ``body_decoded=false`` raw routing.  The
    fixture rotates brotli-stored / zstd-raw / zstd-RLE / skippable /
    chunked-wrapping-zstd / brotli+latin-1 / mislabeled-block-zstd
    (false) / compressed-brotli (false) / LF-framed-chunked-gzip (the
    r14 lenient-framing fix) / chained gzip,br / REAL compressed-block
    zstd / REAL level-19 multi-section zstd (both decoded by the pure
    RFC 8878 FSE+Huffman tier, round 16) / REAL q11 brotli and the
    twin's LZ metablocks (the round-17 pure RFC 7932 tier: static
    dictionary + transforms + context modeling) per doc_id %% 14;
    %% 11 plants a truncated zstd frame.  All map-side, zero shuffles."""
    from ..operators import web
    from ..sources import warc as warcmod

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    dec = warcmod.decode_warc_payload_text(
        warcmod.attach_content_encoding_blob(docs), id_col="id"
    )
    p = F.col("payload_text")
    return dec.select(
        F.col("id").alias("doc_id"),
        "content_encoding",
        "chunked",
        "body_decoded",
        "encoding",
        F.when(
            F.col("body_decoded"), web.strip_html(web.http_body(p))
        ).alias("text"),
    )


QUERIES["http_content_encoding_check"] = http_content_encoding_check
ORACLES["http_content_encoding_check"] = _content_encoding_pinned_oracle()


def _zstd_dict_pinned_oracle() -> str:
    """Pinned oracle for the dictionary-zstd tier: four pinned
    level-19 frames (reference-CLI-compressed against the pinned
    trained dictionary) decode byte-exactly through the pure tier —
    asserted here — while the truncated and wrong-dictionary-id
    plants flag."""
    from ..sources import warc as warcmod

    d, _frames = warcmod.zstd_dict_fixture()
    rows = {}
    for cls in range(4):
        did = next(x for x in (cls + 4, cls + 8, cls + 20)
                   if x % 17 and x % 13 and x % 4 == cls)
        got = warcmod.zstd_decompress(
            warcmod.build_zstd_dict_blob(did), d
        )
        assert got is not None and got.startswith(
            b"<doc class=%d>" % cls
        ), cls
        rows[cls] = got.decode("utf-8")
    for did in (17, 13):
        assert warcmod.zstd_decompress(
            warcmod.build_zstd_dict_blob(did), d
        ) is None, did
    nb_c = " ".join(
        "WHEN cls = %d THEN %d" % (c, len(v.encode()))
        for c, v in rows.items()
    )
    tx_c = " ".join(
        "WHEN cls = %d THEN '%s'" % (c, v.replace("'", "''"))
        for c, v in rows.items()
    )
    return f"""
        WITH base AS (
          SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
                 doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
          FROM documents)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CASE WHEN bad THEN NULL
               ELSE CAST(CASE {nb_c} END AS INTEGER) END AS n_bytes,
          CASE WHEN bad THEN NULL ELSE CASE {tx_c} END END AS text,
          NOT bad AS ok
        FROM base
    """


def zstd_dict_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-zstd decode (sources/warc.py
    ``_zstd_parse_dictionary`` → ``zstd_decompress`` behind
    ``zstd_dict_decode``): RFC 8878 §5 dictionaries — entropy tables
    seed the frame context, the content prefixes the match window,
    repeat offsets initialize from the header — decoded against a
    reference-CLI-trained PINNED dictionary with level-19 frames
    (FSE-described tables exercised).  A frame declaring an unknown
    dictionary id flags instead of decoding against the wrong
    tables (%%13); %%17 truncates mid-block — both ok=false.
    Map-side Arrow, zero shuffles: the storage-side dictionary tier
    that lets dictionary-compressed corpora join ingest without the
    native codec."""
    from ..sources import warc as warcmod

    d, _frames = warcmod.zstd_dict_fixture()
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = warcmod.zstd_dict_decode(
        warcmod.attach_zstd_dict_blob(docs), d, id_col="id"
    )
    return out.select(
        F.col("id").alias("doc_id"), "n_bytes", "text", "ok",
    )


QUERIES["zstd_dict_decode_check"] = zstd_dict_decode_check
ORACLES["zstd_dict_decode_check"] = _zstd_dict_pinned_oracle()


def _hash_case_oracle(rows: dict, bad_expr: str) -> str:
    """Shared pinned-constant oracle body for the image-hash checks:
    ``rows`` maps class → (n_classes, channels, ahash, dhash)."""
    n_cls = len(rows)
    chan = " ".join(
        "WHEN doc_id %% %d = %d THEN %d" % (n_cls, c, v[0])
        for c, v in rows.items()
    )
    ah = " ".join(
        "WHEN doc_id %% %d = %d THEN '%s'" % (n_cls, c, v[1])
        for c, v in rows.items()
    )
    dh = " ".join(
        "WHEN doc_id %% %d = %d THEN '%s'" % (n_cls, c, v[2])
        for c, v in rows.items()
    )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS id,
          CAST(CASE WHEN bad THEN 0 ELSE 16 END AS INTEGER) AS width,
          CAST(CASE WHEN bad THEN 0 ELSE 16 END AS INTEGER) AS height,
          CAST(CASE WHEN bad THEN 0 ELSE (CASE {chan} END)
               END AS INTEGER) AS channels,
          CASE WHEN bad THEN NULL ELSE (CASE {ah} END) END AS ahash,
          CASE WHEN bad THEN NULL ELSE (CASE {dh} END) END AS dhash,
          NOT bad AS ok
        FROM (SELECT doc_id, {bad_expr} AS bad FROM documents)
    """


def _png_i_pinned_oracle() -> str:
    """Adam7 parity oracle: the interlaced fixtures must hash to the
    SEQUENTIAL encoding's constants — PNG is lossless, so any
    divergence is a de-interlace bug."""
    rows = {}
    for cls in range(24):
        px, pal = multimodal._png_fixture_pixels(cls)
        dec = multimodal.png_decode_pixels(multimodal.png_encode(px, pal))
        rows[cls] = (
            dec.shape[2],
            format(multimodal.image_ahash(dec), "016x"),
            format(multimodal.image_dhash(dec), "016x"),
        )
    return _hash_case_oracle(rows, "doc_id % 17 = 0")


def png_interlace_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adam7-interlaced PNG decode (operators/multimodal.py
    ``png_decode_pixels``: seven independently-defiltered passes
    scattered onto their grids) — every interlaced fixture must hash
    IDENTICALLY to its sequential twin because PNG is lossless; the
    oracle pins the sequential constants, so this check can only pass
    if the de-interlace is pixel-exact.  %%17 truncates (ok=false)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_pixel_hashes(multimodal.attach_png_i_blob(docs))


QUERIES["png_interlace_hash_check"] = png_interlace_hash_check
ORACLES["png_interlace_hash_check"] = _png_i_pinned_oracle()


def _bmp_rle_pinned_oracle() -> str:
    rows = {}
    for cls in range(12):
        did = next(
            d for d in (cls, cls + 12, cls + 24)
            if d % 17 and d % 13
        )
        dec = multimodal.bmp_decode_pixels(
            multimodal.build_bmp_rle_blob(did)
        )
        rows[cls] = (
            dec.shape[2],
            format(multimodal.image_ahash(dec), "016x"),
            format(multimodal.image_dhash(dec), "016x"),
        )
    return _hash_case_oracle(rows, "doc_id % 17 = 0 OR doc_id % 13 = 0")


def bmp_rle_pixel_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BI_RLE8 BMP decode (operators/multimodal.py
    ``_bmp_rle8_decode``: encoded runs, absolute mode with word
    alignment, EOL/delta/EOD escapes) through the shared hash grid —
    the run-length tier that closes the round-12 'RLE BMP' stub.
    Fixture rows alternate encoded-run and absolute-mode styles;
    %%17 truncates the stream, %%13 relabels BI_RLE4 (the residual
    honest stub) — both ok=false."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_pixel_hashes(
        multimodal.attach_bmp_rle_blob(docs)
    )


QUERIES["bmp_rle_pixel_hash_check"] = bmp_rle_pixel_hash_check
ORACLES["bmp_rle_pixel_hash_check"] = _bmp_rle_pinned_oracle()


def _bmp_variant_pinned_oracle() -> str:
    rows = {}
    for cls in range(48):
        did = next(
            d for d in (cls, cls + 48, cls + 96)
            if d % 17 and d % 13
        )
        dec = multimodal.bmp_decode_pixels(
            multimodal.build_bmp_variant_blob(did)
        )
        rows[cls] = (
            dec.shape[2],
            format(multimodal.image_ahash(dec), "016x"),
            format(multimodal.image_dhash(dec), "016x"),
        )
    # the 8888 layout is byte-exact, so its hashes must equal the
    # plain 24-bit encoding's — a cross-layout invariance pin
    for pcls in range(12):
        px = multimodal._bmp_fixture_pixels(pcls)
        dec = multimodal.bmp_decode_pixels(multimodal.bmp_encode(px))
        assert rows[pcls + 24][1] == format(
            multimodal.image_ahash(dec), "016x"
        ), pcls
    return _hash_case_oracle(rows, "doc_id % 17 = 0 OR doc_id % 13 = 0")


def bmp_variant_pixel_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BI_RLE4 + BI_BITFIELDS BMP decode (operators/
    multimodal.py ``_bmp_rle4_decode`` — nibble-alternating runs,
    packed absolute mode — and the masked 16/32-bit branch with
    round-half-up channel rescale), closing the round-14 verdict's
    residual BMP stubs.  The 8888 layout must hash identically to the
    plain 24-bit encoding (byte-exact masks — asserted in the oracle
    builder); %%17 truncates, %%13 plants a BI_PNG relabel / a
    non-contiguous green mask — all ok=false."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_pixel_hashes(
        multimodal.attach_bmp_variant_blob(docs)
    )


QUERIES["bmp_variant_pixel_hash_check"] = bmp_variant_pixel_hash_check
ORACLES["bmp_variant_pixel_hash_check"] = _bmp_variant_pinned_oracle()


def exif_meta_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction (operators/multimodal.py
    ``exif_parse`` / ``_tiff_parse``): JPEG APP1 segment walk → TIFF
    IFD parse (II and MM byte orders, inline and offset ASCII
    storage, SHORT/LONG values, the Exif sub-IFD behind pointer
    0x8769) — camera metadata at HEADER speed, no pixel decode.
    Fixture: 4 tag classes × (II / MM) byte orders that must yield
    IDENTICAL rows (endianness transparency — the oracle states tags
    as pure arithmetic, so the two packagings can only both match by
    agreeing); %%17 plants an out-of-range first-IFD offset (torn
    tag block → ok=false, the image itself still decodes)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    meta = multimodal.image_exif_meta(
        multimodal.attach_exif_jpeg_blob(docs)
    )
    return meta.select(
        F.col("id").alias("doc_id"),
        "orientation", "make", "model",
        "datetime", "datetime_original", "ok",
    )


QUERIES["exif_meta_check"] = exif_meta_check
ORACLES["exif_meta_check"] = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
      CAST(CASE WHEN bad THEN NULL
           ELSE 1 + (cls * 2) % 8 END AS INTEGER) AS orientation,
      CASE WHEN bad THEN NULL
           WHEN cls = 0 THEN 'Cam'
           ELSE 'CameraWorks-' || cls END AS make,
      CASE WHEN bad THEN NULL ELSE 'M-' || cls END AS model,
      CASE WHEN bad THEN NULL
           ELSE '2026:01:0' || (cls + 1) || ' 12:00:0' || cls
           END AS datetime,
      CASE WHEN bad THEN NULL
           ELSE '2025:12:0' || (cls + 1) || ' 08:30:00'
           END AS datetime_original,
      NOT bad AS ok
    FROM (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
                 doc_id % 17 = 0 AS bad
          FROM documents)
"""


def exif_oriented_dedup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orientation-tolerant image dedup (``image_oriented_hashes``):
    pixels are normalized by the EXIF orientation tag BEFORE hashing,
    so the same photo exported under all 8 orientation packagings
    (lossless PNG + eXIf fixture) hashes bit-identically and
    collapses to ONE cluster per photo class — the merge
    orientation-blind hashing structurally misses (the un-normalized
    packagings carry 8 distinct hash pairs, pinned in pytest).  Torn
    EXIF (%%17) defaults to orientation 1 per spec, so only its
    packaging-1 docs merge with the clean cluster; other torn
    packagings cluster among themselves (cls, o) — all stated
    arithmetically by the oracle.  Exact-collapse groupBy, partial
    aggregation, no window."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hashes = multimodal.image_oriented_hashes(
        multimodal.attach_exif_png_blob(docs)
    ).filter("ok")
    return hashes.groupBy("ahash", "dhash").agg(
        F.min("id").cast("long").alias("cluster"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    ).select("cluster", "n_members")


def _pdf_text_pinned_oracle() -> str:
    """Pinned (n_pages, n_chars, text_md5) per (class, variant) PDF
    fixture shape, computed driver-side through the same parser.  The
    builder asserts the claims the tier makes: FLATE streams, the
    PDF 1.5 xref-STREAM layout (PNG-predictor rows) and the /ObjStm
    layout all extract byte-identical text to plain streams
    (variants 0 == 1 == 3 == 4 per class), the incremental variant's
    page 0 is the UPDATED content, and the %%17 / %%13 plants route
    to 'torn' / 'encrypted'."""
    import hashlib as _hl

    from ..operators import pdf as pdfmod

    rows = {}
    for cls in range(4):
        texts = {}
        for variant in range(5):
            did = next(
                d for d in range(400)
                if d % 4 == cls and (d // 4) % 5 == variant
                and d % 17 and d % 13
            )
            doc = pdfmod.PdfDoc(pdfmod.build_pdf_blob(did))
            pages = doc.pages()
            text = "\f".join(doc.page_text(p) for p in pages)
            texts[variant] = text
            rows[(cls, variant)] = (
                len(pages), len(text),
                _hl.md5(text.encode()).hexdigest(),
            )
        assert texts[0] == texts[1] == texts[3] == texts[4], cls
        assert texts[2] == "UPDATED " + texts[0], cls  # /Prev chain
    for plant, reason in ((17, "torn"), (13, "encrypted")):
      for variant in range(5):
        did = next(
            d for d in range(0, 100000, plant)
            if (plant == 17 or d % 17) and (d // 4) % 5 == variant
        )
        try:
            doc = pdfmod.PdfDoc(pdfmod.build_pdf_blob(did))
            [doc.page_text(p) for p in doc.pages()]
            raise AssertionError((plant, did))
        except pdfmod._Stub as e:
            assert str(e) == reason, (plant, str(e))
        except pdfmod._Torn:
            assert reason == "torn", plant
    np_case = " ".join(
        "WHEN cls = %d AND var = %d THEN %d" % (c, v, t[0])
        for (c, v), t in rows.items()
    )
    nc_case = " ".join(
        "WHEN cls = %d AND var = %d THEN %d" % (c, v, t[1])
        for (c, v), t in rows.items()
    )
    md_case = " ".join(
        "WHEN cls = %d AND var = %d THEN '%s'" % (c, v, t[2])
        for (c, v), t in rows.items()
    )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CAST(CASE WHEN bad THEN NULL ELSE (CASE {np_case} END)
               END AS INTEGER) AS n_pages,
          CAST(CASE WHEN bad THEN NULL ELSE (CASE {nc_case} END)
               END AS INTEGER) AS n_chars,
          CASE WHEN bad THEN NULL ELSE (CASE {md_case} END)
               END AS text_md5,
          NOT bad AS ok,
          CASE WHEN doc_id % 17 = 0 THEN 'torn'
               WHEN doc_id % 13 = 0 THEN 'encrypted'
               ELSE NULL END AS reason
        FROM (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
                     CAST((doc_id // 4) % 5 AS INTEGER) AS var,
                     doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
              FROM documents)
    """


def pdf_text_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PDF text extraction (operators/pdf.py ``PdfDoc`` →
    ``pdf_text``): COS tokenizer, classic-xref walk with /Prev
    incremental-update chains (the NEWEST object wins), FlateDecode
    streams under a bomb cap, /Pages tree, and the show-text
    operators (Tj / ' / " / TJ with kerning-gap spaces, Td/TD/T*
    newlines) — the document format that carries a large share of
    crawl text, extracted dependency-free.  Fixture: 4 page classes
    × (plain / FLATE — identical text, the transparency claim /
    incremental-update) variants; %%17 torn, %%13 /Encrypt — honest
    reasons, never half a page.  Map-side, no shuffle."""
    from ..operators import pdf as pdfmod

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = pdfmod.pdf_text(pdfmod.attach_pdf_blob(docs))
    return out.select(
        F.col("id").alias("doc_id"),
        "n_pages", "n_chars",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_md5"),
        "ok", "reason",
    )


QUERIES["pdf_text_check"] = pdf_text_check
ORACLES["pdf_text_check"] = _pdf_text_pinned_oracle()


def pdf_token_stats_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: PDF extraction feeding the text-analysis family —
    extracted text through the SAME Catalyst token/char projections
    the documents table uses (``text.token_count``), so a PDF corpus
    drops into every downstream text operator unchanged.  Aggregated
    per (class, variant) shape: the oracle states token totals as
    pure arithmetic over the pinned extraction."""
    from ..operators import pdf as pdfmod

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    extracted = pdfmod.pdf_text(pdfmod.attach_pdf_blob(docs)).filter("ok")
    return (
        extracted.select(
            (F.col("id") % 4).cast("int").alias("cls"),
            ((F.col("id") / F.lit(4)).cast("long") % 5)
            .cast("int").alias("var"),
            text.token_count(F.col("text")).alias("toks"),
            F.col("n_chars"),
        )
        .groupBy("cls", "var")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


QUERIES["pdf_token_stats_check"] = pdf_token_stats_check


def _pdf_token_stats_oracle() -> str:
    """Arithmetic twin of ``pdf_token_stats_check``: per-shape token
    and char counts computed driver-side through the same extraction,
    joined to the documents universe by modular arithmetic."""
    from ..operators import pdf as pdfmod

    vals = []
    for cls in range(4):
        for variant in range(5):
            did = next(
                d for d in range(400)
                if d % 4 == cls and (d // 4) % 5 == variant
                and d % 17 and d % 13
            )
            doc = pdfmod.PdfDoc(pdfmod.build_pdf_blob(did))
            text_s = "\f".join(
                doc.page_text(p) for p in doc.pages()
            )
            toks = len(text_s.split())
            vals.append((cls, variant, toks, len(text_s)))
    rows_sql = ",\n          ".join(
        "(%d, %d, %d, %d)" % v for v in vals
    )
    return f"""
        WITH consts(cls, var, toks, chars) AS (VALUES {rows_sql}),
        base AS (
          SELECT CAST(doc_id % 4 AS INTEGER) AS cls,
                 CAST((doc_id // 4) % 5 AS INTEGER) AS var
          FROM documents
          WHERE doc_id % 17 <> 0 AND doc_id % 13 <> 0)
        SELECT b.cls, b.var, count(*) AS n_docs,
               count(*) * c.toks AS total_tokens,
               count(*) * c.chars AS total_chars
        FROM base b JOIN consts c ON c.cls = b.cls AND c.var = b.var
        GROUP BY b.cls, b.var, c.toks, c.chars
    """


ORACLES["pdf_token_stats_check"] = _pdf_token_stats_oracle()


def _pdf_encrypted_pinned_oracle() -> str:
    """Pinned oracle for the encrypted-PDF tier: the six real
    handlers (through AES-256 R6/R5) must decrypt to text IDENTICAL
    to the PLAINTEXT fixture classes — asserted here by extracting
    both and comparing md5s — the scheme-7 KNOWN-password class
    must flag bare and decrypt identically via the candidate list
    (r18), while the unknown-password scheme, the
    non-Standard-handler swap and the torn cut flag with their
    honest reasons (also asserted over sample ids)."""
    import hashlib as _hl

    from ..operators import pdf as pdfmod

    texts = {}
    for cls in range(4):
        pages = pdfmod._pdf_fixture_pages(cls)
        plain = pdfmod.PdfDoc(pdfmod.pdf_encode(pages))
        want = "\f".join(
            plain.page_text(p) for p in plain.pages()
        )
        texts[cls] = (
            1 + cls, len(want),
            _hl.md5(want.encode("utf-8")).hexdigest(),
        )
        for scheme in range(6):
            did = next(
                d for d in range(cls, 8000, 4)
                if (d // 4) % 8 == scheme and d % 17 and d % 13
            )
            doc = pdfmod.PdfDoc(pdfmod.build_pdf_encrypted_blob(did))
            got = "\f".join(doc.page_text(p) for p in doc.pages())
            assert got == want, (cls, scheme)
        # scheme 7: the KNOWN password class — flags without
        # candidates, decrypts identically with them (r18)
        did7 = next(
            d for d in range(cls, 8000, 4)
            if (d // 4) % 8 == 7 and d % 17 and d % 13
        )
        blob7 = pdfmod.build_pdf_encrypted_blob(did7)
        try:
            pdfmod.PdfDoc(blob7)
            raise AssertionError("pw plant parsed bare: %d" % did7)
        except pdfmod._Stub:
            pass
        doc7 = pdfmod.PdfDoc(
            blob7, (b"wrong-guess", pdfmod._PDF_FIXTURE_PW)
        )
        got7 = "\f".join(doc7.page_text(p) for p in doc7.pages())
        assert got7 == want, cls
    for did in (17, 34, 51):
        try:
            pdfmod.PdfDoc(pdfmod.build_pdf_encrypted_blob(did))
            raise AssertionError("torn plant parsed: %d" % did)
        except pdfmod._Torn:
            pass
        except pdfmod._Stub:
            pass  # a cut landing in the Encrypt dict flags too
    # %13 custom-handler swaps + scheme-6 wrong pw (both parities)
    wrongpw = [
        next(d for d in range(cls, 8000, 4)
             if (d // 4) % 8 == 6 and d % 17 and d % 13)
        for cls in (0, 1)
    ]
    for did in [13, 26] + wrongpw:
        try:
            pdfmod.PdfDoc(
                pdfmod.build_pdf_encrypted_blob(did),
                (b"wrong-guess", pdfmod._PDF_FIXTURE_PW),
            )
            raise AssertionError("encrypted plant parsed: %d" % did)
        except pdfmod._Stub as e:
            assert str(e) == "encrypted", did
    np_c = " ".join(
        "WHEN cls = %d THEN %d" % (c, v[0]) for c, v in texts.items()
    )
    nc_c = " ".join(
        "WHEN cls = %d THEN %d" % (c, v[1]) for c, v in texts.items()
    )
    md_c = " ".join(
        "WHEN cls = %d THEN '%s'" % (c, v[2]) for c, v in texts.items()
    )
    return f"""
        WITH base AS (
          SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
                 CAST((doc_id // 4) % 8 AS INTEGER) AS scheme,
                 doc_id % 17 = 0 AS torn,
                 doc_id % 17 <> 0 AND doc_id % 13 = 0 AS shell
          FROM documents)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CASE WHEN torn OR shell OR scheme = 6 THEN NULL
               ELSE CAST(CASE {np_c} END AS INTEGER) END AS n_pages,
          CASE WHEN torn OR shell OR scheme = 6 THEN NULL
               ELSE CAST(CASE {nc_c} END AS INTEGER) END AS n_chars,
          CASE WHEN torn OR shell OR scheme = 6 THEN NULL
               ELSE CASE {md_c} END END AS text_md5,
          NOT (torn OR shell OR scheme = 6) AS ok,
          CASE WHEN torn THEN 'torn'
               WHEN shell OR scheme = 6 THEN 'encrypted'
               ELSE NULL END AS reason
        FROM base
    """


def pdf_encrypted_text_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypted-PDF standard security handler (operators/pdf.py
    ``PdfDoc._setup_crypt`` + the stdlib-only RC4/AES-128 ciphers,
    FIPS-197 KAT-pinned in pytest): the EMPTY-user-password fast
    path — the common crawl case where encryption only restricts
    printing — derives the file key (Algorithm 2 for /V 1-4;
    Algorithm 2.A/2.B with /UE //OE unwrap and the /Perms receipt
    for /V 5 AES-256 R5/R6), verifies /U (owner fallback via /O),
    and decrypts streams (per-object keys for RC4/AESV2, the file
    key directly for AESV3).  Since r18 a candidate-password list
    threads through ``pdf_text`` → ``PdfDoc`` (Algorithm 2.A with
    the UTF-8 password for /V5, Algorithm 4/5 for /V 1-4): the
    scheme-7 class carries a KNOWN non-ASCII password and must
    decrypt to text identical to the plaintext class, tried after
    one wrong guess.  Decrypted text is pinned IDENTICAL to the
    plaintext fixture classes (asserted in the oracle builder); an
    unknown password, a non-Standard handler and torn documents
    flag with honest reasons."""
    from ..operators import pdf as pdfmod

    # the pure-Python parse/cipher work dominates and the small-SF
    # parquet is a single row group: spread the id column first (the
    # r15 adpcm pattern — one cheap long-column shuffle)
    # r19 opt: the former id-spread repartition (the r15 adpcm
    # pattern) is removed — the per-task decode memo collapsed the
    # per-row Python cost to a cache probe, so the extra exchange and
    # 32-way task fan-out now cost more than they buy (guide §2.4:
    # remove shuffles outright); a real corpus scan arrives with its
    # own parallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = pdfmod.pdf_text(
        pdfmod.attach_pdf_encrypted_blob(docs),
        passwords=(b"wrong-guess", pdfmod._PDF_FIXTURE_PW),
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_pages", "n_chars",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_md5"),
        "ok", "reason",
    )


QUERIES["pdf_encrypted_text_check"] = pdf_encrypted_text_check
ORACLES["pdf_encrypted_text_check"] = _pdf_encrypted_pinned_oracle()


def _pdf_cid_pinned_oracle() -> str:
    """Pinned oracle for the composite-font tier: both CMap variants
    must extract the SAME multilingual text (asserted here), torn
    cuts flag 'torn', dropped /ToUnicode flags 'font'."""
    import hashlib as _hl

    from ..operators import pdf as pdfmod

    texts = {}
    for cls in range(4):
        got = {}
        for var in range(2):
            did = next(
                d for d in range(cls + 4 * var, 4000, 8)
                if d % 17 and d % 13
            )
            doc = pdfmod.PdfDoc(pdfmod.build_pdf_cid_blob(did))
            got[var] = "\f".join(
                doc.page_text(p) for p in doc.pages()
            )
        assert got[0] == got[1], cls  # bfchar ≡ bfrange
        assert pdfmod._PDF_CID_TEXTS[cls].split("\n")[0] in got[0]
        texts[cls] = (
            2, len(got[0]),
            _hl.md5(got[0].encode("utf-8")).hexdigest(),
        )
    for did in (13, 26, 39):
        doc = pdfmod.PdfDoc(pdfmod.build_pdf_cid_blob(did))
        try:
            [doc.page_text(p) for p in doc.pages()]
            raise AssertionError("soup emitted: %d" % did)
        except pdfmod._Stub as e:
            assert str(e) == "font", did
    np_c = " ".join(
        "WHEN cls = %d THEN %d" % (c, v[0]) for c, v in texts.items()
    )
    nc_c = " ".join(
        "WHEN cls = %d THEN %d" % (c, v[1]) for c, v in texts.items()
    )
    md_c = " ".join(
        "WHEN cls = %d THEN '%s'" % (c, v[2]) for c, v in texts.items()
    )
    return f"""
        WITH base AS (
          SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
                 doc_id % 17 = 0 AS torn,
                 doc_id % 17 <> 0 AND doc_id % 13 = 0 AS nofont
          FROM documents)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CASE WHEN torn OR nofont THEN NULL
               ELSE CAST(CASE {np_c} END AS INTEGER) END AS n_pages,
          CASE WHEN torn OR nofont THEN NULL
               ELSE CAST(CASE {nc_c} END AS INTEGER) END AS n_chars,
          CASE WHEN torn OR nofont THEN NULL
               ELSE CASE {md_c} END END AS text_md5,
          NOT (torn OR nofont) AS ok,
          CASE WHEN torn THEN 'torn'
               WHEN nofont THEN 'font'
               ELSE NULL END AS reason
        FROM base
    """


def pdf_cid_text_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-font PDF text (operators/pdf.py ``_parse_tounicode``
    → ``_PdfFont`` → the ``Tf``-tracking ``extract_text_ops``):
    /Type0 Identity-H fonts with 2-byte codes decode through their
    /ToUnicode CMap (bfchar AND incremented-bfrange forms, pinned
    identical) — the tier that reaches the non-latin-1 crawl text
    the simple-font assumption cannot (Greek/Cyrillic/CJK classes).
    A Type0 font WITHOUT a usable CMap flags 'font' — refusing beats
    emitting code-point soup into dedup; %%17 cuts flag 'torn'."""
    from ..operators import pdf as pdfmod

    # the pure-Python parse/cipher work dominates and the small-SF
    # parquet is a single row group: spread the id column first (the
    # r15 adpcm pattern — one cheap long-column shuffle).  r19 opt:
    # the 180 KB composite-font blobs are built AND extracted in one
    # task (pdf_text_from_ids) — identical rows to
    # pdf_text(attach_pdf_cid_blob(docs)), but ~1 GB of blob bytes no
    # longer crosses the Arrow boundary twice (guide §8)
    # r19 opt: the former id-spread repartition (the r15 adpcm
    # pattern) is removed — the per-task decode memo collapsed the
    # per-row Python cost to a cache probe, so the extra exchange and
    # 32-way task fan-out now cost more than they buy (guide §2.4:
    # remove shuffles outright); a real corpus scan arrives with its
    # own parallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = pdfmod.pdf_text_from_ids(docs, pdfmod.build_pdf_cid_blob)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_pages", "n_chars",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_md5"),
        "ok", "reason",
    )


QUERIES["pdf_cid_text_check"] = pdf_cid_text_check
ORACLES["pdf_cid_text_check"] = _pdf_cid_pinned_oracle()


def pdf_image_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF embedded-image extraction (operators/pdf.py
    ``PdfDoc.page_images`` → ``image_pixels`` → ``pdf_image_hashes``):
    image XObjects decode through the EXISTING decoders — /DCTDecode
    via the JPEG tier, Flate/raw 8-bpc DeviceRGB/DeviceGray samples
    (PNG Up-predictor DecodeParms honored), /CCITTFaxDecode /K
    -1 Group 4 and /K >= 0 Group 3 via functions/ccitt.py (the full
    fax family; /BlackIs1, /Decode, /EndOfLine and /EncodedByteAlign
    honored), and since r18 /JBIG2Decode via functions/jbig2.py
    (MQ-coded generic regions templates 0-2 + TPGDON, MMR coding,
    /JBIG2Globals-carried page info, AND the arithmetic symbol-
    dictionary + text-region tier real scanned documents use; the
    MQ coder is pinned against the T.88 Annex H.2 KAT; since r19
    also the SDHUFF/SBHUFF Huffman spelling via
    functions/jbig2_huff.py — standard tables B.1–B.5, custom
    type-53 tables, MMR height-class collective bitmaps) — and
    hash on the shared aHash/dHash grid, so PDFs join cross-format
    image dedup.  The oracle builder asserts the invariants: the
    three lossless packagings (flate / flate+predictor / raw) hash
    identically to the raw pixels, the DCT packaging hashes to the
    standalone JPEG's constants, and the eleven bilevel spellings
    (four fax + seven JBIG2, including both symbol/text quadrant
    splits) decode to the same thresholded plane.
    %%17 cuts 20 bytes from the image stream (xref shifts → torn
    document); %%13 relabels /JPXDecode at identical byte length or
    drops bpc to 4 (the per-image honest stub) — both ok=false."""
    from ..operators import pdf as pdfmod

    # r19 opt: the former id-spread repartition (the r15 adpcm
    # pattern) is removed — the per-task decode memo collapsed the
    # per-row Python cost to a cache probe, so the extra exchange and
    # 32-way task fan-out now cost more than they buy (guide §2.4:
    # remove shuffles outright); a real corpus scan arrives with its
    # own parallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = pdfmod.pdf_image_hashes(pdfmod.attach_pdf_image_blob(docs))
    return out.select(
        F.col("id").alias("doc_id"),
        "page", "img_idx", "width", "height", "channels",
        "ahash", "dhash", "ok",
    )


def _pdf_image_pinned_oracle() -> str:
    """Pinned-constant oracle for ``pdf_image_hash_check`` over the
    96 (pixel class × packaging) combos, decoded driver-side through
    the REAL extraction path; cross-format invariants asserted here
    so a drifting decoder fails the build, not just the driver."""
    from ..operators import pdf as pdfmod

    import numpy as _np

    rows = {}
    for combo in range(96):
        did = next(
            d for d in range(combo, 8000, 96) if d % 17 and d % 13
        )
        doc = pdfmod.PdfDoc(pdfmod.build_pdf_image_blob(did))
        (_name, obj), = doc.page_images(doc.pages()[0])
        px = doc.image_pixels(obj)
        rows[combo] = (
            px.shape[2],
            format(multimodal.image_ahash(px), "016x"),
            format(multimodal.image_dhash(px), "016x"),
        )
    for cls in range(6):
        raw_px = pdfmod._pdf_image_fixture_pixels(cls)
        want = format(multimodal.image_ahash(raw_px), "016x")
        # variants 1 (flate), 2 (flate-pred), 4 (raw) are lossless
        for var in (1, 2, 4):
            assert rows[cls + 6 * var][1] == want, (cls, var)
        sj = multimodal.jpeg_decode_pixels(
            multimodal.jpeg_encode(raw_px)
        )
        assert rows[cls][1] == format(
            multimodal.image_ahash(sj), "016x"
        ), cls
        # both CCITT packagings (default vs /BlackIs1 + /Decode
        # [1 0] + byte-align) decode to the SAME thresholded plane
        luma = (
            (
                raw_px[:, :, 0].astype(_np.int64) * 299
                + raw_px[:, :, 1].astype(_np.int64) * 587
                + raw_px[:, :, 2].astype(_np.int64) * 114
            ) // 1000
        ).astype(_np.uint8)
        bl = _np.where(luma >= 128, 255, 0).astype(
            _np.uint8
        )[:, :, None]
        want_cc = format(multimodal.image_ahash(bl), "016x")
        assert rows[cls + 6 * 5][1] == want_cc, cls
        # b1 / G3 1-D / G3 mixed / the seven JBIG2 codings
        # (MQ+TPGDON, template 2, MMR, globals-carried page info,
        # template 1, arithmetic symbol/text, r19 Huffman
        # symbol/text): identical
        for var in (6, 7, 8, 9, 10, 11, 12, 13, 14, 15):
            assert rows[cls + 6 * var] == rows[cls + 6 * 5], (
                cls, var,
            )
    chan = " ".join(
        "WHEN doc_id %% 96 = %d THEN %d" % (c, v[0])
        for c, v in rows.items()
    )
    ah = " ".join(
        "WHEN doc_id %% 96 = %d THEN '%s'" % (c, v[1])
        for c, v in rows.items()
    )
    dh = " ".join(
        "WHEN doc_id %% 96 = %d THEN '%s'" % (c, v[2])
        for c, v in rows.items()
    )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CAST(0 AS INTEGER) AS page,
          CAST(0 AS INTEGER) AS img_idx,
          CAST(CASE WHEN bad THEN 0 ELSE 16 END AS INTEGER) AS width,
          CAST(CASE WHEN bad THEN 0 ELSE 16 END AS INTEGER) AS height,
          CAST(CASE WHEN bad THEN 0 ELSE (CASE {chan} END)
               END AS INTEGER) AS channels,
          CASE WHEN bad THEN NULL ELSE (CASE {ah} END) END AS ahash,
          CASE WHEN bad THEN NULL ELSE (CASE {dh} END) END AS dhash,
          NOT bad AS ok
        FROM (SELECT doc_id,
                     doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
              FROM documents)
    """


QUERIES["pdf_image_hash_check"] = pdf_image_hash_check
ORACLES["pdf_image_hash_check"] = _pdf_image_pinned_oracle()


def _tiff_pinned_oracle() -> str:
    """Pinned-constant oracle for the TIFF pixel tier over the 108
    (pixel class × packaging) combos; packagings 0-9 are lossless,
    so all ten must pin the SAME hashes per class (palette re-emits
    gray planes as equal-channel RGB — identical luma hashes, 3
    channels), packagings 10-11 (JPEG-in-TIFF, complete vs
    JPEGTables-abbreviated) must pin the standalone JPEG constants —
    and the four RGB classes reuse the PDF-image gradients, so their
    hashes must equal that tier's raw-pixel constants (asserted
    here: the cross-format dedup contract extends to TIFF)."""
    import numpy as _np

    from ..operators import pdf as pdfmod

    rows = {}
    for combo in range(108):
        did = next(
            d for d in range(combo, 8000, 108) if d % 17 and d % 13
        )
        px = multimodal.tiff_decode_pixels(
            multimodal.build_tiff_blob(did)
        )
        rows[combo] = (
            px.shape[2],
            format(multimodal.image_ahash(px), "016x"),
            format(multimodal.image_dhash(px), "016x"),
        )
    for cls in range(6):
        for var in range(1, 10):
            assert rows[cls + 6 * var][1:] == rows[cls][1:], (
                cls, var,
            )
            if var != 9:
                assert rows[cls + 6 * var][0] == rows[cls][0]
        # both JPEG spellings agree with each other and with the
        # standalone JPEG decode of the same pixels
        sj = multimodal.jpeg_decode_pixels(
            multimodal.jpeg_encode(multimodal._tiff_fixture_pixels(cls))
        )
        want_j = format(multimodal.image_ahash(sj), "016x")
        assert rows[cls + 6 * 10][1] == want_j, cls
        assert rows[cls + 6 * 11] == rows[cls + 6 * 10], cls
        # both G4 spellings (strips / tiles) pin the thresholded
        # bilevel plane
        px6 = multimodal._tiff_fixture_pixels(cls)
        if px6.shape[2] == 3:
            px6 = (
                (
                    px6[:, :, 0].astype(_np.int64) * 299
                    + px6[:, :, 1].astype(_np.int64) * 587
                    + px6[:, :, 2].astype(_np.int64) * 114
                ) // 1000
            ).astype(_np.uint8)[:, :, None]
        bl6 = _np.where(px6 >= 128, 255, 0).astype(_np.uint8)
        want_g = format(multimodal.image_ahash(bl6), "016x")
        assert rows[cls + 6 * 12][1] == want_g, cls
        for var in (13, 14, 15, 16, 17):  # tiles/MH/G3-2D/unc ===
            assert rows[cls + 6 * var] == rows[cls + 6 * 12], (
                cls, var,
            )
    for cls in range(4):
        want = format(multimodal.image_ahash(
            pdfmod._pdf_image_fixture_pixels(cls)
        ), "016x")
        assert rows[cls][1] == want, cls
    return _hash_case_oracle(
        {c: rows[c % 108] for c in range(108)},
        "doc_id % 17 = 0 OR doc_id % 13 = 0",
    )


def tiff_pixel_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF pixel decode (operators/multimodal.py
    ``tiff_decode_pixels`` behind ``decode_image_pixels``): strip
    AND tile organization in both byte orders, chunky AND planar,
    Compression 1/5/8/32773 plus new-style JPEG-in-TIFF (7, with
    JPEGTables-abbreviated streams spliced) — the TIFF-LZW core has
    the spec's EARLY code-width change with the encoder/decoder
    off-by-one handled by keying both width schedules to the
    emitted-code count — horizontal Predictor 2, WhiteIsZero
    inversion, PackBits runs, Photometric-3 palettes (16-bit
    ColorMap, 8/4-bit indices), and the CCITT fax family through
    functions/ccitt.py — Group 4 strips AND tiles, Compression-2
    1-D MH, Compression-3 mixed 2-D (T4Options honored, fill
    tolerated).  All ten lossless packagings
    of a class hash identically, the two JPEG spellings pin the
    standalone JPEG constants, the two G4 spellings pin the
    thresholded bilevel plane, and the RGB classes match the
    PDF-image tier's constants (cross-format dedup).  Old-style
    JPEG stays an honest stub; %%17 truncates mid-unit, %%13
    relabels Compression 6 — both ok=false."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_pixel_hashes(
        multimodal.attach_tiff_blob(docs)
    )


QUERIES["tiff_pixel_hash_check"] = tiff_pixel_hash_check
ORACLES["tiff_pixel_hash_check"] = _tiff_pinned_oracle()


def _ico_pinned_oracle() -> str:
    """Pinned oracle for the ICO tier: all three packagings of a
    class (32-bpp DIB / PNG-in-ICO / two-entry with the class image
    largest) decode the SAME pixels — hashes keyed on class alone,
    asserted equal to the PDF-image tier's raw-pixel constants."""
    from ..operators import pdf as pdfmod

    rows = {}
    for cls in range(6):
        for var in range(3):
            did = next(
                d for d in range(cls + 6 * var, 4000, 18)
                if d % 17 and d % 13
            )
            px = multimodal.ico_decode_pixels(
                multimodal.build_ico_blob(did)
            )
            want = format(multimodal.image_ahash(
                pdfmod._pdf_image_fixture_pixels(cls)
            ), "016x")
            got = format(multimodal.image_ahash(px), "016x")
            assert got == want, (cls, var)
            rows[cls] = (
                px.shape[2],
                got,
                format(multimodal.image_dhash(px), "016x"),
            )
    return _hash_case_oracle(
        rows, "doc_id % 17 = 0 OR doc_id % 13 = 0"
    )


def ico_pixel_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO/CUR favicon decode (operators/multimodal.py
    ``ico_decode_pixels`` behind ``decode_image_pixels``): directory
    walk picks the LARGEST entry; PNG-in-ICO delegates to the PNG
    tier, classic doubled-height DIBs decode 32-bpp BGRA and 8-bpp
    palette forms — all packagings hash to the class constants (which
    equal the PDF-image tier's: favicons join cross-format dedup).
    Other DIB depths/compressions are honest stubs; directory lies
    and truncations flag.  %%17 truncates, %%13 relabels 16-bpp /
    flips an IDAT byte — ok=false."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_pixel_hashes(
        multimodal.attach_ico_blob(docs)
    )


QUERIES["ico_pixel_hash_check"] = ico_pixel_hash_check
ORACLES["ico_pixel_hash_check"] = _ico_pinned_oracle()


QUERIES["exif_oriented_dedup_check"] = exif_oriented_dedup_check
ORACLES["exif_oriented_dedup_check"] = """
    WITH m AS (
      SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
             1 + CAST((doc_id // 4) % 8 AS INTEGER) AS o,
             doc_id % 17 = 0 AS torn
      FROM documents)
    SELECT CAST(min(doc_id) AS BIGINT) AS cluster,
           count(*) AS n_members
    FROM m
    GROUP BY cls, CASE WHEN torn AND o > 1 THEN o ELSE 0 END
"""


def _wav_codec_pinned_oracle() -> str:
    """Pinned feature tuples per (format, waveform) fixture class,
    computed driver-side through the same decode — the audio-codec
    analogue of the image pinned oracles."""
    rows = {}
    for fmt_cls in range(4):
        for wave_cls in range(4):
            did = next(
                d for d in (fmt_cls + 4 * wave_cls,
                            fmt_cls + 4 * wave_cls + 16,
                            fmt_cls + 4 * wave_cls + 32,
                            fmt_cls + 4 * wave_cls + 48)
                if d % 17 and d % 13
                and d % 4 == fmt_cls and (d // 4) % 4 == wave_cls
            )
            rate, ch, arr = multimodal.wav_decode_samples(
                multimodal.build_wav_codec_blob(did)
            )
            n, peak, abs_sum, zc = multimodal.audio_pcm_metrics(arr)
            rows[(fmt_cls, wave_cls)] = (
                rate, ch, n, n * 1000 // rate, peak, abs_sum, zc
            )
    cases = {}
    for col_i, col in enumerate(
        ("sample_rate", "n_channels", "n_frames", "duration_ms",
         "peak", "abs_sum", "zero_crossings")
    ):
        cases[col] = " ".join(
            "WHEN fc = %d AND wc = %d THEN %d" % (f, w, v[col_i])
            for (f, w), v in rows.items()
        )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS id,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["sample_rate"]} END) END AS INTEGER)
            AS sample_rate,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["n_channels"]} END) END AS INTEGER)
            AS n_channels,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["n_frames"]} END) END AS BIGINT) AS n_frames,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["duration_ms"]} END) END AS BIGINT)
            AS duration_ms,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["peak"]} END) END AS INTEGER) AS peak,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["abs_sum"]} END) END AS BIGINT) AS abs_sum,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["zero_crossings"]} END) END AS BIGINT)
            AS zero_crossings,
          NOT bad AS ok
        FROM (SELECT doc_id,
                     CAST(doc_id % 4 AS INTEGER) AS fc,
                     CAST((doc_id // 4) % 4 AS INTEGER) AS wc,
                     doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
              FROM documents)
    """


def audio_codec_feature_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec-tier WAV decode (operators/multimodal.py
    ``wav_decode_samples``): IEEE float32 scaled onto the int16 grid
    and the two G.711 telephony companders — A-law and µ-law 256-entry
    table expansion validated against independent reference
    compressors in pytest — through the shared integer feature
    extractor.  %%17 truncates (ok=false); %%13 relabels ADPCM (the
    residual honest stub → ok=false)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.audio_pcm_features(
        multimodal.attach_wav_codec_blob(docs)
    )


QUERIES["audio_codec_feature_check"] = audio_codec_feature_check
ORACLES["audio_codec_feature_check"] = _wav_codec_pinned_oracle()


def _adpcm_pinned_oracle() -> str:
    """Pinned feature tuples per (wave, layout) IMA-ADPCM fixture
    shape, computed driver-side through the same decode.  The builder
    additionally asserts the LOSSY-CODEC invariance the tier claims:
    the decoded mono stream's 1024-frame envelope hashes equal the
    PCM SOURCE's window for window (IMA quantization error ≪ the
    envelope margins on this wave family), for both the 256- and the
    512-byte re-blocked layout — and that the torn (%17) and
    corrupt-step-index (%13) plants decode to None for every
    variant."""
    rows = {}
    for cls in range(4):
        src_rate, _c, src = multimodal.wav_decode_samples(
            multimodal.build_wav_align_blob(96 + cls)
        )
        for variant in range(3):
            did = next(
                d for d in range(200)
                if d % 4 == cls and (d // 4) % 3 == variant
                and d % 17 and d % 13
            )
            dec = multimodal.wav_decode_samples(
                multimodal.build_adpcm_blob(did)
            )
            assert dec is not None, (cls, variant)
            rate, ch, arr = dec
            n, peak, abs_sum, zc = multimodal.audio_pcm_metrics(arr)
            rows[(cls, variant)] = (
                rate, ch, n, n * 1000 // rate, peak, abs_sum, zc
            )
            if variant != 1:
                for k in range(arr.shape[0] // 1024):
                    a = multimodal.audio_envelope_hash(
                        arr[k * 1024:(k + 1) * 1024]
                    )
                    b = multimodal.audio_envelope_hash(
                        src[k * 1024:(k + 1) * 1024]
                    )
                    assert a == b, (cls, variant, k)
    for plant in (17, 13):
        for variant in range(3):
            did = next(
                d for d in range(0, 100000, plant)
                if (d // 4) % 3 == variant
                and (plant == 17 or d % 17)
            )
            assert multimodal.wav_decode_samples(
                multimodal.build_adpcm_blob(did)
            ) is None, (plant, did)
    cases = {}
    for col_i, col in enumerate(
        ("sample_rate", "n_channels", "n_frames", "duration_ms",
         "peak", "abs_sum", "zero_crossings")
    ):
        cases[col] = " ".join(
            "WHEN cls = %d AND var = %d THEN %d" % (c, v, t[col_i])
            for (c, v), t in rows.items()
        )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS id,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["sample_rate"]} END) END AS INTEGER)
            AS sample_rate,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["n_channels"]} END) END AS INTEGER)
            AS n_channels,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["n_frames"]} END) END AS BIGINT) AS n_frames,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["duration_ms"]} END) END AS BIGINT)
            AS duration_ms,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["peak"]} END) END AS INTEGER) AS peak,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["abs_sum"]} END) END AS BIGINT) AS abs_sum,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["zero_crossings"]} END) END AS BIGINT)
            AS zero_crossings,
          NOT bad AS ok
        FROM (SELECT doc_id,
                     CAST(doc_id % 4 AS INTEGER) AS cls,
                     CAST((doc_id // 4) % 3 AS INTEGER) AS var,
                     doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
              FROM documents)
    """


def adpcm_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL IMA/DVI ADPCM decode (operators/multimodal.py
    ``_ima_adpcm_decode`` behind ``wav_decode_samples`` fmt 0x11):
    per-channel block headers, interleaved 4-byte nibble groups, the
    reference step/index tables — vectorized across blocks×channels
    so cost scales with samples-per-block, validated against an
    independent scalar re-implementation in pytest.  Closes the
    former ADPCM honest stub (MS-ADPCM fmt 2 remains one).  Fixture:
    4 envelope waves × (mono-256 / STEREO-256 / mono re-blocked 512)
    layouts; %%17 tears the trailing block, %%13 corrupts a step
    index past 88 — both refuse (ok=false), never silently-wrong
    samples.  Map-side, no shuffle."""
    # the decode dominates and the small-SF parquet is a single row
    # group (one scan partition → sequential decode): spread the rows
    # first — one cheap long-column shuffle, the standard move when a
    # map-heavy stage follows a narrow scan
    # r19 opt: the former id-spread repartition (the r15 adpcm
    # pattern) is removed — the per-task decode memo collapsed the
    # per-row Python cost to a cache probe, so the extra exchange and
    # 32-way task fan-out now cost more than they buy (guide §2.4:
    # remove shuffles outright); a real corpus scan arrives with its
    # own parallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.audio_pcm_features(
        multimodal.attach_adpcm_blob(docs)
    )


QUERIES["adpcm_decode_check"] = adpcm_decode_check
ORACLES["adpcm_decode_check"] = _adpcm_pinned_oracle()


def _ms_adpcm_pinned_oracle() -> str:
    """Pinned feature tuples per (wave, layout) MS-ADPCM fixture
    shape, computed driver-side through the same decode; the builder
    asserts the decoded mono envelope equals the PCM source's window
    for window (both block layouts) and that the torn (%17) and
    bad-predictor (%13) plants refuse for every variant."""
    rows = {}
    for cls in range(4):
        src_rate, _c, src = multimodal.wav_decode_samples(
            multimodal.build_wav_align_blob(96 + cls)
        )
        for variant in range(3):
            did = next(
                d for d in range(200)
                if d % 4 == cls and (d // 4) % 3 == variant
                and d % 17 and d % 13
            )
            dec = multimodal.wav_decode_samples(
                multimodal.build_ms_adpcm_blob(did)
            )
            assert dec is not None, (cls, variant)
            rate, ch, arr = dec
            n, peak, abs_sum, zc = multimodal.audio_pcm_metrics(arr)
            rows[(cls, variant)] = (
                rate, ch, n, n * 1000 // rate, peak, abs_sum, zc
            )
            if variant != 1:
                for k in range(arr.shape[0] // 1024):
                    assert multimodal.audio_envelope_hash(
                        arr[k * 1024:(k + 1) * 1024]
                    ) == multimodal.audio_envelope_hash(
                        src[k * 1024:(k + 1) * 1024]
                    ), (cls, variant, k)
    for plant in (17, 13):
        for variant in range(3):
            did = next(
                d for d in range(0, 100000, plant)
                if (d // 4) % 3 == variant
                and (plant == 17 or d % 17)
            )
            assert multimodal.wav_decode_samples(
                multimodal.build_ms_adpcm_blob(did)
            ) is None, (plant, did)
    cases = {}
    for col_i, col in enumerate(
        ("sample_rate", "n_channels", "n_frames", "duration_ms",
         "peak", "abs_sum", "zero_crossings")
    ):
        cases[col] = " ".join(
            "WHEN cls = %d AND var = %d THEN %d" % (c, v, t[col_i])
            for (c, v), t in rows.items()
        )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS id,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["sample_rate"]} END) END AS INTEGER)
            AS sample_rate,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["n_channels"]} END) END AS INTEGER)
            AS n_channels,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["n_frames"]} END) END AS BIGINT) AS n_frames,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["duration_ms"]} END) END AS BIGINT)
            AS duration_ms,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["peak"]} END) END AS INTEGER) AS peak,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["abs_sum"]} END) END AS BIGINT) AS abs_sum,
          CAST(CASE WHEN bad THEN 0 ELSE
            (CASE {cases["zero_crossings"]} END) END AS BIGINT)
            AS zero_crossings,
          NOT bad AS ok
        FROM (SELECT doc_id,
                     CAST(doc_id % 4 AS INTEGER) AS cls,
                     CAST((doc_id // 4) % 3 AS INTEGER) AS var,
                     doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
              FROM documents)
    """


def ms_adpcm_decode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MS ADPCM decode (operators/multimodal.py
    ``_ms_adpcm_decode`` behind ``wav_decode_samples`` fmt 2 at 4
    bits): per-channel predictor/delta/sample block preambles, the 7
    standard coefficient pairs (fixtures exercise ALL of them across
    classes and variants), high-first nibbles, the 16-entry delta
    adaptation table — vectorized across blocks×channels, pinned
    against an independent scalar re-implementation in pytest.
    Closes the last WAV-audio stub (fmt-2 claims at non-4-bit depths
    remain the invalid-combination flag).  Fixture: 4 envelope waves
    × (mono-256 / STEREO-256 / mono re-blocked 512) layouts; %%17
    torn trailing block, %%13 predictor index 9 > 6 — both refuse,
    never silently-wrong samples.  Map-side + the one spreading
    shuffle (single-row-group scan)."""
    # r19 opt: the former id-spread repartition (the r15 adpcm
    # pattern) is removed — the per-task decode memo collapsed the
    # per-row Python cost to a cache probe, so the extra exchange and
    # 32-way task fan-out now cost more than they buy (guide §2.4:
    # remove shuffles outright); a real corpus scan arrives with its
    # own parallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.audio_pcm_features(
        multimodal.attach_ms_adpcm_blob(docs)
    )


QUERIES["ms_adpcm_decode_check"] = ms_adpcm_decode_check
ORACLES["ms_adpcm_decode_check"] = _ms_adpcm_pinned_oracle()


def id3_meta_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3v2 tag extraction (operators/multimodal.py
    ``id3v2_frames`` → ``audio_id3_meta``): the audio face of the
    EXIF tier — v2.3 plain / v2.4 syncsafe frame sizes, latin-1 /
    UTF-16-BOM / UTF-8 text encodings, extended-header skip, title/
    artist/album/year/track frames — metadata at header speed, frame
    data untouched.  Fixture: 4 tag classes × (v2.3-latin1 /
    v2.4-utf8 / v2.3-utf16) packagings that must parse IDENTICALLY
    (the oracle states tags as pure arithmetic, so all three
    packagings can only match by agreeing — incl. a non-ASCII
    artist); %%17 shrinks the tag under its declared size (a frame
    runs past the tag → ok=false, never a half-read tag)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    meta = multimodal.audio_id3_meta(
        multimodal.attach_id3_mp3_blob(docs)
    )
    return meta.select(
        F.col("id").alias("doc_id"),
        "title", "artist", "album", "year", "track", "ok",
    )


def docx_text_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX text extraction (operators/text.py ``docx_extract`` →
    ``docx_text``): office documents ride the ZIP SOURCE — central-
    directory walk with per-member CRC, then WordprocessingML runs
    (paragraphs → newlines, mid-word split runs concatenated
    invisibly, ``<w:tab/>`` → tab, XML entities decoded).  The oracle
    RECONSTRUCTS the full text arithmetically, so extraction must be
    the identity character-for-character.  Fixture: 4 paragraph
    classes × (plain / split-run) variants — identical text; %%17
    flips one byte inside ``word/document.xml`` (the member CRC
    catches it), %%13 drops the part — both ok=false."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = text.docx_text(text.attach_docx_blob(docs))
    return out.select(
        F.col("id").alias("doc_id"),
        "n_paragraphs", "n_chars", "text", "ok",
    )


QUERIES["docx_text_check"] = docx_text_check
ORACLES["docx_text_check"] = """
    WITH base AS (
      SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
             doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
      FROM documents),
    paras AS (
      SELECT doc_id, cls,
             CAST(unnest(generate_series(0, cls + 1)) AS INTEGER) AS k
      FROM base WHERE NOT bad),
    texts AS (
      SELECT doc_id, cls,
             string_agg(
               'class ' || cls || ' paragraph ' || k
                 || ' with some words'
                 || CASE WHEN k = 0
                    THEN chr(9) || 'after a tab & specials < >'
                    ELSE '' END,
               chr(10) ORDER BY k) AS text
      FROM paras GROUP BY doc_id, cls)
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(t.cls + 2 AS INTEGER) AS n_paragraphs,
           CAST(length(t.text) AS INTEGER) AS n_chars,
           t.text, TRUE AS ok
    FROM texts t
    UNION ALL
    SELECT CAST(doc_id AS BIGINT), NULL, NULL, NULL, FALSE
    FROM base WHERE bad
"""


def xlsx_text_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLSX text extraction (operators/text.py ``xlsx_extract`` →
    ``xlsx_text``): SpreadsheetML over the ZIP SOURCE — workbook-
    declared sheet count enforced, shared-string resolution (deduped
    indices), inlineStr runs, numeric ``<v>`` tokens, entities.  The
    oracle reconstructs every cell arithmetically, so extraction must
    be the identity character-for-character across BOTH encodings
    (shared vs inlineStr variants produce identical text).  %%17
    flips a byte inside sheet1 (member CRC catches it), %%13 renames
    sheet1 (declared-count mismatch) — both ok=false."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = text.xlsx_text(text.attach_xlsx_blob(docs))
    return out.select(
        F.col("id").alias("doc_id"),
        "n_sheets", "n_cells", "n_chars", "text", "ok",
    )


QUERIES["xlsx_text_check"] = xlsx_text_check
ORACLES["xlsx_text_check"] = """
    WITH base AS (
      SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
             doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
      FROM documents),
    dims AS (
      SELECT doc_id, cls, CAST(1 + cls % 2 AS INTEGER) AS n_sheets,
             CAST(3 + cls AS INTEGER) AS n_rows
      FROM base WHERE NOT bad),
    sheets AS (
      SELECT doc_id, cls, n_sheets, n_rows,
             CAST(unnest(generate_series(0, n_sheets - 1))
                  AS INTEGER) AS s
      FROM dims),
    cells AS (
      SELECT doc_id, cls, n_sheets, n_rows, s,
             CAST(unnest(generate_series(0, n_rows - 1))
                  AS INTEGER) AS r
      FROM sheets),
    texts AS (
      SELECT doc_id, n_sheets, n_rows,
             string_agg(
               'word' || ((r * 7 + s) % 5) || chr(9) || (r * 13 + s)
                 || chr(9) || 'cell r' || r || ' & <x>',
               chr(10) ORDER BY s, r) AS text
      FROM cells GROUP BY doc_id, n_sheets, n_rows)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_sheets AS INTEGER) AS n_sheets,
           CAST(n_sheets * n_rows * 3 AS INTEGER) AS n_cells,
           CAST(length(text) AS INTEGER) AS n_chars,
           text, TRUE AS ok
    FROM texts
    UNION ALL
    SELECT CAST(doc_id AS BIGINT), NULL, NULL, NULL, NULL, FALSE
    FROM base WHERE bad
"""


def pptx_text_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPTX text extraction (operators/text.py ``pptx_extract`` →
    ``pptx_text``): DrawingML text over the ZIP SOURCE —
    presentation-declared slide count enforced, ``<a:p>`` paragraphs
    → lines, mid-word split ``<a:r>`` runs concatenated invisibly,
    entities decoded.  Arithmetic full-text oracle (identity check);
    %%17 flips a byte in slide1 (CRC), %%13 renames slide1
    (declared-count mismatch) — both ok=false."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = text.pptx_text(text.attach_pptx_blob(docs))
    return out.select(
        F.col("id").alias("doc_id"),
        "n_slides", "n_chars", "text", "ok",
    )


QUERIES["pptx_text_check"] = pptx_text_check
ORACLES["pptx_text_check"] = """
    WITH base AS (
      SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS cls,
             doc_id % 17 = 0 OR doc_id % 13 = 0 AS bad
      FROM documents),
    dims AS (
      SELECT doc_id, cls, CAST(1 + cls AS INTEGER) AS n_slides
      FROM base WHERE NOT bad),
    slides AS (
      SELECT doc_id, cls, n_slides,
             CAST(unnest(generate_series(0, n_slides - 1))
                  AS INTEGER) AS s
      FROM dims),
    paras AS (
      SELECT doc_id, cls, n_slides, s,
             CAST(unnest(generate_series(0, 1 + s % 2))
                  AS INTEGER) AS k
      FROM slides),
    texts AS (
      SELECT doc_id, n_slides,
             string_agg(
               'slide ' || s || ' para ' || k || ' of class ' || cls
                 || CASE WHEN s = 0 AND k = 0
                    THEN ' & specials < >' ELSE '' END,
               chr(10) ORDER BY s, k) AS text
      FROM paras GROUP BY doc_id, n_slides)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_slides AS INTEGER) AS n_slides,
           CAST(length(text) AS INTEGER) AS n_chars,
           text, TRUE AS ok
    FROM texts
    UNION ALL
    SELECT CAST(doc_id AS BIGINT), NULL, NULL, NULL, FALSE
    FROM base WHERE bad
"""