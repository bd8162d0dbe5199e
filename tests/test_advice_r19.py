"""Round-19 ADVICE pins (all five items).

- Refinement AT (GRAT) bytes are now PARSED: a conformant stream
  moving them off the nominal placement flags honestly instead of
  decoding to silently wrong pixels (symbol-dict and text-region
  sites).
- Symbol-dictionary flags bit 8 ("bitmap coding context used" —
  import GB/GR contexts from a referred-to dictionary) flags
  honestly instead of decoding with fresh contexts.
- SBSYMCODELEN for a single-symbol pool is 1 (T.88 errata /
  pdf.js / jbig2dec behavior), not 0 — pinned by showing the
  decoder actually consumes the 1-bit symbol IDs.
- Intermediate regions (types 4 / 36) are refinement inputs, never
  page-composited — they flag instead of compositing.
- ``bench.py --out`` as the last token exits with a usage message
  up front instead of an IndexError after the bench loop.
"""
import numpy as np
import pytest

from dwc_dataframe_validator_spark.functions import jbig2 as J

GLYPH = np.array(
    [[1, 1, 1, 0],
     [1, 0, 1, 0],
     [1, 1, 1, 1]], dtype=np.uint8)


def _patch_segment(blob: bytes, stype: int, patch) -> bytes:
    """Return ``blob`` with ``patch(payload)`` applied to the first
    segment of type ``stype`` (payload located by byte search)."""
    for _num, st, _pg, _ref, payload in J._parse_segments(blob):
        if st == stype:
            raw = bytes(payload)
            i = blob.index(raw)
            return blob[:i] + patch(bytearray(raw)) + blob[i + len(raw):]
    raise AssertionError("segment type %d not found" % stype)


def test_single_symbol_stream_uses_one_bit_symbol_ids():
    # one glyph, several instances: real encoders emit 1-bit IAID
    # codes here (errata SBSYMCODELEN = max(1, ceil(log2 N)))
    blob = J.encode_embedded_text(
        [GLYPH], [(0, 0, 0), (0, 6, 0), (4, 3, 0)], 12, 9)
    page = J.decode_embedded(blob)
    assert int(page[0:3, 0:4].sum()) == int(GLYPH.sum())
    assert int(page.sum()) == 3 * int(GLYPH.sum())


def test_single_symbol_id_bit_is_actually_consumed():
    # the encoder/decoder twins MIRROR the formula, so a round-trip
    # alone cannot pin the width; decode the same text-region
    # bitstream with a forced 0-bit reader and require a desync
    body = J._text_region_encode(12, 9, 1, [(0, 0, 0), (0, 6, 0)],
                                 sym_dims=[GLYPH.shape])
    mq = body[23:]  # rinfo 17 + flags 2 + SBNUMINSTANCES 4
    good = J._text_region_run(
        J.MQDecoder(mq), J._new_text_ictx(), [GLYPH],
        12, 9, 2, 1, 1, 0, 0, 0, 0, False, 0, 1)
    assert int(good.sum()) == 2 * int(GLYPH.sum())
    try:
        bad = J._text_region_run(
            J.MQDecoder(mq), J._new_text_ictx(), [GLYPH],
            12, 9, 2, 1, 1, 0, 0, 0, 0, False, 0, 0)
    except Exception:
        return  # desync raised — the bit matters
    assert not np.array_equal(bad, good)


def test_non_nominal_grat_flags_text_region():
    # the encoder twin only emits SBRTEMPLATE=1 refinements (no AT
    # field), so craft the rtemplate=0 header by hand: the GRAT
    # check fires BEFORE any body decode, which is the point —
    # honest flag instead of decoding with wrong AT placement
    rinfo = (8).to_bytes(4, "big") + (6).to_bytes(4, "big") \
        + bytes(8) + b"\x00"
    flags = (1 << 1) | (1 << 4)  # refine, refcorner=TL, rtemplate=0
    payload = rinfo + flags.to_bytes(2, "big") \
        + b"\x00\xff\xff\xff" + (1).to_bytes(4, "big")
    blob = J._segment(0, 48, 1,
                      (8).to_bytes(4, "big") + (6).to_bytes(4, "big")
                      + bytes(8) + b"\x01" + bytes(2)) \
        + J._segment(1, 6, 1, payload)
    with pytest.raises(NotImplementedError, match="non-nominal GRAT"):
        J.decode_embedded(blob)


def test_non_nominal_grat_flags_symbol_dict():
    # sdrefagg=1, template=0, rtemplate=0: 2-byte flags, 4 AT pairs,
    # then the refinement AT field this round now actually parses
    flags = (1 << 1).to_bytes(2, "big")
    at = b"\xfd\xff\xfd\xfe\xfe\xfe\xfe\xff"  # any coding-AT values
    payload = flags + at + b"\x00\xff\xff\xff" \
        + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
    blob = J._segment(0, 0, 1, payload)
    with pytest.raises(NotImplementedError, match="non-nominal GRAT"):
        J.decode_embedded(blob)


def test_symbol_dict_context_import_flags():
    blob = J.encode_embedded_text([GLYPH], [(0, 0, 0)], 8, 6)

    def patch(p):
        p[0] |= 0x01  # flags bit 8 lives in the high byte of the
        return bytes(p)  # big-endian 16-bit field

    bad = _patch_segment(blob, 0, patch)
    with pytest.raises(NotImplementedError, match="context import"):
        J.decode_embedded(bad)


def test_intermediate_region_types_flag():
    blob = J.encode_embedded(GLYPH)
    assert np.array_equal(J.decode_embedded(blob), GLYPH)
    for inter in (36, 4):
        parts = []
        for num, st, pg, _ref, payload in J._parse_segments(blob):
            st2 = inter if st in (38, 6) else st
            parts.append(J._segment(num, st2, pg, bytes(payload)))
        with pytest.raises(NotImplementedError,
                           match="region type %d" % inter):
            J.decode_embedded(b"".join(parts))


def test_bench_out_without_value_is_usage_error(monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr("sys.argv", ["bench.py", "--out"])
    with pytest.raises(SystemExit, match="usage"):
        bench._local_bench_path()
    monkeypatch.setattr("sys.argv", ["bench.py", "--out", "/tmp/x.json"])
    assert bench._local_bench_path() == "/tmp/x.json"


def test_tiff_compression6_adjudicated_stub():
    """r19 verdict ask 7: old-style JPEG-in-TIFF stays an honest,
    WRITTEN-adjudication stub (TTN2-deprecated, underspecified)."""
    import struct

    from dwc_dataframe_validator_spark.operators import multimodal as mm

    px = mm._tiff_fixture_pixels(0)
    blob = bytearray(mm.tiff_encode(px))
    n = struct.unpack_from("<H", blob, 8)[0]
    hit = False
    for k in range(n):
        off = 10 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", blob, off)
        if tag == 259:  # Compression
            struct.pack_into("<I", blob, off + 8, 6)
            hit = True
    assert hit
    with pytest.raises(NotImplementedError, match="adjudicated"):
        mm.tiff_decode_pixels(bytes(blob))


def test_df_cap_frame_absolute_ceiling(spark):
    """r19 scale fix: the relative df cap clamps at max_cap, so the
    pair join's worst-case fan-out stays linear in corpus size; at
    the sf0.01/sf0.1 gate scales the clamp is inactive."""
    from dwc_dataframe_validator_spark.operators import text as T

    big = spark.range(100_000).toDF("doc_id")
    assert T.df_cap_frame(big, max_cap=500).collect()[0][0] == 500
    assert T.df_cap_frame(big).collect()[0][0] == 10_000
    small = spark.range(500).toDF("doc_id")
    assert T.df_cap_frame(small, max_cap=500).collect()[0][0] == 50


def test_fixture_memo_keys_are_sound():
    """Every memoized fixture builder must return bytes identical to
    its un-cached core for ANY doc_id: the cache is keyed on a
    reduced (class, plant) tuple, so a builder body that started
    depending on doc_id outside its declared key would return stale
    bytes — this probe (ids spanning several periods of every
    universe, including the 13/17 plant lattice) catches it."""
    from dwc_dataframe_validator_spark.operators import multimodal as mm
    from dwc_dataframe_validator_spark.operators import pdf as pdfmod

    builders = [
        getattr(m, n) for m in (mm, pdfmod) for n in dir(m)
        if n.startswith("build_") and hasattr(getattr(m, n), "__wrapped__")
    ]
    assert len(builders) >= 24
    for b in builders:
        for did in list(range(0, 450)) + [13 * 17, 13 * 108 + 13,
                                          17 * 108 + 17, 2211, 5099]:
            assert b(did) == b.__wrapped__(did), (b.__name__, did)
