"""JBIG2 tier pins: the MQ coder against the spec's own Annex H.2
test sequence (both directions, byte-exact), generic-region
round-trips across every template / TPGDON / MMR, the embedded
segment walk, the PDF /JBIG2Decode composition with /JBIG2Globals,
and honest flags for the symbol/halftone tiers and torn streams."""
import numpy as np
import pytest


def _j():
    from dwc_dataframe_validator_spark.functions import jbig2
    return jbig2


def _p():
    from dwc_dataframe_validator_spark.operators import pdf
    return pdf


# T.88 Annex H.2: the published 256-bit coder input and its coded
# form — the tier's external KAT (no JBIG2 codec ships in this
# container; this pins the MQ coder the way FIPS-197 pins AES)
H2_INPUT = bytes.fromhex(
    "00020051000000C00352872AAAAAAAAA"
    "82C02000FCD79EF6BF7FED904F46A3BF"
)
H2_CODED = bytes.fromhex(
    "84C73BFCE1A1430402200000410DBB86"
    "F4317FFF88FF37471ADB6ADFFFAC"
)


def test_mq_kat_annex_h2():
    J = _j()
    bits = [(b >> (7 - k)) & 1 for b in H2_INPUT for k in range(8)]
    enc = J.MQEncoder()
    st = [0, 0]
    for b in bits:
        enc.encode(st, b)
    assert enc.flush() == H2_CODED
    dec = J.MQDecoder(H2_CODED)
    st = [0, 0]
    assert [dec.decode(st) for _ in range(256)] == bits


def test_mq_multi_context_roundtrip():
    J = _j()
    rng = np.random.default_rng(5)
    bits = list((rng.random(4000) < 0.2).astype(int))
    ctxs = list(rng.integers(0, 9, len(bits)))
    enc = J.MQEncoder()
    est = {c: [0, 0] for c in range(9)}
    for c, b in zip(ctxs, bits):
        enc.encode(est[c], int(b))
    coded = enc.flush()
    dec = J.MQDecoder(coded)
    dst = {c: [0, 0] for c in range(9)}
    assert [dec.decode(dst[c]) for c in ctxs] == bits


def test_generic_region_roundtrips():
    J = _j()
    rng = np.random.default_rng(7)
    for trial in range(8):
        h, w = int(rng.integers(1, 22)), int(rng.integers(1, 40))
        arr = rng.random((h, w)) < rng.random()
        for template in (0, 1, 2, 3):
            for tpgdon in (False, True):
                coded = J._generic_encode(arr, template, tpgdon)
                dec = J._generic_decode(
                    coded, w, h, template,
                    J._NOMINAL_AT[template], tpgdon,
                )
                assert dec is not None
                assert (dec.astype(bool) == arr).all(), (
                    trial, template, tpgdon,
                )


def test_embedded_stream_and_flags():
    J = _j()
    arr = np.zeros((40, 64), bool)
    arr[5:35, 10:50] = True
    arr[18:22] = False
    for kw in (
        dict(tpgdon=True), dict(template=1), dict(template=2),
        dict(template=3, tpgdon=True), dict(mmr=True),
        dict(with_page_info=False),
    ):
        blob = J.encode_embedded(arr, **kw)
        out = J.decode_embedded(
            blob, fallback_size=arr.shape
        )
        assert (out == arr).all(), kw
    # truncations tear honestly, never guess
    blob = J.encode_embedded(arr, tpgdon=True)
    for cut in range(1, len(blob) - 1, 3):
        try:
            out = J.decode_embedded(blob[:cut])
            assert out.shape == arr.shape
        except (ValueError, NotImplementedError):
            pass
    # a torn (empty) symbol dictionary tears; plain SDHUFF DECODES
    # since r19, so the honest flag moved to the still-unshipped
    # SDHUFF+SDREFAGG combination
    with pytest.raises(ValueError):
        J.decode_embedded(J._segment(9, 0, 1, b"") + blob)
    refagg = J._segment(9, 0, 1, (3).to_bytes(2, "big") + bytes(8))
    with pytest.raises(NotImplementedError):
        J.decode_embedded(refagg + blob)


def test_pdf_jbig2_composition():
    """All the /JBIG2Decode packagings (incl. the r19 Huffman
    spelling) land the SAME pixels on the shared hash grid; the
    /JPXDecode relabel and the SDREFAGG-Huffman plant stay honest
    stubs."""
    P = _p()
    px = P._pdf_image_fixture_pixels(2)
    luma = (
        (
            px[:, :, 0].astype(np.int64) * 299
            + px[:, :, 1].astype(np.int64) * 587
            + px[:, :, 2].astype(np.int64) * 114
        ) // 1000
    ).astype(np.uint8)[:, :, None]
    bl = np.where(luma >= 128, 255, 0).astype(np.uint8)
    kinds = ["ccitt", "jbig2", "jbig2-t1", "jbig2-t2", "jbig2-mmr",
             "jbig2-glob", "jbig2-text", "jbig2-huff"]
    blob = P.pdf_image_encode("jbig2 page", [(k, bl) for k in kinds])
    doc = P.PdfDoc(blob)
    outs = [
        doc.image_pixels(obj)
        for _n, obj in doc.page_images(doc.pages()[0])
    ]
    for k, out in zip(kinds, outs):
        assert (out == bl).all(), k
    blob2 = P.pdf_image_encode("plant", [("jbig2-sym", bl)])
    doc2 = P.PdfDoc(blob2)
    with pytest.raises(P._Stub):
        doc2.image_pixels(doc2.page_images(doc2.pages()[0])[0][1])
    # fixture universe: plants flag, clean ids decode
    for did in range(0, 182):
        b = P.build_pdf_image_blob(did)
        d = None
        try:
            d = P.PdfDoc(b)
            (_n, obj), = d.page_images(d.pages()[0])
            out = P.PdfDoc(b).image_pixels(obj)
            assert did % 17 and did % 13, did
            assert out.shape[:2] == (16, 16), did
        except (P._Torn, P._Stub):
            assert did % 17 == 0 or did % 13 == 0, did


def test_pdf_jbig2_fuzz_never_guesses():
    P = _p()
    px = P._pdf_image_fixture_pixels(0)
    bl = np.where(px[:, :, 0:1] >= 128, 255, 0).astype(np.uint8)
    blob = P.pdf_image_encode("fuzz", [("jbig2", bl)])
    for j in range(0, len(blob), 7):
        try:
            d = P.PdfDoc(blob[:j] + bytes([blob[j] ^ 0xFF])
                         + blob[j + 1:])
            for pg in d.pages():
                for _n, obj in d.page_images(pg):
                    d.image_pixels(obj)
        except (P._Torn, P._Stub, RecursionError):
            pass


def test_symbol_text_region_matrix():
    """The §6.5/§6.4 tier across its parameter axes: every
    REFCORNER, TRANSPOSED, SBSTRIPS 1/4, negative and positive
    SBDSOFFSET, globals-split dictionaries, the one-symbol
    SYMCODELEN=0 edge, and honest flags for the Huffman variant."""
    J = _j()
    rng = np.random.default_rng(21)
    glyphs = []
    for h, w in [(8, 6), (8, 5), (10, 7), (6, 6)]:
        g = np.zeros((h, w), bool)
        g[1:-1, 1:-1] = rng.random((h - 2, w - 2)) < 0.6
        glyphs.append(g)

    def expect(insts, rc, tr, shape):
        want = np.zeros(shape, bool)
        for s, t, gi in insts:
            gh, gw = glyphs[gi].shape
            if not tr:
                y0 = t if rc in (1, 3) else t - gh + 1
                x0 = s
            else:
                x0 = t if rc in (0, 1) else t - gw + 1
                y0 = s
            want[y0:y0 + gh, x0:x0 + gw] |= glyphs[gi]
        return want

    insts = [(5, 12, 0), (13, 12, 1), (20, 14, 2), (30, 12, 3),
             (5, 30, 2), (14, 28, 0)]
    for rc in (0, 1, 2, 3):
        for strips in (1, 4):
            for dso in (0, 2, -3):
                blob = J.encode_embedded_text(
                    glyphs, insts, 64, 44, refcorner=rc,
                    strips=strips, dsoffset=dso,
                )
                out = J.decode_embedded(blob)
                assert (out == expect(insts, rc, 0, (44, 64))).all(), (
                    rc, strips, dso,
                )
    insts_t = [(5, 12, 0), (15, 12, 1), (25, 14, 2)]
    for rc in (0, 1, 2, 3):
        blob = J.encode_embedded_text(
            glyphs, insts_t, 44, 64, refcorner=rc, transposed=1,
        )
        out = J.decode_embedded(blob)
        assert (out == expect(insts_t, rc, 1, (64, 44))).all(), rc
    g, stream = J.encode_embedded_text(
        glyphs, insts, 64, 44, globals_split=True,
    )
    assert (J.decode_embedded(stream, g)
            == expect(insts, 1, 0, (44, 64))).all()
    one = J.encode_embedded_text(
        glyphs[:1], [(4, 10, 0), (14, 10, 0)], 32, 24,
    )
    assert (J.decode_embedded(one)
            == expect([(4, 10, 0), (14, 10, 0)], 1, 0,
                      (24, 32))).all()
    # truncation fuzz over the symbol/text stream: tears or flags
    full = J.encode_embedded_text(glyphs, insts, 64, 44)
    for cut in range(1, len(full) - 1, 5):
        try:
            out = J.decode_embedded(full[:cut])
            assert out.shape == (44, 64)
        except (ValueError, NotImplementedError):
            pass


def test_refinement_tier():
    """§6.3 refinement: core round-trips over both templates,
    TPGRON and offsets; SDREFAGG single-symbol aggregates across
    two dictionaries; per-instance text REFINE with RDW/RDH
    resizing; multi-symbol aggregates stay honest flags."""
    J = _j()
    rng = np.random.default_rng(4)
    for trial in range(4):
        h, w = int(rng.integers(4, 20)), int(rng.integers(4, 26))
        ref = (rng.random((h, w)) < 0.5).astype(np.uint8)
        arr = ref.copy()
        for _ in range(int(rng.integers(0, 8))):
            arr[rng.integers(0, h), rng.integers(0, w)] ^= 1
        for template in (0, 1):
            for tpgron in (False, True):
                for dx, dy in ((0, 0), (1, -1), (-2, 2)):
                    enc = J.MQEncoder()
                    cx = {}
                    J._refine_encode_core(
                        enc, cx, arr, template, ref, dx, dy, tpgron
                    )
                    dec = J.MQDecoder(enc.flush())
                    out = J._refine_decode_core(
                        dec, {}, w, h, template, ref, dx, dy,
                        tpgron=tpgron,
                    )
                    assert (out == arr).all(), (
                        trial, template, tpgron, dx, dy,
                    )
    # SDREFAGG: dict B's symbols refine dict A's exports
    bases, refined = [], []
    for h, w in [(8, 6), (10, 7), (8, 5)]:
        g = np.zeros((h, w), np.uint8)
        g[1:-1, 1:-1] = rng.random((h - 2, w - 2)) < 0.5
        bases.append(g)
        r = g.copy()
        r[2, 2] ^= 1
        r[3, 1] ^= 1
        refined.append(r)
    bodyA, orderA = J._symbol_dict_encode(bases)
    expA = J._symbol_dict_decode(bodyA, [])
    pool_of = {orderA[k]: k for k in range(3)}
    bodyB, orderB = J._symbol_dict_encode(
        refined, refagg_bases=[pool_of[k] for k in range(3)],
        insyms=expA,
    )
    expB = J._symbol_dict_decode(bodyB, expA)
    assert all(
        (expB[k] == refined[orderB[k]]).all() for k in range(3)
    )
    # text REFINE: one instance resized (+2, +1) with flips
    body, order = J._symbol_dict_encode(bases)
    exported = J._symbol_dict_decode(body, [])
    id_of = {orig: k for k, orig in enumerate(order)}
    dims = [bases[o].shape for o in order]
    base = bases[1]
    target = np.zeros(
        (base.shape[0] + 1, base.shape[1] + 2), np.uint8
    )
    target[:base.shape[0], :base.shape[1]] = base
    target[2, 1] ^= 1
    target[-1, -1] = 1
    insts = [(4, 10, id_of[0]), (12, 10, id_of[1]),
             (22, 10, id_of[2])]
    tr = J._text_region_encode(
        48, 30, len(bases), insts, sym_dims=dims,
        refined={1: (2, 1, 0, 0, target)}, syms=exported,
    )
    region, _info = J._text_region_decode(tr, exported)
    want = np.zeros((30, 48), np.uint8)
    for sym, (s, t) in ((bases[0], (4, 10)), (target, (12, 10)),
                        (bases[2], (22, 10))):
        want[t:t + sym.shape[0], s:s + sym.shape[1]] |= sym
    assert (region == want).all()
    # multi-symbol aggregates (§6.5.8.2.2): a 10×10 symbol built
    # from TWO pool instances via the shared-context text region,
    # side by side with a single-refinement symbol in the same dict
    agg = [(0, 0, 0), (5, 2, 1)]
    want_agg = np.zeros((10, 10), np.uint8)
    for s, t, pid in agg:
        g = expA[pid]
        want_agg[t:t + g.shape[0], s:s + g.shape[1]] |= g
    ref_sym = expA[2].copy()
    ref_sym[2, 2] ^= 1
    bodyC, orderC = J._symbol_dict_encode(
        [np.zeros((10, 10), np.uint8), ref_sym],
        refagg_bases=[agg, 2], insyms=expA,
    )
    expC = J._symbol_dict_decode(bodyC, expA)
    got = {tuple(expC[k].shape): expC[k] for k in range(2)}
    assert (got[(10, 10)] == want_agg).all()
    assert (got[ref_sym.shape] == ref_sym).all()
    # a lying REFAGGNINST (0) tears honestly
    enc = J.MQEncoder()
    iadh, iadw, iaai = (J.IntCtx() for _ in range(3))
    J.ia_encode(enc, iadh, 8)
    J.ia_encode(enc, iadw, 6)
    J.ia_encode(enc, iaai, 0)
    head = (2 | (1 << 12)).to_bytes(2, "big")  # SDREFAGG, RTEMPLATE 1
    head += b"\x03\xff\xfd\xff\xfe\xfe\xff\xff"  # 4 generic ATs
    head += (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
    with pytest.raises(ValueError):
        J._symbol_dict_decode(head + enc.flush(), [bases[0]])


def test_fast_paths_equal_reference_walks():
    """The nominal-AT vectorized paths are BYTE/PIXEL-identical to
    the per-pixel reference walks (which stay in-tree as the
    equivalence pins), across every template and TPGDON."""
    J = _j()
    rng = np.random.default_rng(2)
    for trial in range(6):
        h, w = int(rng.integers(1, 26)), int(rng.integers(1, 40))
        arr = rng.random((h, w)) < rng.random()
        for template in (0, 1, 2, 3):
            for tpgdon in (False, True):
                e1 = J.MQEncoder()
                J._generic_encode_core(e1, {}, arr, template, tpgdon)
                e2 = J.MQEncoder()
                J._generic_encode_core_ref(
                    e2, {}, arr, template, tpgdon
                )
                coded = e1.flush()
                assert coded == e2.flush(), (trial, template, tpgdon)
                at = J._NOMINAL_AT[template]
                fast = J._generic_decode(
                    coded, w, h, template, at, tpgdon
                )
                dec = J.MQDecoder(coded)
                saved = J._NOMINAL_AT
                J._NOMINAL_AT = {k: ("forced",) for k in saved}
                try:
                    gen = J._generic_decode_core(
                        dec, {}, w, h, template, at, tpgdon
                    )
                finally:
                    J._NOMINAL_AT = saved
                assert (fast == gen).all(), (trial, template, tpgdon)
                assert (fast.astype(bool) == arr).all()


def test_random_bytes_never_hang_or_crash():
    """Adversarial-input discipline: pure-random segment streams
    either tear (ValueError), flag (NotImplementedError) or decode
    a bounded page — never hang, never raise anything else.  The
    height-class and export-run walks carry explicit runaway guards
    (0-length spins from 0xFF-fed exhausted coders)."""
    import random

    J = _j()
    rng = random.Random(17)
    arr = np.zeros((8, 8), bool)
    good = J.encode_embedded(arr)
    for trial in range(300):
        n = rng.randrange(4, 200)
        blob = bytes(rng.randrange(256) for _ in range(n))
        if rng.random() < 0.5:
            # graft random bytes onto a valid header prefix
            blob = good[: rng.randrange(len(good))] + blob
        try:
            out = J.decode_embedded(blob, fallback_size=(8, 8))
            assert out.shape[0] * out.shape[1] <= 16_000_000
        except (ValueError, NotImplementedError):
            pass
    # a symbol dict whose stream yields empty height classes forever
    # hits the runaway guard, not an infinite loop
    head = (0).to_bytes(2, "big")
    head += b"\x03\xff\xfd\xff\xfe\xfe\xff\xff"
    head += (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
    with pytest.raises(ValueError):
        J._symbol_dict_decode(head + b"", [])
