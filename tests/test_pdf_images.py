"""PDF embedded-image tier: image XObjects decode through the
existing JPEG/zlib decoders onto the shared hash grid — the three
lossless packagings (Flate / Flate+Up-predictor / raw samples) are
pixel-exact vs the source, DCT matches the standalone JPEG decode,
gray DeviceGray rides the same path; dict lies, stub filters and
torn streams flag honestly; byte flips never raise; the operator
face joins PDFs into cross-format image dedup."""
import numpy as np
import pytest


def _p():
    from dwc_dataframe_validator_spark.operators import pdf
    return pdf


def _mm():
    from dwc_dataframe_validator_spark.operators import multimodal
    return multimodal


def test_pdf_image_lossless_and_dct_paths():
    P, mm = _p(), _mm()
    for cls in range(6):
        px = P._pdf_image_fixture_pixels(cls)
        for kind in ("flate", "flate-pred", "raw"):
            blob = P.pdf_image_encode("t", [(kind, px)])
            doc = P.PdfDoc(blob)
            (_n, obj), = doc.page_images(doc.pages()[0])
            assert (doc.image_pixels(obj) == px).all(), (cls, kind)
        # DCT: pixel-identical to the standalone JPEG decode
        blob = P.pdf_image_encode("t", [("dct", px)])
        doc = P.PdfDoc(blob)
        (_n, obj), = doc.page_images(doc.pages()[0])
        want = mm.jpeg_decode_pixels(mm.jpeg_encode(px))
        assert (doc.image_pixels(obj) == want).all(), cls
    # gray 1-channel
    g = (px[:, :, 0:1]).copy()
    doc = P.PdfDoc(P.pdf_image_encode("t", [("flate", g)]))
    (_n, obj), = doc.page_images(doc.pages()[0])
    assert doc.image_pixels(obj).shape == (16, 16, 1)
    # multiple images on one page, name-ordered
    doc = P.PdfDoc(P.pdf_image_encode("t", [("raw", px), ("flate", g)]))
    imgs = doc.page_images(doc.pages()[0])
    assert [n for n, _ in imgs] == ["Im0", "Im1"]
    # page text still extracts alongside images
    assert doc.page_text(doc.pages()[0]).startswith("t")


def test_pdf_image_honest_flags():
    P = _p()
    px = P._pdf_image_fixture_pixels(1)
    # stub filter plant
    doc = P.PdfDoc(P.pdf_image_encode("t", [("jpx", px)]))
    (_n, obj), = doc.page_images(doc.pages()[0])
    with pytest.raises(P._Stub):
        doc.image_pixels(obj)
    # dict lies about dimensions vs sample count → torn
    blob = P.pdf_image_encode("t", [("raw", px)])
    mut = blob.replace(b"/Width 16", b"/Width 61", 1)
    doc = P.PdfDoc(mut)
    (_n, obj), = doc.page_images(doc.pages()[0])
    with pytest.raises(P._Torn):
        doc.image_pixels(obj)
    # fixture plants: %17 torn document, %13 per-image stub
    for did in (0, 17, 34):
        with pytest.raises((P._Torn, P._Stub)):
            d = P.PdfDoc(P.build_pdf_image_blob(did))
            d.pages()
    for did in (13, 26, 39, 52, 65):
        d = P.PdfDoc(P.build_pdf_image_blob(did))
        (_n, obj), = d.page_images(d.pages()[0])
        with pytest.raises(P._Stub):
            d.image_pixels(obj)
    # byte-flip fuzz across every packaging: flags only, no raises
    for base in (1, 6, 12, 18, 24):
        blob = P.build_pdf_image_blob(base)
        for j in range(0, len(blob), 11):
            mut = blob[:j] + bytes([blob[j] ^ 0xFF]) + blob[j + 1:]
            try:
                d = P.PdfDoc(mut)
                for pg in d.pages():
                    for _n2, o in d.page_images(pg):
                        d.image_pixels(o)
            except (P._Torn, P._Stub, RecursionError):
                pass


def test_generalized_png_unpredict_bpp():
    """bpp>1 predictor rows invert exactly (Sub/Average/Paeth left
    neighbor at x-bpp) — pinned against a scalar forward filter."""
    P = _p()
    rng = np.random.RandomState(7)
    w, h, bpp = 9, 6, 3
    rowb = w * bpp
    src = rng.randint(0, 256, (h, rowb)).astype(np.uint8)
    for ft in (0, 1, 2, 3, 4):
        enc = bytearray()
        prev = bytes(rowb)
        for r in range(h):
            cur = src[r].tobytes()
            enc.append(ft)
            for x in range(rowb):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 0:
                    v = cur[x]
                elif ft == 1:
                    v = (cur[x] - a) & 0xFF
                elif ft == 2:
                    v = (cur[x] - b) & 0xFF
                elif ft == 3:
                    v = (cur[x] - ((a + b) >> 1)) & 0xFF
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    v = (cur[x] - pr) & 0xFF
                enc.append(v)
            prev = cur
        got = P._png_unpredict(bytes(enc), rowb, bpp)
        assert got == src.tobytes(), ft


def test_pdf_images_join_cross_format_dedup(spark):
    """The operator face: a photo inside a PDF carries the same
    ahash/dhash as its standalone JPEG/raw packagings — the
    cross-format dedup contract."""
    P, mm = _p(), _mm()
    docs = spark.createDataFrame([(d,) for d in range(60)],
                                 "doc_id long")
    rows = {
        r["id"]: r
        for r in P.pdf_image_hashes(
            P.attach_pdf_image_blob(docs)
        ).collect()
    }
    for d, r in rows.items():
        bad = d % 17 == 0 or d % 13 == 0
        assert r["ok"] != bad, d
    # same pixel class, lossless variants (flate=6..11, pred=12..17,
    # raw=24..29 band offsets) share hashes with the raw pixels
    for cls in range(6):
        want = format(
            mm.image_ahash(P._pdf_image_fixture_pixels(cls)), "016x"
        )
        for var in (1, 2, 4):
            d = cls + 6 * var
            if rows[d]["ok"]:
                assert rows[d]["ahash"] == want, (cls, var)


def test_aes_rc4_known_answer_vectors():
    """Cipher cores pinned to PUBLIC vectors: FIPS-197 Appendix B and
    C.1 for AES-128, the classic 'Key'/'Plaintext' vector for RC4 —
    the derived-table implementation can't drift silently."""
    P = _p()
    rk = P._aes128_round_keys(
        bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert P._aes128_encrypt_block(rk, pt) == ct
    assert P._aes128_decrypt_block(rk, ct) == pt
    rk2 = P._aes128_round_keys(
        bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    )
    pt2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct2 = bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    assert P._aes128_encrypt_block(rk2, pt2) == ct2
    assert P._aes128_decrypt_block(rk2, ct2) == pt2
    assert (
        P._rc4(b"Key", b"Plaintext").hex().upper()
        == "BBF316E8D940AF0AD3"
    )
    data = b"roundtrip payload" * 9
    assert P._rc4(b"k", P._rc4(b"k", data)) == data
    enc = P._aes128_cbc_encrypt(ct[:16], bytes(range(16)), data)
    assert P._aes128_cbc_decrypt(ct[:16], enc) == data
    # padding lies are torn, never truncated-but-plausible output
    with pytest.raises(P._Torn):
        P._aes128_cbc_decrypt(ct[:16], enc[:-1])
    # FIPS-197 Appendix C.2 (AES-192) and C.3 (AES-256)
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk192 = P._aes_round_keys(bytes(range(24)))
    assert P._aes_encrypt_block(rk192, pt) == bytes.fromhex(
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    rk256 = P._aes_round_keys(bytes(range(32)))
    ct256 = P._aes_encrypt_block(rk256, pt)
    assert ct256 == bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert P._aes_decrypt_block(rk256, ct256) == pt
    # AES-256 CBC roundtrip through the stream face
    enc256 = P._aes128_cbc_encrypt(
        bytes(range(32)), bytes(range(16)), data
    )
    assert P._aes_cbc_decrypt(bytes(range(32)), enc256) == data
    # Algorithm 2.B structural pins: deterministic, 32 bytes,
    # password- and salt-sensitive
    h1 = P._pdf_hash_2b(b"", b"saltsalt")
    assert len(h1) == 32 and h1 == P._pdf_hash_2b(b"", b"saltsalt")
    assert h1 != P._pdf_hash_2b(b"x", b"saltsalt")
    assert h1 != P._pdf_hash_2b(b"", b"SALTSALT")
    assert h1 != P._pdf_hash_2b(b"", b"saltsalt", b"udata")
    # the import-try accelerator and the pure-Python FIPS path are
    # byte-identical on every shape the module uses (CBC enc/dec
    # for both key sizes, the iv=None ECB single block), and 2.B
    # lands the same digest through either
    if P._aes_accel() is not None:
        saved = P._aes_accel._c
        try:
            shapes = [
                (bytes(range(32)), bytes(range(16)), data[:96]),
                (ct[:16], bytes(16), data[:64]),
            ]
            accel, pure = [], []
            for forced in (saved, None):
                P._aes_accel._c = forced
                got = [
                    (P._aes_cbc_raw(k, iv, d, decrypt=False),
                     P._aes_cbc_raw(k, iv, d, decrypt=True),
                     P._aes_cbc_raw(k, None, d[:16], decrypt=False))
                    for (k, iv, d) in shapes
                ] + [P._pdf_hash_2b(b"pw", b"saltsalt", b"ud")]
                (accel if forced is not None else pure).append(got)
            assert accel == pure
        finally:
            P._aes_accel._c = saved


def test_encrypted_pdf_standard_handler():
    """All six real schemes (through AES-256 R6/R5) decrypt to the
    plaintext text; non-empty passwords, non-Standard handlers,
    tampered /Perms receipts and the legacy dummy-/Encrypt plant
    flag 'encrypted'; fuzz flags only."""
    P = _p()
    pages = ["secret page\nwith two lines", "second page text"]
    plain = P.PdfDoc(P.pdf_encode(pages))
    want = [plain.page_text(p) for p in plain.pages()]
    for variant in ("rc4-40", "rc4-128", "aes-128", "cf-rc4",
                    "aes-256", "aes-256-r5"):
        doc = P.PdfDoc(P.pdf_encode_encrypted(pages, variant))
        assert [doc.page_text(p) for p in doc.pages()] == want, variant
    # the owner-password fallback unlocks when only /O verifies
    doc = P.PdfDoc(P.pdf_encode_encrypted(
        pages, "aes-256", user_pw=b"secret", owner_pw=b""
    ))
    assert [doc.page_text(p) for p in doc.pages()] == want
    for bad in (
        P.pdf_encode_encrypted(pages, "custom"),
        P.pdf_encode_encrypted(pages, "aes-128", user_pw=b"x"),
        P.pdf_encode_encrypted(pages, "aes-256", user_pw=b"x"),
        P.pdf_encode_encrypted(pages, "aes-256-r5", user_pw=b"x"),
        P.pdf_encode(pages, encrypted=True),
    ):
        with pytest.raises(P._Stub) as ei:
            P.PdfDoc(bad)
        assert str(ei.value) == "encrypted"
    # a tampered /Perms receipt flags even though /U verifies
    blob = P.pdf_encode_encrypted(pages, "aes-256")
    k = blob.index(b"/Perms <") + 8
    tampered = blob[:k] + (
        b"f" if blob[k:k + 1] != b"f" else b"0"
    ) + blob[k + 1:]
    with pytest.raises(P._Stub):
        P.PdfDoc(tampered)
    # fixture plants and scheme classes (scheme 7 = the r18 KNOWN
    # candidate password: flags bare, decodes with the list)
    pwl = (b"wrong-guess", P._PDF_FIXTURE_PW)
    for did in range(136):
        scheme = (did // 4) % 8
        blob = P.build_pdf_encrypted_blob(did)
        if did % 17 == 0:
            with pytest.raises((P._Torn, P._Stub)):
                d = P.PdfDoc(blob, pwl)
                [d.page_text(p) for p in d.pages()]
        elif did % 13 == 0 or scheme == 6:
            with pytest.raises(P._Stub):
                P.PdfDoc(blob, pwl)
        else:
            if scheme == 7:
                with pytest.raises(P._Stub):
                    P.PdfDoc(blob)
            d = P.PdfDoc(blob, pwl)
            assert len(d.pages()) == 1 + did % 4, did
    # byte-flip fuzz over an AES doc: never raises past the flags
    blob = P.pdf_encode_encrypted(pages, "aes-128")
    for j in range(0, len(blob), 11):
        try:
            d = P.PdfDoc(blob[:j] + bytes([blob[j] ^ 0xFF]) + blob[j + 1:])
            [d.page_text(p) for p in d.pages()]
        except (P._Torn, P._Stub, RecursionError):
            pass


def test_encrypted_pdf_image_extraction_composes():
    """Images inside an ENCRYPTED PDF decrypt through the same
    per-object stream path and land on the shared hash grid — the
    two round-16 tiers compose with zero extra code."""
    P, mm = _p(), _mm()
    px = P._pdf_image_fixture_pixels(3)
    g = px[:, :, 0:1].copy()
    for variant in ("rc4-40", "rc4-128", "aes-128", "cf-rc4"):
        doc = P.PdfDoc(P.pdf_encode_encrypted(
            ["page with images"], variant, images=[px, g],
        ))
        pg = doc.pages()[0]
        assert doc.page_text(pg) == "page with images", variant
        imgs = doc.page_images(pg)
        assert [n for n, _ in imgs] == ["Im0", "Im1"], variant
        d0 = doc.image_pixels(imgs[0][1])
        d1 = doc.image_pixels(imgs[1][1])
        assert (d0 == px).all() and (d1 == g).all(), variant
        assert mm.image_ahash(d0) == mm.image_ahash(px), variant


def test_pdf_tounicode_cid_text():
    """Composite-font extraction: Type0/Identity-H 2-byte codes map
    through /ToUnicode (bfchar and incremented bfrange identically);
    multilingual text round-trips exactly; a Type0 font without a
    CMap flags 'font'; simple-font docs are unaffected; fuzz flags
    only."""
    P = _p()
    pages = ["café noël über straße\nsecond líne",
             "ελληνικά και русский\n中文也可以 日本語も"]
    for ranges in (False, True):
        doc = P.PdfDoc(P.pdf_encode_cid(pages, use_ranges=ranges))
        assert [doc.page_text(p) for p in doc.pages()] == pages, ranges
    doc = P.PdfDoc(P.pdf_encode_cid(pages, drop_tounicode=True))
    with pytest.raises(P._Stub) as ei:
        doc.page_text(doc.pages()[0])
    assert str(ei.value) == "font"
    d2 = P.PdfDoc(P.pdf_encode(["plain text page"]))
    assert d2.page_text(d2.pages()[0]) == "plain text page"
    # fixture classes and plants
    for did in range(48):
        blob = P.build_pdf_cid_blob(did)
        if did % 17 == 0:
            with pytest.raises((P._Torn, P._Stub)):
                d = P.PdfDoc(blob)
                [d.page_text(p) for p in d.pages()]
        elif did % 13 == 0:
            d = P.PdfDoc(blob)
            with pytest.raises(P._Stub):
                [d.page_text(p) for p in d.pages()]
        else:
            d = P.PdfDoc(blob)
            txt = "\f".join(d.page_text(p) for p in d.pages())
            assert P._PDF_CID_TEXTS[did % 4].split("\n")[0] in txt
    blob = P.build_pdf_cid_blob(1)
    for j in range(0, len(blob), 9):
        try:
            d = P.PdfDoc(blob[:j] + bytes([blob[j] ^ 0xFF]) + blob[j + 1:])
            [d.page_text(p) for p in d.pages()]
        except (P._Torn, P._Stub, RecursionError):
            pass
