"""Round-17 ADVICE-fix pins: freed xref entries resolve to PDF null
(dangling refs after incremental deletes are conforming, not torn);
RTF {\\*\\ud …} alternate-Unicode destinations emit their text (with
\\upr suppressing the ANSI twin so pairs emit once); namespace-
prefixed OOXML workbooks/presentations count their declared parts;
a WAV fact chunk declaring zero frames over non-empty ADPCM data
refuses instead of reporting an empty successful decode."""
import struct

import numpy as np
import pytest


def _t():
    from dwc_dataframe_validator_spark.operators import text
    return text


def _mm():
    from dwc_dataframe_validator_spark.operators import multimodal
    return multimodal


def _pdf():
    from dwc_dataframe_validator_spark.operators import pdf
    return pdf


def test_pdf_dangling_ref_to_freed_object_is_null():
    """A conforming incremental update frees an object while other
    objects still reference it (common for deleted annotations):
    every such reference resolves to null and the document still
    extracts — only absent/out-of-range entries stay _Torn."""
    P = _pdf()
    base = P.pdf_encode(["kept page text"])
    s = base.rfind(b"startxref")
    old_xref = int(base[s + 9:].split()[0])
    # free a HIGH object number never used by the page path, then
    # reference it from the trailer-adjacent world via resolve()
    upd = (
        base
        + b"xref\n7 1\n0000000000 65535 f \n"
        + b"trailer\n<< /Size 8 /Root 1 0 R /Prev %d >>\n" % old_xref
        + b"startxref\n%d\n%%%%EOF\n" % len(base)
    )
    doc = P.PdfDoc(upd)
    assert doc.resolve(("ref", 7)) is None
    assert [doc.page_text(p) for p in doc.pages()] == [
        "kept page text"
    ]
    with pytest.raises(P._Torn):
        doc.get(99)


def test_rtf_ud_destination_emits():
    T = _t()
    # \upr pair: ANSI twin suppressed, \ud Unicode twin emitted once
    doc = (b"{\\rtf1 {\\upr{\\kw ANSI}{\\*\\ud{\\kw caf\\u233 ?}}}"
           b" tail\\par}")
    assert T.rtf_extract(doc) == (1, "caf\xe9 tail")
    # bare {\*\ud …} (no \upr wrapper): real text, emitted
    assert T.rtf_extract(b"{\\rtf1 {\\*\\ud real}x\\par}") == (
        1, "realx",
    )
    # \*\ud INSIDE a named skip destination stays skipped
    assert T.rtf_extract(
        b"{\\rtf1 {\\info{\\*\\ud hidden}}x\\par}"
    ) == (1, "x")
    # other \* destinations still skip, incl. \udXX-prefixed words
    assert T.rtf_extract(
        b"{\\rtf1 {\\*\\udtwo junk}x\\par}"
    ) == (1, "x")
    # the \upr suppression ends with its group
    assert T.rtf_extract(
        b"{\\rtf1 a{\\upr{ansi}{\\*\\ud{uni}}}b\\par}"
    ) == (1, "aunib")


def test_ooxml_namespace_prefixed_declarations():
    T = _t()
    sheets = [[["alpha", 1], ["beta", 2]], [["gamma"]]]
    want = T.xlsx_extract(T.xlsx_encode(sheets))
    assert want is not None and want[0] == 2
    # namespace-prefixed workbook: same sheets, same extraction
    got = T.xlsx_extract(T.xlsx_encode(sheets, wb_ns_prefix="x:"))
    assert got == want
    slides = [["hello world", "second para"], ["slide two"]]
    wantp = T.pptx_extract(T.pptx_encode(slides))
    assert wantp is not None and wantp[0] == 2
    # presentationML with no prefix binding counts identically
    assert T.pptx_extract(
        T.pptx_encode(slides, sldid_prefix="")
    ) == wantp
    # a REAL count mismatch still refuses under either spelling
    bad = T.xlsx_encode(sheets, wb_ns_prefix="x:").replace(
        b"xl/worksheets/sheet2.xml", b"xl/worksheets/shee_2.xml", 2
    )
    assert T.xlsx_extract(bad) is None


def test_wav_fact_zero_over_nonempty_data_refuses():
    mm = _mm()
    n = 2525
    x = (
        np.cumsum(np.arange(n, dtype=np.int64) * 13 % 97 - 48)
        * 7 % 28000 - 14000
    ).astype(np.int16).reshape(-1, 1)
    blob = bytearray(mm.wav_adpcm_encode(8000, x, 256))
    FACT_OFF = 12 + 8 + 20 + 8
    assert struct.unpack_from("<I", blob, FACT_OFF)[0] > 0
    struct.pack_into("<I", blob, FACT_OFF, 0)
    assert mm.wav_decode_samples(bytes(blob)) is None


def test_tiff_extended_geometries():
    """Beyond-fixture TIFF shapes: non-square images whose dims are
    NOT multiples of the tile size, planar+tiled combined, deflate
    tiles, 4-bit palettes (hand-built), and refusals for short
    ColorMaps and out-of-range nibble indices."""
    import numpy as np

    mm = _mm()
    y, x = np.mgrid[0:23, 0:37]
    rgb = np.stack(
        [(y * 7 + x) % 256, (x * 5) % 256, (y * 11 + 3 * x) % 256],
        axis=2,
    ).astype(np.uint8)
    for kw in (
        dict(tile=8, compression="lzw", predictor=True),
        dict(tile=16, compression="deflate"),
        dict(tile=7, compression="packbits"),
        dict(tile=8, compression="none", planar=True),
        dict(planar=True, compression="deflate", predictor=True,
             rows_per_strip=3),
        dict(jpeg=True),
        dict(jpeg=True, jpeg_tables=True),
    ):
        dec = mm.tiff_decode_pixels(mm.tiff_encode(rgb, **kw))
        if kw.get("jpeg"):
            want = mm.jpeg_decode_pixels(mm.jpeg_encode(rgb))
        else:
            want = rgb
        assert dec is not None and (dec == want).all(), kw
    # 4-bit palette, hand-built strip TIFF (odd width exercises the
    # nibble row padding)
    idx = (y + x)[:5, :7] % 3  # 5×7, 3 colors
    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255)]
    rows = []
    for r in range(5):
        nibs = list(idx[r]) + ([0] if 7 % 2 else [])
        rows.append(bytes(
            (nibs[i] << 4) | nibs[i + 1]
            for i in range(0, len(nibs), 2)
        ))
    data = b"".join(rows)
    cmap = []
    for ch in range(3):
        chan = [pal[v][ch] * 257 for v in range(3)] + [0] * 13
        cmap.extend(chan)

    def build(cmap_vals, payload):
        entries = [
            (256, 4, [7]), (257, 4, [5]), (258, 3, [4]),
            (259, 3, [1]), (262, 3, [3]), (273, 4, [0]),
            (277, 3, [1]), (278, 4, [5]), (279, 4, [len(payload)]),
            (320, 3, cmap_vals),
        ]
        pos = 8 + 2 + 12 * len(entries) + 4
        slots = []
        for _t, typ, vals in entries:
            total = {3: 2, 4: 4}[typ] * len(vals)
            slots.append(pos if total > 4 else None)
            pos += total if total > 4 else 0
        data_off = pos
        body = b""
        over = b""
        for i, (tag, typ, vals) in enumerate(entries):
            if tag == 273:
                vals = [data_off]
            sz = {3: 2, 4: 4}[typ]
            packed = b"".join(
                v.to_bytes(sz, "little") for v in vals
            )
            body += tag.to_bytes(2, "little")
            body += typ.to_bytes(2, "little")
            body += len(vals).to_bytes(4, "little")
            if len(packed) <= 4:
                body += packed + bytes(4 - len(packed))
            else:
                body += slots[i].to_bytes(4, "little")
                over += packed
        return (
            b"II*\x00" + (8).to_bytes(4, "little")
            + len(entries).to_bytes(2, "little") + body
            + bytes(4) + over + payload
        )

    good = build(cmap, data)
    dec = mm.tiff_decode_pixels(good)
    want = np.array(pal, np.uint8)[idx]
    assert dec is not None and (dec == want).all()
    # a ColorMap of the wrong size is torn, not guessed
    assert mm.tiff_decode_pixels(build(cmap[:-3], data)) is None
