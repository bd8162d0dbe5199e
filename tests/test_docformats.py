"""EPUB and RTF text tiers: spine-ordered chapter extraction over the
zip source (archive order must NOT matter), head/script/style blocks
dropped; RTF control-word walk with destination skipping, cp1252 hex
and \\uN unicode escapes (identical text), \\uc fallback accounting,
\\bin skips; honest Nones for torn archives, missing parts,
unbalanced groups and undecodable bytes; fuzz never raises."""
import pytest


def _t():
    from dwc_dataframe_validator_spark.operators import text
    return text


def test_epub_spine_extraction():
    T = _t()
    for did in range(24):
        got = T.epub_extract(T.build_epub_blob(did))
        if did % 17 == 0 or did % 13 == 0:
            assert got is None, did
            continue
        cls = did % 4
        nc, txt = got
        assert nc == 2 + cls, did
        want = []
        for k in range(2 + cls):
            t = ("chapter %d of class %d with book words "
                 "second line %d" % (k, cls, k))
            if k == 0:
                t += " errata & updates < >"
            want.append(t)
        assert txt == "\n".join(want), did
    # zip order reversed, spine order wins
    assert (
        T.epub_extract(T.build_epub_blob(1))
        == T.epub_extract(T.build_epub_blob(5))
    )
    # spine referencing a missing chapter refuses
    blob = T.build_epub_blob(1).replace(
        b"OEBPS/chap0.xhtml", b"OEBPS/chap9.xhtml", 2
    )
    assert T.epub_extract(blob) is None
    assert T.epub_extract(b"PK\x03\x04 not an epub") is None


def test_rtf_extraction():
    T = _t()
    for did in range(32):
        got = T.rtf_extract(T.build_rtf_blob(did))
        if did % 17 == 0 or did % 13 == 0:
            assert got is None, did
            continue
        cls = did % 4
        np_, txt = got
        want = []
        for k in range(2 + cls):
            t = "class %d paragraph %d with café words" % (cls, k)
            if k == 0:
                t += "\tafter tab {braces} \\ and ünïcode"
            want.append(t)
        assert (np_, txt) == (2 + cls, "\n".join(want)), did
    # hex-escape and unicode-escape encodings extract identically
    assert (
        T.rtf_extract(T.build_rtf_blob(1))
        == T.rtf_extract(T.build_rtf_blob(5))
    )
    # \bin skip, \uc fallback accounting, {\*...} skip destinations
    doc = (b"{\\rtf1 a\\bin3 xyzb\\uc2\\u233 AB c\\uc1 "
           b"{\\*\\weird junk}done\\par}")
    assert T.rtf_extract(doc) == (1, "ab\xe9 cdone")
    # negative \u wraps into the BMP
    assert T.rtf_extract(b"{\\rtf1\\uc0\\u-1234 x\\par}") == (
        1, chr(65536 - 1234) + "x",
    )
    assert T.rtf_extract(b"not rtf") is None
    assert T.rtf_extract(b"{\\rtf1 unbalanced") is None


def test_docformat_fuzz_and_faces(spark):
    T = _t()
    eb = T.build_epub_blob(2)
    rb = T.build_rtf_blob(2)
    for j in range(0, len(eb), 7):
        T.epub_extract(eb[:j] + bytes([eb[j] ^ 0xFF]) + eb[j + 1:])
        T.epub_extract(eb[:j])
    for j in range(0, len(rb), 3):
        T.rtf_extract(rb[:j] + bytes([rb[j] ^ 0xFF]) + rb[j + 1:])
        T.rtf_extract(rb[:j])
    docs = spark.createDataFrame([(d,) for d in range(36)],
                                 "doc_id long")
    er = {r["id"]: r for r in T.epub_text(T.attach_epub_blob(docs))
          .collect()}
    rr = {r["id"]: r for r in T.rtf_text(T.attach_rtf_blob(docs))
          .collect()}
    for d in range(36):
        bad = d % 17 == 0 or d % 13 == 0
        assert er[d]["ok"] != bad, d
        assert rr[d]["ok"] != bad, d
        if not bad:
            assert er[d]["n_chars"] == len(er[d]["text"]), d
            assert rr[d]["n_chars"] == len(rr[d]["text"]), d


def test_eml_extraction():
    """MIME mail: all five packagings (7bit/base64/qp/html/alt) of a
    class extract the same text (html collapses the newline);
    multipart/alternative prefers text/plain over the html rendering;
    RFC 2047 subjects decode; strict base64/charset validation flags
    corrupt bodies; fuzz never raises."""
    T = _t()
    for did in range(100):
        r = T.eml_extract(T.build_eml_blob(did))
        bad = did % 17 == 0 or did % 13 == 0
        assert (r is None) == bad, did
        if bad:
            continue
        cls = did % 4
        var = (did // 4) % 5
        s, f, np_, txt = r
        assert s == "Subject line %d" % cls
        assert f == "sender%d@example.org" % cls
        assert np_ == (2 if var == 4 else 1), (did, np_)
        accent = "" if cls == 0 else " caf\xe9 r\xe9sum\xe9"
        want = (
            "mail body class %d line one%s\nsecond line %d"
            % (cls, accent, cls)
        )
        if var == 3:
            want = want.replace("\n", " ")
        assert txt == want, (did, repr(txt))
    # RFC 2047 encoded-word subject
    blob = (b"From: a@b.c\r\nSubject: =?utf-8?B?Y2Fmw6k=?=\r\n"
            b"Content-Type: text/plain\r\n\r\nhi there")
    assert T.eml_extract(blob)[0] == "caf\xe9"
    # strict base64: stdlib would silently drop the bad char
    blob = T.build_eml_blob(4)  # base64 variant, non-plant
    assert b"base64" in blob
    i = blob.rindex(b"\r\n\r\n") + 6
    assert T.eml_extract(blob[:i] + b"*" + blob[i + 1:]) is None
    for base in (1, 5, 9, 14, 18):
        b = T.build_eml_blob(base)
        for j in range(0, len(b), 5):
            T.eml_extract(b[:j] + bytes([b[j] ^ 0xFF]) + b[j + 1:])
            T.eml_extract(b[:j])
    assert T.eml_extract(b"not mail at all") is None
