"""XLSX/PPTX office-text tier: extraction is the IDENTITY on the
fixture writer's cell/paragraph text; shared-string and inlineStr
encodings extract identically (like DOCX split runs); workbook- and
presentation-declared part counts are enforced; CRC-caught byte rot
and renamed parts flag; byte flips never raise; the operator faces
flag plants without task failures."""
import pytest


def _t():
    from dwc_dataframe_validator_spark.operators import text
    return text


def test_xlsx_extract_identity_and_plants():
    T = _t()
    for did in range(32):
        blob = T.build_xlsx_blob(did)
        got = T.xlsx_extract(blob)
        if did % 17 == 0 or did % 13 == 0:
            assert got is None, did
            continue
        cls = did % 4
        n_sheets, n_rows = 1 + cls % 2, 3 + cls
        ns, nc, txt = got
        assert (ns, nc) == (n_sheets, n_sheets * n_rows * 3), did
        want = "\n".join(
            "word%d\t%d\tcell r%d & <x>" % ((r * 7 + s) % 5,
                                            r * 13 + s, r)
            for s in range(n_sheets) for r in range(n_rows)
        )
        assert txt == want, did
    # shared-string vs inlineStr encodings: identical extraction
    for cls in range(4):
        # ids cls+8 (shared variant) vs cls+4 (inline variant),
        # both outside the %17/%13 plant classes
        assert (
            T.xlsx_extract(T.build_xlsx_blob(cls + 8))
            == T.xlsx_extract(T.build_xlsx_blob(cls + 4))
        ), cls
    # out-of-range shared index refuses (no guessing) — built with a
    # VALID zip (CRC fine) so the refusal is the index check itself
    from dwc_dataframe_validator_spark.sources.zip import zip_encode

    def wb(n):
        return (
            '<?xml version="1.0"?><workbook><sheets>%s</sheets>'
            "</workbook>" % "".join(
                '<sheet name="S%d" sheetId="%d" r:id="rId%d"/>'
                % (k, k, k) for k in range(1, n + 1)
            )
        ).encode()

    bad_idx = zip_encode([
        ("[Content_Types].xml", b"<Types/>"),
        ("xl/workbook.xml", wb(1)),
        ("xl/sharedStrings.xml",
         b'<sst count="1" uniqueCount="1"><si><t>only</t></si></sst>'),
        ("xl/worksheets/sheet1.xml",
         b'<worksheet><sheetData><row r="1">'
         b'<c r="A1" t="s"><v>9</v></c>'
         b"</row></sheetData></worksheet>"),
    ])
    assert T.xlsx_extract(bad_idx) is None
    # declared-count enforcement: declared 2 sheets, only 1 present
    short = zip_encode([
        ("[Content_Types].xml", b"<Types/>"),
        ("xl/workbook.xml", wb(2)),
        ("xl/worksheets/sheet1.xml",
         b'<worksheet><sheetData><row r="1">'
         b'<c r="A1"><v>7</v></c></row></sheetData></worksheet>'),
    ])
    assert T.xlsx_extract(short) is None
    # and the in-range sibling of the bad-index doc extracts
    good = zip_encode([
        ("[Content_Types].xml", b"<Types/>"),
        ("xl/workbook.xml", wb(1)),
        ("xl/sharedStrings.xml",
         b'<sst count="1" uniqueCount="1"><si><t>only</t></si></sst>'),
        ("xl/worksheets/sheet1.xml",
         b'<worksheet><sheetData><row r="1">'
         b'<c r="A1" t="s"><v>0</v></c>'
         b"</row></sheetData></worksheet>"),
    ])
    assert T.xlsx_extract(good) == (1, 1, "only")


def test_pptx_extract_identity_and_plants():
    T = _t()
    for did in range(32):
        got = T.pptx_extract(T.build_pptx_blob(did))
        if did % 17 == 0 or did % 13 == 0:
            assert got is None, did
            continue
        cls = did % 4
        ns, txt = got
        assert ns == 1 + cls, did
        lines = []
        for s in range(1 + cls):
            for k in range(2 + s % 2):
                p = "slide %d para %d of class %d" % (s, k, cls)
                if s == 0 and k == 0:
                    p += " & specials < >"
                lines.append(p)
        assert txt == "\n".join(lines), did
    for cls in range(4):
        assert (
            T.pptx_extract(T.build_pptx_blob(cls + 8))
            == T.pptx_extract(T.build_pptx_blob(cls + 4))
        ), cls


def test_office_fuzz_never_raises():
    T = _t()
    xb = T.build_xlsx_blob(2)
    pb = T.build_pptx_blob(2)
    for j in range(0, len(xb), 7):
        T.xlsx_extract(xb[:j] + bytes([xb[j] ^ 0xFF]) + xb[j + 1:])
        T.xlsx_extract(xb[:j])
    for j in range(0, len(pb), 7):
        T.pptx_extract(pb[:j] + bytes([pb[j] ^ 0xFF]) + pb[j + 1:])
        T.pptx_extract(pb[:j])
    assert T.xlsx_extract(b"not a zip") is None
    assert T.pptx_extract(b"") is None


def test_office_operator_faces(spark):
    T = _t()
    docs = spark.createDataFrame([(d,) for d in range(40)],
                                 "doc_id long")
    xr = {r["id"]: r for r in T.xlsx_text(T.attach_xlsx_blob(docs))
          .collect()}
    pr = {r["id"]: r for r in T.pptx_text(T.attach_pptx_blob(docs))
          .collect()}
    assert set(xr) == set(pr) == set(range(40))
    for d in range(40):
        bad = d % 17 == 0 or d % 13 == 0
        assert xr[d]["ok"] != bad, d
        assert pr[d]["ok"] != bad, d
        if not bad:
            assert xr[d]["n_chars"] == len(xr[d]["text"]), d
            assert pr[d]["n_chars"] == len(pr[d]["text"]), d
            # same class ⇒ same text across encodings and doc ids
            twin = (d % 4) + 4 if d % 4 + 4 < 40 else None
            if twin is not None and pr[twin]["ok"]:
                assert pr[d]["text"] == pr[twin]["text"], d
