"""ODF (ODT/ODS/ODP) and mbox tier pins: fixture round-trips, the
ODF whitespace spellings, spreadsheet repeat expansion + padding
trim + bomb refusal, mboxrd quoting edges, honest tears under
fuzz."""


def _t():
    from dwc_dataframe_validator_spark.operators import text
    return text


def test_odf_fixture_roundtrip():
    T = _t()
    for did in range(48):
        got = T.odf_extract(T.build_odf_blob(did))
        if did % 17 == 0 or did % 13 == 0:
            assert got is None, did
            continue
        kind = ("odt", "ods", "odp")[did % 3]
        cls = (did // 3) % 4
        k, nu, t = got
        assert k == kind, did
        if kind == "odt":
            assert nu == 2 + cls and t.count("\n") == nu - 1
            assert "\ttab  two spaces" in t  # tab + <text:s c=2>
            assert "café & <t>" in t         # entities decode
        elif kind == "ods":
            assert nu == 1 + cls % 2
            assert t.splitlines()[0] == "w0\t0\tc&<0>"
        else:
            assert nu == 2 + cls % 3
            assert t.splitlines()[0] == "odp page 0 line 0"


def test_odf_spreadsheet_repeats_and_trim():
    T = _t()
    # repeated cells expand; trailing empty cells and rows trim
    xml = (
        '<table:table table:name="S">'
        "<table:table-row>"
        '<table:table-cell table:number-columns-repeated="3">'
        "<text:p>x</text:p></table:table-cell>"
        '<table:table-cell table:number-columns-repeated="16384"/>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="2">'
        "<table:table-cell><text:p>y</text:p></table:table-cell>"
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="1000"/>'
        "</table:table>"
    )
    got = T._ods_sheet_text(xml)
    assert got == "x\tx\tx\ny\ny"
    # expansion past the guard refuses (a bomb, not a grid)
    bomb = (
        '<table:table-row table:number-rows-repeated="999999">'
        "<table:table-cell><text:p>z</text:p></table:table-cell>"
        "</table:table-row>"
    )
    assert T._ods_sheet_text(bomb) is None
    # covered cells hold grid position as empties
    merged = (
        "<table:table-row>"
        "<table:table-cell><text:p>a</text:p></table:table-cell>"
        "<table:covered-table-cell/>"
        "<table:table-cell><text:p>b</text:p></table:table-cell>"
        "</table:table-row>"
    )
    assert T._ods_sheet_text(merged) == "a\t\tb"


def test_odf_whitespace_spellings():
    T = _t()
    assert T._odf_flat_text(
        'a<text:tab/>b<text:line-break/>c<text:s/>d'
        '<text:s text:c="3"/>e&amp;'
    ) == "a\tb\nc d   e&"
    # encoder writes the same spellings back
    assert "text:s text:c=\"2\"" in T._odf_esc("a  b")
    assert T.odf_extract(
        T.odf_encode("odt", ["a\tb\nc  d"])
    ) == ("odt", 1, "a\tb\nc  d")


def test_odf_refusals():
    T = _t()
    # unknown mimetype refuses
    blob = T.odf_encode("odt", ["x"]).replace(
        b"opendocument.text", b"opendocument.tex_", 1
    )
    assert T.odf_extract(blob) is None
    # empty spreadsheets/presentations refuse (no table / no page)
    assert T.odf_extract(T.odf_encode("ods", [])) is None
    assert T.odf_extract(T.odf_encode("odp", [])) is None
    assert T.odf_extract(b"PK\x03\x04 not odf") is None


def test_mbox_fixture_and_quoting():
    T = _t()
    for did in range(36):
        got = T.mbox_extract(T.build_mbox_blob(did))
        if did % 17 == 0 or did % 13 == 0:
            assert got is None, did
            continue
        nm, t = got
        assert nm == 1 + did % 3, did
        # the quoting round-trip is load-bearing: every message body
        # begins with a bare "From " line after unquoting
        for seg in t.split("\n\n"):
            assert "] From the top line " in seg, did
    # mboxrd: one ">" strips per level, deeper levels survive
    m = T.eml_encode("s", "a@b", "From x\n>From y\n>>From z", "7bit")
    nm, t = T.mbox_extract(T.mbox_encode([m]))
    assert nm == 1 and t == "[s] From x\n>From y\n>>From z"
    # not a mailbox
    assert T.mbox_extract(b"Subject: hi\n\nbody") is None
    # one torn message flags the whole mailbox
    good = T.eml_encode("s1", "a@b", "fine body", "base64")
    bad = good.replace(b"\r\n\r\n", b"\r\n\r\n*", 1)
    assert T.mbox_extract(T.mbox_encode([good])) is not None
    assert T.mbox_extract(T.mbox_encode([good, bad])) is None


def test_odf_mbox_fuzz(spark):
    T = _t()
    ob = T.build_odf_blob(1)
    mb = T.build_mbox_blob(1)
    for j in range(0, len(ob), 11):
        T.odf_extract(ob[:j] + bytes([ob[j] ^ 0xFF]) + ob[j + 1:])
        T.odf_extract(ob[:j])
    for j in range(0, len(mb), 11):
        T.mbox_extract(mb[:j] + bytes([mb[j] ^ 0xFF]) + mb[j + 1:])
        T.mbox_extract(mb[:j])
    docs = spark.createDataFrame([(d,) for d in range(24)],
                                 "doc_id long")
    orows = {r["id"]: r for r in
             T.odf_text(T.attach_odf_blob(docs)).collect()}
    mrows = {r["id"]: r for r in
             T.mbox_text(T.attach_mbox_blob(docs)).collect()}
    for d in range(24):
        bad = d % 17 == 0 or d % 13 == 0
        assert orows[d]["ok"] != bad or not bad
        assert orows[d]["ok"] == (not bad)
        assert mrows[d]["ok"] == (not bad)
        if not bad:
            assert orows[d]["n_chars"] == len(orows[d]["text"])
            assert mrows[d]["n_messages"] == 1 + d % 3
