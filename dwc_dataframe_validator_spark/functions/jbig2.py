"""ITU-T T.88 (JBIG2) — the embedded-stream subset PDF
``/JBIG2Decode`` carries: GENERIC REGIONS, both codings.

Scope (the scanned-document mass a crawl meets):

- the MQ arithmetic coder (Annex E, software conventions) — decoder
  AND encoder twin, both pinned against the spec's own Annex H.2
  test sequence (the published 256-bit input and its 30-byte coded
  form — the same role the FIPS-197 KATs play for the AES tier);
- the generic-region decoding procedure (§6.2.5.7) for GBTEMPLATE
  0-3 with per-segment AT pixels and TPGDON typical-prediction rows
  (SLTP contexts 0x9B25/0x0795/0x00E5/0x0195);
- MMR-coded generic regions (§6.2.6) through the T.6 walk already
  in ``functions/ccitt.py`` (``g4_decode``);
- the embedded segment format (§7.2): segment headers with short and
  long referred-to forms, page-information segments, immediate(-
  lossless) generic regions composed onto the page with the external
  combination operators, optional ``/JBIG2Globals`` prepended.

Out of scope — an honest ``NotImplementedError`` flag, never a
guessed bitmap: symbol/text regions, halftones, refinement coding,
unknown-length segments.  The reference
(djtfmartin/dwc-dataframe-validator) has no media decode at all;
this tier belongs to the repo's beyond-reference multimodal surface.

The context bit layouts (templates 0-3) cannot be cross-validated
in-container (no external JBIG2 codec ships here); the MQ coder's
H.2 KAT is the external pin, and the layouts round-trip against the
encoder twin whose own MQ side is KAT-pinned too.

Throughput boundary: the MQ loop is pure Python (one DECODE per
pixel) — fine for the fixture scale and the honest-flag crawl path;
a production bulk path would sit behind the same Arrow batches as
the rest of the PDF tier.
"""
from __future__ import annotations

# ---- Annex E state table: (Qe, NMPS, NLPS, SWITCH) -------------------
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """Annex E.3 decoder (software conventions).  Contexts live in a
    caller-owned dict cx -> [I, MPS] so region procedures share one
    coder across context sets.  Reads past the end of ``data`` feed
    0xFF (the spec's marker-terminated convention)."""

    __slots__ = ("d", "bp", "c", "a", "ct", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        self.bp = 0
        b0 = data[0] if self.n else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.d[i] if i < self.n else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, st: list) -> int:
        """One decision for context state ``st`` = [I, MPS]."""
        i, mps = st
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps
                st[0] = nmps
            else:
                d = 1 - mps
                if switch:
                    st[1] = 1 - mps
                st[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if switch:
                    st[1] = 1 - mps
                st[0] = nlps
            else:
                d = mps
                st[0] = nmps
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """Annex E.3 encoder twin (INITENC/CODEMPS/CODELPS/BYTEOUT/
    FLUSH, software conventions verbatim — ``out[0]`` is the spec's
    scratch byte at BPST-1, stripped on flush), used by the fixture
    writer and pinned against the H.2 KAT."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(1)  # B at BP = BPST - 1

    def encode(self, st: list, bit: int) -> None:
        i, mps = st
        qe, nmps, nlps, switch = _QE[i]
        if bit == mps:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            st[0] = nmps
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                st[1] = 1 - mps
            st[0] = nlps
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        # the spec's C carries an implicit byte truncation on the
        # B = C >> 19 stores; mask explicitly here
        out = self.out
        if out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            out[-1] += 1  # carry (never past one byte: a 0xFF
            #               predecessor takes the stuffed path)
            if out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def flush(self) -> bytes:
        # SETBITS (Figure E.11): saturate the low 16 bits inside the
        # final interval, then drain C and close with the 0xFF 0xAC
        # terminator the decoder's BYTEIN convention expects
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.out += b"\xff\xac"
        return bytes(self.out[1:])


# ---- generic region (§6.2.5.7) ---------------------------------------

#: nominal AT pixels per template (the encoder twin's choice)
_NOMINAL_AT = {
    0: ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}

#: TPGDON SLTP context per template (§6.2.5.7)
_SLTP_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _template_pixels(template: int, at: tuple) -> tuple:
    """(dx, dy, shift) triples matching the spec's context layout
    (the bit-position assignment used by every conformant coder)."""
    if template == 0:
        a1, a2, a3, a4 = at
        spec = (
            (-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
            (a1[0], a1[1], 4),
            (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8),
            (-2, -1, 9), (a2[0], a2[1], 10), (a3[0], a3[1], 11),
            (1, -2, 12), (0, -2, 13), (-1, -2, 14),
            (a4[0], a4[1], 15),
        )
    elif template == 1:
        a1 = at[0]
        spec = (
            (-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
            (a1[0], a1[1], 3),
            (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7),
            (-2, -1, 8),
            (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12),
        )
    elif template == 2:
        a1 = at[0]
        spec = (
            (-1, 0, 0), (-2, 0, 1),
            (a1[0], a1[1], 2),
            (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
            (1, -2, 7), (0, -2, 8), (-1, -2, 9),
        )
    elif template == 3:
        a1 = at[0]
        spec = (
            (-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
            (a1[0], a1[1], 4),
            (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
            (-3, -1, 9),
        )
    else:
        raise NotImplementedError("GBTEMPLATE %d" % template)
    return spec


def _generic_decode(
    data: bytes, w: int, h: int, template: int, at: tuple,
    tpgdon: bool,
):
    """MQ-coded generic region -> (h, w) uint8 0/1, or None when the
    parameters are degenerate."""
    import numpy as np

    if w <= 0 or h <= 0 or w * h > 16_000_000:
        return None
    spec = _template_pixels(template, at)
    bmp = np.zeros((h, w), np.uint8)
    dec = MQDecoder(data)
    cx: dict = {}

    def st(label: int) -> list:
        s = cx.get(label)
        if s is None:
            s = [0, 0]
            cx[label] = s
        return s

    get = bmp.item
    ltp = 0
    sltp_ctx = _SLTP_CTX[template]
    for y in range(h):
        if tpgdon:
            ltp ^= dec.decode(st(sltp_ctx))
            if ltp:
                if y:
                    bmp[y] = bmp[y - 1]
                continue
        row = bmp[y]
        for x in range(w):
            ctx = 0
            for dx, dy, shift in spec:
                xx = x + dx
                yy = y + dy
                if 0 <= xx < w and 0 <= yy < h and (
                    yy < y or (yy == y and xx < x)
                ):
                    if get(yy, xx):
                        ctx |= 1 << shift
            row[x] = dec.decode(st(ctx))
    return bmp


def _generic_encode(
    arr, template: int = 0, tpgdon: bool = False,
) -> bytes:
    """Encoder twin of ``_generic_decode`` with the nominal AT
    pixels (fixture writer + round-trip tests)."""
    import numpy as np

    arr = np.asarray(arr)
    h, w = arr.shape
    at = _NOMINAL_AT[template]
    spec = _template_pixels(template, at)
    enc = MQEncoder()
    cx: dict = {}

    def st(label: int) -> list:
        s = cx.get(label)
        if s is None:
            s = [0, 0]
            cx[label] = s
        return s

    get = arr.item
    ltp = 0
    sltp_ctx = _SLTP_CTX[template]
    for y in range(h):
        if tpgdon:
            same = bool(y) and bool((arr[y] == arr[y - 1]).all())
            sltp = 1 if same != bool(ltp) else 0
            enc.encode(st(sltp_ctx), sltp)
            ltp ^= sltp
            if ltp:
                continue
        for x in range(w):
            ctx = 0
            for dx, dy, shift in spec:
                xx = x + dx
                yy = y + dy
                if 0 <= xx < w and 0 <= yy < h and (
                    yy < y or (yy == y and xx < x)
                ):
                    if get(yy, xx):
                        ctx |= 1 << shift
            enc.encode(st(ctx), 1 if get(y, x) else 0)
    return enc.flush()


# ---- embedded segment stream (§7.2) ----------------------------------

_GENERIC_TYPES = (36, 38, 39)
_UNSUPPORTED_REGIONS = (
    4, 6, 7,        # text regions
    20, 22, 23,     # halftone regions
    40, 42, 43,     # refinement regions
)


def _u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "big")


def _parse_segments(b: bytes):
    """Yield (type, page, payload) for each segment header."""
    i = 0
    n = len(b)
    while i < n:
        if i + 11 > n:
            raise ValueError("torn segment header")
        segnum = _u32(b, i)
        flags = b[i + 4]
        stype = flags & 0x3F
        i += 5
        rts = b[i]
        count = rts >> 5
        if count == 7:
            count = _u32(b, i) & 0x1FFFFFFF
            i += 4 + (count + 8) // 8  # long form + retain bits
        else:
            i += 1
        ref_size = 1 if segnum <= 256 else (
            2 if segnum <= 65536 else 4
        )
        i += count * ref_size
        if flags & 0x40:
            page = _u32(b, i)
            i += 4
        else:
            page = b[i]
            i += 1
        length = _u32(b, i)
        i += 4
        if length == 0xFFFFFFFF:
            raise NotImplementedError("jbig2 unknown-length segment")
        if i + length > n:
            raise ValueError("torn segment payload")
        yield stype, page, b[i:i + length]
        i += length


def decode_embedded(
    data: bytes, globals_data: bytes = b"",
    fallback_size: tuple = None,
):
    """PDF ``/JBIG2Decode`` embedded stream (+ optional
    ``/JBIG2Globals``) -> (h, w) bool, True = black (JBIG2 sample 1).
    Generic regions only; any symbol/halftone/refinement segment
    raises ``NotImplementedError`` (the caller's honest stub), torn
    headers raise ``ValueError``.  A page whose height is unknown
    (0xFFFFFFFF striping) takes ``fallback_size`` = (h, w) from the
    PDF image dictionary."""
    import numpy as np

    page = None
    page_default = 0
    for stype, _pg, payload in list(
        _parse_segments(globals_data)
    ) + list(_parse_segments(data)):
        if stype == 48:  # page information
            if len(payload) < 19:
                raise ValueError("short page info")
            pw, ph = _u32(payload, 0), _u32(payload, 4)
            pflags = payload[16]
            page_default = (pflags >> 2) & 1
            if ph == 0xFFFFFFFF:
                if fallback_size is None:
                    raise NotImplementedError("jbig2 unknown height")
                ph = fallback_size[0]
            if pw <= 0 or ph <= 0 or pw * ph > 16_000_000:
                raise ValueError("page size")
            page = np.full((ph, pw), page_default, np.uint8)
        elif stype in _GENERIC_TYPES:
            if len(payload) < 18:
                raise ValueError("short region segment")
            rw, rh = _u32(payload, 0), _u32(payload, 4)
            rx, ry = _u32(payload, 8), _u32(payload, 12)
            comb = payload[16] & 7
            gflags = payload[17]
            mmr = gflags & 1
            template = (gflags >> 1) & 3
            tpgdon = (gflags >> 3) & 1
            if (gflags >> 4) & 1:
                raise NotImplementedError("jbig2 EXTTEMPLATE")
            j = 18
            if mmr:
                at = ()
            else:
                n_at = 4 if template == 0 else 1
                at = tuple(
                    (int.from_bytes(payload[j + 2 * k:j + 2 * k + 1],
                                    "big", signed=True),
                     int.from_bytes(payload[j + 2 * k + 1:
                                            j + 2 * k + 2],
                                    "big", signed=True))
                    for k in range(n_at)
                )
                j += 2 * n_at
            if rw <= 0 or rh <= 0 or rw * rh > 16_000_000:
                raise ValueError("region size")
            if mmr:
                from .ccitt import g4_decode

                bits = g4_decode(bytes(payload[j:]), rw, rh)
                if bits is None:
                    raise ValueError("mmr region torn")
                region = bits.astype(np.uint8)
            else:
                region = _generic_decode(
                    bytes(payload[j:]), rw, rh, template, at,
                    bool(tpgdon),
                )
                if region is None:
                    raise ValueError("generic region degenerate")
            if page is None:
                # PDF streams may omit the page info segment; size
                # the page from the dict
                if fallback_size is None:
                    raise NotImplementedError("jbig2 no page info")
                page = np.zeros(fallback_size, np.uint8)
            ph, pw = page.shape
            if rx + rw > pw or ry + rh > ph:
                raise ValueError("region outside page")
            tgt = page[ry:ry + rh, rx:rx + rw]
            if comb == 0:
                tgt |= region
            elif comb == 1:
                tgt &= region
            elif comb == 2:
                tgt ^= region
            elif comb == 3:
                tgt ^= region ^ 1
            elif comb == 4:
                tgt[:] = region
            else:
                raise ValueError("combination operator")
        elif stype in _UNSUPPORTED_REGIONS or stype in (0, 16):
            # symbol dicts / pattern dicts / their regions
            raise NotImplementedError("jbig2 region type %d" % stype)
        elif stype in (49, 50, 51, 62):
            continue  # end-of-page/stripe/file, extensions
        else:
            raise NotImplementedError("jbig2 segment type %d" % stype)
    if page is None:
        raise ValueError("no page produced")
    return page.astype(bool)


# ---- fixture writer ---------------------------------------------------

def _segment(segnum: int, stype: int, page: int,
             payload: bytes) -> bytes:
    head = segnum.to_bytes(4, "big")
    head += bytes([stype & 0x3F])          # short page assoc
    head += b"\x00"                        # 0 referred-to segments
    head += bytes([page])
    head += len(payload).to_bytes(4, "big")
    return head + payload


def encode_embedded(
    arr, template: int = 0, tpgdon: bool = False, mmr: bool = False,
    comb: int = 0, with_page_info: bool = True,
) -> bytes:
    """Embedded-stream fixture twin: page info + one immediate
    generic region carrying ``arr`` (bool, True = black)."""
    import numpy as np

    arr = np.asarray(arr).astype(np.uint8)
    h, w = arr.shape
    out = b""
    seg = 0
    if with_page_info:
        pinfo = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes(8)                     # x/y resolution unknown
            + b"\x01"                      # flags: lossless bit
            + bytes(2)                     # no striping
        )
        out += _segment(seg, 48, 1, pinfo)
        seg += 1
    rinfo = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes(8)                         # region at (0, 0)
        + bytes([comb & 7])
    )
    if mmr:
        from .ccitt import g4_encode

        gflags = bytes([1])
        body = b"" + g4_encode(arr.astype(bool))
        at_bytes = b""
    else:
        gflags = bytes([(template << 1) | (8 if tpgdon else 0)])
        at = _NOMINAL_AT[template]
        at_bytes = b"".join(
            int(a).to_bytes(1, "big", signed=True)
            + int(b).to_bytes(1, "big", signed=True)
            for a, b in at
        )
        body = _generic_encode(arr, template, tpgdon)
    out += _segment(seg, 38, 1, rinfo + gflags + at_bytes + body)
    seg += 1
    out += _segment(seg, 49, 1, b"")       # end of page
    return out
