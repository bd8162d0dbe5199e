"""ITU-T T.88 (JBIG2) — the embedded-stream subset PDF
``/JBIG2Decode`` carries: generic regions (both codings) AND the
arithmetic symbol-dictionary / text-region tier that dominates real
scanned documents.

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
- arithmetic integer decoding (Annex A: the IAx 512-state trees and
  the Table A.1 buckets, OOB included) with encoder twins;
- SYMBOL DICTIONARIES (§6.5, arithmetic): height classes via
  IADH/IADW, per-symbol generic-region bitmaps through ONE shared
  coder + GB context, IAEX export runs over input+new symbols;
- TEXT REGIONS (§6.4, arithmetic): strip decoding via
  IADT/IAFS/IADS/IAIT, IAID symbol codes, all four REFCORNERs,
  TRANSPOSED, SBDSOFFSET, SBSTRIPS 1-8, the SBCOMBOP composition
  ops, symbols gathered from referred-to dictionary segments;
- REFINEMENT coding (§6.3): GRTEMPLATE 0 (two AT pixels) and 1,
  TPGRON typical-prediction rows, as single-symbol SDREFAGG
  aggregates in dictionaries and per-instance REFINE in text
  regions (RDW/RDH resizing with the floor-halved offset rule);
- MULTI-SYMBOL aggregates (§6.5.8.2.2, REFAGGNINST > 1): the symbol
  decodes as a text region over the partial pool through the
  dictionary segment's shared coder and ONE persistent text-context
  set (also used by the single-refinement shortcut);
- the embedded segment format (§7.2): segment headers with short and
  long referred-to forms, page-information segments, immediate
  regions composed onto the page with the external combination
  operators, optional ``/JBIG2Globals`` prepended.

Since round 19 the Huffman variants decode through
``jbig2_huff.py`` (SDHUFF symbol dictionaries complete with the
structurally-verified standard tables B.1–B.5 and MMR/raw
height-class collective bitmaps; SBHUFF text regions with custom
type-53 tables; runcode symbol-ID codes) — see that module's
docstring for the B.6–B.15 / SDREFAGG-Huffman honest-flag
boundary.

Out of scope — an honest ``NotImplementedError`` flag, never a
guessed bitmap:

- HALFTONE regions and pattern dictionaries (types 16/20/22/23) —
  ADJUDICATED (r19, the JPX precedent).  The machinery they need
  (generic-region decode for the pattern dictionary's collective
  bitmap and for each gray-code bitplane) already exists here, but
  the halftone GRID placement is a 16.8 fixed-point formula
  (§6.6.5: per-cell x/y from HGX/HGY with the HRX/HRY vector,
  including the sign-extension and >>8 rounding corners) whose
  exact constants cannot be re-derived or cross-checked in this
  offline container — and a mis-rounded grid composites every
  pattern at subtly wrong positions: plausible-but-wrong pixels,
  the exact failure mode this module's contract forbids.  Recall
  statement: halftone coding targets dithered continuous-tone
  content inside bilevel scans (rare in text documents — the
  dominant JBIG2 mass is generic + symbol/text, both decoded
  here); a crawl hitting material halftone mass would warrant
  transcribing the grid formula from a spec copy (data entry into
  the existing machinery), never guessing it.
- unknown-length segments (0xFFFFFFFF data length).

The reference
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


#: nominal-AT fast-path geometry: (current-row register bits,
#: ((dy, x0, bit_base, n) contiguous reference windows: bit base+k =
#: pixel(x + x0 - k, y + dy)))
_FAST_GEOM = {
    0: (4, ((-1, 3, 4, 7), (-2, 2, 11, 5))),
    1: (3, ((-1, 3, 3, 6), (-2, 2, 9, 4))),
    2: (2, ((-1, 2, 2, 5), (-2, 1, 7, 3))),
    3: (4, ((-1, 2, 4, 6),)),
}


def _row_pre(bmp, y: int, w: int, windows) -> list:
    """Reference-row context contributions for row ``y`` — fully
    known before the row decodes, so vectorized once per row."""
    import numpy as np

    pre = np.zeros(w, np.int64)
    pad = 8
    for dy, x0, base, n in windows:
        yy = y + dy
        if yy < 0:
            continue
        padded = np.zeros(w + 2 * pad, np.int64)
        padded[pad:pad + w] = bmp[yy]
        for k in range(n):
            lo = pad + x0 - k
            pre += padded[lo:lo + w] << (base + k)
    return pre.tolist()


def _generic_decode_core(
    dec: MQDecoder, cx: dict, w: int, h: int, template: int,
    at: tuple, tpgdon: bool,
):
    """The §6.2.5.7 walk against a CALLER-OWNED coder and GB context
    set — symbol dictionaries decode many bitmaps through one shared
    coder/context (§6.5.5).  With the nominal AT pixels (what real
    encoders emit) the reference-row context bits are contiguous
    windows, precomputed per row with numpy; only a small sliding
    register of just-decoded pixels stays in the Python loop.
    Non-nominal ATs take the general per-pixel walk."""
    import numpy as np

    bmp = np.zeros((h, w), np.uint8)
    ltp = 0
    sltp_ctx = _SLTP_CTX[template]
    decode = dec.decode

    def st(label: int) -> list:
        s = cx.get(label)
        if s is None:
            s = [0, 0]
            cx[label] = s
        return s

    if at == _NOMINAL_AT[template]:
        reg_bits, windows = _FAST_GEOM[template]
        reg_mask = (1 << reg_bits) - 1
        for y in range(h):
            if tpgdon:
                ltp ^= decode(st(sltp_ctx))
                if ltp:
                    if y:
                        bmp[y] = bmp[y - 1]
                    continue
            pre = _row_pre(bmp, y, w, windows)
            out = bytearray(w)
            reg = 0
            cget = cx.get
            for x in range(w):
                label = pre[x] | reg
                s = cget(label)
                if s is None:
                    s = [0, 0]
                    cx[label] = s
                bit = decode(s)
                out[x] = bit
                reg = ((reg << 1) | bit) & reg_mask
            bmp[y] = np.frombuffer(bytes(out), np.uint8)
        return bmp

    spec = _template_pixels(template, at)
    get = bmp.item
    for y in range(h):
        if tpgdon:
            ltp ^= decode(st(sltp_ctx))
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
            row[x] = decode(st(ctx))
    return bmp


def _generic_decode(
    data: bytes, w: int, h: int, template: int, at: tuple,
    tpgdon: bool,
):
    """MQ-coded generic region -> (h, w) uint8 0/1, or None when the
    parameters are degenerate."""
    if w <= 0 or h <= 0 or w * h > 16_000_000:
        return None
    return _generic_decode_core(
        MQDecoder(data), {}, w, h, template, at, tpgdon
    )


def _generic_encode_core(
    enc: MQEncoder, cx: dict, arr, template: int, tpgdon: bool,
) -> None:
    """Encoder-twin core against a caller-owned coder/context.  The
    twin always uses nominal ATs, so every context bit is known
    upfront: both the reference windows AND the current-row register
    vectorize per row, leaving only the encode call in the loop."""
    import numpy as np

    arr = np.asarray(arr).astype(np.uint8)
    h, w = arr.shape
    reg_bits, windows = _FAST_GEOM[template]
    sltp_ctx = _SLTP_CTX[template]
    encode = enc.encode
    cget = cx.get

    def st(label: int) -> list:
        s = cget(label)
        if s is None:
            s = [0, 0]
            cx[label] = s
        return s

    pad = 8
    ltp = 0
    for y in range(h):
        if tpgdon:
            same = bool(y) and bool((arr[y] == arr[y - 1]).all())
            sltp = 1 if same != bool(ltp) else 0
            encode(st(sltp_ctx), sltp)
            ltp ^= sltp
            if ltp:
                continue
        pre = np.zeros(w, np.int64)
        for dy, x0, base, n in windows:
            yy = y + dy
            if yy < 0:
                continue
            padded = np.zeros(w + 2 * pad, np.int64)
            padded[pad:pad + w] = arr[yy]
            for k in range(n):
                lo = pad + x0 - k
                pre += padded[lo:lo + w] << (base + k)
        rowpad = np.zeros(w + 2 * pad, np.int64)
        rowpad[pad:pad + w] = arr[y]
        for k in range(reg_bits):
            lo = pad - 1 - k
            pre += rowpad[lo:lo + w] << k
        labels = pre.tolist()
        bits = arr[y].tolist()
        for x in range(w):
            label = labels[x]
            s = cget(label)
            if s is None:
                s = [0, 0]
                cx[label] = s
            encode(s, bits[x])
    return


def _generic_encode_core_ref(
    enc: MQEncoder, cx: dict, arr, template: int, tpgdon: bool,
) -> None:
    """The original per-pixel walk, kept as the equivalence
    reference for the vectorized twin (pytest pins them equal)."""
    import numpy as np

    arr = np.asarray(arr)
    h, w = arr.shape
    at = _NOMINAL_AT[template]
    spec = _template_pixels(template, at)

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


def _generic_encode(
    arr, template: int = 0, tpgdon: bool = False,
) -> bytes:
    """Encoder twin of ``_generic_decode`` with the nominal AT
    pixels (fixture writer + round-trip tests)."""
    enc = MQEncoder()
    _generic_encode_core(enc, {}, arr, template, tpgdon)
    return enc.flush()


# ---- embedded segment stream (§7.2) ----------------------------------

_GENERIC_TYPES = (38, 39)
_TEXT_TYPES = (6, 7)
_UNSUPPORTED_REGIONS = (
    4, 36,          # intermediate text/generic regions: inputs to
                    # refinement segments (§8.2), NOT page-composited
    20, 22, 23,     # halftone regions (need pattern dictionaries)
    40, 42, 43,     # refinement regions
)


def _u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "big")


def _parse_segments(b: bytes):
    """Yield (segnum, type, page, referred, payload) per segment."""
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
        if i + count * ref_size > n:
            raise ValueError("torn referred list")
        referred = [
            int.from_bytes(b[i + k * ref_size:
                             i + (k + 1) * ref_size], "big")
            for k in range(count)
        ]
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
        yield segnum, stype, page, referred, b[i:i + length]
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
    sym_dicts: dict = {}  # segnum -> exported symbol list
    huff_tabs: dict = {}  # segnum -> parsed custom Huffman table

    def _referred_syms(referred) -> list:
        syms: list = []
        for r in referred:
            syms.extend(sym_dicts.get(r, ()))
        return syms

    def _referred_tables(referred) -> list:
        return [huff_tabs[r] for r in referred if r in huff_tabs]

    def _composite(region, rx, ry, comb) -> None:
        rh, rw = region.shape
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

    for segnum, stype, _pg, referred, payload in list(
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
            _composite(region, rx, ry, comb)
        elif stype == 0:  # symbol dictionary
            sym_dicts[segnum] = _symbol_dict_decode(
                payload, _referred_syms(referred),
                _referred_tables(referred),
            )
        elif stype == 53:  # custom Huffman table (Annex B.2)
            from .jbig2_huff import parse_table_segment

            huff_tabs[segnum] = parse_table_segment(bytes(payload))
        elif stype in _TEXT_TYPES:
            region, (rw, rh, rx, ry, comb) = _text_region_decode(
                payload, _referred_syms(referred),
                _referred_tables(referred),
            )
            if page is None:
                if fallback_size is None:
                    raise NotImplementedError("jbig2 no page info")
                page = np.zeros(fallback_size, np.uint8)
            _composite(region, rx, ry, comb)
        elif stype in _UNSUPPORTED_REGIONS or stype == 16:
            # halftone/refinement regions, pattern dictionaries
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


# ---- arithmetic integer decoding (Annex A) ----------------------------

OOB = object()  # the out-of-band sentinel (A.2 step 4)

#: (prefix-selector bit count, value bits, offset) rows of Table A.1
_IA_BUCKETS = (
    (2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436),
)


class IntCtx:
    """One IAx context set: a 512-state tree of MQ contexts."""

    __slots__ = ("st",)

    def __init__(self):
        self.st = {}

    def _bit(self, dec: MQDecoder, prev: int) -> int:
        s = self.st.get(prev)
        if s is None:
            s = [0, 0]
            self.st[prev] = s
        return dec.decode(s)


def ia_decode(dec: MQDecoder, cx: IntCtx):
    """A.2: one signed integer (or ``OOB``) from the IAx tree."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = cx._bit(dec, prev)
        prev = ((prev << 1) | b) if prev < 256 else (
            ((((prev << 1) | b) & 511) | 256)
        )
        return b

    s = bit()
    for k, (nbits, offset) in enumerate(_IA_BUCKETS):
        if k < len(_IA_BUCKETS) - 1 and not bit():
            pass
        elif k < len(_IA_BUCKETS) - 1:
            continue
        v = 0
        for _ in range(nbits):
            v = (v << 1) | bit()
        v += offset
        if s and v == 0:
            return OOB
        return -v if s else v
    raise AssertionError("unreachable")


def ia_encode(enc: MQEncoder, cx: IntCtx, value) -> None:
    """Encoder twin of ``ia_decode`` (minimal-bucket choice)."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        s = cx.st.get(prev)
        if s is None:
            s = [0, 0]
            cx.st[prev] = s
        enc.encode(s, b)
        prev = ((prev << 1) | b) if prev < 256 else (
            ((((prev << 1) | b) & 511) | 256)
        )

    if value is OOB:
        s, v = 1, 0
    else:
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
    bit(s)
    for k, (nbits, offset) in enumerate(_IA_BUCKETS):
        last = k == len(_IA_BUCKETS) - 1
        top = offset + (1 << nbits) - 1
        if v <= top or last:
            if not last:
                bit(0)
            rem = v - offset
            assert 0 <= rem < (1 << nbits), (value, k)
            for j in range(nbits - 1, -1, -1):
                bit((rem >> j) & 1)
            return
        bit(1)


def iaid_decode(dec: MQDecoder, cx: IntCtx, symcodelen: int) -> int:
    """A.3: a symbol ID of ``symcodelen`` bits from the IAID tree."""
    prev = 1
    for _ in range(symcodelen):
        s = cx.st.get(prev)
        if s is None:
            s = [0, 0]
            cx.st[prev] = s
        prev = (prev << 1) | dec.decode(s)
    return prev - (1 << symcodelen)


def iaid_encode(enc: MQEncoder, cx: IntCtx, value: int,
                symcodelen: int) -> None:
    prev = 1
    for j in range(symcodelen - 1, -1, -1):
        b = (value >> j) & 1
        s = cx.st.get(prev)
        if s is None:
            s = [0, 0]
            cx.st[prev] = s
        enc.encode(s, b)
        prev = (prev << 1) | b


# ---- symbol dictionary (§6.5) and text region (§6.4) ------------------
#
# The arithmetic variants only (SDHUFF/SBHUFF and refinement coding
# stay honest NotImplementedError flags): one MQ decoder per segment
# shared by every symbol bitmap and every integer context, GB context
# retained across symbols within the segment (§6.5.5).


def _require_nominal_grat(payload: bytes, j: int) -> None:
    """Refinement AT pixels (T.88 \xa76.3.5.3): the refine cores below
    assume the nominal placement ``_NOMINAL_GRAT``; a conformant
    stream MAY move them, and decoding it with nominal positions
    yields silently wrong pixels — so parse the 4 bytes and flag."""
    if len(payload) < j + 4:
        raise ValueError("short refinement AT")
    at = tuple(
        (int.from_bytes(payload[j + 2 * k:j + 2 * k + 1], "big",
                        signed=True),
         int.from_bytes(payload[j + 2 * k + 1:j + 2 * k + 2], "big",
                        signed=True))
        for k in range(2)
    )
    if at != _NOMINAL_GRAT:
        raise NotImplementedError("jbig2 non-nominal GRAT %r" % (at,))


def _symbol_dict_decode(payload: bytes, insyms: list,
                        tables: list = ()) -> list:
    """One symbol-dictionary segment -> the EXPORTED symbol list
    ((h, w) uint8 bitmaps).  ``insyms`` are the input symbols from
    referred-to dictionaries, in segment order; ``tables`` the
    referred-to custom Huffman tables (type 53), in order."""
    if len(payload) < 2:
        raise ValueError("short symbol dict")
    flags = int.from_bytes(payload[0:2], "big")
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    if sdhuff:
        from .jbig2_huff import symbol_dict_decode_huff

        return symbol_dict_decode_huff(payload, insyms,
                                       list(tables))
    if (flags >> 8) & 1:
        # bit 8 = "bitmap coding context used": import the GB/GR
        # arithmetic contexts from a referred-to dictionary
        # (T.88 §7.4.3.1.1).  Decoding with fresh contexts would
        # yield silently wrong bitmaps, so flag instead.
        raise NotImplementedError("jbig2 SD context import")
    j = 2
    n_at = 4 if template == 0 else 1
    at = tuple(
        (int.from_bytes(payload[j + 2 * k:j + 2 * k + 1], "big",
                        signed=True),
         int.from_bytes(payload[j + 2 * k + 1:j + 2 * k + 2], "big",
                        signed=True))
        for k in range(n_at)
    )
    j += 2 * n_at
    if sdrefagg and rtemplate == 0:
        _require_nominal_grat(payload, j)
        j += 4
    if len(payload) < j + 8:
        raise ValueError("short symbol dict")
    n_ex = _u32(payload, j)
    n_new = _u32(payload, j + 4)
    j += 8
    if n_new > 10_000 or n_ex > 10_000:
        raise ValueError("symbol dict size")
    dec = MQDecoder(bytes(payload[j:]))
    iadh, iadw, iaex, iaai = (IntCtx() for _ in range(4))
    # ONE text-region context set per segment, shared by the
    # single-refinement shortcut AND aggregate invocations
    # (§6.5.8.2: the contexts persist across the dictionary)
    agg_ictx = _new_text_ictx()
    gb_cx: dict = {}
    total = len(insyms) + n_new
    symcodelen = max(1, (total - 1).bit_length())
    new_syms = []
    hcheight = 0
    guard = 0
    while len(new_syms) < n_new:
        guard += 1
        if guard > n_new + 64:
            # adversarial streams could yield empty height classes
            # forever (IADH then immediate IADW OOB); bound the walk
            raise ValueError("height-class runaway")
        dh = ia_decode(dec, iadh)
        if dh is OOB:
            raise ValueError("OOB height class")
        hcheight += dh
        if hcheight <= 0 or hcheight > 4096:
            raise ValueError("symbol height")
        symwidth = 0
        while True:
            dw = ia_decode(dec, iadw)
            if dw is OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 4096:
                raise ValueError("symbol width")
            if len(new_syms) >= n_new:
                raise ValueError("too many symbols")
            if not sdrefagg:
                new_syms.append(_generic_decode_core(
                    dec, gb_cx, symwidth, hcheight, template, at,
                    False,
                ))
                continue
            # §6.5.8.2: refinement/aggregate coding
            n_inst = ia_decode(dec, iaai)
            if n_inst is OOB:
                raise ValueError("OOB REFAGGNINST")
            pool = list(insyms) + new_syms
            if n_inst != 1:
                # §6.5.8.2.2: the symbol is a TEXT REGION of n_inst
                # instances over the pool, run on the segment's
                # shared coder and contexts (TL corner, OR, strip 1)
                if not 1 < n_inst <= 10_000:
                    raise ValueError("REFAGGNINST")
                if not pool:
                    raise ValueError("aggregate without symbols")
                new_syms.append(_text_region_run(
                    dec, agg_ictx, pool, symwidth, hcheight,
                    n_inst, 1, 1, 0, 0, 0, 0, 1, rtemplate,
                    symcodelen,
                ))
                continue
            sid = iaid_decode(dec, agg_ictx["iaid"], symcodelen)
            rdx = ia_decode(dec, agg_ictx["iardx"])
            rdy = ia_decode(dec, agg_ictx["iardy"])
            if rdx is OOB or rdy is OOB:
                raise ValueError("OOB refinement offset")
            if sid >= len(pool):
                raise ValueError("refagg symbol id")
            new_syms.append(_refine_decode_core(
                dec, agg_ictx["gr"], symwidth, hcheight, rtemplate,
                pool[sid], rdx, rdy,
            ))
    # export flags (§6.5.10): alternating runs over input + new
    allsyms = list(insyms) + new_syms
    exported = []
    i = 0
    flag = 0
    runs = 0
    while i < len(allsyms):
        runs += 1
        if runs > 2 * len(allsyms) + 8:
            raise ValueError("export-run runaway")  # 0-length spins
        run = ia_decode(dec, iaex)
        if run is OOB or run < 0:
            raise ValueError("export run")
        if flag:
            exported.extend(allsyms[i:i + run])
        i += run
        flag ^= 1
    if len(exported) != n_ex:
        raise ValueError("export count lies")
    return exported


def _text_region_decode(payload: bytes, syms: list,
                        tables: list = ()):
    """One text-region segment -> (region bitmap, region info
    (w, h, x, y, comb)).  Arithmetic or (via jbig2_huff) Huffman
    coding; ``tables`` are referred-to custom tables, in order."""
    import numpy as np

    if len(payload) < 17 + 2:
        raise ValueError("short text region")
    rw, rh = _u32(payload, 0), _u32(payload, 4)
    rx, ry = _u32(payload, 8), _u32(payload, 12)
    comb = payload[16] & 7
    flags = int.from_bytes(payload[17:19], "big")
    sbhuff = flags & 1
    refine = (flags >> 1) & 1
    logstrips = (flags >> 2) & 3
    strips = 1 << logstrips
    refcorner = (flags >> 4) & 3  # 0=BL 1=TL 2=BR 3=TR
    transposed = (flags >> 6) & 1
    sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # 5-bit signed
    rtemplate = (flags >> 15) & 1
    if sbhuff:
        from .jbig2_huff import text_region_decode_huff

        return text_region_decode_huff(payload, syms, list(tables))
    j = 19
    if refine and rtemplate == 0:
        _require_nominal_grat(payload, j)
        j += 4
    if len(payload) < j + 4:
        raise ValueError("short text region")
    n_instances = _u32(payload, j)
    j += 4
    if rw <= 0 or rh <= 0 or rw * rh > 16_000_000:
        raise ValueError("region size")
    if n_instances > 100_000:
        raise ValueError("instance count")
    if not syms:
        raise ValueError("text region without symbols")
    symcodelen = max(1, (len(syms) - 1).bit_length())
    region = _text_region_run(
        MQDecoder(bytes(payload[j:])), _new_text_ictx(), syms,
        rw, rh, n_instances, strips, refcorner, transposed,
        sbcombop, defpixel, dsoffset, refine, rtemplate, symcodelen,
    )
    return region, (rw, rh, rx, ry, comb)


def _new_text_ictx() -> dict:
    """One text-region integer-context set — a symbol dictionary's
    aggregate invocations SHARE one of these across symbols
    (§6.5.8.2), standalone regions own theirs."""
    return {
        k: IntCtx() for k in (
            "iadt", "iafs", "iads", "iait", "iari", "iardw",
            "iardh", "iardx", "iardy",
        )
    } | {"iaid": IntCtx(), "gr": {}}


def _text_region_run(
    dec: MQDecoder, ictx: dict, syms: list, rw: int, rh: int,
    n_instances: int, strips: int, refcorner: int, transposed: int,
    sbcombop: int, defpixel: int, dsoffset: int, refine: int,
    rtemplate: int, symcodelen: int,
):
    """The §6.4.5 decode proper against a caller-owned coder and
    context set (so §6.5.8.2 aggregates can run it mid-dictionary)."""
    import numpy as np

    iadt, iafs, iads, iait = (
        ictx["iadt"], ictx["iafs"], ictx["iads"], ictx["iait"]
    )
    iaid_cx = ictx["iaid"]
    iari, iardw, iardh = ictx["iari"], ictx["iardw"], ictx["iardh"]
    iardx, iardy = ictx["iardx"], ictx["iardy"]
    gr_cx = ictx["gr"]
    region = np.full((rh, rw), defpixel, np.uint8)

    def draw(sym, x0: int, y0: int) -> None:
        sh, sw = sym.shape
        xs, ys = max(0, -x0), max(0, -y0)
        xe = min(sw, rw - x0)
        ye = min(sh, rh - y0)
        if xs >= xe or ys >= ye:
            return
        tgt = region[y0 + ys:y0 + ye, x0 + xs:x0 + xe]
        src = sym[ys:ye, xs:xe]
        if sbcombop == 0:
            tgt |= src
        elif sbcombop == 1:
            tgt &= src
        elif sbcombop == 2:
            tgt ^= src
        else:
            tgt ^= src ^ 1

    v = ia_decode(dec, iadt)
    if v is OOB:
        raise ValueError("OOB STRIPT")
    stript = -v * strips
    firsts = 0
    n_done = 0
    guard = 0
    while n_done < n_instances:
        guard += 1
        if guard > n_instances + 8:
            raise ValueError("strip loop runaway")
        dt = ia_decode(dec, iadt)
        if dt is OOB:
            raise ValueError("OOB strip DT")
        stript += dt * strips
        first = True
        while True:
            if first:
                dfs = ia_decode(dec, iafs)
                if dfs is OOB:
                    raise ValueError("OOB first S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = ia_decode(dec, iads)
                if ids is OOB:
                    break  # end of strip
                curs += ids + dsoffset
            curt = 0 if strips == 1 else ia_decode(dec, iait)
            if curt is OOB:
                raise ValueError("OOB T")
            ti = stript + curt
            sid = iaid_decode(dec, iaid_cx, symcodelen)
            if sid >= len(syms):
                raise ValueError("symbol id out of range")
            sym = syms[sid]
            if refine:
                ri = ia_decode(dec, iari)
                if ri is OOB:
                    raise ValueError("OOB RI")
                if ri:
                    # §6.4.11: the instance is a refinement of the
                    # symbol, resized by RDW/RDH
                    rdw = ia_decode(dec, iardw)
                    rdh = ia_decode(dec, iardh)
                    rdx = ia_decode(dec, iardx)
                    rdy = ia_decode(dec, iardy)
                    if OOB in (rdw, rdh, rdx, rdy):
                        raise ValueError("OOB refinement fields")
                    wi = sym.shape[1] + rdw
                    hi = sym.shape[0] + rdh
                    if wi <= 0 or hi <= 0 or wi * hi > 16_000_000:
                        raise ValueError("refined instance size")
                    sym = _refine_decode_core(
                        dec, gr_cx, wi, hi, rtemplate, sym,
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                    )
            sh, sw = sym.shape
            if not transposed:
                y0 = ti if refcorner in (1, 3) else ti - sh + 1
                draw(sym, curs, y0)
                curs += sw - 1
            else:
                x0 = ti if refcorner in (0, 1) else ti - sw + 1
                draw(sym, x0, curs)
                curs += sh - 1
            n_done += 1
            if n_done > n_instances:
                raise ValueError("instance count lies")
    return region


def _symbol_dict_encode(
    symbols: list, template: int = 0, refagg_bases: list = None,
    insyms: list = (),
) -> tuple:
    """Encoder twin of ``_symbol_dict_decode``: every symbol
    exported, height classes ascending.  ``refagg_bases`` switches
    the segment to SDREFAGG: symbol k is coded as a single-symbol
    refinement of pool id ``refagg_bases[k]`` (pool = the
    ``insyms`` input symbols then the new symbols in height-class
    order; bases must precede their refinements)."""
    import numpy as np

    order = sorted(range(len(symbols)),
                   key=lambda i: symbols[i].shape[0])
    refagg = refagg_bases is not None
    n_insyms = len(insyms)
    enc = MQEncoder()
    iadh, iadw, iaex, iaai = (IntCtx() for _ in range(4))
    agg_ictx = _new_text_ictx()  # mirrors the decoder's shared set
    gb_cx: dict = {}
    total = n_insyms + len(symbols)
    symcodelen = max(1, (total - 1).bit_length())
    hcheight = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        ia_encode(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and symbols[order[i]].shape[0] == h:
            sym = np.asarray(symbols[order[i]]).astype(np.uint8)
            ia_encode(enc, iadw, sym.shape[1] - symwidth)
            symwidth = sym.shape[1]
            if refagg:
                spec = refagg_bases[order[i]]
                # the decoder's pool at this point: insyms + the
                # new symbols decoded so far (height-class order)
                def pool_sym(pid):
                    return (
                        symbols[order[pid - n_insyms]]
                        if pid >= n_insyms else insyms[pid]
                    )

                if isinstance(spec, list):
                    # aggregate: a text region of (s, t, pool_id)
                    # instances through the shared coder/contexts
                    for _s, _t, pid in spec:
                        assert pid < n_insyms + i, "base precedes"
                    ia_encode(enc, iaai, len(spec))
                    dims = [
                        np.asarray(pool_sym(pid)).shape
                        for pid in range(n_insyms + i)
                    ]
                    _text_region_emit(
                        enc, agg_ictx, spec, 1, 1, 0, 0,
                        symcodelen, dims, True, None,
                        [np.asarray(pool_sym(pid)).astype(np.uint8)
                         for pid in range(n_insyms + i)],
                    )
                    i += 1
                    continue
                base = spec
                assert base < n_insyms + i, "base must precede"
                ia_encode(enc, iaai, 1)
                iaid_encode(enc, agg_ictx["iaid"], base, symcodelen)
                ia_encode(enc, agg_ictx["iardx"], 0)
                ia_encode(enc, agg_ictx["iardy"], 0)
                _refine_encode_core(
                    enc, agg_ictx["gr"], sym,
                    1 if template != 0 else 0,
                    np.asarray(pool_sym(base)).astype(np.uint8),
                    0, 0,
                )
            else:
                _generic_encode_core(
                    enc, gb_cx, sym, template, False
                )
            i += 1
        ia_encode(enc, iadw, OOB)
    # export runs cover insyms + new: skip the inputs, export new
    ia_encode(enc, iaex, n_insyms)
    ia_encode(enc, iaex, len(symbols))
    body = enc.flush()
    at = _NOMINAL_AT[template]
    at_bytes = b"".join(
        int(a).to_bytes(1, "big", signed=True)
        + int(b).to_bytes(1, "big", signed=True)
        for a, b in at
    )
    rtemplate = 1 if template != 0 else 0
    flags = (template << 10) | ((2 | (rtemplate << 12)) if refagg
                                else 0)
    head = flags.to_bytes(2, "big")
    head += at_bytes
    if refagg and rtemplate == 0:
        head += b"".join(
            int(a).to_bytes(1, "big", signed=True)
            + int(b).to_bytes(1, "big", signed=True)
            for a, b in _NOMINAL_GRAT
        )
    head += len(symbols).to_bytes(4, "big")  # SDNUMEXSYMS
    head += len(symbols).to_bytes(4, "big")  # SDNUMNEWSYMS
    return head + body, order


def _text_region_encode(
    rw: int, rh: int, n_syms: int, instances: list,
    strips: int = 1, refcorner: int = 1, transposed: int = 0,
    dsoffset: int = 0, defpixel: int = 0, sbcombop: int = 0,
    rx: int = 0, ry: int = 0, comb: int = 0, sym_dims=None,
    refined: dict = None, syms: list = None,
) -> bytes:
    """Encoder twin of ``_text_region_decode``.  ``instances`` =
    (s, t, symbol_id) placements with (s, t) the spec's CURS/TI
    coordinates (draw x/y derive from REFCORNER exactly as the
    decoder does); strips of height ``strips`` group instances by
    t // strips.  ``refined`` maps an instance index (position in
    ``instances``) to (rdw, rdh, rdx, rdy, target_bitmap): that
    instance is REFINE-coded from its symbol (``syms`` then carries
    the actual symbol bitmaps)."""
    refine = bool(refined)
    enc = MQEncoder()
    ictx = _new_text_ictx()
    symcodelen = max(1, (n_syms - 1).bit_length())
    _text_region_emit(
        enc, ictx, instances, strips, refcorner, transposed,
        dsoffset, symcodelen, sym_dims, refine, refined, syms,
    )
    body = enc.flush()
    logstrips = strips.bit_length() - 1
    assert 1 << logstrips == strips and 0 <= logstrips <= 3
    flags = (
        (logstrips << 2) | (refcorner << 4) | (transposed << 6)
        | (sbcombop << 7) | (defpixel << 9)
        | ((dsoffset & 0x1F) << 10)
        | ((2 | (1 << 15)) if refine else 0)  # REFINE, SBRTEMPLATE 1
    )
    head = (
        rw.to_bytes(4, "big") + rh.to_bytes(4, "big")
        + rx.to_bytes(4, "big") + ry.to_bytes(4, "big")
        + bytes([comb & 7])
        + flags.to_bytes(2, "big")
        + len(instances).to_bytes(4, "big")
    )
    return head + body


def _text_region_emit(
    enc: MQEncoder, ictx: dict, instances: list, strips: int,
    refcorner: int, transposed: int, dsoffset: int,
    symcodelen: int, sym_dims, refine: bool, refined: dict,
    syms: list,
) -> None:
    """The §6.4 encode walk against a caller-owned coder/contexts —
    the twin of ``_text_region_run`` (aggregate symbol dictionaries
    emit through the segment's shared coder)."""
    import numpy as np

    iadt, iafs, iads, iait = (
        ictx["iadt"], ictx["iafs"], ictx["iads"], ictx["iait"]
    )
    iaid_cx = ictx["iaid"]
    iari, iardw, iardh = ictx["iari"], ictx["iardw"], ictx["iardh"]
    iardx_c, iardy_c = ictx["iardx"], ictx["iardy"]
    gr_cx = ictx["gr"]
    by_strip: dict = {}
    for k, (s, t, sid) in enumerate(instances):
        by_strip.setdefault(t // strips * strips, []).append(
            (s, t, sid, k)
        )
    ia_encode(enc, iadt, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    for st_t in sorted(by_strip):
        assert (st_t - stript) % strips == 0
        ia_encode(enc, iadt, (st_t - stript) // strips)
        stript = st_t
        row = sorted(by_strip[st_t])
        first = True
        curs = 0
        for s, t, sid, k in row:
            if first:
                ia_encode(enc, iafs, s - firsts)
                firsts = s
                curs = s
                first = False
            else:
                ia_encode(enc, iads, s - curs - dsoffset)
                curs = s
            if strips > 1:
                ia_encode(enc, iait, t - stript)
            iaid_encode(enc, iaid_cx, sid, symcodelen)
            sh, sw = sym_dims[sid]
            if refine:
                spec = (refined or {}).get(k)
                ia_encode(enc, iari, 0 if spec is None else 1)
                if spec is not None:
                    rdw, rdh, rdx, rdy, target = spec
                    ia_encode(enc, iardw, rdw)
                    ia_encode(enc, iardh, rdh)
                    ia_encode(enc, iardx_c, rdx)
                    ia_encode(enc, iardy_c, rdy)
                    base = np.asarray(syms[sid]).astype(np.uint8)
                    target = np.asarray(target).astype(np.uint8)
                    assert target.shape == (sh + rdh, sw + rdw)
                    _refine_encode_core(
                        enc, gr_cx, target, 1, base,
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                    )
                    sh, sw = target.shape
            # advance exactly as the decoder will
            curs += (sh if transposed else sw) - 1
        ia_encode(enc, iads, OOB)


def encode_embedded_text(
    glyphs: list, instances: list, page_w: int, page_h: int,
    template: int = 0, strips: int = 1, refcorner: int = 1,
    transposed: int = 0, dsoffset: int = 0,
    globals_split: bool = False, refined_instances: dict = None,
):
    """Embedded-stream fixture with a symbol dictionary + one
    immediate text region.  ``glyphs`` = (h, w) bool bitmaps;
    ``instances`` = (s, t, glyph_index).  ``refined_instances``
    maps an instance index to a target bitmap REFINE-coded from its
    glyph (sizes may differ; RDW/RDH derive).  Returns the stream,
    or (globals, stream) when ``globals_split`` puts the dictionary
    in a /JBIG2Globals-style prefix."""
    import numpy as np

    glyphs = [np.asarray(g).astype(np.uint8) for g in glyphs]
    dict_body, order = _symbol_dict_encode(glyphs, template)
    # exported symbol order is height-class order; remap ids
    id_of = {orig: k for k, orig in enumerate(order)}
    mapped = [(s, t, id_of[g]) for s, t, g in instances]
    dims = [glyphs[orig].shape for orig in order]
    pinfo = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + bytes(8) + b"\x01" + bytes(2)
    )
    seg_page = _segment(0, 48, 1, pinfo)
    seg_dict = _segment(1, 0, 1, dict_body)
    refined = None
    exported = None
    if refined_instances:
        import numpy as _np

        exported = [glyphs[orig] for orig in order]
        refined = {}
        for k, target in refined_instances.items():
            target = _np.asarray(target).astype(_np.uint8)
            gh, gw = dims[mapped[k][2]]
            refined[k] = (
                target.shape[1] - gw, target.shape[0] - gh,
                0, 0, target,
            )
    tr_body = _text_region_encode(
        page_w, page_h, len(glyphs), mapped, strips=strips,
        refcorner=refcorner, transposed=transposed,
        dsoffset=dsoffset, sym_dims=dims,
        refined=refined, syms=exported,
    )
    # text region refers to the dictionary segment (number 1)
    head = (2).to_bytes(4, "big")
    head += bytes([6])                 # immediate text region
    head += bytes([1 << 5])            # 1 referred-to segment
    head += bytes([1])                 # -> segment 1
    head += bytes([1])                 # page 1
    head += len(tr_body).to_bytes(4, "big")
    seg_text = head + tr_body
    seg_end = _segment(3, 49, 1, b"")
    if globals_split:
        return seg_page + seg_dict, seg_text + seg_end
    return seg_page + seg_dict + seg_text + seg_end


def _segment_ref(segnum: int, stype: int, page: int,
                 referred: list, payload: bytes) -> bytes:
    """``_segment`` with a short-form referred-to list (<=4 refs,
    1-byte numbers — fixture scale)."""
    assert len(referred) <= 4 and all(r <= 255 for r in referred)
    head = segnum.to_bytes(4, "big")
    head += bytes([stype & 0x3F])
    head += bytes([len(referred) << 5])
    head += bytes(referred)
    head += bytes([page])
    head += len(payload).to_bytes(4, "big")
    return head + payload


def encode_embedded_text_huff(
    glyphs: list, instances: list, page_w: int, page_h: int,
    collective: str = "mmr", strips: int = 1,
    globals_split: bool = False,
):
    """Huffman-mode embedded-stream fixture: SDHUFF symbol
    dictionary (standard tables B.1/B.2/B.4, collective bitmaps MMR
    or raw) + custom type-53 FS/DS/DT tables + one SBHUFF immediate
    text region.  Same contract as ``encode_embedded_text``."""
    import numpy as np

    from .jbig2_huff import (symbol_dict_encode_huff,
                             text_region_encode_huff)

    glyphs = [np.asarray(g).astype(np.uint8) for g in glyphs]
    dict_body, order = symbol_dict_encode_huff(glyphs, collective)
    id_of = {orig: k for k, orig in enumerate(order)}
    mapped = [(s, t, id_of[g]) for s, t, g in instances]
    dims = [glyphs[orig].shape for orig in order]
    tr_body, table_payloads = text_region_encode_huff(
        page_w, page_h, len(glyphs), mapped, dims, strips=strips,
    )
    pinfo = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + bytes(8) + b"\x01" + bytes(2)
    )
    seg_page = _segment(0, 48, 1, pinfo)
    seg_dict = _segment(1, 0, 1, dict_body)
    seg_tabs = b"".join(
        _segment(2 + k, 53, 1, tp)
        for k, tp in enumerate(table_payloads)
    )
    seg_text = _segment_ref(5, 6, 1, [1, 2, 3, 4], tr_body)
    seg_end = _segment(6, 49, 1, b"")
    if globals_split:
        return seg_page + seg_dict + seg_tabs, seg_text + seg_end
    return seg_page + seg_dict + seg_tabs + seg_text + seg_end


# ---- generic refinement regions (§6.3) ---------------------------------
#
# GRTEMPLATE 0 (13-bit context, 2 AT pixels) and 1 (10-bit, fixed),
# TPGRON typical-prediction rows (SLTP contexts 0x0100 / 0x0080:
# pixels whose 3×3 reference window is uniform copy it undecoded).

_NOMINAL_GRAT = ((-1, -1), (-1, -1))


def _refine_decode_core(
    dec: MQDecoder, cx: dict, w: int, h: int, template: int,
    ref, dx: int, dy: int, at: tuple = _NOMINAL_GRAT,
    tpgron: bool = False,
):
    """§6.3.5.6 against a caller-owned coder/context: ``ref`` is the
    reference bitmap, (dx, dy) its offset under the output."""
    import numpy as np

    bmp = np.zeros((h, w), np.uint8)
    rh, rw = ref.shape

    def st(label: int) -> list:
        s = cx.get(label)
        if s is None:
            s = [0, 0]
            cx[label] = s
        return s

    def cur(xx: int, yy: int) -> int:
        if 0 <= xx < w and 0 <= yy < h:
            return int(bmp[yy, xx])
        return 0

    def rp(xx: int, yy: int) -> int:
        if 0 <= xx < rw and 0 <= yy < rh:
            return int(ref[yy, xx])
        return 0

    if template == 0:
        a1, a2 = at
    elif template != 1:
        raise NotImplementedError("GRTEMPLATE %d" % template)
    sltp_ctx = 0x0100 if template == 0 else 0x0080
    ltp = 0
    for y in range(h):
        if tpgron:
            ltp ^= dec.decode(st(sltp_ctx))
        for x in range(w):
            if ltp:
                # typical pixel: uniform 3×3 reference window
                rx, ry = x - dx, y - dy
                s = sum(
                    rp(rx + i, ry + j)
                    for j in (-1, 0, 1) for i in (-1, 0, 1)
                )
                if s == 0:
                    bmp[y, x] = 0
                    continue
                if s == 9:
                    bmp[y, x] = 1
                    continue
            rx, ry = x - dx, y - dy
            if template == 0:
                ctx = (
                    cur(x - 1, y)
                    | cur(x + 1, y - 1) << 1
                    | cur(x, y - 1) << 2
                    | cur(x + a1[0], y + a1[1]) << 3
                    | rp(rx + 1, ry + 1) << 4
                    | rp(rx, ry + 1) << 5
                    | rp(rx - 1, ry + 1) << 6
                    | rp(rx + a2[0], ry + a2[1]) << 7
                    | rp(rx + 1, ry) << 8
                    | rp(rx, ry) << 9
                    | rp(rx - 1, ry) << 10
                    | rp(rx + 1, ry - 1) << 11
                    | rp(rx, ry - 1) << 12
                )
            else:
                ctx = (
                    cur(x - 1, y)
                    | cur(x + 1, y - 1) << 1
                    | cur(x, y - 1) << 2
                    | cur(x - 1, y - 1) << 3
                    | rp(rx + 1, ry + 1) << 4
                    | rp(rx, ry + 1) << 5
                    | rp(rx + 1, ry) << 6
                    | rp(rx, ry) << 7
                    | rp(rx - 1, ry) << 8
                    | rp(rx, ry - 1) << 9
                )
            bmp[y, x] = dec.decode(st(ctx))
    return bmp


def _refine_encode_core(
    enc: MQEncoder, cx: dict, arr, template: int, ref,
    dx: int, dy: int, tpgron: bool = False,
) -> None:
    """Encoder twin of ``_refine_decode_core`` (nominal ATs)."""
    import numpy as np

    arr = np.asarray(arr).astype(np.uint8)
    h, w = arr.shape
    ref = np.asarray(ref).astype(np.uint8)
    rh, rw = ref.shape
    a1, a2 = _NOMINAL_GRAT

    def st(label: int) -> list:
        s = cx.get(label)
        if s is None:
            s = [0, 0]
            cx[label] = s
        return s

    def cur(xx: int, yy: int) -> int:
        if 0 <= xx < w and 0 <= yy < h:
            return int(arr[yy, xx])
        return 0

    def rp(xx: int, yy: int) -> int:
        if 0 <= xx < rw and 0 <= yy < rh:
            return int(ref[yy, xx])
        return 0

    sltp_ctx = 0x0100 if template == 0 else 0x0080

    def row_typical(y: int) -> bool:
        # every pixel is either predicted-by-uniform-window or will
        # still be explicitly coded; LTP rows must have ALL uniform
        # windows agree with the output pixel
        for x in range(w):
            rx, ry = x - dx, y - dy
            s = sum(
                rp(rx + i, ry + j)
                for j in (-1, 0, 1) for i in (-1, 0, 1)
            )
            if s == 0 and arr[y, x] != 0:
                return False
            if s == 9 and arr[y, x] != 1:
                return False
        return True

    ltp = 0
    for y in range(h):
        if tpgron:
            want = 1 if row_typical(y) else 0
            enc.encode(st(sltp_ctx), want ^ ltp)
            ltp = want
        for x in range(w):
            rx, ry = x - dx, y - dy
            if ltp:
                s = sum(
                    rp(rx + i, ry + j)
                    for j in (-1, 0, 1) for i in (-1, 0, 1)
                )
                if s in (0, 9):
                    continue
            if template == 0:
                ctx = (
                    cur(x - 1, y)
                    | cur(x + 1, y - 1) << 1
                    | cur(x, y - 1) << 2
                    | cur(x + a1[0], y + a1[1]) << 3
                    | rp(rx + 1, ry + 1) << 4
                    | rp(rx, ry + 1) << 5
                    | rp(rx - 1, ry + 1) << 6
                    | rp(rx + a2[0], ry + a2[1]) << 7
                    | rp(rx + 1, ry) << 8
                    | rp(rx, ry) << 9
                    | rp(rx - 1, ry) << 10
                    | rp(rx + 1, ry - 1) << 11
                    | rp(rx, ry - 1) << 12
                )
            else:
                ctx = (
                    cur(x - 1, y)
                    | cur(x + 1, y - 1) << 1
                    | cur(x, y - 1) << 2
                    | cur(x - 1, y - 1) << 3
                    | rp(rx + 1, ry + 1) << 4
                    | rp(rx, ry + 1) << 5
                    | rp(rx + 1, ry) << 6
                    | rp(rx, ry) << 7
                    | rp(rx - 1, ry) << 8
                    | rp(rx, ry - 1) << 9
                )
            enc.encode(st(ctx), int(arr[y, x]))
