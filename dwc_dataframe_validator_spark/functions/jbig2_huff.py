"""JBIG2 Huffman-mode decoding (ITU-T T.88 Annex B + the SDHUFF /
SBHUFF variants of the symbol-dictionary and text-region procedures),
layered over the segment walk and symbol machinery in ``jbig2.py``.

Scope and the honest-flag boundary
----------------------------------
- The table MACHINERY is complete: canonical prefix-code assignment
  from (PREFLEN, RANGELEN, RANGELOW) line lists (Annex B.3), range /
  lower-range / upper-range / OOB line semantics (B.4), and CUSTOM
  table segments (type 53, Annex B.2) — fully self-describing from
  the stream, parsed and consumed in referred-to order.
- Standard tables **B.1–B.5** ship.  Their constants are structurally
  self-verifying: each is a CONTIGUOUS range cover (every line's
  RANGELOW equals the previous line's RANGELOW + 2^RANGELEN, chaining
  from the table's floor to its upper line) and each is a COMPLETE
  prefix code (the Kraft sum of the PREFLENs is exactly 1.0).  Both
  invariants are asserted at import; a transcription error in any
  single field would break one of them.
- Standard tables **B.6–B.15** are NOT shipped: their constants
  cannot be re-derived or cross-checked in this offline environment
  (no spec copy, no reference decoder), and a mis-transcribed
  Huffman table decodes real streams to silently wrong pixels —
  exactly what this module's contract ("honest flag, never a guessed
  bitmap", see jbig2.py) forbids.  A stream selecting one raises
  ``NotImplementedError`` naming the table; adding them later is
  pure data entry into ``_STD_LINES``.
- SDHUFF symbol dictionaries therefore decode COMPLETELY with
  standard tables (their defaults are B.4/B.5, B.2/B.3, B.1 — all
  shipped) or custom tables; SBHUFF text regions decode with custom
  tables (selector 3) and flag the unshipped standard defaults.
- Flagged rarities: SDHUFF+SDREFAGG (Huffman refinement/aggregate
  dictionaries) and SBHUFF+SBREFINE (would need B.14/B.15).

The height-class collective bitmap (§6.5.9) supports both BMSIZE=0
(uncompressed, rows byte-padded) and MMR (T.6, via ccitt.g4_decode —
the same codec the generic-region MMR path already uses).  The
symbol-ID code table (§7.4.3.1.7) is runcode-coded from the stream
itself (runcodes 0–31 literal, 32/33/34 repeat codes with 2/3/7
extra bits + 3/3/11), followed by a byte alignment before the text
region's coded data.

Encoder twins (``symbol_dict_encode_huff``, ``encode_embedded_text_huff``)
emit fixture streams through the same tables — standard B.1/B.2/B.4
for the dictionary, custom type-53 segments for the text region's
FS/DS/DT — so round-trip tests exercise the full decode surface
without depending on any unshipped constant.

Parity note: the reference validator (djtfmartin/dwc-dataframe-
validator) has no media tier at all; this module serves the
multimodal PDF operators (operators/pdf.py) beyond reference parity.
"""

from __future__ import annotations

OOB = object()


class BitReader:
    """MSB-first bit reader with byte alignment (Annex B reads)."""

    __slots__ = ("d", "pos", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("huffman bit overrun")
        v = 0
        d, p = self.d, self.pos
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("huffman bit overrun")
        b = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        """Current byte offset (only valid when byte-aligned)."""
        assert self.pos % 8 == 0
        return self.pos // 8

    def skip_bytes(self, n: int) -> None:
        assert self.pos % 8 == 0
        if self.pos + 8 * n > self.nbits:
            raise ValueError("huffman byte overrun")
        self.pos += 8 * n


class BitWriter:
    """MSB-first twin of ``BitReader``."""

    def __init__(self):
        self.bits: list = []

    def write(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def byte_align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def write_bytes(self, b: bytes) -> None:
        assert len(self.bits) % 8 == 0
        for byte in b:
            self.write(byte, 8)

    def to_bytes(self) -> bytes:
        self.byte_align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


# ---- tables (Annex B) -------------------------------------------------

class HuffTable:
    """A Huffman table from Annex-B line lists.

    ``lines``: (preflen, rangelen, rangelow, kind), kind one of
    'n' (normal range), 'l' (32-bit lower range, value counts DOWN
    from rangelow), 'u' (32-bit upper range), 'o' (OOB), 'p' (plain:
    the value IS rangelow, no range bits — runcode / symbol-ID
    tables).  Lines with preflen 0 are unused (B.3) and get no code.
    Code assignment is canonical by (preflen, line order) per B.3.
    """

    def __init__(self, lines):
        self.lines = [ln for ln in lines if ln[0] > 0]
        maxlen = max((ln[0] for ln in self.lines), default=0)
        count = [0] * (maxlen + 1)
        for ln in self.lines:
            count[ln[0]] += 1
        firstcode = [0] * (maxlen + 2)
        for ln_len in range(1, maxlen + 1):
            firstcode[ln_len] = (
                firstcode[ln_len - 1] + count[ln_len - 1]
            ) << 1
        nxt = list(firstcode)
        self.codes = {}
        self.code_of = {}
        for idx, ln in enumerate(self.lines):
            code = nxt[ln[0]]
            nxt[ln[0]] += 1
            self.codes[(ln[0], code)] = ln
            self.code_of[idx] = (ln[0], code)

    def decode(self, br: BitReader):
        ln_len = 0
        code = 0
        while True:
            code = (code << 1) | br.read_bit()
            ln_len += 1
            if ln_len > 32:
                raise ValueError("huffman code overrun")
            ln = self.codes.get((ln_len, code))
            if ln is None:
                continue
            _p, rangelen, rangelow, kind = ln
            if kind == "o":
                return OOB
            if kind == "p":
                return rangelow
            if kind == "l":
                return rangelow - br.read(32)
            if kind == "u":
                return rangelow + br.read(32)
            return rangelow + br.read(rangelen)

    def encode(self, bw: BitWriter, value) -> None:
        """Fixture-twin emit: pick the line containing ``value``."""
        for idx, (preflen, rangelen, rangelow, kind) in enumerate(
                self.lines):
            if kind == "o":
                if value is OOB:
                    ln_len, code = self.code_of[idx]
                    bw.write(code, ln_len)
                    return
                continue
            if value is OOB:
                continue
            if kind == "p" and value == rangelow:
                ln_len, code = self.code_of[idx]
                bw.write(code, ln_len)
                return
            if kind == "n" and rangelow <= value < rangelow + (
                    1 << rangelen):
                ln_len, code = self.code_of[idx]
                bw.write(code, ln_len)
                bw.write(value - rangelow, rangelen)
                return
            if kind == "l" and value <= rangelow:
                ln_len, code = self.code_of[idx]
                bw.write(code, ln_len)
                bw.write(rangelow - value, 32)
                return
            if kind == "u" and value >= rangelow:
                ln_len, code = self.code_of[idx]
                bw.write(code, ln_len)
                bw.write(value - rangelow, 32)
                return
        raise ValueError("value %r not codable" % (value,))


def plain_table(lengths) -> HuffTable:
    """Canonical table over values 0..n-1 with the given code
    lengths (0 = absent) — runcode and symbol-ID tables."""
    return HuffTable([
        (ln_len, 0, v, "p") for v, ln_len in enumerate(lengths)
    ])


# Standard tables B.1–B.5 (T.88 Annex B).  Each tuple is
# (preflen, rangelen, rangelow, kind); see the module docstring for
# the two structural invariants asserted below.
_STD_LINES = {
    1: [(1, 4, 0, "n"), (2, 8, 16, "n"), (3, 16, 272, "n"),
        (3, 32, 65808, "u")],
    2: [(1, 0, 0, "n"), (2, 0, 1, "n"), (3, 0, 2, "n"),
        (4, 3, 3, "n"), (5, 6, 11, "n"), (6, 32, 75, "u"),
        (6, 0, 0, "o")],
    3: [(8, 8, -256, "n"), (1, 0, 0, "n"), (2, 0, 1, "n"),
        (3, 0, 2, "n"), (4, 3, 3, "n"), (5, 6, 11, "n"),
        (8, 32, -257, "l"), (7, 32, 75, "u"), (6, 0, 0, "o")],
    4: [(1, 0, 1, "n"), (2, 0, 2, "n"), (3, 0, 3, "n"),
        (4, 3, 4, "n"), (5, 6, 12, "n"), (5, 32, 76, "u")],
    5: [(7, 8, -255, "n"), (1, 0, 1, "n"), (2, 0, 2, "n"),
        (3, 0, 3, "n"), (4, 3, 4, "n"), (5, 6, 12, "n"),
        (7, 32, -256, "l"), (6, 32, 76, "u")],
}


def _check_std() -> None:
    from fractions import Fraction

    for num, lines in _STD_LINES.items():
        kraft = sum(Fraction(1, 2 ** ln[0]) for ln in lines)
        assert kraft == 1, ("table B.%d not a complete code" % num,
                           kraft)
        normals = [ln for ln in lines if ln[3] == "n"]
        for a, b in zip(normals, normals[1:]):
            assert b[2] == a[2] + (1 << a[1]), (
                "table B.%d range gap" % num, a, b)
        upper = [ln for ln in lines if ln[3] == "u"]
        if upper:
            last = normals[-1]
            assert upper[0][2] == last[2] + (1 << last[1]), (
                "table B.%d upper gap" % num)
        lower = [ln for ln in lines if ln[3] == "l"]
        if lower:
            assert lower[0][2] == normals[0][2] - 1, (
                "table B.%d lower gap" % num)


_check_std()
_std_cache: dict = {}


def standard_table(num: int) -> HuffTable:
    if num not in _STD_LINES:
        if 1 <= num <= 15:
            raise NotImplementedError(
                "jbig2 standard huffman table B.%d "
                "(constants unverifiable offline)" % num)
        raise ValueError("standard table B.%d" % num)
    t = _std_cache.get(num)
    if t is None:
        t = _std_cache[num] = HuffTable(_STD_LINES[num])
    return t


# ---- custom table segments (type 53, Annex B.2) -----------------------

def parse_table_segment(payload: bytes) -> HuffTable:
    if len(payload) < 9:
        raise ValueError("short huffman table segment")
    flags = payload[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    htlow = int.from_bytes(payload[1:5], "big", signed=True)
    hthigh = int.from_bytes(payload[5:9], "big", signed=True)
    if hthigh <= htlow or hthigh - htlow > 1 << 40:
        raise ValueError("huffman table range")
    br = BitReader(payload[9:])
    lines = []
    cur = htlow
    while cur < hthigh:
        preflen = br.read(htps)
        rangelen = br.read(htrs)
        if rangelen > 32:
            raise ValueError("huffman table rangelen")
        lines.append((preflen, rangelen, cur, "n"))
        cur += 1 << rangelen
        if len(lines) > 4096:
            raise ValueError("huffman table size")
    lines.append((br.read(htps), 32, htlow - 1, "l"))
    lines.append((br.read(htps), 32, hthigh, "u"))
    if htoob:
        lines.append((br.read(htps), 0, 0, "o"))
    return HuffTable(lines)


def emit_table_segment(htlow: int, hthigh: int, ranges,
                       lower_pref: int, upper_pref: int,
                       oob_pref: int = 0) -> bytes:
    """Twin of ``parse_table_segment``: ``ranges`` =
    [(preflen, rangelen), ...] covering [htlow, hthigh)."""
    htps = max(r[0] for r in ranges + [(lower_pref, 0),
                                       (upper_pref, 0),
                                       (oob_pref, 0)]).bit_length()
    htrs = max(r[1] for r in ranges).bit_length()
    htps, htrs = max(htps, 1), max(htrs, 1)
    flags = (1 if oob_pref else 0) | ((htps - 1) << 1) \
        | ((htrs - 1) << 4)
    bw = BitWriter()
    cur = htlow
    for preflen, rangelen in ranges:
        bw.write(preflen, htps)
        bw.write(rangelen, htrs)
        cur += 1 << rangelen
    assert cur == hthigh, (cur, hthigh)
    bw.write(lower_pref, htps)
    bw.write(upper_pref, htps)
    if oob_pref:
        bw.write(oob_pref, htps)
    return bytes([flags]) \
        + htlow.to_bytes(4, "big", signed=True) \
        + hthigh.to_bytes(4, "big", signed=True) \
        + bw.to_bytes()


def _select(sel: int, std_nums, tables_iter) -> HuffTable:
    """Resolve a 2-bit table selector: 0/1/2 pick from ``std_nums``
    (standard table numbers, None = reserved), 3 consumes the next
    referred-to custom table."""
    if sel == 3:
        try:
            return next(tables_iter)
        except StopIteration:
            raise ValueError("missing custom huffman table")
    if sel >= len(std_nums) or std_nums[sel] is None:
        raise ValueError("reserved huffman table selector")
    return standard_table(std_nums[sel])


# ---- SDHUFF symbol dictionary (§6.5 Huffman variant) ------------------

def symbol_dict_decode_huff(payload: bytes, insyms: list,
                            tables: list) -> list:
    """SDHUFF=1 symbol dictionary -> exported symbol list.  Cites:
    header §7.4.3 (no AT bytes in Huffman mode), height-class walk
    §6.5.5–6.5.9, export flags §6.5.10 (runs via Table B.1)."""
    import numpy as np

    from .ccitt import g4_decode

    if len(payload) < 2 + 8:
        raise ValueError("short symbol dict")
    flags = int.from_bytes(payload[0:2], "big")
    if (flags >> 1) & 1:
        # refinement/aggregate in Huffman mode additionally needs
        # tables B.6/B.8/B.15-adjacent machinery; flag, don't guess
        raise NotImplementedError("jbig2 SDHUFF+SDREFAGG")
    ti = iter(tables)
    dh_tab = _select((flags >> 2) & 3, (4, 5, None), ti)
    dw_tab = _select((flags >> 4) & 3, (2, 3, None), ti)
    bm_tab = _select((flags >> 6) & 1, (1,), ti)
    _select((flags >> 7) & 1, (1,), ti)  # AGGINST (unused w/o refagg)
    n_ex = int.from_bytes(payload[2:6], "big")
    n_new = int.from_bytes(payload[6:10], "big")
    if n_new > 10_000 or n_ex > 10_000:
        raise ValueError("symbol dict size")
    body = bytes(payload[10:])
    br = BitReader(body)
    ex_tab = standard_table(1)
    new_syms: list = []
    hcheight = 0
    guard = 0
    while len(new_syms) < n_new:
        guard += 1
        if guard > n_new + 64:
            raise ValueError("height-class runaway")
        hcheight += dh_tab.decode(br)
        if hcheight <= 0 or hcheight > 4096:
            raise ValueError("symbol height")
        symwidth = 0
        totwidth = 0
        widths: list = []
        while True:
            dw = dw_tab.decode(br)
            if dw is OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 4096:
                raise ValueError("symbol width")
            if len(new_syms) + len(widths) >= n_new:
                raise ValueError("too many symbols")
            widths.append(symwidth)
            totwidth += symwidth
        if not widths:
            continue
        # §6.5.9 height-class collective bitmap, byte-aligned
        bmsize = bm_tab.decode(br)
        br.byte_align()
        base = br.byte_pos()
        if bmsize == 0:
            stride = (totwidth + 7) // 8
            need = stride * hcheight
            if base + need > len(body):
                raise ValueError("short collective bitmap")
            rows = np.frombuffer(
                body[base:base + need], np.uint8
            ).reshape(hcheight, stride)
            coll = np.unpackbits(rows, axis=1)[:, :totwidth]
            br.skip_bytes(need)
        else:
            if base + bmsize > len(body):
                raise ValueError("short collective bitmap")
            bits = g4_decode(body[base:base + bmsize],
                             totwidth, hcheight)
            if bits is None:
                raise ValueError("collective bitmap torn")
            coll = bits.astype(np.uint8)
            br.skip_bytes(bmsize)
        x = 0
        for w in widths:
            new_syms.append(coll[:, x:x + w].copy())
            x += w
    # export flags: alternating runs, EXRUNLENGTH via Table B.1
    allsyms = list(insyms) + new_syms
    exported: list = []
    i = 0
    flag = 0
    runs = 0
    while i < len(allsyms):
        runs += 1
        if runs > 2 * len(allsyms) + 8:
            raise ValueError("export-run runaway")
        run = ex_tab.decode(br)
        if run is OOB or run < 0:
            raise ValueError("export run")
        if flag:
            exported.extend(allsyms[i:i + run])
        i += run
        flag ^= 1
    if len(exported) != n_ex:
        raise ValueError("export count lies")
    return exported


def symbol_dict_encode_huff(symbols, collective: str = "mmr") -> bytes:
    """Fixture twin: SDHUFF=1, SDREFAGG=0, standard tables
    (DH=B.4, DW=B.2, BMSIZE=B.1), every symbol exported, height
    classes ascending, widths ascending within a class.
    ``collective``: 'mmr' (T.6) or 'raw' (BMSIZE=0, byte-padded
    rows) — both §6.5.9 branches.  Returns (payload, order)."""
    import numpy as np

    from .ccitt import g4_encode

    symbols = [np.asarray(s).astype(np.uint8) for s in symbols]
    order = sorted(range(len(symbols)),
                   key=lambda i: (symbols[i].shape[0],
                                  symbols[i].shape[1]))
    dh_tab, dw_tab, bm_tab = (standard_table(4), standard_table(2),
                              standard_table(1))
    ex_tab = standard_table(1)
    bw = BitWriter()
    hcheight = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        cls = [k for k in order[i:] if symbols[k].shape[0] == h]
        cls = order[i:i + len(cls)]
        i += len(cls)
        dh_tab.encode(bw, h - hcheight)
        hcheight = h
        symwidth = 0
        for k in cls:
            w = symbols[k].shape[1]
            dw_tab.encode(bw, w - symwidth)
            symwidth = w
        dw_tab.encode(bw, OOB)
        coll = np.concatenate([symbols[k] for k in cls], axis=1)
        if collective == "raw":
            bm_tab.encode(bw, 0)
            bw.byte_align()
            bw.write_bytes(np.packbits(coll, axis=1).tobytes())
        else:
            data = g4_encode(coll.astype(bool))
            bm_tab.encode(bw, len(data))
            bw.byte_align()
            bw.write_bytes(data)
    # export all: run of 0 unexported, then everything
    ex_tab.encode(bw, 0)
    ex_tab.encode(bw, len(symbols))
    flags = 1  # SDHUFF, all selectors standard
    head = flags.to_bytes(2, "big")
    head += len(symbols).to_bytes(4, "big")
    head += len(symbols).to_bytes(4, "big")
    return head + bw.to_bytes(), order


# ---- SBHUFF text region (§6.4 Huffman variant) ------------------------

def _symbol_id_table(br: BitReader, n_syms: int) -> HuffTable:
    """§7.4.3.1.7: 35 4-bit runcode lengths, then runcode-coded
    symbol-ID code lengths (32 = repeat prev 3+2bits, 33 = zeros
    3+3bits, 34 = zeros 11+7bits), then byte alignment."""
    runtab = plain_table([br.read(4) for _ in range(35)])
    lens: list = []
    prev = 0
    while len(lens) < n_syms:
        rc = runtab.decode(br)
        if rc is OOB or rc > 34:
            raise ValueError("symbol-id runcode")
        if rc < 32:
            lens.append(rc)
            prev = rc
        elif rc == 32:
            if not lens:
                raise ValueError("repeat before first length")
            lens.extend([prev] * (br.read(2) + 3))
        elif rc == 33:
            lens.extend([0] * (br.read(3) + 3))
        else:
            lens.extend([0] * (br.read(7) + 11))
    if len(lens) != n_syms:
        raise ValueError("symbol-id length overrun")
    br.byte_align()
    return plain_table(lens)


def text_region_decode_huff(payload: bytes, syms: list,
                            tables: list):
    """SBHUFF=1 text region -> (region bitmap, (w, h, x, y, comb)).
    Mirrors jbig2._text_region_decode / _text_region_run with Annex-B
    field reads; CURT is ``log2(SBSTRIPS)`` raw bits (§6.4.5)."""
    import numpy as np

    if len(payload) < 17 + 2 + 2 + 4:
        raise ValueError("short text region")
    rw, rh = (int.from_bytes(payload[0:4], "big"),
              int.from_bytes(payload[4:8], "big"))
    rx, ry = (int.from_bytes(payload[8:12], "big"),
              int.from_bytes(payload[12:16], "big"))
    comb = payload[16] & 7
    flags = int.from_bytes(payload[17:19], "big")
    refine = (flags >> 1) & 1
    logstrips = (flags >> 2) & 3
    strips = 1 << logstrips
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    if refine:
        # SBHUFF refinement needs RDW/RDH/RDX/RDY tables whose
        # standard defaults are the unshipped B.14/B.15
        raise NotImplementedError("jbig2 SBHUFF refinement")
    hflags = int.from_bytes(payload[19:21], "big")
    ti = iter(tables)
    fs_tab = _select(hflags & 3, (6, 7, None), ti)
    ds_tab = _select((hflags >> 2) & 3, (8, 9, 10), ti)
    dt_tab = _select((hflags >> 4) & 3, (11, 12, 13), ti)
    n_instances = int.from_bytes(payload[21:25], "big")
    if rw <= 0 or rh <= 0 or rw * rh > 16_000_000:
        raise ValueError("region size")
    if n_instances > 100_000:
        raise ValueError("instance count")
    if not syms:
        raise ValueError("text region without symbols")
    br = BitReader(bytes(payload[25:]))
    symtab = _symbol_id_table(br, len(syms))
    region = np.full((rh, rw), defpixel, np.uint8)

    def draw(sym, x0: int, y0: int) -> None:
        sh, sw = sym.shape
        xs, ys = max(0, -x0), max(0, -y0)
        xe, ye = min(sw, rw - x0), min(sh, rh - y0)
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

    v = dt_tab.decode(br)
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
        dt = dt_tab.decode(br)
        if dt is OOB:
            raise ValueError("OOB strip DT")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = fs_tab.decode(br)
                if dfs is OOB:
                    raise ValueError("OOB first S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = ds_tab.decode(br)
                if ids is OOB:
                    break
                curs += ids + dsoffset
            curt = br.read(logstrips) if strips > 1 else 0
            ti_ = stript + curt
            sid = symtab.decode(br)
            if sid is OOB or sid >= len(syms):
                raise ValueError("symbol id out of range")
            sym = syms[sid]
            sh, sw = sym.shape
            if not transposed:
                y0 = ti_ if refcorner in (1, 3) else ti_ - sh + 1
                draw(sym, curs, y0)
                curs += sw - 1
            else:
                x0 = ti_ if refcorner in (0, 1) else ti_ - sw + 1
                draw(sym, x0, curs)
                curs += sh - 1
            n_done += 1
            if n_done > n_instances:
                raise ValueError("instance count lies")
    return region, (rw, rh, rx, ry, comb)


# fixture custom tables for the text region (complete prefix codes;
# FS covers [0,64), DS covers [-64,64) with OOB, DT covers [0,16))
_FS_SPEC = (0, 64, [(1, 6)], 2, 2, 0)
_DS_SPEC = (-64, 64, [(2, 7)], 3, 3, 2)
_DT_SPEC = (0, 16, [(1, 4)], 2, 2, 0)


def text_region_encode_huff(rw: int, rh: int, n_syms: int,
                            instances, sym_dims,
                            strips: int = 1,
                            refcorner: int = 1, transposed: int = 0,
                            dsoffset: int = 0) -> tuple:
    """Fixture twin of ``text_region_decode_huff``: custom FS/DS/DT
    tables (selector 3), equal-length symbol-ID codes.  Returns
    (segment payload, [table segment payloads FS, DS, DT])."""
    fs_tab = parse_table_segment(emit_table_segment(*_FS_SPEC))
    ds_tab = parse_table_segment(emit_table_segment(*_DS_SPEC))
    dt_tab = parse_table_segment(emit_table_segment(*_DT_SPEC))
    bw = BitWriter()
    symlen = max(1, (n_syms - 1).bit_length())
    # runcode table: the single runcode ``symlen`` gets a 1-bit code
    runlens = [0] * 35
    runlens[symlen] = 1
    for ln in runlens:
        bw.write(ln, 4)
    for _ in range(n_syms):
        bw.write(0, 1)  # runcode ``symlen`` for every symbol
    bw.byte_align()
    by_strip: dict = {}
    for s, t, sid in instances:
        by_strip.setdefault(t // strips * strips, []).append(
            (s, t, sid))
    dt_tab.encode(bw, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    for st_t in sorted(by_strip):
        assert (st_t - stript) % strips == 0
        dt_tab.encode(bw, (st_t - stript) // strips)
        stript = st_t
        first = True
        curs = 0
        for s, t, sid in sorted(by_strip[st_t]):
            if first:
                fs_tab.encode(bw, s - firsts)
                firsts = s
                curs = s
                first = False
            else:
                ds_tab.encode(bw, s - curs - dsoffset)
                curs = s
            if strips > 1:
                bw.write(t - stript, strips.bit_length() - 1)
            bw.write(sid, symlen)
            sh, sw = sym_dims[sid]
            # advance exactly as the decoder will
            curs += (sh if transposed else sw) - 1
        ds_tab.encode(bw, OOB)
    body = bw.to_bytes()
    logstrips = strips.bit_length() - 1
    flags = (1 | (logstrips << 2) | (refcorner << 4)
             | (transposed << 6) | ((dsoffset & 0x1F) << 10))
    hflags = 3 | (3 << 2) | (3 << 4)  # FS/DS/DT all custom
    rinfo = (rw.to_bytes(4, "big") + rh.to_bytes(4, "big")
             + bytes(8) + b"\x00")
    payload = (rinfo + flags.to_bytes(2, "big")
               + hflags.to_bytes(2, "big")
               + len(instances).to_bytes(4, "big") + body)
    return payload, [emit_table_segment(*_FS_SPEC),
                     emit_table_segment(*_DS_SPEC),
                     emit_table_segment(*_DT_SPEC)]
