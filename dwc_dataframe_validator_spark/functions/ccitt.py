"""ITU-T T.6 (CCITT Group 4 / MMR) bilevel codec — pure Python.

The scanned-document mass: PDF ``/CCITTFaxDecode`` with ``/K -1``
and TIFF compression 4 both carry G4.  Reference behavior:
djtfmartin/dwc-dataframe-validator has no media decode at all — this
tier belongs to the repo's beyond-reference multimodal surface
(SURVEY.md §2 north star), decoded map-side behind Arrow batches.

Decode is the standard 2-D coding walk: per row, changing elements
against the reference line, with Pass / Horizontal / Vertical(±3)
modes; Horizontal run lengths use the T.4 modified-Huffman white /
black tables plus the shared extended makeups.  The encoder twin
uses the spec's mode-selection rule (pass when b2 < a1, vertical
within ±3, else horizontal), so round-trips exercise every mode.

Correctness pins (the container ships no native CCITT codec to
cross-check): the code tables are transcribed from the published
ITU-T T.4 tables and each color's set is asserted PREFIX-FREE at
import (a transcription slip almost always breaks the prefix
property or duplicates a codeword); pytest round-trips synthetic
pages through every mode class and fuzzes truncations/flips for
honest-tear behavior.  Any undecodable state returns None — never a
guessed bitmap.
"""
from __future__ import annotations

# ---- ITU-T T.4 modified-Huffman code tables --------------------------
# (codeword string, run length); terminating 0-63, makeup 64-1728,
# extended makeup 1792-2560 shared by both colors.

_WHITE_CODES = {
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3, "1011": 4,
    "1100": 5, "1110": 6, "1111": 7, "10011": 8, "10100": 9,
    "00111": 10, "01000": 11, "001000": 12, "000011": 13,
    "110100": 14, "110101": 15, "101010": 16, "101011": 17,
    "0100111": 18, "0001100": 19, "0001000": 20, "0010111": 21,
    "0000011": 22, "0000100": 23, "0101000": 24, "0101011": 25,
    "0010011": 26, "0100100": 27, "0011000": 28, "00000010": 29,
    "00000011": 30, "00011010": 31, "00011011": 32, "00010010": 33,
    "00010011": 34, "00010100": 35, "00010101": 36, "00010110": 37,
    "00010111": 38, "00101000": 39, "00101001": 40, "00101010": 41,
    "00101011": 42, "00101100": 43, "00101101": 44, "00000100": 45,
    "00000101": 46, "00001010": 47, "00001011": 48, "01010010": 49,
    "01010011": 50, "01010100": 51, "01010101": 52, "00100100": 53,
    "00100101": 54, "01011000": 55, "01011001": 56, "01011010": 57,
    "01011011": 58, "01001010": 59, "01001011": 60, "00110010": 61,
    "00110011": 62, "00110100": 63,
    # makeup
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448,
    "01100101": 512, "01101000": 576, "01100111": 640,
    "011001100": 704, "011001101": 768, "011010010": 832,
    "011010011": 896, "011010100": 960, "011010101": 1024,
    "011010110": 1088, "011010111": 1152, "011011000": 1216,
    "011011001": 1280, "011011010": 1344, "011011011": 1408,
    "010011000": 1472, "010011001": 1536, "010011010": 1600,
    "011000": 1664, "010011011": 1728,
}

_BLACK_CODES = {
    "0000110111": 0, "010": 1, "11": 2, "10": 3, "011": 4,
    "0011": 5, "0010": 6, "00011": 7, "000101": 8, "000100": 9,
    "0000100": 10, "0000101": 11, "0000111": 12, "00000100": 13,
    "00000111": 14, "000011000": 15, "0000010111": 16,
    "0000011000": 17, "0000001000": 18, "00001100111": 19,
    "00001101000": 20, "00001101100": 21, "00000110111": 22,
    "00000101000": 23, "00000010111": 24, "00000011000": 25,
    "000011001010": 26, "000011001011": 27, "000011001100": 28,
    "000011001101": 29, "000001101000": 30, "000001101001": 31,
    "000001101010": 32, "000001101011": 33, "000011010010": 34,
    "000011010011": 35, "000011010100": 36, "000011010101": 37,
    "000011010110": 38, "000011010111": 39, "000001101100": 40,
    "000001101101": 41, "000011011010": 42, "000011011011": 43,
    "000001010100": 44, "000001010101": 45, "000001010110": 46,
    "000001010111": 47, "000001100100": 48, "000001100101": 49,
    "000001010010": 50, "000001010011": 51, "000000100100": 52,
    "000000110111": 53, "000000111000": 54, "000000100111": 55,
    "000000101000": 56, "000001011000": 57, "000001011001": 58,
    "000000101011": 59, "000000101100": 60, "000001011010": 61,
    "000001100110": 62, "000001100111": 63,
    # makeup
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088,
    "0000001110110": 1152, "0000001110111": 1216,
    "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472,
    "0000001011010": 1536, "0000001011011": 1600,
    "0000001100100": 1664, "0000001100101": 1728,
}

#: extended makeups (T.4 Table 4) — shared by both colors
_EXT_CODES = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}

#: 2-D mode codes (T.6): value = ('P',), ('H',), ('V', delta) or
#: ('U',) — the EXTENSION code 0000001xxx with xxx=111 entering
#: uncompressed mode (T.4 §4.2.1.3 / T.6 §2.2.5; TIFF T4Options /
#: T6Options bit 1).  The 1-D entry spelling (12-bit, inside an MH
#: row) is out of scope: real encoders only emit uncompressed
#: segments from the 2-D walk, and an unknown code stays an honest
#: None.
_MODE_CODES = {
    "1": ("V", 0), "011": ("V", 1), "010": ("V", -1),
    "001": ("H",), "0001": ("P",),
    "000011": ("V", 2), "000010": ("V", -2),
    "0000011": ("V", 3), "0000010": ("V", -3),
    "0000001111": ("U",),
}

#: uncompressed-mode image codes (T.4 Table 10): n leading white
#: pixels then one black, except '000001' = five whites, stay.
_UNC_CODES = {
    "1": (0, True), "01": (1, True), "001": (2, True),
    "0001": (3, True), "00001": (4, True), "000001": (5, False),
}
#: exit codes (T.4 Table 11): r whites then leave; the next bit T
#: gives the color of the run 2-D coding resumes in (0 = white).
for _r in range(5):
    _UNC_CODES["0" * (6 + _r) + "1"] = (_r, None)
del _r

_EOFB = "000000000001000000000001"


def _assert_prefix_free(codes: dict, what: str) -> None:
    ks = sorted(codes)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            if b.startswith(a):
                raise AssertionError(
                    "%s: %r is a prefix of %r" % (what, a, b)
                )


for _name, _tab in (
    ("white", {**_WHITE_CODES, **_EXT_CODES}),
    ("black", {**_BLACK_CODES, **_EXT_CODES}),
    ("mode", {**_MODE_CODES, _EOFB[:12]: ("EOL",)}),
    ("uncompressed", _UNC_CODES),
):
    _assert_prefix_free(_tab, _name)

# decode LUTs keyed by (bit length, value-as-int)


def _lut(codes: dict) -> dict:
    return {
        (len(k), int(k, 2)): v for k, v in codes.items()
    }


_WHITE_LUT = _lut({**_WHITE_CODES, **_EXT_CODES})
_BLACK_LUT = _lut({**_BLACK_CODES, **_EXT_CODES})
_MODE_LUT = _lut({**_MODE_CODES, _EOFB[:12]: ("EOL",)})
_UNC_LUT = _lut(_UNC_CODES)
_MAX_RUN_BITS = 13
_MAX_MODE_BITS = 12
_MAX_UNC_BITS = 11


class _BitReader:
    __slots__ = ("b", "pos", "n")

    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0
        self.n = len(data) * 8

    def take(self, lut: dict, max_bits: int):
        v = 0
        for ln in range(1, max_bits + 1):
            if self.pos >= self.n:
                return None
            byte = self.b[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
            got = lut.get((ln, v))
            if got is not None:
                return got
        return None

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(br: _BitReader, color: int):
    """One MH-coded run length (makeups chain until a terminating
    code), or None on an undecodable codeword."""
    lut = _BLACK_LUT if color else _WHITE_LUT
    total = 0
    while True:
        got = br.take(lut, _MAX_RUN_BITS)
        if got is None or isinstance(got, tuple):
            return None
        total += got
        if got < 64:  # terminating code closes the run
            return total
        if total > 1 << 20:  # runaway makeup chain: a lying stream
            return None


def _decode_2d_row(br: _BitReader, ref: list, width: int):
    """One 2-D-coded row against the reference transitions → the
    row's transition list, or None when torn."""
    import bisect

    cur: list = []
    a0 = -1
    color = 0
    guard = 0
    while a0 < width:
        guard += 1
        if guard > 2 * width + 8:
            return None
        mode = br.take(_MODE_LUT, _MAX_MODE_BITS)
        if mode is None or mode[0] == "EOL":
            return None  # mid-row EOL/EOFB or ran dry: torn
        if mode[0] == "U":
            # uncompressed segment: literal pixels (1 = black) from
            # the current position until an exit code, whose T bit
            # sets the color 2-D coding resumes in.
            p = a0 if a0 > 0 else 0
            for _ in range(2 * width + 8):
                got = br.take(_UNC_LUT, _MAX_UNC_BITS)
                if got is None:
                    return None
                whites, black = got
                if whites:
                    if p + whites > width:
                        return None
                    if color == 1:
                        cur.append(p)  # black -> white
                        color = 0
                    p += whites
                if black is None:  # exit code: T = next run's color
                    t = _bit(br)
                    if t is None:
                        return None
                    if t != color:
                        cur.append(p)
                        color = t
                    a0 = p
                    break
                if black:
                    if p >= width:
                        return None
                    if color == 0:
                        cur.append(p)  # white -> black
                        color = 1
                    p += 1
            else:
                return None  # runaway: no exit code arrived
            continue
        i = bisect.bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        if mode[0] == "P":
            a0 = b2
        elif mode[0] == "H":
            r1 = _read_run(br, color)
            r2 = _read_run(br, 1 - color)
            if r1 is None or r2 is None:
                return None
            a1 = (a0 if a0 > 0 else 0) + r1
            a2 = a1 + r2
            if a2 > width or a1 < 0 or (cur and a1 < cur[-1]):
                return None
            cur.extend((a1, a2))
            a0 = a2
        else:
            a1 = b1 + mode[1]
            if a1 < 0 or a1 > width or (cur and a1 < cur[-1]):
                return None
            cur.append(a1)
            a0 = a1
            color ^= 1
    if a0 != width:
        return None  # the line over-ran: a lying stream
    return cur


def _decode_1d_row(br: _BitReader, width: int):
    """One 1-D MH-coded row (alternating white/black runs from the
    T.4 tables) → transition list, or None when torn.  Every run
    boundary is a transition (the first white run may be 0 for a
    row that starts black; zero runs anywhere else are a lying
    stream)."""
    cur: list = []
    total = 0
    color = 0
    while total < width:
        run = _read_run(br, color)
        if run is None or total + run > width:
            return None
        if run == 0 and (cur or color == 1):
            return None  # only a LEADING white run may be empty
        total += run
        cur.append(total)
        color ^= 1
    return cur


def _paint_row(out, y: int, cur: list, width: int) -> None:
    it = iter(cur + ([width] if len(cur) % 2 else []))
    for s, e in zip(it, it):
        out[y, s:e] = True


def g4_decode(data: bytes, width: int, height: int,
              byte_align: bool = False):
    """(height, width) bool array (True = black) or None when the
    stream is torn/undecodable.  ``byte_align`` starts each coded
    row on a byte boundary (PDF /EncodedByteAlign)."""
    import numpy as np

    if width <= 0 or height <= 0 or width * height > 64_000_000:
        return None
    br = _BitReader(data)
    out = np.zeros((height, width), dtype=bool)
    ref = [width, width]
    for y in range(height):
        if byte_align:
            br.align()
        cur = _decode_2d_row(br, ref, width)
        if cur is None:
            return None
        _paint_row(out, y, cur, width)
        ref = cur + [width, width]
    return out


def _encode_run(bits: list, run: int, color: int) -> None:
    rev = getattr(_encode_run, "_rev", None)
    if rev is None:
        rev = (
            {v: k for k, v in {**_WHITE_CODES, **_EXT_CODES}.items()},
            {v: k for k, v in {**_BLACK_CODES, **_EXT_CODES}.items()},
        )
        _encode_run._rev = rev
    crev = rev[color]
    while run >= 64:
        m = min(2560, run - (run % 64))
        bits.append(crev[m])
        run -= m
    bits.append(crev[run])


def _encode_unc_row(bits: list, row, w: int) -> None:
    """One whole row as a T.4 Table-10/11 uncompressed segment:
    entry code, image codes, exit with T = white."""
    bits.append("0000001111")
    term = {0: "1", 1: "01", 2: "001", 3: "0001", 4: "00001"}
    p = 0
    while p < w:
        q = p
        while q < w and not row[q]:
            q += 1
        nw = q - p
        if q >= w:  # trailing whites: fold the residue into the exit
            while nw >= 5:
                bits.append("000001")
                nw -= 5
            bits.append("0" * (6 + nw) + "1" + "0")
            return
        while nw >= 5:
            bits.append("000001")
            nw -= 5
        bits.append(term[nw])
        p = q + 1
    bits.append("0000001" + "0")  # row ended on black; exit, T=white


def g4_encode(
    arr, byte_align: bool = False, uncompressed: int = 0
) -> bytes:
    """Fixture twin of ``g4_decode``: (h, w) bool (True = black) →
    a T.6 stream ending in EOFB, using the spec's mode-selection
    rule so Pass/Vertical/Horizontal all occur on real content.
    ``uncompressed=N`` codes every Nth row as a T.4 uncompressed
    segment (TIFF T6Options bit 1)."""
    import numpy as np

    arr = np.asarray(arr, dtype=bool)
    h, w = arr.shape
    bits: list = []

    def transitions(row) -> list:
        d = np.flatnonzero(np.diff(row.astype(np.int8)))
        t = (d + 1).tolist()
        if row[0]:
            t = [0] + t
        return t

    ref = [w, w]
    import bisect

    for y in range(h):
        if byte_align and bits:
            total = sum(len(s) for s in bits)
            pad = (-total) % 8
            if pad:
                bits.append("0" * pad)
        cur = transitions(arr[y])
        if uncompressed and y % uncompressed == uncompressed - 1:
            _encode_unc_row(bits, arr[y], w)
            ref = cur + [w, w]
            continue
        curx = cur + [w, w]
        a0 = -1
        color = 0
        ci = 0  # index of next transition in cur at/after a0
        while a0 < w:
            a1 = curx[ci] if ci < len(curx) else w
            i = bisect.bisect_right(ref, a0)
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            if b2 < a1:
                bits.append("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                code = {
                    0: "1", 1: "011", -1: "010", 2: "000011",
                    -2: "000010", 3: "0000011", -3: "0000010",
                }[a1 - b1]
                bits.append(code)
                a0 = a1
                ci += 1
                color ^= 1
            else:
                a2 = curx[ci + 1] if ci + 1 < len(curx) else w
                bits.append("001")
                _encode_run(bits, a1 - (a0 if a0 > 0 else 0), color)
                _encode_run(bits, a2 - a1, 1 - color)
                a0 = a2
                ci += 2
        ref = cur + [w, w]
    bits.append(_EOFB)
    s = "".join(bits)
    s += "0" * ((-len(s)) % 8)
    return bytes(
        int(s[i:i + 8], 2) for i in range(0, len(s), 8)
    )


# ---- Group 3 (ITU-T T.4): 1-D MH and mixed 2-D ------------------------
# PDF /CCITTFaxDecode with /K >= 0 and TIFF Compression 2/3 — the
# older fax mass.  Reuses the MH run tables and the 2-D row walk.


def _bit(br: _BitReader):
    if br.pos >= br.n:
        return None
    v = (br.b[br.pos >> 3] >> (7 - (br.pos & 7))) & 1
    br.pos += 1
    return v


def _skip_to_eol(br: _BitReader, max_zeros: int = 4096):
    """Consume an EOL (>= 11 zeros then a 1), tolerating fill zeros
    (TIFF T4Options bit 2 pads EOLs to byte boundaries).  False when
    the pattern never arrives."""
    zeros = 0
    while True:
        b = _bit(br)
        if b is None or zeros > max_zeros:
            return False
        if b:
            return zeros >= 11
        zeros += 1


def g3_decode(data: bytes, width: int, height: int,
              two_d: bool = False, eol: bool = True,
              byte_align: bool = False):
    """(height, width) bool array (True = black) or None — T.4
    Group 3.  ``two_d=False``: pure 1-D MH rows; ``two_d=True``
    (PDF /K > 0, TIFF T4Options bit 0): each row carries a 1-bit
    mode tag (1 = 1-D, 0 = 2-D against the previous row).  ``eol``
    expects an EOL before every row (fill-tolerant); ``byte_align``
    starts each row on a byte boundary (PDF /EncodedByteAlign, TIFF
    Compression 2's fixed convention)."""
    import numpy as np

    if width <= 0 or height <= 0 or width * height > 64_000_000:
        return None
    br = _BitReader(data)
    out = np.zeros((height, width), dtype=bool)
    ref = [width, width]
    for y in range(height):
        if byte_align:
            br.align()
        if eol and not _skip_to_eol(br):
            return None
        if two_d:
            tag = _bit(br)
            if tag is None:
                return None
            if tag:
                cur = _decode_1d_row(br, width)
            else:
                if y == 0:
                    return None  # the first line must be 1-D
                cur = _decode_2d_row(br, ref, width)
        else:
            cur = _decode_1d_row(br, width)
        if cur is None:
            return None
        _paint_row(out, y, cur, width)
        ref = cur + [width, width]
    return out


def _encode_1d_row(bits: list, row) -> None:
    import numpy as np

    t = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
    bounds = list(t) + [len(row)]
    if row[0]:
        bounds = [0] + bounds
    prev = 0
    color = 0
    for b in bounds:
        _encode_run(bits, int(b) - prev, color)
        prev = int(b)
        color ^= 1
        if prev == len(row):
            break


def g3_encode(arr, two_d: bool = False, eol: bool = True,
              byte_align: bool = False, k: int = 2,
              uncompressed: bool = False) -> bytes:
    """Fixture twin of ``g3_decode``: 1-D MH rows, or mixed mode
    where every ``k``-th row re-syncs as 1-D (the T.4 K parameter)
    and the rest code 2-D against the previous row.
    ``uncompressed=True`` codes every 2-D row as a T.4 uncompressed
    segment (T4Options bit 1)."""
    import numpy as np

    arr = np.asarray(arr, dtype=bool)
    h, w = arr.shape
    bits: list = []

    def transitions(row) -> list:
        d = np.flatnonzero(np.diff(row.astype(np.int8)))
        t = (d + 1).tolist()
        if row[0]:
            t = [0] + t
        return t

    import bisect

    ref = [w, w]
    for y in range(h):
        if byte_align:
            total = sum(len(s) for s in bits)
            pad = (-total) % 8
            if pad:
                bits.append("0" * pad)
        one_d = (not two_d) or (y % k == 0)
        if eol:
            bits.append("000000000001")
        if two_d:
            bits.append("1" if one_d else "0")
        if one_d:
            _encode_1d_row(bits, arr[y])
            ref = transitions(arr[y]) + [w, w]
        elif uncompressed:
            _encode_unc_row(bits, arr[y], w)
            ref = transitions(arr[y]) + [w, w]
        else:
            cur = transitions(arr[y])
            curx = cur + [w, w]
            a0 = -1
            color = 0
            ci = 0
            while a0 < w:
                a1 = curx[ci] if ci < len(curx) else w
                i = bisect.bisect_right(ref, a0)
                if (i & 1) != color:
                    i += 1
                b1 = ref[i] if i < len(ref) else w
                b2 = ref[i + 1] if i + 1 < len(ref) else w
                if b2 < a1:
                    bits.append("0001")
                    a0 = b2
                elif abs(a1 - b1) <= 3:
                    bits.append({
                        0: "1", 1: "011", -1: "010", 2: "000011",
                        -2: "000010", 3: "0000011", -3: "0000010",
                    }[a1 - b1])
                    a0 = a1
                    ci += 1
                    color ^= 1
                else:
                    a2 = curx[ci + 1] if ci + 1 < len(curx) else w
                    bits.append("001")
                    _encode_run(
                        bits, a1 - (a0 if a0 > 0 else 0), color
                    )
                    _encode_run(bits, a2 - a1, 1 - color)
                    a0 = a2
                    ci += 2
            ref = cur + [w, w]
    if eol:
        bits.append("000000000001" * 6)  # RTC
    s = "".join(bits)
    s += "0" * ((-len(s)) % 8)
    return bytes(
        int(s[i:i + 8], 2) for i in range(0, len(s), 8)
    )
