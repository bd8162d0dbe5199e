"""JBIG2 Huffman mode (jbig2_huff.py): table machinery, SDHUFF
symbol dictionaries, SBHUFF text regions, honest flags.

The standard-table KAT below is hand-derived from the canonical
assignment rule (Annex B.3) applied to the B.2/B.4 line lists — the
codes are forced by the PREFLENs, so this pins the assignment
algorithm independently of the encoder twin.
"""
import numpy as np
import pytest

from dwc_dataframe_validator_spark.functions import jbig2 as J
from dwc_dataframe_validator_spark.functions import jbig2_huff as H

G1 = np.array([[1, 1, 1, 0], [1, 0, 1, 0], [1, 1, 1, 1]], np.uint8)
G2 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)
G3 = np.array([[1, 1], [1, 1]], np.uint8)


def _bits(s: str) -> H.BitReader:
    s = s.replace(" ", "")
    pad = (-len(s)) % 8
    return H.BitReader(
        bytes(int(s[i:i + 8].ljust(8, "0"), 2)
              for i in range(0, len(s) + pad, 8))
    )


def test_standard_table_b2_codes():
    # canonical codes: 0, 10, 110, 1110+3b, 11110+6b,
    # 111110+32b (upper), 111111 (OOB)
    t = H.standard_table(2)
    assert t.decode(_bits("0")) == 0
    assert t.decode(_bits("10")) == 1
    assert t.decode(_bits("110")) == 2
    assert t.decode(_bits("1110 000")) == 3
    assert t.decode(_bits("1110 111")) == 10
    assert t.decode(_bits("11110 000000")) == 11
    assert t.decode(_bits("11110 111111")) == 74
    assert t.decode(_bits("111110" + "0" * 31 + "1")) == 76
    assert t.decode(_bits("111111")) is H.OOB


def test_standard_table_b4_codes():
    t = H.standard_table(4)
    assert t.decode(_bits("0")) == 1
    assert t.decode(_bits("10")) == 2
    assert t.decode(_bits("110")) == 3
    assert t.decode(_bits("1110 101")) == 9
    assert t.decode(_bits("11110 001100")) == 24
    assert t.decode(_bits("11111" + "0" * 32)) == 76


def test_standard_table_b1_b3_b5_roundtrip():
    for num, values in [
        (1, [0, 15, 16, 271, 272, 65807, 65808, 1 << 20]),
        (3, [-256, -1, 0, 10, 74, -257, -5000, 75, 4000]),
        (5, [-255, -1, 1, 12, 75, -256, -9999, 76, 12345]),
    ]:
        t = H.standard_table(num)
        for v in values:
            bw = H.BitWriter()
            t.encode(bw, v)
            assert t.decode(H.BitReader(bw.to_bytes())) == v, (num, v)


def test_unverified_standard_tables_flag():
    for num in range(6, 16):
        with pytest.raises(NotImplementedError, match="B.%d" % num):
            H.standard_table(num)


def test_custom_table_segment_roundtrip():
    payload = H.emit_table_segment(-64, 64, [(2, 7)], 3, 3, 2)
    t = H.parse_table_segment(payload)
    for v in (-64, -1, 0, 63, -65, -1000, 64, 5000):
        bw = H.BitWriter()
        t.encode(bw, v)
        assert t.decode(H.BitReader(bw.to_bytes())) == v
    bw = H.BitWriter()
    t.encode(bw, H.OOB)
    assert t.decode(H.BitReader(bw.to_bytes())) is H.OOB


def test_symbol_id_runcode_repeats():
    # lengths via runcodes: rc=2 twice, rc=32 (repeat prev 3+0),
    # rc=33 (3 zeros), rc=34 (11 zeros) → 2,2,2,2,2,0*14
    # runcode table: give every used runcode length 3
    lens = [0] * 35
    for rc in (2, 32, 33, 34):
        lens[rc] = 3
    bw = H.BitWriter()
    # canonical len-3 codes in line order: 2→0, 32→1, 33→2, 34→3
    codes = {rc: i for i, rc in enumerate([2, 32, 33, 34])}
    bw.write(codes[2], 3)
    bw.write(codes[2], 3)
    bw.write(codes[32], 3)
    bw.write(0, 2)       # repeat prev 3+0 times
    bw.write(codes[33], 3)
    bw.write(0, 3)       # 3 zeros
    bw.write(codes[34], 3)
    bw.write(0, 7)       # 11 zeros
    # assemble the full §7.4.3.1.7 stream: 35 4-bit lengths first
    head = H.BitWriter()
    for ln in lens:
        head.write(ln, 4)
    head.bits.extend(bw.bits)
    tab = H._symbol_id_table(H.BitReader(head.to_bytes()), 19)
    # 5 symbols of length 2, 14 absent
    got = [ln for ln, _r, v, k in tab.lines]
    assert got == [2] * 5


def test_roundtrip_mmr_and_raw_collective():
    for coll in ("mmr", "raw"):
        blob = J.encode_embedded_text_huff(
            [G1, G2, G3], [(0, 0, 0), (5, 0, 1), (9, 2, 2),
                           (0, 5, 1)], 16, 10, collective=coll)
        page = J.decode_embedded(blob)
        exp = np.zeros((10, 16), np.uint8)
        exp[0:3, 0:4] |= G1
        exp[0:3, 5:8] |= G2
        exp[2:4, 9:11] |= G3
        exp[5:8, 0:3] |= G2
        assert np.array_equal(page, exp), coll


def test_roundtrip_strips_and_globals_split():
    blob = J.encode_embedded_text_huff(
        [G1, G2], [(0, 0, 0), (6, 2, 1), (1, 5, 1), (8, 7, 0)],
        16, 12, strips=4)
    page = J.decode_embedded(blob)
    exp = np.zeros((12, 16), np.uint8)
    exp[0:3, 0:4] |= G1
    exp[2:5, 6:9] |= G2
    exp[5:8, 1:4] |= G2
    exp[7:10, 8:12] |= G1
    assert np.array_equal(page, exp)
    g, stream = J.encode_embedded_text_huff(
        [G1], [(0, 0, 0)], 8, 4, globals_split=True)
    assert np.array_equal(J.decode_embedded(stream, g)[0:3, 0:4], G1)


def test_roundtrip_edges():
    # single symbol (1-bit IDs), overlap (negative DS), FS upper
    blob = J.encode_embedded_text_huff(
        [G2], [(0, 0, 0), (4, 0, 0), (8, 0, 0), (12, 0, 0)], 16, 3)
    assert int(J.decode_embedded(blob).sum()) == 4 * int(G2.sum())
    blob = J.encode_embedded_text_huff(
        [G1, G1], [(0, 0, 0), (2, 0, 1)], 8, 3)
    exp = np.zeros((3, 8), np.uint8)
    exp[0:3, 0:4] |= G1
    exp[0:3, 2:6] |= G1
    assert np.array_equal(J.decode_embedded(blob), exp)
    blob = J.encode_embedded_text_huff([G1], [(100, 0, 0)], 110, 3)
    assert int(J.decode_embedded(blob)[0:3, 100:104].sum()) \
        == int(G1.sum())


def test_honest_flags():
    with pytest.raises(NotImplementedError, match="SDREFAGG"):
        H.symbol_dict_decode_huff(bytes([0x00, 0x03]) + bytes(8),
                                  [], [])
    # SBHUFF + refinement: flags bits 0 and 1
    rinfo = (8).to_bytes(4, "big") + (6).to_bytes(4, "big") \
        + bytes(8) + b"\x00"
    payload = rinfo + (0x0003).to_bytes(2, "big") + bytes(2) \
        + (1).to_bytes(4, "big")
    with pytest.raises(NotImplementedError, match="SBHUFF refine"):
        H.text_region_decode_huff(payload, [G1], [])
    # a stream selecting the unshipped standard FS table (sel 0)
    payload = rinfo + (0x0001).to_bytes(2, "big") + bytes(2) \
        + (1).to_bytes(4, "big") + bytes(20)
    with pytest.raises(NotImplementedError, match="B.6"):
        H.text_region_decode_huff(payload, [G1], [])


def test_std_tables_structural_invariants():
    # explicit re-statement of the import-time asserts
    from fractions import Fraction

    for num, lines in H._STD_LINES.items():
        assert sum(Fraction(1, 2 ** ln[0]) for ln in lines) == 1


def test_huffman_stream_fuzz_never_guesses():
    """Bit-flipped and truncated SDHUFF/SBHUFF streams tear
    (ValueError) or flag (NotImplementedError) or decode to a page
    of whatever dimensions the (possibly corrupted) stream declares
    — never a hang, a foreign exception, or a silent wrong-type
    return (the arithmetic tier's fuzz contract)."""
    import random

    blob = J.encode_embedded_text_huff(
        [G1, G2], [(0, 0, 0), (5, 0, 1)], 12, 4)
    rng = random.Random(7)
    for _trial in range(400):
        b = bytearray(blob)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            out = J.decode_embedded(bytes(b))
            assert out.ndim == 2
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(blob), 3):
        try:
            J.decode_embedded(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
