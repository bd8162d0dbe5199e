"""RFC 7932 data tables: literal-context LUTs, the 121 word
transforms, and the 122,784-byte static dictionary.

All of this is PUBLIC data (RFC 7932 appendices A and B).  The
copies here were derived mechanically from the canonical reference
implementation (Node.js zlib's bundled brotli) by
``tools/derive_brotli_tables.py``: crafted streams whose decoded
output reveals each table entry — context LUTs via two-tree
bit-slice probes, transforms via probe words under every transform
id, the dictionary via out-of-window copy references.  pytest
re-verifies every table against node whenever node is present.

Generated file — regenerate with the tool, do not hand-edit the
arrays.
"""
import os
import zlib

_HERE = os.path.dirname(__file__)

CTX_UTF8_P1 = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 4, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 12, 16, 12, 12, 20, 12, 16, 24,
    28, 12, 12, 32, 12, 36, 12, 44, 44, 44, 44, 44, 44, 44, 44, 44,
    44, 32, 32, 24, 40, 28, 12, 12, 48, 52, 52, 52, 48, 52, 52, 52,
    48, 52, 52, 52, 52, 52, 48, 52, 52, 52, 52, 52, 48, 52, 52, 52,
    52, 52, 24, 12, 28, 12, 12, 12, 56, 60, 60, 60, 56, 60, 60, 60,
    56, 60, 60, 60, 60, 60, 56, 60, 60, 60, 60, 60, 56, 60, 60, 60,
    60, 60, 24, 12, 28, 12, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 1, 0, 1, 0, 1, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2,
    3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2,
    3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2,
    3, 2, 3, 2, 3
]

CTX_UTF8_P2 = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 1, 1, 1, 1, 1, 1, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 1, 1, 1, 1, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2
]

CTX_SIGNED = [
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7
]

CTX_SIGNED_P2 = [
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7
]

TRANSFORMS = [
    (b'', 'identity', 0, b''),
    (b'', 'identity', 0, b' '),
    (b' ', 'identity', 0, b' '),
    (b'', 'omit_first', 1, b''),
    (b'', 'ferment_first', 0, b' '),
    (b'', 'identity', 0, b' the '),
    (b' ', 'identity', 0, b''),
    (b's ', 'identity', 0, b' '),
    (b'', 'identity', 0, b' of '),
    (b'', 'ferment_first', 0, b''),
    (b'', 'identity', 0, b' and '),
    (b'', 'omit_first', 2, b''),
    (b'', 'omit_last', 1, b''),
    (b', ', 'identity', 0, b' '),
    (b'', 'identity', 0, b', '),
    (b' ', 'ferment_first', 0, b' '),
    (b'', 'identity', 0, b' in '),
    (b'', 'identity', 0, b' to '),
    (b'e ', 'identity', 0, b' '),
    (b'', 'identity', 0, b'"'),
    (b'', 'identity', 0, b'.'),
    (b'', 'identity', 0, b'">'),
    (b'', 'identity', 0, b'\n'),
    (b'', 'omit_last', 3, b''),
    (b'', 'identity', 0, b']'),
    (b'', 'identity', 0, b' for '),
    (b'', 'omit_first', 3, b''),
    (b'', 'omit_last', 2, b''),
    (b'', 'identity', 0, b' a '),
    (b'', 'identity', 0, b' that '),
    (b' ', 'ferment_first', 0, b''),
    (b'', 'identity', 0, b'. '),
    (b'.', 'identity', 0, b''),
    (b' ', 'identity', 0, b', '),
    (b'', 'omit_first', 4, b''),
    (b'', 'identity', 0, b' with '),
    (b'', 'identity', 0, b"'"),
    (b'', 'identity', 0, b' from '),
    (b'', 'identity', 0, b' by '),
    (b'', 'omit_first', 5, b''),
    (b'', 'omit_first', 6, b''),
    (b' the ', 'identity', 0, b''),
    (b'', 'omit_last', 4, b''),
    (b'', 'identity', 0, b'. The '),
    (b'', 'ferment_all', 0, b''),
    (b'', 'identity', 0, b' on '),
    (b'', 'identity', 0, b' as '),
    (b'', 'identity', 0, b' is '),
    (b'', 'omit_last', 7, b''),
    (b'', 'omit_last', 1, b'ing '),
    (b'', 'identity', 0, b'\n\t'),
    (b'', 'identity', 0, b':'),
    (b' ', 'identity', 0, b'. '),
    (b'', 'identity', 0, b'ed '),
    (b'', 'omit_first', 9, b''),
    (b'', 'omit_first', 7, b''),
    (b'', 'omit_last', 6, b''),
    (b'', 'identity', 0, b'('),
    (b'', 'ferment_first', 0, b', '),
    (b'', 'omit_last', 8, b''),
    (b'', 'identity', 0, b' at '),
    (b'', 'identity', 0, b'ly '),
    (b' the ', 'identity', 0, b' of '),
    (b'', 'omit_last', 5, b''),
    (b'', 'omit_last', 9, b''),
    (b' ', 'ferment_first', 0, b', '),
    (b'', 'ferment_first', 0, b'"'),
    (b'.', 'identity', 0, b'('),
    (b'', 'ferment_all', 0, b' '),
    (b'', 'ferment_first', 0, b'">'),
    (b'', 'identity', 0, b'="'),
    (b' ', 'identity', 0, b'.'),
    (b'.com/', 'identity', 0, b''),
    (b' the ', 'identity', 0, b' of the '),
    (b'', 'ferment_first', 0, b"'"),
    (b'', 'identity', 0, b'. This '),
    (b'', 'identity', 0, b','),
    (b'.', 'identity', 0, b' '),
    (b'', 'ferment_first', 0, b'('),
    (b'', 'ferment_first', 0, b'.'),
    (b'', 'identity', 0, b' not '),
    (b' ', 'identity', 0, b'="'),
    (b'', 'identity', 0, b'er '),
    (b' ', 'ferment_all', 0, b' '),
    (b'', 'identity', 0, b'al '),
    (b' ', 'ferment_all', 0, b''),
    (b'', 'identity', 0, b"='"),
    (b'', 'ferment_all', 0, b'"'),
    (b'', 'ferment_first', 0, b'. '),
    (b' ', 'identity', 0, b'('),
    (b'', 'identity', 0, b'ful '),
    (b' ', 'ferment_first', 0, b'. '),
    (b'', 'identity', 0, b'ive '),
    (b'', 'identity', 0, b'less '),
    (b'', 'ferment_all', 0, b"'"),
    (b'', 'identity', 0, b'est '),
    (b' ', 'ferment_first', 0, b'.'),
    (b'', 'ferment_all', 0, b'">'),
    (b' ', 'identity', 0, b"='"),
    (b'', 'ferment_first', 0, b','),
    (b'', 'identity', 0, b'ize '),
    (b'', 'ferment_all', 0, b'.'),
    (b'\xc2\xa0', 'identity', 0, b''),
    (b' ', 'identity', 0, b','),
    (b'', 'ferment_first', 0, b'="'),
    (b'', 'ferment_all', 0, b'="'),
    (b'', 'identity', 0, b'ous '),
    (b'', 'ferment_all', 0, b', '),
    (b'', 'ferment_first', 0, b"='"),
    (b' ', 'ferment_first', 0, b','),
    (b' ', 'ferment_all', 0, b'="'),
    (b' ', 'ferment_all', 0, b', '),
    (b'', 'ferment_all', 0, b','),
    (b'', 'ferment_all', 0, b'('),
    (b'', 'ferment_all', 0, b'. '),
    (b' ', 'ferment_all', 0, b'.'),
    (b'', 'ferment_all', 0, b"='"),
    (b' ', 'ferment_all', 0, b'. '),
    (b' ', 'ferment_first', 0, b'="'),
    (b' ', 'ferment_all', 0, b"='"),
    (b' ', 'ferment_first', 0, b"='"),
]

_DICT_CACHE = None


def dictionary() -> bytes:
    """The static dictionary bytes (zlib-stored sidecar)."""
    global _DICT_CACHE
    if _DICT_CACHE is None:
        path = os.path.join(_HERE, "brotli_dictionary.bin.zlib")
        with open(path, "rb") as f:
            _DICT_CACHE = zlib.decompress(f.read())
    return _DICT_CACHE
