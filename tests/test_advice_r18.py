"""Round-18 ADVICE pins.

- TIFF Compression 8 (Deflate) honors the module's bomb-guard
  contract: output is capped BEFORE allocation (decompressobj with
  max_length), matching the hard ``cap`` the LZW/PackBits paths take.
- The brotli metadata/MLEN header edges live in test_brotli.py
  (test_metadata_mskiplen_edge_cases).
"""
import struct
import zlib

import numpy as np


def _mm():
    from dwc_dataframe_validator_spark.operators import multimodal
    return multimodal


def _deflate_strip_tiff():
    mm = _mm()
    y, x = np.mgrid[0:4, 0:4]
    rgb = np.stack(
        [(y * 7 + x) % 256, x * 5 % 256, y * 11 % 256], axis=2
    ).astype(np.uint8)
    return rgb, bytearray(
        mm.tiff_encode(rgb, compression="deflate", rows_per_strip=4)
    )


def _splice_strip(blob: bytearray, payload: bytes) -> bytes:
    """Replace the (file-final) deflate strip and patch tag 279."""
    i = bytes(blob).find(b"\x78")
    nb = bytearray(blob[:i]) + payload
    n_entries = struct.unpack_from("<H", nb, 8)[0]
    for k in range(n_entries):
        off = 10 + 12 * k
        tag, _typ, _cnt = struct.unpack_from("<HHI", nb, off)
        if tag == 279:
            struct.pack_into("<I", nb, off + 8, len(payload))
    return bytes(nb)


def test_tiff_deflate_bomb_capped():
    """A crafted strip decompressing to 64 MiB must be refused
    WITHOUT materializing: peak traced allocation stays ~KB-scale."""
    import tracemalloc

    mm = _mm()
    rgb, blob = _deflate_strip_tiff()
    assert mm.tiff_decode_pixels(bytes(blob)) is not None
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)
    crafted = _splice_strip(blob, bomb)
    tracemalloc.start()
    out = mm.tiff_decode_pixels(crafted)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert out is None
    assert peak < 4 << 20, f"bomb materialized: peak={peak}"


def test_tiff_deflate_trailing_bytes_still_tolerated():
    """zlib.decompress ignored trailing compressed-stream bytes; the
    capped decompressobj path must keep that tolerance (padded
    strips in the wild)."""
    mm = _mm()
    rgb, blob = _deflate_strip_tiff()
    good = zlib.compress(rgb.tobytes())
    padded = _splice_strip(blob, good + b"\x00\x00\x00\x00")
    dec = mm.tiff_decode_pixels(padded)
    assert dec is not None and (dec == rgb).all()


def test_tiff_deflate_short_output_refused():
    """A stream decoding to FEWER bytes than the strip needs is a
    length lie -> None (unchanged behavior under the new path)."""
    mm = _mm()
    rgb, blob = _deflate_strip_tiff()
    short = zlib.compress(rgb.tobytes()[:-5])
    assert mm.tiff_decode_pixels(_splice_strip(blob, short)) is None
