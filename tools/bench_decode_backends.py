"""Decode-backend throughput bench: pure vs auto (PIL when present).

The r13 verdict's standing perf-weak item is the pure-Python decode
kernel family's per-byte throughput (plan shape is fine — map-side,
no shuffle — but a native codec is 1-2 orders faster per byte).  The
production default is now ``backend='auto'``; this script measures
what that buys on the current container, per format, and prints ONE
JSON line so a PIL-bearing CI can record the auto-backend row the
verdict asked for.

Usage: python tools/bench_decode_backends.py [n_images]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark.operators import multimodal as mm


def bench(fn, blobs, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        for b in blobs:
            fn(b)
        best = min(best, time.perf_counter() - t0)
    return len(blobs) / best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    pil = mm._pil_available()
    fixtures = {
        "jpeg": [
            mm.jpeg_encode(mm._jpeg_fixture_pixels(c % 12)) for c in range(n)
        ],
        "png": [
            mm.png_encode(mm._png_fixture_pixels(c % 24)[0]) for c in range(n)
        ],
    }
    out = {"pil_available": pil, "imgs": n, "unit": "imgs/sec"}
    for fmt, blobs in fixtures.items():
        out[f"{fmt}_pure"] = round(
            bench(lambda b: mm.decode_image_pixels(b, "pure"), blobs), 1
        )
        out[f"{fmt}_auto"] = round(
            bench(lambda b: mm.decode_image_pixels(b, "auto"), blobs), 1
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
