"""Second 100× sweep for the LATE round-13 surface (operators landed
after the first SPOTCHECK_r13 run) — same documents-only readers, same
method.

Expected shapes:
- ``video_aligned_dedup_clusters`` — frame decodes per row, then the
  signature collapse + capped per-hash pair buckets: pair stage sized
  by |distinct frame-hash sets| (4 fixture classes), growth = decode
  scan.
- ``http_wire_decode_check`` — map-side dechunk + inflate + sniff per
  row: scan-speed.
- ``png_interlace_hash_check`` — Adam7 defilter per row (the PNG
  kernel, 7 small passes instead of one): ~linear.
- ``bmp_rle_pixel_hash_check`` — RLE expansion per row: ~linear.
- ``audio_codec_feature_check`` — table-lookup / frombuffer decode:
  scan-speed.
- ``gif_anim_frame_hash_check`` — LZW + composition per frame,
  row-expanding like the AVI tier: ~linear with the fan-out constant.

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r13b.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "video_aligned_dedup_clusters",
    "http_wire_decode_check",
    "png_interlace_hash_check",
    "bmp_rle_pixel_hash_check",
    "audio_codec_feature_check",
    "gif_anim_frame_hash_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r13b")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()
    out = {}
    for name in OPS:
        row = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                              ("x100", scale_dir)):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            row[label] = round(time.time() - t0, 1)
            spark.catalog.clearCache()
        row["ratio"] = round(row["x100"] / max(row["sf0.1"], 0.1), 1)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
