"""100× scale spot-check for the round-13 surface (all
documents-only readers, so the ``.scale100`` replication covers
them).

Expected shapes:
- ``jpeg_progressive_hash_check`` — map-side Arrow blob build +
  multi-scan Huffman decode per row (a row-linear Python kernel like
  the baseline JPEG tier), einsum-IDCT final pass: ~linear in rows.
- ``jpeg_pixel_hash_check`` — re-measured for the einsum-IDCT effect
  vs its r12 number (same fixtures, vectorized final pass).
- ``charset_decode_check`` — map-side sniff + decode per row, then a
  pure-Catalyst wet_extract projection: scan-speed.
- ``video_frame_hash_check`` — RIFF walk + 2-4 JPEG frame decodes per
  row, row-expanding: ~linear with a ~3× fan-out constant.
- ``video_near_dup_clusters`` — frame-0 decode per row then the
  shared _hash_cluster core: LSH nodes = |distinct signatures| (6
  fixture classes), so the pair stage is constant-size and the
  growth is the decode scan.
- ``sentence_stats_abbrev_docs`` — the sentence_stats projection plus
  ONE extra regexp_replace (the abbreviation mask): scan-speed,
  sibling of sentence_stats_docs.
- ``multimodal_frame_sample`` / ``multimodal_decode_stub`` — the
  re-pointed real paths: AVI walk + md5 projection / header parse,
  both map-side: ~linear.

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r13.py [scale_dir]
(the 4 g default heap OOMs on 100x sweeps, same as the BASELINE.md
10x note)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "jpeg_progressive_hash_check",
    "jpeg_pixel_hash_check",
    "charset_decode_check",
    "video_frame_hash_check",
    "video_near_dup_clusters",
    "sentence_stats_abbrev_docs",
    "multimodal_frame_sample",
    "multimodal_decode_stub",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r13")
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
