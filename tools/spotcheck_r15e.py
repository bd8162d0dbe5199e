"""100× scale spot-check for the round-15 surface, sweep E: the late ID3v2 and DOCX metadata tiers (map-side header walks) (all
documents-only readers, so the ``.scale100`` replication covers
them).

Expected shapes:
- ``mp3_frame_hash_check`` / ``webm_sample_hash_check`` /
  ``ogg_sample_hash_check`` — map-side fixture build + container walk
  + ≤4 md5s over ≤650-byte samples per row, row-expanding: ~linear
  with a ~3.5× fan-out constant.  The Ogg walk additionally CRCs
  every page byte (pure-Python table CRC) — a higher per-row constant,
  same linear shape.
- ``mp3_byte_dedup`` / ``cross_container_audio_dedup_check`` — the
  walk then the shared-set clustering core: signature nodes =
  |distinct hash sets| (12 / 20 fixture variants), so the pair stage
  is constant-size and growth is the map-side scan.
- ``audio_window_hash_check`` / ``audio_aligned_dedup_clusters`` —
  PCM16/µ-law decode + 4-6 envelope hashes per row; the aligned tier
  adds the constant-signature clustering core.
- ``zip_members_check`` / ``zip_group_check`` — stdlib central-
  directory walk + per-member CRC per row; the group face adds one
  partial-agg groupBy on (shard, key): ~linear.
- ``subtitle_parse_check`` — Catalyst regexp split/extract per row
  plus the per-id cue-index window (tiny skew-free groups): ~linear.
- ``subtitle_frame_align_check`` — MJPEG frame decode (the expensive
  side) + cue parse + id-equi range join: decode-dominated, ~linear.

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r15.py [scale_dir]
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
    "id3_meta_check",
    "docx_text_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r15e")
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
