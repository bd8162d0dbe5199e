"""100× scale spot-check for the round-16 surface (all
documents-only readers, so the ``.scale100`` replication covers
them).

Expected shapes:
- ``xlsx_text_check`` / ``pptx_text_check`` — map-side fixture build
  + stdlib zip walk (per-member CRC) + regex XML run extraction per
  row, no shuffle: ~linear.
- ``pdf_image_hash_check`` — COS parse + per-image decode (JPEG /
  zlib) + two 64-bit hashes per row, map-side: ~linear; the DCT
  variant's in-plan fixture JPEG ENCODE dominates the constant (the
  documented video-tier signature).
- ``pdf_encrypted_text_check`` — COS parse + MD5 key derivation +
  pure-Python RC4/AES-CBC over KB-scale content streams per row:
  ~linear with a Python-cipher constant (AES ~3 KB/page here).
- ``wav_mp3_frame_hash_check`` / ``wav_mp3_cross_dedup`` — RIFF chunk
  walk + MP3 frame-sync walk + ≤4 md5s per row; the dedup face adds
  the constant-signature clustering core: ~linear.
- ``tiff_pixel_hash_check`` — IFD walk + strip decode (LZW is a
  pure-Python dictionary coder — the expensive constant) + hash
  grid per row, map-side: ~linear.

Usage: SPARK_DRIVER_MEMORY=12g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r16.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "xlsx_text_check",
    "pptx_text_check",
    "pdf_image_hash_check",
    "pdf_encrypted_text_check",
    "wav_mp3_frame_hash_check",
    "wav_mp3_cross_dedup",
    "tiff_pixel_hash_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r16")
    spark.sparkContext.setLogLevel("ERROR")
    # bound Arrow batches: at 10k rows/batch the double-mapInPandas
    # stages transiently hold multi-GB per worker on 500k-row sweeps
    # (one OOM-killed run proved it); 1k keeps workers ~0.4 GB
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
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
