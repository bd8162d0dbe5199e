"""100× scale spot-check for the operators ADDED in round 12 (all
documents-only readers — ``.scale100`` covers them); companion to
``spotcheck_r12.py``, which swept the round-11 surface.

Expected shapes:
- ``audio_pcm_feature_check`` / ``audio_hash_dedup_clusters`` —
  map-side Arrow WAV decode per row (+ for the dedup, the shared
  exact-collapse banded-LSH over 16 distinct envelope hashes):
  ~linear, with the dedup's LSH stage near-constant (node count =
  |distinct hashes| = 16 regardless of corpus size).
- ``gif_pixel_hash_check`` / ``bmp_pixel_hash_check`` — map-side
  decode kernels (hand-rolled LZW / numpy row reshapes): ~linear.
- ``sentence_stats_docs`` — three stacked map-side projections:
  scan-speed.
- ``robots_filter_check`` — broadcast rule table + map-side regex +
  one id groupBy/anti-join: ~linear.
- ``crawl_ingest_check`` — two crawl slices with a cross-slice URL
  screen + finalize cap: the web_corpus_pipeline_v2 shape (~4× at
  100× last sweep) plus the slice-2 anti-join.
- ``kn_surprisal_scores`` — re-measured after the single-scan
  restructure (7.4× in the r12 sweep pre-restructure-bench).

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r12b.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "sentence_stats_docs",
    "audio_pcm_feature_check",
    "audio_hash_dedup_clusters",
    "gif_pixel_hash_check",
    "bmp_pixel_hash_check",
    "robots_filter_check",
    "crawl_ingest_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r12b")
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
