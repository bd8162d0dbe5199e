"""100× scale spot-check for the round-11/12 surface (all
documents-only readers, so the ``.scale100`` replication covers
them), plus a quiet-window re-measure of the three PSL-affected URL
queries that moved >2× vs r10 (documented plan change — the 330-rule
registrable-domain ladder — but the absolute growth should stay
linear).

Expected shapes:
- ``image_pixel_hash_check`` / ``image_phash_dedup_clusters`` —
  map-side Arrow PNG decode per row (the known Python-kernel
  throughput ceiling for Average/Paeth rows), then groupBy on the
  16-char hash + capped band join over DISTINCT hashes only: ~linear
  in rows, with the dedup's pair stage bounded by fixture classes.
- ``wet_main_content_docs`` — one map-side paragraph projection + one
  doc-id window + same-partitioning aggregate: ~linear.
- ``web_corpus_pipeline_v2_check`` — WARC serialize/decode + jusText
  + URL dedup window + two-phase domain cap: ~linear.
- ``text_language_id_v2`` — two stacked map-side projections (11
  regexp counters, then integer CASE ladders): scan-speed.
- ``kn_surprisal_scores`` — one tokenize pass (AQE stage reuse pins
  the N_B branch to the same map output), then windows over compact
  per-(doc,prev,cur) rows: cost grows with distinct bigram usage,
  like the bigram scorer's documented shape.
- ``url_normalize_check`` / ``domain_mix_report`` /
  ``domain_cap_keepers`` — per-row InSet probe ladder evaluated once
  per row + at most one groupBy / two-phase top-k: ~linear.

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r12.py [scale_dir]
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
    "text_language_id_v2",
    "kn_surprisal_scores",
    "wet_main_content_docs",
    "web_corpus_pipeline_v2_check",
    "image_pixel_hash_check",
    "image_phash_dedup_clusters",
    "url_normalize_check",
    "domain_mix_report",
    "domain_cap_keepers",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r12")
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
