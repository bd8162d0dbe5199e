"""Fifth/sixth 100× sweeps: the tar/WebDataset source (member walk + md5 projection per row, map-side: ~linear with a ~7× member fan-out) and the sample regrouping (one groupBy on (shard, key): shuffle rows ∝ members, no skew by construction) (all
documents-only readers, so the ``.scale100`` replication covers
them).

Expected shapes:
- ``http_content_encoding_check`` — map-side fixture build + wire
  decode (dechunk, br/zstd stored-frame walk, charset sniff) per row,
  then a pure-Catalyst strip_html projection: scan-speed.
- ``mp4_sample_hash_check`` — map-side ISO-BMFF table walk + 3-4 md5s
  over ~2 KB samples per row, row-expanding: ~linear with a ~3.7×
  fan-out constant.
- ``mp4_byte_dedup_clusters`` — the sample hashes then the shared-set
  clustering core: signature nodes = |distinct hash sets| (12 fixture
  variants), so the pair stage is constant-size and growth is the
  map-side scan.
- ``image_ingest_finalize_check`` — three chained image_survivors
  slices (PNG decode + groupBy collapse + anti-join each) plus the
  hash-level finalization clustering: decode-dominated, ~linear; the
  two localCheckpoints bound lineage, not data.

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r14.py [scale_dir]
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
    "tar_members_check",
    "webdataset_group_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r14e")
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
