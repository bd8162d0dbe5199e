"""100× scale spot-check for the round-18 reshaped fixtures (all
documents-only readers, so the ``.scale100`` replication covers
them).

Expected shapes:
- ``pdf_image_hash_check`` — re-profiled at 14 packagings: five new
  JBIG2 codings, four of them pure-Python MQ decode per 16×16
  region (~256 DECODE calls each) plus one MMR; map-side: ~linear.
- ``tiff_pixel_hash_check`` — re-profiled at 18 packagings (the two
  T.4-uncompressed fax spellings): ~linear.
- ``pdf_encrypted_text_check`` — re-profiled at 8 schemes: scheme 7
  runs Algorithm 2.B twice more per doc (one wrong candidate, one
  right) before decrypting; map-side: ~linear.
- ``dwca_archive_profile`` is fixture-only (no documents scan) and
  is NOT swept here; its event-archive extension adds one bounded
  validate_archive run per query.

Usage: SPARK_DRIVER_MEMORY=12g SPARK_GRAFT_CPUS=24 \\
    python tools/spotcheck_r18.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "pdf_image_hash_check",
    "tiff_pixel_hash_check",
    "pdf_encrypted_text_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r18")
    spark.sparkContext.setLogLevel("ERROR")
    # bound Arrow batches (the r16 OOM lesson): 1k rows/batch keeps
    # the double-mapInPandas stages ~0.4 GB per worker
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
