"""100× scale spot-check for the round-19 reshaped fixture.

``pdf_image_hash_check`` re-profiled at 16 packagings: the new
jbig2-huff class decodes an SDHUFF symbol dictionary (Huffman DH/DW
reads + one MMR collective bitmap per height class) and an SBHUFF
custom-table text region per 16×16 plane — pure-Python bit reads
but bounded per document, so the map-side shape stays ~linear.

Usage: SPARK_DRIVER_MEMORY=12g SPARK_GRAFT_CPUS=24 \\
    python tools/spotcheck_r19.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = ("pdf_image_hash_check",)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r19")
    spark.sparkContext.setLogLevel("ERROR")
    # bound Arrow batches (the r16 OOM lesson)
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
