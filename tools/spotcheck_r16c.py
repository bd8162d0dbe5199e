"""100x scale spot-check for the LATEST round-16 surface: the
MIME mail tier (stdlib parse + strict transfer-encoding decode
per row) and the five-format office-union composition — both
map-side single projections: ~linear.

Usage: SPARK_DRIVER_MEMORY=12g SPARK_GRAFT_CPUS=24 \
    python tools/spotcheck_r16c.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "eml_text_check",
    "office_corpus_token_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r16c")
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
