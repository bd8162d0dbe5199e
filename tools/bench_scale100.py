"""Suite-level 100× anchor: the frozen-33 baseline set at sf0.1 and
``.scale100full/`` (full-table 100× replication,
``gen_scale100full.py``) in one warm session — two decades of scale
over the SAME queries the per-round bench freezes.

``dedup_clusters`` (the fixed-cells fixture form, adjudicated
quadratic in BASELINE.md) is substituted by its scale sibling
``dedup_clusters_scaled`` — the cells∝corpus contract is the
documented 100 TB path; the fixed-cells form at 100× would be
~9000 s of within-cell cosine by design, not information.

Usage: SPARK_DRIVER_MEMORY=12g SPARK_GRAFT_CPUS=24 \\
    python tools/bench_scale100.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session


def main() -> None:
    scale_dir = (sys.argv[1] if len(sys.argv) > 1
                 else "/root/repo/.scale100full")
    import bench

    names = [n if n != "dedup_clusters" else "dedup_clusters_scaled"
             for n in bench.FROZEN33]
    spark = local_session("bench-scale100")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    queries = registry.get_queries()
    spark.range(1).count()
    out = {}
    for name in names:
        row = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                              ("x100", scale_dir)):
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                row[label] = "fail:%s" % type(e).__name__
                break
            row[label] = round(time.time() - t0, 2)
            spark.catalog.clearCache()
        if isinstance(row.get("x100"), float) and isinstance(
                row.get("sf0.1"), float):
            row["ratio"] = round(row["x100"] / max(row["sf0.1"], 0.05), 1)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
