"""Suite-level 10× scale anchor (round 19): run the frozen-33
baseline set PLUS the top-10 heaviest headline rows once at sf0.1
and once at ``.scale10`` (the perturbed 10× replication from
``gen_scale10.py``) in one warm session, and print per-query ratios.

This upgrades the per-operator 100× spot-checks into suite-level
evidence: a query whose ratio is far above 10× either has a
super-linear stage or a fixed-overhead-dominated sf0.1 leg — each
one gets a written adjudication in BASELINE.md.

Tables not replicated by gen_scale10.py (part, supplier) skip with
an explicit marker rather than silently vanishing.

Usage: SPARK_DRIVER_MEMORY=12g SPARK_GRAFT_CPUS=24 \\
    python tools/bench_scale10.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

# the 10 heaviest BENCH_LOCAL_r18 headline rows outside frozen-33
TOP10 = (
    "video_aligned_dedup_clusters",
    "video_frame_hash_check",
    "video_near_dup_clusters",
    "cross_format_image_dedup_check",
    "jpeg_progressive_hash_check",
    "crawl_ingest_check",
    "gif_anim_frame_hash_check",
    "image_ingest_finalize_check",
    "jpeg_pixel_hash_check",
    "cross_container_video_dedup_check",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale10"
    import bench

    names = list(bench.FROZEN33) + [
        n for n in TOP10 if n not in bench.FROZEN33
    ]
    spark = local_session("bench-scale10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    queries = registry.get_queries()
    spark.range(1).count()
    out = {}
    for name in names:
        row = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                              ("x10", scale_dir)):
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                row[label] = "skip:%s" % type(e).__name__
                break
            row[label] = round(time.time() - t0, 2)
            spark.catalog.clearCache()
        if isinstance(row.get("x10"), float) and isinstance(
                row.get("sf0.1"), float):
            row["ratio"] = round(row["x10"] / max(row["sf0.1"], 0.05), 1)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
