"""100× spot-check for the flagship text pipelines — see BASELINE.md.

Runs ``pretraining_pipeline_v2_check`` once at sf0.1 and once at the
.scale100 replication (one warm session, results-discarded count()
sink), printing wall times and the scale ratio.  The incremental
ingest loop's 100× evidence comes from ``soak_ingest.py .scale100``
(which also re-verifies exact one-shot equality at 500k docs).

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
       python tools/spotcheck100.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck100")
    out = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                          ("x100", scale_dir)):
        t0 = time.time()
        n = registry.pretraining_pipeline_v2_check(spark, sf_dir).count()
        out[label] = {"sec": round(time.time() - t0, 1), "rows": n}
        print(f"{label}: {out[label]}", file=sys.stderr)
    out["ratio"] = round(out["x100"]["sec"] / out["sf0.1"]["sec"], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
