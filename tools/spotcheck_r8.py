"""100× scale spot-check for the round-8 operators.

Runs each new operator at sf0.1 (5k docs) and at ``.scale100``
(500k docs — 100×) in one warm session with a results-discarded noop
sink, printing wall seconds and the 100× ratio.  The operators under
test and their expected scale shapes:

- ``dedup_priority_keepers`` — one fingerprint projection + one
  row_number shuffle on the fingerprint: ~linear.
- ``token_budget_by_group`` — one (source, bucket) histogram
  (bounded output), a broadcast bounds join, and a group-partitioned
  boundary window: ~linear, driver footprint constant.
- ``temperature_mixture_stats`` — one bounded aggregation + one
  map-side CASE filter: ~linear, no corpus shuffle.

Usage: SPARK_GRAFT_CPUS=32 python tools/spotcheck_r8.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "dedup_priority_keepers",
    "token_budget_by_group",
    "temperature_mixture_stats",
    # late round-8 additions (documents-only readers, so the .scale100
    # replication covers them): epoch planning (bounded agg + map-side
    # explode), snapshot diff (two dedup-shaped aggs + one
    # fingerprint-keyed full-outer join), bigram surprisal (compact
    # pair aggregate + two windows over it)
    "epoch_repeat_stats",
    "corpus_diff_summary",
    "bigram_surprisal_scores",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r8")
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
        row["ratio"] = round(row["x100"] / max(row["sf0.1"], 0.1), 1)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
