"""Time selected registry queries with the bench methodology (plan +
noop write) in isolation.  Usage:
    python tools/time_queries.py [--sf DIR] [--cpus N] name [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    cpus = 32
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--cpus" in args:
        i = args.index("--cpus")
        cpus = int(args[i + 1])
        del args[i:i + 2]
    spark = local_session("time-queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()
    spark.range(1).count()  # warm codegen path
    for name in args:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"{time.perf_counter() - t0:8.3f}  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
