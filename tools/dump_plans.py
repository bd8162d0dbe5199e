"""Dump the formatted physical plan of registry queries to files.
Usage:
    python tools/dump_plans.py OUTDIR SUFFIX name [name ...]
writes OUTDIR/<name>_<SUFFIX>.txt with df.explain("formatted") output
(the pre-execution plan, same form the r19 evidence used)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    spark = local_session("dump-plans", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
