"""100× spot-check for token-budget selection — the round-8 flagship
addition to the scale-evidence trail (BASELINE.md addendum family).

Runs the one-pass score+count projection feeding
``select_token_budget`` at sf0.1 (5k docs, budget 15k tokens) and at
the ``.scale100`` replication (500k docs, budget 1.5M tokens — same
selected fraction, so the boundary-bucket behavior is comparable),
in one warm session with a results-discarded noop sink.  Then
re-verifies EXACTNESS at 100×: the two-phase bucketed selection must
equal DuckDB's naive global-window prefix on the same 500k rows.

The scale claim under test: phase 1 is one map-side bucket expression
plus one bounded-output aggregation; the driver holds only the
histogram (score-range/granularity rows, NOT corpus-sized); phase 2
touches one boundary bucket.  Wall time should therefore scale
~linearly with corpus size and the driver footprint not at all.

Usage: SPARK_GRAFT_CPUS=32 python tools/spotcheck_selection100.py [scale_dir]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.operators import selection, text
from dwc_dataframe_validator_spark.sources.tables import (
    load_table,
    local_session,
)


def run_selection(spark, sf_dir: str, budget: int):
    docs = load_table(spark, sf_dir, "documents")
    j = text.model_quality_score(
        docs.withColumn("n_tokens", text.token_count(F.col("text"))),
        keep_cols=("n_tokens",),
    ).select("doc_id", "quality_logit", "n_tokens")
    return selection.select_token_budget(
        j, budget, "quality_logit", "n_tokens"
    )


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-selection100")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, sf_dir, budget in (
        ("sf0.1", "/root/testdata/sf0.1", 15_000),
        ("x100", scale_dir, 1_500_000),
    ):
        t0 = time.time()
        sel = run_selection(spark, sf_dir, budget)
        sel.write.format("noop").mode("overwrite").save()
        out[label] = {"sec": round(time.time() - t0, 1)}
        print(f"{label}: {out[label]}", file=sys.stderr)
    out["ratio"] = round(out["x100"]["sec"] / out["sf0.1"]["sec"], 1)

    # exactness at 100×: two-phase == naive global window (DuckDB)
    sel = run_selection(spark, scale_dir, 1_500_000)
    got = sorted(r["doc_id"] for r in sel.select("doc_id").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{scale_dir}/documents.parquet')"
    )
    oracle = registry._token_budget_oracle_sql(1_500_000)
    want = sorted(r[0] for r in con.execute(oracle).fetchall())
    out["x100_rows"] = len(got)
    out["x100_exact"] = got == want
    print(json.dumps(out))
    spark.stop()
    if not out["x100_exact"]:
        raise SystemExit("100x selection does not match the naive oracle")


if __name__ == "__main__":
    main()
