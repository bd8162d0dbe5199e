"""Local twin of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and, where an oracle exists,
the same SQL on DuckDB; compare row count, column names, and
order-insensitive values.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import TABLE_NAMES, local_session


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = local_session("verify-local", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = registry.get_queries()
    oracles = registry.get_oracles()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            s_can, o_can = canon(srows, scols), canon(orows, ocols)
            if s_can != o_can:
                diffs = [
                    (a, b) for a, b in zip(s_can, o_can) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows match")
    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("all green")
    spark.stop()


if __name__ == "__main__":
    main()
