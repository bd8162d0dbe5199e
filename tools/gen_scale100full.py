"""Generate the FULL-TABLE 100× dataset at ``.scale100full/`` —
the 100-replica twin of ``gen_scale10.py`` (same perturbations:
vowel-suffix rewriting keeps cross-replica text Jaccard below the
near-dup thresholds, hash-chosen sign flips keep cross-replica
cosine near 0, key offsets preserve FK integrity and per-group
fan-out).  Unlike ``.scale100`` (documents only, for the
per-operator media spot-checks), this replicates every table the
frozen-33 suite reads — ~60M lineitem rows / 500k docs — so the
suite-level anchor can run at two decades of scale.

Usage: python tools/gen_scale100full.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 100


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100full"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    R = REPS
    con.execute(f"""
    COPY (
      SELECT doc_id + rep*10000 AS doc_id,
             CASE WHEN rep = 0 THEN text
                  ELSE regexp_replace(text, '([aeiou])\\b',
                                      '\\1' || CAST(rep AS VARCHAR), 'g')
             END AS text,
             lang, source,
             CAST(len(CASE WHEN rep = 0 THEN text
                  ELSE regexp_replace(text, '([aeiou])\\b',
                       '\\1' || CAST(rep AS VARCHAR), 'g') END)
                  AS BIGINT) AS n_chars
      FROM read_parquet('{SRC}/documents.parquet'), range(0,{R}) r(rep)
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT vec_id + rep*2000 AS vec_id,
             CASE WHEN rep = 0 THEN embedding
                  ELSE list_transform(
                         list_zip(embedding, range(1, len(embedding)+1)),
                         z -> CASE WHEN hash(z[2]*101 + rep) % 2 = 0
                                   THEN CAST(-z[1] AS FLOAT) ELSE z[1] END)
             END AS embedding,
             label
      FROM read_parquet('{SRC}/embeddings.parquet'), range(0,{R}) r(rep)
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT l_orderkey + rep*6000000 AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{SRC}/lineitem.parquet'), range(0,{R}) r(rep)
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT o_orderkey + rep*6000000 AS o_orderkey,
             o_custkey + rep*1000000 AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'), range(0,{R}) r(rep)
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT c_custkey + rep*1000000 AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM read_parquet('{SRC}/customer.parquet'), range(0,{R}) r(rep)
    ) TO '{out}/customer.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT event_id + rep*1000000 AS event_id, ts,
             user_id + rep*100000 AS user_id, event_type, value, props
      FROM read_parquet('{SRC}/events.parquet'), range(0,{R}) r(rep)
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    for t in ["nation", "region"]:
        con.execute(f"""
        COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
        TO '{out}/{t}.parquet' (FORMAT PARQUET)
        """)
    for t in ["documents", "embeddings", "lineitem", "orders",
              "customer", "events", "nation", "region"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
