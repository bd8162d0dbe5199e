"""Generate the 10× scaling spot-check dataset at ``.scale10/``
(gitignored) from /root/testdata/sf0.1 — see BASELINE.md appendix.

Replication is PERTURBED so the new rows are not near-duplicates of
their originals (which would inflate every near-dup operator's
workload quadratically instead of scaling it):

- documents: every word ending in a vowel gets a replica-id suffix —
  word-bigram Jaccard between replicas of the same doc falls well
  below the 0.5 contamination threshold, while planted near-dup PAIRS
  within a replica are preserved exactly (both members perturb the
  same way), keeping near-dup density per row constant.
- embeddings: a hash-chosen half of the signs flip per replica —
  cross-replica cosine concentrates near 0 (tail ≲0.45), so replicas
  do not form near-dup cliques at production thresholds, while
  within-replica neighbor structure is preserved exactly.
- lineitem: key-offset replication (q1 is a pure scan-aggregate).

Round-6 widening for the JOIN-heavy spot-check (orders/customer/
events/nation/region):
- orders replicate with the SAME orderkey offset as lineitem, so
  lineitem↔orders FK integrity holds across replicas; o_custkey
  offsets to each replica's own customers (per-customer order fan-out
  stays constant — the realistic scale-up).
- customer replicates with offset custkeys, nationkeys unchanged:
  dims nation/region stay TINY (copied verbatim) — exactly the
  broadcast-dimension premise being tested.
- events replicate with offset event_ids AND offset user_ids, same
  timestamps: per-user event counts/sessions stay constant, so the
  as-of union-window and interval-bucket joins scale by USERS (more
  groups), not by per-group state.

Usage: python tools/gen_scale10.py [out_dir]
"""

from __future__ import annotations

import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale10"
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
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
      FROM read_parquet('{SRC}/documents.parquet'), range(0,10) r(rep)
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
      FROM read_parquet('{SRC}/embeddings.parquet'), range(0,10) r(rep)
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT l_orderkey + rep*6000000 AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{SRC}/lineitem.parquet'), range(0,10) r(rep)
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT o_orderkey + rep*6000000 AS o_orderkey,
             o_custkey + rep*1000000 AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'), range(0,10) r(rep)
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT c_custkey + rep*1000000 AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM read_parquet('{SRC}/customer.parquet'), range(0,10) r(rep)
    ) TO '{out}/customer.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT event_id + rep*1000000 AS event_id, ts,
             user_id + rep*100000 AS user_id, event_type, value, props
      FROM read_parquet('{SRC}/events.parquet'), range(0,10) r(rep)
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
