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
    for t in ["documents", "embeddings", "lineitem"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
