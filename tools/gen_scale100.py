"""Generate the 100× spot-check dataset at ``.scale100/`` (gitignored):
``documents`` replicated 100× from sf0.1 (500k docs, ~6 GB of text)
with the same vowel-suffix perturbation as ``gen_scale10.py`` — each
replica rewrites word-final vowels with its replica id, so replicas
are NOT near-duplicates of their originals and per-row near-dup /
contamination density stays constant while volume scales.

Only ``documents`` is produced: the round-7 ask is one more decade of
scale evidence for the two flagship TEXT pipelines
(``pretraining_pipeline_v2_check`` and the incremental ingest loop),
which read nothing else.

Usage: python tools/gen_scale100.py [out_dir]
"""

from __future__ import annotations

import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
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
      FROM read_parquet('{SRC}/documents.parquet'), range(0,100) r(rep)
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    n, sz = con.execute(
        f"SELECT count(*), sum(len(text)) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()
    print("documents", n, "rows,", round(sz / 1e9, 2), "GB text")


if __name__ == "__main__":
    main()
