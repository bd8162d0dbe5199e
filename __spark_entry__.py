"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the validator's single-pass
occurrence-metrics aggregate over a synthetic occurrence view of the
sf0.001 ``events`` table).  ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions; oracles are exact DuckDB equivalents (see
dwc_dataframe_validator_spark/registry.py for the decimal/double
determinism rules that make the comparison bit-exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dwc_dataframe_validator_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["occurrence_validation_metrics"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased identically in the
    matching ``oracle_sql`` entry.
    """
    return registry.get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query.  The few
    keys absent here (xxhash64 MinHash LSH / SimHash, hyperplane
    rp-LSH, HLL, trained-IVF, real-BPE counts) are genuinely not
    portable SQL — engine-specific hashing, iterative k-means, or
    estimate-valued sketches.  (The former media decode/frame-sample
    stubs gained real codec-free decode paths and exact oracles in
    round 13.)  Each has an ORACLED sibling of the
    same semantics family (minhash_lsh_check / simhash_signature_check
    via portable md5 hashing, dedup_embedding_cosine, ann_ivf_topk,
    exact_distinct_users, text_token_stats), and pytest pins the
    rows-only variants with planted duplicates/clusters, recall bounds,
    and stub determinism.
    """
    return registry.get_oracles()
