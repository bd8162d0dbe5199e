"""Sink layout tests: partition pruning actually prunes, bucketed
self-joins actually skip the shuffle."""

import os

from dwc_dataframe_validator_spark.sources.sinks import (
    write_bucketed,
    write_partitioned,
)


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["id", "cat"]
    )
    path = str(tmp_path / "part_out")
    write_partitioned(df, path, ["cat"])
    assert os.path.isdir(os.path.join(path, "cat=a"))
    back = spark.read.parquet(path).filter("cat = 'a'")
    assert back.count() == 2
    # partition filter must appear as a partition filter, not a data filter
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_write_bucketed_join_skips_shuffle(spark):
    # managed tables land in ./spark-warehouse (gitignored); DROP
    # removes the files afterwards
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        # a table this small would be broadcast (and bucketing ignored);
        # disable broadcast to surface the bucketed sort-merge path a
        # big fact-fact join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        write_bucketed(df, "t_bucketed_a", ["k"], num_buckets=4)
        write_bucketed(df, "t_bucketed_b", ["k"], num_buckets=4)
        a = spark.table("t_bucketed_a")
        b = spark.table("t_bucketed_b")
        joined = a.join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 1000
        # co-located bucketed join: scans read bucketed, no shuffle
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")
