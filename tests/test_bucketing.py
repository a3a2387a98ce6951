"""Bucketed-table co-located join: pre-bucketing both sides of a hot join
key eliminates the join shuffle entirely — the warehouse-layout lever for
repeated 100 TB joins (SURVEY §4.2 'partitioning'). Asserts the physical
plan of a bucketed join has NO Exchange."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cs_5542_lab_6_spark.sources import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .saveAsTable("b_lineitem")
    )
    # disable broadcast so the join takes the sort-merge path it would at
    # 100 TB (at fixture scale Spark would broadcast the whole table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # bucket-aligned sort-merge join: zero exchanges before the join; the
    # only exchange allowed is the final aggregation's
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert not re.findall(r"\(\d+\) Exchange", join_section), join_section

    # same row count as the unbucketed join
    direct = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert spark.table("b_lineitem").join(
        spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    ).count() == direct
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
