"""Bucketed co-located join (SURVEY.md §4.2 / pyspark guide
"Partitioning & shuffle"): writing both join sides bucketed on the
join key lets Spark plan a SortMergeJoin with NO Exchange on either
side — the 100 TB pattern for repeated large-large joins.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.sources.catalog import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # default warehouse dir (spark.sql.warehouse.dir is static);
    # spark-warehouse/ + metastore artifacts are gitignored
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("buckets.li_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("buckets.orders_b")
    )
    # broadcast would bypass the point — force SMJ to prove co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("buckets.li_b").join(
            spark.table("buckets.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "SortMergeJoin" in plan
        assert not re.search(r"\(\d+\)\s+Exchange", plan), plan
        # and it still computes the right thing
        n = joined.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS buckets.li_b")
        spark.sql("DROP TABLE IF EXISTS buckets.orders_b")
