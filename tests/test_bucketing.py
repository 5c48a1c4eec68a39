"""Bucketed co-located join (SURVEY.md §4.2 / pyspark guide
"Partitioning & shuffle"): writing both join sides bucketed on the
join key lets Spark plan a SortMergeJoin with NO Exchange on either
side — the 100 TB pattern for repeated large-large joins.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
    load_table,
    reset_bucket_table,
    session_bucket_table,
)


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


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


def test_ivf_bucketed_matches_plain_ivf(spark, sf_dir):
    """ivf_bucketed_cosine_topk materializes the corpus bucketed by
    cluster but must answer identically to the in-memory ivf path
    (same KMeans seed -> same model -> same candidates -> same re-rank)."""
    from causality_between_elements_based_on_time_series_data_spark.operators.ivf import (
        ivf_bucketed_cosine_topk,
        ivf_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    table = session_bucket_table(spark, "t_ivf_corpus")
    reset_bucket_table(spark, table)
    try:
        plain = ivf_cosine_topk(emb, queries, k=3, n_clusters=8, n_probe=2)
        bucketed = ivf_bucketed_cosine_topk(
            spark, emb, queries, table, k=3, n_clusters=8, n_probe=2
        )
        a = sorted(map(tuple, plain.select("qid", "nid", "rn").collect()))
        b = sorted(map(tuple, bucketed.select("qid", "nid", "rn").collect()))
        assert a == b and len(a) > 0
    finally:
        reset_bucket_table(spark, table)


def test_ivf_bucketed_corpus_plan_shapes(spark, sf_dir):
    """The two physical claims of the bucketed-IVF layout, gated:

    1. a literal cluster probe PRUNES buckets at the scan (only the
       probed inverted lists are read -- the 100 TB read-reduction), and
    2. a probe join on cluster is CO-LOCATED: SortMergeJoin with the
       single Exchange on the tiny probe side, none on the corpus side.
    """
    from causality_between_elements_based_on_time_series_data_spark.operators.ivf import (
        ivf_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _centers = ivf_assign(emb, n_clusters=8)
    table = session_bucket_table(spark, "t_ivf_prune")
    reset_bucket_table(spark, table)
    try:
        (
            assigned.write.mode("overwrite")
            .bucketBy(8, "cluster")
            .sortBy("cluster")
            .saveAsTable(table)
        )
        corpus = spark.table(table)

        # bucket pruning needs a bucketed scan; Spark's planner disables
        # bucketed reading when no operator exploits the distribution
        # ("Bucketed: false (disabled by query planner)"), so pin it on
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            pruned = corpus.filter(F.col("cluster").isin(1, 3))
            plan = _formatted_plan(pruned)
            m = re.search(r"SelectedBucketsCount: (\d+) out of 8", plan)
            # cluster values hash to buckets (murmur3 pmod 8), so assert
            # pruning happened, not a specific bucket count
            assert m and int(m.group(1)) < 8, plan
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
            )

        probes = spark.createDataFrame([(1,), (3,)], "cluster int")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = corpus.join(probes, "cluster")
            plan = _formatted_plan(j)
            assert "SortMergeJoin" in plan, plan
            # exactly one Exchange -- aligning the probe side to the
            # corpus's 8 buckets; the corpus side reads in place
            assert len(re.findall(r"\(\d+\)\s+Exchange", plan)) == 1, plan
            assert j.count() > 0
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        reset_bucket_table(spark, table)
