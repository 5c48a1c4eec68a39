"""Prefix filtering is LOSSLESS for Jaccard-threshold joins: the
candidate set produced by indexing only each set's rarest
|s| - ceil(t|s|) + 1 tokens must contain every pair meeting the
threshold.  Verified against a brute-force all-pairs join at sf0.001.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
    prefix_filter_jaccard_pairs,
)
from causality_between_elements_based_on_time_series_data_spark.sources.catalog import load_table


def test_prefix_filter_matches_bruteforce(spark, sf_dir):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(spark, sf_dir).collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    ).localCheckpoint(eager=False)
    sized = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta, tb = tok.alias("ta"), tok.alias("tb")
    inter = (
        ta.join(
            tb,
            (F.col("ta.w") == F.col("tb.w"))
            & (F.col("ta.doc_id") < F.col("tb.doc_id")),
        )
        .groupBy(
            F.col("ta.doc_id").alias("id_a"), F.col("tb.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sized.alias("sa"), sized.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("n_common")
    )
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in inter.join(sa, F.col("sa.doc_id") == F.col("id_a"))
        .join(sb, F.col("sb.doc_id") == F.col("id_b"))
        .filter(jac >= 0.9)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .collect()
    }
    assert got == want
