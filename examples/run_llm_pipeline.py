"""End-to-end LLM training-data pipeline runner (SURVEY.md §2.11 [EXT]
surface, composed the way a 100 TB data-curation run would chain it):

    documents ──► quality filter ──► dedup (exact → MinHash-LSH →
    Jaccard-verify → connected components) ──► benchmark-contamination
    screen ──► sliding-window chunking ──► token-budget packing
    embeddings ─► ANN neighbor audit (LSH candidates, exact re-rank)
    dashboards ─► per-(lang, verdict) drop accounting + BM25 probe

Every stage is the bounded-shuffle form the engine's operators use:
32-byte content-hash keys, banded LSH buckets, candidate-only
verification, label propagation, map-side chunking.  At scale the only
change is the input path and the session master.

Run: ``python examples/run_llm_pipeline.py [sf_dir]`` (defaults to
$SPARK_GRAFT_SF_DIR, then /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.operators.similarity import (
    lsh_cosine_topk,
)
from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
    chunk_docs_df,
    dedup_pipeline_survivors,
)
from causality_between_elements_based_on_time_series_data_spark.session import get_spark
from causality_between_elements_based_on_time_series_data_spark.sources.catalog import load_table
from causality_between_elements_based_on_time_series_data_spark.functions.text import token_count


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    spark = get_spark("llm-pipeline")

    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.count()

    # 1. quality gate: minimum size + sane average token length
    nt = token_count(F.col("text"))
    quality = docs.filter((nt >= 5) & ((F.length("text") / nt) <= 12))
    n_quality = quality.count()

    # 2. dedup: exact → LSH candidates → Jaccard verify → components
    survivors = dedup_pipeline_survivors(quality.select("doc_id", "text", "lang", "source", "n_chars"))
    n_dedup = survivors.count()

    # 3. contamination screen: drop survivors sharing ≥20% of their
    # 3-grams with the held-out benchmark slice (doc_id % 50 == 0
    # stands in for the eval set; AQE picks broadcast vs shuffle for
    # its gram set based on measured size)
    survivor_docs = quality.select("doc_id", "text").join(
        survivors.select("doc_id"), "doc_id", "semi"
    )
    t = F.split(F.col("text"), " ")
    grams = (
        survivor_docs.select("doc_id", t.alias("t"), F.size(t).alias("n"))
        .filter(F.col("n") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - 2),
                    lambda i: F.concat_ws(" ", F.slice("t", i, F.lit(3))),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    bench_grams = grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    rate = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(bench_grams.withColumn("hit", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg((F.count("hit") / F.count("*")).alias("contamination"))
    )
    tainted = rate.filter(F.col("contamination") >= 0.2).select("doc_id")
    clean_docs = survivor_docs.join(tainted, "doc_id", "anti").filter(
        F.col("doc_id") % 50 != 0
    )
    n_clean = clean_docs.count()

    # 4. chunking on the clean survivors ONLY (map-side after the
    # joins) — never chunk rows a prior stage already rejected
    chunks = chunk_docs_df(clean_docs)
    n_chunks = chunks.count()

    # 5. pack chunks into 256-token training bins, per source shard of
    # the original doc (window partitioned by shard → no global sort)
    from pyspark.sql import Window as W

    packed_src = chunks.join(docs.select("doc_id", "source"), "doc_id")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    bins = packed_src.select(
        "source",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(256)
        ).alias("bin_id"),
        "n_tokens",
    ).groupBy("source", "bin_id").agg(F.sum("n_tokens").alias("bin_tokens"))
    n_bins = bins.count()

    # 4. embedding-side audit: approximate neighbors for a query sample
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ann = lsh_cosine_topk(emb, queries, k=3)
    n_ann = ann.count()

    # 5. curation dashboard views over the SAME corpus: the verdict
    # rollup an operator would watch (why did documents drop?) and a
    # BM25 probe of what the retained corpus ranks for a query
    from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY

    verdicts = REGISTRY["quality_filter_verdicts"].fn(spark, sf_dir)
    n_verdict_cells = verdicts.count()
    top_bm25 = REGISTRY["bm25_retrieval_topk"].fn(spark, sf_dir)
    n_bm25 = top_bm25.count()

    print(f"documents in          : {n_in}")
    print(f"after quality gate    : {n_quality}")
    print(f"after dedup pipeline  : {n_dedup}")
    print(f"after contamination   : {n_clean}")
    print(f"training chunks       : {n_chunks}")
    print(f"packed 256-tok bins   : {n_bins}")
    print(f"ANN audit pairs       : {n_ann}")
    print(f"verdict rollup cells  : {n_verdict_cells}")
    print(f"BM25 probe top-k      : {n_bm25}")

    spark.stop()


if __name__ == "__main__":
    main()
