"""End-to-end LLM training-data pipeline runner (SURVEY.md §2.11 [EXT]
surface, composed the way a 100 TB data-curation run would chain it):

    documents ──► quality filter ──► dedup (exact → MinHash-LSH →
    Jaccard-verify → connected components) ──► sliding-window chunking
    embeddings ─► ANN neighbor audit (LSH candidates, exact re-rank)

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

    # 3. chunking on the surviving documents ONLY (map-side after the
    # semi-join) — never chunk rows quality/dedup already rejected
    survivor_docs = quality.select("doc_id", "text").join(
        survivors.select("doc_id"), "doc_id", "semi"
    )
    chunks = chunk_docs_df(survivor_docs)
    n_chunks = chunks.count()

    # 4. embedding-side audit: approximate neighbors for a query sample
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ann = lsh_cosine_topk(emb, queries, k=3)
    n_ann = ann.count()

    print(f"documents in          : {n_in}")
    print(f"after quality gate    : {n_quality}")
    print(f"after dedup pipeline  : {n_dedup}")
    print(f"training chunks       : {n_chunks}")
    print(f"ANN audit pairs       : {n_ann}")

    spark.stop()


if __name__ == "__main__":
    main()
