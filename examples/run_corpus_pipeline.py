"""End-to-end training-corpus build runner — the LLM-data-side
companion to ``run_reference_pipeline.py``.

Chains the registry's corpus operators the way a pretraining data
team would run them against a crawl drop:

1. funnel: quality gate → reference-LM perplexity gate → exact dedup
   → near-dup drop → per-domain cap → A-ES weighted selection
   (``corpus_build_funnel`` — one job, per-stage accounting);
2. plan the physical layout of the selected corpus
   (``training_shard_manifest`` semantics: deterministic hash shards
   + per-shard budgets), and WRITE the selected documents as
   shard-partitioned parquet;
3. audit epoch-shuffle reproducibility over the INPUT corpus
   (``epoch_shuffle_audit`` — the registered, hash-checked form; run
   it over a written shard set by pointing it at that directory).

Every stage is a pure function of document ids (no RNG state), so
re-running this script — on another box, another partitioning, or an
incrementally grown input — reproduces byte-identical selections and
shard assignments.  The registry twins of each stage are hash-checked
against DuckDB oracles per round (CORRECTNESS_full_r{N}.json); this
script is the user-facing composition.

Run: ``python examples/run_corpus_pipeline.py [sf_dir] [out_dir]
[--logistic-gate] [--line-dedup]`` (defaults: /root/testdata/sf0.01 →
/tmp/spark_graft_corpus_out).  ``--logistic-gate`` swaps the funnel's
stage-2 LM gate from the CCNet perplexity tercile filter to the
trained curated-vs-crawl classifier (``doc_quality_logistic_gate``'s
kept-id set, semi-joined — the alternative composition that gate's
registration documents); the funnel report shows the substituted
stage and downstream stages re-run over its kept set.
``--line-dedup`` prepends the CCNet within-doc line-dedup cleaning
pass as stage 0 (``line_dedup_cleaned`` — the transformation
``within_doc_line_dedup`` reports on): every downstream gate and
dedup tier sees the cleaned text, and the WRITTEN corpus carries it.
Unknown ``--flags`` fail loudly (a typo must not silently change the
pipeline composition).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY
from causality_between_elements_based_on_time_series_data_spark.session import get_spark
from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
    load_table,
)

N_SHARDS = 16


_KNOWN_FLAGS = {"--logistic-gate", "--line-dedup"}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    unknown = flags - _KNOWN_FLAGS
    if unknown:
        # fail loudly: a misspelled gate selector silently running the
        # default composition under a success banner is worse than a
        # crash (ADVICE r13)
        sys.exit(
            f"unknown flag(s) {sorted(unknown)}; "
            f"known: {sorted(_KNOWN_FLAGS)}"
        )
    logistic = "--logistic-gate" in flags
    line_dedup = "--line-dedup" in flags
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/spark_graft_corpus_out"
    stage2 = "logistic" if logistic else "perplexity"
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    # 1. the build funnel — one job, per-stage accounting.  The
    # default chain is the registered, oracle-pinned
    # corpus_build_funnel; --logistic-gate substitutes the trained
    # classifier as stage 2 and reuses the same accounting.
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        corpus_stage_tables,
        funnel_report,
        line_dedup_cleaned,
    )

    stages = corpus_stage_tables(
        spark, sf_dir, stage2=stage2, line_dedup=line_dedup
    )
    funnel = funnel_report(stages)
    print(
        f"== corpus build funnel (stage-2 gate: {stage2}; "
        f"line-dedup stage 0: {line_dedup}) =="
    )
    funnel.show(truncate=False)

    # 2. re-derive the final selection (same pure-function stages the
    # funnel verified) and write it shard-partitioned.  The selection
    # is the funnel's stage-6 set: rather than re-encode the chain, we
    # recompute the A-ES top-K over the domain-cap survivors the same
    # way the registered query does — determinism means "recompute"
    # and "persist" are interchangeable.
    docs = load_table(spark, sf_dir, "documents")
    if line_dedup:
        # the written corpus must carry the same cleaned text the
        # funnel's gates saw (n_chars recomputed to match)
        docs = line_dedup_cleaned(docs)
    selected_ids = _selected_ids(stages)

    # 1b. benchmark decontamination — composes as a FINAL anti-join on
    # the funnel's kept set (the eval suite ships separately from the
    # crawl; here the registered query's deterministic id-slice
    # stand-in).  Quarantined docs never reach the written corpus.
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        decon_contaminated_ids,
    )

    is_eval = (F.col("doc_id") % 20) == 3
    contaminated = decon_contaminated_ids(
        docs.filter(~is_eval).join(selected_ids, "doc_id", "semi"),
        docs.filter(is_eval),
    )
    n_quarantined = contaminated.count()
    selected_ids = selected_ids.join(contaminated, "doc_id", "anti")
    print(f"== decontamination: quarantined {n_quarantined} selected docs ==")

    corpus = docs.join(selected_ids, "doc_id", "semi").withColumn(
        "shard",
        (
            (F.col("doc_id").cast("bigint") * 2654435761) % 1000000007
        ) % N_SHARDS,
    )
    (
        corpus.repartition(N_SHARDS, "shard")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "corpus"))
    )
    manifest = corpus.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("tot_chars"),
        F.sum("doc_id").alias("id_checksum"),
    )
    print("== shard manifest (written corpus) ==")
    manifest.orderBy("shard").show(N_SHARDS)

    # 3. epoch-shuffle audit over the INPUT corpus (the registered
    # query audits sf_dir; point it at a written shard directory to
    # audit a materialized subset): per-source mean normalized
    # position ~0.5 per epoch, displacement ~1/3 across epochs — the
    # reproducible-epoch contract
    audit = REGISTRY["epoch_shuffle_audit"].fn(spark, sf_dir)
    print("== epoch shuffle audit (input corpus) ==")
    audit.show(5)
    print(f"done; corpus at {out_dir}/corpus")


def _selected_ids(stages):
    """The funnel's final kept set — the SAME stage chain the
    accounting above printed (``plans.queries_llm.
    corpus_stage_tables``, default or --logistic-gate variant); pure
    functions of ids make recompute and persist interchangeable."""
    name, selected = stages[-1]
    assert name == "weighted_select"
    return selected.select("doc_id")


if __name__ == "__main__":
    main()
