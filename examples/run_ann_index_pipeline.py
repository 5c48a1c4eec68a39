"""Persisted-ANN-index lifecycle runner — the similarity-search
companion to ``run_corpus_pipeline.py``.

Chains the persisted-index operators the way a vector-search owner
runs them against a growing embedding corpus:

1. BUILD + PROBE: materialize the IVF-SQ8pc index — uint8 codes
   bucketed on the CHILD list key (the round-15 layout: the hot-list
   sub-split geometry is part of the index version) plus the merged
   per-list stats table — once for the current corpus version, then
   top-3 for the query sample read entirely from the persisted tables
   (zero index-side Exchange — plan-gated in
   ``tests/test_bucketing.py``).
2. SERVE: the single-request form (``ann_sq8pc_persisted_serve``,
   the parameterized ``_ann_serve``) — one request's probe clusters
   as literal filters, every scan bucket-pruned; and the BATCH form
   with deterministic literal-vs-broadcast routing
   (``ann_sq8pc_batch_pruned_topk``).
3. INGEST: append K delta-code segments quantized against the
   CURRENT ranges (``_build_ann_segmented_index``'s per-ingest
   shape), then probe v1 + segments (``ann_sq8pc_segmented_probe``)
   and serve over v1 + segments (``ann_sq8pc_segmented_serve`` —
   between folds a served answer must see everything ingested).
4. AUDIT: ``ann_seg_recall_audit`` — recall@3 / top-1 of the
   between-folds path vs the exact baseline, staleness decomposed
   from the v1 list ceiling.
5. FOLD DECISION: ``ann_fold_policy_report`` turns the fold signals
   (segment count vs the LSM budget, stale-range out-of-band
   fraction, segment mass) into fold / no-fold with literal integer
   thresholds — and the fold (``ann_index_segment_lifecycle``'s v2
   rebuild + drift pricing) runs ONLY when the verdict says so.

Every stage is deterministic (integer/sign arithmetic only), so
re-running reproduces identical codes, candidates, and rankings; the
registry twins of each stage are hash-checked against DuckDB oracles
per round.

Run: ``python examples/run_ann_index_pipeline.py [sf_dir]``
(default /root/testdata/sf0.01).  Unknown ``--flags`` fail loudly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if flags:
        sys.exit(f"unknown flag(s) {sorted(flags)}; this runner takes none")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.session import (
        get_spark,
    )

    spark = get_spark("ann-index-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    # 1. build once (sub-split geometry baked into the version), probe
    # from the persisted tables
    print("== persisted-index probe (top-3 per sampled query) ==")
    REGISTRY["ann_sq8pc_persisted_topk"].fn(spark, sf_dir).show(9)

    # 2. the SERVING forms: one request's probe clusters pushed as
    # literal filters (bucket-pruned scans), and the batch form whose
    # route — literal prune vs broadcast — is an integer rule on the
    # batch's unioned probe set
    print("== serving path (bucket-pruned single request) ==")
    REGISTRY["ann_sq8pc_persisted_serve"].fn(spark, sf_dir).show()
    print("== batch probe (deterministic literal/broadcast routing) ==")
    REGISTRY["ann_sq8pc_batch_pruned_topk"].fn(spark, sf_dir).show(9)

    # 3. segments accumulate between folds; probe AND serve fan over
    # v1 + K bucketed code segments, each branch exchange-free /
    # bucket-pruned
    print("== segmented probe (v1 + delta-code segments) ==")
    REGISTRY["ann_sq8pc_segmented_probe"].fn(spark, sf_dir).show(9)
    print("== segmented serve (one request over v1 + segments) ==")
    REGISTRY["ann_sq8pc_segmented_serve"].fn(spark, sf_dir).show()

    # 3b. SLO-driven probe budget: read the budget/recall curve, pick
    # the cheapest budget meeting the recall floor, serve with it
    # (the parameterized _ann_serve the registered serve instantiates)
    print("== probe-budget / recall curve ==")
    curve = REGISTRY["ann_probe_budget_curve"].fn(spark, sf_dir)
    curve.show(truncate=False)
    slo = 0.45
    rows = sorted(curve.collect(), key=lambda r: r.budget)
    chosen = next(
        (r for r in rows if r.recall_at_3 >= slo), rows[-1]
    )
    print(
        f"SLO recall@3 >= {slo}: cheapest budget = {chosen.budget} "
        f"(recall {chosen.recall_at_3}, ~{chosen.avg_candidates} "
        "candidates/request)"
    )
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        _ann_probe_parents,
        _ann_serve,
        _build_persisted_ann_index,
        _rp_cluster_spark,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    t_codes, t_stats, bits, _n = _build_persisted_ann_index(
        spark, emb, "annslo"
    )
    qrow = (
        emb.filter(F.col("vec_id") == 0)
        .select("embedding", _rp_cluster_spark(bits).alias("cl0"))
        .first()
    )
    print(f"== serve at the chosen budget ({chosen.budget}) ==")
    _ann_serve(
        spark,
        [t_codes],
        t_stats,
        bits,
        [float(x) for x in qrow.embedding],
        _ann_probe_parents(qrow, bits, probe_budget=int(chosen.budget)),
        k=3,
        exclude_id=0,
    ).show()

    # 4. the user-facing staleness gate: recall of the between-folds
    # path vs the exact baseline, loss decomposed from the v1 ceiling
    print("== segmented recall audit ==")
    REGISTRY["ann_seg_recall_audit"].fn(spark, sf_dir).show(truncate=False)

    # 5. fold ONLY when the policy says so (segment budget / stale
    # out-of-band fraction / segment mass — literal integer rules)
    print("== fold policy ==")
    policy = REGISTRY["ann_fold_policy_report"].fn(spark, sf_dir)
    policy.show(truncate=False)
    verdict = policy.collect()[0]
    if verdict.should_fold:
        print(
            f"fold verdict: FOLD ({verdict.reason}) -> running the v2 "
            "rebuild + drift pricing"
        )
        print("== segment lifecycle / fold report ==")
        REGISTRY["ann_index_segment_lifecycle"].fn(spark, sf_dir).show(
            truncate=False
        )
    else:
        print(
            "fold verdict: DEFER (reason=none) — segments stay live; "
            "re-run the policy after the next ingest"
        )


if __name__ == "__main__":
    main()
