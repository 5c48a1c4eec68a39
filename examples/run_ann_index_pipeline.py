"""Persisted-ANN-index lifecycle runner — the similarity-search
companion to ``run_corpus_pipeline.py``.

Chains the round-14 persisted-index operators the way a vector-search
owner runs them against a growing embedding corpus:

1. BUILD: materialize the IVF-SQ8pc index — uint8 codes bucketed on
   the inverted-list key + the per-list [min, max] range table —
   once for the current corpus version (``_build_persisted_ann_index``,
   the layout behind ``ann_sq8pc_persisted_topk``).
2. PROBE: top-3 neighbors for the query sample, read entirely from
   the persisted tables (zero index-side Exchange — plan-gated in
   ``tests/test_bucketing.py``); plus the SERVING form
   (``ann_sq8pc_persisted_serve``) — one request's probe clusters as
   literal filters, bucket-pruned at the scan.
3. INGEST: append K delta-code segments quantized against the
   CURRENT ranges (``_build_ann_segmented_index``'s per-ingest shape),
   then probe v1 + segments (``ann_sq8pc_segmented_probe``).
4. FOLD DECISION: print ``ann_index_segment_lifecycle``'s drift
   report — clamped segment vectors and live-vs-folded reconstruction
   MSE — the table that justifies (or defers) the v2 rebuild.

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

    # 1+2. build once, probe from the persisted tables
    print("== persisted-index probe (top-3 per sampled query) ==")
    REGISTRY["ann_sq8pc_persisted_topk"].fn(spark, sf_dir).show(9)

    # 2b. the SERVING form: one request's probe clusters pushed as
    # literal filters — the bucketed codes scan prunes to the probed
    # lists (per-request IO = |probed lists|, not |corpus|)
    print("== serving path (bucket-pruned single request) ==")
    REGISTRY["ann_sq8pc_persisted_serve"].fn(spark, sf_dir).show()

    # 3. segments accumulate between folds; the probe fans over
    # v1 + K bucketed code segments, each branch exchange-free
    print("== segmented probe (v1 + delta-code segments) ==")
    REGISTRY["ann_sq8pc_segmented_probe"].fn(spark, sf_dir).show(9)

    # 4. the fold decision table: stale-range drift vs post-fold error
    print("== segment lifecycle / fold-decision report ==")
    REGISTRY["ann_index_segment_lifecycle"].fn(spark, sf_dir).show(
        truncate=False
    )
    print(
        "fold rule of thumb: mse_live_segment >> mse_folded_segment "
        "(stale ranges clamp arriving vectors) or probe_vs_k read-amp "
        "past budget (SCALE_r14_ann.json) -> run the fold."
    )


if __name__ == "__main__":
    main()
