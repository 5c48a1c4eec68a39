"""Structured Streaming demo runner — every streaming surface the
engine exposes (SURVEY.md §2.9), each driven to completion over the
events fixture and checked for rows:

    tumbling / sliding / session windows      (complete mode)
    append-mode finalized windows             (production-sink emission)
    stateful per-user totals                  (applyInPandasWithState)
    bounded-state streaming dedup             (dropDuplicatesWithinWatermark)
    stream-stream interval join               (watermarked)
    stream-static dimension enrichment        (per-batch broadcast)
    foreachBatch parquet sink                 (checkpointed appends)
    CDC merge-upsert sink                     (newest-wins conditional MERGE)
    incremental causality grid                (append grid -> pairwise corr)

On a real cluster the parquet-file source becomes Kafka/files-in-
arrival and memory sinks become Delta/parquet — the queries are
unchanged.

Run: ``python examples/run_streaming_demo.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY
from causality_between_elements_based_on_time_series_data_spark.session import get_spark


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )
    spark = get_spark("streaming-demo")

    stages = [
        ("tumbling 1h rollup", "streaming_tumbling_rollup"),
        ("sliding 2h/1h rollup", "streaming_sliding_rollup"),
        ("session windows (30m gap)", "streaming_session_rollup"),
        ("append-mode finalized windows", "streaming_append_finalized_windows"),
        ("stateful per-user totals", "streaming_stateful_user_totals"),
        ("bounded-state dedup", "streaming_dedup_counts"),
        ("stream-stream interval join", "streaming_interval_join"),
        ("stream-static dim join", "streaming_static_dim_join"),
        ("foreachBatch parquet sink", "streaming_foreachbatch_parquet_sink"),
        ("CDC merge-upsert sink", "streaming_merge_upsert"),
        ("incremental causality grid", "streaming_pairwise_correlation"),
        ("PSI drift monitor", "streaming_psi_monitor"),
    ]
    for title, name in stages:
        n = REGISTRY[name].fn(spark, sf_dir).count()
        print(f"  {title:<32} ({name}): {n} rows")

    spark.stop()


if __name__ == "__main__":
    main()
