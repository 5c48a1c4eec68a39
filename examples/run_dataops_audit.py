"""Operational audit runner — the data-engineering jobs that gate a
production pipeline, chained the way a nightly run would execute them
(`plans/queries_dataops.py`):

    1. data-quality expectations  (uniqueness / FK / ranges / nulls —
                                   non-zero violations abort the run)
    2. snapshot diff accounting   (reconcile today's feed vs rebuild)
    3. incremental MV refresh     (base ⊕ delta == full recompute)
    4. k-fold split audit         (label balance before any CV claim)
    5. scan observability         (control totals on the same pass)

Every stage is a single-pass or key-partitioned plan; at 100 TB only
the input path and session master change.

Run: ``python examples/run_dataops_audit.py [sf_dir]``.
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
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    spark = get_spark("dataops-audit")

    expectations = REGISTRY["data_quality_expectations"].fn(spark, sf_dir)
    rows = expectations.collect()
    print("\n=== data-quality expectations ===")
    for r in rows:
        print(f"  {r['expectation']:<35} violations={r['n_violations']}")
    violations = sum(r["n_violations"] for r in rows)
    if violations:
        print(f"ABORT: {violations} constraint violations")
        spark.stop()
        sys.exit(1)

    for title, name in [
        ("snapshot diff", "snapshot_diff_counts"),
        ("incremental MV refresh", "incremental_agg_maintenance"),
        ("k-fold split audit", "kfold_assignment_balance"),
        ("scan observability", "observe_scan_metrics"),
    ]:
        print(f"\n=== {title} ({name}) ===")
        REGISTRY[name].fn(spark, sf_dir).show(8, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
