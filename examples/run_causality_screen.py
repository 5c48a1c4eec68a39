"""Causal screening workflow — the reference's domain question
("which elements drive which?", SURVEY.md §0) run as an analyst
would chain this engine's descriptive suite before committing to the
AMTL training loop:

    1. CUSUM change-points               (per-series stability screen —
                                          a structural break fakes
                                          cross-series signal)
    2. seasonal decomposition            (shared diurnal profile —
                                          the classic spurious-cause)
    3. pairwise Pearson correlation      (symmetric association)
    4. Spearman / Kendall rank screens   (monotone / concordance)
    5. partial correlation               (confounder-controlled)
    6. binned mutual information         (nonlinear dependence)
    7. lagged cross-correlation          (direction hint)
    8. Granger-style lag regression      (predictive precedence)
    9. transfer entropy (lag-1)          (directional, model-free)
   10. temporal precedence counts        (event-order evidence)
   11. DTW distance                      (variable-delay coupling)
   12. AMTL causality matrix B           (the reference's learned answer,
                                          /root/reference/model.py:166-184)

Stages 1-11 all reduce events to the hour/day×series grid once and join
tiny grid-sized tables — at 100 TB the raw events are aggregated
exactly once per screen.  Stage 7 is the iterative trainer
(driver-orchestrated, data-distributed — ml/amtl.py).

Run: ``python examples/run_causality_screen.py [sf_dir]``.
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
    spark = get_spark("causality-screen")

    stages = [
        ("CUSUM change-points", "cusum_changepoint"),
        ("seasonal decomposition", "seasonal_decomposition_hourly"),
        ("pairwise correlation", "pairwise_series_correlation"),
        ("Spearman rank correlation", "spearman_rank_correlation"),
        ("Kendall tau", "kendall_tau_pairs"),
        ("partial correlation (|error)", "partial_correlation_controlled"),
        ("mutual information", "pairwise_mutual_information"),
        ("lagged cross-correlation", "lagged_cross_correlation"),
        ("Granger lag regression", "granger_lag_regression"),
        ("transfer entropy (lag-1)", "transfer_entropy_lag1"),
        ("temporal precedence", "temporal_precedence_counts"),
        ("DTW distance", "dtw_distance_pairs"),
        ("AMTL causality matrix B", "amtl_causality_matrix"),
    ]
    for title, name in stages:
        df = REGISTRY[name].fn(spark, sf_dir)
        print(f"\n=== {title} ({name}) ===")
        df.show(8, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
