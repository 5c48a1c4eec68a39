"""Causal screening workflow — the reference's domain question
("which elements drive which?", SURVEY.md §0) run as an analyst
would chain this engine's descriptive suite before committing to the
AMTL training loop:

    1. pairwise Pearson correlation      (symmetric association)
    2. partial correlation               (confounder-controlled)
    3. binned mutual information         (nonlinear dependence)
    4. lagged cross-correlation          (direction hint)
    5. Granger-style lag regression      (predictive precedence)
    6. temporal precedence counts        (event-order evidence)
    7. AMTL causality matrix B           (the reference's learned answer,
                                          /root/reference/model.py:166-184)

Stages 1-6 all reduce events to the hour×series grid once and join
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
        ("pairwise correlation", "pairwise_series_correlation"),
        ("partial correlation (|error)", "partial_correlation_controlled"),
        ("mutual information", "pairwise_mutual_information"),
        ("lagged cross-correlation", "lagged_cross_correlation"),
        ("Granger lag regression", "granger_lag_regression"),
        ("temporal precedence", "temporal_precedence_counts"),
        ("AMTL causality matrix B", "amtl_causality_matrix"),
    ]
    for title, name in stages:
        df = REGISTRY[name].fn(spark, sf_dir)
        print(f"\n=== {title} ({name}) ===")
        df.show(8, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
