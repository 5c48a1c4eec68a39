"""End-to-end causality analysis runner: the descriptive cross-series
surface (plans/queries_causality.py) side by side with the learned
AMTL causality matrix — the workflow an analyst runs on a new corpus:

    events ──► hourly grid ──► pairwise corr / lagged corr /
               lag regression / autocorrelation / precedence
    events ──► RETAIN features ──► AMTL fit (train/eval split)
               ──► learned B matrix + held-out eval metrics
    events ──► causal-effect estimators (r7: IPW/AIPW/CUPED/IV;
               r8 panel: TWFE / placebo DiD / Cox PH / synthetic
               control / mediation / local projections / VAR(1) / QTE)
    events ──► experimentation utilities (r8: MDE+power, CATE,
               Qini uplift, James-Stein shrinkage, raking weights,
               Brier calibration, E-value, Page-Hinkley drift)

Run: ``python examples/run_causality_analytics.py [sf_dir]``
(defaults to $SPARK_GRAFT_SF_DIR, then /root/testdata/sf0.01).
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
    spark = get_spark("causality-analytics")

    print("== descriptive cross-series statistics ==")
    for name in (
        "series_autocorrelation",
        "pairwise_series_correlation",
        "lagged_cross_correlation",
        "granger_lag_regression",
        "temporal_precedence_counts",
    ):
        print(f"-- {name}")
        REGISTRY[name].fn(spark, sf_dir).orderBy(*REGISTRY[name].fn(spark, sf_dir).columns[:2]).show(
            8, truncate=False
        )

    print("== learned causality (AMTL, held-out eval) ==")
    print("== causal-effect estimators (r7) ==")
    # treatment = clicked that user-day; outcome = that day's purchase
    # value.  The four estimators disagree exactly where their
    # assumptions disagree — reading them together is the analysis.
    for name in (
        "ipw_treatment_effect",
        "aipw_doubly_robust_effect",
        "cuped_variance_reduction",
        "iv_wald_estimate",
    ):
        print(f"-- {name}")
        REGISTRY[name].fn(spark, sf_dir).show(truncate=False)

    print("== panel / counterfactual estimators (r8) ==")
    # the time-exploiting layer: fixed effects, placebo inference,
    # survival regression, donor counterfactuals, dynamic effects
    for name in (
        "two_way_fixed_effects_did",
        "staggered_adoption_att",
        "placebo_permutation_did",
        "cox_ph_one_step",
        "synthetic_control_gap",
        "mediation_product_effect",
        "local_projection_irf",
        "var1_stability_check",
        "quantile_treatment_effect",
    ):
        print(f"-- {name}")
        REGISTRY[name].fn(spark, sf_dir).show(12, truncate=False)

    print("== experimentation-platform utilities (r8) ==")
    # size it (MDE/power), read it honestly (CATE, uplift, shrinkage),
    # trust it (calibration, reweighting, drift)
    for name in (
        "mde_power_analysis",
        "cate_interaction_ols",
        "uplift_by_decile_qini",
        "james_stein_segment_shrinkage",
        "raking_weights_ipf",
        "brier_calibration_decomposition",
        "triple_difference_ddd",
        "holm_fwer_adjust",
        "evalue_sensitivity_bound",
        "page_hinkley_drift",
        "offline_policy_ips_snips",
        "offline_policy_doubly_robust",
        "network_interference_exposure",
        "conformal_prediction_interval",
    ):
        print(f"-- {name}")
        REGISTRY[name].fn(spark, sf_dir).show(12, truncate=False)

    REGISTRY["amtl_causality_matrix"].fn(spark, sf_dir).orderBy(
        "src_task", "dst_task"
    ).show(10, truncate=False)
    REGISTRY["amtl_eval_metrics"].fn(spark, sf_dir).orderBy("task").show(truncate=False)
    REGISTRY["amtl_eval_min"].fn(spark, sf_dir).orderBy("task").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
