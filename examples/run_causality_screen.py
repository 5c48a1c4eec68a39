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
   11. conversion-lag percentiles        (cause→effect latency profile)
   12. last-touch attribution           (entity-level event attribution)
   13. Markov stationary occupancy      (long-run dynamics)
   14. Welch t / chi-square             (two-sample + categorical tests)
   15. Kaplan-Meier survival            (lifetime analysis)
   16. Holt smoothing / rolling OLS     (trend structure)
   17. DTW distance                      (variable-delay coupling)
   18. triage + inference (round 6)      (STL strengths, periodogram,
                                          Mann-Kendall + Theil-Sen,
                                          bootstrap CI, cointegration,
                                          AR(2) baseline, Granger F +
                                          BH-FDR control, CCM, PC
                                          skeleton, excitation ratio,
                                          lead/lag argmax, entropy
                                          rate, DiD + event study,
                                          attribution, cascades)
   19. AMTL causality matrix B           (the reference's learned answer,
                                          /root/reference/model.py:166-184)

All descriptive stages reduce events to the hour/day×series grid (or a
per-user summary) once and join tiny post-reduce tables — at 100 TB
the raw events are aggregated exactly once per screen.  The final
stage is the iterative trainer (driver-orchestrated, data-distributed
— ml/amtl.py).

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
        ("conversion-lag percentiles", "conversion_lag_percentiles"),
        ("last-touch attribution", "last_touch_attribution"),
        ("Markov stationary occupancy", "markov_stationary_distribution"),
        ("Welch t-test (purchase vs view)", "welch_ttest_purchase_vs_view"),
        ("chi-square type x segment", "chisq_type_by_segment"),
        ("Kaplan-Meier survival", "kaplan_meier_survival"),
        ("Holt level+trend forecast", "holt_linear_smoothing"),
        ("rolling OLS trend slopes", "rolling_ols_slope"),
        ("DTW distance", "dtw_distance_pairs"),
        ("trend/seasonal strength triage", "decomposition_strength"),
        ("periodogram dominant periods", "periodogram_peaks"),
        ("Mann-Kendall trend test", "mann_kendall_trend"),
        ("Theil-Sen robust slope", "theil_sen_trend"),
        ("bootstrap mean CI", "bootstrap_mean_ci"),
        ("cointegration (Engle-Granger)", "cointegration_screen"),
        ("AR(2) Yule-Walker baseline", "ar2_yule_walker"),
        ("Granger F-test (lag 1)", "granger_f_lag1"),
        ("Granger screen under BH-FDR", "granger_fdr_screen"),
        ("convergent cross-mapping", "ccm_cross_mapping_skill"),
        ("PC-algorithm skeleton", "pc_skeleton_edges"),
        ("excitation ratio (Hawkes)", "excitation_ratio_screen"),
        ("lead/lag best shift", "lead_lag_best_shift"),
        ("Markov entropy rate", "markov_entropy_rate"),
        ("diff-in-diff estimate", "diff_in_diff_estimate"),
        ("event-study daily effects", "event_study_daily_effects"),
        ("position-based attribution", "position_based_attribution"),
        ("threshold cascade rounds", "threshold_cascade_rounds"),
        ("Ljung-Box whiteness gate", "ljung_box_test"),
        ("ARCH heteroskedasticity gate", "arch_lm_test"),
        ("rolling-correlation stability", "rolling_corr_stability"),
        ("block-bootstrap SE inflation", "block_bootstrap_variance"),
        ("spectral coherence + phase", "spectral_coherence_pair"),
        ("Hurst long-memory estimate", "hurst_exponent_rs"),
        ("Kalman local-level filter", "kalman_local_level"),
        ("binary segmentation", "binary_segmentation_changepoints"),
        ("VAR(1) stability gate", "var1_stability_check"),
        ("local-projection IRF", "local_projection_irf"),
        ("AMTL causality matrix B", "amtl_causality_matrix"),
    ]
    for title, name in stages:
        df = REGISTRY[name].fn(spark, sf_dir)
        print(f"\n=== {title} ({name}) ===")
        df.show(8, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
