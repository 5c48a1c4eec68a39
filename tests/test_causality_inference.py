"""Invariant tests for the inferential causality screens (round 6):
Granger F-test, convergent cross-mapping, PC skeleton, excitation
ratio.  Value-level parity vs DuckDB is the driver contract's job
(all four are fully oracled); these pin the mathematical invariants
that hold on ANY input, at sf0.001.
"""
from __future__ import annotations

from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
    ccm_cross_mapping_skill,
    excitation_ratio_screen,
    granger_f_lag1,
    pc_skeleton_edges,
)


def test_granger_f_stat_nonnegative(spark, sf_dir):
    rows = granger_f_lag1(spark, sf_dir).collect()
    assert rows, "expected at least one directed pair"
    for r in rows:
        # adding a regressor can never raise RSS: R2_u >= R2_r, so both
        # the gain and the F statistic are >= 0 (up to the 4dp round)
        assert r.r2_gain >= -1e-6, r
        assert r.f_stat >= -1e-4, r
        assert r.n_hours > 3


def test_ccm_skill_is_a_correlation(spark, sf_dir):
    rows = ccm_cross_mapping_skill(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        # corr is null when a sparse tiny-SF grid leaves either side
        # constant; when defined, the skill is a correlation
        if r.ccm_skill is not None:
            assert -1.0 - 1e-9 <= r.ccm_skill <= 1.0 + 1e-9, r
        assert r.cause != r.effect
        assert (r.cause, r.effect) not in seen
        seen.add((r.cause, r.effect))
        assert r.n_points >= 1
    # at least one pair must have enough cross-mapped points for a
    # defined skill on any non-degenerate fixture
    assert any(r.ccm_skill is not None for r in rows)


def test_ccm_bucket_chooser_respects_cap():
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        _ccm_choose_bucket,
    )

    assert _ccm_choose_bucket(10, 100) == 1
    assert _ccm_choose_bucket(100, 100) == 1
    assert _ccm_choose_bucket(101, 100) == 2
    assert _ccm_choose_bucket(399, 100) == 4
    # a year at minute grain x 20 series: the pathological case the
    # docstring used to merely warn about
    k = _ccm_choose_bucket(525_600 * 20, 100_000)
    assert 525_600 * 20 / k <= 100_000 and k & (k - 1) == 0


def test_ccm_coarsened_path_still_sane(spark, sf_dir, monkeypatch):
    """Force the broadcast guard to fire (cap far below the fixture
    grid) and assert the coarsened CCM output is still well-formed:
    the guard must be exercised end-to-end, not just unit-tested."""
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        queries_causality as qc,
    )

    grid_rows = qc._hourly_series_rounded(spark, sf_dir).count()
    cap = max(2, grid_rows // 4)  # guarantees bucket_hours >= 2
    monkeypatch.setattr(qc, "_CCM_GRID_CAP", cap)
    assert qc._ccm_choose_bucket(grid_rows, cap) > 1
    rows = qc.ccm_cross_mapping_skill(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cause != r.effect
        if r.ccm_skill is not None:
            assert -1.0 - 1e-9 <= r.ccm_skill <= 1.0 + 1e-9, r
        assert r.n_points >= 1


def test_pc_skeleton_edge_consistency(spark, sf_dir):
    rows = pc_skeleton_edges(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.series_a < r.series_b  # unordered pairs, canonical order
        assert r.edge_kept in (0, 1)
        # an edge is kept iff BOTH tests reject independence — but the
        # query decides on UNROUNDED stats while rows carry 4dp-rounded
        # ones, so skip rows where a rounded stat sits within rounding
        # distance of the 1.96 threshold (a true 1.96004 rounds to 1.96)
        if (
            abs(r.marginal_stat - 1.96) > 5e-5
            and abs(r.min_partial_stat - 1.96) > 5e-5
        ):
            kept = r.marginal_stat > 1.96 and r.min_partial_stat > 1.96
            assert r.edge_kept == int(kept), r
        # the order-1 partial test can only be as strong as the
        # marginal test's evidence when series are exchangeable; no
        # sign constraint, but stats must be finite and non-negative
        assert r.marginal_stat >= 0 and r.min_partial_stat >= 0


def test_excitation_ratio_positive_and_calibrated(spark, sf_dir):
    rows = excitation_ratio_screen(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_observed > 0
        assert r.n_expected > 0
        assert r.excitation_ratio > 0
        # ratio is observed/expected of the SAME pair
        assert abs(r.excitation_ratio - r.n_observed / r.n_expected) < 0.05


def test_holt_winters_state_is_finite_and_rmse_nonneg(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        holt_winters_additive,
    )
    import math

    rows = holt_winters_additive(spark, sf_dir).collect()
    # sf0.001 series may fall below the 49-observation init floor;
    # whatever qualifies must carry finite state
    for r in rows:
        assert r.n_obs >= 49
        for v in (r.level, r.trend, r.forecast_next, r.rmse):
            assert v is not None and math.isfinite(v), r
        assert r.rmse >= 0


def test_bh_fdr_significance_is_downward_closed(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        granger_fdr_screen,
    )

    rows = sorted(granger_fdr_screen(spark, sf_dir).collect(), key=lambda r: r.rnk)
    assert rows
    # BH keeps a prefix of the p-value ranking: once a rank is not
    # significant, no later rank may be
    seen_insignificant = False
    for r in rows:
        if r.significant == 0:
            seen_insignificant = True
        else:
            assert not seen_insignificant, r
        assert 0 <= r.p_value <= 1


def test_mann_kendall_direction_matches_sign(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        mann_kendall_trend,
    )

    rows = mann_kendall_trend(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = (
            "increasing" if r.s_stat > 0 else "decreasing" if r.s_stat < 0 else "none"
        )
        assert r.direction == want
        assert 0 <= r.p_value <= 1
        # |S| can never exceed the number of pairs
        assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2


def test_bootstrap_ci_brackets_reasonably(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        bootstrap_mean_ci,
    )

    rows = bootstrap_mean_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_lo <= r.ci_hi
        # resample means live inside the observed value range, so the
        # CI cannot be wildly displaced from the observed mean
        width = max(r.ci_hi - r.ci_lo, 1e-9)
        assert r.ci_lo - 5 * width <= r.mean_obs <= r.ci_hi + 5 * width


def test_cusum_location_invariants(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        cusum_changepoint_location,
    )

    rows = cusum_changepoint_location(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_days >= 1
        if r.cusum_stat is not None:
            assert r.cusum_stat >= 0
        # the argmax day always has at least itself on the left
        assert r.pre_mean is not None


def test_ipw_effect_invariants(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        ipw_treatment_effect,
    )

    r = ipw_treatment_effect(spark, sf_dir).first()
    # both arms must be populated or the estimator is undefined —
    # this pins the user-day grain choice (user grain had no controls)
    assert 0 < r.n_treated < r.n
    assert 0.01 <= r.p_min <= r.p_max <= 0.99
    assert r.ipw_ate is not None and r.naive_diff is not None


def test_cuped_preserves_pooled_mean(spark, sf_dir):
    import pytest

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        cuped_variance_reduction,
    )

    rows = cuped_variance_reduction(spark, sf_dir).collect()
    assert len(rows) == 2
    n = sum(r.n for r in rows)
    raw = sum(r.n * r.raw_mean for r in rows) / n
    adj = sum(r.n * r.cuped_mean for r in rows) / n
    # theta-adjustment is mean-zero over the POOLED population
    assert adj == pytest.approx(raw, rel=1e-3, abs=1e-2)


def test_iv_wald_invariants(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        iv_wald_estimate,
    )

    r = iv_wald_estimate(spark, sf_dir).first()
    assert r.n > 0
    assert r.ols_estimate is not None
    # wald may be null exactly when the first stage is zero
    if r.first_stage_diff != 0:
        assert r.wald_iv_estimate is not None


def test_aipw_consistent_with_ipw_query(spark, sf_dir):
    """aipw_doubly_robust_effect recomputes the Hajek IPW estimate on
    the same user-day design as ipw_treatment_effect — the two
    queries' ipw numbers must agree exactly (same design, same
    propensity primitive)."""
    import pytest

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        aipw_doubly_robust_effect,
        ipw_treatment_effect,
    )

    a = aipw_doubly_robust_effect(spark, sf_dir).first()
    i = ipw_treatment_effect(spark, sf_dir).first()
    assert a.ipw_ate == pytest.approx(i.ipw_ate, abs=2e-4)
    assert a.naive_diff == pytest.approx(i.naive_diff, abs=2e-4)
    for v in (a.aipw_ate, a.outcome_model_ate):
        assert v is not None


def test_msprt_always_valid_p_is_monotone(spark, sf_dir):
    """The defining property of an always-valid p-value process: it is
    non-increasing in time (1/running-max), bounded in (0, 1]."""
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        msprt_always_valid_test,
    )

    rows = sorted(
        msprt_always_valid_test(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    prev = 1.0
    prev_n = 0
    for r in rows:
        assert 0 < r.always_valid_p <= 1
        assert r.always_valid_p <= prev + 1e-9, r
        assert r.n_obs >= prev_n  # cumulative sample sizes grow
        prev, prev_n = r.always_valid_p, r.n_obs


def test_overdispersion_check_consistency(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_causality import (
        poisson_overdispersion_check,
    )

    r = poisson_overdispersion_check(spark, sf_dir).first()
    assert r.n > 1
    assert r.mean_count >= 0 and r.var_count >= 0
    assert r.overdispersed in (0, 1)
    # the flag is the z threshold applied to unrounded z; check with
    # rounding-aware tolerance (pc_skeleton discipline)
    if abs(r.z_wilson_hilferty - 1.645) > 5e-5:
        assert r.overdispersed == int(r.z_wilson_hilferty > 1.645)
