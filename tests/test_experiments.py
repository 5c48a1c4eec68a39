"""Invariants + independent numpy cross-checks for the round-7
experiment-design family (plans/queries_experiments.py).

Value parity vs DuckDB is the driver contract's job; these tests pin
the shared-SQL-text FORMULAS (Chow SSR/F, log-rank hypergeometric
moments, the Newey-West kernel) against independent numpy
implementations — the round-6 verdict's discipline for any oracle
whose SQL both engines evaluate verbatim — plus definitional
invariants that hold on any input.
"""
from __future__ import annotations

import math

import numpy as np
import pytest

from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
    chow_structural_break,
    logrank_test_cohorts,
    mantel_haenszel_stratified_or,
    newey_west_ols_inference,
    propensity_matching_att,
    propensity_stratified_effect,
    regression_discontinuity_effect,
    srm_sample_ratio_check,
)


def test_srm_flag_consistent_and_fixture_balanced(spark, sf_dir):
    r = srm_sample_ratio_check(spark, sf_dir).collect()[0]
    assert r.n_arm0 + r.n_arm1 == r.n_users
    assert 0.0 <= r.p_value <= 1.0
    assert r.srm_flag == int(r.chi2 > 10.828)
    # sequential user_ids split by parity: the fixture is balanced,
    # so the trust gate must NOT fire
    assert r.srm_flag == 0


def test_mh_or_between_stratum_extremes(spark, sf_dir):
    r = mantel_haenszel_stratified_or(spark, sf_dir).collect()[0]
    assert r.n_strata == 7
    assert r.mh_or > 0 and r.crude_or > 0
    assert r.cmh_chi2 >= 0
    assert 0.0 <= r.p_value <= 1.0


def test_chow_ssr_identity_matches_numpy_polyfit():
    """The moment-form SSR the query uses on both engines ==
    sum-of-squared-residuals of an actual least-squares line fit."""
    rng = np.random.RandomState(11)
    for _ in range(20):
        n = rng.randint(5, 60)
        x = rng.uniform(-10, 10, n)
        y = 2.5 * x + rng.normal(0, 3, n)
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        sxx_c = sxx - sx * sx / n
        syy_c = syy - sy * sy / n
        sxy_c = sxy - sx * sy / n
        ssr_moment = syy_c - sxy_c * sxy_c / sxx_c
        coef = np.polyfit(x, y, 1)
        ssr_fit = ((y - np.polyval(coef, x)) ** 2).sum()
        assert ssr_moment == pytest.approx(ssr_fit, rel=1e-9, abs=1e-9)


def test_f2m_closed_form_p_matches_monte_carlo():
    """P(F(2, m) > f) = (1 + 2f/m)^(-m/2): the exact identity the
    query relies on, checked against simulated F draws."""
    rng = np.random.RandomState(3)
    m = 40
    draws = (rng.chisquare(2, 200_000) / 2) / (rng.chisquare(m, 200_000) / m)
    for f in (0.5, 1.0, 2.0, 4.0):
        closed = (1 + 2 * f / m) ** (-m / 2)
        empirical = (draws > f).mean()
        assert closed == pytest.approx(empirical, abs=5e-3)


def test_chow_f_nonnegative_and_p_bounded(spark, sf_dir):
    r = chow_structural_break(spark, sf_dir).collect()[0]
    assert r.n_days > 8
    assert r.f_stat >= 0  # SSR_pooled >= SSR_split by construction
    assert 0.0 <= r.p_value <= 1.0


def test_logrank_matches_numpy_replay(spark, sf_dir):
    """Replay the full log-rank statistic in numpy from the per-user
    lifetime table and pin O, E, V, chi2."""
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).alias("duration"),
        (
            F.expr("max_by(event_type, struct(ts, event_id))") == "error"
        ).cast("int").alias("observed"),
    ).collect()
    dur = np.array([r.duration for r in pu])
    obs = np.array([r.observed for r in pu])
    g = np.array([r.user_id % 2 for r in pu])
    o1 = e1 = v = 0.0
    n_times = 0
    for t in sorted(set(dur[obs == 1])):
        at = dur >= t
        n = at.sum()
        n1 = (at & (g == 1)).sum()
        d = ((dur == t) & (obs == 1)).sum()
        d1 = ((dur == t) & (obs == 1) & (g == 1)).sum()
        n_times += 1
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    chi2 = (o1 - e1) ** 2 / v
    r = logrank_test_cohorts(spark, sf_dir).collect()[0]
    assert r.n_times == n_times
    assert r.deaths_g1 == int(o1)
    assert r.expected_g1 == pytest.approx(e1, abs=1e-3)
    assert r.chi2 == pytest.approx(chi2, abs=1e-3)
    assert 0.0 <= r.p_value <= 1.0


def test_newey_west_matches_numpy_replay(spark, sf_dir):
    """Independent numpy implementation of the Bartlett-kernel HAC
    estimator over the same daily series."""
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0.0)
                ),
                6,
            ).alias("y")
        )
        .collect()
    )
    rows.sort(key=lambda r: r.day)
    base = min(r.day for r in rows)
    x = np.array([(r.day - base).days for r in rows], dtype=float)
    # the query uses daynum since 2024-01-01; slope/se are shift-
    # invariant in x, so the offset doesn't matter
    y = np.array([r.y for r in rows])
    n = len(x)
    xbar = x.mean()
    sxx = ((x - xbar) ** 2).sum()
    b1 = ((x - xbar) * (y - y.mean())).sum() / sxx
    b0 = y.mean() - b1 * xbar
    u = y - b0 - b1 * x
    vser = (x - xbar) * u
    L = 7
    s = (vser**2).sum()
    for k in range(1, L + 1):
        s += 2 * (1 - k / (L + 1)) * (vser[k:] * vser[:-k]).sum()
    se_hac = math.sqrt(s) / sxx
    se_ols = math.sqrt(((u**2).sum() / (n - 2)) / sxx)
    # Grid-density guard: the query's lag(v, k) is a ROW lag, which
    # equals a calendar lag only when every day is present.
    assert n == int(x.max() - x.min()) + 1
    r = newey_west_ols_inference(spark, sf_dir).collect()[0]
    assert r.n_days == n
    assert r.slope == pytest.approx(b1, abs=1e-3)
    assert r.se_ols == pytest.approx(se_ols, rel=1e-3, abs=1e-3)
    assert r.se_hac == pytest.approx(se_hac, rel=1e-3, abs=1e-3)
    assert r.hac_ratio == pytest.approx(se_hac / se_ols, rel=1e-3)


def test_rdd_effect_is_the_intercept_jump(spark, sf_dir):
    r = regression_discontinuity_effect(spark, sf_dir).collect()[0]
    assert r.n_left > 0 and r.n_right > 0
    assert r.bandwidth > 0
    assert r.rdd_effect == pytest.approx(
        r.intercept_right - r.intercept_left, abs=2e-4
    )


def test_propensity_strata_are_balanced_and_ordered(spark, sf_dir):
    rows = sorted(
        propensity_stratified_effect(spark, sf_dir).collect(),
        key=lambda r: r.stratum,
    )
    assert [r.stratum for r in rows] == [1, 2, 3, 4, 5]
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile property
    for a, b in zip(rows, rows[1:]):
        assert a.p_lo <= a.p_hi <= b.p_hi  # strata ordered by p
    ates = {r.stratified_ate for r in rows}
    assert len(ates) == 1  # the overall column is a constant


def test_matching_att_diagnostics(spark, sf_dir):
    r = propensity_matching_att(spark, sf_dir).collect()[0]
    assert 0 < r.n_matched <= r.n_treated
    assert r.mean_p_gap >= 0
    assert math.isfinite(r.att)
    # with any control present, every treated row has a neighbor on
    # at least one side of the sort
    assert r.n_matched == r.n_treated


# --- round-8 experimentation-platform utilities ------------------------


def _per_user(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("views"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchases"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("event_type") == "purchase",
                            F.col("value"),
                        )
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("o"),
        )
        .collect()
    )


def test_mde_power_matches_exact_normal(spark, sf_dir):
    from statistics import NormalDist

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        mde_power_analysis,
    )

    rows = _per_user(spark, sf_dir)
    o = np.array([r.o for r in rows])
    n_per_arm = len(o) // 2
    sd = o.std(ddof=1)
    se = math.sqrt(2 * sd * sd / n_per_arm)
    mde = (NormalDist().inv_cdf(0.975) + NormalDist().inv_cdf(0.8)) * se
    power = NormalDist().cdf(0.05 * o.mean() / se - NormalDist().inv_cdf(0.975))
    r = mde_power_analysis(spark, sf_dir).collect()[0]
    assert r.n_per_arm == n_per_arm
    assert r.mde_abs == pytest.approx(mde, rel=2e-4)
    assert r.mde_rel == pytest.approx(mde / o.mean(), rel=2e-3)
    # query uses the tanh Phi approximation: ~1e-3 absolute agreement
    assert r.power_at_5pct_lift == pytest.approx(power, abs=5e-3)


def test_cate_matches_numpy_interaction_lstsq(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        cate_interaction_ols,
    )

    rows = _per_user(spark, sf_dir)
    t = np.array([r.user_id % 2 for r in rows], dtype=float)
    x = np.round(np.log1p([r.views for r in rows]), 6)
    o = np.array([r.o for r in rows])
    A = np.column_stack([np.ones_like(t), t, x, t * x])
    b = np.linalg.lstsq(A, o, rcond=None)[0]
    xbar, sdx = x.mean(), x.std(ddof=1)
    r = cate_interaction_ols(spark, sf_dir).collect()[0]
    assert r.modification_slope == pytest.approx(b[3], abs=1e-3)
    assert r.ate_at_mean_x == pytest.approx(b[1] + b[3] * xbar, abs=1e-3)
    assert r.cate_low_x == pytest.approx(
        b[1] + b[3] * (xbar - sdx), abs=1e-3
    )
    assert r.cate_high_x == pytest.approx(
        b[1] + b[3] * (xbar + sdx), abs=1e-3
    )


def test_qini_replay_and_final_point(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        uplift_by_decile_qini,
    )

    rows = _per_user(spark, sf_dir)
    recs = sorted(
        ((-r.views, r.user_id, r.user_id % 2, int(r.purchases >= 14)) for r in rows)
    )
    n = len(recs)
    out = {r.decile: r for r in uplift_by_decile_qini(spark, sf_dir).collect()}
    assert sorted(out) == list(range(1, 11))
    # replay the cumulative qini at each decile boundary
    for k in range(1, 11):
        top = recs[: math.ceil(k * n / 10)]
        # decile membership via the same ceil(rn*10/n) rule
        top = [rec for i, rec in enumerate(recs, 1) if math.ceil(i * 10 / n) <= k]
        nt = sum(r[2] for r in top)
        nc = len(top) - nt
        rt = sum(r[2] * r[3] for r in top)
        rc = sum((1 - r[2]) * r[3] for r in top)
        assert out[k].cum_qini == pytest.approx(
            rt - rc * nt / nc, abs=1e-3
        )
    # the final point uses ALL users: qini(10) = R_t - R_c*N_t/N_c
    full_rt = sum(r[2] * r[3] for r in recs)
    full_nt = sum(r[2] for r in recs)
    full_rc = sum((1 - r[2]) * r[3] for r in recs)
    assert out[10].cum_qini == pytest.approx(
        full_rt - full_rc * full_nt / (n - full_nt), abs=1e-3
    )


def test_james_stein_shrinks_toward_grand_mean(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        james_stein_segment_shrinkage,
    )

    rows = _per_user(spark, sf_dir)
    segs = {}
    for r in rows:
        segs.setdefault((r.user_id // 2) % 12, []).append(
            (r.user_id % 2, r.o)
        )
    zmap, vmap = {}, {}
    for s in sorted(segs):
        arr = segs[s]
        o1 = np.array([o for t, o in arr if t == 1])
        o0 = np.array([o for t, o in arr if t == 0])
        if len(o1) and len(o0):  # SQL null semantics: single-arm
            zmap[s] = o1.mean() - o0.mean()  # segments contribute no z
            vmap[s] = o1.var() / len(o1) + o0.var() / len(o0)
    z = np.array(list(zmap.values()))
    v = np.array(list(vmap.values()))
    k = len(z)
    zbar = z.mean()
    shrink = min(
        1.0, max(0.0, 1 - (k - 3) * v.mean() / ((z - zbar) ** 2).sum())
    )
    res = james_stein_segment_shrinkage(spark, sf_dir).collect()
    # (user_id//2)%12 yields min(12, distinct id pairs) segments — 12
    # at sf0.01+, fewer on the 15-user sf0.001 fixture
    assert len(res) == len(segs)
    for row in res:
        if row.segment not in zmap:
            assert row.raw_effect is None
            continue
        zi = zmap[row.segment]
        assert row.raw_effect == pytest.approx(zi, abs=1e-3)
        assert row.shrunk_effect == pytest.approx(
            zbar + shrink * (zi - zbar), abs=1e-3
        )
        assert row.shrink_factor == pytest.approx(shrink, abs=1e-3)
        # shrunk estimate always lies between raw and the grand mean
        lo, hi = sorted((row.raw_effect, round(zbar, 3)))
        assert lo - 1e-3 <= row.shrunk_effect <= hi + 1e-3


def test_raking_hits_both_margins(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        raking_weights_ipf,
    )

    rows = raking_weights_ipf(spark, sf_dir).collect()
    assert len(rows) == 4
    # after the final column scaling, tier margins are EXACT 0.5 and
    # arm margins are within IPF round-2 tolerance
    for r in rows:
        assert r.tier_share == pytest.approx(0.5, abs=1e-9)
        assert r.arm_share == pytest.approx(0.5, abs=0.02)
        assert r.weight > 0


def test_brier_decomposition_replay(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        _scored_feat,
        brier_calibration_decomposition,
    )

    sc = _scored_feat(spark, sf_dir).select("p", "y").collect()
    p = np.array([r.p for r in sc])
    y = np.array([float(r.y) for r in sc])
    brier = ((p - y) ** 2).mean()
    ybar = y.mean()
    rel = res = 0.0
    for b in np.unique(np.floor(p * 10)):
        mask = np.floor(p * 10) == b
        nb = mask.sum()
        rel += nb * (p[mask].mean() - y[mask].mean()) ** 2
        res += nb * (y[mask].mean() - ybar) ** 2
    rel /= len(p)
    res /= len(p)
    unc = ybar * (1 - ybar)
    r = brier_calibration_decomposition(spark, sf_dir).collect()[0]
    assert r.n_obs == len(p)
    assert r.brier_score == pytest.approx(brier, abs=1e-4)
    assert r.reliability == pytest.approx(rel, abs=1e-4)
    assert r.resolution == pytest.approx(res, abs=1e-4)
    assert r.uncertainty == pytest.approx(unc, abs=1e-4)
    assert r.decomp_gap == pytest.approx(
        brier - (rel - res + unc), abs=1e-4
    )


def test_ips_snips_matches_numpy(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        offline_policy_ips_snips,
    )

    rows = _per_user(spark, sf_dir)
    a = np.array([r.user_id % 2 for r in rows], dtype=float)
    pi = np.array([float(r.views >= 13) for r in rows])
    rew = np.array([r.o for r in rows])
    w = (pi == a).astype(float) / 0.5
    r = offline_policy_ips_snips(spark, sf_dir).collect()[0]
    assert r.n_users == len(rows)
    assert r.match_rate == pytest.approx((pi == a).mean(), abs=1e-4)
    assert r.value_logging == pytest.approx(rew.mean(), abs=1e-3)
    assert r.value_ips == pytest.approx((w * rew).mean(), abs=1e-3)
    assert r.value_snips == pytest.approx(
        (w * rew).sum() / w.sum(), abs=1e-3
    )
    assert r.effective_sample_size == pytest.approx(
        w.sum() ** 2 / (w**2).sum(), abs=0.02
    )


def test_dr_policy_value_ties_out(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        offline_policy_doubly_robust,
        offline_policy_ips_snips,
    )

    rows = _per_user(spark, sf_dir)
    a = np.array([r.user_id % 2 for r in rows], dtype=float)
    tier = np.array([int(r.views >= 13) for r in rows])
    pi = tier.astype(float)
    rew = np.array([r.o for r in rows])
    m = {}
    for t in (0, 1):
        for act in (0.0, 1.0):
            mask = (tier == t) & (a == act)
            m[(t, act)] = rew[mask].mean()
    m_logged = np.array([m[(t, act)] for t, act in zip(tier, a)])
    m_target = np.array([m[(t, p)] for t, p in zip(tier, pi)])
    match = (pi == a).astype(float)
    dm = m_target.mean()
    dr = (m_target + match * (rew - m_logged) / 0.5).mean()
    r = offline_policy_doubly_robust(spark, sf_dir).collect()[0]
    assert r.n_users == len(rows)
    assert r.value_direct == pytest.approx(dm, abs=1e-3)
    assert r.value_dr == pytest.approx(dr, abs=1e-3)
    # the two queries' IPS columns are the same estimator
    r2 = offline_policy_ips_snips(spark, sf_dir).collect()[0]
    assert r.value_ips == pytest.approx(r2.value_ips, abs=1e-9)


def test_ddd_is_the_two_did_difference(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        triple_difference_ddd,
    )

    r = triple_difference_ddd(spark, sf_dir).collect()[0]
    assert r.n_user_periods > 0
    assert r.ddd == pytest.approx(
        r.did_heavy - r.did_light, abs=2e-4
    )


def test_holm_adjustment_replay_and_monotone(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_experiments import (
        holm_fwer_adjust,
    )

    rows = holm_fwer_adjust(spark, sf_dir).collect()
    k = len(rows)
    # replay Holm on the emitted raw p-values (6dp-rounded upstream;
    # raw_p is the 4dp display of the same number)
    order = sorted(rows, key=lambda r: (r.raw_p, r.segment))
    running = 0.0
    for i, r in enumerate(order, 1):
        running = max(running, (k - i + 1) * r.raw_p)
        assert r.holm_adj_p == pytest.approx(
            min(1.0, running), abs=2e-3  # 4dp raw_p vs 6dp internal
        )
        assert r.rejected == int(r.holm_adj_p < 0.05)
    # adjusted p never below raw, and step-down is monotone in rank
    for r in rows:
        assert r.holm_adj_p >= r.raw_p - 1e-9
    adj_in_order = [r.holm_adj_p for r in order]
    assert adj_in_order == sorted(adj_in_order)
    # null fixture: nothing should be rejected family-wise
    assert sum(r.rejected for r in rows) == 0
