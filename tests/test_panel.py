"""Independent numpy cross-checks for the panel/counterfactual
estimator pack (plans/queries_panel.py).

Per the round-6 verdict discipline: every formula whose Spark and
DuckDB sides share the same algebraic text gets an INDEPENDENT
replay here (numpy lstsq / eigvals / direct recursion), so a shared
transcription error cannot hash-MATCH its way past the gate.
"""

from __future__ import annotations

import numpy as np
import pytest

from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
    cox_ph_one_step,
    evalue_sensitivity_bound,
    local_projection_irf,
    mediation_product_effect,
    page_hinkley_drift,
    placebo_permutation_did,
    quantile_treatment_effect,
    synthetic_control_gap,
    two_way_fixed_effects_did,
    var1_stability_check,
)


def _user_day(spark, sf_dir):
    """(user_id, daynum, click_flag, purchase_value) dense numpy grid."""
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy(
            "user_id",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
            ).alias("day"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("y"),
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
    users = sorted({r.user_id for r in rows})
    days = sorted({r.day for r in rows})
    ui = {u: i for i, u in enumerate(users)}
    di = {d: i for i, d in enumerate(days)}
    y = np.zeros((len(users), len(days)))
    o = np.zeros((len(users), len(days)))
    for r in rows:
        y[ui[r.user_id], di[r.day]] = r.y
        o[ui[r.user_id], di[r.day]] = r.o
    return users, days, y, o


def test_twfe_matches_numpy_double_demean(spark, sf_dir):
    users, days, y, o = _user_day(spark, sf_dir)
    yt = y - y.mean(1, keepdims=True) - y.mean(0, keepdims=True) + y.mean()
    ot = o - o.mean(1, keepdims=True) - o.mean(0, keepdims=True) + o.mean()
    slope = (yt * ot).sum() / (yt * yt).sum()
    r = two_way_fixed_effects_did(spark, sf_dir).collect()[0]
    assert r.n_users == len(users)
    assert r.n_days == len(days)
    assert r.twfe_effect == pytest.approx(slope, abs=1e-3)
    # balanced grid: pooled OLS from the same matrix
    yf, of = y.ravel(), o.ravel()
    pooled = np.cov(yf, of, bias=True)[0, 1] / np.var(yf)
    assert r.pooled_effect == pytest.approx(pooled, abs=1e-3)


def test_placebo_did_p_bounds_and_actual_is_k0(spark, sf_dir):
    r = placebo_permutation_did(spark, sf_dir).collect()[0]
    assert r.n_placebos == 16
    # permutation p-value can never be below 1/(K+1) or above 1
    assert 1.0 / 17 - 1e-9 <= r.empirical_p <= 1.0
    assert abs(r.actual_did) <= r.placebo_max_abs or r.empirical_p == round(
        1.0 / 17, 4
    )


def test_cox_one_step_matches_numpy_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
    )
    rows = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "purchase", day)
            ).alias("tp")
        )
        .collect()
    )
    c = max(
        r[0] for r in ev.select(F.max(day)).collect()
    )
    T = np.array([r.tp if r.tp is not None else c for r in rows])
    E = np.array([1 if r.tp is not None else 0 for r in rows])
    X = np.array([r.user_id % 2 for r in rows], dtype=float)
    U = I = 0.0
    for t in np.unique(T[E == 1]):
        at_risk = T >= t
        s0, s1 = at_risk.sum(), X[at_risk].sum()
        d = ((T == t) & (E == 1)).sum()
        dx = X[(T == t) & (E == 1)].sum()
        U += dx - d * s1 / s0
        I += d * (s1 / s0) * (1 - s1 / s0)
    r = cox_ph_one_step(spark, sf_dir).collect()[0]
    assert r.n_subjects == len(rows)
    assert r.n_events == int(E.sum())
    assert r.beta == pytest.approx(U / I, abs=1e-3)
    assert r.score_z == pytest.approx(U / np.sqrt(I), abs=1e-3)
    assert r.hazard_ratio == pytest.approx(np.exp(U / I), rel=1e-3)


def test_synthetic_control_matches_numpy_lstsq(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
    )

    def coh(r):
        return F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("user_id") % 3 == r),
                        F.col("value"),
                    )
                ),
                F.lit(0.0),
            ),
            6,
        )

    rows = (
        ev.groupBy(day.alias("day"))
        .agg(coh(0).alias("yt"), coh(1).alias("x1"), coh(2).alias("x2"))
        .collect()
    )
    rows.sort(key=lambda r: r.day)
    pre = [r for r in rows if r.day < 20]
    post = [r for r in rows if r.day >= 20]
    A = np.array([[1.0, r.x1, r.x2] for r in pre])
    b = np.array([r.yt for r in pre])
    beta = np.linalg.lstsq(A, b, rcond=None)[0]
    beta = np.round(beta, 8)  # the query rounds coefficients to 8dp
    gaps_pre = b - A @ beta
    Apost = np.array([[1.0, r.x1, r.x2] for r in post])
    gaps_post = np.array([r.yt for r in post]) - Apost @ beta
    r = synthetic_control_gap(spark, sf_dir).collect()[0]
    assert r.n_pre == len(pre) and r.n_post == len(post)
    assert r.w_donor1 == pytest.approx(beta[1], abs=1e-3)
    assert r.w_donor2 == pytest.approx(beta[2], abs=1e-3)
    assert r.pre_rmse == pytest.approx(
        np.sqrt((gaps_pre**2).mean()), abs=1e-3
    )
    assert r.post_att_gap == pytest.approx(gaps_post.mean(), abs=1e-3)


def test_mediation_identity_and_numpy(spark, sf_dir):
    r = mediation_product_effect(spark, sf_dir).collect()[0]
    # linear mediation identity: total = direct + indirect (4dp rounding)
    assert r.total_effect == pytest.approx(
        r.direct_effect + r.indirect_effect, abs=2e-3
    )
    if r.total_effect:
        assert r.prop_mediated == pytest.approx(
            r.indirect_effect / r.total_effect, abs=2e-3
        )


def test_local_projection_h0_matches_polyfit(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
    )
    rows = (
        ev.groupBy(day.alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("double")
            .alias("x"),
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
            ).alias("y"),
        )
        .collect()
    )
    rows.sort(key=lambda r: r.day)
    x = np.array([r.x for r in rows])
    y = np.array([r.y for r in rows])
    out = {r.horizon: r for r in local_projection_irf(spark, sf_dir).collect()}
    assert sorted(out) == list(range(6))
    b0 = np.polyfit(x, y, 1)[0]
    assert out[0].beta == pytest.approx(b0, abs=1e-3)
    # h=2 lead replay
    b2 = np.polyfit(x[:-2], y[2:], 1)[0]
    assert out[2].beta == pytest.approx(b2, abs=1e-3)
    assert out[2].n_obs == len(x) - 2


def test_var1_radius_matches_numpy_eigvals(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
    )

    def ser(et):
        return F.round(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == et, F.col("value"))),
                F.lit(0.0),
            ),
            6,
        )

    rows = (
        ev.groupBy(day.alias("day"))
        .agg(ser("view").alias("u"), ser("purchase").alias("v"))
        .collect()
    )
    rows.sort(key=lambda r: r.day)
    u = np.array([r.u for r in rows])
    v = np.array([r.v for r in rows])
    A = np.column_stack([np.ones(len(u) - 1), u[:-1], v[:-1]])
    cu = np.linalg.lstsq(A, u[1:], rcond=None)[0]
    cv = np.linalg.lstsq(A, v[1:], rcond=None)[0]
    comp = np.array([[cu[1], cu[2]], [cv[1], cv[2]]])
    radius = max(abs(np.linalg.eigvals(comp)))
    r = var1_stability_check(spark, sf_dir).collect()[0]
    assert r.a_uu == pytest.approx(cu[1], abs=1e-3)
    assert r.a_uv == pytest.approx(cu[2], abs=1e-3)
    assert r.a_vu == pytest.approx(cv[1], abs=1e-3)
    assert r.a_vv == pytest.approx(cv[2], abs=1e-3)
    assert r.spectral_radius == pytest.approx(radius, abs=1e-3)
    assert r.stable == int(radius < 1)


def test_evalue_formula_and_bounds(spark, sf_dir):
    r = evalue_sensitivity_bound(spark, sf_dir).collect()[0]
    rrs = max(r.risk_ratio, 1 / r.risk_ratio)
    assert r.e_value == pytest.approx(
        rrs + np.sqrt(rrs * (rrs - 1)), abs=2e-3
    )
    # E-value is always >= 1, and >= the CI E-value (CI is nearer null)
    assert r.e_value >= 1.0
    assert 1.0 <= r.e_value_ci <= r.e_value + 1e-9
    assert r.rr_ci_low <= r.risk_ratio <= r.rr_ci_high


def test_page_hinkley_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
    )
    rows = (
        ev.groupBy(day.alias("day"))
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .collect()
    )
    rows.sort(key=lambda r: r.day)
    x = np.array([r.x for r in rows])
    lam = round(2 * x.std(ddof=1), 6)
    runmean = np.cumsum(x) / np.arange(1, len(x) + 1)
    ph = np.cumsum(x - runmean)
    excess = ph - np.minimum.accumulate(ph)
    r = page_hinkley_drift(spark, sf_dir).collect()[0]
    assert r.n_days == len(x)
    assert r.lambda_threshold == pytest.approx(lam, abs=1e-3)
    assert r.max_excess == pytest.approx(excess.max(), abs=1e-3)
    alarms = np.nonzero(excess > lam)[0]
    expected_day = rows[alarms[0]].day if len(alarms) else -1
    assert r.first_alarm_day == expected_day
    assert r.alarm == int(len(alarms) > 0)


def test_qte_is_order_statistic(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("user_id")
        .agg(
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
            ).alias("o")
        )
        .collect()
    )
    arms = {0: [], 1: []}
    for r in rows:
        arms[r.user_id % 2].append(r.o)
    out = {
        r.quantile: r for r in quantile_treatment_effect(spark, sf_dir).collect()
    }
    assert sorted(out) == [0.25, 0.5, 0.75]
    import math

    for q, row in out.items():
        for arm, col in ((1, "q_treated"), (0, "q_control")):
            vals = sorted(arms[arm])
            expect = round(vals[math.ceil(q * len(vals)) - 1], 4)
            assert getattr(row, col) == pytest.approx(expect, abs=1e-9)
        assert row.qte == pytest.approx(
            row.q_treated - row.q_control, abs=1e-9
        )


def test_elasticity_matches_numpy_within_estimator(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
        price_elasticity_within_part,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.round(F.log(F.col("l_quantity").cast("double")), 6).alias(
                "y"
            ),
            F.round(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6
            ).alias("x"),
        )
        .collect()
    )
    import collections

    by_pk = collections.defaultdict(list)
    for r in rows:
        by_pk[r.pk].append((r.x, r.y))
    sxy = sxx = 0.0
    for vals in by_pk.values():
        xs = np.array([v[0] for v in vals])
        ys = np.array([v[1] for v in vals])
        xt = xs - round(xs.mean(), 6)
        yt = ys - round(ys.mean(), 6)
        sxy += (xt * yt).sum()
        sxx += (xt * xt).sum()
    x = np.array([r.x for r in rows])
    y = np.array([r.y for r in rows])
    pooled = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    r = price_elasticity_within_part(spark, sf_dir).collect()[0]
    assert r.n_lines == len(rows)
    assert r.n_parts == len(by_pk)
    assert r.elasticity_within == pytest.approx(sxy / sxx, abs=1e-3)
    assert r.elasticity_pooled == pytest.approx(pooled, abs=1e-3)


def test_promo_did_is_the_cell_identity(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
        promo_did_lineitem,
    )

    r = promo_did_lineitem(spark, sf_dir).collect()[0]
    assert r.n_lines > 0
    assert r.promo_did == pytest.approx(
        r.treated_post - r.treated_pre - r.control_post + r.control_pre,
        abs=2e-4,  # four independently-4dp-rounded cells
    )
    # all four cells populated: the cutoff and the part-type split
    # both land inside the data on every fixture sf
    for c in (r.treated_post, r.treated_pre, r.control_post, r.control_pre):
        assert c is not None and c > 0


def test_interference_matches_numpy_two_regressor(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
        _cosupply_edges,
        network_interference_exposure,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    edges = [(r.u, r.v) for r in _cosupply_edges(spark, sf_dir).collect()]
    sup = {
        r.s_suppkey: round(r.s_acctbal, 4)
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    import collections

    nbrs = collections.defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    t, e, y = [], [], []
    for s, ns in nbrs.items():
        t.append(float(s % 2))
        e.append(round(np.mean([n % 2 for n in ns]), 6))
        y.append(sup[s])
    t, e, y = np.array(t), np.array(e), np.array(y)
    r = network_interference_exposure(spark, sf_dir).collect()[0]
    assert r.n_suppliers == len(sup)
    assert r.n_connected == len(nbrs)
    assert r.mean_exposure == pytest.approx(e.mean(), abs=1e-3)
    # replicate the dimensionless degeneracy guard
    n = len(t)
    stt = (t * t).sum() - t.sum() ** 2 / n
    see = (e * e).sum() - e.sum() ** 2 / n
    ste = (t * e).sum() - t.sum() * e.sum() / n
    det = stt * see - ste * ste
    if abs(det) <= 1e-6 * stt * see:
        # sf0.001's near-complete graph: exposure is an exact affine
        # function of own treatment (e = (n_treated - t)/(n-1))
        assert r.collinear == 1
        assert r.direct_effect is None and r.spillover_effect is None
        assert abs(np.corrcoef(t, e)[0, 1]) > 1 - 1e-9
    else:
        assert r.collinear == 0
        A = np.column_stack([np.ones_like(t), t, e])
        b = np.linalg.lstsq(A, y, rcond=None)[0]
        assert r.direct_effect == pytest.approx(b[1], abs=1e-2)
        assert r.spillover_effect == pytest.approx(b[2], abs=1e-2)


def test_conformal_quantile_and_coverage_replay(spark, sf_dir):
    import math

    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
        conformal_prediction_interval,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy(
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
            ).alias("day")
        )
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .collect()
    )
    rows.sort(key=lambda r: r.day)
    days = [r.day for r in rows]
    x = [r.x for r in rows]
    resid = {
        days[i]: abs(x[i] - x[i - 1]) for i in range(1, len(days))
    }
    cal = sorted(v for d, v in resid.items() if d < 20)
    ev_r = [v for d, v in resid.items() if d >= 20]
    k = min(len(cal), math.ceil((len(cal) + 1) * 0.9))
    qhat = cal[k - 1]
    r = conformal_prediction_interval(spark, sf_dir).collect()[0]
    assert r.n_cal == len(cal) and r.n_eval == len(ev_r)
    assert r.q_hat == pytest.approx(qhat, abs=1e-4)
    assert r.interval_width == pytest.approx(2 * qhat, abs=2e-4)
    assert r.empirical_coverage == pytest.approx(
        np.mean([v <= qhat for v in ev_r]), abs=1e-4
    )


def test_staggered_att_matches_numpy_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
        staggered_adoption_att,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy(
            "user_id",
            F.floor(
                F.datediff(
                    F.date_trunc("day", "ts").cast("date"),
                    F.lit("2024-01-01"),
                )
                / 7
            ).alias("w"),
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
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
            ).alias("y"),
        )
        .collect()
    )
    import collections

    by_user = collections.defaultdict(dict)
    for r in rows:
        by_user[r.user_id][r.w] = (r.clicks, r.y)
    g_of = {}
    for u, wks in by_user.items():
        adopted = [w for w, (c, _) in wks.items() if c >= 6]
        g_of[u] = min(adopted) if adopted else -1
    cohorts = collections.defaultdict(list)
    for u, g in g_of.items():
        cohorts[g].append(u)

    def ybar(g, w):
        users = cohorts[g]
        return sum(by_user[u].get(w, (0, 0.0))[1] for u in users) / len(
            users
        )

    out = {
        (r.cohort_week, r.calendar_week): r
        for r in staggered_adoption_att(spark, sf_dir).collect()
    }
    assert sorted(out) == [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)]
    for (g, t), r in out.items():
        assert r.event_time == t - g
        assert r.n_treated == len(cohorts[g])
        assert r.n_control == len(cohorts[-1])
        expect = (
            ybar(g, t) - ybar(g, g - 1) - ybar(-1, t) + ybar(-1, g - 1)
        )
        assert r.att == pytest.approx(expect, abs=1e-3)


def test_event_study_is_weighted_cell_average(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
        staggered_adoption_att,
        staggered_event_study,
    )

    cells = staggered_adoption_att(spark, sf_dir).collect()
    out = {r.event_time: r for r in staggered_event_study(spark, sf_dir).collect()}
    assert sorted(out) == [0, 1, 2]
    import collections

    acc = collections.defaultdict(lambda: [0.0, 0, 0])
    for c in cells:
        e = c.calendar_week - c.cohort_week
        acc[e][0] += c.att * c.n_treated
        acc[e][1] += c.n_treated
        acc[e][2] += 1
    for e, (num, den, k) in acc.items():
        assert out[e].n_cohorts == k
        assert out[e].n_treated_total == den
        assert out[e].att_event == pytest.approx(num / den, abs=1e-4)
    # composition honesty: cohort support shrinks with event time
    assert out[0].n_cohorts >= out[1].n_cohorts >= out[2].n_cohorts


def test_bacon_decomposition_reconstructs_twfe(spark, sf_dir):
    """The Goodman-Bacon theorem, verified numerically: the
    weight-averaged 2x2 components equal the TWFE DiD coefficient
    computed directly by double-demeaning on the same balanced panel
    (cohorts {1,2,3} + never-treated, weeks 0..3, g=0 and g>=4 users
    excluded exactly as the query excludes them)."""
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_panel import (
        _daynum,
        bacon_did_decomposition,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    rows = bacon_did_decomposition(spark, sf_dir).collect()
    assert len(rows) == 9
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    beta_decomp = sum(r.dd_estimate * r.weight for r in rows)

    ev = load_table(spark, sf_dir, "events")
    wk = (
        ev.groupBy(
            "user_id", F.floor(_daynum() / 7).cast("bigint").alias("w")
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("yc"),
        )
        .toPandas()
    )
    first = (
        wk[wk.clicks >= 6].groupby("user_id").w.min().to_dict()
    )
    cohort = {u: int(first.get(u, -1)) for u in wk.user_id.unique()}
    users = sorted(u for u, g in cohort.items() if g in (-1, 1, 2, 3))
    ymap = {
        (u, w): yc / 100.0
        for u, w, yc in zip(wk.user_id, wk.w, wk.yc)
        if w <= 3
    }
    T = 4
    y = np.array(
        [[ymap.get((u, t), 0.0) for t in range(T)] for u in users]
    )
    D = np.array(
        [
            [
                1.0 if (cohort[u] != -1 and t >= cohort[u]) else 0.0
                for t in range(T)
            ]
            for u in users
        ]
    )
    yd = y - y.mean(1, keepdims=True) - y.mean(0, keepdims=True) + y.mean()
    Dd = D - D.mean(1, keepdims=True) - D.mean(0, keepdims=True) + D.mean()
    beta_twfe = float((Dd * yd).sum() / (Dd * Dd).sum())
    assert abs(beta_twfe - beta_decomp) < 1e-4, (beta_twfe, beta_decomp)
