"""Independent numpy replays for the time-series diagnostics pack
(plans/queries_tsdiag.py) — the shared-SQL-text-formula discipline:
Spark and DuckDB evaluating the same algebra is not an independent
check, numpy recomputing it from the raw grids is."""

from __future__ import annotations

import math

import numpy as np
import pytest

from causality_between_elements_based_on_time_series_data_spark.plans.queries_tsdiag import (
    arch_lm_test,
    binary_segmentation_changepoints,
    block_bootstrap_variance,
    hurst_exponent_rs,
    kalman_local_level,
    ljung_box_test,
    rolling_corr_stability,
    spectral_coherence_pair,
)


def _daily_mean_np(spark, sf_dir):
    from pyspark.sql import functions as F

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
    return np.array([r.day for r in rows]), np.array([r.x for r in rows])


def _hourly_np(spark, sf_dir, cols):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for name, expr in cols.items():
        aggs.append(expr.alias(name))
    rows = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(*aggs)
        .collect()
    )
    rows.sort(key=lambda r: r.hour)
    return {name: np.array([r[name] for r in rows]) for name in cols}


def test_ljung_box_matches_numpy(spark, sf_dir):
    _, x = _daily_mean_np(spark, sf_dir)
    n = len(x)
    dev = x - x.mean()
    ss = (dev**2).sum()
    q = 0.0
    max_acf = 0.0
    for k in range(1, 8):
        rk = (dev[k:] * dev[:-k]).sum() / ss
        q += rk * rk / (n - k)
        max_acf = max(max_acf, abs(rk))
    q *= n * (n + 2)
    r = ljung_box_test(spark, sf_dir).collect()[0]
    assert r.n_days == n
    assert r.df == 7
    assert r.q_stat == pytest.approx(q, abs=1e-3)
    assert r.max_abs_acf == pytest.approx(max_acf, abs=1e-3)
    assert 0.0 <= r.p_value <= 1.0


def test_arch_lm_matches_numpy(spark, sf_dir):
    _, x = _daily_mean_np(spark, sf_dir)
    xl, xt = x[:-1], x[1:]
    b1 = np.cov(xl, xt, bias=True)[0, 1] / np.var(xl)
    b0 = xt.mean() - b1 * xl.mean()
    e = np.round(xt - b0 - b1 * xl, 6)
    u, ul = (e**2)[1:], (e**2)[:-1]
    r2 = np.corrcoef(u, ul)[0, 1] ** 2
    lm = len(u) * r2
    r = arch_lm_test(spark, sf_dir).collect()[0]
    assert r.n_obs == len(u)
    assert r.lm_stat == pytest.approx(lm, abs=1e-3)
    assert r.r2 == pytest.approx(r2, abs=1e-3)
    assert r.arch_flag == int(lm > 3.8415)
    assert 0.0 <= r.p_value <= 1.0


def _daily_pair_np(spark, sf_dir):
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")

    def ser(et):
        return F.round(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == et, F.col("value"))),
                F.lit(0.0),
            ),
            6,
        )

    rows = (
        ev.groupBy(
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
            ).alias("day")
        )
        .agg(ser("view").alias("u"), ser("purchase").alias("v"))
        .collect()
    )
    rows.sort(key=lambda r: r.day)
    return (
        np.array([r.u for r in rows]),
        np.array([r.v for r in rows]),
    )


def test_rolling_corr_matches_numpy(spark, sf_dir):
    u, v = _daily_pair_np(spark, sf_dir)
    rs = [
        round(np.corrcoef(u[i - 6 : i + 1], v[i - 6 : i + 1])[0, 1], 6)
        for i in range(6, len(u))
    ]
    full = np.corrcoef(u, v)[0, 1]
    r = rolling_corr_stability(spark, sf_dir).collect()[0]
    assert r.n_windows == len(rs)
    assert r.full_sample_corr == pytest.approx(full, abs=1e-3)
    assert r.min_corr == pytest.approx(min(rs), abs=1e-3)
    assert r.max_corr == pytest.approx(max(rs), abs=1e-3)
    assert r.mean_corr == pytest.approx(np.mean(rs), abs=1e-3)
    assert r.sign_flip == int(any(x * full < 0 for x in rs))


def test_block_bootstrap_matches_numpy(spark, sf_dir):
    _, x = _daily_mean_np(spark, sf_dir)
    n, L, B = len(x), 5, 16
    n_starts = n - L + 1
    bsum = np.array([x[s : s + L].sum() for s in range(n_starts)])
    nblk = math.ceil(n / L)
    means = []
    for b in range(1, B + 1):
        tot = 0.0
        for j in range(1, nblk + 1):
            s = (b * 7 + j * 11) % n_starts  # 0-indexed == (..)+1 in rn
            tot += bsum[s]
        means.append(tot / (nblk * L))
    block_se = np.std(means, ddof=1)
    iid_se = x.std(ddof=1) / math.sqrt(n)
    r = block_bootstrap_variance(spark, sf_dir).collect()[0]
    assert r.n_days == n and r.block_len == L and r.n_resamples == B
    assert r.iid_se == pytest.approx(iid_se, abs=1e-4)
    assert r.block_se == pytest.approx(block_se, abs=1e-4)
    assert r.inflation_ratio == pytest.approx(block_se / iid_se, abs=1e-3)


def test_coherence_matches_numpy_welch(spark, sf_dir):
    from pyspark.sql import functions as F

    cols = {
        "u": F.round(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "view", F.col("value"))),
                F.lit(0.0),
            ),
            6,
        ),
        "v": F.round(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                F.lit(0.0),
            ),
            6,
        ),
    }
    d = _hourly_np(spark, sf_dir, cols)
    u, v = d["u"], d["v"]
    n = len(u)
    seg_len = n // 5
    out = {
        r.period_hours: r
        for r in spectral_coherence_pair(spark, sf_dir).collect()
    }
    assert sorted(out) == [6, 12, 24, 168]
    for p in (6, 24):
        sxy = 0j
        sxx = syy = 0.0
        for s in range(5):
            tau = np.arange(seg_len)
            us, vs = u[s * seg_len : (s + 1) * seg_len], v[
                s * seg_len : (s + 1) * seg_len
            ]
            w = np.exp(-2j * np.pi * tau / p)
            X = (us * w).sum()
            Y = (vs * w).sum()
            sxy += X * np.conj(Y) / 5
            sxx += abs(X) ** 2 / 5
            syy += abs(Y) ** 2 / 5
        coh = abs(sxy) ** 2 / (sxx * syy)
        assert out[p].n_segments == 5
        assert out[p].coherence == pytest.approx(coh, abs=1e-3)
        assert 0.0 <= out[p].coherence <= 1.0 + 1e-9
        assert out[p].phase_rad == pytest.approx(
            np.angle(sxy), abs=1e-3
        )


def test_hurst_matches_numpy_rs(spark, sf_dir):
    from pyspark.sql import functions as F

    d = _hourly_np(
        spark, sf_dir, {"x": F.round(F.sum("value"), 6)}
    )
    x = d["x"]
    out = {
        r.block_size: r for r in hurst_exponent_rs(spark, sf_dir).collect()
    }
    ms = [m for m in (16, 32, 64, 128) if len(x) // m >= 1]
    lrs, lms = [], []
    for m in ms:
        vals = []
        for b in range(len(x) // m):
            blk = x[b * m : (b + 1) * m]
            dev = blk - blk.mean()
            cum = np.cumsum(dev)
            s = blk.std()
            if s > 0:
                vals.append((cum.max() - cum.min()) / s)
        assert out[m].n_blocks == len(vals)
        assert out[m].mean_rs == pytest.approx(np.mean(vals), abs=1e-3)
        lrs.append(math.log(np.mean(vals)))
        lms.append(math.log(m))
    h = np.polyfit(lms, lrs, 1)[0]
    for m in ms:
        assert out[m].hurst == pytest.approx(h, abs=1e-3)
        assert 0.0 < out[m].hurst < 1.5


def test_kalman_matches_numpy_recursion(spark, sf_dir):
    _, x = _daily_mean_np(spark, sf_dir)
    level, p, ss = x[0], 1.0, 0.0
    q = 0.1
    for v in x[1:]:
        pp = p + q
        k = pp / (pp + 1)
        innov = v - level
        level = level + k * innov
        p = (1 - k) * pp
        ss += innov * innov
    r = kalman_local_level(spark, sf_dir).collect()[0]
    assert r.n_days == len(x)
    assert r.final_level == pytest.approx(level, abs=1e-3)
    assert r.steady_gain == pytest.approx(
        (p + q) / (p + q + 1), abs=1e-3
    )
    assert r.innovation_rmse == pytest.approx(
        math.sqrt(ss / (len(x) - 1)), abs=1e-3
    )
    # fixed q/r=0.1 steady-state gain: root of k^2+k*q-q=0
    kss = (-q + math.sqrt(q * q + 4 * q)) / 2
    assert r.steady_gain == pytest.approx(kss, abs=1e-3)


def test_binary_segmentation_matches_numpy(spark, sf_dir):
    days, x = _daily_mean_np(spark, sf_dir)

    def top(xs, ds):
        cum = np.round(np.abs(np.cumsum(xs - xs.mean())), 6)
        i = int(np.lexsort((ds, -cum))[0])
        stat = cum[i] / (xs.std(ddof=1) * math.sqrt(len(xs)))
        return ds[i], stat, len(xs)

    d1, s1, n1 = top(x, days)
    left = days <= d1
    rows = {
        (r.level, r.side): r
        for r in binary_segmentation_changepoints(spark, sf_dir).collect()
    }
    r_all = rows[(1, "all")]
    assert r_all.split_day == d1 and r_all.n_obs == n1
    assert r_all.stat == pytest.approx(s1, abs=1e-3)
    for side, mask in (("left", left), ("right", ~left)):
        ds, ss, ns = top(x[mask], days[mask])
        r = rows[(2, side)]
        assert r.split_day == ds and r.n_obs == ns
        assert r.stat == pytest.approx(ss, abs=1e-3)


def test_forecast_backtest_replay(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_tsdiag import (
        forecast_backtest_mape,
    )

    _, x = _daily_mean_np(spark, sf_dir)
    n = len(x)
    evals = {"naive": [], "seasonal_naive": [], "drift": []}
    for i in range(8, n):  # rn > 8, 0-indexed i = rn-1
        evals["naive"].append((x[i], x[i - 1]))
        evals["seasonal_naive"].append((x[i], x[i - 7]))
        evals["drift"].append(
            (x[i], x[i - 1] + (x[i - 1] - x[0]) / (i - 1))
        )
    out = {r.method: r for r in forecast_backtest_mape(spark, sf_dir).collect()}
    assert sorted(out) == ["drift", "naive", "seasonal_naive"]
    mapes = {}
    for m, pairs in evals.items():
        a = np.array(pairs)
        mape = np.mean(np.abs(a[:, 0] - a[:, 1]) / np.abs(a[:, 0]))
        rmse = math.sqrt(np.mean((a[:, 0] - a[:, 1]) ** 2))
        assert out[m].n_evals == len(pairs)
        assert out[m].mape == pytest.approx(mape, abs=1e-3)
        assert out[m].rmse == pytest.approx(rmse, abs=1e-3)
        mapes[m] = round(mape, 6)
    order = sorted(mapes, key=lambda m: (mapes[m], m))
    for rank, m in enumerate(order, 1):
        # rank() semantics: ties share a rank; fixture mapes are distinct
        assert out[m].mape_rank == rank
