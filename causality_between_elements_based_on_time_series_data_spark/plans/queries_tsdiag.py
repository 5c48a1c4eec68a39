"""Time-series model diagnostics (SURVEY.md §2.12 [EXT], round-8
batch 3): the residual/assumption checks that decide whether the lag
regressions, trend tests and forecasts elsewhere in the registry can
be believed.

The reference models temporal dependence explicitly (`model.py:61-63`
recurrence, `model.py:147` temporal attention); an analytics engine
for the same data needs the DIAGNOSTIC layer that measures that
dependence in raw series before/after modeling:

- ``ljung_box_test`` — portmanteau whiteness test: are the first 7
  autocorrelations jointly zero?  (The residual gate behind
  ar2_yule_walker / holt_* forecasts.)
- ``arch_lm_test`` — Engle's LM test for conditional
  heteroskedasticity on AR(1) residuals: constant-variance inference
  (every closed-form SE in the registry) fails under ARCH effects.
- ``rolling_corr_stability`` — 7-day rolling correlation of the
  view/purchase daily pair: a relationship whose sign flips across
  windows will fool any single full-sample correlation.
- ``block_bootstrap_variance`` — moving-block bootstrap SE of the
  daily mean vs the iid SE: the autocorrelation inflation factor that
  says how wrong bootstrap_mean_ci's iid resampling is here.
- ``spectral_coherence_pair`` — Welch-averaged cross-spectral
  coherence + phase lag at candidate periods (6/12/24/168 h): HOW
  MUCH of the pair's co-movement lives at each frequency, and which
  series leads.
- ``hurst_exponent_rs`` — rescaled-range long-memory estimate over
  dyadic block sizes: H far from 0.5 invalidates sqrt(n) error bars.
- ``kalman_local_level`` — local-level Kalman filter (fixed q/r) as
  one ordered array fold; innovation RMSE + steady-state gain.
- ``binary_segmentation_changepoints`` — two-level binary
  segmentation by the max-|CUSUM| statistic: the hierarchical
  extension of cusum_changepoint_location.

All facts reduce to the hourly or daily grid first; every query is
fully DuckDB-oracled (recursion staged through CTEs where needed) and
numpy-pinned in ``tests/test_tsdiag.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..lineage import ckpt

from ..sources.catalog import load_table
from .queries_causality import _phi_spark, _phi_sql
from .registry import register

_DAYNUM_SQL = (
    "date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))"
)


def _daynum(col: str = "ts"):
    return F.datediff(
        F.date_trunc("day", col).cast("date"), F.lit("2024-01-01")
    )


_DAILY_MEAN_SQL = f"""
    WITH daily AS (
        SELECT {_DAYNUM_SQL} AS day, round(avg(value), 6) AS x
        FROM events GROUP BY 1
    )
"""


def _daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazily checkpointed: every diagnostic in this file fans the tiny
    # daily grid into several branches (moment scalars, lag windows,
    # residual passes) — the lineage cut makes the events reduce run
    # once per query instead of once per branch
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(_daynum().alias("day")).agg(
        F.round(F.avg("value"), 6).alias("x")
    ).transform(ckpt)


_LB_LAGS = 7


@register(
    "ljung_box_test",
    oracle=_DAILY_MEAN_SQL
    + f""",
    c AS (
        SELECT d.day, d.x, g.xbar, g.n, g.ss
        FROM daily d CROSS JOIN (
            SELECT avg(x) AS xbar, CAST(count(*) AS DOUBLE) AS n,
                   sum((x - (SELECT avg(x) FROM daily))
                       * (x - (SELECT avg(x) FROM daily))) AS ss
            FROM daily
        ) g
    ),
    lagged AS (
        SELECT x, xbar, n, ss,
               {", ".join(f"lag(x, {k}) OVER (ORDER BY day) AS x{k}"
                          for k in range(1, _LB_LAGS + 1))}
        FROM c
    ),
    acf AS (
        SELECT max(n) AS n,
               {", ".join(
                   f"sum((x - xbar) * (x{k} - xbar)) / max(ss) AS r{k}"
                   for k in range(1, _LB_LAGS + 1))}
        FROM lagged
    ),
    q AS (
        SELECT n,
               n * (n + 2) * ({" + ".join(
                   f"r{k} * r{k} / (n - {k})"
                   for k in range(1, _LB_LAGS + 1))}) AS q_stat,
               greatest({", ".join(f"abs(r{k})"
                                   for k in range(1, _LB_LAGS + 1))})
                   AS max_abs_acf
        FROM acf
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(q_stat, 4) AS q_stat,
           {_LB_LAGS} AS df,
           round(1 - {_phi_sql(
               f"((power(q_stat / {_LB_LAGS}, 1.0/3)"
               f" - (1 - 2.0/(9*{_LB_LAGS})))"
               f" / sqrt(2.0/(9*{_LB_LAGS})))")}, 4) AS p_value,
           round(max_abs_acf, 4) AS max_abs_acf
    FROM q
    """,
    doc="Ljung-Box portmanteau whiteness test on the daily mean-value "
    "series: Q = n(n+2) * sum_k r_k^2/(n-k) over the first 7 "
    "autocorrelations, chi-square(7) p-value via the Wilson-Hilferty "
    "cube-root normal approximation (shared tanh-Phi text on both "
    "engines).  A small p says the series is NOT white noise — the "
    "precondition check behind every iid-error closed-form SE in the "
    "registry, and the residual gate a fitted ar2_yule_walker / "
    "holt_* model must pass.  All 7 lag products come from ONE "
    "window pass over the volume-independent daily grid; numpy "
    "replay pinned in tests/test_tsdiag.py.  Scale: events reduce "
    "map-side to the ~30-row grid; everything after is bounded.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_mean(spark, sf_dir)
    g = daily.agg(
        F.avg("x").alias("xbar"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    c = daily.crossJoin(F.broadcast(g)).withColumn(
        "dev", F.col("x") - F.col("xbar")
    )
    w = Window.orderBy("day")
    lagged = c.select(
        "n",
        "dev",
        *[F.lag("dev", k).over(w).alias(f"d{k}") for k in range(1, _LB_LAGS + 1)],
    )
    acf = lagged.agg(
        F.max("n").alias("n"),
        F.sum(F.col("dev") * F.col("dev")).alias("ss"),
        *[
            F.sum(F.col("dev") * F.col(f"d{k}")).alias(f"s{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    n = F.col("n")
    rs = [F.col(f"s{k}") / F.col("ss") for k in range(1, _LB_LAGS + 1)]
    q_stat = (
        n
        * (n + 2)
        * sum(
            (r * r / (n - k))
            for k, r in enumerate(rs, start=1)
        )
    )
    wh_z = (
        (q_stat / _LB_LAGS) ** F.lit(1.0 / 3)
        - (1 - 2.0 / (9 * _LB_LAGS))
    ) / F.lit((2.0 / (9 * _LB_LAGS)) ** 0.5)
    return acf.select(
        n.cast("bigint").alias("n_days"),
        F.round(q_stat, 4).alias("q_stat"),
        F.lit(_LB_LAGS).alias("df"),
        F.round(1 - _phi_spark(wh_z), 4).alias("p_value"),
        F.round(F.greatest(*[F.abs(r) for r in rs]), 4).alias(
            "max_abs_acf"
        ),
    )


@register(
    "arch_lm_test",
    oracle=_DAILY_MEAN_SQL
    + """,
    lag1 AS (
        SELECT day, x, lag(x) OVER (ORDER BY day) AS xl FROM daily
    ),
    fit AS (
        SELECT (sum(x * xl) - sum(x) * sum(xl) / count(*))
                   / (sum(xl * xl) - sum(xl) * sum(xl) / count(*)) AS b1,
               avg(x) AS my, avg(xl) AS mx
        FROM lag1 WHERE xl IS NOT NULL
    ),
    resid AS (
        SELECT l.day,
               round(l.x - (f.my - f.b1 * f.mx) - f.b1 * l.xl, 6) AS e
        FROM lag1 l CROSS JOIN fit f WHERE l.xl IS NOT NULL
    ),
    sq AS (
        SELECT e * e AS u,
               lag(e * e) OVER (ORDER BY day) AS ul
        FROM resid
    ),
    lm AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               power(sum(u * ul) - sum(u) * sum(ul) / count(*), 2)
                   / ((sum(ul * ul) - sum(ul) * sum(ul) / count(*))
                      * (sum(u * u) - sum(u) * sum(u) / count(*))) AS r2
        FROM sq WHERE ul IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(n * r2, 4) AS lm_stat,
           round(r2, 4) AS r2,
           round(2 * (1 - {phi}), 4) AS p_value,
           CAST(n * r2 > 3.8415 AS INTEGER) AS arch_flag
    FROM lm
    """.replace("{phi}", _phi_sql("sqrt(n * r2)")),
    doc="Engle's ARCH LM test on AR(1) residuals of the daily series: "
    "fit x_t ~ x_(t-1) in closed form, square the residuals (rounded "
    "6dp so both engines square identical values), regress u_t on "
    "u_(t-1); LM = n*R^2 ~ chi-square(1), whose p-value is EXACTLY "
    "2(1-Phi(sqrt(LM))).  Significant ARCH effects mean conditional "
    "heteroskedasticity: every constant-variance SE downstream "
    "(granger_*, newey-west's Bartlett weights, bootstrap CIs) is "
    "mis-calibrated and needs volatility-aware inference.  Scale: "
    "daily-grid reduce; two window passes + two moment rows.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_mean(spark, sf_dir)
    w = Window.orderBy("day")
    lag1 = daily.select(
        "day", "x", F.lag("x").over(w).alias("xl")
    ).where(F.col("xl").isNotNull())
    x, xl = F.col("x"), F.col("xl")
    cnt = F.count(F.lit(1))
    fit = lag1.agg(
        (
            (F.sum(x * xl) - F.sum(x) * F.sum(xl) / cnt)
            / (F.sum(xl * xl) - F.sum(xl) * F.sum(xl) / cnt)
        ).alias("b1"),
        F.avg(x).alias("my"),
        F.avg(xl).alias("mx"),
    )
    resid = lag1.crossJoin(F.broadcast(fit)).select(
        "day",
        F.round(
            x - (F.col("my") - F.col("b1") * F.col("mx")) - F.col("b1") * xl,
            6,
        ).alias("e"),
    )
    sq = resid.select(
        (F.col("e") * F.col("e")).alias("u"),
        F.lag(F.col("e") * F.col("e")).over(Window.orderBy("day")).alias(
            "ul"
        ),
    ).where(F.col("ul").isNotNull())
    u, ul = F.col("u"), F.col("ul")
    lm = sq.agg(
        cnt.cast("double").alias("n"),
        (
            F.pow(F.sum(u * ul) - F.sum(u) * F.sum(ul) / cnt, 2)
            / (
                (F.sum(ul * ul) - F.sum(ul) * F.sum(ul) / cnt)
                * (F.sum(u * u) - F.sum(u) * F.sum(u) / cnt)
            )
        ).alias("r2"),
    )
    n, r2 = F.col("n"), F.col("r2")
    return lm.select(
        n.cast("bigint").alias("n_obs"),
        F.round(n * r2, 4).alias("lm_stat"),
        F.round(r2, 4).alias("r2"),
        F.round(2 * (1 - _phi_spark(F.sqrt(n * r2))), 4).alias("p_value"),
        (n * r2 > 3.8415).cast("int").alias("arch_flag"),
    )


_RC_PAIR_SQL = f"""
    WITH daily AS (
        SELECT {_DAYNUM_SQL} AS day,
               round(coalesce(sum(CASE WHEN event_type = 'view'
                                       THEN value END), 0), 6) AS u,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS v
        FROM events GROUP BY 1
    )
"""


@register(
    "rolling_corr_stability",
    oracle=_RC_PAIR_SQL
    + """,
    roll AS (
        SELECT day,
               corr(u, v) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING
                                AND CURRENT ROW) AS r,
               count(*) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING
                              AND CURRENT ROW) AS w
        FROM daily
    ),
    full_r AS (
        SELECT corr(u, v) AS r_full FROM daily
    ),
    ok AS (SELECT day, round(r, 6) AS r FROM roll WHERE w = 7)
    SELECT CAST(count(*) AS BIGINT) AS n_windows,
           round(max(f.r_full), 4) AS full_sample_corr,
           round(min(r), 4) AS min_corr,
           round(max(r), 4) AS max_corr,
           round(avg(r), 4) AS mean_corr,
           CAST(sum(CASE WHEN r * f.r_full < 0 THEN 1 ELSE 0 END)
                > 0 AS INTEGER) AS sign_flip
    FROM ok CROSS JOIN full_r f
    """,
    doc="Rolling 7-day correlation of the daily view/purchase pair "
    "beside the full-sample correlation: min/mean/max across windows "
    "plus a sign-flip flag.  A pair whose rolling correlation "
    "changes sign is Simpson-vulnerable — the single full-sample "
    "coefficient that pairwise_series_correlation reports can be an "
    "artifact of regime mixing, and lag-based causality screens "
    "inherit the instability.  corr as a WINDOW aggregate is "
    "identical SQL text on both engines; windows shorter than 7 "
    "days are excluded on both sides.  Scale: daily-grid bounded.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def rolling_corr_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def series(et: str):
        return F.round(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == et, F.col("value"))),
                F.lit(0.0),
            ),
            6,
        )

    daily = ev.groupBy(_daynum().alias("day")).agg(
        series("view").alias("u"), series("purchase").alias("v")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    roll = daily.select(
        "day",
        F.corr("u", "v").over(w7).alias("r"),
        F.count(F.lit(1)).over(w7).alias("w"),
    )
    ok = roll.where(F.col("w") == 7).select(
        "day", F.round("r", 6).alias("r")
    )
    full_r = daily.agg(F.corr("u", "v").alias("r_full"))
    r = F.col("r")
    return ok.crossJoin(F.broadcast(full_r)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.round(F.max("r_full"), 4).alias("full_sample_corr"),
        F.round(F.min(r), 4).alias("min_corr"),
        F.round(F.max(r), 4).alias("max_corr"),
        F.round(F.avg(r), 4).alias("mean_corr"),
        (
            F.sum(
                F.when(r * F.col("r_full") < 0, 1).otherwise(0)
            )
            > 0
        )
        .cast("int")
        .alias("sign_flip"),
    )


_BB_LEN = 5  # block length (days)
_BB_B = 16  # deterministic pseudo-resamples


@register(
    "block_bootstrap_variance",
    oracle=_DAILY_MEAN_SQL
    + f""",
    idx AS (
        SELECT x, row_number() OVER (ORDER BY day) AS rn,
               count(*) OVER () AS n
        FROM daily
    ),
    blocks AS (
        SELECT rn, n,
               sum(x) OVER (ORDER BY rn
                            ROWS BETWEEN CURRENT ROW
                            AND {_BB_LEN - 1} FOLLOWING) AS bsum,
               count(*) OVER (ORDER BY rn
                              ROWS BETWEEN CURRENT ROW
                              AND {_BB_LEN - 1} FOLLOWING) AS blen
        FROM idx
    ),
    valid AS (SELECT rn, n, bsum FROM blocks WHERE blen = {_BB_LEN}),
    draws AS (
        SELECT b.b, j.j, v.n,
               (SELECT bsum FROM valid
                WHERE rn = ((b.b * 7 + j.j * 11)
                            % (SELECT max(rn) FROM valid)) + 1) AS bsum
        FROM (SELECT unnest(generate_series(1, {_BB_B})) AS b) b
        CROSS JOIN (SELECT unnest(generate_series(1,
            CAST(ceil((SELECT max(n) FROM idx) * 1.0 / {_BB_LEN})
                 AS INTEGER))) AS j) j
        CROSS JOIN (SELECT max(n) AS n FROM idx) v
    ),
    means AS (
        SELECT b, sum(bsum) / (count(*) * {_BB_LEN}) AS m
        FROM draws GROUP BY b
    ),
    iid AS (
        SELECT stddev_samp(x) / sqrt(count(*)) AS se,
               CAST(count(*) AS BIGINT) AS n
        FROM daily
    )
    SELECT i.n AS n_days,
           {_BB_LEN} AS block_len,
           CAST(count(*) AS BIGINT) AS n_resamples,
           round(i.se, 6) AS iid_se,
           round(stddev_samp(m.m), 6) AS block_se,
           round(stddev_samp(m.m) / i.se, 4) AS inflation_ratio
    FROM means m CROSS JOIN iid i
    GROUP BY i.n, i.se
    """,
    doc="Moving-block bootstrap standard error of the daily mean "
    "beside the iid SE: 16 DETERMINISTIC pseudo-resamples (block "
    "start for resample b, slot j is ((7b + 11j) mod n_starts) + 1 — "
    "arithmetic both engines evaluate identically, no engine RNG) "
    "each concatenate ceil(n/L) length-5 blocks; the sd of the "
    "resample means is the dependence-aware SE, and "
    "inflation_ratio >> 1 quantifies exactly how anticonservative "
    "bootstrap_mean_ci's iid resampling is on this autocorrelated "
    "series.  Block sums come from ONE bounded-following window "
    "pass (CURRENT..4 FOLLOWING is a bounded sliding frame — O(n), "
    "unlike unbounded-following frames).  Scale: daily-grid "
    "bounded; the 16 x ceil(n/L) draw table is constant-size.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def block_bootstrap_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_mean(spark, sf_dir)
    w = Window.orderBy("day")
    wblk = Window.orderBy("rn").rowsBetween(Window.currentRow, _BB_LEN - 1)
    idx = daily.select(
        "x",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    blocks = idx.select(
        "rn",
        "n",
        F.sum("x").over(wblk).alias("bsum"),
        F.count(F.lit(1)).over(wblk).alias("blen"),
    )
    valid = blocks.where(F.col("blen") == _BB_LEN).select(
        "rn", "n", "bsum"
    )
    starts = valid.agg(F.max("rn").alias("n_starts"))
    nblk = valid.agg(
        F.ceil(F.max("n") / F.lit(_BB_LEN)).cast("int").alias("nblk")
    )
    grid = (
        idx.agg(F.max("n").alias("n"))
        .crossJoin(F.broadcast(nblk))
        .select(
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(_BB_B))).alias("b"),
            "nblk",
        )
        .select(
            "n", "b", F.explode(F.sequence(F.lit(1), F.col("nblk"))).alias("j")
        )
    )
    draws = grid.crossJoin(F.broadcast(starts)).select(
        "b",
        "n",
        (
            ((F.col("b") * 7 + F.col("j") * 11) % F.col("n_starts")) + 1
        ).alias("rn"),
    ).join(F.broadcast(valid.select("rn", "bsum")), "rn")
    means = draws.groupBy("b").agg(
        (F.sum("bsum") / (F.count(F.lit(1)) * _BB_LEN)).alias("m")
    )
    iid = daily.agg(
        (F.stddev_samp("x") / F.sqrt(F.count(F.lit(1)))).alias("se"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return means.crossJoin(F.broadcast(iid)).agg(
        F.max("n").alias("n_days"),
        F.lit(_BB_LEN).alias("block_len"),
        F.count(F.lit(1)).cast("bigint").alias("n_resamples"),
        F.round(F.max("se"), 6).alias("iid_se"),
        F.round(F.stddev_samp("m"), 6).alias("block_se"),
        F.round(F.stddev_samp("m") / F.max("se"), 4).alias(
            "inflation_ratio"
        ),
    )


_SC_PERIODS = (6, 12, 24, 168)
_SC_NSEG = 5
_PI = 3.141592653589793

_HOURLY_PAIR_SQL = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour,
               round(coalesce(sum(CASE WHEN event_type = 'view'
                                       THEN value END), 0), 6) AS u,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS v
        FROM events GROUP BY 1
    )
"""


@register(
    "spectral_coherence_pair",
    oracle=_HOURLY_PAIR_SQL
    + f""",
    idx AS (
        SELECT u, v, row_number() OVER (ORDER BY hour) - 1 AS t,
               count(*) OVER () AS n
        FROM hourly
    ),
    seg AS (
        -- // : DuckDB's / on integers is FLOAT division; segment
        -- arithmetic must floor like Spark's int cast
        SELECT u, v,
               CAST(t // (n // {_SC_NSEG}) AS INTEGER) AS s,
               t % (n // {_SC_NSEG}) AS tau
        FROM idx WHERE t < (n // {_SC_NSEG}) * {_SC_NSEG}
    ),
    per AS (
        SELECT p.p, g.s,
               sum(g.u * cos(2 * {_PI} * g.tau / p.p)) AS axr,
               sum(g.u * sin(2 * {_PI} * g.tau / p.p)) AS axi,
               sum(g.v * cos(2 * {_PI} * g.tau / p.p)) AS ayr,
               sum(g.v * sin(2 * {_PI} * g.tau / p.p)) AS ayi
        FROM seg g CROSS JOIN (
            SELECT unnest([{", ".join(str(p) for p in _SC_PERIODS)}]) AS p
        ) p
        GROUP BY 1, 2
    ),
    spec AS (
        SELECT p,
               CAST(count(*) AS BIGINT) AS n_segments,
               avg(axr * ayr + axi * ayi) AS sxy_re,
               avg(axr * ayi - axi * ayr) AS sxy_im,
               avg(axr * axr + axi * axi) AS sxx,
               avg(ayr * ayr + ayi * ayi) AS syy
        FROM per GROUP BY 1
    )
    SELECT p AS period_hours, n_segments,
           round((sxy_re * sxy_re + sxy_im * sxy_im)
                 / nullif(sxx * syy, 0), 4) AS coherence,
           round(atan2(sxy_im, sxy_re), 4) AS phase_rad,
           round(atan2(sxy_im, sxy_re) * p / (2 * {_PI}), 4)
               AS lead_lag_hours
    FROM spec ORDER BY p
    """,
    doc="Welch-averaged cross-spectral coherence of the hourly "
    "view/purchase pair at candidate periods (6/12/24/168 h): the "
    "hourly grid is cut into 5 equal segments, each segment "
    "contributes single-frequency DFT sums (cos/sin weighted "
    "aggregates, the periodogram_peaks device), and coherence = "
    "|avg cross-spectrum|^2 / (avg Sxx * avg Syy) — segment "
    "averaging is what makes coherence < 1 informative (a single "
    "un-averaged frequency is identically 1).  The phase of the "
    "averaged cross-spectrum converts to a lead/lag in hours: "
    "positive = views lead purchases at that period — the "
    "frequency-domain complement to lead_lag_best_shift.  Scale: "
    "events reduce to the hourly grid; the periods x grid fan-out "
    "(4x) and the 4x5 spectrum table are bounded.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def spectral_coherence_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def series(et: str):
        return F.round(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == et, F.col("value"))),
                F.lit(0.0),
            ),
            6,
        )

    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        series("view").alias("u"), series("purchase").alias("v")
    )
    idx = hourly.select(
        "u",
        "v",
        (F.row_number().over(Window.orderBy("hour")) - 1).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    seg_len = (F.col("n") / _SC_NSEG).cast("int")
    seg = idx.where(F.col("t") < seg_len * _SC_NSEG).select(
        "u",
        "v",
        (F.col("t") / seg_len).cast("int").alias("s"),
        (F.col("t") % seg_len).alias("tau"),
    )
    per = (
        seg.select(
            "u",
            "v",
            "s",
            "tau",
            F.explode(
                F.array(*[F.lit(p) for p in _SC_PERIODS])
            ).alias("p"),
        )
        .groupBy("p", "s")
        .agg(
            F.sum(
                F.col("u") * F.cos(2 * _PI * F.col("tau") / F.col("p"))
            ).alias("axr"),
            F.sum(
                F.col("u") * F.sin(2 * _PI * F.col("tau") / F.col("p"))
            ).alias("axi"),
            F.sum(
                F.col("v") * F.cos(2 * _PI * F.col("tau") / F.col("p"))
            ).alias("ayr"),
            F.sum(
                F.col("v") * F.sin(2 * _PI * F.col("tau") / F.col("p"))
            ).alias("ayi"),
        )
    )
    spec = per.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.avg(
            F.col("axr") * F.col("ayr") + F.col("axi") * F.col("ayi")
        ).alias("sxy_re"),
        # Im(X * conj(Y)) with X = ax_r - i*ax_i under the e^{-i..}
        # kernel: positive phase = u (views) leads v (purchases)
        F.avg(
            F.col("axr") * F.col("ayi") - F.col("axi") * F.col("ayr")
        ).alias("sxy_im"),
        F.avg(
            F.col("axr") * F.col("axr") + F.col("axi") * F.col("axi")
        ).alias("sxx"),
        F.avg(
            F.col("ayr") * F.col("ayr") + F.col("ayi") * F.col("ayi")
        ).alias("syy"),
    )
    re, im = F.col("sxy_re"), F.col("sxy_im")
    return spec.select(
        F.col("p").alias("period_hours"),
        "n_segments",
        F.round(
            (re * re + im * im)
            / F.nullif(F.col("sxx") * F.col("syy"), F.lit(0.0)),
            4,
        ).alias("coherence"),
        F.round(F.atan2(im, re), 4).alias("phase_rad"),
        F.round(F.atan2(im, re) * F.col("p") / (2 * _PI), 4).alias(
            "lead_lag_hours"
        ),
    ).orderBy("period_hours")


_HURST_SIZES = (16, 32, 64, 128)


@register(
    "hurst_exponent_rs",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour,
               round(sum(value), 6) AS x
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT x, row_number() OVER (ORDER BY hour) - 1 AS t FROM hourly
    ),
    fan AS (
        SELECT i.x, i.t, m.m, i.t // m.m AS blk
        FROM idx i CROSS JOIN (
            SELECT unnest([{", ".join(str(m) for m in _HURST_SIZES)}]) AS m
        ) m
    ),
    cums AS (
        -- ordered cumulative sums ONLY: whole-partition avg/stddev
        -- aggregate in engine-specific order and a 1-ulp difference
        -- flips downstream 6dp roundings; the value of an ORDER BY t
        -- cumulative at the last row is the same sequential sum on
        -- both engines
        SELECT m, blk, t, x,
               sum(x) OVER wb AS cx,
               sum(x * x) OVER wb AS cx2,
               count(*) OVER (PARTITION BY m, blk) AS cnt
        FROM fan
        WINDOW wb AS (PARTITION BY m, blk ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    bstats AS (
        -- NO intermediate rounding: the raw doubles are ordered
        -- cumsums, bit-identical across engines, while round() tie
        -- behavior at the 7th digit is NOT engine-identical
        SELECT m, blk,
               arg_max(cx, t) / m AS xbar,
               sqrt(greatest(
                   arg_max(cx2, t) / m
                   - (arg_max(cx, t) / m) * (arg_max(cx, t) / m),
                   0)) AS s
        FROM cums WHERE cnt = m GROUP BY 1, 2
    ),
    walked AS (
        SELECT c.m, c.blk, b.s,
               sum(c.x - b.xbar)
                   OVER (PARTITION BY c.m, c.blk ORDER BY c.t
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum
        FROM cums c JOIN bstats b ON b.m = c.m AND b.blk = c.blk
    ),
    per_block AS (
        SELECT m, blk,
               (max(cum) - min(cum)) / max(s) AS rs
        FROM walked GROUP BY 1, 2
        HAVING max(s) > 0
    ),
    per_m AS (
        -- ordered list fold, not avg(): partial-aggregation order
        -- differs between engines and a 1-ulp sum difference flips
        -- the 6dp rounding on boundary values
        SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
               list_sum(list(rs ORDER BY blk)) / count(*) AS mean_rs
        FROM per_block GROUP BY 1
    ),
    fit AS (
        SELECT (sum(ln(m) * ln(mean_rs))
                - sum(ln(m)) * sum(ln(mean_rs)) / count(*))
               / (sum(ln(m) * ln(m)) - sum(ln(m)) * sum(ln(m)) / count(*))
                   AS h
        FROM per_m
    )
    SELECT p.m AS block_size, p.n_blocks, round(p.mean_rs, 4) AS mean_rs,
           round(f.h, 4) AS hurst
    FROM per_m p CROSS JOIN fit f
    ORDER BY p.m
    """,
    doc="Rescaled-range (R/S) long-memory analysis of the hourly "
    "value series: for dyadic block sizes m = 16/32/64/128, each full "
    "block contributes R/S = (range of its cumulative mean-deviation "
    "walk) / (its population sd); the Hurst exponent is the log-log "
    "slope of mean R/S against m.  H ~ 0.5 is short-memory; H well "
    "above 0.5 means long-range dependence, under which every "
    "sqrt(n) error bar in the registry (and the Ljung-Box chi-square "
    "itself) is too small — the diagnostic that says WHICH inference "
    "regime the series is in.  Every float here is an ORDERED "
    "cumulative sum (block moments come from arg_max of the ordered "
    "cumsum at the block's last row) — bit-identical across engines "
    "with NO intermediate rounding, because round()'s 7th-digit tie "
    "behavior is exactly what differs between engines.  Scale: "
    "hourly-grid bounded; the 4x fan-out and the per-block tables "
    "stay grid-sized.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.round(F.sum("value"), 6).alias("x")
    )
    idx = hourly.select(
        "x", (F.row_number().over(Window.orderBy("hour")) - 1).alias("t")
    )
    fan = idx.select(
        "x",
        "t",
        F.explode(F.array(*[F.lit(m) for m in _HURST_SIZES])).alias("m"),
    ).withColumn("blk", F.floor(F.col("t") / F.col("m")))
    wb = Window.partitionBy("m", "blk")
    wcum = wb.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # ordered cumulative sums ONLY — see the oracle comment: whole-
    # partition avg/stddev aggregate in engine-specific order
    cums = fan.select(
        "m",
        "blk",
        "t",
        "x",
        F.sum("x").over(wcum).alias("cx"),
        F.sum(F.col("x") * F.col("x")).over(wcum).alias("cx2"),
        F.count(F.lit(1)).over(wb).alias("cnt"),
    ).where(F.col("cnt") == F.col("m")).transform(ckpt)
    # NO intermediate rounding — see the oracle comment: the raw
    # doubles are bit-identical ordered cumsums; round() tie behavior
    # at the 7th digit is what diverges between engines
    xbar = F.max_by("cx", "t") / F.max("m")
    bstats = cums.groupBy("m", "blk").agg(
        xbar.alias("xbar"),
        F.sqrt(
            F.greatest(
                F.max_by("cx2", "t") / F.max("m") - xbar * xbar,
                F.lit(0.0),
            )
        ).alias("s"),
    )
    walked = cums.join(F.broadcast(bstats), ["m", "blk"]).select(
        "m",
        "blk",
        "s",
        F.sum(F.col("x") - F.col("xbar")).over(wcum).alias("cum"),
    )
    per_block = (
        walked.groupBy("m", "blk")
        .agg(
            ((F.max("cum") - F.min("cum")) / F.max("s")).alias("rs"),
            F.max("s").alias("smax"),
        )
        .where(F.col("smax") > 0)
    )
    # ordered fold, not avg(): see the oracle comment — engine
    # partial-agg order must not decide a 6dp rounding boundary
    per_m = per_block.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("blk", "rs"))),
                    lambda st: st["rs"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.count(F.lit(1))
        ).alias("mean_rs"),
    )
    lm, lr = F.log(F.col("m")), F.log(F.col("mean_rs"))
    cnt = F.count(F.lit(1))
    fit = per_m.agg(
        (
            (F.sum(lm * lr) - F.sum(lm) * F.sum(lr) / cnt)
            / (F.sum(lm * lm) - F.sum(lm) * F.sum(lm) / cnt)
        ).alias("h")
    )
    return (
        per_m.crossJoin(F.broadcast(fit))
        .select(
            F.col("m").alias("block_size"),
            "n_blocks",
            F.round(F.col("mean_rs"), 4).alias("mean_rs"),
            F.round(F.col("h"), 4).alias("hurst"),
        )
        .orderBy("block_size")
    )


_KF_Q = 0.1  # state-noise / observation-noise variance ratio


@register(
    "kalman_local_level",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT {_DAYNUM_SQL} AS day, round(avg(value), 6) AS x
        FROM events GROUP BY 1
    ),
    ordered AS (
        SELECT list(x ORDER BY day) AS vals, count(*) AS t FROM daily
    ),
    rec(it, t, vals, level, p, ss) AS (
        SELECT 1, t, vals, CAST(vals[1] AS DOUBLE),
               CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
        FROM ordered
        UNION ALL
        SELECT it + 1, t, vals,
               level + ((p + {_KF_Q}) / (p + {_KF_Q} + 1))
                   * (vals[it + 1] - level),
               (1 - (p + {_KF_Q}) / (p + {_KF_Q} + 1)) * (p + {_KF_Q}),
               ss + (vals[it + 1] - level) * (vals[it + 1] - level)
        FROM rec WHERE it < t
    )
    SELECT CAST(t AS BIGINT) AS n_days,
           round(level, 4) AS final_level,
           round((p + {_KF_Q}) / (p + {_KF_Q} + 1), 4) AS steady_gain,
           round(sqrt(ss / (t - 1)), 4) AS innovation_rmse
    FROM rec WHERE it = t
    """,
    doc="Local-level Kalman filter over the daily mean-value series "
    "with fixed signal-to-noise ratio q/r = 0.1 (the gain depends "
    "only on the ratio, so r scales out): predict P+q, gain "
    "K = (P+q)/(P+q+1), update level toward each innovation.  Emits "
    "the final filtered level, the (converged) steady-state gain — "
    "the implied EWMA smoothing constant, tying this to "
    "ewma_daily_series — and the one-step innovation RMSE, the "
    "filter's honest predictive error.  Spark runs the recurrence "
    "as ONE ordered array fold (the holt_winters_additive device); "
    "the oracle replays it as a recursive CTE step for step — "
    "identical operation order, so doubles match bitwise.  Scale: "
    "the fold is inherently sequential but runs on the ~30-row "
    "daily grid AFTER the map-side reduce; volume-independent.",
    tags=("causality", "stats", "timeseries", "tsdiag"),
)
def kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_mean(spark, sf_dir)
    ordered = daily.agg(
        F.array_sort(
            F.collect_list(F.struct("day", "x"))
        ).alias("pairs"),
        F.count(F.lit(1)).alias("t"),
    ).select(
        F.transform(F.col("pairs"), lambda s: s["x"]).alias("vals"), "t"
    )
    q = F.lit(_KF_Q)
    state = ordered.select(
        "t",
        "vals",
        F.aggregate(
            F.slice(F.col("vals"), 2, F.col("t").cast("int") - 1),
            F.struct(
                F.element_at("vals", 1).cast("double").alias("level"),
                F.lit(1.0).alias("p"),
                F.lit(0.0).alias("ss"),
            ),
            lambda acc, v: F.struct(
                (
                    acc["level"]
                    + ((acc["p"] + q) / (acc["p"] + q + 1))
                    * (v - acc["level"])
                ).alias("level"),
                (
                    (1 - (acc["p"] + q) / (acc["p"] + q + 1))
                    * (acc["p"] + q)
                ).alias("p"),
                (
                    acc["ss"] + (v - acc["level"]) * (v - acc["level"])
                ).alias("ss"),
            ),
        ).alias("st"),
    )
    return state.select(
        F.col("t").cast("bigint").alias("n_days"),
        F.round(F.col("st.level"), 4).alias("final_level"),
        F.round(
            (F.col("st.p") + q) / (F.col("st.p") + q + 1), 4
        ).alias("steady_gain"),
        F.round(
            F.sqrt(F.col("st.ss") / (F.col("t") - 1)), 4
        ).alias("innovation_rmse"),
    )


@register(
    "binary_segmentation_changepoints",
    oracle=_DAILY_MEAN_SQL
    + """,
    stats AS (
        SELECT avg(x) AS xbar, stddev_samp(x) AS sd,
               CAST(count(*) AS DOUBLE) AS n
        FROM daily
    ),
    walk AS (
        SELECT d.day,
               round(abs(sum(d.x - s.xbar)
                         OVER (ORDER BY d.day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)), 6) AS a,
               s.sd, s.n
        FROM daily d CROSS JOIN stats s
    ),
    top1 AS (
        SELECT day AS d1, a / (sd * sqrt(n)) AS stat1, n AS n1
        FROM walk ORDER BY a DESC, day LIMIT 1
    ),
    tagged AS (
        SELECT d.day, d.x,
               CASE WHEN d.day <= t.d1 THEN 'left' ELSE 'right' END
                   AS side
        FROM daily d CROSS JOIN top1 t
    ),
    sidestats AS (
        SELECT day, x, side,
               avg(x) OVER (PARTITION BY side) AS xbar_s,
               stddev_samp(x) OVER (PARTITION BY side) AS sd_s,
               CAST(count(*) OVER (PARTITION BY side) AS DOUBLE) AS n_s
        FROM tagged
    ),
    sidewalk AS (
        SELECT side, day, sd_s, n_s,
               round(abs(sum(x - xbar_s)
                         OVER (PARTITION BY side ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)), 6) AS a
        FROM sidestats
    ),
    sidetop AS (
        SELECT side, day, a, sd_s, n_s,
               row_number() OVER (PARTITION BY side
                                  ORDER BY a DESC, day) AS rk
        FROM sidewalk
    )
    SELECT 1 AS level, 'all' AS side,
           CAST(n1 AS BIGINT) AS n_obs,
           CAST(d1 AS BIGINT) AS split_day,
           round(stat1, 4) AS stat
    FROM top1
    UNION ALL
    SELECT 2, side, CAST(n_s AS BIGINT), CAST(day AS BIGINT),
           round(a / (sd_s * sqrt(n_s)), 4)
    FROM sidetop WHERE rk = 1
    ORDER BY level, side
    """,
    doc="Two-level binary segmentation of the daily mean-value "
    "series by the standardized max-|CUSUM| statistic: level 1 "
    "splits the full window at the argmax of |cumulative deviation| "
    "(6dp-rounded, smallest-day tie-break — the "
    "cusum_changepoint_location convention), level 2 re-runs the "
    "same scan INSIDE each half via side-partitioned windows (one "
    "pass, not two queries).  The hierarchy is what turns a single "
    "changepoint location into a segmentation; comparing level-2 "
    "stats against level 1 shows whether structure remains.  "
    "Scale: three window passes over the volume-independent daily "
    "grid; the level-1 split is a 1-row broadcast.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def binary_segmentation_changepoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = _daily_mean(spark, sf_dir)
    stats = daily.agg(
        F.avg("x").alias("xbar"),
        F.stddev_samp("x").alias("sd"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        F.round(
            F.abs(F.sum(F.col("x") - F.col("xbar")).over(wcum)), 6
        ).alias("a"),
        "sd",
        "n",
    )
    top1 = (
        walk.orderBy(F.desc("a"), "day")
        .limit(1)
        .select(
            F.col("day").alias("d1"),
            (F.col("a") / (F.col("sd") * F.sqrt(F.col("n")))).alias(
                "stat1"
            ),
            F.col("n").alias("n1"),
        )
    )
    tagged = daily.crossJoin(F.broadcast(top1)).select(
        "day",
        "x",
        F.when(F.col("day") <= F.col("d1"), F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("side"),
    )
    ws = Window.partitionBy("side")
    sidestats = tagged.select(
        "day",
        "x",
        "side",
        F.avg("x").over(ws).alias("xbar_s"),
        F.stddev_samp("x").over(ws).alias("sd_s"),
        F.count(F.lit(1)).over(ws).cast("double").alias("n_s"),
    )
    wscum = ws.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sidewalk = sidestats.select(
        "side",
        "day",
        "sd_s",
        "n_s",
        F.round(
            F.abs(F.sum(F.col("x") - F.col("xbar_s")).over(wscum)), 6
        ).alias("a"),
    )
    sidetop = sidewalk.select(
        "side",
        "day",
        "a",
        "sd_s",
        "n_s",
        F.row_number()
        .over(ws.orderBy(F.desc("a"), "day"))
        .alias("rk"),
    ).where(F.col("rk") == 1)
    lvl1 = top1.select(
        F.lit(1).alias("level"),
        F.lit("all").alias("side"),
        F.col("n1").cast("bigint").alias("n_obs"),
        F.col("d1").cast("bigint").alias("split_day"),
        F.round(F.col("stat1"), 4).alias("stat"),
    )
    lvl2 = sidetop.select(
        F.lit(2).alias("level"),
        "side",
        F.col("n_s").cast("bigint").alias("n_obs"),
        F.col("day").cast("bigint").alias("split_day"),
        F.round(
            F.col("a") / (F.col("sd_s") * F.sqrt(F.col("n_s"))), 4
        ).alias("stat"),
    )
    return lvl1.unionAll(lvl2).orderBy("level", "side")


@register(
    "forecast_backtest_mape",
    oracle=_DAILY_MEAN_SQL
    + """,
    idx AS (
        SELECT day, x,
               row_number() OVER (ORDER BY day) AS rn,
               lag(x, 1) OVER (ORDER BY day) AS l1,
               lag(x, 7) OVER (ORDER BY day) AS l7,
               first_value(x) OVER (ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS x1
        FROM daily
    ),
    fcst AS (
        SELECT day, x,
               l1 AS f_naive,
               l7 AS f_seasonal_naive,
               l1 + (l1 - x1) / nullif(rn - 2, 0) AS f_drift
        FROM idx WHERE rn > 8
    ),
    long AS (
        SELECT 'naive' AS method, x, f_naive AS f FROM fcst
        UNION ALL
        SELECT 'seasonal_naive', x, f_seasonal_naive FROM fcst
        UNION ALL
        SELECT 'drift', x, f_drift FROM fcst
    ),
    scored AS (
        SELECT method,
               CAST(count(*) AS BIGINT) AS n_evals,
               round(avg(abs(x - f) / nullif(abs(x), 0)), 6) AS mape,
               round(sqrt(avg((x - f) * (x - f))), 6) AS rmse
        FROM long GROUP BY 1
    )
    SELECT method, n_evals,
           round(mape, 4) AS mape,
           round(rmse, 4) AS rmse,
           CAST(rank() OVER (ORDER BY mape, method) AS INTEGER)
               AS mape_rank
    FROM scored ORDER BY mape_rank, method
    """,
    doc="Rolling-origin forecast backtest — the model-selection layer "
    "in front of the forecasting family (holt_linear_smoothing, "
    "kalman_local_level, ewma_daily_series): three CAUSAL one-step "
    "forecasters (naive = yesterday, seasonal-naive = same weekday "
    "last week, drift = yesterday + historical mean increment, all "
    "computed from lag/first-value windows with NO lookahead) are "
    "scored on the same holdout days (rn > 8, so every method has "
    "its inputs), by MAPE and RMSE, and ranked.  Which baseline "
    "wins is itself diagnostic: seasonal-naive beating naive "
    "confirms the weekly cycle that seasonal_decomposition_hourly "
    "decomposes.  Scale: events reduce to the daily grid; ONE "
    "window pass builds all three forecasts; the scoreboard is 3 "
    "rows.",
    tags=("causality", "stats", "timeseries", "window", "tsdiag"),
)
def forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_mean(spark, sf_dir)
    w = Window.orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = daily.select(
        "day",
        "x",
        F.row_number().over(w).alias("rn"),
        F.lag("x", 1).over(w).alias("l1"),
        F.lag("x", 7).over(w).alias("l7"),
        F.first("x").over(wcum).alias("x1"),
    )
    fcst = idx.where(F.col("rn") > 8).select(
        "x",
        F.col("l1").alias("f_naive"),
        F.col("l7").alias("f_seasonal_naive"),
        (
            F.col("l1")
            + (F.col("l1") - F.col("x1"))
            / F.nullif((F.col("rn") - 2).cast("double"), F.lit(0.0))
        ).alias("f_drift"),
    )
    long = fcst.select(
        "x",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("method"),
                    F.col("f_naive").alias("f"),
                ),
                F.struct(
                    F.lit("seasonal_naive").alias("method"),
                    F.col("f_seasonal_naive").alias("f"),
                ),
                F.struct(
                    F.lit("drift").alias("method"),
                    F.col("f_drift").alias("f"),
                ),
            )
        ).alias("s"),
    ).select("x", F.col("s.method").alias("method"), F.col("s.f").alias("f"))
    x, f = F.col("x"), F.col("f")
    scored = long.groupBy("method").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_evals"),
        F.round(
            F.avg(F.abs(x - f) / F.nullif(F.abs(x), F.lit(0.0))), 6
        ).alias("mape6"),
        F.round(F.sqrt(F.avg((x - f) * (x - f))), 6).alias("rmse6"),
    )
    return scored.select(
        "method",
        "n_evals",
        F.round(F.col("mape6"), 4).alias("mape"),
        F.round(F.col("rmse6"), 4).alias("rmse"),
        F.rank()
        .over(Window.orderBy("mape6", "method"))
        .cast("int")
        .alias("mape_rank"),
    ).orderBy("mape_rank", "method")
