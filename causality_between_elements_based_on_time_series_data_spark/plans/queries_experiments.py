"""Experiment-design and quasi-experimental estimators (SURVEY.md
§2.12 [EXT] causal-inference surface, round-7 completion batch).

The round-7 estimator family (IPW / AIPW / CUPED / mSPRT / IV, all in
``queries_causality.py``) covers effect ESTIMATION; this module adds
the design-validity layer that real experimentation platforms run
around those estimators:

- ``srm_sample_ratio_check`` — the trust gate: is the randomization
  itself broken?  (Chi-square goodness of fit on arm counts.)
- ``mantel_haenszel_stratified_or`` — confounder-stratified 2x2
  association (the classic epidemiology complement to the crude
  ``click_purchase_odds_ratio``).
- ``chow_structural_break`` — did the data-generating process change
  mid-window?  (F-test on split-vs-pooled OLS; the confirmatory test
  for what ``cusum_changepoint_location`` locates.)
- ``logrank_test_cohorts`` — does survival DIFFER between cohorts?
  (The inference companion to ``kaplan_meier_survival``.)
- ``newey_west_ols_inference`` — HAC standard errors for trend
  regression on autocorrelated daily series (the honest version of
  the iid OLS t-statistic).
- ``regression_discontinuity_effect`` — local-linear RDD at a
  covariate cutoff.
- ``propensity_stratified_effect`` — subclassification on the
  propensity score (Rosenbaum-Rubin quintile stratification),
  composing the same reusable IRLS-GLM primitive as IPW/AIPW.
- ``propensity_matching_att`` — 1-NN caliper-free matching on the
  propensity score via the SORTED-NEIGHBORHOOD device (one global
  sort, two windows — never an all-pairs distance join).

The reference's pipeline (run.py:39-73) trains one model and dumps a
B matrix; it has no experiment-design layer at all — this module is
part of the mandated 100 TB [EXT] surface.  Every query here is fully
DuckDB-oracled; shared-SQL-text formulas (Chow F, log-rank variance,
Newey-West kernel) get independent numpy cross-checks in
``tests/test_experiments.py`` per the round-6 verdict's
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register
from .queries_causality import (
    _IPW_FEAT_SQL,
    _phi_spark,
    _phi_sql,
    _user_day_feat,
)
from .queries_llm import _irls_fit, _irls_oracle_ctes


def _scored_feat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user-day design matrix + clipped propensity from the shared
    IRLS-GLM primitive, p ROUNDED to 6dp (downstream consumers sort
    and compare on p, so the score must be bit-identical across
    engines — the un-rounded version ipw/aipw use only ever enters
    commutative sums)."""
    feat = _user_day_feat(spark, sf_dir)
    beta = _irls_fit(spark, feat)
    p_raw = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(
                F.col("b0")
                + F.col("b1") * F.col("f1")
                + F.col("b2") * F.col("f2")
            )
        )
    )
    p = F.round(
        F.least(F.greatest(p_raw, F.lit(0.01)), F.lit(0.99)), 6
    )
    return feat.crossJoin(F.broadcast(beta)).select(
        "user_id", "day", "y", "o", p.alias("p")
    )


_SCORED_SQL = (
    _irls_oracle_ctes(_IPW_FEAT_SQL)
    + """,
    scored AS (
        SELECT f.user_id, f.day, f.y, f.o,
               round(least(greatest(
                   1/(1+exp(-(b.b0 + b.b1*f.f1 + b.b2*f.f2))),
                   0.01), 0.99), 6) AS p
        FROM feat f CROSS JOIN beta4 b
    )"""
)


@register(
    "srm_sample_ratio_check",
    oracle=f"""
    WITH arms AS (
        SELECT CAST(user_id % 2 AS INTEGER) AS arm,
               CAST(count(DISTINCT user_id) AS DOUBLE) AS n
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT sum(n) AS nt,
               sum(CASE WHEN arm = 0 THEN n END) AS n0,
               sum(CASE WHEN arm = 1 THEN n END) AS n1
        FROM arms
    )
    SELECT CAST(nt AS BIGINT) AS n_users,
           CAST(n0 AS BIGINT) AS n_arm0,
           CAST(n1 AS BIGINT) AS n_arm1,
           round((n0 - n1) * (n0 - n1) / nt, 4) AS chi2,
           round(2 * (1 - {_phi_sql("sqrt((n0 - n1) * (n0 - n1) / nt)")}),
                 4) AS p_value,
           CAST((n0 - n1) * (n0 - n1) / nt > 10.828 AS INTEGER) AS srm_flag
    FROM tot
    """,
    doc="Sample-ratio-mismatch check — the first gate every A/B "
    "platform runs before trusting ANY effect estimate: with a "
    "deterministic 50/50 arm split (user_id parity, the same split "
    "cuped_variance_reduction and msprt_always_valid_test use), the "
    "chi-square goodness-of-fit statistic on distinct-user arm "
    "counts is (n0-n1)^2/n (df=1), p-value via the shared tanh-"
    "approximated normal CDF, and the flag fires at the "
    "conventional p<0.001 threshold (chi2 > 10.828) — an SRM means "
    "the assignment mechanism itself is broken and every downstream "
    "estimator in this family is invalid.  Scale: one distinct-user "
    "aggregate (map-side partial on user_id), then a 2-row fold — "
    "nothing else moves.",
    tags=("causality", "stats", "agg", "experiments"),
)
def srm_sample_ratio_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arms = ev.groupBy((F.col("user_id") % 2).cast("int").alias("arm")).agg(
        F.countDistinct("user_id").cast("double").alias("n")
    )
    tot = arms.agg(
        F.sum("n").alias("nt"),
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
    )
    chi2 = (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1")) / F.col(
        "nt"
    )
    return tot.select(
        F.col("nt").cast("bigint").alias("n_users"),
        F.col("n0").cast("bigint").alias("n_arm0"),
        F.col("n1").cast("bigint").alias("n_arm1"),
        F.round(chi2, 4).alias("chi2"),
        F.round(2 * (1 - _phi_spark(F.sqrt(chi2))), 4).alias("p_value"),
        (chi2 > 10.828).cast("int").alias("srm_flag"),
    )


@register(
    "mantel_haenszel_stratified_or",
    oracle=f"""
    WITH ud AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY 1, 2
    ),
    cells AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) % 7
                    AS INTEGER) AS stratum,
               CAST(sum(x * y) AS DOUBLE) AS a,
               CAST(sum(x * (1 - y)) AS DOUBLE) AS b,
               CAST(sum((1 - x) * y) AS DOUBLE) AS c,
               CAST(sum((1 - x) * (1 - y)) AS DOUBLE) AS d
        FROM ud GROUP BY 1
    ),
    mh AS (
        SELECT CAST(count(*) AS BIGINT) AS n_strata,
               sum(a * d / (a + b + c + d)) / sum(b * c / (a + b + c + d))
                   AS mh_or,
               sum(a) AS sa, sum(b) AS sb, sum(c) AS sc, sum(d) AS sd,
               sum((a + b) * (a + c) / (a + b + c + d)) AS se,
               sum((a + b) * (c + d) * (a + c) * (b + d)
                   / ((a + b + c + d) * (a + b + c + d)
                      * (a + b + c + d - 1))) AS sv
        FROM cells
    )
    SELECT n_strata,
           round(mh_or, 4) AS mh_or,
           round(sa * sd / (sb * sc), 4) AS crude_or,
           round((abs(sa - se) * abs(sa - se)) / sv, 4) AS cmh_chi2,
           round(2 * (1 - {_phi_sql("sqrt((abs(sa - se) * abs(sa - se)) / sv)")}),
                 4) AS p_value
    FROM mh
    """,
    doc="Mantel-Haenszel stratified odds ratio + Cochran-Mantel-"
    "Haenszel chi-square: exposure = the user clicked that day, "
    "outcome = the user purchased that day (user-day grain, the "
    "family's causal unit), stratified by day-of-week (engine-"
    "neutral integer daynum % 7, the activity_streaks device — both "
    "engines disagree on dayofweek()'s origin).  MH pools the "
    "per-stratum 2x2 tables as sum(ad/n)/sum(bc/n) — the "
    "confounder-adjusted complement to the crude "
    "click_purchase_odds_ratio, which this query reports beside it; "
    "CMH chi-square tests conditional independence with the exact "
    "hypergeometric variance per stratum.  Scale: one user-day "
    "reduce, then a 7-row stratum table — the 2x2 cells are "
    "conditional sums in the SAME grouped aggregate, never four "
    "scans.",
    tags=("causality", "stats", "agg", "experiments"),
)
def mantel_haenszel_stratified_or(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("x"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    cells = ud.groupBy(
        (
            F.datediff(F.col("day").cast("date"), F.lit("2024-01-01")) % 7
        )
        .cast("int")
        .alias("stratum")
    ).agg(
        F.sum(x * y).cast("double").alias("a"),
        F.sum(x * (1 - y)).cast("double").alias("b"),
        F.sum((1 - x) * y).cast("double").alias("c"),
        F.sum((1 - x) * (1 - y)).cast("double").alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    n = a + b + c + d
    mh = cells.agg(
        F.count("*").cast("bigint").alias("n_strata"),
        (F.sum(a * d / n) / F.sum(b * c / n)).alias("mh_or"),
        F.sum(a).alias("sa"),
        F.sum(b).alias("sb"),
        F.sum(c).alias("sc"),
        F.sum(d).alias("sd"),
        F.sum((a + b) * (a + c) / n).alias("se"),
        F.sum(
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        ).alias("sv"),
    )
    dev = F.abs(F.col("sa") - F.col("se"))
    chi2 = dev * dev / F.col("sv")
    return mh.select(
        "n_strata",
        F.round("mh_or", 4).alias("mh_or"),
        F.round(F.col("sa") * F.col("sd") / (F.col("sb") * F.col("sc")), 4
                ).alias("crude_or"),
        F.round(chi2, 4).alias("cmh_chi2"),
        F.round(2 * (1 - _phi_spark(F.sqrt(chi2))), 4).alias("p_value"),
    )


# Chow-test SSR from raw moments: SSR = Syy_c - Sxy_c^2 / Sxx_c where
# the _c are centered second moments.  Shared between the pooled and
# per-segment fits so the Spark and SQL texts stay in lockstep; the
# formula itself is pinned against numpy.polyfit residuals in
# tests/test_experiments.py (shared-text-oracle discipline).
def _ssr_sql(n: str, sx: str, sy: str, sxx: str, syy: str, sxy: str) -> str:
    sxx_c = f"({sxx} - {sx} * {sx} / {n})"
    syy_c = f"({syy} - {sy} * {sy} / {n})"
    sxy_c = f"({sxy} - {sx} * {sy} / {n})"
    return f"({syy_c} - {sxy_c} * {sxy_c} / nullif({sxx_c}, 0))"


def _ssr_spark(n, sx, sy, sxx, syy, sxy):
    sxx_c = sxx - sx * sx / n
    syy_c = syy - sy * sy / n
    sxy_c = sxy - sx * sy / n
    return syy_c - sxy_c * sxy_c / F.nullif(sxx_c, F.lit(0.0))


_CHOW_SLOPE_SQL = (
    "(({sxy} - {sx} * {sy} / {n}) / nullif({sxx} - {sx} * {sx} / {n}, 0))"
)


@register(
    "chow_structural_break",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS DOUBLE) AS x,
               round(sum(CASE WHEN event_type = 'purchase'
                              THEN value ELSE 0 END), 6) AS y
        FROM events GROUP BY 1
    ),
    mid AS (
        SELECT CAST((min(x) + max(x)) AS BIGINT) // 2 AS m FROM daily
    ),
    seg AS (
        SELECT CAST(x <= m AS INTEGER) AS pre,
               CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM daily CROSS JOIN mid GROUP BY 1
    ),
    folded AS (
        SELECT sum(n) AS n,
               {_ssr_sql("sum(n)", "sum(sx)", "sum(sy)", "sum(sxx)",
                         "sum(syy)", "sum(sxy)")} AS ssr_pooled,
               sum({_ssr_sql("n", "sx", "sy", "sxx", "syy", "sxy")})
                   AS ssr_split,
               max(CASE WHEN pre = 1 THEN
                   {_CHOW_SLOPE_SQL.format(n="n", sx="sx", sy="sy",
                                           sxx="sxx", sxy="sxy")}
                   END) AS slope_pre,
               max(CASE WHEN pre = 0 THEN
                   {_CHOW_SLOPE_SQL.format(n="n", sx="sx", sy="sy",
                                           sxx="sxx", sxy="sxy")}
                   END) AS slope_post,
               (SELECT m FROM mid) AS break_day
        FROM seg
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(break_day AS BIGINT) AS break_daynum,
           round(slope_pre, 4) AS slope_pre,
           round(slope_post, 4) AS slope_post,
           round(((ssr_pooled - ssr_split) / 2)
                 / (ssr_split / (n - 4)), 4) AS f_stat,
           round(power(1 + 2 * (((ssr_pooled - ssr_split) / 2)
                                / (ssr_split / (n - 4))) / (n - 4),
                       -(n - 4) / 2), 4) AS p_value
    FROM folded
    """,
    doc="Chow test for a structural break in the daily-revenue trend "
    "at the window midpoint: fit OLS y~x pooled and separately on "
    "each half, F = ((SSR_pooled - SSR_1 - SSR_2)/k) / "
    "((SSR_1+SSR_2)/(n-2k)) with k=2 parameters per segment.  The "
    "p-value uses the EXACT closed form for F(2, m): "
    "P(F > f) = (1 + 2f/m)^(-m/2) — no incomplete-beta needed, so "
    "both engines evaluate it bit-identically.  This is the "
    "confirmatory hypothesis test for the break that "
    "cusum_changepoint_location points at and poisson_rate_change "
    "tests in counts; every SSR comes from one closed-form moment "
    "identity (pinned against numpy.polyfit residuals in "
    "tests/test_experiments.py).  Scale: facts reduce to the "
    "daily grid in one pass; segment moments are a 2-row table and "
    "the pooled moments are their SUMS — one grouped aggregate "
    "total, no second scan.",
    tags=("causality", "stats", "timeseries", "agg", "experiments"),
)
def chow_structural_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ),
            6,
        ).alias("y")
    ).select(
        F.datediff(F.col("day").cast("date"), F.lit("2024-01-01"))
        .cast("double")
        .alias("x"),
        "y",
    )
    # F.floor (not a bigint cast, which truncates toward zero) so the
    # midpoint floors like DuckDB's `//` even if daynums were negative.
    mid = daily.agg(
        F.floor((F.min("x") + F.max("x")) / F.lit(2.0))
        .cast("bigint")
        .alias("m")
    )
    seg = (
        daily.crossJoin(F.broadcast(mid))
        .groupBy((F.col("x") <= F.col("m")).cast("int").alias("pre"))
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.max("m").alias("m"),
        )
    )

    def slope(n, sx, sy, sxx, sxy):
        return (sxy - sx * sy / n) / F.nullif(
            sxx - sx * sx / n, F.lit(0.0)
        )

    folded = seg.agg(
        F.sum("n").alias("n"),
        _ssr_spark(
            F.sum("n"),
            F.sum("sx"),
            F.sum("sy"),
            F.sum("sxx"),
            F.sum("syy"),
            F.sum("sxy"),
        ).alias("ssr_pooled"),
        F.sum(
            _ssr_spark(
                F.col("n"),
                F.col("sx"),
                F.col("sy"),
                F.col("sxx"),
                F.col("syy"),
                F.col("sxy"),
            )
        ).alias("ssr_split"),
        F.max(
            F.when(
                F.col("pre") == 1,
                slope(
                    F.col("n"),
                    F.col("sx"),
                    F.col("sy"),
                    F.col("sxx"),
                    F.col("sxy"),
                ),
            )
        ).alias("slope_pre"),
        F.max(
            F.when(
                F.col("pre") == 0,
                slope(
                    F.col("n"),
                    F.col("sx"),
                    F.col("sy"),
                    F.col("sxx"),
                    F.col("sxy"),
                ),
            )
        ).alias("slope_post"),
        F.max("m").alias("break_day"),
    )
    n = F.col("n")
    fstat = ((F.col("ssr_pooled") - F.col("ssr_split")) / 2) / (
        F.col("ssr_split") / (n - 4)
    )
    return folded.select(
        n.cast("bigint").alias("n_days"),
        F.col("break_day").cast("bigint").alias("break_daynum"),
        F.round("slope_pre", 4).alias("slope_pre"),
        F.round("slope_post", 4).alias("slope_post"),
        F.round(fstat, 4).alias("f_stat"),
        F.round(
            F.pow(1 + 2 * fstat / (n - 4), -(n - 4) / 2), 4
        ).alias("p_value"),
    )


@register(
    "logrank_test_cohorts",
    oracle=f"""
    WITH last_ev AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    life AS (
        SELECT user_id,
               CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS duration
        FROM events GROUP BY user_id
    ),
    per_user AS (
        SELECT l.user_id, l.duration,
               CAST(l.user_id % 2 AS INTEGER) AS g,
               CAST(e.event_type = 'error' AS INTEGER) AS observed
        FROM life l
        JOIN last_ev e ON e.user_id = l.user_id AND e.rn = 1
    ),
    times AS (
        SELECT duration AS t FROM per_user
        GROUP BY duration HAVING sum(observed) > 0
    ),
    risk AS (
        SELECT t.t,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(p.g) AS DOUBLE) AS n1,
               CAST(sum(CASE WHEN p.duration = t.t
                             THEN p.observed ELSE 0 END) AS DOUBLE) AS d,
               CAST(sum(CASE WHEN p.duration = t.t
                             THEN p.observed * p.g ELSE 0 END)
                    AS DOUBLE) AS d1
        FROM times t JOIN per_user p ON p.duration >= t.t
        GROUP BY t.t
    ),
    folded AS (
        SELECT CAST(count(*) AS BIGINT) AS n_times,
               sum(d1) AS o1,
               sum(d * n1 / n) AS e1,
               sum(CASE WHEN n > 1
                        THEN d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
                        ELSE 0 END) AS v
        FROM risk
    )
    SELECT n_times,
           CAST(o1 AS BIGINT) AS deaths_g1,
           round(e1, 4) AS expected_g1,
           round((o1 - e1) * (o1 - e1) / v, 4) AS chi2,
           round(2 * (1 - {_phi_sql("sqrt((o1 - e1) * (o1 - e1) / v)")}),
                 4) AS p_value
    FROM folded
    """,
    doc="Log-rank test between two user cohorts (user_id parity, the "
    "family's deterministic split) — the inference companion to "
    "kaplan_meier_survival, sharing its exact lifetime definitions "
    "(duration = first-to-last-event days, 'death' = lifetime ending "
    "in an error event, others censored): at each distinct event "
    "time, observed cohort-1 deaths vs the hypergeometric "
    "expectation d*n1/n with variance d*(n1/n)*(1-n1/n)*(n-d)/(n-1), "
    "summed into the 1-df chi-square.  Answers the question KM "
    "curves only draw: do the cohorts' survival distributions "
    "actually differ?  Scale: same shape as KM — facts reduce to "
    "one row per user, every log-rank quantity lives on the "
    "distinct-duration table (at-risk via the bounded "
    "|times| x |users| post-reduce range join, cohort counts as "
    "conditional sums in the SAME pass).",
    tags=("causality", "stats", "window", "experiments"),
)
def logrank_test_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).cast("bigint").alias("duration"),
        (
            F.expr("max_by(event_type, struct(ts, event_id))") == "error"
        ).cast("int").alias("observed"),
    ).select(
        "duration",
        "observed",
        (F.col("user_id") % 2).cast("int").alias("g"),
    )
    times = (
        per_user.groupBy(F.col("duration").alias("t"))
        .agg(F.sum("observed").alias("dtot"))
        .filter(F.col("dtot") > 0)
        .select("t")
    )
    risk = (
        times.join(per_user, per_user.duration >= times.t)
        .groupBy("t")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("g").cast("double").alias("n1"),
            F.sum(
                F.when(F.col("duration") == F.col("t"), F.col("observed"))
                .otherwise(0)
            ).cast("double").alias("d"),
            F.sum(
                F.when(
                    F.col("duration") == F.col("t"),
                    F.col("observed") * F.col("g"),
                ).otherwise(0)
            ).cast("double").alias("d1"),
        )
    )
    n, n1, d = F.col("n"), F.col("n1"), F.col("d")
    folded = risk.agg(
        F.count("*").cast("bigint").alias("n_times"),
        F.sum("d1").alias("o1"),
        F.sum(d * n1 / n).alias("e1"),
        F.sum(
            F.when(
                n > 1,
                d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1),
            ).otherwise(0.0)
        ).alias("v"),
    )
    dev = F.col("o1") - F.col("e1")
    chi2 = dev * dev / F.col("v")
    return folded.select(
        "n_times",
        F.col("o1").cast("bigint").alias("deaths_g1"),
        F.round("e1", 4).alias("expected_g1"),
        F.round(chi2, 4).alias("chi2"),
        F.round(2 * (1 - _phi_spark(F.sqrt(chi2))), 4).alias("p_value"),
    )


_NW_LAGS = 7  # Bartlett-kernel truncation: one weekly cycle of lags


@register(
    "newey_west_ols_inference",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS DOUBLE) AS x,
               round(sum(CASE WHEN event_type = 'purchase'
                              THEN value ELSE 0 END), 6) AS y
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT count(*) AS n, avg(x) AS xbar,
               sum(x * x) - sum(x) * sum(x) / count(*) AS sxx,
               (sum(x * y) - sum(x) * sum(y) / count(*))
                   / (sum(x * x) - sum(x) * sum(x) / count(*)) AS b1,
               avg(y) - avg(x) * (sum(x * y) - sum(x) * sum(y) / count(*))
                   / (sum(x * x) - sum(x) * sum(x) / count(*)) AS b0
        FROM daily
    ),
    resid AS (
        SELECT d.x,
               round((d.x - m.xbar) * (d.y - m.b0 - m.b1 * d.x), 6) AS v,
               (d.y - m.b0 - m.b1 * d.x) AS u
        FROM daily d CROSS JOIN m
    ),
    lagged AS (
        SELECT v, u,
               {", ".join(f"lag(v, {k}) OVER (ORDER BY x) AS v{k}"
                          for k in range(1, _NW_LAGS + 1))}
        FROM resid
    ),
    s AS (
        SELECT sum(v * v)
               + {" + ".join(f"2 * (1 - {k}.0 / {_NW_LAGS + 1})"
                             f" * sum(v * coalesce(v{k}, 0))"
                             for k in range(1, _NW_LAGS + 1))} AS s_hac,
               sum(u * u) AS ssr
        FROM lagged
    )
    SELECT CAST(m.n AS BIGINT) AS n_days,
           round(m.b1, 4) AS slope,
           round(sqrt((s.ssr / (m.n - 2)) / m.sxx), 4) AS se_ols,
           round(sqrt(s.s_hac) / m.sxx, 4) AS se_hac,
           round((sqrt(s.s_hac) / m.sxx)
                 / sqrt((s.ssr / (m.n - 2)) / m.sxx), 4) AS hac_ratio,
           round(m.b1 / (sqrt(s.s_hac) / m.sxx), 4) AS t_hac
    FROM m, s
    """,
    doc="Newey-West HAC inference for the daily-revenue trend slope: "
    "the iid OLS standard error understates uncertainty when "
    "residuals autocorrelate (daily series always do — weekly "
    "seasonality alone guarantees it), so the sandwich variance "
    "S = gamma_0 + 2*sum_l (1 - l/(L+1)) * gamma_l with Bartlett "
    "weights over L=7 lags replaces it: se_hac = sqrt(S)/Sxx.  "
    "Reports both errors, their ratio (the honesty correction "
    "factor), and the corrected t — the inferential hygiene behind "
    "granger_lag_regression-style trend claims.  The score series "
    "v_t = (x_t - xbar)*u_t is rounded to 6dp so both engines' "
    "lag-window sums are bit-identical; the kernel formula is "
    "pinned against an independent numpy implementation in "
    "tests/test_experiments.py.  Lag convention: lag(v, k) is a ROW "
    "lag over the observed daily grid, so Bartlett weights apply to "
    "calendar lags only when the grid is dense (no missing days); "
    "tests/test_experiments.py asserts count(*) == max(x)-min(x)+1 "
    "on the fixtures, so row-lags == calendar-lags here.  Scale: "
    "facts reduce to the daily grid in one pass; the OLS fit is a "
    "1-row moment broadcast; all L lag products are ONE window pass "
    "over the volume-independent grid.",
    tags=("causality", "stats", "timeseries", "window", "experiments"),
)
def newey_west_ols_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ),
            6,
        ).alias("y")
    ).select(
        F.datediff(F.col("day").cast("date"), F.lit("2024-01-01"))
        .cast("double")
        .alias("x"),
        "y",
    )
    m = daily.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        F.avg("y").alias("ybar"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_raw"),
    ).select(
        "n",
        "xbar",
        (F.col("sxx_raw") - F.col("sx") * F.col("sx") / F.col("n")).alias(
            "sxx"
        ),
        (
            (F.col("sxy_raw") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx_raw") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("b1"),
    )
    # b0 needs ybar/xbar; recompute via a second tiny projection to
    # dodge lateral-alias shadowing (CLAUDE.md rule)
    m2 = daily.crossJoin(F.broadcast(m)).select(
        "x",
        "y",
        "n",
        "xbar",
        "sxx",
        "b1",
    )
    b0 = (
        m2.agg(
            F.first("n").alias("n"),
            F.first("xbar").alias("xbar"),
            F.first("sxx").alias("sxx"),
            F.first("b1").alias("b1"),
            (F.avg("y") - F.first("b1") * F.avg("x")).alias("b0"),
        )
    )
    resid = daily.crossJoin(F.broadcast(b0)).select(
        "x",
        "n",
        "sxx",
        "b1",
        F.round(
            (F.col("x") - F.col("xbar"))
            * (F.col("y") - F.col("b0") - F.col("b1") * F.col("x")),
            6,
        ).alias("v"),
        (F.col("y") - F.col("b0") - F.col("b1") * F.col("x")).alias("u"),
    )
    w = Window.orderBy("x")
    lag_cols = [
        F.lag("v", k).over(w).alias(f"v{k}") for k in range(1, _NW_LAGS + 1)
    ]
    lagged = resid.select("n", "sxx", "b1", "v", "u", *lag_cols)
    s_terms = F.sum(F.col("v") * F.col("v"))
    for k in range(1, _NW_LAGS + 1):
        s_terms = s_terms + F.lit(2 * (1 - k / (_NW_LAGS + 1))) * F.sum(
            F.col("v") * F.coalesce(F.col(f"v{k}"), F.lit(0.0))
        )
    s = lagged.agg(
        F.first("n").alias("n"),
        F.first("sxx").alias("sxx"),
        F.first("b1").alias("b1"),
        s_terms.alias("s_hac"),
        F.sum(F.col("u") * F.col("u")).alias("ssr"),
    )
    n, sxx = F.col("n"), F.col("sxx")
    se_ols = F.sqrt((F.col("ssr") / (n - 2)) / sxx)
    se_hac = F.sqrt(F.col("s_hac")) / sxx
    return s.select(
        n.cast("bigint").alias("n_days"),
        F.round("b1", 4).alias("slope"),
        F.round(se_ols, 4).alias("se_ols"),
        F.round(se_hac, 4).alias("se_hac"),
        F.round(se_hac / se_ols, 4).alias("hac_ratio"),
        F.round(F.col("b1") / se_hac, 4).alias("t_hac"),
    )


@register(
    "propensity_stratified_effect",
    oracle=_SCORED_SQL
    + """,
    strat AS (
        SELECT y, o, p,
               ntile(5) OVER (ORDER BY p, user_id, day) AS stratum
        FROM scored
    ),
    per AS (
        SELECT stratum,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_treated,
               CAST(count(*) AS DOUBLE) AS nn,
               round(min(p), 4) AS p_lo,
               round(max(p), 4) AS p_hi,
               avg(CASE WHEN y = 1 THEN o END)
                   - avg(CASE WHEN y = 0 THEN o END) AS diff
        FROM strat GROUP BY stratum
    )
    SELECT stratum, n, n_treated, p_lo, p_hi,
           round(diff, 4) AS effect,
           round(sum(CASE WHEN diff IS NOT NULL THEN diff * nn END) OVER ()
                 / sum(CASE WHEN diff IS NOT NULL THEN nn END) OVER (), 4)
               AS stratified_ate
    FROM per ORDER BY stratum
    """,
    doc="Propensity-score subclassification (Rosenbaum-Rubin quintile "
    "stratification) on the family's shared user-day design: the "
    "IRLS propensity sorts units into 5 equal strata "
    "(deterministic ntile over rounded-6dp p with user_id/day "
    "tiebreak, so both engines build IDENTICAL strata), the "
    "treated-control mean difference is estimated WITHIN each "
    "stratum — where propensities, hence confounders, are roughly "
    "constant — and the overall ATE is the size-weighted average "
    "over strata with both arms present (off-support strata drop "
    "out, visibly: their effect is NULL).  The coarse-but-robust "
    "sibling of ipw_treatment_effect: no inverse weights to "
    "explode, at the cost of residual within-stratum confounding.  "
    "Scale: the Spark side computes the EXACT ntile without a "
    "single-partition global window (the WindowExec trap): rows "
    "hash into ~99 p-buckets, ranks are per-bucket row_numbers "
    "(distributed windows) plus the tiny bucket-count table's "
    "cumulative offsets, and the SQL-standard ntile assignment "
    "(first n%5 groups one row larger) is reproduced from the "
    "broadcast total by integer arithmetic — bit-identical to the "
    "oracle's literal ntile(5), pinned by the balance pytest.  GLM "
    "moment passes + one 5-row aggregate on top.",
    tags=("causality", "stats", "ml", "window", "experiments"),
)
def propensity_stratified_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = _scored_feat(spark, sf_dir).select(
        "y",
        "o",
        "p",
        "user_id",
        "day",
        F.floor(F.col("p") * 100).cast("int").alias("bkt"),
    ).localCheckpoint(eager=False)
    counts = scored.groupBy("bkt").agg(F.count("*").alias("cnt"))
    # tiny (≤99-row) bucket table: global windows are fine HERE
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wtot = Window.partitionBy(F.lit(1))
    offs = counts.select(
        "bkt",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off"),
        F.sum("cnt").over(wtot).alias("ntot"),
    )
    wb = Window.partitionBy("bkt").orderBy("p", "user_id", "day")
    ranked = scored.join(F.broadcast(offs), "bkt").select(
        "y",
        "o",
        "p",
        (F.row_number().over(wb) + F.col("off")).alias("rnk"),
        "ntot",
    )
    # SQL-standard ntile(5): q = n div 5, r = n mod 5; the first r
    # groups get q+1 rows
    q = (F.col("ntot") / 5).cast("bigint")
    r = F.col("ntot") % 5
    thr = r * (q + 1)
    rnk = F.col("rnk")
    stratum = F.when(
        rnk <= thr, F.ceil(rnk / (q + 1))
    ).otherwise(r + F.ceil((rnk - thr) / q))
    strat = ranked.select(
        "y", "o", "p", stratum.cast("int").alias("stratum")
    )
    per = strat.groupBy("stratum").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_treated"),
        F.count("*").cast("double").alias("nn"),
        F.round(F.min("p"), 4).alias("p_lo"),
        F.round(F.max("p"), 4).alias("p_hi"),
        (
            F.avg(F.when(F.col("y") == 1, F.col("o")))
            - F.avg(F.when(F.col("y") == 0, F.col("o")))
        ).alias("diff"),
    )
    wall = Window.partitionBy(F.lit(1))
    diff, nn = F.col("diff"), F.col("nn")
    return per.select(
        "stratum",
        "n",
        "n_treated",
        "p_lo",
        "p_hi",
        F.round(diff, 4).alias("effect"),
        F.round(
            F.sum(F.when(diff.isNotNull(), diff * nn)).over(wall)
            / F.sum(F.when(diff.isNotNull(), nn)).over(wall),
            4,
        ).alias("stratified_ate"),
    ).orderBy("stratum")


@register(
    "propensity_matching_att",
    oracle=_SCORED_SQL
    + """,
    nbr AS (
        SELECT y, o, p,
               last_value(CASE WHEN y = 0 THEN p END IGNORE NULLS)
                   OVER (ORDER BY p, user_id, day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_p,
               last_value(CASE WHEN y = 0 THEN o END IGNORE NULLS)
                   OVER (ORDER BY p, user_id, day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_o,
               first_value(CASE WHEN y = 0 THEN p END IGNORE NULLS)
                   OVER (ORDER BY p, user_id, day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_p,
               first_value(CASE WHEN y = 0 THEN o END IGNORE NULLS)
                   OVER (ORDER BY p, user_id, day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_o
        FROM scored
    ),
    matched AS (
        SELECT y, o, p,
               CASE WHEN next_p IS NULL THEN prev_p
                    WHEN prev_p IS NULL THEN next_p
                    WHEN p - prev_p <= next_p - p THEN prev_p
                    ELSE next_p END AS m_p,
               CASE WHEN next_p IS NULL THEN prev_o
                    WHEN prev_p IS NULL THEN next_o
                    WHEN p - prev_p <= next_p - p THEN prev_o
                    ELSE next_o END AS m_o
        FROM nbr
    )
    SELECT CAST(sum(y) AS BIGINT) AS n_treated,
           CAST(sum(CASE WHEN y = 1 AND m_o IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           round(avg(CASE WHEN y = 1 THEN o - m_o END), 4) AS att,
           round(avg(CASE WHEN y = 1 THEN abs(p - m_p) END), 4)
               AS mean_p_gap,
           round(avg(CASE WHEN y = 1 THEN o END)
                 - avg(CASE WHEN y = 0 THEN o END), 4) AS naive_diff
    FROM matched
    """,
    doc="1-NN propensity-score matching (ATT) via the SORTED-"
    "NEIGHBORHOOD device: in p-sorted order, each treated unit's "
    "nearest control is necessarily either the last control "
    "at-or-below it or the first control above it — two window "
    "passes replace the all-pairs |treated| x |control| distance "
    "join entirely.  Equidistant ties break toward the lower "
    "neighbor on both engines.  Reports the matched ATT beside the "
    "naive difference and the mean matched-pair propensity gap "
    "(the match-quality diagnostic a caliper would threshold on).  "
    "Scale: the Spark side never opens a single-partition global "
    "window — rows hash into ~99 p-buckets whose windows are "
    "distributed, and cross-boundary neighbors come from a "
    "≤99-row per-bucket first/last-control summary (struct "
    "min/max in ONE pass) carried across buckets and broadcast "
    "back; result is bit-identical to the oracle's literal global "
    "window.  The clip boundaries (p=0.01/0.99) can make hot "
    "buckets — a straggler (the window is O(rows)), never a "
    "blow-up.",
    tags=("causality", "stats", "ml", "window", "experiments", "bench"),
)
def propensity_matching_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_feat(spark, sf_dir).select(
        "y",
        "o",
        "p",
        "user_id",
        "day",
        F.floor(F.col("p") * 100).cast("int").alias("bkt"),
    ).localCheckpoint(eager=False)
    wb = Window.partitionBy("bkt").orderBy("p", "user_id", "day")
    # per-bucket first/last control as struct min/max (the struct's
    # field order IS the sort order, so lexicographic min/max is the
    # first/last control of the bucket) — one grouped pass
    cstruct = F.when(
        F.col("y") == 0, F.struct("p", "user_id", "day", "o")
    )
    summ = scored.groupBy("bkt").agg(
        F.max(cstruct).alias("lastc"), F.min(cstruct).alias("firstc")
    )
    # ≤99-row bucket table: carry the nearest out-of-bucket control
    # across bucket boundaries (global windows are fine HERE)
    wlo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    whi = Window.orderBy("bkt").rowsBetween(1, Window.unboundedFollowing)
    carry = summ.select(
        "bkt",
        F.last(F.col("lastc"), ignorenulls=True).over(wlo).alias("carry_prev"),
        F.first(F.col("firstc"), ignorenulls=True).over(whi).alias(
            "carry_next"
        ),
    )
    # Nearest in-bucket control in each direction via CUMULATIVE
    # struct aggregates, never last/first(ignorenulls) over a
    # running/shrinking frame: Spark evaluates IGNORE NULLS frames
    # (and every UnboundedFollowing frame) by rescanning the frame
    # per row — O(rows^2) per bucket, a measured 43 s on the sf0.1
    # hot bucket (24 k rows at the clip boundary).  max(struct(rn,..))
    # over UNBOUNDED PRECEDING..CURRENT is incremental (O(rows)), and
    # the DESC-ordered cumulative min(struct(rn,..)) is exactly
    # first-control-at-or-after in ASC order, so both directions stay
    # linear.  rn is unique within a bucket (user_id/day is the feat
    # grain), so the struct's lexicographic order IS the rn order.
    wprev = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wbd = Window.partitionBy("bkt").orderBy(
        F.desc("p"), F.desc("user_id"), F.desc("day")
    )
    wnext = wbd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = scored.join(F.broadcast(carry), "bkt").withColumn(
        "rn", F.row_number().over(wb)
    )
    ctrl = F.when(F.col("y") == 0, F.struct("rn", "p", "o"))
    nbr = (
        ranked.select(
            "y",
            "o",
            "p",
            "carry_prev",
            "carry_next",
            F.max(ctrl).over(wprev).alias("prevs"),
            F.min(ctrl).over(wnext).alias("nexts"),
        )
        .select(
            "y",
            "o",
            "p",
            F.coalesce(
                F.col("prevs.p"), F.col("carry_prev.p")
            ).alias("prev_p"),
            F.coalesce(
                F.col("prevs.o"), F.col("carry_prev.o")
            ).alias("prev_o"),
            F.coalesce(
                F.col("nexts.p"), F.col("carry_next.p")
            ).alias("next_p"),
            F.coalesce(
                F.col("nexts.o"), F.col("carry_next.o")
            ).alias("next_o"),
        )
    )
    p = F.col("p")
    take_prev = (
        F.col("next_p").isNull()
        | (
            F.col("prev_p").isNotNull()
            & (p - F.col("prev_p") <= F.col("next_p") - p)
        )
    )
    matched = nbr.select(
        "y",
        "o",
        "p",
        F.when(take_prev, F.col("prev_p"))
        .otherwise(F.col("next_p"))
        .alias("m_p"),
        F.when(take_prev, F.col("prev_o"))
        .otherwise(F.col("next_o"))
        .alias("m_o"),
    )
    y, o = F.col("y"), F.col("o")
    return matched.agg(
        F.sum("y").cast("bigint").alias("n_treated"),
        F.sum(
            F.when((y == 1) & F.col("m_o").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_matched"),
        F.round(F.avg(F.when(y == 1, o - F.col("m_o"))), 4).alias("att"),
        F.round(
            F.avg(F.when(y == 1, F.abs(p - F.col("m_p")))), 4
        ).alias("mean_p_gap"),
        F.round(
            F.avg(F.when(y == 1, o)) - F.avg(F.when(y == 0, o)), 4
        ).alias("naive_diff"),
    )


@register(
    "regression_discontinuity_effect",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               round(coalesce(sum(CASE WHEN event_type = 'view'
                                       THEN value END), 0), 6) AS x,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS o
        FROM events GROUP BY user_id
    ),
    cut AS (
        SELECT round(avg(x), 6) AS c, round(stddev_samp(x), 6) AS h
        FROM per_user
    ),
    sided AS (
        SELECT CASE WHEN u.x >= t.c AND u.x <= t.c + t.h THEN 1
                    WHEN u.x >= t.c - t.h AND u.x < t.c THEN 0
                    END AS side,
               u.x - t.c AS xc, u.o
        FROM per_user u CROSS JOIN cut t
        WHERE u.x >= t.c - t.h AND u.x <= t.c + t.h
    ),
    seg AS (
        SELECT side, CAST(count(*) AS DOUBLE) AS n,
               sum(xc) AS sx, sum(o) AS sy,
               sum(xc * xc) AS sxx, sum(xc * o) AS sxy
        FROM sided GROUP BY side
    ),
    fit AS (
        SELECT side, n,
               (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0) AS b,
               (sy - sx * (sxy - sx * sy / n)
                         / nullif(sxx - sx * sx / n, 0)) / n AS a
        FROM seg
    )
    SELECT (SELECT round(c, 4) FROM cut) AS cutoff,
           (SELECT round(h, 4) FROM cut) AS bandwidth,
           CAST(max(CASE WHEN side = 0 THEN n END) AS BIGINT) AS n_left,
           CAST(max(CASE WHEN side = 1 THEN n END) AS BIGINT) AS n_right,
           round(max(CASE WHEN side = 0 THEN a END), 4) AS intercept_left,
           round(max(CASE WHEN side = 1 THEN a END), 4) AS intercept_right,
           round(max(CASE WHEN side = 1 THEN a END)
                 - max(CASE WHEN side = 0 THEN a END), 4) AS rdd_effect,
           round(max(CASE WHEN side = 0 THEN b END), 4) AS slope_left,
           round(max(CASE WHEN side = 1 THEN b END), 4) AS slope_right
    FROM fit
    """,
    doc="Sharp regression-discontinuity estimate at a covariate "
    "cutoff: running variable = each user's total view value, "
    "cutoff = its mean, bandwidth = one standard deviation (both "
    "rounded 6dp so side assignment is engine-identical), outcome "
    "= total purchase value.  Local-linear fits on each side of "
    "the cutoff via closed-form moment OLS on centered x; the "
    "effect is the intercept jump at the cutoff — the "
    "quasi-experimental design for 'units just above a threshold "
    "vs just below', complementing diff_in_diff_estimate (time "
    "discontinuity) with a covariate discontinuity.  Scale: one "
    "user-grain reduce, a 1-row cutoff broadcast, one 2-row "
    "grouped moment pass — the bandwidth filter prunes before any "
    "math.",
    tags=("causality", "stats", "agg", "experiments"),
)
def regression_discontinuity_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "view", F.col("value"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("x"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    )
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("o"),
    ).localCheckpoint(eager=False)
    cut = per_user.agg(
        F.round(F.avg("x"), 6).alias("c"),
        F.round(F.stddev_samp("x"), 6).alias("h"),
    )
    x, c, h = F.col("x"), F.col("c"), F.col("h")
    sided = (
        per_user.crossJoin(F.broadcast(cut))
        .filter((x >= c - h) & (x <= c + h))
        .select(
            F.when((x >= c) & (x <= c + h), 1)
            .when((x >= c - h) & (x < c), 0)
            .alias("side"),
            (x - c).alias("xc"),
            "o",
            "c",
            "h",
        )
    )
    seg = sided.groupBy("side").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("o").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
        F.sum(F.col("xc") * F.col("o")).alias("sxy"),
        F.max("c").alias("c"),
        F.max("h").alias("h"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    b = (sxy - sx * sy / n) / F.nullif(sxx - sx * sx / n, F.lit(0.0))
    fit = seg.select(
        "side", "n", "c", "h", b.alias("b"), ((sy - sx * b) / n).alias("a")
    )
    a_side = lambda s: F.max(F.when(F.col("side") == s, F.col("a")))
    return fit.agg(
        F.round(F.max("c"), 4).alias("cutoff"),
        F.round(F.max("h"), 4).alias("bandwidth"),
        F.max(F.when(F.col("side") == 0, F.col("n")))
        .cast("bigint")
        .alias("n_left"),
        F.max(F.when(F.col("side") == 1, F.col("n")))
        .cast("bigint")
        .alias("n_right"),
        F.round(a_side(0), 4).alias("intercept_left"),
        F.round(a_side(1), 4).alias("intercept_right"),
        F.round(a_side(1) - a_side(0), 4).alias("rdd_effect"),
        F.round(F.max(F.when(F.col("side") == 0, F.col("b"))), 4).alias(
            "slope_left"
        ),
        F.round(F.max(F.when(F.col("side") == 1, F.col("b"))), 4).alias(
            "slope_right"
        ),
    )
