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

from ..lineage import ckpt

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
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS yc
        FROM events GROUP BY 1
    ),
    mid AS (
        SELECT CAST((min(x) + max(x)) AS BIGINT) // 2 AS m FROM daily
    ),
    -- exact integer moments (value is 2-decimal, so the per-row
    -- centi-quantization is lossless); cast to doubles with the
    -- centi-unit corrections AFTER the sums, mirroring the Spark side
    seg AS (
        SELECT pre, n,
               CAST(sxi AS DOUBLE) AS sx,
               CAST(syi AS DOUBLE) / 100.0 AS sy,
               CAST(sxxi AS DOUBLE) AS sxx,
               CAST(syyi AS DOUBLE) / 10000.0 AS syy,
               CAST(sxyi AS DOUBLE) / 100.0 AS sxy
        FROM (
            SELECT CAST(x <= m AS INTEGER) AS pre,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(x) AS sxi, sum(yc) AS syi,
                   sum(x * x) AS sxxi, sum(yc * yc) AS syyi,
                   sum(x * yc) AS sxyi
            FROM daily CROSS JOIN mid GROUP BY 1
        )
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
    # Exact-integer moment discipline (round 11): `value` is a
    # 2-decimal quantity, so per-ROW centi-quantization is lossless
    # and unambiguous in both engines, and every moment below is then
    # an INTEGER sum — aggregation-order-free, so the slope can never
    # sit on a rounding boundary that Spark's partial-agg order
    # decides (observed: slope_post flipped its 4th decimal vs the
    # oracle in 1 of 6 driver runs with the old float moments).
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("yc")
    ).select(
        F.datediff(F.col("day").cast("date"), F.lit("2024-01-01"))
        .cast("bigint")
        .alias("x"),
        "yc",
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
            F.sum("x").alias("_sxi"),
            F.sum("yc").alias("_syi"),
            F.sum(F.col("x") * F.col("x")).alias("_sxxi"),
            # 2^63 headroom (ANSI mode hard-errors on overflow, per
            # the CLAUDE.md unit-sizing rule): yc is a per-day
            # purchase total in CENTI-units, so sum(yc²) needs
            # |yc| < √(2^63 / n_days) — at a year of days that is
            # ~1.6e8 centi ≈ $1.6M of purchases per day; the x100
            # fixture sweep sits ~2 orders below it.  A deployment
            # past that bound must DEMEAN x/y before forming second
            # moments (shrinks magnitudes to deviations) rather than
            # widen units, which would reintroduce the float flake.
            F.sum(F.col("yc") * F.col("yc")).alias("_syyi"),
            F.sum(F.col("x") * F.col("yc")).alias("_sxyi"),
            F.max("m").alias("m"),
        )
        # integer moments -> doubles with the centi-unit corrections;
        # deterministic (same integers -> same doubles) in both engines
        .select(
            "pre",
            "n",
            "m",
            F.col("_sxi").cast("double").alias("sx"),
            (F.col("_syi").cast("double") / 100.0).alias("sy"),
            F.col("_sxxi").cast("double").alias("sxx"),
            (F.col("_syyi").cast("double") / 10000.0).alias("syy"),
            (F.col("_sxyi").cast("double") / 100.0).alias("sxy"),
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
    ).transform(ckpt)  # feeds the OLS moments AND the residual pass
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
    # dodge Spark 4 lateral-alias shadowing (an expression in a select
    # resolves a sibling alias of the same name, not the input column)
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
    ).transform(ckpt)
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
    ).transform(ckpt)
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
    ).transform(ckpt)
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


# ---------------------------------------------------------------------------
# Round-8 experimentation-platform utilities: the pre-launch (power),
# post-read (CATE/uplift/shrinkage), and trust (calibration, weighting)
# layers around the round-7 estimators.
# ---------------------------------------------------------------------------

_Z_ALPHA = 1.959964  # Phi^-1(0.975)
_Z_BETA = 0.841621  # Phi^-1(0.8)


@register(
    "mde_power_analysis",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS o
        FROM events GROUP BY 1
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               avg(o) AS mu, stddev_samp(o) AS sd
        FROM per_user
    ),
    calc AS (
        SELECT n, mu, sd, floor(n / 2) AS npa,
               ({_Z_ALPHA} + {_Z_BETA})
                   * sqrt(2 * sd * sd / floor(n / 2)) AS mde,
               0.05 * mu / sqrt(2 * sd * sd / floor(n / 2)) AS z5
        FROM mom
    )
    SELECT CAST(npa AS BIGINT) AS n_per_arm,
           round(mu, 4) AS mean_outcome,
           round(sd, 4) AS sd_outcome,
           round(mde, 4) AS mde_abs,
           round(mde / mu, 4) AS mde_rel,
           round({_phi_sql(f"(z5 - {_Z_ALPHA})")}, 4) AS power_at_5pct_lift
    FROM calc
    """,
    doc="Pre-launch power analysis for a 50/50 user-split experiment "
    "on total purchase value: the minimum detectable effect at "
    "alpha=.05 / power=.8 is (z_.975 + z_.8) * sqrt(2 sigma^2 / "
    "n_per_arm) with sigma taken from the fixture itself, plus the "
    "achieved power against a 5% lift of the mean — the two numbers "
    "every experiment review asks for before anything launches "
    "(mSPRT/DiD/CUPED all assume someone sized the test first).  "
    "Normal CDF via the shared tanh-approximation _phi (identical "
    "expression text on both engines).  Scale: one user-grain "
    "reduce, then 1-row arithmetic.",
    tags=("experiments", "stats", "agg"),
)
def mde_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
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
        ).alias("o")
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("o").alias("mu"),
        F.stddev_samp("o").alias("sd"),
    )
    n, mu, sd = F.col("n"), F.col("mu"), F.col("sd")
    npa = F.floor(n / 2)
    se = F.sqrt(2 * sd * sd / npa)
    calc = mom.select(
        "n",
        "mu",
        "sd",
        npa.alias("npa"),
        ((_Z_ALPHA + _Z_BETA) * se).alias("mde"),
        (0.05 * mu / se).alias("z5"),
    )
    return calc.select(
        F.col("npa").cast("bigint").alias("n_per_arm"),
        F.round(mu, 4).alias("mean_outcome"),
        F.round(sd, 4).alias("sd_outcome"),
        F.round(F.col("mde"), 4).alias("mde_abs"),
        F.round(F.col("mde") / mu, 4).alias("mde_rel"),
        F.round(_phi_spark(F.col("z5") - _Z_ALPHA), 4).alias(
            "power_at_5pct_lift"
        ),
    )


_CATE_FEAT_SQL = """
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS DOUBLE) AS t,
               round(ln(1 + sum(CASE WHEN event_type = 'view'
                                     THEN 1 ELSE 0 END)), 6) AS x,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS o
        FROM events GROUP BY 1
    )
"""


@register(
    "cate_interaction_ols",
    oracle=_CATE_FEAT_SQL
    + """,
    per_arm AS (
        SELECT t, CAST(count(*) AS DOUBLE) AS n,
               avg(x) AS xb, avg(o) AS ob,
               (sum(x * o) - sum(x) * sum(o) / count(*))
                   / nullif(sum(x * x) - sum(x) * sum(x) / count(*), 0)
                   AS c
        FROM per_user GROUP BY 1
    ),
    lines AS (
        SELECT max(CASE WHEN t = 1 THEN n END) AS n1,
               max(CASE WHEN t = 0 THEN n END) AS n0,
               max(CASE WHEN t = 1 THEN ob - c * xb END) AS a1,
               max(CASE WHEN t = 0 THEN ob - c * xb END) AS a0,
               max(CASE WHEN t = 1 THEN c END) AS c1,
               max(CASE WHEN t = 0 THEN c END) AS c0
        FROM per_arm
    ),
    gx AS (
        SELECT avg(x) AS xbar, stddev_samp(x) AS sdx FROM per_user
    )
    SELECT CAST(l.n1 AS BIGINT) AS n_treated,
           CAST(l.n0 AS BIGINT) AS n_control,
           round((l.a1 + l.c1 * g.xbar) - (l.a0 + l.c0 * g.xbar), 4)
               AS ate_at_mean_x,
           round(l.c1 - l.c0, 4) AS modification_slope,
           round((l.a1 + l.c1 * (g.xbar - g.sdx))
                 - (l.a0 + l.c0 * (g.xbar - g.sdx)), 4) AS cate_low_x,
           round((l.a1 + l.c1 * (g.xbar + g.sdx))
                 - (l.a0 + l.c0 * (g.xbar + g.sdx)), 4) AS cate_high_x
    FROM lines l CROSS JOIN gx g
    """,
    doc="Heterogeneous treatment effects via the saturated "
    "interaction model o ~ t + x + t*x, fit as TWO per-arm simple "
    "regressions (algebraically identical because t is binary and "
    "the model is saturated in t — no 4x4 solve needed): CATE(x) = "
    "(a1-a0) + (c1-c0)x, reported at the covariate mean and one sd "
    "either side, with the modification slope c1-c0 as the "
    "one-number effect-heterogeneity summary.  x = ln(1+views), the "
    "same confounder f1 the IRLS propensity uses.  Scale: user "
    "reduce, ONE grouped moment pass (2 rows), 1-row algebra.",
    tags=("causality", "experiments", "stats", "agg"),
)
def cate_interaction_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(
            F.log1p(
                F.sum(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                )
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
    ).select((F.col("user_id") % 2).cast("double").alias("t"), "x", "o")
    x, o = F.col("x"), F.col("o")
    cnt = F.count(F.lit(1)).cast("double")
    per_arm = per_user.groupBy("t").agg(
        cnt.alias("n"),
        F.avg(x).alias("xb"),
        F.avg(o).alias("ob"),
        (
            (F.sum(x * o) - F.sum(x) * F.sum(o) / cnt)
            / F.nullif(
                F.sum(x * x) - F.sum(x) * F.sum(x) / cnt, F.lit(0.0)
            )
        ).alias("c"),
    )
    t = F.col("t")
    lines = per_arm.agg(
        F.max(F.when(t == 1, F.col("n"))).alias("n1"),
        F.max(F.when(t == 0, F.col("n"))).alias("n0"),
        F.max(
            F.when(t == 1, F.col("ob") - F.col("c") * F.col("xb"))
        ).alias("a1"),
        F.max(
            F.when(t == 0, F.col("ob") - F.col("c") * F.col("xb"))
        ).alias("a0"),
        F.max(F.when(t == 1, F.col("c"))).alias("c1"),
        F.max(F.when(t == 0, F.col("c"))).alias("c0"),
    )
    gx = per_user.agg(
        F.avg(x).alias("xbar"), F.stddev_samp(x).alias("sdx")
    )
    j = lines.crossJoin(F.broadcast(gx))
    a1, a0 = F.col("a1"), F.col("a0")
    c1, c0 = F.col("c1"), F.col("c0")
    xbar, sdx = F.col("xbar"), F.col("sdx")

    def cate(x0):
        return (a1 + c1 * x0) - (a0 + c0 * x0)

    return j.select(
        F.col("n1").cast("bigint").alias("n_treated"),
        F.col("n0").cast("bigint").alias("n_control"),
        F.round(cate(xbar), 4).alias("ate_at_mean_x"),
        F.round(c1 - c0, 4).alias("modification_slope"),
        F.round(cate(xbar - sdx), 4).alias("cate_low_x"),
        F.round(cate(xbar + sdx), 4).alias("cate_high_x"),
    )


@register(
    "uplift_by_decile_qini",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS DOUBLE) AS t,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) >= 14 AS DOUBLE) AS y,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS score
        FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT t, y,
               row_number() OVER (ORDER BY score DESC, user_id) AS rn,
               count(*) OVER () AS n
        FROM per_user
    ),
    dec AS (
        SELECT CAST(ceil(rn * 10.0 / n) AS INTEGER) AS decile, t, y
        FROM ranked
    ),
    agg AS (
        SELECT decile,
               sum(t) AS nt, sum(1 - t) AS nc,
               sum(t * y) AS rt, sum((1 - t) * y) AS rc
        FROM dec GROUP BY 1
    ),
    cum AS (
        SELECT decile, nt, nc, rt, rc,
               sum(nt) OVER w AS cnt, sum(nc) OVER w AS cnc,
               sum(rt) OVER w AS crt, sum(rc) OVER w AS crc
        FROM agg
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT decile,
           CAST(nt AS BIGINT) AS n_treated,
           CAST(nc AS BIGINT) AS n_control,
           round(rt / nullif(nt, 0) - rc / nullif(nc, 0), 4) AS uplift,
           round(crt - crc * cnt / nullif(cnc, 0), 4) AS cum_qini
    FROM cum ORDER BY decile
    """,
    doc="Uplift-by-decile table with the cumulative Qini curve: users "
    "ranked by an observable targeting score (view count, "
    "deterministic user_id tie-break), cut into 10 RANK-BASED "
    "deciles (ceil(rn*10/n) — no engine ntile, whose remainder "
    "placement is implementation-defined), and per-decile treated-vs-"
    "control response rates on the heavy-purchaser outcome.  "
    "cum_qini(k) = R_t(k) - R_c(k)*N_t(k)/N_c(k) is the standard "
    "Qini numerator — the curve a targeting model is judged by "
    "before anyone trusts its uplift claims.  Scale: user reduce, "
    "then the EXACT global rank without a single-partition window "
    "(the WindowExec trap): scores hash into ~128 value-range "
    "buckets (bounds from a 1-row broadcast min/max — no eager "
    "action), ranks are per-bucket row_numbers (distributed "
    "windows) plus the ≤129-row bucket-count table's cumulative "
    "offsets, bit-identical to the oracle's literal row_number() "
    "OVER (ORDER BY score DESC, user_id).  Heavy-tailed view "
    "counts can make hot buckets — a straggler (linear windows), "
    "never a blow-up.  10-row cumulative algebra on top.",
    tags=("causality", "experiments", "ml", "window", "agg"),
)
def uplift_by_decile_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14
        )
        .cast("double")
        .alias("y"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
    ).select((F.col("user_id") % 2).cast("double").alias("t"), "y", "score", "user_id")
    # the shared bucket+offset device (operators/ranks.py): score-range
    # buckets ascend in the DESC-score sort order, per-bucket
    # row_numbers + broadcast prefix offsets — bit-identical to the
    # oracle's literal global rank
    from ..operators.ranks import with_global_rank, with_range_bucket

    bucketed = with_range_bucket(
        per_user, "score", descending=True
    )
    ranked = with_global_rank(
        bucketed,
        [F.desc("score"), F.asc("user_id")],
        out="rn",
        total="n",
        pre_shuffle=True,
    ).select("t", "y", "rn", "n")
    dec = ranked.select(
        F.ceil(F.col("rn") * 10.0 / F.col("n")).cast("int").alias("decile"),
        "t",
        "y",
    )
    t, y = F.col("t"), F.col("y")
    agg = dec.groupBy("decile").agg(
        F.sum(t).alias("nt"),
        F.sum(1 - t).alias("nc"),
        F.sum(t * y).alias("rt"),
        F.sum((1 - t) * y).alias("rc"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = agg.select(
        "decile",
        "nt",
        "nc",
        "rt",
        "rc",
        F.sum("nt").over(wcum).alias("cnt"),
        F.sum("nc").over(wcum).alias("cnc"),
        F.sum("rt").over(wcum).alias("crt"),
        F.sum("rc").over(wcum).alias("crc"),
    )
    return cum.select(
        "decile",
        F.col("nt").cast("bigint").alias("n_treated"),
        F.col("nc").cast("bigint").alias("n_control"),
        F.round(
            F.col("rt") / F.nullif(F.col("nt"), F.lit(0.0))
            - F.col("rc") / F.nullif(F.col("nc"), F.lit(0.0)),
            4,
        ).alias("uplift"),
        F.round(
            F.col("crt")
            - F.col("crc") * F.col("cnt") / F.nullif(F.col("cnc"), F.lit(0.0)),
            4,
        ).alias("cum_qini"),
    ).orderBy("decile")


@register(
    "james_stein_segment_shrinkage",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST((user_id // 2) % 12 AS INTEGER) AS seg,
               CAST(user_id % 2 AS DOUBLE) AS t,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS o
        FROM events GROUP BY 1
    ),
    seg AS (
        SELECT seg,
               CAST(count(*) AS BIGINT) AS n_users,
               sum(t * o) / nullif(sum(t), 0)
                   - sum((1 - t) * o) / nullif(count(*) - sum(t), 0)
                   AS z,
               (sum(t * o * o) / nullif(sum(t), 0)
                    - (sum(t * o) / nullif(sum(t), 0))
                      * (sum(t * o) / nullif(sum(t), 0)))
                   / nullif(sum(t), 0)
               + (sum((1 - t) * o * o) / nullif(count(*) - sum(t), 0)
                    - (sum((1 - t) * o) / nullif(count(*) - sum(t), 0))
                      * (sum((1 - t) * o) / nullif(count(*) - sum(t), 0)))
                   / nullif(count(*) - sum(t), 0) AS v
        FROM per_user GROUP BY 1
    ),
    pool AS (
        SELECT CAST(count(z) AS DOUBLE) AS k,
               avg(z) AS zbar,
               avg(v) AS s2,
               sum((z - (SELECT avg(z) FROM seg))
                   * (z - (SELECT avg(z) FROM seg))) AS ss
        FROM seg
    ),
    fac AS (
        SELECT zbar, least(1.0, greatest(0.0,
                   1 - (k - 3) * s2 / nullif(ss, 0))) AS shrink
        FROM pool
    )
    SELECT s.seg AS segment, s.n_users,
           round(s.z, 4) AS raw_effect,
           round(f.zbar + f.shrink * (s.z - f.zbar), 4) AS shrunk_effect,
           round(f.shrink, 4) AS shrink_factor
    FROM seg s CROSS JOIN fac f
    ORDER BY s.seg
    """,
    doc="James-Stein (positive-part) shrinkage of per-segment "
    "treatment effects: 12 deterministic user segments ((user_id//2) "
    "mod 12 — the //2 strips the parity bit so segments cross-cut "
    "the arm split) each get a "
    "noisy arm-difference estimate z_s; the JS factor "
    "(1 - (k-3)*sigma^2/S)+ with sigma^2 = the average per-segment "
    "sampling variance (biased per-arm variance / n_arm) pulls every "
    "estimate toward the grand mean — the winner's-curse correction "
    "for 'which segment did the experiment help most?' readouts, "
    "which naive per-segment tables get wrong by construction "
    "(max of k noisy estimates is biased up).  Dominates the raw "
    "estimates in total squared error whenever k >= 4.  Scale: user "
    "reduce, one 12-row grouped pass, 1-row factor broadcast.",
    tags=("causality", "experiments", "stats", "agg"),
)
def james_stein_segment_shrinkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
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
        ).alias("o")
    ).select(
        # user_id // 2 strips the parity bit so segments are
        # independent of the arm (user_id % 12 alone would make
        # every segment single-arm: %12 preserves parity).
        (F.floor(F.col("user_id") / 2).cast("bigint") % 12)
        .cast("int")
        .alias("seg"),
        (F.col("user_id") % 2).cast("double").alias("t"),
        "o",
    )
    t, o = F.col("t"), F.col("o")
    cnt = F.count(F.lit(1))
    n1 = F.nullif(F.sum(t), F.lit(0.0))
    n0 = F.nullif(cnt - F.sum(t), F.lit(0.0))
    m1 = F.sum(t * o) / n1
    m0 = F.sum((1 - t) * o) / n0
    seg = per_user.groupBy("seg").agg(
        cnt.cast("bigint").alias("n_users"),
        (m1 - m0).alias("z"),
        (
            (F.sum(t * o * o) / n1 - m1 * m1) / n1
            + (F.sum((1 - t) * o * o) / n0 - m0 * m0) / n0
        ).alias("v"),
    )
    z = F.col("z")
    zbar_w = Window.partitionBy()
    staged = seg.select(
        "seg", "n_users", "z", "v", F.avg(z).over(zbar_w).alias("zbar")
    )
    pool = staged.agg(
        # count(z), not count(*): a segment missing an arm (possible
        # only on tiny fixtures) contributes no estimate and must not
        # inflate k in the (k-3) shrinkage numerator
        F.count(F.col("z")).cast("double").alias("k"),
        F.max("zbar").alias("zbar"),
        F.avg("v").alias("s2"),
        F.sum((z - F.col("zbar")) * (z - F.col("zbar"))).alias("ss"),
    )
    fac = pool.select(
        "zbar",
        # clamp to [0, 1]: the positive-part JS factor, plus an upper
        # clamp so k <= 3 (tiny fixtures) can never EXPAND estimates
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                1
                - (F.col("k") - 3)
                * F.col("s2")
                / F.nullif(F.col("ss"), F.lit(0.0)),
            ),
        ).alias("shrink"),
    )
    out = seg.crossJoin(F.broadcast(fac))
    return out.select(
        F.col("seg").alias("segment"),
        "n_users",
        F.round(z, 4).alias("raw_effect"),
        F.round(
            F.col("zbar") + F.col("shrink") * (z - F.col("zbar")), 4
        ).alias("shrunk_effect"),
        F.round(F.col("shrink"), 4).alias("shrink_factor"),
    ).orderBy("segment")


@register(
    "raking_weights_ipf",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS INTEGER) AS arm,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    >= 13 AS INTEGER) AS tier
        FROM events GROUP BY 1
    ),
    cells AS (
        SELECT arm, tier, CAST(count(*) AS DOUBLE) AS n
        FROM per_user GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS nt FROM cells),
    r1 AS (
        SELECT arm, tier, n, t.nt,
               n * (t.nt / 2)
                   / sum(n) OVER (PARTITION BY arm) AS w
        FROM cells CROSS JOIN tot t
    ),
    c1 AS (
        SELECT arm, tier, n, nt,
               w * (nt / 2) / sum(w) OVER (PARTITION BY tier) AS w
        FROM r1
    ),
    r2 AS (
        SELECT arm, tier, n, nt,
               w * (nt / 2) / sum(w) OVER (PARTITION BY arm) AS w
        FROM c1
    ),
    c2 AS (
        SELECT arm, tier, n, nt,
               w * (nt / 2) / sum(w) OVER (PARTITION BY tier) AS w
        FROM r2
    )
    SELECT arm, tier,
           CAST(n AS BIGINT) AS n_users,
           round(w / n, 6) AS weight,
           round(w / nt, 6) AS weighted_share,
           round(sum(w) OVER (PARTITION BY arm) / nt, 6) AS arm_share,
           round(sum(w) OVER (PARTITION BY tier) / nt, 6) AS tier_share
    FROM c2 ORDER BY arm, tier
    """,
    doc="Raking / iterative proportional fitting of post-"
    "stratification weights: the 2x2 (arm x heavy-viewer-tier) cell "
    "counts are rescaled toward 50/50 target margins on BOTH "
    "dimensions by two full IPF rounds (row-scale, column-scale, "
    "repeat), each scaling a margin-partitioned window sum over the "
    "4-row cell table — the window-over-window chain is staged "
    "through CTEs for the oracle.  Emits per-cell weights (total "
    "cell weight / cell count = the per-user weight), the achieved "
    "weighted shares, and both margins after round 2 (convergence "
    "diagnostic: arm_share ~ tier_share ~ 0.5).  The reweighting "
    "layer survey/observational pipelines run before any estimator "
    "upstream.  Scale: user reduce to a 4-row cell table; "
    "everything after is constant-size.",
    tags=("experiments", "stats", "dataops", "window"),
)
def raking_weights_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            >= 13
        )
        .cast("int")
        .alias("tier")
    ).select((F.col("user_id") % 2).cast("int").alias("arm"), "tier")
    cells = per_user.groupBy("arm", "tier").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    tot = cells.agg(F.sum("n").alias("nt"))
    warm = Window.partitionBy("arm")
    wtier = Window.partitionBy("tier")
    cur = cells.crossJoin(F.broadcast(tot)).select(
        "arm",
        "tier",
        "n",
        "nt",
        (
            F.col("n") * (F.col("nt") / 2) / F.sum("n").over(warm)
        ).alias("w"),
    )
    for wspec in (wtier, warm, wtier):
        cur = cur.select(
            "arm",
            "tier",
            "n",
            "nt",
            (
                F.col("w") * (F.col("nt") / 2) / F.sum("w").over(wspec)
            ).alias("w"),
        )
    return cur.select(
        "arm",
        "tier",
        F.col("n").cast("bigint").alias("n_users"),
        F.round(F.col("w") / F.col("n"), 6).alias("weight"),
        F.round(F.col("w") / F.col("nt"), 6).alias("weighted_share"),
        F.round(
            F.sum("w").over(warm) / F.col("nt"), 6
        ).alias("arm_share"),
        F.round(
            F.sum("w").over(wtier) / F.col("nt"), 6
        ).alias("tier_share"),
    ).orderBy("arm", "tier")


@register(
    "brier_calibration_decomposition",
    oracle=_SCORED_SQL
    + """,
    base AS (SELECT avg(y) AS ybar, count(*) AS n FROM scored),
    bins AS (
        SELECT CAST(floor(p * 10) AS INTEGER) AS bin,
               CAST(count(*) AS DOUBLE) AS nb,
               avg(p) AS pb, avg(y) AS yb
        FROM scored GROUP BY 1
    ),
    parts AS (
        SELECT sum(nb * (pb - yb) * (pb - yb)) / max(b.n) AS rel,
               sum(nb * (yb - b.ybar) * (yb - b.ybar)) / max(b.n) AS res,
               max(b.ybar) * (1 - max(b.ybar)) AS unc,
               CAST(max(b.n) AS BIGINT) AS n
        FROM bins CROSS JOIN base b
    ),
    raw AS (SELECT avg((p - y) * (p - y)) AS brier FROM scored)
    SELECT p.n AS n_obs,
           round(r.brier, 6) AS brier_score,
           round(p.rel, 6) AS reliability,
           round(p.res, 6) AS resolution,
           round(p.unc, 6) AS uncertainty,
           round(r.brier - (p.rel - p.res + p.unc), 6) AS decomp_gap
    FROM parts p CROSS JOIN raw r
    """,
    doc="Murphy decomposition of the Brier score for the shared IRLS "
    "propensity model (the probability model every weighting "
    "estimator in this family trusts): brier = reliability - "
    "resolution + uncertainty over 10 fixed probability bins, where "
    "reliability (miscalibration) should be ~0 for a usable "
    "propensity and resolution measures how much the model actually "
    "separates.  decomp_gap reports the within-bin variance term the "
    "binned identity drops — near 0 means 10 bins suffice; a large "
    "gap says the calibration table itself is too coarse to trust.  "
    "The model-trust gate in front of ipw/aipw/matching.  Scale: "
    "GLM moment passes + ONE binned aggregate (10 rows) + one "
    "scalar pass.",
    tags=("experiments", "ml", "stats", "agg"),
)
def brier_calibration_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = _scored_feat(spark, sf_dir)
    p, y = F.col("p"), F.col("y").cast("double")
    base = scored.agg(
        F.avg(y).alias("ybar"), F.count(F.lit(1)).alias("n")
    )
    bins = scored.groupBy(
        F.floor(p * 10).cast("int").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.avg(p).alias("pb"),
        F.avg(y).alias("yb"),
    )
    parts = bins.crossJoin(F.broadcast(base)).agg(
        (
            F.sum(
                F.col("nb")
                * (F.col("pb") - F.col("yb"))
                * (F.col("pb") - F.col("yb"))
            )
            / F.max("n")
        ).alias("rel"),
        (
            F.sum(
                F.col("nb")
                * (F.col("yb") - F.col("ybar"))
                * (F.col("yb") - F.col("ybar"))
            )
            / F.max("n")
        ).alias("res"),
        (F.max("ybar") * (1 - F.max("ybar"))).alias("unc"),
        F.max("n").cast("bigint").alias("n"),
    )
    raw = scored.agg(F.avg((p - y) * (p - y)).alias("brier"))
    j = parts.crossJoin(F.broadcast(raw))
    return j.select(
        F.col("n").alias("n_obs"),
        F.round(F.col("brier"), 6).alias("brier_score"),
        F.round(F.col("rel"), 6).alias("reliability"),
        F.round(F.col("res"), 6).alias("resolution"),
        F.round(F.col("unc"), 6).alias("uncertainty"),
        F.round(
            F.col("brier")
            - (F.col("rel") - F.col("res") + F.col("unc")),
            6,
        ).alias("decomp_gap"),
    )


# ---------------------------------------------------------------------------
# Off-policy (counterfactual) evaluation: what WOULD a different
# targeting policy have earned on the logged experiment data?
# ---------------------------------------------------------------------------

_OPE_FEAT_SQL = """
    WITH logged AS (
        SELECT user_id,
               CAST(user_id % 2 AS DOUBLE) AS a,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    >= 13 AS DOUBLE) AS pi,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS r
        FROM events GROUP BY 1
    )
"""


@register(
    "offline_policy_ips_snips",
    oracle=_OPE_FEAT_SQL
    + """
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(CAST(pi = a AS DOUBLE)), 4) AS match_rate,
           round(avg(r), 4) AS value_logging,
           round(avg(CAST(pi = a AS DOUBLE) * r / 0.5), 4) AS value_ips,
           round(sum(CAST(pi = a AS DOUBLE) * r / 0.5)
                 / nullif(sum(CAST(pi = a AS DOUBLE) / 0.5), 0), 4)
               AS value_snips,
           round(power(sum(CAST(pi = a AS DOUBLE) / 0.5), 2)
                 / nullif(sum(power(CAST(pi = a AS DOUBLE) / 0.5, 2)), 0),
                 2) AS effective_sample_size
    FROM logged
    """,
    doc="Off-policy evaluation by inverse propensity scoring: the "
    "logged randomized action is the 50/50 arm (known propensity "
    "0.5 — no model needed), the TARGET policy treats heavy viewers "
    "(views >= 13), reward = total purchase value.  value_ips = "
    "E[1{pi(x)=a} r / 0.5] is unbiased for the target policy's value; "
    "value_snips (self-normalized) trades a little bias for much "
    "lower variance; the effective sample size (sum w)^2 / sum w^2 "
    "says how much data actually supports the counterfactual "
    "(~n*match_rate here since weights are two-valued).  The "
    "logged-policy mean sits alongside as the baseline.  This is "
    "the estimator family behind every offline recommender/RLHF "
    "policy readout.  Scale: one user-grain reduce, one moment row.",
    tags=("causality", "experiments", "ml", "agg"),
)
def offline_policy_ips_snips(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    logged = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            >= 13
        )
        .cast("double")
        .alias("pi"),
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
        ).alias("r"),
    ).select(
        (F.col("user_id") % 2).cast("double").alias("a"), "pi", "r"
    )
    w = (F.col("pi") == F.col("a")).cast("double") / 0.5
    r = F.col("r")
    return logged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.avg((F.col("pi") == F.col("a")).cast("double")), 4
        ).alias("match_rate"),
        F.round(F.avg(r), 4).alias("value_logging"),
        F.round(F.avg(w * r), 4).alias("value_ips"),
        F.round(
            F.sum(w * r) / F.nullif(F.sum(w), F.lit(0.0)), 4
        ).alias("value_snips"),
        F.round(
            F.pow(F.sum(w), 2)
            / F.nullif(F.sum(F.pow(w, 2)), F.lit(0.0)),
            2,
        ).alias("effective_sample_size"),
    )


@register(
    "offline_policy_doubly_robust",
    oracle=_OPE_FEAT_SQL
    + """,
    ctx AS (
        SELECT a, pi, r,
               CAST(pi AS INTEGER) AS tier  -- pi IS the context split
        FROM logged
    ),
    model AS (
        SELECT tier, a, avg(r) AS m FROM ctx GROUP BY 1, 2
    ),
    scored AS (
        SELECT c.a, c.pi, c.r,
               ml.m AS m_logged,
               mt.m AS m_target
        FROM ctx c
        JOIN model ml ON ml.tier = c.tier AND ml.a = c.a
        JOIN model mt ON mt.tier = c.tier AND mt.a = c.pi
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(m_target), 4) AS value_direct,
           round(avg(CAST(pi = a AS DOUBLE) * r / 0.5), 4) AS value_ips,
           round(avg(m_target
                     + CAST(pi = a AS DOUBLE) * (r - m_logged) / 0.5),
                 4) AS value_dr
    FROM scored
    """,
    doc="Doubly-robust off-policy evaluation: the direct method "
    "scores the target policy with a per-(context, action) outcome "
    "model (cell means over the tier x arm table — exactly the "
    "model-based half), IPS reweights logged rewards, and DR "
    "combines them: DM prediction + importance-weighted model "
    "residual.  Unbiased if EITHER the outcome model or the "
    "(known, 0.5) propensity is right; here both are, so DM/IPS/DR "
    "should agree within noise — the disagreement IS the diagnostic. "
    " The AIPW idea (aipw_doubly_robust_effect) transplanted from "
    "effect estimation to policy value.  Scale: user reduce, a "
    "4-row model broadcast back, one moment pass.",
    tags=("causality", "experiments", "ml", "agg", "join"),
)
def offline_policy_doubly_robust(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    logged = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            >= 13
        )
        .cast("double")
        .alias("pi"),
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
        ).alias("r"),
    ).select(
        (F.col("user_id") % 2).cast("double").alias("a"),
        "pi",
        "r",
        F.col("pi").cast("int").alias("tier"),
    ).transform(ckpt)  # feeds the outcome model AND the DR scan
    model = logged.groupBy("tier", "a").agg(
        F.avg("r").alias("m")
    ).transform(ckpt)  # 4 rows, broadcast twice
    ml = model.select(
        F.col("tier").alias("tier_l"),
        F.col("a").alias("a_l"),
        F.col("m").alias("m_logged"),
    )
    mt = model.select(
        F.col("tier").alias("tier_t"),
        F.col("a").alias("a_t"),
        F.col("m").alias("m_target"),
    )
    scored = logged.join(
        F.broadcast(ml),
        (F.col("tier") == F.col("tier_l")) & (F.col("a") == F.col("a_l")),
    ).join(
        F.broadcast(mt),
        (F.col("tier") == F.col("tier_t"))
        & (F.col("pi") == F.col("a_t")),
    )
    match = (F.col("pi") == F.col("a")).cast("double")
    r = F.col("r")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg(F.col("m_target")), 4).alias("value_direct"),
        F.round(F.avg(match * r / 0.5), 4).alias("value_ips"),
        F.round(
            F.avg(
                F.col("m_target")
                + match * (r - F.col("m_logged")) / 0.5
            ),
            4,
        ).alias("value_dr"),
    )


@register(
    "triple_difference_ddd",
    oracle=f"""
    WITH per_user_period AS (
        SELECT user_id,
               CAST(user_id % 2 AS INTEGER) AS a,
               CAST(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    >= 15 AS INTEGER)
                   AS post,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS o
        FROM events GROUP BY 1, 2, 3
    ),
    tiers AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    >= 13 AS INTEGER) AS h
        FROM events GROUP BY 1
    ),
    cells AS (
        SELECT p.a, t.h, p.post, avg(p.o) AS m,
               CAST(count(*) AS BIGINT) AS n
        FROM per_user_period p JOIN tiers t ON t.user_id = p.user_id
        GROUP BY 1, 2, 3
    ),
    did AS (
        SELECT h,
               sum(CASE WHEN a = 1 AND post = 1 THEN m END)
               - sum(CASE WHEN a = 1 AND post = 0 THEN m END)
               - sum(CASE WHEN a = 0 AND post = 1 THEN m END)
               + sum(CASE WHEN a = 0 AND post = 0 THEN m END) AS d
        FROM cells GROUP BY 1
    )
    SELECT CAST((SELECT sum(n) FROM cells) AS BIGINT) AS n_user_periods,
           round(max(CASE WHEN h = 1 THEN d END), 4) AS did_heavy,
           round(max(CASE WHEN h = 0 THEN d END), 4) AS did_light,
           round(max(CASE WHEN h = 1 THEN d END)
                 - max(CASE WHEN h = 0 THEN d END), 4) AS ddd
    FROM did
    """,
    doc="Triple difference (DDD): the arm x period DiD computed "
    "separately within the heavy-viewer and light-viewer tiers, and "
    "differenced AGAINST EACH OTHER — the design that survives a "
    "tier-specific shock violating plain DiD's parallel-trends "
    "assumption (the shock cancels if it hits both arms within a "
    "tier equally).  Eight cell means, alternating signs; the two "
    "component DiDs are reported so the reader sees WHERE the "
    "triple difference comes from.  Scale: one user x period reduce "
    "+ one user-grain tier reduce joined at the user key, then an "
    "8-row cell table.",
    tags=("causality", "experiments", "stats", "agg", "join"),
)
def triple_difference_ddd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
    )
    pup = ev.groupBy(
        "user_id", (day >= 15).cast("int").alias("post")
    ).agg(
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
        ).alias("o")
    ).select((F.col("user_id") % 2).cast("int").alias("a"), "post", "o", "user_id")
    tiers = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            >= 13
        )
        .cast("int")
        .alias("h")
    )
    cells = (
        pup.join(F.broadcast(tiers), "user_id")
        .groupBy("a", "h", "post")
        .agg(
            F.avg("o").alias("m"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    a, p, m, h = F.col("a"), F.col("post"), F.col("m"), F.col("h")
    did = cells.groupBy("h").agg(
        (
            F.sum(F.when((a == 1) & (p == 1), m))
            - F.sum(F.when((a == 1) & (p == 0), m))
            - F.sum(F.when((a == 0) & (p == 1), m))
            + F.sum(F.when((a == 0) & (p == 0), m))
        ).alias("d"),
        F.sum("n").alias("n"),
    )
    d = F.col("d")
    return did.agg(
        F.sum("n").cast("bigint").alias("n_user_periods"),
        F.round(F.max(F.when(h == 1, d)), 4).alias("did_heavy"),
        F.round(F.max(F.when(h == 0, d)), 4).alias("did_light"),
        F.round(
            F.max(F.when(h == 1, d)) - F.max(F.when(h == 0, d)), 4
        ).alias("ddd"),
    )


@register(
    "holm_fwer_adjust",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST((user_id // 2) % 12 AS INTEGER) AS seg,
               CAST(user_id % 2 AS DOUBLE) AS t,
               round(coalesce(sum(CASE WHEN event_type = 'purchase'
                                       THEN value END), 0), 6) AS o
        FROM events GROUP BY 1
    ),
    seg AS (
        SELECT seg,
               sum(t * o) / nullif(sum(t), 0)
                   - sum((1 - t) * o) / nullif(count(*) - sum(t), 0)
                   AS z,
               (sum(t * o * o) / nullif(sum(t), 0)
                    - power(sum(t * o) / nullif(sum(t), 0), 2))
                   / nullif(sum(t), 0)
               + (sum((1 - t) * o * o)
                      / nullif(count(*) - sum(t), 0)
                    - power(sum((1 - t) * o)
                            / nullif(count(*) - sum(t), 0), 2))
                   / nullif(count(*) - sum(t), 0) AS v
        FROM per_user GROUP BY 1
    ),
    pvals AS (
        SELECT seg,
               round(2 * (1 - {_phi_sql("abs(z) / sqrt(v)")}), 6) AS p
        FROM seg WHERE v > 0
    ),
    ranked AS (
        SELECT seg, p,
               row_number() OVER (ORDER BY p, seg) AS i,
               count(*) OVER () AS k
        FROM pvals
    ),
    stepped AS (
        SELECT seg, p, i, k,
               max((k - i + 1) * p)
                   OVER (ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS holm_raw
        FROM ranked
    )
    SELECT seg AS segment,
           round(p, 4) AS raw_p,
           round(least(1.0, holm_raw), 4) AS holm_adj_p,
           CAST(least(1.0, holm_raw) < 0.05 AS INTEGER) AS rejected
    FROM stepped ORDER BY segment
    """,
    doc="Holm step-down FWER adjustment over the 12 per-segment arm "
    "effects (the same segments james_stein_segment_shrinkage pulls "
    "toward the grand mean — shrinkage fixes the MAGNITUDES, Holm "
    "fixes the CLAIMS): per-segment Welch z -> two-sided p (shared "
    "tanh-Phi), then adj_p_i = max_(j<=i) (k-j+1)*p_j capped at 1 — "
    "a running max over the p-sorted order, one cumulative window.  "
    "The family-wise complement to granger_fdr_screen's "
    "Benjamini-Hochberg FDR: Holm controls ANY false rejection, "
    "BH controls the false-discovery rate.  On null fixture data "
    "every segment should survive adjustment unrejected.  Scale: "
    "user reduce -> 12-row segment table; windows run on 12 rows.",
    tags=("causality", "experiments", "stats", "window"),
)
def holm_fwer_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
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
        ).alias("o")
    ).select(
        (F.floor(F.col("user_id") / 2).cast("bigint") % 12)
        .cast("int")
        .alias("seg"),
        (F.col("user_id") % 2).cast("double").alias("t"),
        "o",
    )
    t, o = F.col("t"), F.col("o")
    cnt = F.count(F.lit(1))
    n1 = F.nullif(F.sum(t), F.lit(0.0))
    n0 = F.nullif(cnt - F.sum(t), F.lit(0.0))
    m1 = F.sum(t * o) / n1
    m0 = F.sum((1 - t) * o) / n0
    seg = per_user.groupBy("seg").agg(
        (m1 - m0).alias("z"),
        (
            (F.sum(t * o * o) / n1 - m1 * m1) / n1
            + (F.sum((1 - t) * o * o) / n0 - m0 * m0) / n0
        ).alias("v"),
    )
    pvals = seg.where(F.col("v") > 0).select(
        "seg",
        F.round(
            2 * (1 - _phi_spark(F.abs(F.col("z")) / F.sqrt(F.col("v")))),
            6,
        ).alias("p"),
    )
    wrank = Window.orderBy("p", "seg")
    ranked = pvals.select(
        "seg",
        "p",
        F.row_number().over(wrank).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("k"),
    )
    wstep = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = ranked.select(
        "seg",
        "p",
        F.max((F.col("k") - F.col("i") + 1) * F.col("p"))
        .over(wstep)
        .alias("holm_raw"),
    )
    adj = F.least(F.lit(1.0), F.col("holm_raw"))
    return stepped.select(
        F.col("seg").alias("segment"),
        F.round(F.col("p"), 4).alias("raw_p"),
        F.round(adj, 4).alias("holm_adj_p"),
        (adj < 0.05).cast("int").alias("rejected"),
    ).orderBy("segment")
