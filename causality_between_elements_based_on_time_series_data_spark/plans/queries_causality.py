"""Cross-series causality analytics (the reference's domain, SURVEY.md
§0: causality between elements based on time-series data).

The AMTL loop (ml/amtl.py) learns the causality matrix B the
reference's way — via asymmetric multi-task transfer (model.py:
166-184).  This module adds the *descriptive* cross-series statistics
an analyst runs before/alongside that training: pairwise series
correlation, directional lag-1 cross-correlation, lag regression
(the Granger-style precursor test), per-series autocorrelation, and
temporal precedence counts.  All are plain DataFrame aggregations —
one shuffle to build the hourly grid, then joins keyed on the tiny
hour/series dimensions — and all carry full DuckDB oracles.

Scale shape: the hourly grid is |hours| × |series| rows — for a year
of data and thousands of series it is millions of rows, *independent
of raw event volume* (100 TB of events reduce in the first map-side
partial aggregate).  The pairwise joins run on the grid, not the
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

_HOURLY_ORACLE = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type, sum(value) AS v
        FROM events GROUP BY 1, 2
    )
"""


def _hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared hour × series grid: one map-side-combined aggregate
    over events; everything downstream joins this small grid."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.sum("value").alias("v"))


@register(
    "pairwise_series_correlation",
    oracle=_HOURLY_ORACLE
    + """
    SELECT a.event_type AS series_a, b.event_type AS series_b,
           round(corr(a.v, b.v), 4) AS pearson_r,
           count(*) AS n_hours
    FROM hourly a JOIN hourly b
      ON a.hour = b.hour AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    doc="Pairwise Pearson correlation between the hourly value series "
    "of every element pair — the symmetric association matrix an "
    "analyst inspects before asking the directional (causal) "
    "question.  Events reduce to the hour×series grid first, so the "
    "pair join is over |hours|·|series| rows, not raw events.",
    tags=("causality", "timeseries", "stats"),
)
def pairwise_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly_series(spark, sf_dir)
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.hour") == F.col("b.hour"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("series_a"),
            F.col("b.event_type").alias("series_b"),
        )
        .agg(
            F.round(F.corr("a.v", "b.v"), 4).alias("pearson_r"),
            F.count("*").alias("n_hours"),
        )
    )


@register(
    "lagged_cross_correlation",
    oracle=_HOURLY_ORACLE
    + """
    SELECT a.event_type AS leader, b.event_type AS follower,
           round(corr(a.v, b.v), 4) AS lag1_r,
           count(*) AS n_hours
    FROM hourly a JOIN hourly b
      ON b.hour = a.hour + INTERVAL 1 HOUR
     AND a.event_type <> b.event_type
    GROUP BY 1, 2
    """,
    doc="Directional lag-1 cross-correlation: corr(leader at hour h, "
    "follower at hour h+1) for every ORDERED series pair — the "
    "asymmetry between (a→b) and (b→a) is the first hint of temporal "
    "precedence, the quantity the AMTL B-matrix models "
    "(model.py:86-101).",
    tags=("causality", "timeseries", "stats"),
)
def lagged_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly_series(spark, sf_dir)
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("b.hour") == F.col("a.hour") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("leader"),
            F.col("b.event_type").alias("follower"),
        )
        .agg(
            F.round(F.corr("a.v", "b.v"), 4).alias("lag1_r"),
            F.count("*").alias("n_hours"),
        )
    )


@register(
    "granger_lag_regression",
    oracle=_HOURLY_ORACLE
    + """
    SELECT a.event_type AS leader, b.event_type AS follower,
           round(regr_slope(b.v, a.v), 4)     AS slope,
           round(regr_intercept(b.v, a.v), 4) AS intercept,
           round(regr_r2(b.v, a.v), 4)        AS r2,
           count(*) AS n_hours
    FROM hourly a JOIN hourly b
      ON b.hour = a.hour + INTERVAL 1 HOUR
     AND a.event_type <> b.event_type
    GROUP BY 1, 2
    """,
    doc="Granger-style lag regression: OLS of follower(h+1) on "
    "leader(h) per ordered pair — slope, intercept and R² from the "
    "built-in regr_* aggregates (single pass, map-side partials). "
    "The descriptive analog of the reference's learned transfer "
    "weights B[leader, follower].",
    tags=("causality", "timeseries", "stats"),
)
def granger_lag_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly_series(spark, sf_dir)
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("b.hour") == F.col("a.hour") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("leader"),
            F.col("b.event_type").alias("follower"),
        )
        .agg(
            F.round(F.regr_slope("b.v", "a.v"), 4).alias("slope"),
            F.round(F.regr_intercept("b.v", "a.v"), 4).alias("intercept"),
            F.round(F.regr_r2("b.v", "a.v"), 4).alias("r2"),
            F.count("*").alias("n_hours"),
        )
    )


@register(
    "series_autocorrelation",
    oracle=_HOURLY_ORACLE
    + """
    , lagged AS (
        SELECT event_type, v,
               lag(v) OVER (PARTITION BY event_type ORDER BY hour) AS pv
        FROM hourly
    )
    SELECT event_type, round(corr(v, pv), 4) AS acf1, count(pv) AS n
    FROM lagged GROUP BY event_type
    """,
    doc="Lag-1 autocorrelation per series (the AR(1) coefficient over "
    "observed hours): how self-predictable each element is — the "
    "baseline any cross-series causality claim must beat.  Window "
    "lag within the series partition, then one corr aggregate.",
    tags=("causality", "timeseries", "stats"),
)
def series_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = h.withColumn("pv", F.lag("v").over(w))
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("v", "pv"), 4).alias("acf1"),
        F.count("pv").alias("n"),
    )


@register(
    "temporal_precedence_counts",
    oracle="""
    SELECT a.event_type AS antecedent, b.event_type AS consequent,
           count(*) AS n_pairs,
           count(DISTINCT a.user_id) AS n_users
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
     AND a.event_type <> b.event_type
    GROUP BY 1, 2
    """,
    doc="Temporal precedence: within each entity's own stream, how "
    "often does element a precede element b within 30 minutes — the "
    "event-level (not grid-level) precedence signal.  The self-join "
    "is keyed on the entity id (one shuffle, co-partitioned), with "
    "the time-range predicate evaluated inside each key group, so "
    "work is bounded by per-entity activity, never corpus².",
    tags=("causality", "timeseries"),
)
def temporal_precedence_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 30 MINUTES"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("a.user_id").alias("n_users"),
        )
    )


@register(
    "cohort_retention",
    oracle="""
    WITH first_day AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        FROM events GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
        FROM events
    )
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, active_day) AS INTEGER) AS day_offset,
           count(*) AS n_active_users
    FROM first_day JOIN activity USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention: entities grouped by first-seen day, counted "
    "active per day offset — the temporal engagement decay curve.  "
    "Two entity-keyed aggregates and one entity-keyed join; the "
    "result is |cohorts|×|offsets|, independent of event volume.",
    tags=("causality", "timeseries", "cohort"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = ev.select("user_id", F.date_trunc("day", "ts").alias("active_day")).distinct()
    return (
        first_day.join(activity, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH t AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'     THEN ts END) AS v,
               min(CASE WHEN event_type = 'click'    THEN ts END) AS c,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
        FROM events GROUP BY 1
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN v IS NOT NULL AND c > v THEN 1 ELSE 0 END) AS BIGINT)
               AS n_view_then_click,
           CAST(sum(CASE WHEN v IS NOT NULL AND c > v AND p > c THEN 1 ELSE 0 END) AS BIGINT)
               AS n_full_funnel
    FROM t
    """,
    doc="Ordered conversion funnel (view → click → purchase): per "
    "entity, the first occurrence of each stage via conditional min, "
    "then ordering predicates — one entity-keyed aggregate plus a "
    "single-row reduction; classic sequential-pattern analytics "
    "without a self-join.",
    tags=("causality", "timeseries", "funnel"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    has_v = F.col("v").isNotNull()
    vc = has_v & (F.col("c") > F.col("v"))
    vcp = vc & (F.col("p") > F.col("c"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(has_v.cast("int")).cast("bigint").alias("n_view"),
        F.sum(vc.cast("int")).cast("bigint").alias("n_view_then_click"),
        F.sum(vcp.cast("int")).cast("bigint").alias("n_full_funnel"),
    )


@register(
    "pairwise_mutual_information",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               round(sum(value), 6) AS v
        FROM events GROUP BY 1, 2
    ),
    edges AS (
        SELECT event_type, min(v) AS mn, max(v) AS mx
        FROM hourly GROUP BY 1
    ),
    binned AS (
        SELECT h.hour, h.event_type,
               CASE WHEN e.mx = e.mn THEN 0
                    ELSE least(3, CAST(floor((h.v - e.mn) * 4.0
                                             / (e.mx - e.mn)) AS INTEGER))
               END AS bin
        FROM hourly h JOIN edges e ON h.event_type = e.event_type
    ),
    joint AS (
        SELECT a.event_type AS series_a, b.event_type AS series_b,
               a.bin AS bin_a, b.bin AS bin_b,
               count(*) AS n_xy
        FROM binned a JOIN binned b
          ON a.hour = b.hour AND a.event_type < b.event_type
        GROUP BY 1, 2, 3, 4
    ),
    marg AS (
        SELECT series_a, series_b, bin_a, bin_b, n_xy,
               sum(n_xy) OVER (PARTITION BY series_a, series_b, bin_a) AS n_x,
               sum(n_xy) OVER (PARTITION BY series_a, series_b, bin_b) AS n_y,
               sum(n_xy) OVER (PARTITION BY series_a, series_b) AS n
        FROM joint
    )
    SELECT series_a, series_b,
           round(sum((CAST(n_xy AS DOUBLE) / n)
                     * ln(CAST(n_xy AS DOUBLE) * n
                          / (CAST(n_x AS DOUBLE) * n_y))), 6) AS mutual_info,
           CAST(max(n) AS BIGINT) AS n_hours
    FROM marg
    GROUP BY series_a, series_b
    ORDER BY series_a, series_b
    """,
    doc="Binned pairwise mutual information between element series — "
    "the nonlinear complement to Pearson correlation for screening "
    "causal candidates (MI detects dependence correlation misses).  "
    "Each series' hourly values are quantized into 4 equal-width bins "
    "(per-series min/max from a tiny aggregate join; values rounded "
    "to 6dp BEFORE binning so bin edges are engine-stable), the "
    "hour-aligned pair join builds the joint histogram, and the "
    "marginals come from window sums over the 16-cell joint table — "
    "no second pass over the grid.  Everything after the first "
    "events aggregate operates on |series|^2 x 16 rows, independent "
    "of raw event volume.",
    tags=("causality", "timeseries", "stats"),
)
def pairwise_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type").agg(
        F.round(F.sum("value"), 6).alias("v")
    )
    edges = hourly.groupBy("event_type").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    binned = hourly.join(F.broadcast(edges), "event_type").select(
        "hour",
        "event_type",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(3),
                F.floor((F.col("v") - F.col("mn")) * 4.0 / (F.col("mx") - F.col("mn"))).cast(
                    "int"
                ),
            )
        )
        .alias("bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    joint = (
        a.join(
            b,
            (F.col("a.hour") == F.col("b.hour"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("series_a"),
            F.col("b.event_type").alias("series_b"),
            F.col("a.bin").alias("bin_a"),
            F.col("b.bin").alias("bin_b"),
        )
        .agg(F.count("*").alias("n_xy"))
    )
    wx = Window.partitionBy("series_a", "series_b", "bin_a")
    wy = Window.partitionBy("series_a", "series_b", "bin_b")
    wn = Window.partitionBy("series_a", "series_b")
    marg = joint.select(
        "series_a",
        "series_b",
        "n_xy",
        F.sum("n_xy").over(wx).alias("n_x"),
        F.sum("n_xy").over(wy).alias("n_y"),
        F.sum("n_xy").over(wn).alias("n"),
    )
    term = (F.col("n_xy").cast("double") / F.col("n")) * F.log(
        F.col("n_xy").cast("double") * F.col("n") / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return (
        marg.groupBy("series_a", "series_b")
        .agg(
            F.round(F.sum(term), 6).alias("mutual_info"),
            F.max("n").cast("bigint").alias("n_hours"),
        )
        .orderBy("series_a", "series_b")
    )


@register(
    "partial_correlation_controlled",
    oracle=_HOURLY_ORACLE
    + """
    , pairs AS (
        SELECT a.event_type AS sa, b.event_type AS sb,
               corr(a.v, b.v) AS r
        FROM hourly a JOIN hourly b
          ON a.hour = b.hour AND a.event_type <> b.event_type
        GROUP BY 1, 2
    )
    SELECT xy.sa AS series_a, xy.sb AS series_b,
           round((xy.r - xz.r * yz.r)
                 / sqrt((1 - xz.r * xz.r) * (1 - yz.r * yz.r)),
                 4) AS partial_r,
           round(xy.r, 4) AS raw_r
    FROM pairs xy
    JOIN pairs xz ON xz.sa = xy.sa AND xz.sb = 'error'
    JOIN pairs yz ON yz.sa = xy.sb AND yz.sb = 'error'
    WHERE xy.sa < xy.sb AND xy.sa <> 'error' AND xy.sb <> 'error'
    ORDER BY series_a, series_b
    """,
    doc="First-order partial correlation: the association between "
    "two element series with the 'error' series held fixed — "
    "r_xy.z = (r_xy - r_xz r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)).  "
    "Screens out dependence that is really co-response to a "
    "confounder, the next causal-screening step after raw pairwise "
    "correlation.  Built entirely from the tiny |series|^2 "
    "correlation table (self-joined twice on the controlled "
    "series), which itself reduces from the hour x series grid — "
    "raw events are aggregated exactly once.",
    tags=("causality", "timeseries", "stats"),
)
def partial_correlation_controlled(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly_series(spark, sf_dir)
    a, b = h.alias("a"), h.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.hour") == F.col("b.hour"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("sa"),
            F.col("b.event_type").alias("sb"),
        )
        .agg(F.corr("a.v", "b.v").alias("r"))
    )
    xy = pairs.alias("xy")
    xz = pairs.filter(F.col("sb") == "error").alias("xz")
    yz = pairs.filter(F.col("sb") == "error").alias("yz")
    out = (
        xy.filter(
            (F.col("xy.sa") < F.col("xy.sb"))
            & (F.col("xy.sa") != "error")
            & (F.col("xy.sb") != "error")
        )
        .join(F.broadcast(xz), F.col("xz.sa") == F.col("xy.sa"))
        .join(F.broadcast(yz), F.col("yz.sa") == F.col("xy.sb"))
    )
    partial = (F.col("xy.r") - F.col("xz.r") * F.col("yz.r")) / F.sqrt(
        (1 - F.col("xz.r") * F.col("xz.r")) * (1 - F.col("yz.r") * F.col("yz.r"))
    )
    return out.select(
        F.col("xy.sa").alias("series_a"),
        F.col("xy.sb").alias("series_b"),
        F.round(partial, 4).alias("partial_r"),
        F.round("xy.r", 4).alias("raw_r"),
    ).orderBy("series_a", "series_b")


@register(
    "applyinpandas_trend_ols",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE) AS day_idx,
               round(sum(value), 6) AS v
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type,
           round(regr_slope(v, day_idx), 6)     AS slope,
           round(regr_intercept(v, day_idx), 6) AS intercept,
           count(*) AS n_days
    FROM daily
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Per-series OLS trend via a grouped applyInPandas numpy "
    "kernel — the §2.10 UDF machinery pinned against an EXACT SQL "
    "oracle (DuckDB regr_slope/regr_intercept), unlike the RNN/AMTL "
    "kernels whose math is numpy-golden-tested but engine-specific.  "
    "Each group is one series' daily aggregate (|days| rows — tiny), "
    "Arrow moves it once, the closed-form normal equations run in "
    "numpy, and the output is one row per series.  The kernel is a "
    "self-contained closure (worker-safe).  The daily pre-aggregate "
    "bounds Python's input at |days| x |series| regardless of raw "
    "event volume.",
    tags=("causality", "timeseries", "udf", "stats"),
)
def applyinpandas_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("day_idx"),
    ).agg(F.round(F.sum("value"), 6).alias("v"))

    def ols(pdf):
        # self-contained kernel: numpy/pandas only (worker sys.path)
        import numpy as np
        import pandas as pd

        x = pdf["day_idx"].to_numpy(dtype="float64")
        y = pdf["v"].to_numpy(dtype="float64")
        xm, ym = x.mean(), y.mean()
        slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slope": [round(slope, 6)],
                "intercept": [round(ym - slope * xm, 6)],
                "n_days": [len(pdf)],
            }
        )

    return (
        daily.groupBy("event_type")
        .applyInPandas(ols, "event_type string, slope double, intercept double, n_days bigint")
        .orderBy("event_type")
    )
