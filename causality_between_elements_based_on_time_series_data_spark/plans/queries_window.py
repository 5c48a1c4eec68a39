"""Window-function family (SURVEY.md §2.5-2.6).

The reference's sequence handling is fixed-shape tensor slicing
(``/root/reference/model.py:132``, ``model.py:71``) plus running-min
tracking with argmin (``model.py:219-262``).  The idiomatic Spark port
of both is the window family: lag/lead features replace step
tensorization, ranking replaces argmin, explicit frames replace the
running accumulators.  Every window here is partitioned on the entity
key so one hash shuffle serves the whole stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..lineage import ckpt

from ..sources.catalog import load_table
from .registry import register


@register(
    "window_lag_lead_prices",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS price,
           round(lag(o_totalprice)  OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead over per-customer order history — the §2.5 [GAP] "
    "lag-feature replacement for the reference's step tensorization.",
    tags=("window",),
)
def window_lag_lead_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.col("o_totalprice")), 2
        ).alias("delta"),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="row_number/rank/dense_rank/ntile — SURVEY §2.5 [GAP] ranking "
    "family; deterministic tie-breaks on the key column.  The "
    "per-customer ranks are ordinary partitioned windows; the GLOBAL "
    "quartile is reproduced from the bucket+offset exact rank "
    "(operators/ranks.py) by SQL-standard ntile arithmetic (first "
    "n%4 groups one row larger) — bit-identical to the oracle's "
    "literal ntile(4) without a one-task sort of the orders table.",
    tags=("window",),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import with_global_rank, with_range_bucket

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).transform(ckpt)
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = with_global_rank(
        with_range_bucket(orders, "o_totalprice", descending=True),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        out="grn",
        total="ntot",
        pre_shuffle=True,
    )
    # SQL-standard ntile(4): q = n div 4, r = n mod 4; the first r
    # groups get q+1 rows (same arithmetic as propensity_stratified_
    # effect's exact ntile(5))
    q = (F.col("ntot") / 4).cast("bigint")
    r = F.col("ntot") % 4
    thr = r * (q + 1)
    grn = F.col("grn")
    quartile = F.when(grn <= thr, F.ceil(grn / (q + 1))).otherwise(
        r + F.ceil((grn - thr) / q)
    )
    return ranked.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        quartile.cast("int").alias("quartile"),
    )


@register(
    "window_running_sum_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty,
           round(avg(l_quantity) OVER (PARTITION BY l_suppkey
                                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM lineitem
    """,
    doc="Explicit ROWS frames: running sum (the reference's running-min "
    "tracker shape, model.py:248-262) + 3-row moving average.",
    tags=("window", "bench"),
)
def window_running_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    base = W.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(base.rowsBetween(W.unboundedPreceding, 0)), 4).alias(
            "running_qty"
        ),
        F.round(F.avg("l_quantity").over(base.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window — the distributed argmin "
    "pattern replacing the reference's per-task min tracking "
    "(model.py:256-262).",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "argmin_eval_loss",
    oracle="""
    SELECT task, event_id AS argmin_event, round(value, 6) AS min_value
    FROM (
        SELECT event_type AS task, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn
        FROM events)
    WHERE rn = 1
    """,
    doc="Per-task argmin — the exact shape of the reference's "
    "min-eval-loss + step tracking (model.py:248-262): min value and "
    "the row where it occurred, with a deterministic tie-break.",
    tags=("window", "agg"),
)
def argmin_eval_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("task"),
            F.col("event_id"),
            F.col("value"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("task", F.col("event_id").alias("argmin_event"), F.round("value", 6).alias("min_value"))
    )


@register(
    "window_range_frame_trailing_hour",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT)   AS n_last_hour,
           round(sum(value) OVER w, 4)       AS sum_last_hour
    FROM (SELECT user_id, event_id, value,
                 epoch_us(ts) // 1000000 AS ts_s
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE frame (value-based, not row-based): per event, count "
    "and sum over the trailing 3600-second window — time-based "
    "sliding aggregates without a window table; completes the §2.5 "
    "frame-spec family (ROWS frames are window_running_sum_frame).",
    tags=("window", "timeseries"),
)
def window_range_frame_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_s", (F.unix_micros("ts") / 1_000_000).cast("long")
    )
    w = W.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).cast("bigint").alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice)  OVER w, 2) AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
           round(percent_rank() OVER wo, 6) AS pct_rank,
           round(cume_dist()    OVER wo, 6) AS cdist
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wo AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="first/last/nth_value with explicit full frames + "
    "percent_rank/cume_dist analytics — completes the §2.5 [GAP] "
    "ranking/analytic family.",
    tags=("window",),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    wo = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
        F.round(F.percent_rank().over(wo), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wo), 6).alias("cdist"),
    )


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min gap): lag + cumulative-sum "
    "window then grouped agg — the batch analog of streaming "
    "session_window, one shuffle on user_id total.",
    tags=("window", "timeseries", "bench"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tie-break on the cumsum too: with tied timestamps a
    # ts-only ROWS frame is nondeterministic and session_id assignment
    # could differ between engines/runs
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    return (
        flagged.withColumn("session_id", F.sum("new_session").over(run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
    )


@register(
    "scd2_user_status_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, ts, event_id, event_type
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    versioned AS (
        SELECT user_id,
               event_type AS status,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS version
        FROM changes
    )
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           status, valid_from, valid_to,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER)
               AS is_current
    FROM versioned
    """,
    doc="Slowly-changing-dimension type-2 build from a change stream: "
    "collapse consecutive duplicate statuses (lag filter), then emit "
    "versioned validity intervals [valid_from, valid_to) with "
    "lead(ts) and an is_current flag on the open interval — the "
    "standard warehouse dimension-history derivation.  Both window "
    "stages share one user_id partitioning, so the whole derivation "
    "is a single shuffle; DuckDB stages the window-over-window "
    "through CTEs (it cannot nest window functions).",
    tags=("window", "timeseries", "scd"),
)
def scd2_user_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    return changes.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).withColumn(
        "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int")
    )


@register(
    "ratio_to_report_nation_share",
    oracle="""
    WITH nation_rev AS (
        SELECT n_regionkey, n_name,
               sum(o_totalprice) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_regionkey, n_name
    )
    SELECT CAST(n_regionkey AS INTEGER) AS n_regionkey, n_name,
           round(rev, 2) AS revenue,
           round(rev / sum(rev) OVER (PARTITION BY n_regionkey), 6)
               AS region_share,
           CAST(rank() OVER (PARTITION BY n_regionkey
                             ORDER BY round(rev, 2) DESC, n_name)
                AS INTEGER) AS region_rank
    FROM nation_rev
    ORDER BY n_regionkey, region_rank
    """,
    doc="Ratio-to-report: each nation's share of its region's "
    "revenue via a partition-total window over the AGGREGATED "
    "per-nation table (25 rows) — the share window costs nothing "
    "because the heavy lifting happened in the partial-aggregated "
    "groupBy below it; ranking on the ROUNDED revenue keeps the "
    "order engine-stable.  The anti-pattern this query exists to "
    "pin against: windowing the raw fact table for a global share "
    "(a fact-sized single-partition window).",
    tags=("window", "relational", "agg"),
)
def ratio_to_report_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    nation_rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    share_w = W.partitionBy("n_regionkey")
    rank_w = W.partitionBy("n_regionkey").orderBy(
        F.round("rev", 2).desc(), F.asc("n_name")
    )
    return nation_rev.select(
        F.col("n_regionkey").cast("int"),
        "n_name",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(share_w), 6).alias("region_share"),
        F.rank().over(rank_w).cast("int").alias("region_rank"),
    ).orderBy("n_regionkey", "region_rank")


@register(
    "scd2_asof_lookup",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, ts, event_id, event_type
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    versioned AS (
        SELECT user_id,
               event_type AS status,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS version
        FROM changes
    )
    SELECT user_id,
           status,
           CAST(version AS BIGINT) AS version,
           valid_from
    FROM versioned
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
    """,
    doc="Point-in-time (time-travel) lookup over the SCD2 dimension "
    "history: each user's status AS OF 2024-01-15, i.e. the one "
    "version whose [valid_from, valid_to) interval covers the probe "
    "instant — the query shape Delta/Iceberg 'TIMESTAMP AS OF' reads "
    "compile to when history is kept as SCD2 rows (this engine's "
    "lakehouse mapping: no transactional format in the environment, "
    "so history IS the table; see ARCHITECTURE.md).  The interval "
    "filter lands directly on the single-shuffle history derivation "
    "— at 100 TB, storing the history partitioned on valid_from "
    "date additionally prunes the scan to segments overlapping the "
    "probe.",
    tags=("window", "timeseries", "scd", "timetravel"),
)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    asof = F.lit("2024-01-15 00:00:00").cast("timestamp")
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    hist = changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )
    return hist.filter(
        (F.col("valid_from") <= asof)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof))
    ).select("user_id", "status", "version", "valid_from")


@register(
    "peak_concurrency_sweepline",
    oracle="""
    WITH intervals AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               min(ts) AS t_start,
               max(ts) AS t_end
        FROM events
        GROUP BY user_id, date_trunc('day', ts)
    ),
    edges AS (
        SELECT day, t_start AS t, 1 AS delta, user_id FROM intervals
        UNION ALL
        SELECT day, t_end AS t, -1 AS delta, user_id FROM intervals
        WHERE t_end > t_start
    ),
    swept AS (
        SELECT day,
               sum(delta) OVER (PARTITION BY day
                                ORDER BY t, delta, user_id
                                ROWS UNBOUNDED PRECEDING) AS active
        FROM edges
    )
    SELECT day,
           CAST(max(active) AS BIGINT) AS peak_concurrent,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM swept
    GROUP BY day
    ORDER BY day
    """,
    doc="Sweep-line interval-overlap aggregation: per user-day activity "
    "interval [first event, last event], exploded to +1/-1 edges, "
    "running-summed in time order to the day's PEAK concurrent users — "
    "the O(n log n) shape for interval overlap (the naive alternative "
    "is an interval self-join, quadratic in overlap mass).  The window "
    "partitions by day, so no global single-partition sort exists at "
    "any scale; ties process ends (-1) before starts (+1), making the "
    "half-open-interval peak deterministic (and order-independent "
    "within equal (t, delta) groups, since a monotone run's max is "
    "reached at its last row regardless of intra-tie order).  "
    "Zero-length intervals (single-event days) contribute a +1 edge "
    "only, counting as active-at-an-instant.",
    tags=("window", "timeseries", "interval"),
)
def peak_concurrency_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    intervals = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
    starts = intervals.select("day", F.col("t_start").alias("t"), F.lit(1).alias("delta"), "user_id")
    ends = intervals.filter(F.col("t_end") > F.col("t_start")).select(
        "day", F.col("t_end").alias("t"), F.lit(-1).alias("delta"), "user_id"
    )
    edges = starts.unionByName(ends)
    w = (
        W.partitionBy("day")
        .orderBy("t", "delta", "user_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = edges.withColumn("active", F.sum("delta").over(w))
    return (
        swept.groupBy("day")
        .agg(
            F.max("active").cast("bigint").alias("peak_concurrent"),
            F.count("*").cast("bigint").alias("n_edges"),
        )
        .orderBy("day")
    )


@register(
    "running_distinct_event_types",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    ),
    running AS (
        SELECT user_id, ts,
               sum(first_seen) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS n_types
        FROM flagged
    )
    SELECT user_id,
           CAST(max(n_types) AS BIGINT) AS n_distinct_types,
           min(CASE WHEN n_types >= 3 THEN ts END) AS ts_reach3
    FROM running
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Running COUNT(DISTINCT) over an ordered window — an operation "
    "neither Spark nor DuckDB supports natively (DISTINCT aggregates "
    "are invalid in window frames) — bridged by the first-touch "
    "decomposition: flag each (user, type)'s first occurrence with "
    "row_number()=1, then running-sum the flags in event order.  Both "
    "window stages key on user_id, so the whole derivation is one "
    "shuffle; emits per user the final distinct-type count and the "
    "instant the user first touched 3 distinct types (the engagement-"
    "milestone query product analytics runs at any scale).",
    tags=("window", "timeseries"),
)
def running_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    running = flagged.select(
        "user_id", "ts", F.sum("first_seen").over(w_run).alias("n_types")
    )
    return (
        running.groupBy("user_id")
        .agg(
            F.max("n_types").cast("bigint").alias("n_distinct_types"),
            F.min(F.when(F.col("n_types") >= 3, F.col("ts"))).alias("ts_reach3"),
        )
        .orderBy("user_id")
    )
