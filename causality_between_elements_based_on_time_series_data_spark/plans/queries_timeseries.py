"""Time-series / RETAIN-semantics operator surface (SURVEY.md §2.5, §2.8).

The reference's computational core — per-step embedding matmul
(``/root/reference/model.py:131-135``), reverse-time α softmax
attention (``model.py:70-75,138``), β tanh gates (``model.py:77-78``),
attention-weighted context aggregation (``model.py:147``), stable
sigmoid cross-entropy (``model.py:159``), AMTL norms
(``model.py:178-181``), streaming AUC / accuracy (``model.py:157-158``)
— re-expressed over the ``events`` and ``embeddings`` fixtures as
window-normalized aggregates and higher-order array functions.  All
JVM-side; no Python UDF in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..lineage import ckpt

from ..functions.arrays import det_vector, dot_with_const
from ..functions.scalar import sigmoid, sigmoid_cross_entropy, softmax_over
from ..sources.catalog import load_table
from .registry import register, sql_tanh

EMB_DIM = 64
PROJ_VEC = det_vector(EMB_DIM)
_VEC_SQL = "CAST([" + ", ".join(repr(v) for v in PROJ_VEC) + "] AS DOUBLE[])"
# Shared projection expression: the reference's fixed embedding matmul
# (model.py:132) against a deterministic constant vector, identical
# literal on the Spark and DuckDB sides.
_PROJ_SQL = f"list_dot_product(CAST(embedding AS DOUBLE[]), {_VEC_SQL})"


@register(
    "tumbling_hourly_rollup",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts)  AS hour_start,
           count(*)                AS n,
           round(sum(value), 4)    AS total_value,
           round(avg(value), 4)    AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour time-bucket rollup — the batch form of the "
    "streaming windowed agg (same result as the streaming skin).",
    tags=("timeseries", "agg", "bench"),
)
def tumbling_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@register(
    "alpha_softmax_weights",
    oracle="""
    WITH m AS (
        SELECT user_id, event_id, value,
               max(value) OVER (PARTITION BY user_id) AS mx
        FROM events
    )
    SELECT user_id, event_id,
           round(exp(value - mx)
                 / sum(exp(value - mx)) OVER (PARTITION BY user_id), 6) AS alpha
    FROM m
    """,
    doc="α-attention (model.py:70-75): softmax over each entity's "
    "sequence as a window-normalized aggregate, max-shifted for "
    "stability. Property: Σα = 1 per entity.",
    tags=("timeseries", "window", "retain"),
)
def alpha_softmax_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(softmax_over(F.col("value"), w), 6).alias("alpha"),
    )


@register(
    "attention_context_vector",
    oracle=f"""
    WITH m AS (
        SELECT user_id, value,
               max(value) OVER (PARTITION BY user_id) AS mx
        FROM events
    ),
    a AS (
        SELECT user_id, value,
               exp(value - mx)
               / sum(exp(value - mx)) OVER (PARTITION BY user_id) AS alpha
        FROM m
    )
    SELECT user_id,
           round(sum(alpha * {sql_tanh('value')}), 6) AS context,
           count(*) AS steps
    FROM a
    GROUP BY user_id
    """,
    doc="RETAIN context vector c_i = Σ_t α_t·(β_t ∘ v_t) "
    "(model.py:147) in scalar-feature form: α = softmax over the "
    "entity window, β = tanh gate (model.py:77-78). One shuffle on "
    "the entity key serves window + final agg.",
    tags=("timeseries", "retain", "bench"),
)
def attention_context_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    alpha = softmax_over(F.col("value"), w)
    return (
        ev.select("user_id", (alpha * F.tanh("value")).alias("weighted"))
        .groupBy("user_id")
        .agg(F.round(F.sum("weighted"), 6).alias("context"), F.count("*").alias("steps"))
    )


@register(
    "reverse_time_decay",
    oracle="""
    WITH r AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) - 1 AS steps_back
        FROM events
    )
    SELECT user_id,
           round(sum(exp(-0.1 * steps_back) * value)
                 / sum(exp(-0.1 * steps_back)), 6) AS recency_value
    FROM r
    GROUP BY user_id
    """,
    doc="Reverse-time recency weighting — the Spark form of RETAIN's "
    "tf.reverse over the time axis (model.py:138): window sorted "
    "DESC gives steps-from-present, exponential decay weights.",
    tags=("timeseries", "retain"),
)
def reverse_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    decay = F.exp(F.lit(-0.1) * (F.row_number().over(w) - 1))
    return (
        ev.select("user_id", (decay * F.col("value")).alias("wv"), decay.alias("w"))
        .groupBy("user_id")
        .agg(F.round(F.sum("wv") / F.sum("w"), 6).alias("recency_value"))
    )


@register(
    "tensorize_order_checksum",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS step
        FROM events
    )
    SELECT user_id,
           CAST(max(step) AS BIGINT)        AS n_steps,
           round(sum(step * value), 6)      AS order_checksum
    FROM s
    GROUP BY user_id
    """,
    doc="Tensorization correctness probe: step indices assigned by "
    "(ts, id) window ordering, checked via the order-sensitive "
    "Σ step·value checksum — validates the collect_list tensorizer "
    "(SURVEY §1.2) without hashing arrays.",
    tags=("timeseries", "tensorize"),
)
def tensorize_order_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "value", F.row_number().over(w).alias("step"))
        .groupBy("user_id")
        .agg(
            F.max("step").cast("bigint").alias("n_steps"),
            F.round(F.sum(F.col("step") * F.col("value")), 6).alias("order_checksum"),
        )
    )


@register(
    "embedding_projection",
    oracle=f"""
    SELECT vec_id, round({_PROJ_SQL}, 6) AS proj
    FROM embeddings
    """,
    doc="Per-row embedding·V matmul (model.py:132) as zip_with + "
    "aggregate higher-order functions — stays in whole-stage codegen, "
    "no UDF, map-side only.",
    tags=("timeseries", "retain", "embedding"),
)
def embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(dot_with_const(F.col("embedding"), PROJ_VEC), 6).alias("proj")
    )


@register(
    "sigmoid_ce_by_label",
    oracle=f"""
    WITH scored AS (
        SELECT label, {_PROJ_SQL} AS z FROM embeddings
    )
    SELECT label,
           round(avg(greatest(z, 0) - z * label + ln(1 + exp(-abs(z)))), 6) AS mean_ce,
           round(avg(1.0 / (1.0 + exp(-z))), 6)                             AS mean_sigmoid,
           count(*)                                                          AS n
    FROM scored
    GROUP BY label
    """,
    doc="Numerically-stable sigmoid cross-entropy with logits "
    "(model.py:159, TF-documented form max(z,0) − z·y + log1p(e^−|z|)) "
    "+ mean sigmoid score, grouped by label.",
    tags=("timeseries", "retain", "loss"),
)
def sigmoid_ce_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    z = dot_with_const(F.col("embedding"), PROJ_VEC)
    scored = emb.select("label", z.alias("z"))
    return scored.groupBy("label").agg(
        F.round(F.avg(sigmoid_cross_entropy(F.col("z"), F.col("label").cast("double"))), 6).alias(
            "mean_ce"
        ),
        F.round(F.avg(sigmoid(F.col("z"))), 6).alias("mean_sigmoid"),
        F.count("*").alias("n"),
    )


@register(
    "task_norms_and_scaling",
    oracle="""
    SELECT event_type AS task,
           round(sum(abs(value)), 4)           AS l1_norm,
           round(sqrt(sum(value * value)), 6)  AS l2_norm,
           round(1.0 / sqrt(count(*)), 6)      AS inv_sqrt_n,
           count(*)                            AS n
    FROM events
    GROUP BY event_type
    """,
    doc="AMTL regularizer building blocks per task: L1 norm "
    "(model.py:178), L2 norm (model.py:180), 1/√n sample scaling "
    "(model.py:178) — distributed grouped aggregates.",
    tags=("timeseries", "amtl"),
)
def task_norms_and_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("task")).agg(
        F.round(F.sum(F.abs("value")), 4).alias("l1_norm"),
        F.round(F.sqrt(F.sum(F.col("value") * F.col("value"))), 6).alias("l2_norm"),
        F.round(F.lit(1.0) / F.sqrt(F.count("*")), 6).alias("inv_sqrt_n"),
        F.count("*").alias("n"),
    )


@register(
    "auc_mann_whitney",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id, label, {_PROJ_SQL} AS score FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    ranked AS (
        SELECT label,
               CAST(row_number() OVER (ORDER BY score, vec_id) AS DOUBLE) AS r
        FROM scored
    )
    SELECT round(
             (sum(CASE WHEN label = 1 THEN r ELSE 0 END)
              - sum(CASE WHEN label = 1 THEN 1.0 ELSE 0 END)
                * (sum(CASE WHEN label = 1 THEN 1.0 ELSE 0 END) + 1) / 2)
             / (sum(CASE WHEN label = 1 THEN 1.0 ELSE 0 END)
                * sum(CASE WHEN label = 0 THEN 1.0 ELSE 0 END)), 6) AS auc
    FROM ranked
    """,
    doc="AUC (model.py:157) via the rank-based Mann-Whitney identity — "
    "exact, not trapezoid-approximated, and SQL-checkable.  The "
    "global rank is computed with the bucket+offset device "
    "(operators/ranks.py): score-range buckets + per-bucket "
    "distributed windows + broadcast prefix offsets — bit-identical "
    "to the oracle's literal row_number() and never a corpus-sized "
    "single-partition sort.",
    tags=("timeseries", "metric"),
)
def auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import with_global_rank, with_range_bucket

    emb = load_table(spark, sf_dir, "embeddings").filter(
        # mirrored in the oracle: a NULL score would get a NULL bucket
        # and silently drop from the device's offset join
        F.col("embedding").isNotNull()
    )
    score = dot_with_const(F.col("embedding"), PROJ_VEC)
    scored = emb.select(
        "label", "vec_id", score.alias("score")
    ).transform(ckpt)
    bucketed = with_range_bucket(scored, "score")
    ranked = with_global_rank(
        bucketed, [F.col("score"), F.col("vec_id")], out="rn",
        pre_shuffle=True,
    ).select("label", F.col("rn").cast("double").alias("r"))
    pos = F.sum(F.when(F.col("label") == 1, 1.0).otherwise(0.0))
    neg = F.sum(F.when(F.col("label") == 0, 1.0).otherwise(0.0))
    sum_r_pos = F.sum(F.when(F.col("label") == 1, F.col("r")).otherwise(0.0))
    return ranked.agg(
        F.round((sum_r_pos - pos * (pos + 1) / 2) / (pos * neg), 6).alias("auc")
    )


@register(
    "accuracy_at_threshold",
    oracle=f"""
    WITH scored AS (
        SELECT label, 1.0 / (1.0 + exp(-{_PROJ_SQL})) AS p FROM embeddings
    )
    SELECT round(100.0 * avg(CAST((p >= 0.5) = (label = 1) AS DOUBLE)), 4) AS accuracy_pct,
           count(*) AS n
    FROM scored
    """,
    doc="Thresholded accuracy ×100 (model.py:158): preds≥0.5 vs bool "
    "labels, as a single global aggregate.",
    tags=("timeseries", "metric"),
)
def accuracy_at_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    p = sigmoid(dot_with_const(F.col("embedding"), PROJ_VEC))
    return emb.select(
        ((p >= 0.5) == (F.col("label") == 1)).cast("double").alias("hit")
    ).agg(
        F.round(100.0 * F.avg("hit"), 4).alias("accuracy_pct"),
        F.count("*").alias("n"),
    )


@register(
    "asof_last_click_before_purchase",
    oracle="""
    SELECT p.user_id, p.event_id,
           round(p.value, 4) AS purchase_value,
           round((SELECT c.value FROM events c
                  WHERE c.user_id = p.user_id AND c.event_type = 'click'
                    AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
                  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), 4) AS last_click_value
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="As-of join (SURVEY §2.3 [GAP]): for each purchase, the most "
    "recent prior click by the same user. Implemented shuffle-once as "
    "a last(ignoreNulls) window over the merged stream — no range-join "
    "explosion, scales linearly in events per user.",
    tags=("timeseries", "asof", "join", "bench"),
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_lookup

    ev = load_table(spark, sf_dir, "events")
    return asof_lookup(
        ev,
        entity_col="user_id",
        time_cols=("ts", "event_id"),
        probe_filter=F.col("event_type") == "purchase",
        build_filter=F.col("event_type") == "click",
        value_col="value",
    ).select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("purchase_value"),
        F.round("asof_value", 4).alias("last_click_value"),
    )


@register(
    "asof_next_click_within_15min",
    oracle="""
    SELECT p.user_id, p.event_id,
           round(p.value, 4) AS purchase_value,
           round((SELECT c.value FROM events c
                  WHERE c.user_id = p.user_id AND c.event_type = 'click'
                    AND (c.ts > p.ts OR (c.ts = p.ts AND c.event_id > p.event_id))
                    AND c.ts <= p.ts + INTERVAL 15 MINUTE
                  ORDER BY c.ts, c.event_id LIMIT 1), 4) AS next_click_value
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="FORWARD as-of with tolerance (the bounded-staleness twin of "
    "asof_last_click_before_purchase): for each purchase, the "
    "earliest later click by the same user, but only if it lands "
    "within 15 minutes — purchases with no prompt follow-up click "
    "keep NULL.  Same merged-stream discipline: first(ignoreNulls) "
    "over the FOLLOWING frame carries a (ts, value) struct so the "
    "tolerance check stays row-local after the single entity-keyed "
    "shuffle; no range-join explosion.",
    tags=("timeseries", "asof", "join"),
)
def asof_next_click_within_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_lookup_forward

    ev = load_table(spark, sf_dir, "events")
    return asof_lookup_forward(
        ev,
        entity_col="user_id",
        time_cols=("ts", "event_id"),
        probe_filter=F.col("event_type") == "purchase",
        build_filter=F.col("event_type") == "click",
        value_col="value",
        tolerance_seconds=15 * 60,
    ).select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("purchase_value"),
        F.round("asof_next_value", 4).alias("next_click_value"),
    )


@register(
    "range_join_clicks_before_purchase",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, ts, user_id, value
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id AS purchase_id, ts, user_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT purchase_id,
           count(*) AS n_clicks,
           round(sum(c.value), 4) AS click_value
    FROM p JOIN c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts < p.ts
    GROUP BY purchase_id
    """,
    doc="Range (interval) join — SURVEY §2.3 custom-join family: all "
    "clicks in the 30 minutes before each purchase by the same user. "
    "Bucketized to a pure equi-join on (user_id, time-bucket) with a "
    "≤2× probe fan-out (operators/rangejoin.py) — no nested-loop / "
    "cartesian plan anywhere (asserted in tests/test_plans.py), so the "
    "join hash-partitions and survives 100 TB where the naive "
    "range-predicate join cannot.",
    tags=("timeseries", "join", "range"),
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts", "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts", "user_id"
    )
    joined = range_join(
        clicks,
        purchases,
        anchor_ts="ts",
        probe_ts="ts",
        before_s=1800,
        after_s=0,
        keys=("user_id",),
        include_upper=False,
    )
    return joined.groupBy("purchase_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(F.sum("value"), 4).alias("click_value"),
    )


@register(
    "resample_ffill_hourly",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, max_by(value, event_id) AS value
        FROM events GROUP BY user_id, ts
    ),
    bounds AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS g
        FROM bounds
    )
    SELECT g.user_id,
           CAST(epoch_us(g.g) AS BIGINT) AS grid_us,
           round(e.value, 4) AS value
    FROM grid g ASOF LEFT JOIN ev e
      ON g.user_id = e.user_id AND e.ts <= g.g
    """,
    doc="Time-series resampling to a regular hourly grid with forward "
    "fill (each grid instant carries the latest observation ≤ it; ts "
    "ties resolved by max event_id).  Spark side is the merged-stream "
    "idiom: union grid points into the event stream, one "
    "last(ignoreNulls) window over (user, ts, is_grid, event_id) — "
    "two user_id exchanges total (per-user bounds agg + the window "
    "over the union; plan-gated), no range join, linear in "
    "events+grid.  Oracle is DuckDB's native ASOF LEFT JOIN against "
    "the same grid.",
    tags=("timeseries", "window", "resample"),
)
def resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    events = ev.select(
        "user_id", "ts", "value", F.lit(0).alias("is_grid"), "event_id"
    )
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("t0"),
            F.max("ts").alias("t1"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
        )
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    merged = events.unionByName(grid)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_grid", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("fv", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("grid_us"),
            F.round("fv", 4).alias("value"),
        )
    )


@register(
    "resample_interp_hourly",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, max_by(value, event_id) AS value
        FROM events GROUP BY user_id, ts
    ),
    ev2 AS (
        SELECT user_id, ts, value,
               lead(ts)    OVER w AS nts,
               lead(value) OVER w AS nv
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    bounds AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS g
        FROM bounds
    )
    SELECT g.user_id,
           CAST(epoch_us(g.g) AS BIGINT) AS grid_us,
           round(CASE
                   WHEN e.nts IS NULL THEN e.value
                   WHEN e.nts = e.ts THEN e.value
                   ELSE e.value + (e.nv - e.value)
                        * (CAST(epoch_us(g.g) - epoch_us(e.ts) AS DOUBLE)
                           / CAST(epoch_us(e.nts) - epoch_us(e.ts) AS DOUBLE))
                 END, 4) AS value
    FROM grid g ASOF LEFT JOIN ev2 e
      ON g.user_id = e.user_id AND e.ts <= g.g
    """,
    doc="Hourly resampling with LINEAR INTERPOLATION between the "
    "surrounding observations (forward fill past the last one): each "
    "event carries its lead() successor, the merged-stream window "
    "attaches the whole (prev, next) segment to every grid instant in "
    "one last(ignoreNulls) pass over a struct — same two user_id "
    "exchanges as resample_ffill_hourly, no range join.  Oracle: "
    "DuckDB lead() + ASOF LEFT JOIN with the identical interpolation "
    "arithmetic.",
    tags=("timeseries", "window", "resample"),
)
def resample_interp_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    # dedupe ts ties (max event_id wins) to make segments well-defined
    ev1 = ev.groupBy("user_id", "ts").agg(
        F.expr("max_by(value, event_id)").alias("value")
    )
    wl = W.partitionBy("user_id").orderBy("ts")
    ev2 = ev1.select(
        "user_id",
        "ts",
        F.struct(
            F.col("ts").alias("pts"),
            F.col("value").alias("pv"),
            F.lead("ts").over(wl).alias("nts"),
            F.lead("value").over(wl).alias("nv"),
        ).alias("seg"),
        F.lit(0).alias("is_grid"),
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("t0"), F.max("ts").alias("t1"))
        .select(
            "user_id",
            F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
        )
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("struct<pts:timestamp,pv:double,nts:timestamp,nv:double>").alias("seg"),
            F.lit(1).alias("is_grid"),
        )
    )
    merged = ev2.unionByName(grid)
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    g_us = F.unix_micros("ts")
    p_us = F.unix_micros(F.col("s.pts"))
    n_us = F.unix_micros(F.col("s.nts"))
    interp = (
        F.when(F.col("s.nts").isNull(), F.col("s.pv"))
        .when(F.col("s.nts") == F.col("s.pts"), F.col("s.pv"))
        .otherwise(
            F.col("s.pv")
            + (F.col("s.nv") - F.col("s.pv"))
            * ((g_us - p_us).cast("double") / (n_us - p_us).cast("double"))
        )
    )
    return (
        merged.withColumn("s", F.last("seg", ignorenulls=True).over(wf))
        .filter(F.col("is_grid") == 1)
        .select("user_id", g_us.alias("grid_us"), F.round(interp, 4).alias("value"))
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(props->>'$.k' AS DOUBLE)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured JSON column surface (SURVEY §2.8 [GAP] json "
    "row): get_json_object extraction + typed aggregate over "
    "events.props.",
    tags=("timeseries", "json"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"), F.count("*").alias("n")
    )


@register(
    "session_window_rollup",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
           count(*) AS n_events,
           round(sum(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, sid
    """,
    doc="Native session_window aggregation (30-min gap) — Spark's "
    "built-in session assignment; oracle is the equivalent lag+cumsum "
    "sessionization (new session at gap ≥ 30 min, matching "
    "session_window's exclusive end).",
    tags=("timeseries", "window", "streaming"),
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
            "session_value",
        )
    )


@register(
    "map_function_surface",
    oracle="""
    WITH m AS (
        SELECT event_type,
               value                              AS v_value,
               CAST(props->>'$.k' AS DOUBLE)      AS v_k,
               CAST(hour(ts) AS DOUBLE)           AS v_hour
        FROM events
    )
    SELECT event_type,
           CAST(sum((CASE WHEN v_value > 50 THEN 1 ELSE 0 END)
                  + (CASE WHEN v_k     > 50 THEN 1 ELSE 0 END)
                  + (CASE WHEN v_hour  > 50 THEN 1 ELSE 0 END)) AS BIGINT)
               AS entries_gt_50,
           round(sum(2 * (v_value + v_k + v_hour)), 4) AS doubled_total,
           max('hour,k,value') AS keys_csv,
           round(avg(v_k), 4)  AS avg_k,
           count(*)            AS n
    FROM m
    GROUP BY event_type
    """,
    doc="Map-typed column surface (SURVEY §2.8 [GAP] map row): "
    "create_map from event columns, then map_filter (entries > 50), "
    "transform_values (double each entry) + map_values/aggregate, "
    "map_keys, element_at — all codegen'd higher-order map "
    "expressions.  The oracle recomputes the same aggregates from the "
    "base columns (DuckDB's MAP dialect differs; the map here is "
    "constructed, so the scalar algebra is the checkable part).",
    tags=("timeseries", "map"),
)
def map_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    m = F.create_map(
        F.lit("value"), F.col("value"),
        F.lit("k"), k,
        F.lit("hour"), F.hour("ts").cast("double"),
    )
    per_event = ev.select(
        "event_type",
        F.size(F.map_filter(m, lambda _, v: v > 50)).alias("n_gt_50"),
        F.aggregate(
            F.map_values(F.transform_values(m, lambda _, v: v * 2.0)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("doubled_sum"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("key_csv"),
        F.element_at(m, F.lit("k")).alias("k_val"),
    )
    return per_event.groupBy("event_type").agg(
        F.sum("n_gt_50").cast("bigint").alias("entries_gt_50"),
        F.round(F.sum("doubled_sum"), 4).alias("doubled_total"),
        F.max("key_csv").alias("keys_csv"),
        F.round(F.avg("k_val"), 4).alias("avg_k"),
        F.count("*").alias("n"),
    )


@register(
    "array_function_surface",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                         AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)                  AS e0,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS emax,
           round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS emin,
           round(list_sum(list_transform(embedding[1:8],
                                         x -> CAST(x AS DOUBLE))), 6)  AS head_sum
    FROM embeddings
    """,
    doc="Array/higher-order function surface (SURVEY §2.8 reshape/"
    "concat row analog): size, element_at, array_max/min, slice + "
    "aggregate — all codegen'd column expressions over ARRAY<FLOAT>.",
    tags=("timeseries", "array"),
)
def array_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 8)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("e0"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("emax"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("emin"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda a, x: a + x.cast("double")), 6
        ).alias("head_sum"),
    )


@register(
    "from_json_typed_struct",
    oracle="""
    SELECT event_type,
           CAST(max(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS max_k,
           CAST(sum(CASE WHEN CAST(props->>'$.k' AS INTEGER) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_k_gt_50,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Typed JSON parsing: from_json into a declared struct schema "
    "(vs the stringly get_json_object path) + predicate on the typed "
    "field.",
    tags=("timeseries", "json"),
)
def from_json_typed_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_k_gt_50"),
            F.count("*").alias("n"),
        )
    )


@register(
    "variant_props_surface",
    oracle="""
    SELECT event_type,
           CAST(max(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS max_k,
           round(avg(CAST(props->>'$.k' AS DOUBLE)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT semi-structured surface: parse_json into an "
    "open VARIANT column, typed path extraction via try_variant_get — "
    "the engine's third JSON access path (stringly get_json_object, "
    "declared-schema from_json, schema-on-read VARIANT).  VARIANT "
    "keeps the binary-encoded document columnar, so repeated path "
    "reads skip re-parsing — the right default for heterogeneous "
    "props at 100 TB.",
    tags=("timeseries", "json", "variant"),
)
def variant_props_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.max("k").alias("max_k"),
            F.round(F.avg(F.col("k").cast("double")), 4).alias("avg_k"),
            F.count("*").alias("n"),
        )
    )


@register(
    "batch_sample_without_replacement",
    oracle=None,  # seeded rand() is engine-specific — rows-only check;
    # MATCH twin for the reproducible route: stratified_sample_deterministic
    # (Knuth-hash selection); per-task size/uniqueness pinned in
    # tests/test_operators.py
    doc="Seeded per-task sampling without replacement (model.py:191): "
    "rand(seed) + row_number ≤ batch_size per task partition. "
    "Deterministic for a fixed seed and partitioning within Spark, but "
    "not reproducible in another engine — rows-only check.",
    tags=("timeseries", "sampling"),
)
def batch_sample_without_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    batch_size = 32
    w = W.partitionBy("event_type").orderBy(F.rand(42), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= batch_size)
        .select("event_type", "event_id", "user_id", "value")
    )


@register(
    "dropout_mask",
    oracle=None,  # seeded rand() is engine-specific — rows-only check;
    # keep-rate/mean-preservation distribution pytest in
    # tests/test_operators.py
    doc="Inverted-dropout Bernoulli mask (model.py:115,204,207): "
    "when(rand(seed) < keep_prob, x/keep_prob).otherwise(0) — the "
    "train/eval switch is just keep_prob=1.",
    tags=("timeseries", "sampling"),
)
def dropout_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keep_prob = 0.5
    masked = F.when(F.rand(7) < keep_prob, F.col("value") / keep_prob).otherwise(F.lit(0.0))
    return ev.select("event_id", "user_id", masked.alias("dropped_value"))


@register(
    "ewma_daily_series",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               round(sum(value), 6) AS v
        FROM events GROUP BY 1, 2
    ),
    framed AS (
        SELECT event_type, day,
               list(v) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
                   AS trail
        FROM daily
    )
    SELECT event_type, day,
           round(list_reduce(trail::DOUBLE[],
                             (acc, x) -> acc * 0.75 + x * 0.25), 6) AS ewma
    FROM framed
    ORDER BY event_type, day
    """,
    doc="Exponentially-weighted moving average per series, truncated "
    "to a trailing 60-point frame (the tail beyond 60 points "
    "contributes < 0.75^60 ~ 3e-8 of the weight): the recurrence "
    "acc = 0.75*acc + 0.25*x folds LEFT over the ordered frame with "
    "the oldest value as seed, expressed entirely with higher-order "
    "array functions (collect_list over the frame + aggregate) — "
    "whole-stage codegen, ONE series-keyed shuffle, no Python, and "
    "per-row work bounded by the fixed frame length, so the plan is "
    "identical at 100 TB.  Both engines fold doubles in the same "
    "order, so the arithmetic is bit-reproducible; DuckDB's "
    "list_reduce has the same first-element-seed left-fold semantics.",
    tags=("timeseries", "window", "ewma"),
)
def ewma_daily_series(spark: SparkSession, sf_dir: str, alpha: float = 0.25) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("v")
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-59, 0)
    framed = daily.withColumn("trail", F.collect_list("v").over(w))
    keep = 1.0 - alpha
    ewma = F.aggregate(
        F.slice(F.col("trail"), 2, F.size("trail") - 1),
        F.element_at(F.col("trail"), 1),
        lambda acc, x: acc * F.lit(keep) + x * F.lit(alpha),
    )
    return framed.select(
        "event_type", "day", F.round(ewma, 6).alias("ewma")
    ).orderBy("event_type", "day")


@register(
    "rolling_zscore_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               round(sum(value), 6) AS v
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, day, v,
               avg(v) OVER w AS mu,
               stddev_samp(v) OVER w AS sigma,
               count(*) OVER w AS n_window
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, v,
           round((v - mu) / sigma, 4) AS zscore
    FROM scored
    WHERE n_window >= 10 AND sigma > 0 AND abs((v - mu) / sigma) > 2.0
    ORDER BY event_type, day
    """,
    doc="Rolling z-score anomaly detection: each day's series value "
    "is scored against the mean/stddev of the PRECEDING 30 days "
    "(frame excludes the current row, so an outlier cannot mask "
    "itself), flagging |z| > 2 once 10 days of history exist.  One "
    "series-keyed shuffle serves all three window aggregates; the "
    "daily pre-aggregate makes the window input |days| x |series| "
    "regardless of raw event volume.",
    tags=("timeseries", "window", "anomaly"),
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("v")
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-30, -1)
    scored = daily.select(
        "event_type",
        "day",
        "v",
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_window"),
    )
    z = (F.col("v") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(
            (F.col("n_window") >= 10) & (F.col("sigma") > 0) & (F.abs(z) > 2.0)
        )
        .select("event_type", "day", "v", F.round(z, 4).alias("zscore"))
        .orderBy("event_type", "day")
    )


@register(
    "ohlc_daily_bars",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           round(arg_min(value, ts), 4)  AS open,
           round(max(value), 4)          AS high,
           round(min(value), 4)          AS low,
           round(arg_max(value, ts), 4)  AS close,
           count(*) AS n_ticks
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
    doc="OHLC bar downsampling (open/high/low/close per series per "
    "day): open/close are argmin/argmax of value over ts — Spark "
    "min_by/max_by and DuckDB arg_min/arg_max, both single-pass "
    "partial-aggregable, so 100 TB of ticks reduce map-side before "
    "one day+series-keyed shuffle.  NOTE: fixture timestamps are "
    "unique per (event_type, day) stream here, so the argmin/argmax "
    "tie behavior is not exercised — with tied timestamps the picked "
    "row is engine-dependent.",
    tags=("timeseries", "agg", "resample"),
)
def ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    return (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "ts"), 4).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .orderBy("event_type", "day")
    )
