"""RETAIN-semantics feature pipeline (SURVEY.md §2.5, milestone 2).

The reference's per-entity temporal aggregation
(``/root/reference/model.py:131-147``): embed each step, α-softmax
attention over (reverse) time, β tanh gate, context vector
``c_i = Σ_t α_t · (β_t ∘ v_t)``.  Here the whole pipeline is declared
as DataFrame expressions — softmax as a window-normalized aggregate,
the gate as elementwise tanh, the context as a grouped sum — so
Catalyst fuses it into one shuffle on the (entity, task) key.

The tall ``events`` table plays the role of the reference's per-task
tensors: entity=user_id, task=event_type, step=time order, scalar
feature=value (FIXTURES.md §B role mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.scalar import softmax_over


def retain_entity_features(events: DataFrame) -> DataFrame:
    """Per-(entity, task) RETAIN-style features.

    Output: ``(entity_id, task, n_steps, context, recency_value,
    mean_value)`` where ``context`` is the α·tanh(β-gated) aggregation
    of model.py:147 in scalar-feature form and ``recency_value`` is
    the reverse-time decay aggregate (model.py:138 semantics).

    Attention scores are standardized within the entity-task window
    before the softmax — the reference scores steps through learned
    projections of hidden state (model.py:70-75), not raw magnitudes;
    raw values here span ~[0, 330] and would saturate both the softmax
    and the tanh gate to a constant 1.0.
    """
    w = W.partitionBy("user_id", "event_type")
    w_rev = w.orderBy(F.desc("ts"), F.desc("event_id"))
    z = F.coalesce(
        (F.col("value") - F.avg("value").over(w))
        / F.nullif(F.stddev_samp("value").over(w), F.lit(0.0)),
        F.lit(0.0),
    )
    steps_back = F.row_number().over(w_rev) - 1
    decay = F.exp(F.lit(-0.1) * steps_back)
    staged = events.select(
        "user_id",
        "event_type",
        z.alias("z"),
        (decay * F.col("value")).alias("wv"),
        decay.alias("w"),
        F.col("value"),
    )
    alpha = softmax_over(F.col("z"), w)
    # Group on the original column names and alias afterwards: renaming
    # before the groupBy hides the window's hash partitioning from
    # EnsureRequirements and costs an extra (pointless) exchange.
    return (
        staged.select(
            "user_id",
            "event_type",
            (alpha * F.tanh("z")).alias("weighted"),
            "wv",
            "w",
            "value",
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_steps"),
            F.round(F.sum("weighted"), 6).alias("context"),
            F.round(F.sum("wv") / F.sum("w"), 6).alias("recency_value"),
            F.round(F.avg("value"), 6).alias("mean_value"),
        )
        .select(
            F.col("user_id").alias("entity_id"),
            F.col("event_type").alias("task"),
            "n_steps",
            "context",
            "recency_value",
            "mean_value",
        )
    )


