"""Long-format → tensor materialization (SURVEY.md §1.2).

The reference consumes dense ``[N, steps, features]`` tensors
(``/root/reference/model.py:45``).  The engine's canonical layout is
the tall DataFrame ``(entity_id, task, step, features)``; this module
materializes per-entity sequence arrays on demand with
``array_sort(collect_list(struct(step, payload)))`` — step order is
encoded *inside* the collected struct, so the result is deterministic
regardless of partition arrival order (SURVEY §7 hard-part 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tensorize(
    df: DataFrame,
    entity_col: str = "entity_id",
    task_col: str = "task",
    step_col: str = "step",
    value_cols: tuple[str, ...] = ("features",),
) -> DataFrame:
    """Group the tall table into one row per (entity, task) carrying a
    step-ordered sequence array per value column.

    One shuffle on (entity, task); arrays are sorted by the embedded
    step key after collection, not by a window pre-sort, so no extra
    exchange is needed.
    """
    aggs = []
    for vc in value_cols:
        seq = F.array_sort(F.collect_list(F.struct(F.col(step_col).alias("s"), F.col(vc).alias("v"))))
        aggs.append(F.transform(seq, lambda x: x["v"]).alias(f"{vc}_seq"))
    aggs.append(F.count("*").alias("n_steps"))
    return df.groupBy(entity_col, task_col).agg(*aggs)


def steps_from_timestamps(
    df: DataFrame, entity_col: str, task_col: str, ts_col: str, tiebreak_col: str
) -> DataFrame:
    """Assign dense integer step indices per (entity, task) from event
    time — the engine's replacement for the reference's implicit
    year-index steps (run.py:18)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(entity_col, task_col).orderBy(ts_col, tiebreak_col)
    return df.withColumn("step", F.row_number().over(w) - 1)
