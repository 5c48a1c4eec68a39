"""As-of (point-in-time) lookup — SURVEY.md §2.3 [GAP].

Spark has no native as-of join.  The scalable formulation used here is
the *merged-stream window*: probe and build rows flow through one
window partitioned by the entity key and ordered by event time, and
``last(value, ignorenulls=True)`` over ``ROWS BETWEEN UNBOUNDED
PRECEDING AND 1 PRECEDING`` carries the most recent build-side value
forward.  Cost: ONE shuffle on the entity key and a per-partition
sort — linear, no range-join row explosion, no O(probe×build) pairs.
This is the plan you want at 100 TB; the alternative
(``pd.merge_asof`` per group via applyInPandas) is kept out of the hot
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_lookup(
    df: DataFrame,
    entity_col: str,
    time_cols: tuple[str, ...],
    probe_filter: Column,
    build_filter: Column,
    value_col: str,
    strict: bool = True,
    out_col: str = "asof_value",
) -> DataFrame:
    """For each probe row, attach the latest build-side ``value_col``
    at-or-before (``strict=False``) / strictly-before (``strict=True``)
    its position in ``(entity_col, *time_cols)`` order.
    """
    end = -1 if strict else 0
    w = (
        W.partitionBy(entity_col)
        .orderBy(*[F.col(c) for c in time_cols])
        .rowsBetween(W.unboundedPreceding, end)
    )
    merged = df.filter(probe_filter | build_filter)
    carried = F.last(F.when(build_filter, F.col(value_col)), ignorenulls=True).over(w)
    return merged.withColumn(out_col, carried).filter(probe_filter)
