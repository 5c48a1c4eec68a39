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


def asof_lookup_forward(
    df: DataFrame,
    entity_col: str,
    time_cols: tuple[str, ...],
    probe_filter: Column,
    build_filter: Column,
    value_col: str,
    tolerance_seconds: float | None = None,
    out_col: str = "asof_next_value",
) -> DataFrame:
    """Forward as-of: for each probe row, attach the EARLIEST
    build-side ``value_col`` strictly after it in ``(entity_col,
    *time_cols)`` order — optionally only if it arrives within
    ``tolerance_seconds`` (the bounded-staleness contract of a
    forward-fill join).  Same merged-stream discipline as
    :func:`asof_lookup`: ONE shuffle on the entity key, a
    per-partition sort, and ``first(..., ignorenulls=True)`` over the
    FOLLOWING frame — no range-join row explosion.  The carried
    payload is a (time, value) struct so the tolerance check happens
    after the window, still row-local.  Adds ``out_col`` and
    ``out_col + '_ts'`` (both NULL when nothing qualifies)."""
    w = (
        W.partitionBy(entity_col)
        .orderBy(*[F.col(c) for c in time_cols])
        .rowsBetween(1, W.unboundedFollowing)
    )
    merged = df.filter(probe_filter | build_filter)
    nxt = F.first(
        F.when(build_filter, F.struct(*[F.col(c) for c in time_cols], F.col(value_col))),
        ignorenulls=True,
    ).over(w)
    out = merged.withColumn("_nxt", nxt).filter(probe_filter)
    nxt_ts = F.col(f"_nxt.{time_cols[0]}")
    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (
            (F.unix_micros(nxt_ts) - F.unix_micros(F.col(time_cols[0])))
            <= int(tolerance_seconds * 1_000_000)
        )
    )
    return (
        out.withColumn(out_col, F.when(in_tol, F.col(f"_nxt.{value_col}")))
        .withColumn(out_col + "_ts", F.when(in_tol, nxt_ts))
        .drop("_nxt")
    )
