"""Skew-resilient aggregation (SURVEY.md §4.2 / 100 TB design).

Low-cardinality or hot grouping keys (the reference's 3-disease task
column is the extreme case) funnel entire datasets into a handful of
reducers.  ``salted_agg`` runs the classic two-phase plan explicitly:

  phase 1: group by (key, salt) — N_SALT-way fan-out, partial results
  phase 2: group by key         — combines N_SALT tiny rows per key

AQE's skew handling covers *joins*; for aggregations over hot keys
this explicit salt is still the reliable pattern.  Only aggregates
with a partial/merge decomposition are supported (sum/count/min/max —
avg decomposes to sum+count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column] | None = None,
    count_alias: str | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase (salted) grouped aggregation.

    ``sums`` maps output alias -> expression to SUM; ``count_alias``
    names a COUNT(*) output. Result is identical to the direct
    groupBy — the salt only reshapes the shuffle.
    """
    sums = sums or {}
    salted = df.withColumn("__salt", (F.rand(0) * n_salt).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(expr).alias(f"__s_{alias}") for alias, expr in sums.items()],
        F.count("*").alias("__s_cnt"),
    )
    aggs = [F.sum(f"__s_{alias}").alias(alias) for alias in sums]
    if count_alias:
        aggs.append(F.sum("__s_cnt").alias(count_alias))
    return phase1.groupBy(*keys).agg(*aggs)
