"""Upsert / MERGE-INTO emulation (SURVEY §2 engine extension; pyspark
guide "CDC / SCD2" row).

Without a transactional table format (Delta/Iceberg jars are not in
this image) MERGE decomposes into the classic anti-join + union:

    merged = updates ∪ (target ⟕anti updates on key)

Both sides shuffle once on the key (or zero times if the target is
bucketed on it); the result is written back partition-wise.  SCD2
keeps history instead of replacing: close the old row (valid_to) and
append the new one (current flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lineage import ckpt


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: rows from ``updates`` win on key collision,
    unmatched target rows pass through.

    ``updates`` feeds BOTH union legs (payload + anti-join key set), so
    its lineage is cut — a CDC batch is bounded by contract, and
    without the cut Spark re-derives the update subtree twice (the
    registry scan survey showed the demo query re-scanning the source
    table for each leg; a real merge would re-run the CDC extraction)."""
    updates = ckpt(updates)
    return updates.unionByName(target.join(updates.select(key), key, "left_anti"))


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: demote matched current rows,
    append updates as the new current version."""
    upd_keys = updates.select(key)
    demoted = target.join(F.broadcast(upd_keys), key, "left_semi").withColumn(
        current_col, F.lit(False)
    )
    untouched = target.join(upd_keys, key, "left_anti")
    # next version stays in-plan: a 1-row aggregate broadcast-crossJoined
    # onto the updates (no mid-plan driver action / extra job)
    max_v = F.coalesce(F.max(version_col), F.lit(0))
    next_v = target.agg((max_v + 1).alias("__next_version"))
    fresh = (
        updates.crossJoin(F.broadcast(next_v))
        .withColumn(version_col, F.col("__next_version"))
        .drop("__next_version")
        .withColumn(current_col, F.lit(True))
    )
    return untouched.unionByName(demoted).unionByName(fresh)
