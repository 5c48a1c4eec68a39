"""Bucketized range (interval) join — SURVEY.md §2.3 custom-join
family, alongside the as-of join (``operators/asof.py``).

Semantics: pair every probe row with the anchor rows whose timestamp
falls in ``[probe.ts − before, probe.ts + after]`` (optionally also
matching on equi-keys).  The naive plan for a time-range predicate is
a BroadcastNestedLoopJoin / CartesianProduct — O(n·m) and a
100 TB-killer.  The bucketized form restores an equi-join:

- bucket width w = before + after, so an anchor's single bucket
  ``floor(ts/w)`` is enough on one side;
- the probe emits every bucket its interval overlaps (at most 2 for
  w sized to the interval) via ``sequence()`` + ``explode`` —
  a ≤2× fan-out of the *probe* side only;
- join on (keys…, bucket) — hash-partitionable, AQE-skew-handled —
  then apply the exact range predicate as a post-filter.

Each (anchor, probe) pair appears exactly once because the anchor
contributes one bucket.  Plan shape (asserted in tests/test_plans.py):
a single equi-Exchange pair, no nested-loop join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    anchors: DataFrame,
    probes: DataFrame,
    anchor_ts: str,
    probe_ts: str,
    before_s: int,
    after_s: int,
    keys: tuple[str, ...] = (),
    include_upper: bool = True,
) -> DataFrame:
    """Join anchor rows to probe rows with
    ``anchor.ts ∈ [probe.ts − before_s, probe.ts + after_s]``
    (upper bound exclusive when ``include_upper=False``), plus
    equi-``keys``.  Columns of both inputs are kept (probe columns
    prefixed ``probe_`` on collision).
    """
    w = max(before_s + after_s, 1) * 1_000_000  # bucket width in µs
    a_us = F.unix_micros(F.col(anchor_ts))

    overlap = [c for c in probes.columns if c in set(anchors.columns)]
    p = probes.select(
        *[F.col(c).alias(f"probe_{c}" if c in overlap else c) for c in probes.columns]
    )
    key_pairs = [(k, f"probe_{k}" if k in overlap else k) for k in keys]
    p_us = F.unix_micros(F.col(f"probe_{probe_ts}" if probe_ts in overlap else probe_ts))

    a = anchors.withColumn("__bucket", F.floor(a_us / w))
    lo = p_us - before_s * 1_000_000
    hi = p_us + after_s * 1_000_000
    p = p.withColumn(
        "__bucket", F.explode(F.sequence(F.floor(lo / w), F.floor(hi / w)))
    )

    cond = a["__bucket"] == p["__bucket"]
    for ak, pk in key_pairs:
        cond = cond & (a[ak] == p[pk])
    exact = (a_us >= lo) & ((a_us <= hi) if include_upper else (a_us < hi))
    return a.join(p, cond & exact).drop("__bucket")
