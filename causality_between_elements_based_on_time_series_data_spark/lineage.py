"""Switchable lineage cuts — every ``localCheckpoint`` in this repo
routes through here.

Why cuts exist (the derive-once rule, `ARCHITECTURE.md` round-9
section): Spark re-derives a DataFrame's full lineage once per
consumer, so a derived relation feeding >= 2 downstream branches (a
calendar grid, a posting list, a pair table broadcast several times)
re-scans the fact tables N times unless its lineage is cut with
``localCheckpoint``.

Why cuts must be SWITCHABLE (round-9 advice, medium): ``explain()`` of
a checkpointed DataFrame shows NOTHING below the checkpoint —
empirically, a plan containing an unpartitioned Window explains as
zero Window nodes once a cut sits above it.  The registry-wide
plan-antipattern sweep (`tests/test_plans.py`) and
`tools/window_audit.py` would therefore silently miss any one-task
sort, cartesian product, or row-at-a-time Python eval introduced
beneath a cut.  Audit tooling disables the cuts (context manager or
env var) and explains the full pre-checkpoint plan; production code
paths keep them.

Call sites use DataFrame.transform so the cut stays postfix-chainable::

    grid = facts.groupBy("day").agg(...).transform(ckpt)       # lazy
    beta = beta.transform(ckpt_eager)   # iterative loops: materialize

``ckpt_eager`` sites are iterative-algorithm cuts (IRLS betas,
pagerank/star-contraction rounds) where the cut ALSO bounds plan
growth across iterations; with cuts disabled those plans get deep but
stay explainable — audits only build plans, they never execute the
hot loop.

Never cut a streaming DataFrame (localCheckpoint is batch-only) or a
fact-sized relation consumed once (pure overhead).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from contextvars import ContextVar
from typing import Iterator

from pyspark.sql import DataFrame

#: Environment switch for out-of-process tooling: set to "1"/"true"
#: (any case) before importing/launching to make every cut a no-op
#: for that process.
ENV_FLAG = "SPARK_GRAFT_NO_LINEAGE_CUTS"

# Per-context depth counter (ADVICE r10, low #3): a plain module
# global would let one thread's lineage_cuts_disabled() exit re-enable
# cuts while another thread is still mid-audit, silently hiding plan
# regions from the sweep.  ContextVar gives each thread / async task
# its own counter.
_disabled_depth: ContextVar[int] = ContextVar(
    "spark_graft_lineage_cuts_disabled_depth", default=0
)


def lineage_cuts_active() -> bool:
    """True when ``ckpt``/``ckpt_eager`` actually cut lineage (the
    production default); False inside ``lineage_cuts_disabled()`` or
    when ``SPARK_GRAFT_NO_LINEAGE_CUTS`` is exported as ``1``/``true``
    (case-insensitive)."""
    if _disabled_depth.get() > 0:
        return False
    return os.environ.get(ENV_FLAG, "").strip().lower() not in ("1", "true")


def ckpt(df: DataFrame) -> DataFrame:
    """Lazy lineage cut: ``df.transform(ckpt)`` ==
    ``df.localCheckpoint(eager=False)`` in production, identity under
    audit tooling so the full plan stays visible to ``explain``."""
    return df.localCheckpoint(eager=False) if lineage_cuts_active() else df


def ckpt_eager(df: DataFrame) -> DataFrame:
    """Eager lineage cut (materializes now): for loop-carried
    relations where the cut bounds per-iteration plan growth."""
    return df.localCheckpoint(eager=True) if lineage_cuts_active() else df


@contextmanager
def lineage_cuts_disabled() -> Iterator[None]:
    """Audit scope: every ``ckpt``/``ckpt_eager`` inside is a no-op,
    so ``explain`` renders the complete plan including every node that
    production lineage cuts would hide.  Nests safely; never use
    around code that EXECUTES iterative algorithms (recompute blowup —
    audits build and explain plans only)."""
    token = _disabled_depth.set(_disabled_depth.get() + 1)
    try:
        yield
    finally:
        _disabled_depth.reset(token)
