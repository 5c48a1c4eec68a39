"""Physical-plan introspection: structural detection of the WindowExec
trap (an unpartitioned — or constant-key — Window over a relation that
grows with the data is a one-task sort at 100 TB, however green its
correctness check).  Shared by ``tests/test_plans.py``'s registry-wide
gate and ``tools/window_audit.py``.

Spark renders a physical Window node in ``explain("formatted")`` as::

    (4) Window
    Input [2]: [id#0L, g#1L]
    Arguments: [row_number() windowspecdefinition(g#1L, id#0L ASC ...)
                AS r#6], [g#1L], [id#0L ASC NULLS FIRST]

The ``Arguments:`` line carries 1-3 top-level ``[...]`` groups: the
window functions, then (optionally) the partition spec, then
(optionally) the sort spec.  Sort-spec entries always carry an
``ASC``/``DESC`` direction token; partition entries never do — that is
the classifier.  A ``partitionBy(lit(1))`` constant key is folded away
by Catalyst before the physical plan (the node's required distribution
becomes SinglePartition), so constant-key windows are caught by the
same "no partition group" test; a surviving all-literal partition spec
is classified unpartitioned explicitly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


def formatted_plan(df) -> str:
    """The ``explain("formatted")`` string of a DataFrame (returned,
    not printed)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@dataclass
class WindowNode:
    node: str  # "Window" | "WindowInPandas"
    functions: str
    partition: list[str]
    order: list[str]
    input_cols: tuple[str, ...] = ()  # base names of the Input line

    @property
    def is_unpartitioned(self) -> bool:
        if not self.partition:
            return True
        # a surviving all-literal partition spec is still one task
        return all(re.fullmatch(r"-?\d+(\.\d+)?", p) for p in self.partition)


_NODE_RE = re.compile(
    r"^\(\d+\) (Window(?:InPandas)?)(?:[ \t].*)?$\n"
    r"(?:^(?!\(\d|Arguments:|Input \[).*$\n)*?"
    r"(?:^Input \[\d+\]: \[(.*)\]$\n)?"
    r"(?:^(?!\(\d|Arguments:).*$\n)*?"
    r"^Arguments: (.*)$",
    re.M,
)

_BASE_NAME = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def _top_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of an Arguments line (bracket-depth
    aware, so nested brackets inside expressions don't split)."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def _split_exprs(g: str) -> list[str]:
    """Split a group on top-level commas (paren/bracket aware)."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in g:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


_DIRECTION = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)\b")


def window_nodes(plan: str) -> list[WindowNode]:
    """All physical Window / WindowInPandas nodes in a formatted plan,
    with their partition and sort specs separated."""
    nodes: list[WindowNode] = []
    for m in _NODE_RE.finditer(plan):
        name, input_line, args = m.group(1), m.group(2), m.group(3)
        input_cols = tuple(
            dict.fromkeys(_BASE_NAME.findall(input_line or ""))
        )
        groups = _top_groups(args)
        funcs = groups[0] if groups else ""
        partition: list[str] = []
        order: list[str] = []
        for g in groups[1:]:
            exprs = _split_exprs(g)
            if exprs and all(_DIRECTION.search(e) for e in exprs):
                order.extend(exprs)
            else:
                partition.extend(exprs)
        nodes.append(
            WindowNode(
                node=name,
                functions=funcs,
                partition=partition,
                order=order,
                input_cols=input_cols,
            )
        )
    return nodes


def unpartitioned_windows(plan: str) -> list[WindowNode]:
    """The Window nodes whose partition spec is empty or all-literal —
    each is a single-task sort over its input relation."""
    return [n for n in window_nodes(plan) if n.is_unpartitioned]


def order_signature(node: WindowNode) -> tuple[str, ...]:
    """The sorted base column names of a window's sort spec (expr IDs
    stripped) — stable across plan rebuilds, so usable as a gate
    whitelist key.  An empty tuple = whole-relation frame (no sort)."""
    names = set()
    for e in node.order:
        names.update(re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", e))
    return tuple(sorted(names))


def input_signature(node: WindowNode) -> tuple[str, ...]:
    """The sorted base column names of the window's physical Input
    line — identifies WHICH relation the window runs over, so a gate
    whitelist entry can pin both the sort columns AND the input
    relation (round-9 advice: an order-only signature lets a
    regression re-sort a same-named column of a GROWING relation pass
    under a whitelisted query)."""
    return tuple(sorted(set(node.input_cols)))


#: Queries whose BUILD executes an iterative driver loop with
#: per-round actions (connected-components label propagation runs a
#: convergence `.count()` per round at plan-build time).  Audit
#: tooling must explain these with lineage cuts ACTIVE:
#: `lineage.lineage_cuts_disabled()`'s own contract forbids wrapping
#: code that EXECUTES iterative algorithms — with the cuts turned into
#: no-ops, round r's convergence count re-executes rounds 1..r plus
#: the whole upstream LSH/Jaccard pipeline, a quadratic re-derivation
#: blow-up (round-10 self-review).  The cost of auditing them cut:
#: plan regions below their checkpoints stay invisible to the window
#: sweep — accepted and bounded, since the below-cut subtrees are the
#: very pipelines audited uncut via their non-iterative siblings
#: (llm_dedup_pipeline's stages are portable_band_pairs /
#: minhash_portable_band_pairs / dedup_exact_docs, all swept fully).
ITERATIVE_BUILD_QUERIES = frozenset(
    {
        "cluster_representative_pick",
        "dedup_jaccard_clusters",
        "llm_dedup_pipeline",
        "fuzzy_entity_clusters",
    }
)


#: Column-name markers of the bucket+offset device's internal tiny
#: tables (`operators/ranks.py`), encoded as (name, kind) where kind
#: is "exact" or "prefix": `_gr_cnt` (rank counts), `_gc_*` (cumsum
#: totals).  An unpartitioned window whose input carries one of these
#: is the device's own <= n_buckets-row offset table — the documented
#: safe shape — and is auto-allowed by the gate without a per-query
#: whitelist entry (with lineage cuts disabled the device appears
#: beneath dozens of queries).  ``is_ranks_device_window`` iterates
#: over THIS tuple (ADVICE r10, low #2 — the check previously
#: hardcoded its own copy of the strings, so constant and check could
#: silently drift apart).
_DEVICE_MARKERS = (("_gr_cnt", "exact"), ("_gc_", "prefix"))

#: The only non-marker column names the device's internal tables can
#: legitimately carry when the window is UNPARTITIONED (grouped-mode
#: device windows are partitioned by the group keys, so they never
#: reach the unpartitioned-window gate at all): the bucket column
#: (``bkt`` default; ``vbkt`` is the one renamed call site,
#: queries_llm.py tfidf vocabulary ranks; ``bkt2`` is the hot-cell
#: subsplit composite from ``with_hot_cell_subsplit``) and the
#: device's own ``_gr_off`` prefix-offset intermediate (visible as
#: input to the stacked ``total`` window node).
_DEVICE_BUCKET_COLS = frozenset({"bkt", "bkt2", "vbkt"})
_DEVICE_NONMARKER_COLS = _DEVICE_BUCKET_COLS | {"_gr_off"}

#: Spark's own window-expression temp projections (`_we0`, `_we1`, …)
#: appear on the Input line of stacked Window nodes — planner-
#: generated, not user columns.
_SPARK_WINDOW_TEMP = re.compile(r"_we\d+$")


def _is_device_marker(col: str) -> bool:
    return any(
        col == m if kind == "exact" else col.startswith(m)
        for m, kind in _DEVICE_MARKERS
    )


def is_ranks_device_window(node: WindowNode) -> bool:
    """True when the window runs over the ranks.py device's internal
    counts/totals table (bounded at n_buckets rows by construction).

    The check pins the exact expected table shape (ADVICE r10, medium
    — the previous version bounded column WIDTH, not cardinality, so
    ``groupBy(user).agg(sum(x).alias("_gc_total"))`` followed by
    ``Window.orderBy(user)`` — a one-task window over a narrow GROWING
    relation — silently bypassed the gate):

    1. at least one device marker column (``_gr_cnt`` / ``_gc_*``);
    2. every non-marker input column is one of the device's own names
       (the bucket column or ``_gr_off``) — a ``user``-keyed aggregate
       fails here however narrow;
    3. the sort spec is empty (the stacked per-group ``total`` node)
       or exactly the bucket column — the device never orders its
       tiny tables by anything else.

    A query wanting an exemption for a bespoke bounded table goes
    through the explicit whitelist with a justification instead."""
    markers = [c for c in node.input_cols if _is_device_marker(c)]
    non_markers = [
        c
        for c in node.input_cols
        if not _is_device_marker(c) and not _SPARK_WINDOW_TEMP.fullmatch(c)
    ]
    if not markers:
        return False
    if any(c not in _DEVICE_NONMARKER_COLS for c in non_markers):
        return False
    order_sig = order_signature(node)
    return order_sig == () or (
        len(order_sig) == 1 and order_sig[0] in _DEVICE_BUCKET_COLS
    )
