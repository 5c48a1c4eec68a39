"""Graph operators for dedup pipelines — [EXT] SURVEY.md §2.11.

Near-dup detection (MinHash LSH, Jaccard, embedding cosine) emits
*pairs*; an actual dedup pipeline needs *groups*: the connected
components of the pair graph, with one canonical survivor per
component.  ``connected_components`` closes that gap.

Algorithm: iterative min-label propagation — every node starts
labeled with its own id; each round a node adopts the minimum label
in its neighborhood; convergence when no label changes.  Rounds =
graph diameter, which for near-dup graphs is small (components are
near-cliques: documents similar to a common template are similar to
each other).  Each round is one shuffle join + grouped min — all
JVM-side; the driver loop only checks a changed-count.  Lineage is
truncated per round with ``localCheckpoint`` so plans don't grow
unboundedly (on a real cluster use a checkpoint dir).

For adversarial long-chain graphs, ``algorithm="star"`` switches to
the large-star/small-star alternation (the MapReduce-CC construction
from the published alternating-star algorithm): each round contracts
whole neighborhoods toward their minimum instead of moving labels one
hop, converging in O(log² n) rounds regardless of diameter — the
shape that holds at 100 TB.  Per round it is still one grouped min +
one co-partitioned join; both variants share the same outputs
(equivalence pinned by tests on chain/random graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lineage import ckpt


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    mn = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mn, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """Connect every ≤-neighbor of u (and u itself) to the minimum of
    u's smaller neighborhood."""
    small = sym.filter(F.col("v") < F.col("u"))
    mn = small.groupBy("u").agg(F.min("v").alias("mn"))  # mn < u always
    out_nbrs = (
        small.join(mn, "u")
        .filter(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    out_self = mn.select("u", F.col("mn").alias("v"))
    return out_nbrs.union(out_self).distinct()


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(u, v))"), F.lit(0).cast("long")
        ).alias("fp"),
    ).first()
    return int(row["n"]), int(row["fp"])


def _star_components(und: DataFrame, max_iter: int) -> DataFrame:
    edges = und.filter(F.col("v") < F.col("u")).distinct().transform(ckpt)
    prev = None
    for _ in range(max_iter):
        edges = _small_star(_symmetrize(_large_star(_symmetrize(edges)))).transform(ckpt)
        fp = _edge_fingerprint(edges)
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(f"star-alternation did not converge in {max_iter} rounds")
    # converged: edges are (node → component-min) stars.  Union every
    # node of the input mapped to itself so centers, isolated nodes and
    # self-loop-only nodes all appear (component min ≤ node, so the
    # grouped min keeps the star mapping where one exists) — this keeps
    # the star variant's output identical to propagation's on arbitrary
    # edge lists, self-loops included.
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    selves = und.select(F.col("u").alias("node"), F.col("u").alias("cluster_id"))
    return members.union(selves).groupBy("node").agg(F.min("cluster_id").alias("cluster_id"))


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "propagation",
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns ``(node, cluster_id)`` for every node appearing in an
    edge, with ``cluster_id`` = the minimum node id in the component
    (the canonical dedup survivor).

    ``algorithm="propagation"`` (default) moves labels one hop per
    round — rounds = diameter, right for near-clique dedup graphs.
    ``algorithm="star"`` contracts neighborhoods (large-star/small-star
    alternation) — O(log² n) rounds on any topology, the choice for
    adversarial diameters at scale.  Both raise if ``max_iter`` rounds
    don't converge.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .transform(ckpt)
    )
    if algorithm == "star":
        return _star_components(und, max_iter)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(ckpt)
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                "label",
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias("new_label"),
            )
            .transform(ckpt)
        )
        changed = stepped.filter(F.col("new_label") != F.col("label")).limit(1).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological diameter; use star-alternation"
    )
