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

For adversarial long-chain graphs at 100 TB, swap the propagation
loop for the large-star/small-star alternation (O(log²n) rounds,
same per-round join shape); near-dup workloads don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns ``(node, cluster_id)`` for every node appearing in an
    edge, with ``cluster_id`` = the minimum node id in the component
    (the canonical dedup survivor).  Raises if ``max_iter`` rounds
    don't converge — a signal the graph has pathological diameter and
    needs the star-alternation variant.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
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
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("new_label") != F.col("label")).limit(1).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological diameter; use star-alternation"
    )
