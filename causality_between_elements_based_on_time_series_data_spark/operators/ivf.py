"""IVF (inverted-file) approximate nearest neighbor — [EXT] SURVEY §2.11.

The scale path for similarity search when LSH recall is poor on the
data distribution: cluster the corpus once (KMeans — MLlib, distributed),
assign every vector to its nearest centroid, then answer queries by
searching only the ``n_probe`` closest clusters.  Candidate count drops
from N to ~N·n_probe/k, and the expensive exact cosine re-rank runs on
candidates only.

All joins here are broadcast (centroids and queries are small); the
corpus never moves after the one-time cluster assignment, which at
100 TB would be a materialized, bucketed-by-cluster table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via KMeans inverted lists."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")).withColumn(
        "features", array_to_vector(F.col("nvec").cast("array<double>"))
    )
    km = KMeans(k=n_clusters, seed=seed, featuresCol="features", predictionCol="cluster")
    model = km.fit(c)
    assigned = model.transform(c).select("nid", "nvec", "cluster")

    centers = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    centers_df = queries.sparkSession.createDataFrame(
        centers, "cluster int, center array<double>"
    )

    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    # rank clusters per query by centroid cosine, keep n_probe
    qc = q.join(F.broadcast(centers_df)).select(
        "qid", "qvec", "cluster", cosine_similarity(F.col("qvec"), F.col("center")).alias("csim")
    )
    wq = W.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cluster"))
    probes = qc.withColumn("crank", F.row_number().over(wq)).filter(F.col("crank") <= n_probe)

    # search only within probed clusters; probe side broadcasts
    cand = assigned.join(F.broadcast(probes.select("qid", "qvec", "cluster")), "cluster").filter(
        F.col("nid") != F.col("qid")
    )
    pairs = cand.select("qid", "nid", cosine_similarity(F.col("qvec"), F.col("nvec")).alias("sim"))
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
