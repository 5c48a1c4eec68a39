"""Similarity search over embedding columns — [EXT] SURVEY.md §2.11.

Two paths:

- ``brute_force_cosine_topk`` — exact baseline: broadcast the (small)
  query set against the full corpus, cosine via higher-order array
  functions (JVM codegen, no UDF), per-query top-k via ranking window.
  At 100 TB the corpus side stays partitioned; only queries move.
- ``lsh_cosine_topk`` — scale path: MLlib BucketedRandomProjectionLSH
  buckets both sides so candidate generation is sub-quadratic; exact
  cosine re-rank on candidates only.
- ``embedding_near_dup_lsh`` — corpus-wide near-dup pairs: LSH
  self-join candidates, exact cosine threshold. The 100 TB path for
  embedding dedup (nothing broadcasts, no all-pairs stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity, dot_product, l2_norm


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (qid, nid, sim, rn). Self-matches excluded; deterministic
    tie-break on neighbor id.

    Norms are hoisted out of the pair expression: each side carries a
    precomputed ‖·‖ column, so the O(|Q|·|C|) stage traverses one
    array per pair (the dot product) instead of three — same
    expression tree per element, bit-identical cosine.
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")).withColumn(
        "qn", l2_norm(F.col("qvec"))
    )
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")).withColumn(
        "cn", l2_norm(F.col("nvec"))
    )
    pairs = c.join(F.broadcast(q), F.col("nid") != F.col("qid")).select(
        "qid",
        "nid",
        (dot_product(F.col("qvec"), F.col("nvec")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def embedding_near_dup_lsh(
    corpus: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 3,
) -> DataFrame:
    """Corpus-wide embedding near-dup pairs at 100 TB scale: LSH
    self-join for sub-quadratic candidates, exact cosine threshold on
    candidates only.  Output: (id_a, id_b, sim), id_a < id_b.

    For unit-norm embeddings cosine ≥ t ⟺ Euclidean distance ≤
    √(2−2t), so the ``approxSimilarityJoin`` distance cut loses no
    precision — only bucket-collision recall is probabilistic (recall
    vs the exact baseline asserted in tests).  Neither side is
    broadcast and no all-pairs stage exists anywhere.
    """
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    d = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "features", array_to_vector(F.col("vec").cast("array<double>"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length, numHashTables=num_tables, seed=42
    )
    model = lsh.fit(d)
    # small slack on the distance cut; the exact cosine filter below is
    # what defines the result set
    dist_cut = math.sqrt(max(2.0 - 2.0 * threshold, 0.0)) * 1.05
    cand = model.approxSimilarityJoin(d, d, dist_cut, distCol="dist")
    sim = cosine_similarity(F.col("datasetA.vec"), F.col("datasetB.vec"))
    return (
        cand.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            sim.alias("sim"),
        )
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("sim") >= threshold))
        .dropDuplicates(["id_a", "id_b"])
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 3,
    distance_threshold: float = 12.0,
) -> DataFrame:
    """Approximate top-k: random-projection LSH candidate generation,
    exact cosine re-rank of candidates. Sub-quadratic at scale.

    ``distance_threshold`` is the Euclidean candidate cut for
    ``approxSimilarityJoin`` — size it to the embedding norm scale
    (≈ √2·‖x‖ keeps most true neighbors for unit-ish data).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")).withColumn(
        "features", array_to_vector(F.col("nvec").cast("array<double>"))
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")).withColumn(
        "features", array_to_vector(F.col("qvec").cast("array<double>"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length, numHashTables=num_tables, seed=42
    )
    model = lsh.fit(c)
    # Euclidean-distance candidates, re-ranked by exact cosine.
    cand = model.approxSimilarityJoin(q, c, distance_threshold, distCol="dist")
    pairs = cand.select(
        F.col("datasetA.qid").alias("qid"),
        F.col("datasetB.nid").alias("nid"),
        cosine_similarity(F.col("datasetA.qvec"), F.col("datasetB.nvec")).alias("sim"),
    ).filter(F.col("qid") != F.col("nid"))
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
