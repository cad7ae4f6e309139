"""Approximate-nearest-neighbor search over embedding columns.

Two paths:
* ``brute_force_topk`` — exact cosine top-k, JVM-side arithmetic
  (F.zip_with / F.aggregate), broadcast query side. The correctness
  baseline and the oracle-checkable variant.
* ``ivf_topk`` — IVF-style: vectors are assigned to their nearest centroid
  cell once (the 'index build'), and queries probe only the ``n_probe``
  nearest cells. Centroids here are a deterministic sample (first C vectors
  by id); a k-means refinement drops in without changing the dataflow.
  At scale this turns a full cross join into (N x C) + per-cell joins —
  the standard Spark ANN shape when no vector index service is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pilsner_spark.functions.similarity import cosine_similarity


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Ranking is over (rounded cosine desc, neighbor id asc) so results are
    stable across engines/float summation orders.
    """
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("q_vec").cast("array<double>"), F.col("v_vec").cast("array<double>")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell (deterministic
    centroids: the n_cells lowest-id vectors). Returns (vec_id, cell)."""
    centroids = vectors.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("c_vec")
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    scored = F.broadcast(centroids).crossJoin(v).withColumn(
        "cos", F.round(cosine_similarity(F.col("c_vec").cast("array<double>"), F.col("v_vec").cast("array<double>")), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell"))
    return scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1).select("vec_id", "cell")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe nearest cells per query,
    rank within the probed subset. Same output schema as brute_force_topk."""
    assign = ivf_assign(vectors, n_cells, id_col, vec_col)
    centroids = vectors.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("c_vec")
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_cells = (
        F.broadcast(centroids)
        .crossJoin(q)
        .withColumn("cos", F.round(cosine_similarity(F.col("c_vec").cast("array<double>"), F.col("q_vec").cast("array<double>")), 6))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cell"))
    probed = q_cells.withColumn("r", F.row_number().over(wq)).filter(F.col("r") <= n_probe).select(
        "query_id", "q_vec", "cell"
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"))
    cand = probed.join(assign.withColumnRenamed("vec_id", "neighbor_id"), "cell").join(v, "neighbor_id")
    scored = cand.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine", F.round(cosine_similarity(F.col("q_vec").cast("array<double>"), F.col("v_vec").cast("array<double>")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
