"""Approximate-nearest-neighbor search over embedding columns.

Two paths:
* ``brute_force_topk`` — exact cosine top-k, JVM-side arithmetic
  (F.zip_with / F.aggregate), broadcast query side. The correctness
  baseline and the oracle-checkable variant.
* ``ivf_topk`` — IVF-style: vectors are assigned to their nearest centroid
  cell once (the 'index build'), and queries probe only the ``n_probe``
  nearest cells. Default centroids are a deterministic sample (first C
  vectors by id — the oracle-checkable path); ``kmeans_centroids`` trains
  proper spherical-k-means centroids as pure DataFrame ops and drops into
  the same dataflow via the ``centroids`` parameter. At scale this turns a
  full cross join into (N x C) + per-cell joins — the standard Spark ANN
  shape when no vector index service is available.

Quality audit: ``recall_at_k`` measures IVF recall against the brute-force
truth; tests pin the floor and bench.py reports the number per run.
"""

from __future__ import annotations

from typing import Optional

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


def sample_centroids(
    vectors: DataFrame, n_cells: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid sample: the n_cells lowest-id vectors.
    The oracle-checkable baseline; use kmeans_centroids for index quality."""
    return vectors.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("c_vec")
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means as pure DataFrame ops: deterministic init (lowest
    n_cells ids), then ``iters`` rounds of (broadcast-centroid argmax-cosine
    assignment -> per-dimension mean via posexplode). Cell ids stay the
    initial seed vector ids. Cells that lose every member disappear (their
    probes redistribute) — standard k-means behavior, fine for IVF.

    Physical shape per iteration: one broadcast cross join (N x C rows, no
    shuffle), an argmax via ``max_by`` hash aggregation (map-side partials —
    NOT a window, which would shuffle all N x C rows per iteration), and one
    (cell, dim) hash aggregation — linear in N at any cluster size;
    centroids stay O(C x d)."""
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v_vec"))
    centroids = v.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cell"), F.col("v_vec").alias("c_vec")
    ).localCheckpoint()
    for _ in range(iters):
        scored = F.broadcast(centroids).crossJoin(v).withColumn(
            "cos", cosine_similarity(F.col("c_vec"), F.col("v_vec"))
        )
        # argmax by (cos desc, cell asc): max_by over the ordering struct
        # (-cell so ties prefer the smallest cell, matching the window the
        # previous implementation used — but without its N x C shuffle)
        assign = scored.groupBy("vec_id").agg(
            F.max_by("cell", F.struct(F.col("cos"), (-F.col("cell")).alias("nc"))).alias("cell"),
            F.any_value("v_vec").alias("v_vec"),
        )
        dims = assign.select("cell", F.posexplode("v_vec").alias("pos", "x"))
        centroids = (
            dims.groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("c_vec")
            )
        ).localCheckpoint()
    return centroids


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[DataFrame] = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid cell. Returns
    (vec_id, cell). Argmax via ``max_by`` aggregation (map-side partial
    collapses the N x C cross-join output to N rows before the exchange;
    the window variant shuffled all N x C rows). Tie-break identical to
    the previous window (rounded cos desc, cell asc) so the oracle holds."""
    if centroids is None:
        centroids = sample_centroids(vectors, n_cells, id_col, vec_col)
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    scored = F.broadcast(centroids).crossJoin(v).withColumn(
        "cos", F.round(cosine_similarity(F.col("c_vec").cast("array<double>"), F.col("v_vec").cast("array<double>")), 6)
    )
    return scored.groupBy("vec_id").agg(
        F.max_by("cell", F.struct(F.col("cos"), (-F.col("cell")).alias("nc"))).alias("cell")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe nearest cells per query,
    rank within the probed subset. Same output schema as brute_force_topk.
    ``centroids``: trained cells (kmeans_centroids) — defaults to the
    deterministic sample so the oracle stays exact."""
    if centroids is None:
        centroids = sample_centroids(vectors, n_cells, id_col, vec_col)
    centroids = centroids.localCheckpoint()  # reused by assignment + probing
    assign = ivf_assign(vectors, n_cells, id_col, vec_col, centroids=centroids)
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


def recall_at_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: Optional[DataFrame] = None,
) -> float:
    """Fraction of brute-force top-k neighbors the IVF index recovers —
    the index-quality number bench.py reports and tests pin."""
    truth = brute_force_topk(vectors, queries, k, id_col, vec_col, query_id_col)
    approx = ivf_topk(
        vectors, queries, k, n_cells, n_probe, id_col, vec_col, query_id_col, centroids=centroids
    )
    hits = truth.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    ).count()
    total = truth.count()
    return hits / total if total else 1.0
