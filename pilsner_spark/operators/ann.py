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


def _sq_l2(a, b):
    """Squared Euclidean distance between two array columns, rounded to 6
    decimals — the rounding (not sqrt) keeps argmin ties engine-portable."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011 — public literature): the
    vector space splits into ``m`` contiguous subspaces; each subspace gets
    ``n_codes`` codewords. Deterministic construction (the subvectors of the
    ``n_codes`` lowest-id vectors, code id = seed vector id) so the oracle
    stays exact — k-means-refined codewords drop into the same dataflow.

    Returns (m, code, c_sub). O(m x n_codes) rows — always broadcastable.
    """
    if dim is None:
        dim = vectors.select(F.size(F.col(vec_col))).first()[0]
    sub = dim // m
    seed = vectors.orderBy(id_col).limit(n_codes).select(
        F.col(id_col).alias("code"), F.col(vec_col).cast("array<double>").alias("v")
    )
    parts = F.array(
        *[
            F.struct(F.lit(i).alias("m"), F.slice(F.col("v"), i * sub + 1, sub).alias("c_sub"))
            for i in range(m)
        ]
    )
    return seed.select("code", F.explode(parts).alias("p")).select(
        F.col("p.m").alias("m"), "code", F.col("p.c_sub").alias("c_sub")
    )


def kmeans_pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> DataFrame:
    """k-means-TRAINED product-quantization codebooks (Jégou 2011 trains
    each subquantizer with Lloyd's algorithm; the deterministic-sample
    :func:`pq_codebooks` is the oracle-exact seed, this is the quality
    path). Same output schema (m, code, c_sub) — drops into
    :func:`pq_encode` / :func:`ivf_pq_topk` unchanged.

    All ``m`` subspace k-means run in ONE grouped dataflow, not m
    sequential jobs: subvectors explode to N x m rows once per iteration,
    join the broadcast O(m x n_codes) codebook, argmin per (vector,
    subspace) via ``min_by`` hash aggregation (map-side partials — no
    window), and the new codewords are one (m, code, pos) mean
    aggregation. Codes that lose every member disappear (standard k-means
    behavior; encoding still works — fewer codewords in that subspace).
    Distance is squared-L2, identical to :func:`pq_encode`, so training
    optimizes exactly the quantizer the encoder applies."""
    if dim is None:
        dim = vectors.select(F.size(F.col(vec_col))).first()[0]
    sub = dim // m
    parts = F.array(
        *[
            F.struct(F.lit(i).alias("m"), F.slice(F.col("v"), i * sub + 1, sub).alias("v_sub"))
            for i in range(m)
        ]
    )
    subs = (
        vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .select("vec_id", F.explode(parts).alias("p"))
        .select("vec_id", F.col("p.m").alias("m"), F.col("p.v_sub").alias("v_sub"))
        .localCheckpoint()
    )
    books = pq_codebooks(vectors, m, n_codes, id_col, vec_col, dim).localCheckpoint()
    for _ in range(iters):
        # group per (vector, subspace) — NOT per distinct subvector value,
        # which would dedup repeats and mis-weight the means
        assigned = (
            subs.join(F.broadcast(books), "m")
            .withColumn("d", _sq_l2(F.col("v_sub"), F.col("c_sub")))
            .groupBy("vec_id", "m")
            .agg(
                F.min_by("code", F.struct(F.col("d"), F.col("code"))).alias("code"),
                F.any_value("v_sub").alias("v_sub"),
            )
        )
        books = (
            assigned.select("m", "code", F.posexplode("v_sub").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(F.avg("x").alias("mean"))
            .groupBy("m", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))), lambda s: s["mean"]
                ).alias("c_sub")
            )
            .localCheckpoint()
        )
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> DataFrame:
    """Encode every vector as ``m`` codes: per subspace, the codeword with
    the smallest (rounded) squared-L2 distance, ties to the lowest code id.

    This is the index build — the 100 TB story: an encoded vector is ``m``
    small ints instead of ``dim`` floats (64-dim float -> 4 bytes of codes,
    a 64x compression), so the searchable corpus fits in a fraction of the
    memory/IO. Physical shape: vectors explode to N x m subvector rows, a
    broadcast join against the O(m x n_codes) codebook scores N x m x K
    rows, and a ``min_by`` hash aggregation (map-side partials) collapses
    them back to N x m before the exchange — linear in N, no window."""
    if dim is None:
        dim = vectors.select(F.size(F.col(vec_col))).first()[0]
    sub = dim // m
    parts = F.array(
        *[
            F.struct(F.lit(i).alias("m"), F.slice(F.col("v"), i * sub + 1, sub).alias("v_sub"))
            for i in range(m)
        ]
    )
    subs = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).select("vec_id", F.explode(parts).alias("p")).select(
        "vec_id", F.col("p.m").alias("m"), F.col("p.v_sub").alias("v_sub")
    )
    scored = subs.join(F.broadcast(codebooks), "m").withColumn(
        "d", _sq_l2(F.col("v_sub"), F.col("c_sub"))
    )
    return scored.groupBy("vec_id", "m").agg(
        F.min_by("code", F.struct(F.col("d"), F.col("code"))).alias("code")
    )


def _pq_reconstructions(
    vectors: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> DataFrame:
    """(vec_id, r_vec): every vector's PQ codeword reconstruction — the
    concatenated per-subspace codewords its codes represent, i.e. exactly
    what a scorer reading the compressed index sees. Build = codebooks
    (broadcastable O(m x n_codes)) + linear min_by encode + one broadcast
    join back."""
    cb = pq_codebooks(vectors, m, n_codes, id_col, vec_col, dim).localCheckpoint()
    codes = pq_encode(vectors, cb, m, id_col, vec_col, dim)
    return (
        codes.join(F.broadcast(cb), ["m", "code"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "c_sub"))),
                    lambda s: s["c_sub"],
                )
            ).alias("r_vec")
        )
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: Optional[int] = None,
) -> DataFrame:
    """Approximate top-k over PQ-compressed vectors: encode once, score
    queries against the codeword RECONSTRUCTION, rank as in
    brute_force_topk. Same output schema; ``cosine`` is the approximate
    (reconstructed) similarity. Queries stay uncompressed (asymmetric
    scoring, the standard PQ setup: only the corpus side pays the
    quantization error).

    This is the COMPRESSION-QUALITY BASELINE: it scans every
    reconstruction per query (O(N x Q) candidates). The 100 TB search path
    is :func:`ivf_pq_topk`, which routes the same reconstructions through
    IVF cell probing so the candidate set per query is O(probed cells),
    never O(N)."""
    recon = _pq_reconstructions(vectors, m, n_codes, id_col, vec_col, dim)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(recon.withColumnRenamed("vec_id", "neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("q_vec"), F.col("r_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def pq_index(
    vectors: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[DataFrame] = None,
    codebooks: Optional[DataFrame] = None,
    dim: Optional[int] = None,
) -> DataFrame:
    """The stored IVF-PQ index: (vec_id, cell, m, code) — m small ints per
    vector plus its IVF cell, ~16 bytes/vector at the bench's realistic
    m=16 setting vs 256+ bytes of raw floats. This is the ONLY table the
    query path reads; the full-width embedding column is touched here, at
    index build, and never again. At scale, persist it partitioned by
    ``cell`` so probed-cell joins become partition-pruned scans:

        pq_index(emb).write.partitionBy("cell").parquet(path)

    Build shape: one broadcast-centroid max_by pass for cells (linear,
    no window) + one broadcast-codebook min_by pass for codes (linear) +
    a join of the two code-width tables on vec_id — nothing full-width
    crosses an exchange."""
    if centroids is None:
        centroids = sample_centroids(vectors, n_cells, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_codebooks(vectors, m, n_codes, id_col, vec_col, dim)
    assign = ivf_assign(vectors, n_cells, id_col, vec_col, centroids=centroids)
    codes = pq_encode(vectors, codebooks, m, id_col, vec_col, dim)
    return codes.join(assign, "vec_id")


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: Optional[DataFrame] = None,
    dim: Optional[int] = None,
    index: Optional[DataFrame] = None,
    codebooks: Optional[DataFrame] = None,
    refine_factor: int = 0,
    refine_vectors: Optional[DataFrame] = None,
    refine_vec_col: Optional[str] = None,
    verify_refine_coverage: bool = True,
) -> DataFrame:
    """IVF-PQ — the composed 100 TB ANN shape (Jégou et al., TPAMI 2011):
    the IVF index prunes the SEARCH (each query probes its ``n_probe``
    nearest cells, so candidates are O(probed cells), never O(N)) while PQ
    compresses the STORAGE (candidates are scored against their codeword
    reconstructions — m small ints per vector instead of dim floats, 64x
    less index memory/IO at m=4 codes over 64 float dims).

    Physical shape: query-time work reads ONLY the compact
    :func:`pq_index` table. The tiny probed-cell table (queries x n_probe
    rows) broadcasts onto it — one scan of code-width rows, no shuffle of
    anything full-width — and codeword reconstruction happens AFTER that
    join, so it is O(candidates), not O(N): candidate code rows join the
    broadcast O(m x n_codes) codebook and re-assemble r_vec per
    (query, candidate). (An earlier shape joined candidates against
    pre-reconstructed vectors, which rebuilt and shuffled all N full-width
    arrays per query batch — exactly the cost PQ exists to avoid.)

    Same output schema as brute_force_topk; ``cosine`` is the
    reconstructed approximation. Default centroids/codebooks are the
    deterministic samples (oracle-exact); trained k-means centroids drop
    in via ``centroids``; a persisted index (partitioned by cell) drops in
    via ``index``, making ``vectors`` build-time-only.

    ``refine_factor`` > 0 adds the exact RE-RANKING stage production
    IVF-PQ deployments run (Jégou et al. 2011 §V.C / Faiss IVFPQR): the
    top ``k x refine_factor`` candidates by PQ-approximate cosine are
    re-scored against their FULL-WIDTH vectors and re-ranked, recovering
    most of the recall quantization loses while the full-width read stays
    O(shortlist), never O(N) — the shortlist broadcasts onto the refine
    table, so corpus vectors still cross no exchange. The shortlist
    carries each candidate's ``cell``; pass ``refine_vectors`` stored
    PARTITIONED BY cell (the pq_index layout) and the broadcast join
    prunes unprobed partitions. ``refine_vec_col`` names the refine
    table's vector column when it differs from ``vec_col`` (the serving
    shape reads queries through ``vec_col``, so a renamed query column
    must not leak into the corpus-side refine read). ``cosine`` in the
    refined output is exact.

    HARD CONTRACT when ``refine_vectors`` carries a ``cell`` column: its
    cell assignment MUST be the one this index was built with (same
    centroids — e.g. a table written from ``ivf_assign`` with the same
    ``centroids`` argument). The exact re-rank joins the shortlist on
    (cell, neighbor_id) to keep partition pruning; a disagreeing
    assignment (index built with trained centroids, refine table written
    under sample-centroid assignment) would make shortlist candidates
    vanish from the join. This function DETECTS that and raises
    ``ValueError`` instead of silently degrading recall (ADVICE r4): the
    refine join is materialized (localCheckpoint — shortlist-sized, tiny)
    and its row count compared against the shortlist. A cell-less refine
    table joins on neighbor_id alone (no pruning, no contract).
    ``verify_refine_coverage=False`` skips the check and returns the
    fully LAZY plan (identical physical shape — the check only moves
    execution earlier, it never changes the join); use it when the caller
    has already validated the refine table's assignment and wants the
    plan visible end-to-end (e.g. tools/explain_audit.py)."""
    if centroids is None:
        centroids = sample_centroids(vectors, n_cells, id_col, vec_col)
    centroids = centroids.localCheckpoint()  # reused by assignment + probing
    if codebooks is None:
        codebooks = pq_codebooks(vectors, m, n_codes, id_col, vec_col, dim)
    codebooks = codebooks.localCheckpoint()  # reused by encode + reconstruction
    if index is None:
        index = pq_index(
            vectors, m, n_codes, n_cells, id_col, vec_col,
            centroids=centroids, codebooks=codebooks, dim=dim,
        )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    q_cells = (
        F.broadcast(centroids)
        .crossJoin(q)
        .withColumn(
            "cos",
            F.round(
                cosine_similarity(F.col("c_vec").cast("array<double>"), F.col("q_vec")), 6
            ),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cell"))
    probed = (
        q_cells.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "cell")
    )
    cand = (
        index.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    # reconstruction AFTER pruning: same r_vec as _pq_reconstructions
    # (per-subspace codewords concatenated in m order), built only for the
    # probed-cell candidates
    recon = (
        cand.join(F.broadcast(codebooks), ["m", "code"])
        .groupBy("query_id", "neighbor_id", "cell")  # cell is per-neighbor, free in the key
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "c_sub"))),
                    lambda s: s["c_sub"],
                )
            ).alias("r_vec")
        )
    )
    scored = recon.join(F.broadcast(q), "query_id").withColumn(
        "cosine", F.round(cosine_similarity(F.col("q_vec"), F.col("r_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    if refine_factor and refine_factor > 0:
        rv = refine_vectors if refine_vectors is not None else vectors
        if rv is None:
            raise ValueError(
                "refine_factor needs full-width vectors: pass refine_vectors "
                "(cell-partitioned for partition pruning) or vectors"
            )
        shortlist = (
            scored.withColumn("arank", F.row_number().over(w))
            .filter(F.col("arank") <= k * refine_factor)
            .select("query_id", "neighbor_id", "cell")
        )
        if verify_refine_coverage:
            # one PQ pass; reused by the join AND the coverage check
            shortlist = shortlist.localCheckpoint()
        rv_col = refine_vec_col or vec_col
        cols = [F.col(id_col).alias("neighbor_id"), F.col(rv_col).cast("array<double>").alias("n_vec")]
        join_keys = ["neighbor_id"]
        if "cell" in rv.columns:
            cols.append(F.col("cell"))
            join_keys = ["cell", "neighbor_id"]
        else:
            shortlist = shortlist.drop("cell")
        exact = (
            rv.select(*cols)
            .join(F.broadcast(shortlist), join_keys)
            .join(F.broadcast(q), "query_id")
            .withColumn("cosine", F.round(cosine_similarity(F.col("q_vec"), F.col("n_vec")), 6))
        )
        if not verify_refine_coverage:
            return (
                exact.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank", "cosine")
            )
        exact = exact.localCheckpoint()  # shortlist-sized; makes the dropped-candidate check free
        n_short, n_joined = shortlist.count(), exact.count()
        if n_joined < n_short:
            detail = (
                "the refine table's cell assignment disagrees with this index's "
                "(the (cell, neighbor_id) join found no partition match) — refine_vectors "
                "must be written under the SAME centroids as the index, or passed without "
                "a cell column to join on neighbor_id alone"
                if "cell" in rv.columns
                else "the refine table is missing vector ids present in the index"
            )
            raise ValueError(
                f"ivf_pq_topk refine: {n_short - n_joined} of {n_short} shortlist "
                f"candidates have no full-width row in refine_vectors: {detail}"
            )
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine")
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def pq_recall_at_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> float:
    """Fraction of brute-force top-k the PQ index recovers — the
    compression-quality twin of ``recall_at_k``."""
    truth = brute_force_topk(vectors, queries, k, id_col, vec_col, query_id_col)
    approx = pq_topk(vectors, queries, k, m, n_codes, id_col, vec_col, query_id_col)
    hits = truth.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    ).count()
    total = truth.count()
    return hits / total if total else 1.0


def ivf_pq_recall_at_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: Optional[DataFrame] = None,
    refine_factor: int = 0,
    codebooks: Optional[DataFrame] = None,
) -> float:
    """Fraction of brute-force top-k the composed IVF-PQ path recovers —
    charges BOTH approximation sources at once (probe pruning + codeword
    quantization), the honest quality number for the scale path.
    ``refine_factor`` > 0 measures the exact-re-ranked variant (the
    residual miss is then probe pruning alone); ``codebooks`` measures a
    trained quantizer (:func:`kmeans_pq_codebooks`)."""
    truth = brute_force_topk(vectors, queries, k, id_col, vec_col, query_id_col)
    approx = ivf_pq_topk(
        vectors,
        queries,
        k,
        m,
        n_codes,
        n_cells,
        n_probe,
        id_col,
        vec_col,
        query_id_col,
        centroids=centroids,
        refine_factor=refine_factor,
        codebooks=codebooks,
    )
    hits = truth.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    ).count()
    total = truth.count()
    return hits / total if total else 1.0


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
