"""Training-data batch preparation: deterministic sampling, split
assignment, and token-budget sequence packing.

These are the operators an LLM training-data pipeline runs AFTER dedup and
quality filtering: carve reproducible samples/splits without shuffling the
corpus, and pack variable-length documents into fixed token-budget bins
(sequence packing) so a trainer reads dense batches. Everything here is
deterministic (hash- or sort-order-driven, no RNG state) — the property
that makes 100 TB runs resumable and auditable: re-running any stage
reproduces the same sample / split / bin for every row.

Scale shapes:
* split assignment is a pure hash expression (no shuffle at all);
  stratified sampling pre-filters each stratum to ~oversample*k rows by a
  hash-quantile cut before its ranking window, so hot strata never funnel
  through one task;
* packing needs a GLOBAL running total of token counts — computed with the
  same bucketed two-level trick as ``blocking.global_sort_ranks`` (bucket
  prefix sums broadcast back + in-bucket running-sum window), so no
  single-partition window ever sees the full table.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deterministic_split(
    records: DataFrame,
    id_col: str,
    weights: dict,
    seed: str = "split",
) -> DataFrame:
    """Assign every record a split label ('train'/'val'/...) from a hash of
    its id — stable across runs, machines, and partitionings; NO shuffle
    (pure projection). ``weights`` maps label -> relative weight; boundaries
    are carved from the md5-derived uniform in [0, 1). A record's split
    never changes when other records come or go — the property random
    splits lack and deduped/incremental corpora need.

    Boundaries are exact integers in the 52-bit hash space (no float
    accumulation), so any engine recomputing the same md5 prefix lands
    every record on the same side of every boundary — bit-reproducible
    across Spark, DuckDB, and whatever reads the table next."""
    total = sum(weights.values())
    h = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.lit(seed), F.col(id_col).cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    labels = sorted(weights)  # deterministic boundary order
    expr = None
    acc = 0
    for label in labels[:-1]:
        acc += weights[label]
        cond = h < F.lit((16**13) * acc // total)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    expr = F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    return records.withColumn("split", expr)


def stratified_sample(
    records: DataFrame,
    stratum_col: str,
    id_col: str,
    k_per_stratum: int,
    seed: str = "sample",
    oversample: float = 8.0,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank records inside each
    stratum by the md5 of (seed, id) — a reproducible shuffle order — and
    keep the first k. Ties impossible: the hash input embeds the unique
    id, and the id itself tie-breaks equal hashes.

    A naive per-stratum ``row_number`` window drags a hot stratum (a
    billion 'en' documents) through ONE task. Since the hash is uniform,
    the k winners sit in the lowest ~k/size quantile of the hash space, so
    a pre-filter at ``oversample * k / size`` of the 52-bit space discards
    the losing bulk BEFORE the window: the ranked set is ~oversample*k
    rows per stratum regardless of stratum size. The cut is on a numeric
    PREFIX of the ranking key (monotone in it), so any cut keeping >= k
    rows keeps exactly the true top-k — results are IDENTICAL to the
    unfiltered rank (same DuckDB oracle). Strata at or below oversample*k
    rows skip the filter. The under-cut tail is a Chernoff bound —
    P[Binomial(n, 8k/n) < k] < 1e-12 at k=20, 8x slack — and raising
    ``oversample`` buys arbitrary margin for a linear window-input cost."""
    h_str = F.md5(F.concat_ws("#", F.lit(seed), F.col(id_col).cast("string")))
    h_num = F.conv(F.substring(h_str, 1, 13), 16, 10).cast("long")
    sizes = records.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    space = float(16**13)
    thr = F.when(
        F.col("_n") <= F.lit(int(oversample * k_per_stratum)), F.lit(int(space))
    ).otherwise(
        (F.lit(space) * F.lit(float(oversample * k_per_stratum)) / F.col("_n")).cast("long")
    )
    pre = (
        records.join(F.broadcast(sizes.select(stratum_col, thr.alias("_thr"))), stratum_col)
        .filter(h_num <= F.col("_thr"))
        .drop("_thr")
    )
    win = Window.partitionBy(stratum_col).orderBy(h_str, F.col(id_col))
    return (
        pre.withColumn("_r", F.row_number().over(win))
        .filter(F.col("_r") <= k_per_stratum)
        .drop("_r")
    )


def global_running_totals(
    records: DataFrame,
    sort_col: str,
    id_col: str,
    value_col: str,
    bucket_prefix_len: Union[int, str] = "auto",
) -> DataFrame:
    """Exclusive global running sum of ``value_col`` under the total order
    (sort_col, id_col) — the distributed prefix-sum, WITHOUT a
    single-partition window (same two-level construction as
    ``blocking.global_sort_ranks``: the sort key's own prefix buckets the
    data, per-bucket value sums prefix-scan on the tiny bucket table and
    broadcast back, an in-bucket window finishes the job).

    ``bucket_prefix_len`` defaults to ``"auto"`` (one extra build-time scan
    via ``blocking.adaptive_prefix_len``): a FIXED 1-char prefix silently
    funnels the most natural sort keys through one bucket — e.g. a
    zero-padded numeric key like lpad(doc_id, 8, '0') puts every row in
    bucket '0' until 10^7 docs (ADVICE r3) — while auto widens the prefix
    past the constant run until no bucket dominates. Pass an int to pin it
    (0 extra scans); the choice never changes results, only the fan-out.

    Returns (id, sk, v, cum_excl): cum_excl = sum of v over all strictly
    earlier records in sort order.
    """
    if bucket_prefix_len == "auto":
        from pilsner_spark.operators.blocking import adaptive_prefix_len

        bucket_prefix_len = adaptive_prefix_len(
            records, (), sort_col, context="global_running_totals buckets"
        )
    base = records.select(
        F.col(id_col).alias("id"),
        F.col(sort_col).alias("sk"),
        F.col(value_col).cast("long").alias("v"),
        F.substring(F.col(sort_col), 1, int(bucket_prefix_len)).alias("bk"),
    )
    sums = base.groupBy("bk").agg(F.sum("v").alias("bsum"))
    run = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select("bk", F.coalesce(F.sum("bsum").over(run), F.lit(0)).alias("off"))
    in_bucket = (
        Window.partitionBy("bk")
        .orderBy("sk", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offsets), "bk")
        .withColumn("cum_excl", F.col("off") + F.coalesce(F.sum("v").over(in_bucket), F.lit(0)))
        .select("id", "sk", "v", "cum_excl")
    )


def mix_to_proportions(
    records: DataFrame,
    domain_col: str,
    id_col: str,
    tokens_col: str,
    weights: dict,
    total_budget: int,
    seed: str = "mix",
    hash_prefix_len: int = 2,
    oversample: float = 4.0,
) -> DataFrame:
    """Domain mixing: deterministically select documents so each domain
    contributes ~its target share of a ``total_budget`` token mass — the
    data-mixing step of a pretraining-corpus build (fix the web/code/
    reference-text ratio BEFORE packing, don't hope the crawl had it).

    ``weights`` maps domain value -> relative weight; domain d's budget is
    ``total_budget * w_d / sum(w)`` tokens. Within each domain, documents
    are ordered by the md5 of (seed, id) — a reproducible shuffle, same
    device as ``stratified_sample`` — and a document is selected iff the
    EXCLUSIVE running token total of earlier documents is still under the
    domain budget (offset-packing semantics: the straddling document is
    kept, overflow bounded by one document per domain). Domains absent
    from ``weights`` are dropped; a domain with fewer tokens than its
    budget is kept whole (the mix is then token-starved for that domain —
    visible because its returned token mass < budget, never padded).

    Returns (id, domain, n_tokens, cum_excl) for selected documents.
    Deterministic: same weights + seed + corpus -> same selection,
    regardless of partitioning — re-runs and engine swaps reproduce it.

    Scale shape: NO per-domain single-task window. The running total uses
    the (domain, hash-prefix) two-level construction — the md5 sort key is
    uniform by construction, so a fixed ``hash_prefix_len`` of 2 gives 256
    evenly-loaded buckets per domain (no adaptive scan needed, unlike
    user-supplied sort keys). A hash-quantile pre-filter caps window input
    at ~``oversample`` x the winning fraction of each over-budget domain,
    same monotone-prefix-cut argument as ``stratified_sample`` (any cut
    retaining >= budget tokens retains exactly the true winner set; the
    expected winner token share is budget/domain_total, so 4x slack makes
    an under-cut a <1e-12 tail even before the straddle slack)."""
    total_w = float(sum(weights.values()))
    rows = [(d, int(total_budget * w / total_w)) for d, w in sorted(weights.items())]
    spark = records.sparkSession
    budgets = spark.createDataFrame(rows, ["domain", "budget"])
    h_str = F.md5(F.concat_ws("#", F.lit(seed), F.col(id_col).cast("string")))
    base = records.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        F.col(tokens_col).cast("long").alias("v"),
        h_str.alias("sk"),
    ).join(F.broadcast(budgets), "domain")

    space = float(16**13)
    dtot = base.groupBy("domain").agg(F.sum("v").alias("_dtot"), F.first("budget").alias("_b"))
    thr = F.when(F.col("_dtot") <= F.col("_b"), F.lit(int(space))).otherwise(
        F.least(
            F.lit(space),
            F.lit(space) * F.lit(oversample) * F.col("_b") / F.col("_dtot"),
        ).cast("long")
    )
    pre = (
        base.join(F.broadcast(dtot.select("domain", thr.alias("_thr"))), "domain")
        .filter(F.conv(F.substring("sk", 1, 13), 16, 10).cast("long") <= F.col("_thr"))
        .drop("_thr")
    )

    bucketed = pre.withColumn("bk", F.substring("sk", 1, hash_prefix_len))
    sums = bucketed.groupBy("domain", "bk").agg(F.sum("v").alias("bsum"))
    run = (
        Window.partitionBy("domain").orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "domain", "bk", F.coalesce(F.sum("bsum").over(run), F.lit(0)).alias("off")
    )
    in_bucket = (
        Window.partitionBy("domain", "bk")
        .orderBy("sk", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), ["domain", "bk"])
        .withColumn("cum_excl", F.col("off") + F.coalesce(F.sum("v").over(in_bucket), F.lit(0)))
        .filter(F.col("cum_excl") < F.col("budget"))
        .select("id", "domain", F.col("v").alias("n_tokens"), "cum_excl")
    )


def chunk_documents(
    records: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's whitespace-token stream into fixed-size
    chunks with ``overlap`` tokens of context carried between consecutive
    chunks (stride = chunk_tokens - overlap) — the long-document
    preprocessing step that runs before packing/training so no sequence
    exceeds the model context. The final chunk may be short; a chunk
    starting inside the last ``overlap`` tokens would be pure repeat, so
    starts stop at max(1, n_tokens - overlap). Empty/whitespace-only
    documents emit one empty chunk (total coverage — every doc stays
    visible downstream).

    Returns (doc_id, chunk_idx, n_tokens, chunk_text). Pure projection
    (sequence + slice + posexplode under codegen): zero shuffles, zero
    UDFs — scan-speed at any corpus size, and the explode multiplies rows
    before any wide transform so downstream packing sees chunks as plain
    documents."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    from pilsner_spark.functions.text import tokens

    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.size(toks) - overlap), F.lit(stride)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_tokens))
    return records.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").alias("n_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


def pack_by_budget(
    records: DataFrame,
    sort_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    bucket_prefix_len: Union[int, str] = "auto",
) -> DataFrame:
    """Sequence packing: assign each document a bin so every bin holds
    ~``budget`` tokens of consecutive (by sort order) documents —
    bin_id = floor(exclusive-running-token-total / budget).

    This is *offset packing* (the deterministic, fully-parallel scheme):
    bins are contiguous token ranges of the globally ordered stream, so a
    document can straddle a budget boundary — it lands in the bin its FIRST
    token falls in, and that bin overflows by at most one document. The
    alternatives (first-fit-decreasing bin packing) are inherently
    sequential; offset packing is the one that scales to 10^12 documents
    while staying reproducible, and trainers absorb the bounded overflow by
    truncation or bridging. ``offset_in_bin`` gives the document's start
    position inside its bin, so downstream concat/pad logic needs no second
    pass. Choose ``sort_col`` to co-locate what should share a bin (e.g.
    source or language prefix)."""
    totals = global_running_totals(records, sort_col, id_col, tokens_col, bucket_prefix_len)
    return totals.select(
        F.col("id"),
        F.col("v").alias("n_tokens"),
        F.floor(F.col("cum_excl") / budget).alias("bin_id"),
        (F.col("cum_excl") - F.floor(F.col("cum_excl") / budget) * budget).alias("offset_in_bin"),
    )
