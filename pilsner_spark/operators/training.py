"""Training-set construction from ER output: labeled pairs for a learned
matcher.

A production entity-resolution loop eventually trains a pairwise matcher
(or re-ranker) on its own resolved output; the data it needs is exactly
what the pipeline already has — cluster assignments (positives) and
blocking co-candidates (HARD negatives: pairs the blocker considered
similar enough to compare but the resolver kept apart, far more
informative than random negatives). This module turns those two tables
into a labeled, reproducible pair dataset.

Scale shapes (same discipline as the dedup family):
* positives are STAR pairs (member, cluster-minimum) — linear in corpus
  size, never the per-cluster clique;
* negatives expand inside capped block buckets with the higher-order
  array device (one bucketing shuffle, no self-join), then keep a
  deterministic md5-hash sample — the sampling needs no count job, no
  RNG state, and reproduces bit-identically on any engine/partitioning;
* oversized blocks are dropped from negative generation by the cap —
  callers needing visibility reuse ``blocking.purged_blocks_report``'s
  pattern (the cap parameter is shared).

Reference anchor: pgolo/pilsner has no trainable matcher; this is the
driver brief's training-data mandate applied to the engine's own output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pilsner_spark.functions.text import md5_long

__all__ = ["matcher_training_pairs"]


def matcher_training_pairs(
    assignments: DataFrame,
    blocks: DataFrame,
    neg_sample_frac: float = 1.0,
    id_col: str = "turn_key",
    cluster_col: str = "cluster_id",
    block_col: str = "block_key",
    max_block_size: int = 200,
    seed: str = "pairs",
) -> DataFrame:
    """Labeled matcher-training pairs: (id_a, id_b, label, source) with
    id_a < id_b.

    * label 1.0, source 'same_cluster': star positives — every member
      paired with its cluster's minimum id (the canonical), so positive
      mass is linear in members, not quadratic, and transitivity is
      represented through the shared canonical.
    * label 0.0, source 'hard_negative': same-block different-cluster
      pairs, expanded inside capped buckets and kept when
      md5_long(seed # id_a # id_b) < neg_sample_frac * 2^60 — an exact,
      engine-portable Bernoulli(neg_sample_frac) over pairs. A pair
      sharing several blocks is sampled once (distinct before the coin
      flip, so the coin is per-pair, not per-co-occurrence).

    Singleton clusters contribute no positives; blocks above
    ``max_block_size`` contribute no negatives (documented cap, same
    recall/visibility trade-off as minhash_candidate_pairs)."""
    a = assignments.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("cl"))
    canon = a.groupBy("cl").agg(F.min("id").alias("canon"))
    positives = (
        a.join(canon, "cl")
        .filter(F.col("id") != F.col("canon"))
        .select(
            F.least("id", "canon").alias("id_a"),
            F.greatest("id", "canon").alias("id_b"),
            F.lit(1.0).alias("label"),
            F.lit("same_cluster").alias("source"),
        )
    )

    from pilsner_spark.operators.dedup import _bucket_pairs

    members = (
        blocks.select(F.col(block_col).alias("bk"), F.col(id_col).alias("id"))
        .join(a, "id")
        .groupBy("bk")
        .agg(F.sort_array(F.collect_set(F.struct("id", "cl"))).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= max_block_size))
    )
    cross = (
        members.select(F.explode(_bucket_pairs(F.col("ms"))).alias("p"))
        .select(
            F.col("p.id_a.id").alias("id_a"),
            F.col("p.id_a.cl").alias("cl_a"),
            F.col("p.id_b.id").alias("id_b"),
            F.col("p.id_b.cl").alias("cl_b"),
        )
        .filter(F.col("cl_a") != F.col("cl_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    threshold = int(neg_sample_frac * float(2 ** 60))
    negatives = cross.filter(
        md5_long(F.concat_ws("#", F.lit(seed), F.col("id_a").cast("string"), F.col("id_b").cast("string")))
        < F.lit(threshold)
    ).select(
        "id_a", "id_b", F.lit(0.0).alias("label"), F.lit("hard_negative").alias("source")
    )
    return positives.unionByName(negatives)
