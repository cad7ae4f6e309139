"""Pairwise scoring: candidate pairs -> match edges.

Features per north_star: batched Jaro-Winkler + Levenshtein on normalized
text, token Jaccard, and the pilsner compiled-dictionary hit (shared
resolved entity from mention extraction — the feature that separates the
hard ambiguous pairs, e.g. identical 'conflicting refrigerator' surfaces
belonging to different entities).

Physical shape: the pair table joins the per-turn feature table twice on
turn_key (shuffle joins; the per-turn table is the smaller side and often
broadcastable at moderate scale — Spark/AQE decides). Features are computed
in one projection; only the JW feature leaves the JVM (one Arrow round-trip
per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pilsner_spark.functions.similarity import (
    jaro_winkler_udf,
    levenshtein_ratio,
    token_jaccard,
)
from pilsner_spark.operators.blocking import tokens_col


def turn_features(turns: DataFrame, mentions_entities: DataFrame) -> DataFrame:
    """One row per turn: normalized text, token set, resolved entity set."""
    return (
        turns.select("turn_key", "norm_text")
        .withColumn("tokens", F.array_distinct(tokens_col("norm_text")))
        .join(mentions_entities.select("turn_key", "mention_entities"), "turn_key", "left")
        .withColumn("mention_entities", F.coalesce("mention_entities", F.array()))
    )


def score_pairs(
    pairs: DataFrame,
    features: DataFrame,
    jw_threshold: float = 0.92,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Score every candidate pair; returns the scored table with a boolean
    ``is_match``.

    Decision rule: a shared dictionary entity is a match; otherwise high
    textual similarity (near-duplicate turns) matches. Thresholds are
    engine parameters surfaced in pipeline params/lineage.
    """
    fa = features.select(
        F.col("turn_key").alias("key_a"),
        F.col("norm_text").alias("norm_a"),
        F.col("tokens").alias("tokens_a"),
        F.col("mention_entities").alias("entities_a"),
    )
    fb = features.select(
        F.col("turn_key").alias("key_b"),
        F.col("norm_text").alias("norm_b"),
        F.col("tokens").alias("tokens_b"),
        F.col("mention_entities").alias("entities_b"),
    )
    # join strategy is left to AQE: when the pair table dwarfs the per-turn
    # feature table it broadcasts, otherwise sort-merge — forcing broadcast
    # here serializes a wide (token-array) table through the driver twice
    scored = (
        pairs.join(fa, "key_a").join(fb, "key_b")
        .withColumn("shared_entity", F.arrays_overlap("entities_a", "entities_b"))
        .withColumn("jaccard", token_jaccard(F.col("tokens_a"), F.col("tokens_b")))
    )
    # Levenshtein (O(len^2) JVM) and Jaro-Winkler (Python UDF) are the
    # expensive features: compute them only where the cheap set features
    # leave the decision open (manual predicate pushdown; a shared-entity
    # pair matches regardless, a low-jaccard pair cannot reach threshold)
    undecided = ~F.col("shared_entity") & (F.col("jaccard") >= jaccard_threshold * 0.5)
    scored = scored.withColumn(
        "lev_ratio",
        F.when(undecided, levenshtein_ratio(F.col("norm_a"), F.col("norm_b"))).otherwise(F.lit(0.0)),
    ).withColumn(
        "jw", F.when(undecided, jaro_winkler_udf(F.col("norm_a"), F.col("norm_b"))).otherwise(F.lit(0.0))
    )
    return scored.withColumn(
        "is_match",
        F.col("shared_entity")
        | ((F.col("jw") >= jw_threshold) & (F.col("jaccard") >= jaccard_threshold)),
    ).select(
        "key_a", "key_b", "shared_entity", "jaccard", "lev_ratio", "jw", "is_match"
    )


def match_edges(scored: DataFrame) -> DataFrame:
    return scored.filter(F.col("is_match")).select("key_a", "key_b")
