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
    """One row per turn: normalized text, token set (plus its xxhash64
    image), resolved entity set.

    ``htokens`` exists because the pairwise jaccard runs O(|pairs|) times
    while tokenization runs O(|turns|) times: hashing each token once here
    lets the hot loop intersect fixed-width longs instead of strings
    (measured ~8x cheaper per pair; 64-bit collisions are negligible for a
    similarity feature)."""
    return (
        turns.select("turn_key", "norm_text")
        .withColumn("tokens", F.array_distinct(tokens_col("norm_text")))
        .withColumn("htokens", F.transform("tokens", lambda t: F.xxhash64(t)))
        .join(mentions_entities.select("turn_key", "mention_entities"), "turn_key", "left")
        .withColumn("mention_entities", F.coalesce("mention_entities", F.array()))
    )


def score_pairs(
    pairs: DataFrame,
    features: DataFrame,
    jw_threshold: float = 0.92,
    jaccard_threshold: float = 0.6,
    broadcast_features: bool = False,
) -> DataFrame:
    """Score every candidate pair; returns the scored table with a boolean
    ``is_match``.

    Decision rule: a shared dictionary entity is a match; otherwise high
    textual similarity (near-duplicate turns) matches — UNLESS both sides
    resolved to disjoint entity sets (``conflicting_entities``), which
    vetoes the similarity match: on template-heavy corpora (same
    boilerplate around different product names) similarity alone would
    merge distinct entities. Thresholds are engine parameters surfaced in
    pipeline params/lineage.
    """
    # Join payload: keys + fixed-width token hashes + entity sets ONLY.
    # The normalized text is deliberately NOT joined: at |pairs| >>
    # |turns| the dominant scoring cost is copying the joined feature
    # payload once per pair, and the ~100-char norm strings double it while
    # being needed only for the rare undecided rows (see below).
    side_cols = ["htokens", "mention_entities"] + ([] if broadcast_features else ["norm_text"])

    def side(suffix: str) -> DataFrame:
        renames = {"htokens": "htokens_", "mention_entities": "entities_", "norm_text": "norm_"}
        sel = [F.col("turn_key").alias(f"key_{suffix}")] + [
            F.col(c).alias(renames[c] + suffix) for c in side_cols
        ]
        return features.select(*sel)

    fa, fb = side("a"), side("b")
    # Join strategy: the pair table is |pairs| ~ O(block_size x turns) while
    # the per-turn feature table is O(turns) — at every realistic setting the
    # fact/dim ratio is huge. When the caller knows the feature table fits in
    # executor memory (``broadcast_features``), force broadcast-hash joins:
    # the scoring stage then has NO shuffle at all (scan pairs -> two
    # map-side hash joins -> project -> write), which is what keeps it
    # linearly scalable — a sort-merge join here moves |pairs| x width
    # through the shuffle twice. When the feature table is too big for a
    # broadcast (10^9+ turns per job slice), leave it to AQE/sort-merge.
    if broadcast_features:
        fa, fb = F.broadcast(fa), F.broadcast(fb)
    scored = (
        pairs.join(fa, "key_a").join(fb, "key_b")
        .withColumn("shared_entity", F.arrays_overlap("entities_a", "entities_b"))
        # both sides resolved by the dictionary, to DISJOINT entity sets:
        # the strongest negative signal available — two near-identical
        # turns mentioning different entities (same template, different
        # product name) must not be merged on text similarity alone
        .withColumn(
            "conflicting_entities",
            (F.size("entities_a") > 0) & (F.size("entities_b") > 0) & ~F.col("shared_entity"),
        )
        .withColumn("jaccard", token_jaccard(F.col("htokens_a"), F.col("htokens_b")))
    )
    # Levenshtein (O(len^2)) and Jaro-Winkler are the expensive features:
    # compute them only where the cheap set features leave the decision
    # open (a shared-entity pair matches regardless, a low-jaccard pair
    # cannot reach threshold). `F.when(cond, udf(...))` would NOT achieve
    # that: Catalyst extracts Python UDFs into an ArrowEvalPython node
    # that evaluates the UDF for EVERY input row before the conditional
    # projection (measured 10x+ stage slowdown at 5M pairs with <0.001%
    # undecided). Masking the UDF *inputs* instead keeps one join pass
    # while the character-level work runs only on genuinely undecided rows.
    undecided = ~F.col("shared_entity") & (F.col("jaccard") >= jaccard_threshold * 0.5)
    if broadcast_features:
        # Fetch norm_text for undecided rows only, via two more broadcast
        # hash joins keyed on the MASKED keys (null key -> no match -> null
        # norm). The norm table stays executor-side the whole way — no
        # driver collect, no per-Python-worker copy of a broadcast dict
        # (the previous design collected O(turns) text through the driver
        # and unpickled it once per UDF worker). Decided rows join nothing,
        # so the expensive-feature columns stay null exactly where the
        # masking wants them.
        norms_a = F.broadcast(
            features.select(F.col("turn_key").alias("_nk_a"), F.col("norm_text").alias("norm_a"))
        )
        norms_b = F.broadcast(
            features.select(F.col("turn_key").alias("_nk_b"), F.col("norm_text").alias("norm_b"))
        )
        scored = (
            scored.withColumn("_uk_a", F.when(undecided, F.col("key_a")))
            .withColumn("_uk_b", F.when(undecided, F.col("key_b")))
            .join(norms_a, F.col("_uk_a") == F.col("_nk_a"), "left")
            .join(norms_b, F.col("_uk_b") == F.col("_nk_b"), "left")
            .drop("_uk_a", "_uk_b", "_nk_a", "_nk_b")
        )
        mask = lambda c: F.col(c)  # noqa: E731 — masking already applied by the joins
    else:
        mask = lambda c: F.when(undecided, F.col(c))  # noqa: E731
    scored = scored.withColumns(
        {
            "lev_ratio": F.coalesce(
                F.when(undecided, levenshtein_ratio(mask("norm_a"), mask("norm_b"))),
                F.lit(0.0),
            ),
            "jw": F.coalesce(jaro_winkler_udf(mask("norm_a"), mask("norm_b")), F.lit(0.0)),
        }
    )
    return scored.withColumn(
        "is_match",
        F.col("shared_entity")
        | (
            ~F.col("conflicting_entities")
            & (F.col("jw") >= jw_threshold)
            & (F.col("jaccard") >= jaccard_threshold)
        ),
    ).select(
        "key_a", "key_b", "shared_entity", "conflicting_entities", "jaccard", "lev_ratio", "jw", "is_match"
    )


def match_edges(scored: DataFrame) -> DataFrame:
    # distinct: the scored table may contain duplicate pairs (see
    # candidate_pairs(dedupe=False)); deduping here touches only the small
    # edge set instead of the full pair table
    return scored.filter(F.col("is_match")).select("key_a", "key_b").distinct()


# -- split scored plan -------------------------------------------------------
#
# The single-pass score_pairs above ships EVERY pair row through the
# ArrowEvalPython node for the JW UDF, even though the masked inputs are
# null on the (typically ~100%) decided rows — linear and vectorized, but
# a measurable per-row serialization + pipeline-barrier tax on the
# dominant stage. The checkpointing pipeline can do better because the
# base table is materialized anyway: stage 1 computes the cheap set
# features with NO Python in the plan (pure whole-stage codegen), stage 2
# re-reads the checkpoint with a PUSHED undecided=true filter and runs the
# character-level kernels on that slice only. This is a plan split rather
# than a conditional because `F.when(cond, udf(...))` evaluates the UDF on
# all rows (see the masking note in score_pairs) — and a same-plan
# filter+union would recompute the join subtree twice (Catalyst does not
# materialize common subtrees).


def undecided_expr(jaccard_threshold: float = 0.6):
    """Rows where the cheap set features leave the match decision open: a
    shared-entity pair matches regardless; a pair far below the jaccard
    gate cannot reach it (0.5 safety factor, same margin score_pairs uses)."""
    return ~F.col("shared_entity") & (F.col("jaccard") >= jaccard_threshold * 0.5)


def score_pairs_base(
    pairs: DataFrame,
    features: DataFrame,
    jaccard_threshold: float = 0.6,
    broadcast_features: bool = False,
) -> DataFrame:
    """Stage 1 of the split plan: set features for every candidate pair —
    (shared_entity, conflicting_entities, jaccard, undecided). Plan shape:
    scan -> two (broadcast) hash joins -> project; zero Python, zero extra
    Exchange when ``broadcast_features``."""

    def side(suffix: str) -> DataFrame:
        return features.select(
            F.col("turn_key").alias(f"key_{suffix}"),
            F.col("htokens").alias(f"htokens_{suffix}"),
            F.col("mention_entities").alias(f"entities_{suffix}"),
        )

    fa, fb = side("a"), side("b")
    if broadcast_features:
        fa, fb = F.broadcast(fa), F.broadcast(fb)
    return (
        pairs.join(fa, "key_a")
        .join(fb, "key_b")
        .withColumn("shared_entity", F.arrays_overlap("entities_a", "entities_b"))
        .withColumn(
            "conflicting_entities",
            (F.size("entities_a") > 0) & (F.size("entities_b") > 0) & ~F.col("shared_entity"),
        )
        .withColumn("jaccard", token_jaccard(F.col("htokens_a"), F.col("htokens_b")))
        .withColumn("undecided", undecided_expr(jaccard_threshold))
        .select("key_a", "key_b", "shared_entity", "conflicting_entities", "jaccard", "undecided")
    )


def jw_scores_for_undecided(
    base: DataFrame, features: DataFrame, broadcast_features: bool = False
) -> DataFrame:
    """Stage 2: Jaro-Winkler + Levenshtein on the undecided slice only.
    Reading ``base`` from its checkpoint pushes undecided=true into the
    parquet scan; the slice is deduplicated (duplicate pairs from
    candidate_pairs(dedupe=False) would otherwise multiply rows through
    the later join-back) and norm_text arrives via two (broadcast) hash
    joins sized by the slice, not the pair table."""
    und = (
        base.filter(F.col("undecided"))
        .select("key_a", "key_b", "conflicting_entities", "jaccard")
        .dropDuplicates(["key_a", "key_b"])
    )
    na = features.select(F.col("turn_key").alias("key_a"), F.col("norm_text").alias("norm_a"))
    nb = features.select(F.col("turn_key").alias("key_b"), F.col("norm_text").alias("norm_b"))
    if broadcast_features:
        na, nb = F.broadcast(na), F.broadcast(nb)
    return (
        und.join(na, "key_a")
        .join(nb, "key_b")
        .withColumns(
            {
                "lev_ratio": F.coalesce(levenshtein_ratio(F.col("norm_a"), F.col("norm_b")), F.lit(0.0)),
                "jw": F.coalesce(jaro_winkler_udf(F.col("norm_a"), F.col("norm_b")), F.lit(0.0)),
            }
        )
        .select("key_a", "key_b", "conflicting_entities", "jaccard", "lev_ratio", "jw")
    )


def split_match_edges(
    base: DataFrame,
    jw_scores: DataFrame,
    jw_threshold: float = 0.92,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Match edges without joining the slice back to the pair table:
    decided matches are exactly the shared-entity pairs (jw=0 elsewhere),
    similarity matches live entirely in the jw slice (which carries its
    own jaccard/conflict columns). The two sets are disjoint by
    construction (the slice is ~shared_entity); distinct() collapses
    duplicate pairs on the small edge set, as match_edges does."""
    shared = base.filter(F.col("shared_entity")).select("key_a", "key_b")
    sim = jw_scores.filter(
        ~F.col("conflicting_entities")
        & (F.col("jw") >= jw_threshold)
        & (F.col("jaccard") >= jaccard_threshold)
    ).select("key_a", "key_b")
    return shared.union(sim).distinct()


def star_shared_edges(blocks: DataFrame, turn_entities: DataFrame) -> DataFrame:
    """Connectivity-equivalent sparsification of the shared-entity match
    edges: per (block key, entity) group, connect every member turn to the
    group's MINIMUM turn instead of to every other member.

    Why it's exact: a shared-entity match edge exists iff two turns share a
    block AND an entity (score_pairs' ``shared_entity`` over candidate
    pairs) — i.e. the pairwise edges form a clique on each (block, entity)
    group, and a star spans a clique's vertices with identical transitive
    closure, so connected components are unchanged (parity-pinned by
    test_star_edges_cluster_parity).

    Why it matters: the pairwise edge mass is quadratic in group size
    (millions of edges on the synthetic corpus; the dominant hidden cost of
    the clustering stage was materializing it), the star is LINEAR in block
    membership rows — the same clique-to-linear move the dedup family makes
    with bucketed pair expansion. Pass the SAME salted block view candidate
    pairs were built from, so edge scope matches pair scope exactly."""
    ent = turn_entities.select("turn_key", F.explode("mention_entities").alias("entity"))
    membership = blocks.join(ent, "turn_key").select("block_key", "entity", "turn_key")
    hubs = membership.groupBy("block_key", "entity").agg(F.min("turn_key").alias("hub"))
    return (
        membership.join(hubs, ["block_key", "entity"])
        .filter(F.col("turn_key") != F.col("hub"))
        .select(F.col("hub").alias("key_a"), F.col("turn_key").alias("key_b"))
        .distinct()
    )


def star_match_edges(
    blocks: DataFrame,
    turn_entities: DataFrame,
    jw_scores: DataFrame,
    jw_threshold: float = 0.92,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Full match-edge set for clustering, with the shared-entity component
    sparsified to stars (``star_shared_edges``) and the similarity
    component taken pairwise from the tiny jw slice — same components as
    ``split_match_edges``, linear edge mass."""
    sim = jw_scores.filter(
        ~F.col("conflicting_entities")
        & (F.col("jw") >= jw_threshold)
        & (F.col("jaccard") >= jaccard_threshold)
    ).select("key_a", "key_b")
    return star_shared_edges(blocks, turn_entities).unionByName(sim).distinct()


def finalize_scored(
    base: DataFrame,
    jw_scores: DataFrame,
    jw_threshold: float = 0.92,
    jaccard_threshold: float = 0.6,
    broadcast_jw: bool = True,
) -> DataFrame:
    """The full scored view with score_pairs' exact schema: base pairs
    left-joined to the (deduplicated) jw slice — a broadcast hash join
    when the slice fits (``broadcast_jw``), so consumers needing per-pair
    jw/lev columns pay one map-side join, never a shuffle of |pairs|."""
    j = jw_scores.select("key_a", "key_b", "lev_ratio", "jw")
    if broadcast_jw:
        j = F.broadcast(j)
    return (
        base.join(j, ["key_a", "key_b"], "left")
        .withColumns(
            {
                "lev_ratio": F.coalesce("lev_ratio", F.lit(0.0)),
                "jw": F.coalesce("jw", F.lit(0.0)),
            }
        )
        .withColumn(
            "is_match",
            F.col("shared_entity")
            | (
                ~F.col("conflicting_entities")
                & (F.col("jw") >= jw_threshold)
                & (F.col("jaccard") >= jaccard_threshold)
            ),
        )
        .select(
            "key_a", "key_b", "shared_entity", "conflicting_entities", "jaccard", "lev_ratio", "jw", "is_match"
        )
    )


def threshold_sweep(
    pairs: DataFrame,
    thresholds,
    score_col: str = "score",
    label_col: str = "label",
    score_decimals: int = 9,
) -> DataFrame:
    """Distributed precision/recall curve: confusion counts + P/R/F1 at
    every threshold, from ONE pass over the pair mass.

    A pair is predicted positive at threshold t when score >= t; truth is
    ``label_col`` >= 0.5. Returns EXACTLY one row per threshold — including
    on an empty pair table, where every confusion count is 0 and the
    0-denominator conventions apply — as
    (threshold, tp, fp, fn, tn, precision, recall, f1), metrics rounded to
    6 dp (0-denominator conventions: precision/recall are 1.0 with no
    predicted/actual positives, matching evaluate_f1).

    Pairs with a NULL score or NULL label are EXCLUDED from all four
    confusion counts (they are filtered explicitly before the histogram,
    not silently nulled out of the sums): an unscored or unlabeled pair has
    no defined position on a PR curve. Callers needing the exclusion count
    should difference ``pairs.count()`` against ``tp+fp+fn+tn`` at any one
    threshold.

    Physical shape — the part that matters at 10^12 pairs: the pair table
    is aggregated ONCE into an O(distinct rounded scores) histogram
    (hash agg, map-side partials), and the threshold sweep runs over that
    tiny histogram x len(thresholds) — the pair mass is never re-scanned
    per threshold and never expands. Scores are rounded to
    ``score_decimals`` before histogramming and thresholds compare
    against the rounded value. Honest bound: the default 9 dp keeps the
    repo's pre-rounded similarity scores bit-exact but does NOT compress
    genuinely continuous scores (random doubles stay distinct at 9 dp) —
    for a model-score column, pass 4 (caps the histogram at ~10^4 buckets,
    far finer than any PR curve needs, so the histogram x thresholds
    stream stays trivially small)."""
    t_df = pairs.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    hist = (
        pairs.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.round(F.col(score_col), score_decimals).alias("s"),
            (F.col(label_col).cast("double") >= 0.5).alias("pos"),
        )
        .groupBy("s", "pos")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    conf = (
        F.broadcast(t_df)
        .join(hist, F.lit(True))
        .groupBy("threshold")
        .agg(
            F.sum(F.when((F.col("s") >= F.col("threshold")) & F.col("pos"), F.col("n")).otherwise(F.lit(0))).alias("tp"),
            F.sum(F.when((F.col("s") >= F.col("threshold")) & ~F.col("pos"), F.col("n")).otherwise(F.lit(0))).alias("fp"),
            F.sum(F.when((F.col("s") < F.col("threshold")) & F.col("pos"), F.col("n")).otherwise(F.lit(0))).alias("fn"),
            F.sum(F.when((F.col("s") < F.col("threshold")) & ~F.col("pos"), F.col("n")).otherwise(F.lit(0))).alias("tn"),
        )
    )
    # an empty histogram (empty input, or all-null scores/labels) must still
    # yield one all-zero row per threshold, not zero rows: re-anchor on the
    # threshold table (both sides are O(len(thresholds)) here — trivial join)
    conf = t_df.join(conf, "threshold", "left").select(
        "threshold",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("tp", "fp", "fn", "tn")],
    )
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(1.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fp"))
    )
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(1.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fn"))
    )
    return (
        conf.withColumn("p", prec)
        .withColumn("r", rec)
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            "tn",
            F.round(F.col("p"), 6).alias("precision"),
            F.round(F.col("r"), 6).alias("recall"),
            F.round(
                F.when(F.col("p") + F.col("r") == 0, F.lit(0.0)).otherwise(
                    2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r"))
                ),
                6,
            ).alias("f1"),
        )
    )
