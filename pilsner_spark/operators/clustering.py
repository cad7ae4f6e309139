"""Transitive clustering: iterative connected components (hash-to-min).

Pure DataFrame loop — no GraphFrames dependency. Each vertex's label starts
as its own id and is repeatedly lowered to the minimum label in its
neighborhood (including itself); convergence when no label changes.
``localCheckpoint`` every iteration truncates lineage so plans stay bounded
(SURVEY.md §7.4 risk 5). For entity-resolution graphs (small dense clusters)
this converges in a handful of rounds; worst case is the longest path graph,
bounded by ``max_iter``.

The label domain is the ``turn_key`` STRING itself, not a 64-bit hash of
it: at the 10^12-turn design point the birthday bound puts expected
xxhash64 collisions in the tens of thousands, and every collision silently
merges two unrelated turns (and, transitively, their clusters). String
labels are collision-free by construction and make cluster ids
deterministic and meaningful (the lexicographic-minimum member key). The
cost is wider shuffle rows in the label-propagation loop (~25 B vs 8 B) —
a constant factor on the smallest tables in the pipeline (vertices and
edges, both O(matches), dwarfed by the pair table upstream) — and it
removes two mapping joins the hashed-id version needed.
"""

from __future__ import annotations

import logging
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame, max_iter: int = 25, stats: Optional[dict] = None
) -> DataFrame:
    """edges: (key_a, key_b) string pairs. Returns (turn_key, cluster_id)
    where cluster_id is the component's minimum turn_key.

    Singleton vertices (no edges) are not returned; callers union them back
    with their own key as cluster id.

    ``stats``: mutable dict receiving ``{'iterations', 'converged',
    'unconverged_labels'}``. Exhausting ``max_iter`` with labels still
    changing would silently return split clusters (a >max_iter-diameter
    similarity chain — realistic for near-dup chains at scale), violating
    the no-silent-truncation principle — so non-convergence is ALWAYS
    logged at warning level, and ``unconverged_labels`` reports how many
    labels were still moving (one extra count on the small label table,
    charged only in the failure case).
    """
    e = edges.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
    # undirected: keep both directions for the neighbor-min aggregation
    adj = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct().localCheckpoint()

    labels = adj.select(F.col("src").alias("vid")).distinct().withColumn("label", F.col("vid"))
    converged = False
    iterations = 0
    changed = 0
    for i in range(max_iter):
        iterations += 1
        nbr_min = (
            adj.join(labels, adj.dst == labels.vid)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # ONE Spark job per iteration: the changed-label count rides the
        # checkpoint job as an Observation instead of a second count action
        # — at web scale the loop cost is per-iteration JOB overhead
        # (driver barriers), not data volume, so halving the jobs halves
        # the stage's fixed cost (measured: the tables are tiny after the
        # star sparsification, yet each extra action costs ~1s of
        # scheduling latency per iteration)
        from pyspark.sql import Observation

        obs = Observation(f"cc_changed_{i}")
        new_labels = (
            labels.join(nbr_min, labels.vid == nbr_min.src, "left")
            .select(
                "vid",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("new_label"),
                "label",
            )
            .observe(obs, F.sum((F.col("new_label") != F.col("label")).cast("long")).alias("changed"))
            .localCheckpoint()
        )
        changed = int(obs.get["changed"] or 0)
        labels = new_labels.select("vid", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
    unconverged_labels = 0
    if not converged:
        unconverged_labels = changed
        _LOG.warning(
            "connected_components exhausted max_iter=%d with %d labels still changing; "
            "returned clusters may be split (raise max_iter)",
            max_iter,
            unconverged_labels,
        )
    if stats is not None:
        stats.update(
            {"iterations": iterations, "converged": converged, "unconverged_labels": unconverged_labels}
        )
    return labels.select(F.col("vid").alias("turn_key"), F.col("label").alias("cluster_id"))


def cluster_turns(
    all_turns: DataFrame, edges: DataFrame, max_iter: int = 25, stats: Optional[dict] = None
) -> DataFrame:
    """Full clustering output: every turn gets a cluster id; turns outside
    any match edge become singletons keyed by their own turn_key."""
    comp = connected_components(edges, max_iter=max_iter, stats=stats)
    return (
        all_turns.select("turn_key")
        .join(comp, "turn_key", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("turn_key")))
    )
