"""Structured Streaming variants of the recognition pipeline.

The reference is strictly batch (SURVEY.md §2.3: no streaming anywhere);
these operators extend the engine to continuous transcript ingestion — the
shape a production deployment needs when transcripts arrive as a feed:

* ``streaming_mentions``    — the same broadcast-model mapInPandas scan,
  applied to a streaming DataFrame (mapInPandas is streaming-safe: the scan
  is stateless per row).
* ``windowed_entity_counts`` — watermarked sliding-window mention counts
  (late turns are handled by the watermark, not dropped silently).
* ``incremental_cluster_assignments`` — foreachBatch bridge: each
  micro-batch of mentions upserts (turn, entity) observations into the
  batch clustering tables via the same catalog the batch pipeline uses, so
  batch and streaming share one storage layout.
* ``streaming_exact_dedup`` — custom stateful operator
  (``applyInPandasWithState``): first-occurrence pass-through keyed by
  text hash; duplicates arriving in any later micro-batch are dropped.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pilsner_spark.core.model import CompiledModel
from pilsner_spark.operators.mentions import extract_mentions_df


def streaming_mentions(stream_df: DataFrame, model: CompiledModel) -> DataFrame:
    """Mention extraction over a streaming transcripts DataFrame
    (same schema contract as the batch operator)."""
    return extract_mentions_df(stream_df, model)


def windowed_entity_counts(
    stream_df: DataFrame,
    model: CompiledModel,
    window: str = "10 minutes",
    slide: Optional[str] = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed counts of entity mentions — the streaming
    aggregation pattern (event time = the turn's ts column). The watermark
    is applied to the scan output's ts column (mapInPandas does not carry
    watermark metadata through)."""
    mentions = extract_mentions_df(stream_df, model, text_col="text", passthrough_cols=("ts",))
    exploded = mentions.withWatermark("ts", watermark).select("ts", F.explode("entity_ids").alias("entity_id"))
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        exploded.groupBy(win.alias("w"), "entity_id")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "entity_id",
            "n_mentions",
        )
    )


def incremental_cluster_assignments(
    stream_df: DataFrame,
    model: CompiledModel,
    workdir: str,
    checkpoint_dir: Optional[str] = None,
):
    """foreachBatch bridge between streaming ingestion and batch clustering.

    Each micro-batch: extract mentions -> per-turn entity sets -> append to
    the accumulated observation table -> recluster transitively over ALL
    observations (turns sharing an entity, directly or through a chain,
    share a cluster) -> overwrite the cluster table. Batch and streaming
    share one storage layout (plain parquet under ``workdir``), so the
    batch pipeline's consumers read the same tables.

    Clustering uses the bipartite trick: edges (turn_key, entity-node) fed
    to the same hash-to-min connected components as the batch path — a
    turn-turn self-join per entity would square the hot entities instead.

    Returns the StreamingQuery (caller awaits/stops it).
    """
    import os

    from pilsner_spark.operators.blocking import with_turn_key
    from pilsner_spark.operators.clustering import connected_components
    from pilsner_spark.operators.mentions import turn_entities_df

    obs_path = os.path.join(workdir, "stream_turn_entities")
    clusters_path = os.path.join(workdir, "stream_entity_clusters")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        me = with_turn_key(turn_entities_df(extract_mentions_df(batch_df, model)))
        me.select("turn_key", "mention_entities").write.mode("append").parquet(obs_path)
        all_obs = spark.read.parquet(obs_path)
        edges = all_obs.select(
            F.col("turn_key").alias("key_a"), F.explode("mention_entities").alias("entity")
        ).select("key_a", F.concat(F.lit("E#"), F.col("entity")).alias("key_b"))
        comps = connected_components(edges).filter(~F.col("turn_key").startswith("E#"))
        comps.write.mode("overwrite").parquet(clusters_path)

    # foreachBatch consumes the RAW stream; mentions are derived inside the
    # callback (the streaming plan's mention output is not reusable there).
    writer = stream_df.writeStream.foreachBatch(process_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    id_cols: tuple = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Streaming exact dedup as a custom stateful operator: the first row
    carrying each text (by md5) passes through; every later duplicate —
    same micro-batch or any subsequent one — is dropped.

    State design for 10^12-turn scale: one boolean per DISTINCT text hash
    (not per row), partitioned by the hash — the state store grows with
    unique content only, and the shuffle key is the dedup key, so state
    lookups are local to the partition. Within a batch the kept row is the
    (conv_id, turn_idx)-minimum for determinism.
    """
    import pandas as pd

    keyed = stream_df.withColumn("text_md5", F.md5(F.col(text_col)))
    out_schema = keyed.schema
    ids = list(id_cols)

    def dedup_fn(key, pdf_iter, state):
        if state.exists:
            for _ in pdf_iter:  # drain: hash already emitted in a prior batch
                pass
            return
        batches = [pdf for pdf in pdf_iter if len(pdf)]
        state.update((True,))
        if batches:
            allrows = pd.concat(batches, ignore_index=True)
            yield allrows.sort_values(ids, kind="mergesort").head(1)

    return keyed.groupBy("text_md5").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_availablenow_to_memory(stream_result: DataFrame, query_name: str):
    """Drain all currently-available input into an in-memory table —
    the test/bench harness for the streaming operators."""
    return (
        stream_result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if not stream_result.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
