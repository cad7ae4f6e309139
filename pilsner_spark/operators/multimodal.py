"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; the Spark-side machinery (schema, Arrow batch shape,
partition sizing, UDF signatures) is real and tested. The actual codec
calls are STUBBED: this container has no image/audio libraries, so
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic byte-derived feature vector stands in — letting the
downstream operators (dedup by feature cosine, ANN over extracted
embeddings) be exercised end-to-end.

At 100 TB the operative concerns encoded here:
* binary payloads are NEVER shuffled with their features — feature
  extraction happens before any wide transform, and payload columns are
  pruned immediately after;
* Arrow batches are size-bounded by rows AND bytes (huge blobs would blow
  executor memory with the default 10k-row batches) — callers repartition
  by byte budget via ``repartition_by_bytes``.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> List[float]:
    """Decode + feature-extract one image payload.

    STUB: real decoding needs PIL/libvips (absent here). ``fake=True``
    yields a deterministic 16-dim byte-histogram feature — same signature,
    same downstream shape."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this environment; "
            "pass fake=True for the deterministic byte-histogram stand-in"
        )
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [round(h / total, 6) for h in hist]


def extract_features_df(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, media_type, n_bytes, features) via mapInPandas — binary
    payloads enter Python as Arrow buffers, features leave, payloads are
    pruned from the output immediately."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "n_bytes": [], "features": []}
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(payload))
                out["features"].append(decode_image(payload, fake=fake))
            yield pd.DataFrame(out)

    return media.select("media_id", "media_type", "payload").mapInPandas(gen, schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per frame to extract (timestamps
    only — the decode is the stubbed step). Pure JVM expression."""
    n_frames = F.greatest(F.floor(F.col("duration_ms") / every_ms), F.lit(1)).cast("int")
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)).alias("frame_ts_ms"),
    )


def repartition_by_bytes(media: DataFrame, target_bytes_per_partition: int = 64 * 1024 * 1024) -> DataFrame:
    """Size partitions by payload bytes, not row count — the knob that keeps
    Arrow batches of large blobs inside executor memory."""
    stats = media.agg(F.sum(F.length("payload")).alias("total")).collect()[0]
    total = stats["total"] or 0
    n = max(1, int(total / target_bytes_per_partition) + 1)
    return media.repartition(n)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks: payload bytes
    derived from md5 chains (no external data)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.encode(F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string"))), "utf-8").alias("payload"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.col("id"), 3) + 1).cast("int")
            ).alias("media_type"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.pmod(F.col("id") * 37, 5000) + 500).cast("int").alias("duration_ms"),
        )
    )
