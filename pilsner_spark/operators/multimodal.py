"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; the Spark-side machinery (schema, Arrow batch shape,
partition sizing, UDF signatures) is real and tested. Decoding is REAL
for the uncompressed formats a pure numpy parser can handle — PPM (P6),
PGM (P5), and 24-bit uncompressed BMP (``decode_image_array``), with
nearest-neighbor ``resize_nearest`` — and real pixel features flow through
``extract_features_df`` for those payloads. Compressed codecs (JPEG/PNG/
audio/video) are STUBBED: this container has no codec libraries, so
``decode_image`` raises NotImplementedError for them unless ``fake=True``,
in which case a deterministic byte-derived feature vector stands in —
letting the downstream operators (dedup by feature cosine, ANN over
extracted embeddings) be exercised end-to-end either way.

At 100 TB the operative concerns encoded here:
* binary payloads are NEVER shuffled with their features — feature
  extraction happens before any wide transform, and payload columns are
  pruned immediately after;
* Arrow batches are size-bounded by rows AND bytes (huge blobs would blow
  executor memory with the default 10k-row batches) — callers repartition
  by byte budget via ``repartition_by_bytes``.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Tuple

import numpy as np
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


def _ppm_tokens(payload: bytes, n: int) -> Tuple[List[int], int]:
    """First *n* whitespace-separated integer tokens after the magic,
    skipping '#' comments; returns (values, offset-past-last-token)."""
    vals: List[int] = []
    i = 2  # past magic
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # single whitespace after maxval precedes the raster


def decode_image_array(payload: bytes) -> np.ndarray:
    """REAL decode (pure numpy, no codec libraries) of uncompressed image
    formats: binary PPM ('P6', RGB), binary PGM ('P5', grayscale replicated
    to 3 channels), and 24-bit uncompressed BMP. Returns an (H, W, 3)
    uint8 array. Compressed formats raise NotImplementedError — entropy
    decoding needs codec libraries this environment does not ship."""
    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        (w, h, maxval), off = _ppm_tokens(payload, 3)
        if maxval > 255:
            raise NotImplementedError("16-bit-per-sample PPM/PGM not supported")
        ch = 3 if magic == b"P6" else 1
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
        img = raster.reshape(h, w, ch)
        return np.repeat(img, 3, axis=2) if ch == 1 else img
    if magic == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only 24-bit uncompressed BMP is supported")
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * abs(h), offset=data_off)
        img = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
        if h > 0:
            img = img[::-1]  # positive height = bottom-up row order
        return img[:, :, ::-1].copy()  # BGR -> RGB
    raise NotImplementedError(
        "payload is not an uncompressed PPM/PGM/BMP; compressed formats (JPEG/PNG/...) "
        "need codec libraries not present in this environment"
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index maps) — the standard
    cheap pre-embedding normalization step."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def pixel_features(img: np.ndarray) -> List[float]:
    """16-dim feature vector from decoded pixels: per-channel means,
    luminance std (all /255), then a 12-bin luminance histogram."""
    f = img.astype(np.float64)
    lum = f.mean(axis=2)
    hist, _ = np.histogram(lum, bins=FEATURE_DIM - 4, range=(0.0, 255.0))
    hist = hist / max(1, lum.size)
    head = [f[..., c].mean() / 255.0 for c in range(3)] + [lum.std() / 255.0]
    return [round(float(x), 6) for x in head + list(hist)]


def decode_image(payload: bytes, fake: bool = False) -> List[float]:
    """Decode + feature-extract one image payload.

    Uncompressed PPM/PGM/BMP payloads decode for real (numpy parser,
    ``decode_image_array``) and yield ``pixel_features``. Other formats
    need codec libraries absent from this environment: they raise
    NotImplementedError, or — with ``fake=True`` — fall back to a
    deterministic 16-dim byte-histogram stand-in (same signature, same
    downstream shape)."""
    try:
        return pixel_features(decode_image_array(payload))
    except (NotImplementedError, ValueError, IndexError, struct.error):
        # unsupported format, or a recognized magic with corrupt/truncated
        # content — strict mode surfaces it, fake mode falls back
        if not fake:
            raise
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
