"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; the Spark-side machinery (schema, Arrow batch shape,
partition sizing, UDF signatures) is real and tested. Decoding is REAL
for the uncompressed formats a pure numpy parser can handle — PPM (P6),
PGM (P5), and 24-bit uncompressed BMP (``decode_image_array``, with
nearest-neighbor ``resize_nearest``), and 8/16-bit PCM RIFF/WAVE audio
(``decode_audio_array``, with ``frame_rms`` frame sampling) — and real
pixel/audio features flow through ``extract_features_df`` for those
payloads, routed per media_type. Compressed codecs (JPEG/PNG/MP3/video)
are STUBBED: this container has no codec libraries, so the decoders raise
NotImplementedError for them unless ``fake=True``, in which case a
deterministic byte-derived feature vector stands in — letting the
downstream operators (dedup by feature cosine, ANN over extracted
embeddings) be exercised end-to-end either way.

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


def decode_audio_array(payload: bytes) -> Tuple[np.ndarray, int]:
    """REAL decode (pure numpy) of RIFF/WAVE **PCM** audio: 8-bit unsigned
    and 16-bit signed little-endian samples, any channel count. Walks the
    RIFF chunk list (word-aligned), so extra chunks (LIST/INFO, fact) are
    skipped correctly. Returns (samples, sample_rate) with samples shaped
    (n_frames, channels) as float64 in [-1, 1]. Compressed codecs (MP3,
    AAC, IMA-ADPCM, float WAV...) raise NotImplementedError — entropy
    decoding needs codec libraries this environment does not ship."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("payload is not a RIFF/WAVE container")
    fmt = data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = struct.unpack_from("<I", payload, i + 4)[0]
        if i + 8 + sz > len(payload):
            # a declared chunk size running past the buffer is truncation /
            # corruption — raise so strict (fake=False) mode surfaces it
            # instead of silently decoding fewer frames (ADVICE r3)
            raise ValueError(
                f"truncated RIFF chunk {cid!r}: declares {sz} bytes at offset {i}, "
                f"payload has {len(payload) - i - 8} remaining"
            )
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAVE file lacks fmt/data chunks")
    audio_format, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1 or channels < 1:
        raise NotImplementedError("only integer PCM (wFormatTag=1) is supported")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError("only 8/16-bit PCM is supported")
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), int(sample_rate)


def audio_features(samples: np.ndarray, sample_rate: int) -> List[float]:
    """16-dim feature vector from decoded audio: duration (s), RMS, peak,
    zero-crossing rate of the mono mix, then a 12-bin |amplitude|
    histogram — the audio analog of ``pixel_features``."""
    mono = samples.mean(axis=1) if samples.ndim > 1 else samples
    n = max(1, mono.size)
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / n
    hist, _ = np.histogram(np.abs(mono), bins=FEATURE_DIM - 4, range=(0.0, 1.0))
    head = [
        mono.size / float(sample_rate or 1),
        float(np.sqrt(np.mean(mono**2))) if mono.size else 0.0,
        float(np.max(np.abs(mono))) if mono.size else 0.0,
        zcr,
    ]
    return [round(float(v), 6) for v in head + list(hist / n)]


def frame_rms(samples: np.ndarray, sample_rate: int, every_ms: int = 100) -> List[float]:
    """Per-frame RMS energy over fixed ``every_ms`` windows of the mono
    mix — the audio frame-sampling step (vectorized: one reshape, no
    Python loop over frames)."""
    mono = samples.mean(axis=1) if samples.ndim > 1 else samples
    step = max(1, sample_rate * every_ms // 1000)
    n_frames = max(1, -(-mono.size // step))
    padded = np.zeros(n_frames * step)
    padded[: mono.size] = mono
    frames = padded.reshape(n_frames, step)
    return [round(float(v), 6) for v in np.sqrt((frames**2).mean(axis=1))]


def decode_audio(payload: bytes, fake: bool = False) -> List[float]:
    """Decode + feature-extract one audio payload: PCM WAV decodes for real
    (``decode_audio_array`` -> ``audio_features``); compressed codecs raise
    NotImplementedError, or with ``fake=True`` fall back to the same
    deterministic byte-histogram stand-in as ``decode_image``."""
    try:
        return audio_features(*decode_audio_array(payload))
    except (NotImplementedError, ValueError, IndexError, struct.error):
        if not fake:
            raise
    return _byte_histogram(payload)


def _byte_histogram(payload: bytes) -> List[float]:
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [round(h / total, 6) for h in hist]


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
    return _byte_histogram(payload)


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> List[float]:
    """Route one payload to its modality decoder: image -> PPM/PGM/BMP
    parser, audio -> PCM WAV parser, video (no uncompressed container a
    pure-numpy parser can handle) -> stand-in only."""
    if media_type == "audio":
        return decode_audio(payload, fake=fake)
    if media_type == "video":
        if not fake:
            raise NotImplementedError("video decode needs codec libraries not present here")
        return _byte_histogram(payload)
    return decode_image(payload, fake=fake)


def extract_features_df(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, media_type, n_bytes, features) via mapInPandas — binary
    payloads enter Python as Arrow buffers, features leave, payloads are
    pruned from the output immediately. Decoding routes per media_type
    (``decode_media``): real for uncompressed image/audio containers,
    byte-histogram stand-in otherwise when ``fake``."""
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
                out["features"].append(decode_media(payload, mtype, fake=fake))
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
