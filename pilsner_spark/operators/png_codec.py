"""Pure-Python + numpy PNG codec (decode + a minimal encoder for tests/sinks).

PNG's compression is DEFLATE, which ships in the Python standard library
(``zlib``) — so unlike JPEG/MP3/H.264, a REAL decoder needs no external
codec package. This closes part of the "compressed codecs are stubbed"
gap in operators/multimodal.py: PNG payloads now decode for real.

Scope (the overwhelmingly common subset):
* 8-bit samples; color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); non-interlaced (Adam7 raises
  NotImplementedError — rare in corpus data and reshuffling rows is
  orthogonal to entropy decode).
* All five scanline filters (None/Sub/Up/Average/Paeth) are unfiltered;
  Up/None/Sub-with-vector-prefix are vectorized, Average/Paeth fall back
  to an in-row sequential pass (they are defined as left-to-right
  recurrences).
* Chunk CRCs are verified (``zlib.crc32``) — corrupt payloads raise
  ``ValueError`` so strict (fake=False) decoding surfaces truncation
  instead of producing plausible pixels, same contract as the RIFF
  walkers in operators/multimodal.py.

The encoder (``encode_png``) writes filter-0 (or a caller-chosen filter)
rows for round-trip tests and as a deterministic image sink; it is not a
compression-tuned writer.

Reference parity note: the reference engine (pgolo/pilsner) has no media
path at all; this module exists for the training-data-pipeline surface
(multimodal ingestion) the target deployment needs.
"""

from __future__ import annotations

import struct
import zlib
from typing import List

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_array(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an (H, W, 3) uint8 RGB array.

    Alpha channels are dropped (gray+alpha/RGBA keep their color samples);
    grayscale replicates to 3 channels; palette images go through their
    PLTE lookup table. Raises ``ValueError`` on a malformed/corrupt file
    (bad signature inside a .png-typed payload, CRC mismatch, short
    raster) and ``NotImplementedError`` for valid-but-unsupported variants
    (16-bit samples, Adam7 interlace)."""
    if payload[:8] != _SIGNATURE:
        raise NotImplementedError("payload is not a PNG (bad signature)")
    i = 8
    ihdr = None
    plte = None
    idat: List[bytes] = []
    saw_iend = False
    while i + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        body_off = i + 8
        if body_off + length + 4 > len(payload):
            raise ValueError(
                f"truncated PNG chunk {ctype!r}: declares {length} bytes at offset {i}"
            )
        body = payload[body_off : body_off + length]
        (crc,) = struct.unpack_from(">I", payload, body_off + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch at offset {i}")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            saw_iend = True
            break
        i = body_off + length + 4
    if not saw_iend:
        # a well-formed PNG always ends with IEND; a cut file loses it
        raise ValueError("truncated PNG: stream ends before the IEND chunk")
    if ihdr is None or not idat:
        raise ValueError("PNG lacks IHDR/IDAT chunks")
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if bit_depth != 8:
        raise NotImplementedError(f"only 8-bit PNG samples are supported (got {bit_depth})")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG is not supported")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt DEFLATE stream
        raise ValueError(f"PNG IDAT stream is corrupt: {e}") from e
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError(
            f"PNG raster short: {len(raw)} bytes, {h}x(1+{stride}) = {h * (stride + 1)} needed"
        )

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: recon[x] = row[x] + recon[x-ch]
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 2:  # Up — fully vectorized
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                upleft = int(prev[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + _paeth(left, int(prev[x]), upleft)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype} on row {y}")
        out[y] = row
        prev = out[y]

    px = out.reshape(h, w, ch)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px.copy()
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG lacks a PLTE chunk")
        lut = np.frombuffer(plte, dtype=np.uint8)
        lut = lut[: len(lut) // 3 * 3].reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(lut):
            raise ValueError("palette index out of PLTE range")
        return lut[idx]
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # color_type 6: drop alpha


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W), (H, W, 1) or (H, W, 3) uint8 array as a PNG
    (gray or RGB, 8-bit, non-interlaced). ``filter_type`` applies the
    given PNG filter to every row — 0 for the plain sink path, 1-4 so
    tests can exercise each unfilter branch against a known raster."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError("encode_png supports 1 (gray) or 3 (RGB) channels")
    if img.dtype != np.uint8:
        raise ValueError("encode_png requires uint8 samples")
    color_type = 0 if ch == 1 else 2
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int16)
    lines = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int16), row[:-ch]]) if stride > ch else np.zeros_like(row)
        upleft = np.concatenate([np.zeros(ch, dtype=np.int16), prev[:-ch]]) if stride > ch else np.zeros_like(row)
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = row - left
        elif filter_type == 2:
            enc = row - prev
        elif filter_type == 3:
            enc = row - ((left + prev) >> 1)
        elif filter_type == 4:
            enc = row - np.array(
                [_paeth(int(left[x]), int(prev[x]), int(upleft[x])) for x in range(stride)],
                dtype=np.int16,
            )
        else:
            raise ValueError(f"invalid PNG filter type {filter_type}")
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
