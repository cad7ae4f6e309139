"""Pure-Python + numpy baseline JPEG codec (decode + a minimal encoder).

JPEG's entropy coding is canonical Huffman over (run, size) symbols plus
magnitude bits — no stdlib module implements it, but the algorithm itself
is small and fully specified in the public standard (ITU-T T.81 / ISO
10918-1). Implementing it here closes the last big "compressed codecs are
stubbed" gap in operators/multimodal.py the same way png_codec (stdlib
DEFLATE) and gif_codec (hand-rolled LZW) did: JPEG payloads now decode for
REAL, with no codec libraries in the environment.

Scope (baseline sequential DCT, the overwhelmingly dominant web subset):
* decode: SOF0 (baseline), 8-bit samples, grayscale or YCbCr with any
  sampling factors in {1, 2} (4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT
  segments, byte-stuffed entropy data. Progressive (SOF2), arithmetic
  coding, 12-bit, and restart intervals raise NotImplementedError —
  honestly scoped, never silently wrong. Truncated/corrupt payloads raise
  ValueError (strict-mode contract shared with the RIFF walkers and
  png_codec).
* encode: baseline 4:4:4 (or single-component grayscale), standard Annex K
  quantization tables scaled by the IJG quality formula, standard Annex K
  Huffman tables — a deterministic fixture/sink writer for round-trip
  tests, not a rate-optimized compressor.

DCT/IDCT are the orthonormal 8x8 DCT-II as two numpy matrix products per
block — vectorized across each block row. Entropy decode is inherently
sequential WITHIN a payload; the Spark-side parallelism is across payloads
(mapInPandas batches in extract_features_df), so per-payload Python cost is
the same shape as the other real decoders here.

Reference parity note: the reference engine (pgolo/pilsner) has no media
path; this module serves the training-data-pipeline surface (multimodal
ingestion) from the driver brief.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# zigzag index: zigzag position -> (row-major) block index, per T.81 fig A.6
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 base quantization tables (row-major)
_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman specs: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])

# orthonormal 8x8 DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.sqrt((1 if _k == 0 else 2) / 8.0) * np.cos(
            np.pi * (2 * _n + 1) * _k / 16.0
        )


def _canonical_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _decode_table(bits: List[int], values: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol for the bit-serial decoder."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, values).items()}


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:  # pad to a byte boundary with 1-bits (T.81 F.1.2.3)
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream at 0xFF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                elif marker == 0xD9:  # EOI mid-scan: raster incomplete
                    raise ValueError("JPEG entropy stream ended early (EOI inside scan)")
                else:
                    raise NotImplementedError(
                        f"unexpected marker 0xFF{marker:02X} inside scan (restart intervals unsupported)"
                    )
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits to the signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> Tuple[int, int]:
    """signed value -> (size s, s appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def decode_jpeg_array(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG payload to an (H, W, 3) uint8 RGB array.

    Grayscale replicates to 3 channels; subsampled chroma upsamples by
    sample replication before the YCbCr -> RGB transform. Raises
    ValueError on truncation/corruption, NotImplementedError on
    valid-but-unsupported variants (progressive, arithmetic, restart
    intervals, 12-bit)."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("payload is not a JPEG (no SOI marker)")
    quant: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict[Tuple[int, int], int]] = {}
    huff_ac: Dict[int, Dict[Tuple[int, int], int]] = {}
    frame = None
    scan = None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {i}")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError(f"truncated JPEG segment 0xFF{marker:02X} at offset {i}")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quantization tables unsupported")
                tbl = np.frombuffer(body, dtype=np.uint8, count=64, offset=j + 1).astype(np.int64)
                inv = np.empty(64, dtype=np.int64)
                inv[_ZIGZAG] = tbl  # stored zigzag -> row-major
                quant[tq] = inv
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG samples are supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline JPEG (SOF0) is supported (got SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise NotImplementedError("JPEG restart intervals are not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 0x0F})
            i = i + 2 + seglen
            break
        i += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG lacks SOF0/SOS segments")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for c, s in zip(order, scan):
        c["dc_tbl"] = huff_dc.get(s["dc"])
        c["ac_tbl"] = huff_ac.get(s["ac"])
        if c["dc_tbl"] is None or c["ac_tbl"] is None or c["tq"] not in quant:
            raise ValueError("JPEG scan references missing Huffman/quant tables")
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise NotImplementedError("JPEG sampling factors above 2 are not supported")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }

    reader = _BitReader(payload, i)
    pred = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        s = reader.huff(c["dc_tbl"])
                        diff = _extend(reader.bits(s), s) if s else 0
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.huff(c["ac_tbl"])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run exceeds block")
                            coef[k] = _extend(reader.bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef  # zigzag order -> row-major
                        block *= quant[c["tq"]]
                        spatial = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial

    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise NotImplementedError(f"JPEG with {len(full)} components is not supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def encode_jpeg(img: np.ndarray, quality: int = 75, subsampling: str = "444") -> bytes:
    """Encode an (H, W), (H, W, 1) grayscale or (H, W, 3) RGB uint8 array
    as a baseline JPEG (standard Annex K tables scaled by the IJG quality
    formula). ``subsampling`` is '444' (no chroma subsampling) or '420'
    (2x2 box-averaged chroma, the dominant web setting — exercises the
    decoder's interleaved-MCU and upsampling paths). Deterministic
    fixture/sink writer."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3) or img.dtype != np.uint8:
        raise ValueError("encode_jpeg requires uint8 with 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if ch == 3:
        rf, gf, bf = (img[:, :, k].astype(np.float64) for k in range(3))
        comps_px = [
            0.299 * rf + 0.587 * gf + 0.114 * bf,
            -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0,
            0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0,
        ]
        factors = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else [(1, 1)] * 3
    else:
        comps_px = [img[:, :, 0].astype(np.float64)]
        factors = [(1, 1)]

    qt = [_scaled_quant(_QUANT_LUM, quality), _scaled_quant(_QUANT_CHR, quality)]
    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR)]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ph, pw = mcuy * 8 * vmax, mcux * 8 * hmax
    planes = []
    for px, (fh, fv) in zip(comps_px, factors):
        p = np.empty((ph, pw), dtype=np.float64)
        p[:h, :w] = px
        p[h:, :w] = px[h - 1 : h, :w]
        p[:, w:] = p[:, w - 1 : w]
        sy, sx = vmax // fv, hmax // fh
        if sy > 1 or sx > 1:  # box-average downsample to the sampled grid
            p = p.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        planes.append(p - 128.0)

    writer = _BitWriter()
    pred = [0] * len(planes)

    def put_block(ci: int, blk: np.ndarray) -> None:
        t = 0 if ci == 0 else 1
        coef = _C @ blk @ _C.T
        # quantize row-major, then reorder to the zigzag scan
        q = np.rint(coef.reshape(64) / qt[t]).astype(np.int64)[_ZIGZAG]
        s, bits_val = _magnitude(int(q[0]) - pred[ci])
        pred[ci] = int(q[0])
        code, length = dc_codes[t][s]
        writer.put(code, length)
        if s:
            writer.put(bits_val, s)
        run = 0
        last_nz = max((k for k in range(1, 64) if q[k]), default=0)
        for k in range(1, last_nz + 1):
            v = int(q[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[t][0xF0]
                writer.put(code, length)
                run -= 16
            s, bits_val = _magnitude(v)
            code, length = ac_codes[t][(run << 4) | s]
            writer.put(code, length)
            writer.put(bits_val, s)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[t][0x00]  # EOB
            writer.put(code, length)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (fh, fv)) in enumerate(zip(planes, factors)):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        put_block(ci, p[y0 : y0 + 8, x0 : x0 + 8])
    data = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    nc = len(comps_px)
    out = [b"\xff\xd8", seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    # DQT segments store tables in zigzag order: stored[k] = rowmajor[ZZ[k]]
    out.append(seg(0xDB, bytes([0x00]) + qt[0][_ZIGZAG].astype(np.uint8).tobytes()))
    if nc == 3:
        out.append(seg(0xDB, bytes([0x01]) + qt[1][_ZIGZAG].astype(np.uint8).tobytes()))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        fh, fv = factors[c]
        sof += bytes([c + 1, (fh << 4) | fv, 0 if c == 0 else 1])
    out.append(seg(0xC0, sof))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out.append(dht(0, 0, _DC_LUM))
    out.append(dht(1, 0, _AC_LUM))
    if nc == 3:
        out.append(dht(0, 1, _DC_CHR))
        out.append(dht(1, 1, _AC_CHR))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out.append(seg(0xDA, sos))
    out.append(data)
    out.append(b"\xff\xd9")
    return b"".join(out)
