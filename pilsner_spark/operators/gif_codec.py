"""Pure-Python + numpy GIF decoder (and a minimal encoder for tests).

GIF's compression is LZW — a dictionary coder implementable in ~50 lines
of plain Python, no codec library required. Like png_codec, this moves a
"compressed" format from the stubbed list in operators/multimodal.py to
a REAL decode path.

Scope: GIF87a/GIF89a, global and local color tables, interlaced and
non-interlaced frames, extension blocks skipped by structure (graphic
control, comment, application). ``decode_gif_array`` returns the FIRST
frame as (H, W, 3) uint8 RGB — the image-modality contract (animated
GIFs are sampled by re-walking with ``frame_index``). Transparency is
ignored (the transparent index still maps through the palette), matching
the RGBA-alpha-drop policy of png_codec.

Malformed payloads raise ``ValueError`` (strict mode surfaces corruption,
same contract as the RIFF/PNG walkers); structurally valid but
out-of-scope variants raise ``NotImplementedError``.
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF LZW: LSB-first bit stream, variable code width growing from
    ``min_code_size + 1`` to 12 bits, dictionary reset on CLEAR."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: List[bytes] = []
    width = 0
    prev: bytes = b""

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = b""

    reset()
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                continue
            if code == end:
                return bytes(out)
            if not prev:
                if code >= len(table):
                    raise ValueError(f"GIF LZW first code {code} out of table range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"GIF LZW code {code} beyond table size {len(table)}")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out)
    raise ValueError("GIF LZW stream ended without an END code or a full raster")


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(idx)
    out[np.asarray(order, dtype=np.int64)] = idx
    return out


def decode_gif_array(payload: bytes, frame_index: int = 0) -> np.ndarray:
    """Decode frame ``frame_index`` of a GIF payload to (H, W, 3) uint8
    RGB (H/W are the frame's image-descriptor dimensions)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("payload is not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("GIF truncated before the logical screen descriptor")
    _sw, _sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    global_ct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=i).reshape(n, 3)
        i += 3 * n
    seen = 0
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x} at offset {i}")
        if i + 10 > len(payload):
            raise ValueError("GIF truncated inside an image descriptor")
        _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", payload, i + 1)
        i += 10
        ct = global_ct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=i).reshape(n, 3)
            i += 3 * n
        if i >= len(payload):
            raise ValueError("GIF truncated before LZW minimum code size")
        min_code_size = payload[i]
        i += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"invalid GIF LZW minimum code size {min_code_size}")
        blocks = bytearray()
        while i < len(payload) and payload[i] != 0:
            sz = payload[i]
            if i + 1 + sz > len(payload):
                raise ValueError("GIF truncated inside an image data sub-block")
            blocks += payload[i + 1 : i + 1 + sz]
            i += 1 + sz
        if i >= len(payload):
            raise ValueError("GIF truncated before the image data terminator")
        i += 1
        if seen == frame_index:
            if ct is None:
                raise ValueError("GIF frame has no color table (global or local)")
            if w == 0 or h == 0:
                raise ValueError("GIF frame has zero dimensions")
            pixels = _lzw_decode(min_code_size, bytes(blocks), w * h)
            if len(pixels) < w * h:
                raise ValueError(f"GIF raster short: {len(pixels)} of {w * h} pixels")
            idx = np.frombuffer(pixels, dtype=np.uint8, count=w * h).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF pixel index out of color-table range")
            return ct[idx]
        seen += 1
    raise ValueError(f"GIF has {seen} frame(s); frame_index {frame_index} not present")


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Minimal GIF LZW encoder (always emits CLEAR first, grows widths,
    re-clears when the table fills) — enough for round-trip tests."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for ch in indices:
        cur = prev + bytes([ch])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= (1 << 12):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = bytes([ch])
    if prev:
        emit(table[prev], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, palette: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (H, W) uint8 INDEX array + (N, 3) palette as a
    single-frame GIF89a (global color table, optional interlace) — a
    test/round-trip encoder, not a quantizing writer."""
    h, w = img.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << max(1, bits)
    if int(img.max(initial=0)) >= size:
        raise ValueError("index out of palette range")
    ct = np.zeros((size, 3), dtype=np.uint8)
    ct[:n] = palette
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (max(1, bits) - 1), 0, 0) + ct.tobytes()
    iflags = 0x40 if interlace else 0
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    raster = img
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
        raster = img[np.asarray(order, dtype=np.int64)]
    mcs = max(2, bits)
    lzw = _lzw_encode(mcs, raster.tobytes())
    body = bytearray([mcs])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return hdr + desc + bytes(body) + b"\x3b"
