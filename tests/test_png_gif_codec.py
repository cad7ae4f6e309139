"""PNG / GIF codec tests: real compressed-image decode with no codec
libraries (PNG's DEFLATE ships in stdlib zlib; GIF's LZW is pure
Python). Round-trips pin every unfilter branch and the LZW width-growth
path; corruption must raise in strict mode (no plausible pixels from
corrupt payloads); the multimodal router must pick these decoders up by
signature."""

import numpy as np
import pytest

from pilsner_spark.operators.gif_codec import decode_gif_array, encode_gif
from pilsner_spark.operators.png_codec import decode_png_array, encode_png


def _img(h, w, seed=7):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    img = _img(13, 17)
    assert np.array_equal(decode_png_array(encode_png(img, filter_type=filter_type)), img)


def test_png_grayscale_replicates_channels():
    gray = np.random.RandomState(3).randint(0, 256, (9, 5), dtype=np.uint8)
    got = decode_png_array(encode_png(gray, filter_type=4))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))


def test_png_known_pixels():
    """A hand-small raster with known bytes: decode is exact, not just
    self-consistent with our encoder."""
    img = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    got = decode_png_array(encode_png(img))
    assert got.tolist() == img.tolist()


def test_png_corruption_raises():
    payload = bytearray(encode_png(_img(8, 8)))
    payload[60] ^= 0xFF  # inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png_array(bytes(payload))
    with pytest.raises(ValueError, match="truncated"):
        decode_png_array(bytes(encode_png(_img(8, 8))[:40]))
    with pytest.raises(NotImplementedError, match="not a PNG"):
        decode_png_array(b"\x89PNX" + b"\x00" * 32)


def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.randint(0, 7, (11, 23)).astype(np.uint8)
    for interlace in (False, True):
        got = decode_gif_array(encode_gif(idx, pal, interlace=interlace))
        assert np.array_equal(got, pal[idx]), f"interlace={interlace}"


def test_gif_lzw_width_growth_and_table_refill():
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    big = rng.randint(0, 7, (80, 200)).astype(np.uint8)  # >12-bit table churn
    assert np.array_equal(decode_gif_array(encode_gif(big, pal)), pal[big])


def test_gif_truncation_raises():
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.zeros((6, 6), dtype=np.uint8)
    payload = encode_gif(idx, pal)
    with pytest.raises(ValueError):
        decode_gif_array(payload[:40])
    with pytest.raises(ValueError, match="frame_index"):
        decode_gif_array(payload, frame_index=1)


def test_multimodal_router_decodes_png_and_gif():
    """decode_image_array picks PNG/GIF by signature; decode_image yields
    real pixel features (not the byte-histogram stand-in) for both."""
    from pilsner_spark.operators.multimodal import decode_image, decode_image_array, pixel_features

    img = _img(6, 10, seed=2)
    png = encode_png(img)
    assert np.array_equal(decode_image_array(png), img)
    assert decode_image(png, fake=False) == pixel_features(img)

    pal = np.random.RandomState(9).randint(0, 256, (5, 3), dtype=np.uint8)
    idx = np.random.RandomState(10).randint(0, 5, (6, 10)).astype(np.uint8)
    gif = encode_gif(idx, pal)
    assert np.array_equal(decode_image_array(gif), pal[idx])
    assert decode_image(gif, fake=False) == pixel_features(pal[idx])


# ---------------------------------------------------------------- JPEG


def _smooth(h, w):
    """Gradient image (JPEG-friendly: bounded quantization error)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            ((xx + yy) * 255 // max(w + h - 2, 1)).astype(np.uint8),
        ],
        axis=2,
    )


@pytest.mark.parametrize("subsampling,tol", [("444", 6), ("420", 16)])
def test_jpeg_roundtrip_within_quality_tolerance(subsampling, tol):
    """Lossy codec: round-trip must land within a quantization-scale
    tolerance (exactness is impossible by design), at exact output shape.
    4:2:0 exercises the interleaved-MCU decode + chroma upsampling path."""
    from pilsner_spark.operators.jpeg_codec import decode_jpeg_array, encode_jpeg

    img = _smooth(24, 40)
    got = decode_jpeg_array(encode_jpeg(img, quality=90, subsampling=subsampling))
    assert got.shape == img.shape and got.dtype == np.uint8
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= tol


def test_jpeg_grayscale_and_odd_sizes():
    """1-component scan replicates to 3 channels; non-multiple-of-8 (and
    non-multiple-of-16 for 4:2:0) sizes crop the padded raster exactly."""
    from pilsner_spark.operators.jpeg_codec import decode_jpeg_array, encode_jpeg

    gray = (np.mgrid[0:19, 0:21][0] * 13 % 256).astype(np.uint8)
    got = decode_jpeg_array(encode_jpeg(gray, quality=95))
    assert got.shape == (19, 21, 3)
    assert np.abs(got[:, :, 0].astype(int) - gray.astype(int)).max() <= 12
    assert np.array_equal(got[:, :, 0], got[:, :, 1]) and np.array_equal(got[:, :, 0], got[:, :, 2])
    odd = _smooth(17, 19)
    got420 = decode_jpeg_array(encode_jpeg(odd, quality=90, subsampling="420"))
    assert got420.shape == (17, 19, 3)


def test_jpeg_flat_image_is_near_exact():
    """A flat color has only DC energy — the round-trip must be exact to
    within rounding (pins DC prediction + dequant + IDCT scaling)."""
    from pilsner_spark.operators.jpeg_codec import decode_jpeg_array, encode_jpeg

    img = np.full((16, 16, 3), (120, 64, 200), dtype=np.uint8)
    got = decode_jpeg_array(encode_jpeg(img, quality=95))
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_truncation_and_corruption_raise():
    """Strict contract: cut segments, cut entropy data, and a progressive
    SOF must raise — never plausible pixels from a broken payload."""
    from pilsner_spark.operators.jpeg_codec import decode_jpeg_array, encode_jpeg

    enc = encode_jpeg(_smooth(24, 40), quality=75)
    with pytest.raises(ValueError):
        decode_jpeg_array(enc[: len(enc) // 3])  # cut inside the tables
    with pytest.raises(ValueError):
        decode_jpeg_array(enc[:-30])  # cut inside the scan
    prog = bytearray(enc)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg_array(bytes(prog))


def test_multimodal_router_decodes_jpeg():
    from pilsner_spark.operators.jpeg_codec import encode_jpeg
    from pilsner_spark.operators.multimodal import decode_image_array

    img = _smooth(16, 16)
    got = decode_image_array(encode_jpeg(img, quality=95))
    assert got.shape == (16, 16, 3)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 6
