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
