"""Baseline JPEG codec (functions/jpeg.py): round trips through the
encoder/decoder pair, the exactness contract for block-constant grayscale
(the oracle-replay foundation), subsampling modes, restart markers, and
integration with decode_image / image_stats."""

from __future__ import annotations

import numpy as np
import pytest

from humid_spark.functions.jpeg import decode_jpeg, encode_jpeg
from humid_spark.functions.multimodal import decode_image


def _block_const_gray(seed: int, by: int, bx: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    bv = rng.integers(0, 200, size=(by, bx))
    return bv.repeat(8, axis=0).repeat(8, axis=1).astype(np.uint8)


def test_block_constant_gray_is_bit_exact():
    """The oracle contract: 8x8-block-constant grayscale + all-ones quant
    round-trips EXACTLY (DC-only blocks, integer DC, np.round kills the
    float residue)."""
    px = _block_const_gray(7, 4, 6)
    w, h, fmt, out = decode_jpeg(encode_jpeg(px))
    assert (fmt, w, h) == ("JPEG", 48, 32)
    assert out.shape == (32, 48, 1)
    assert np.array_equal(out[:, :, 0], px)


def test_gray_near_lossless_and_odd_dims():
    rng = np.random.default_rng(3)
    for shape in [(24, 40), (13, 21), (8, 8), (9, 8)]:
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        w, h, _, out = decode_jpeg(encode_jpeg(px))
        assert (w, h) == (shape[1], shape[0])
        assert np.abs(out[:, :, 0].astype(int) - px.astype(int)).max() <= 1


@pytest.mark.parametrize("sub", ["444", "420"])
def test_color_roundtrip_smooth(sub):
    y, x = np.mgrid[0:64, 0:64]
    px = np.stack(
        [(x * 2 + y).clip(0, 255), (128 + x - y).clip(0, 255),
         (y * 3).clip(0, 255)],
        axis=2,
    ).astype(np.uint8)
    for quant in (1, 16):
        w, h, fmt, out = decode_jpeg(encode_jpeg(px, quant=quant,
                                                 subsampling=sub))
        assert (fmt, w, h) == ("JPEG", 64, 64)
        err = np.abs(out.astype(int) - px.astype(int)).max()
        assert err <= 12, (sub, quant, err)


def test_color420_block16_constant_tight():
    """16x16-constant color: chroma box-averaging is exact, errors are
    RGB<->YCbCr integer rounding only (<= 1 LSB)."""
    rng = np.random.default_rng(11)
    bv = rng.integers(0, 200, size=(2, 3, 3))
    px = bv.repeat(16, axis=0).repeat(16, axis=1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, subsampling="420"))[3]
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


def test_deterministic_bytes():
    px = _block_const_gray(5, 2, 2)
    assert encode_jpeg(px) == encode_jpeg(px)


def test_decode_image_sniffs_jpeg_and_stats_flow():
    px = _block_const_gray(9, 3, 3)
    blob = encode_jpeg(px)
    got = decode_image(blob)
    assert got is not None
    w, h, fmt, out = got
    assert fmt == "JPEG" and (w, h) == (24, 24)
    assert int(out.astype(np.int64).sum()) == int(px.astype(np.int64).sum())
    # non-JPEG blobs still route to their own codecs
    assert decode_image(b"P6\n1 1\n255\n\x00\x00\x00")[2] == "PPM"
    assert decode_image(b"garbage-not-an-image") is None


def test_unsupported_processes_raise_cleanly():
    px = _block_const_gray(1, 2, 2)
    blob = bytearray(encode_jpeg(px))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
