"""Stdlib image decoders (VERDICT r4 item 6): real header parse + raster
decode for PPM/PGM, BMP and PNG — verified against independently
constructed blobs with known pixel content, including every PNG filter
type (the unfilter pass is exercised by forward-filtering in the test)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from humid_spark.functions.multimodal import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
)


def _pixels(w, h, nch, seed=5):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, nch), dtype=np.uint8)


def test_ppm_p6():
    px = _pixels(7, 5, 3)
    blob = b"P6\n# a comment\n7 5\n255\n" + px.tobytes()
    w, h, fmt, got = decode_ppm(blob)
    assert (w, h, fmt) == (7, 5, "PPM")
    assert np.array_equal(got, px)


def test_pgm_p5():
    px = _pixels(4, 6, 1)
    blob = b"P5 4 6 255\n" + px.tobytes()
    w, h, fmt, got = decode_ppm(blob)
    assert (w, h, fmt) == (4, 6, "PGM")
    assert np.array_equal(got, px)


def _make_bmp(px: np.ndarray, bottom_up=True) -> bytes:
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = px[::-1] if bottom_up else px
    raster = bytearray()
    for y in range(h):
        line = rows[y][:, [2, 1, 0]].tobytes()  # RGB -> BGR
        raster += line + b"\x00" * (stride - len(line))
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(raster), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
            len(raster), 2835, 2835, 0, 0,
        )
    )
    return header + bytes(raster)


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_24(bottom_up):
    px = _pixels(5, 4, 3, seed=9)
    w, h, fmt, got = decode_bmp(_make_bmp(px, bottom_up))
    assert (w, h, fmt) == (5, 4, "BMP")
    assert np.array_equal(got, px)


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _make_png(px: np.ndarray) -> bytes:
    """Forward-filter each scanline with type y % 5 — decode must undo
    all five filter types to reproduce the input."""
    h, w, nch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    flat = px.reshape(h, w * nch).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ftype = y % 5
        line, prev = flat[y], flat[y - 1] if y else np.zeros(w * nch, np.int32)
        out = []
        for x in range(w * nch):
            a = int(line[x - nch]) if x >= nch else 0
            b = int(prev[x])
            c = int(prev[x - nch]) if (x >= nch and y) else 0
            cur = int(line[x])
            if ftype == 0:
                out.append(cur % 256)
            elif ftype == 1:
                out.append((cur - a) % 256)
            elif ftype == 2:
                out.append((cur - b) % 256)
            elif ftype == 3:
                out.append((cur - (a + b) // 2) % 256)
            else:
                out.append((cur - _paeth(a, b, c)) % 256)
        raw += bytes([ftype]) + bytes(out)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("nch", [1, 3, 4])
def test_png_all_filters(nch):
    px = _pixels(6, 7, nch, seed=nch)  # 7 rows -> filters 0,1,2,3,4,0,1
    w, h, fmt, got = decode_png(_make_png(px))
    assert (w, h, fmt) == (6, 7, "PNG")
    assert np.array_equal(got, px)


def test_unrecognized_blob_is_none():
    assert decode_image(b"\xff\xd8\xff not actually a jpeg") is None
    assert decode_image(b"") is None


def test_image_stats_spark(spark):
    """End-to-end through mapInPandas: planted PPM + BMP + an undecodable
    blob; exact integer channel sums."""
    from humid_spark.functions.multimodal import image_stats

    px = _pixels(5, 4, 3, seed=3)
    rows = [
        ("ppm", b"P6\n5 4\n255\n" + px.tobytes()),
        ("bmp", _make_bmp(px)),
        ("junk", b"not an image"),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {r["url"]: r for r in image_stats(df, blob_col="blob").collect()}
    sums = px.astype(np.int64).sum(axis=(0, 1))
    for u, fmt in (("ppm", "PPM"), ("bmp", "BMP")):
        r = got[u]
        assert (r["width"], r["height"], r["format"], r["decoded"]) == (
            5, 4, fmt, True)
        assert (r["r_sum"], r["g_sum"], r["b_sum"]) == tuple(
            int(x) for x in sums)
    assert got["junk"]["decoded"] is False and got["junk"]["r_sum"] is None
    assert got["null"]["decoded"] is False


# ---------- exact-integer resize (round 5) ----------

def test_resize_block_mean_exact():
    from humid_spark.functions.multimodal import resize_block_mean

    px = _pixels(16, 16, 3, seed=11)
    out = resize_block_mean(px, 8, 8)
    assert out.shape == (8, 8, 3)
    a = px.astype(np.int64)
    for oy in range(8):
        for ox in range(8):
            blk = a[oy * 2: oy * 2 + 2, ox * 2: ox * 2 + 2]
            assert np.array_equal(out[oy, ox], blk.sum(axis=(0, 1)) // 4)


def test_resize_uneven_grid_floor_bounds():
    from humid_spark.functions.multimodal import resize_block_mean

    px = _pixels(7, 5, 1, seed=12)  # 7x5 -> 3x2: uneven blocks
    out = resize_block_mean(px, 3, 2)
    a = px.astype(np.int64)[:, :, 0]
    ys = [i * 5 // 2 for i in range(2)] + [5]
    xs = [i * 7 // 3 for i in range(3)] + [7]
    for oy in range(2):
        for ox in range(3):
            blk = a[ys[oy]: ys[oy + 1], xs[ox]: xs[ox + 1]]
            assert out[oy, ox, 0] == blk.sum() // blk.size


def test_resize_rejects_upsample():
    from humid_spark.functions.multimodal import resize_block_mean

    with pytest.raises(ValueError):
        resize_block_mean(_pixels(4, 4, 3), 8, 8)


def test_encode_ppm_roundtrip():
    from humid_spark.functions.multimodal import encode_ppm

    rgb = _pixels(6, 4, 3, seed=13)
    w, h, fmt, got = decode_ppm(encode_ppm(rgb))
    assert (w, h, fmt) == (6, 4, "PPM") and np.array_equal(got, rgb)
    gray = _pixels(5, 3, 1, seed=14)
    w, h, fmt, got = decode_ppm(encode_ppm(gray))
    assert (w, h, fmt) == (5, 3, "PGM") and np.array_equal(got, gray)


def test_image_resize_spark(spark):
    from humid_spark.functions.multimodal import (
        image_resize,
        resize_block_mean,
    )

    px = _pixels(16, 16, 3, seed=15)
    rows = [("a", b"P6\n16 16\n255\n" + px.tobytes()),
            ("junk", b"nope"), ("null", None)]
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {r["url"]: r
           for r in image_resize(df, 8, 8, blob_col="blob").collect()}
    assert got["junk"]["resized"] is None and got["null"]["resized"] is None
    assert (got["a"]["width"], got["a"]["height"]) == (16, 16)  # source dims
    w, h, _fmt, out = decode_ppm(bytes(got["a"]["resized"]))
    assert (w, h) == (8, 8)
    assert np.array_equal(out, resize_block_mean(px, 8, 8))
