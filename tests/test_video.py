"""Round-5 video path: the stdlib Y4M codec, frame sampling, exact
luma stats, and the majority-combined aHash near-dup signature."""

from __future__ import annotations

import numpy as np
import pytest

from humid_spark.functions.multimodal import ahash64
from humid_spark.functions.video import (
    decode_y4m,
    encode_y4m,
    video_frame_samples,
    video_near_dups,
    video_signatures,
    video_stats,
    video_subclip_pairs,
    winnow_frame_hashes,
)


def _vid(seed, n=6, h=16, w=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 200, size=(n, h, w), dtype=np.uint8)


# ---------- codec ----------

def test_y4m_roundtrip_mono():
    f = _vid(1)
    meta, y = decode_y4m(encode_y4m(f, fps=(30, 1)))
    assert (meta["width"], meta["height"]) == (16, 16)
    assert (meta["fps_num"], meta["fps_den"]) == (30, 1)
    assert meta["colorspace"] == "mono"
    assert np.array_equal(y, f)


def test_y4m_roundtrip_444_returns_luma():
    rng = np.random.RandomState(2)
    f = rng.randint(0, 255, size=(3, 8, 10, 3), dtype=np.uint8)
    meta, y = decode_y4m(encode_y4m(f))
    assert meta["colorspace"] == "444"
    assert np.array_equal(y, f[:, :, :, 0])  # Y plane only


def test_y4m_420_chroma_skipped():
    # hand-build a 4:2:0 stream: Y full res + U,V quarter res
    w, h, n = 8, 6, 2
    rng = np.random.RandomState(3)
    ys = rng.randint(0, 255, size=(n, h, w), dtype=np.uint8)
    body = b"".join(
        b"FRAME\n" + ys[i].tobytes() + bytes((w * h) // 2) for i in range(n)
    )
    blob = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode() + body
    meta, y = decode_y4m(blob)
    assert meta["colorspace"] == "420jpeg" and y.shape == (n, h, w)
    assert np.array_equal(y, ys)


def test_y4m_frame_params_tolerated():
    f = _vid(4, n=2)
    blob = encode_y4m(f)
    # per spec, FRAME lines may carry parameters: FRAME Xsomething\n
    spliced = blob.replace(b"FRAME\n", b"FRAME Xval\n", 1)
    _meta, y = decode_y4m(spliced)
    assert np.array_equal(y, f)


def test_y4m_rejects_junk_and_truncation():
    with pytest.raises(ValueError):
        decode_y4m(b"RIFFxxxxWAVE")
    good = encode_y4m(_vid(5, n=2))
    with pytest.raises(ValueError):
        decode_y4m(good[: len(good) - 10])


# ---------- spark surfaces ----------

def test_video_stats_spark(spark):
    rows = []
    for i in range(5):
        f = _vid(i, n=3 + i)
        rows.append((f"v{i}", encode_y4m(f, fps=(25, 1))))
    rows.append(("bad", b"not video"))
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {r["url"]: r for r in video_stats(df, blob_col="blob").collect()}
    assert not got["bad"]["decoded"] and got["bad"]["y_sum"] is None
    for i in range(5):
        f = _vid(i, n=3 + i).astype(np.int64)
        r = got[f"v{i}"]
        assert r["decoded"] and (r["width"], r["height"]) == (16, 16)
        assert r["n_frames"] == 3 + i
        assert r["duration_ms"] == (3 + i) * 1000 // 25
        assert r["y_sum"] == int(f.sum())
        assert r["y_sumsq"] == int((f * f).sum())


def test_video_frame_samples_spark(spark):
    f = _vid(7, n=7)
    df = spark.createDataFrame(
        [("v", encode_y4m(f))], "url string, blob binary"
    )
    got = sorted(
        (r["frame_idx"], r["y_sum"], r["ahash"])
        for r in video_frame_samples(df, every=3, blob_col="blob").collect()
    )
    assert [g[0] for g in got] == [0, 3, 6]
    for idx, ysum, ah in got:
        assert ysum == int(f[idx].astype(np.int64).sum())
        assert ah == ahash64(f[idx][:, :, None])


def test_video_signature_majority(spark):
    # 3 frames: two share a hash, one differs -> majority == the pair's
    # hash on every bit where the odd frame disagrees
    a, b = _vid(8, n=1)[0], _vid(9, n=1)[0]
    f = np.stack([a, a, b])
    df = spark.createDataFrame(
        [("v", encode_y4m(f))], "url string, blob binary"
    )
    sig = video_signatures(
        video_frame_samples(df, every=1, blob_col="blob")
    ).collect()[0]
    ha, hb = ahash64(a[:, :, None]), ahash64(b[:, :, None])
    expect = 0
    for bit in range(64):
        n_set = ((ha >> bit) & 1) * 2 + ((hb >> bit) & 1)
        if n_set * 2 > 3 * 1:  # majority of 3 frames
            expect |= 1 << bit
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert sig["vhash"] == expect == ha  # 2-of-3 majority is exactly ha


def test_video_resize_spark(spark):
    from humid_spark.functions.multimodal import resize_block_mean
    from humid_spark.functions.video import video_resize

    f = _vid(50, n=5)
    df = spark.createDataFrame(
        [("v", encode_y4m(f, fps=(30, 1))), ("bad", b"avi soup")],
        "url string, blob binary",
    )
    got = {r["url"]: r
           for r in video_resize(df, 8, 8, every=2, blob_col="blob").collect()}
    assert got["bad"]["resized"] is None
    r = got["v"]
    assert (r["width"], r["height"], r["n_frames"]) == (16, 16, 5)  # source
    meta, small = decode_y4m(bytes(r["resized"]))
    assert (meta["width"], meta["height"]) == (8, 8)
    assert (meta["fps_num"], meta["fps_den"]) == (30, 1)  # fps preserved
    assert small.shape[0] == 3  # frames 0, 2, 4
    for j, idx in enumerate((0, 2, 4)):
        assert np.array_equal(
            small[j], resize_block_mean(f[idx], 8, 8)[:, :, 0]
        )


def test_winnow_frame_hashes_subset_property():
    rng = np.random.RandomState(31)
    full = rng.randint(-(1 << 62), 1 << 62, size=20).astype(np.int64)
    clip = full[5:13]  # contiguous run
    fp_full = set(winnow_frame_hashes(full).tolist())
    fp_clip = set(winnow_frame_hashes(clip).tolist())
    assert fp_clip and fp_clip <= fp_full


def test_winnow_frame_hashes_edges():
    assert len(winnow_frame_hashes(np.array([1, 2], dtype=np.int64))) == 0
    # k <= n_grams < w: single min-gram fingerprint
    short = winnow_frame_hashes(np.array([1, 2, 3, 4], dtype=np.int64))
    assert len(short) == 1


def test_video_subclip_pairs_spark(spark):
    rng = np.random.RandomState(41)
    rows = []
    fulls = []
    for i in range(6):
        f = rng.randint(0, 200, size=(10, 16, 16), dtype=np.uint8)
        fulls.append(f)
        rows.append((f"full{i}", encode_y4m(f)))
        if i < 2:  # re-posted clip: frames 2..7 cut contiguously
            rows.append((f"clip{i}", encode_y4m(f[2:8])))
    rows.append(("junk", b"webm soup"))
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {(r["src"], r["dst"]): r["share_permille"]
           for r in video_subclip_pairs(df, blob_col="blob").collect()}
    for i in range(2):
        assert got.get((f"clip{i}", f"full{i}")) == 1000, got


def test_video_near_dups_spark(spark):
    rows = []
    for i in range(8):
        f = _vid(20 + i, n=6)
        rows.append((f"vid{i}", encode_y4m(f)))
        if i < 2:  # brightness-shifted re-encode: aHash-identical
            rows.append((f"sh{i}", encode_y4m(f + 8)))
    rows.append(("junk", b"mp4 soup"))
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {(r["src"], r["dst"]): r["bit_dist"]
           for r in video_near_dups(df, blob_col="blob").collect()}
    for i in range(2):
        assert got.get((f"sh{i}", f"vid{i}")) == 0, got
