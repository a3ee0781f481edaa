"""Round-5 multimodal extensions: the stdlib WAV codec + exact audio
features, and the 64-bit average-hash image near-dup path (decode ->
aHash -> capped SimHash band join)."""

from __future__ import annotations

import numpy as np
import pytest

from humid_spark.functions.audio import (
    audio_fp64,
    audio_near_dups,
    audio_stats,
    decode_wav,
    encode_wav,
)
from humid_spark.functions.multimodal import ahash64, image_near_dups


# ---------- WAV codec ----------

def test_wav_roundtrip_mono():
    s = (np.arange(500, dtype=np.int64) * 313 % 2001 - 1000).astype(np.int16)
    ch, rate, got = decode_wav(encode_wav(s, 8000))
    assert (ch, rate) == (1, 8000)
    assert np.array_equal(got[:, 0], s)


def test_wav_roundtrip_stereo_and_extra_chunk():
    s = np.stack(
        [np.arange(100, dtype=np.int16), -np.arange(100, dtype=np.int16)],
        axis=1,
    )
    blob = encode_wav(s, 44100)
    # splice a LIST chunk between fmt and data: the walker must skip it
    fmt_end = blob.index(b"data")
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    ch, rate, got = decode_wav(spliced)
    assert (ch, rate) == (2, 44100)
    assert np.array_equal(got, s)


def test_wav_8bit_pcm():
    payload = bytes(range(0, 200, 2))  # 100 unsigned 8-bit samples
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    ch, rate, got = decode_wav(blob)
    assert (ch, rate, got.shape[0]) == (1, 8000, 100)
    assert got[0, 0] == (0 - 128) << 8 and got[99, 0] == (198 - 128) << 8


def test_wav_rejects_non_wav():
    for junk in (b"", b"RIFFxxxxWEBP", b"\x89PNG\r\n\x1a\n" + b"0" * 50):
        with pytest.raises(ValueError):
            decode_wav(junk)


def test_audio_stats_spark(spark):
    rows = []
    for i in range(8):
        n = 50 + 10 * i
        s = ((np.arange(n, dtype=np.int64) * 37 + i * 101) % 2001 - 1000
             ).astype(np.int16)
        rows.append((f"a{i}", encode_wav(s, 8000)))
    rows.append(("bad", b"not audio at all"))
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {r["url"]: r for r in audio_stats(df, blob_col="blob").collect()}
    assert not got["bad"]["decoded"] and got["bad"]["sumsq"] is None
    for i in range(8):
        n = 50 + 10 * i
        s = ((np.arange(n, dtype=np.int64) * 37 + i * 101) % 2001 - 1000)
        r = got[f"a{i}"]
        assert r["decoded"] and r["n_channels"] == 1
        assert r["n_samples"] == n and r["duration_ms"] == n * 1000 // 8000
        assert r["sumsq"] == int((s ** 2).sum())
        neg = s < 0
        assert r["zero_crossings"] == int(
            np.count_nonzero(neg[1:] != neg[:-1])
        )


# ---------- acoustic fingerprint ----------

def _wav_samples(seed, n=300):
    rng = np.random.RandomState(seed)
    return rng.randint(-1000, 1001, size=n).astype(np.int16)


def test_audio_fp_volume_invariant():
    s = _wav_samples(1)
    assert audio_fp64(s) == audio_fp64(s * 2) == audio_fp64(s * 7)


def test_audio_fp_distinct_clips_differ():
    assert audio_fp64(_wav_samples(1)) != audio_fp64(_wav_samples(2))


def test_audio_fp_rejects_short():
    with pytest.raises(ValueError):
        audio_fp64(_wav_samples(3, n=64))


def test_audio_fp_signed_int64_range():
    # strictly growing envelope forces every bit set -> negative int64
    s = (np.arange(650) // 10 * 3).astype(np.int16)
    v = audio_fp64(s)
    assert -(1 << 63) <= v < 0


def test_audio_fp_matches_reference_formula():
    s = _wav_samples(4, n=257)
    mix = s.astype(np.int64)
    bounds = [k * 257 // 65 for k in range(65)]
    e = [int((mix[bounds[k]: (bounds[k + 1] if k < 64 else 257)] ** 2).sum())
         for k in range(65)]
    expect = 0
    for k in range(64):
        if e[k + 1] > e[k]:
            expect |= 1 << k
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert audio_fp64(s) == expect


def test_audio_near_dups_spark(spark):
    rows = []
    for i in range(10):
        s = _wav_samples(20 + i)
        rows.append((f"clip{i}", encode_wav(s, 8000)))
        if i < 2:  # volume-doubled re-encode: fingerprint-identical
            rows.append((f"loud{i}", encode_wav(s * 2, 8000)))
    rows.append(("junk", b"ogg soup"))
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {(r["src"], r["dst"]): r["bit_dist"]
           for r in audio_near_dups(df, blob_col="blob").collect()}
    for i in range(2):
        assert got.get((f"clip{i}", f"loud{i}")) == 0, got


# ---------- average hash ----------

def _img(seed, w=16, h=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 200, size=(h, w, 3), dtype=np.uint8)


def test_ahash_brightness_invariant():
    px = _img(1)
    assert ahash64(px) == ahash64(px + 8)  # uniform shift, provably equal


def test_ahash_distinct_images_differ():
    assert ahash64(_img(1)) != ahash64(_img(2))


def test_ahash_rejects_tiny():
    with pytest.raises(ValueError):
        ahash64(_img(3, w=7, h=16))


def test_ahash_signed_int64_range():
    # bright-bottom image forces high-index bits; result must stay a
    # valid signed int64 (bit 63 wraps negative, LongType-safe)
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[8:] = 255
    v = ahash64(px)
    assert -(1 << 63) <= v < (1 << 63)
    assert v < 0  # bit 63 (block 7,7, bright) is set


def test_image_near_dups_spark(spark):
    # 12 distinct random images; 0 and 1 re-enter brightness-shifted
    # (ahash-identical) under new urls; one undecodable blob is ignored
    rows = []
    for i in range(12):
        px = _img(i)
        blob = b"P6\n16 16\n255\n" + px.tobytes()
        rows.append((f"img{i:02d}", blob))
        if i < 2:
            rows.append((f"shifted{i}",
                         b"P6\n16 16\n255\n" + (px + 8).tobytes()))
    rows.append(("junk", b"whatever"))
    df = spark.createDataFrame(rows, "url string, blob binary")
    got = {(r["src"], r["dst"]): r["bit_dist"]
           for r in image_near_dups(df, blob_col="blob").collect()}
    for i in range(2):
        pair = (f"img{i:02d}", f"shifted{i}")
        assert pair in got and got[pair] == 0, got
