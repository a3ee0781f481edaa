"""Video column handling (training-data-pipeline extra).

Same discipline as images (`functions/multimodal.py`) and audio
(`functions/audio.py`): video rides as an opaque `binary` column, the
decode is REAL, and every extracted feature is an exact integer so
results reproduce bit-for-bit across Spark, numpy and a SQL oracle.

The shipped codec parses Y4M (YUV4MPEG2) — the uncompressed interchange
format every video toolchain (ffmpeg, x264, mjpegtools) reads and
writes: a plain-text stream header, then `FRAME\n` + raw planes per
frame.  That makes the decoder stdlib+numpy only, like the netpbm/BMP/
PNG image codecs.  Compressed containers (mp4/webm) need external
codec libraries this container does not ship; such blobs fall back to a
clearly-marked `decoded=False` row, never a fake decode.

Feature extraction is luma(Y)-plane based — the plane every Y4M
colorspace (mono, 4:2:0, 4:4:4) shares — and all-integer:

- `video_stats`: dimensions, frame count, exact duration, total/`sumsq`
  luma sums.
- `video_frame_samples`: FRAME SAMPLING — every `every`-th frame
  explodes into its own row with per-frame luma sum and 64-bit aHash
  (`multimodal.ahash64` on the luma plane), so downstream ops see a
  normal long-format DataFrame, not blobs.
- `video_near_dups`: per-sampled-frame aHashes majority-combine into
  one 64-bit signature per video (bit b set iff more than half the
  sampled frames set bit b — SimHash-style, all-integer), which drops
  into the engine's capped+salted band join
  (`operators/lsh.simhash_pairs`).  Brightness-shifted or re-encoded
  copies land at bit-distance 0-2 where byte-level sha2 sees nothing.

Scale: decode + hash is one narrow `mapInPandas` pass over the blob
scan — video bytes never enter a shuffle; joins downstream carry only
(url, signature) rows.  Reference analog: HUMID treats reads as opaque
records and dedups on extracted keys (src/fastq.cc); this module is the
same shape for video blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from humid_spark.functions.multimodal import ahash64


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Minimal YUV4MPEG2 writer: `frames` shaped (n, h, w) mono or
    (n, h, w, 3) 4:4:4 uint8.  The sink-side counterpart of
    `decode_y4m` and the deterministic planting helper for tests and
    oracles."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        cs = "mono"
    elif f.ndim == 4 and f.shape[3] == 3:
        cs = "444"
    else:
        raise ValueError("frames must be (n,h,w) or (n,h,w,3)")
    n, h, w = f.shape[:3]
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n"
    out = [head.encode("ascii")]
    for i in range(n):
        out.append(b"FRAME\n")
        if cs == "mono":
            out.append(f[i].tobytes())
        else:  # planar, not interleaved: Y then U then V
            out.append(f[i, :, :, 0].tobytes())
            out.append(f[i, :, :, 1].tobytes())
            out.append(f[i, :, :, 2].tobytes())
    return b"".join(out)


def decode_y4m(blob: bytes) -> tuple[dict, np.ndarray]:
    """YUV4MPEG2 decode.  Returns (meta, y_frames[n, h, w] uint8) —
    the luma plane of every frame; chroma planes are parsed past, not
    returned (feature extraction here is luma-based).

    meta: {width, height, fps_num, fps_den, colorspace}.  Supported
    colorspaces: mono, 444, and the 420 family (420, 420jpeg,
    420mpeg2, 420paldv) — everything raw Y4M commonly carries.  Frame
    parameter strings after `FRAME` are tolerated per spec."""
    if blob[:10] != b"YUV4MPEG2 ":
        raise ValueError("not a YUV4MPEG2 stream")
    nl = blob.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = None
    fn, fd, cs = 25, 1, "420"
    for tok in blob[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            a, b = val.split(":")
            fn, fd = int(a), int(b)
        elif tag == b"C":
            cs = val
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs == "mono":
        chroma = 0
    elif cs == "444":
        chroma = 2 * w * h
    elif cs.startswith("420"):
        if w % 2 or h % 2:
            raise ValueError("4:2:0 needs even dimensions")
        chroma = (w * h) // 2
    else:
        raise ValueError(f"unsupported colorspace C{cs}")
    ysz = w * h
    frames: list[np.ndarray] = []
    i = nl + 1
    while i < len(blob):
        if blob[i : i + 5] != b"FRAME":
            raise ValueError("bad frame marker")
        fnl = blob.find(b"\n", i + 5)
        if fnl < 0 or fnl + 1 + ysz + chroma > len(blob):
            raise ValueError("truncated frame")
        frames.append(
            np.frombuffer(blob, dtype=np.uint8, count=ysz, offset=fnl + 1)
            .reshape(h, w)
        )
        i = fnl + 1 + ysz + chroma
    meta = {
        "width": w, "height": h, "fps_num": fn, "fps_den": fd,
        "colorspace": cs,
    }
    return meta, (
        np.stack(frames) if frames else np.empty((0, h, w), np.uint8)
    )


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("fps_num", T.IntegerType(), True),
        T.StructField("fps_den", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("y_sum", T.LongType(), True),
        T.StructField("y_sumsq", T.LongType(), True),
    ]
)


def video_stats(df: DataFrame, blob_col: str = "html",
                url_col: str = "url") -> DataFrame:
    """Exact integer per-video features: dimensions, frame count,
    duration_ms = floor(n_frames * 1000 * fps_den / fps_num), and the
    int64 sum / sum-of-squares of every luma sample.  Undecodable blobs
    keep decoded=False with null stats."""
    cols = df.select(F.col(url_col).alias("url"), F.col(blob_col).alias("blob"))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["blob"]):
                try:
                    meta, y = decode_y4m(bytes(blob))
                except (ValueError, TypeError):
                    rows.append((url, False) + (None,) * 8)
                    continue
                n = int(y.shape[0])
                y64 = y.astype(np.int64)
                rows.append((
                    url, True, meta["width"], meta["height"], n,
                    meta["fps_num"], meta["fps_den"],
                    n * 1000 * meta["fps_den"] // meta["fps_num"],
                    int(y64.sum()), int((y64 * y64).sum()),
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_STATS_SCHEMA.fields]
            )

    return cols.mapInPandas(stats, VIDEO_STATS_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("y_sum", T.LongType(), False),
        T.StructField("ahash", T.LongType(), True),
    ]
)


def video_frame_samples(df: DataFrame, every: int = 2,
                        blob_col: str = "html",
                        url_col: str = "url") -> DataFrame:
    """Frame sampling: every `every`-th frame (0, every, 2*every, ...)
    becomes one output row with its exact luma sum and 64-bit aHash
    (null for frames under the 8x8 hash grid).  Undecodable blobs yield
    no rows — join against `video_stats` for the decode ledger."""
    if every < 1:
        raise ValueError("every must be >= 1")
    cols = df.select(F.col(url_col).alias("url"), F.col(blob_col).alias("blob"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["blob"]):
                try:
                    _meta, y = decode_y4m(bytes(blob))
                except (ValueError, TypeError):
                    continue
                for idx in range(0, y.shape[0], every):
                    fr = y[idx]
                    try:
                        ah = ahash64(fr[:, :, None])
                    except ValueError:
                        ah = None
                    rows.append(
                        (url, idx, int(fr.astype(np.int64).sum()), ah)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return cols.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


VIDEO_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def video_resize(df: DataFrame, out_w: int, out_h: int, every: int = 1,
                 blob_col: str = "html", url_col: str = "url") -> DataFrame:
    """Resize every decodable video to out_w x out_h (exact per-frame
    block mean — `multimodal.resize_block_mean` on the luma plane),
    optionally frame-sampling every `every`-th frame, and re-encode as
    mono Y4M — decode, transform and encode in ONE Arrow pass; blobs
    never shuffle.  width/height/n_frames echo the SOURCE for lineage;
    undecodable or too-small sources yield null columns."""
    from humid_spark.functions.multimodal import resize_block_mean

    if every < 1:
        raise ValueError("every must be >= 1")
    cols = df.select(F.col(url_col).alias("url"), F.col(blob_col).alias("blob"))

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["blob"]):
                try:
                    meta, y = decode_y4m(bytes(blob))
                except (ValueError, TypeError):
                    rows.append((url, None, None, None, None))
                    continue
                try:
                    small = np.stack([
                        resize_block_mean(y[i], out_w, out_h)[:, :, 0]
                        for i in range(0, y.shape[0], every)
                    ]) if y.shape[0] else np.empty(
                        (0, out_h, out_w), np.uint8
                    )
                    out = encode_y4m(
                        small, fps=(meta["fps_num"], meta["fps_den"])
                    )
                except ValueError:
                    out = None
                rows.append((url, meta["width"], meta["height"],
                             int(y.shape[0]), out))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_RESIZE_SCHEMA.fields]
            )

    return cols.mapInPandas(rs, VIDEO_RESIZE_SCHEMA)


_GRAM_B = np.uint64(1000003)  # odd Horner base; wraps mod 2^64


def winnow_frame_hashes(hashes: np.ndarray, k: int = 3,
                        w: int = 4) -> np.ndarray:
    """Winnowed fingerprints of a FRAME-HASH SEQUENCE — the
    Schleimer-Wilkerson-Aiken scheme of `operators/containment.winnow`
    with int64 frame aHashes as the tokens instead of text bytes:
    k-gram Horner hashes (base 1000003, exact uint64 wraparound, so a
    SQL oracle replays them in HUGEINT mod-2^64 arithmetic), window-min
    over `w` consecutive grams, dedup.  Containment property carries
    over: if clip A's frame sequence occurs contiguously inside video B
    (same sampling), every w-window of A's gram sequence is a w-window
    of B's, so fp(A) ⊆ fp(B).

    Returns distinct fingerprints as SIGNED int64 (empty for sequences
    shorter than k; a single min-gram fingerprint for 1 <= n_grams < w,
    mirroring the short-doc rule in `containment.winnow_batch`)."""
    t = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    n = t.shape[0]
    if n < k:
        return np.empty(0, dtype=np.int64)
    h = t[: n - k + 1].copy()
    for j in range(1, k):
        h = h * _GRAM_B + t[j : n - k + 1 + j]
    if len(h) >= w:
        mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    else:
        mins = h.min(keepdims=True)
    return np.unique(mins).view(np.int64)


VIDEO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.StringType(), False),
        T.StructField("fps", T.ArrayType(T.LongType()), False),
    ]
)


def video_fingerprints(df: DataFrame, every: int = 1, k: int = 3,
                       w: int = 4, blob_col: str = "html",
                       url_col: str = "url") -> DataFrame:
    """(doc, fps) winnowed frame-sequence fingerprints, ONE mapInPandas
    pass per blob: decode -> sample every `every`-th frame -> per-frame
    aHash -> k-gram winnow.  Blobs never shuffle; the output rows carry
    only the fingerprint arrays.  Undecodable blobs and videos with
    fewer than k hashable frames yield no row."""
    cols = df.select(F.col(url_col).alias("url"), F.col(blob_col).alias("blob"))

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["blob"]):
                try:
                    _meta, y = decode_y4m(bytes(blob))
                except (ValueError, TypeError):
                    continue
                hs = []
                for idx in range(0, y.shape[0], every):
                    try:
                        hs.append(ahash64(y[idx][:, :, None]))
                    except ValueError:
                        pass  # sub-8x8 frames carry no hash
                got = winnow_frame_hashes(np.array(hs, dtype=np.int64), k, w)
                if len(got):
                    rows.append((url, got.tolist()))
            yield pd.DataFrame(rows, columns=["doc", "fps"])

    return cols.mapInPandas(fps, VIDEO_FP_SCHEMA)


def video_subclip_pairs(
    df: DataFrame,
    every: int = 1,
    k: int = 3,
    w: int = 4,
    min_share: float = 0.7,
    fp_cap: int = 500,
    blob_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Sub-clip containment: (src, dst, share_permille) where the
    smaller video's winnowed frame-fingerprint set is >= min_share
    contained in the intersection — a re-posted clip cut contiguously
    from a longer video scores exactly 1000 (the winnowing subset
    property over frame hashes).  The pair engine is the text
    containment backend (`operators/containment.
    containment_pairs_from_fps`): capped inverted fingerprint index,
    post-cap sizes, never an all-pairs join.

    The fingerprint table is localCheckpointed here (the backend
    consumes it four times; recomputing would re-decode every blob
    four times — the video analog of the 23s->4s text measurement in
    `containment_pairs`)."""
    from humid_spark.operators.containment import containment_pairs_from_fps

    spark = df.sparkSession
    fps = (
        video_fingerprints(df, every=every, k=k, w=w,
                           blob_col=blob_col, url_col=url_col)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    return containment_pairs_from_fps(fps, min_share=min_share,
                                      fp_cap=fp_cap)


def video_signatures(frame_hashes: DataFrame) -> DataFrame:
    """(url, vhash): majority-combine per-frame aHashes into one 64-bit
    signature — bit b set iff strictly more than half the sampled
    frames set bit b.  Pure Spark expressions (no second Python pass):
    each of the 64 bits aggregates as a conditional count compared
    against n/2 by cross-multiplication, then the bits OR together with
    the signed int64 wrap.  Deterministic, order-independent, and
    replayable in SQL — the video-level analog of SimHash."""
    h = frame_hashes.filter(F.col("ahash").isNotNull())
    # unsigned view of the signed hash for bit tests: shiftrightunsigned
    bitcols = [
        F.sum(
            F.shiftrightunsigned(F.col("ahash"), b).bitwiseAND(F.lit(1))
        ).alias(f"c{b}")
        for b in range(64)
    ]
    counts = h.groupBy("url").agg(
        F.count(F.lit(1)).alias("n"), *bitcols
    )
    vhash = None
    for b in range(64):
        term = F.when(
            F.col(f"c{b}") * 2 > F.col("n"),
            F.lit(1).cast("long") if b < 63 else F.lit(-(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        term = term * F.lit(1 << b).cast("long") if b < 63 else term
        vhash = term if vhash is None else vhash + term
    return counts.select("url", vhash.alias("vhash"))


def video_near_dups(
    df: DataFrame,
    blob_col: str = "html",
    url_col: str = "url",
    every: int = 2,
    max_bits: int = 3,
    n_bands: int = 4,
    band_cap: int = 2000,
    track: list | None = None,
) -> DataFrame:
    """Perceptual near-duplicate video detection: REAL Y4M decode ->
    frame-sample every `every`-th frame -> per-frame 64-bit aHash ->
    majority-combined video signature -> the engine's capped+salted
    SimHash band join.  With max_bits < n_bands the blocking is
    pigeonhole-EXHAUSTIVE over signatures.  Returns (src, dst,
    bit_dist) with src < dst."""
    from humid_spark.operators.lsh import simhash_pairs

    sigs = video_signatures(
        video_frame_samples(df, every=every, blob_col=blob_col,
                            url_col=url_col)
    )
    return simhash_pairs(
        sigs, max_bits=max_bits, n_bands=n_bands,
        id_col="url", sim_col="vhash", sig_bits=64,
        band_cap=band_cap, track=track,
    )
