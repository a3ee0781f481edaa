"""Exact-substring / containment duplicate detection via winnowing.

The reference catches only whole-key duplicates; SURVEY.md §7.2 M4 adds a
containment pass for docs embedded verbatim inside larger docs (quote
farms, scraped mirrors) — pairs whose full-text Jaccard is LOW, so MinHash
LSH structurally misses them.

Algorithm (Schleimer-Wilkerson-Aiken winnowing, public literature):
char-k-gram rolling hashes -> sliding window of w -> keep each window's
minimum -> a document's fingerprint set.  If A is contained in B, almost
every fingerprint of A is also selected in B (winnowing is position-
independent).  Candidates come from an inverted fingerprint index
(explode -> groupBy fp), hot fingerprints capped exactly like LSH buckets;
the containment score = |fp(A) ∩ fp(B)| / min(|fp(A)|, |fp(B)|).

All set math happens as aggregations over the exploded index — the
fingerprint sets themselves are never pairwise-joined as arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from humid_spark.functions.signatures import P31, shingle_hashes


def winnow(text: str | None, k: int = 8, w: int = 16) -> np.ndarray:
    """Distinct winnowed fingerprints of `text` (k-gram hashes, window w)."""
    if not text:
        return np.empty(0, dtype=np.int64)
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        return np.empty(0, dtype=np.int64)
    powers = np.empty(k, dtype=np.int64)
    p = 1
    for i in range(k - 1, -1, -1):
        powers[i] = p
        p = (p * 131) % P31
    grams = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.int64)
    hashes = (grams @ powers) % P31
    if len(hashes) <= w:
        return np.unique(hashes.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
    return np.unique(wins.min(axis=1))


def make_winnow_udf(k: int = 8, w: int = 16):
    @pandas_udf(T.ArrayType(T.LongType()))
    def winnow_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnow(t, k, w).tolist())

    return winnow_udf


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    min_share: float = 0.7,
    fp_cap: int = 500,
) -> DataFrame:
    """(doc_id, text) -> (src, dst, share_permille) pairs where the smaller
    fingerprint set is >= min_share contained in the intersection."""
    udf = make_winnow_udf(k, w)
    fps = docs.select(
        F.col(id_col).alias("doc"), udf(F.col(text_col)).alias("fps")
    )
    sizes = fps.select("doc", F.size("fps").alias("n_fp")).filter(
        F.col("n_fp") > 0
    )
    inv = fps.select("doc", F.explode("fps").alias("fp"))
    hot = (
        inv.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > fp_cap)
        .select("fp")
    )
    inv = inv.join(F.broadcast(hot), "fp", "left_anti")

    a = inv.alias("a")
    b = inv.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("doc").alias("src"), F.col("n_fp").alias("n_src"))
    nb = sizes.select(F.col("doc").alias("dst"), F.col("n_fp").alias("n_dst"))
    return (
        shared.join(na, "src")
        .join(nb, "dst")
        .withColumn(
            "share_permille",
            F.floor(
                F.col("shared") * 1000 / F.least(F.col("n_src"), F.col("n_dst"))
            ).cast("long"),
        )
        .filter(F.col("share_permille") >= int(min_share * 1000))
        .select("src", "dst", "share_permille")
    )
