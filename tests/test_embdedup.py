"""Embedding-cosine near-dup operator: integer SimHash reproducibility,
pigeonhole-exact blocking, and planted-near-dup recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from humid_spark.operators.embdedup import (
    QUANT,
    embedding_near_dup_pairs,
    embedding_simhash_udf,
    plane_weights,
)

DIM = 32


def _corpus(n=120, n_dups=40, seed=7):
    """n base unit-ish vectors + n_dups perturbed near-copies (planted
    cos ~0.999) with ids offset by 10_000."""
    rng = np.random.RandomState(seed)
    base = rng.randn(n, DIM)
    factors = np.where(np.arange(DIM) % 5 == 0, 1.06, 1.0)
    pert = base[:n_dups] * factors
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in base[i]]}
        for i in range(n)
    ] + [
        {"vec_id": 10_000 + i, "embedding": [float(x) for x in pert[i]]}
        for i in range(n_dups)
    ]
    return rows


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(_corpus()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_signature_matches_integer_reference(spark, emb_df):
    """The vectorized UDF must equal the direct integer computation —
    quantize, int plane dot, sign bits — element for element."""
    got = {
        r["vec_id"]: r["esig"]
        for r in emb_df.select(
            "vec_id", embedding_simhash_udf(16, 1)(F.col("embedding")).alias("esig")
        ).collect()
    }
    w = plane_weights(16, DIM, 1)
    for row in _corpus():
        v = np.array(row["embedding"], dtype=np.float64)
        q = np.floor(v * QUANT + 0.5).astype(np.int64)
        sig = int(((q @ w.T > 0).astype(np.int64) << np.arange(16)).sum())
        assert got[row["vec_id"]] == sig, row["vec_id"]


def test_blocking_is_pigeonhole_exact(spark, emb_df):
    """Band-blocked candidate set == brute-force hamming <= max_bits for
    max_bits < n_bands (recall 1 by pigeonhole; no SQL needed)."""
    sigs = {
        r["vec_id"]: r["esig"]
        for r in emb_df.select(
            "vec_id", embedding_simhash_udf(16, 1)(F.col("embedding")).alias("esig")
        ).collect()
    }
    brute = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                brute.add((a, b))
    got = {
        (r["src"], r["dst"])
        for r in embedding_near_dup_pairs(
            emb_df, cos_threshold=-1.0  # keep every blocked pair
        ).collect()
    }
    assert got == brute


def test_planted_near_dup_recall(spark, emb_df):
    """Every planted perturbed copy (cos ~0.999) must pair with its
    source at the default threshold; near-orthogonal strangers must not."""
    pairs = embedding_near_dup_pairs(emb_df, cos_threshold=0.99).collect()
    got = {(r["src"], r["dst"]) for r in pairs}
    planted = {(i, 10_000 + i) for i in range(40)}
    missed = planted - got
    assert not missed, f"missed planted near-dups: {sorted(missed)[:5]}"
    for r in pairs:
        assert r["cos_permille"] >= 990
    extras = got - planted
    assert len(extras) <= 2, f"false near-dups: {sorted(extras)[:5]}"
