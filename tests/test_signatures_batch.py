"""Batch-vectorized signature paths must be bit-identical to the per-doc
reference implementations (the per-doc functions are the readable spec;
the batch functions are what the engine ships in its pandas/Arrow UDFs).

Covers the edge cases that broke naive vectorizations: None/empty texts,
texts shorter than the shingle/window, docs spliced at buffer boundaries,
>255 unique shingles (uint8 vote-count overflow), and negative SimHash
majorities (uint64 wraparound in the round-1 per-doc path).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from humid_spark.functions.signatures import (
    _coeffs,
    concat_poly_hashes,
    kperm_signatures_batch,
    minhash_signature,
    oph_signature,
    oph_signatures_batch,
    shingle_hashes,
    simhash64,
    simhash_batch,
)
from humid_spark.operators.containment import winnow, winnow_batch

K = 5


def _fixture_texts() -> list[str | None]:
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(300)]
    texts: list[str | None] = []
    for i in range(400):
        n_words = rng.randint(0, 60)
        texts.append(
            " ".join(rng.choice(vocab) for _ in range(n_words))
            if n_words
            else ("" if i % 3 else None)
        )
    texts += [
        "",
        None,
        "ab",                                   # shorter than k
        "abcd",
        "abcde",                                # exactly k
        "x" * 200,                              # one repeated shingle
        " ".join(f"w{i % 700}" for i in range(900)),  # >255 unique shingles
    ]
    return texts


def test_concat_poly_hashes_matches_shingle_hashes():
    texts = _fixture_texts()
    hashes, doc_of, n = concat_poly_hashes(texts, K)
    assert n == len(texts)
    for i, t in enumerate(texts):
        seg = hashes[doc_of == i]
        assert np.array_equal(np.unique(seg), shingle_hashes(t or "", K)), i


def test_simhash_batch_bit_identical():
    texts = _fixture_texts()
    got = simhash_batch(texts, K)
    for i, t in enumerate(texts):
        assert got[i] == simhash64(t, K), i


def test_kperm_batch_bit_identical():
    texts = _fixture_texts()
    a, b = _coeffs(32)
    got = kperm_signatures_batch(texts, K, 32)
    for i, t in enumerate(texts):
        ref = np.asarray(minhash_signature(t, K, a, b), dtype=np.int64)
        assert np.array_equal(got[i], ref.astype(np.int32, casting="unsafe")), i


def test_oph_batch_bit_identical():
    texts = _fixture_texts()
    got = oph_signatures_batch(texts, K, 64)
    for i, t in enumerate(texts):
        assert np.array_equal(got[i], oph_signature(t, K, 64).astype(np.int32)), i


@pytest.mark.parametrize("k,w", [(8, 16), (4, 4), (8, 200)])
def test_winnow_batch_bit_identical(k, w):
    texts = _fixture_texts()
    doc_of, fps = winnow_batch(texts, k, w)
    per_doc: dict[int, list[int]] = {i: [] for i in range(len(texts))}
    for d, f in zip(doc_of, fps):
        per_doc[int(d)].append(int(f))
    for i, t in enumerate(texts):
        assert per_doc[i] == winnow(t, k, w).tolist(), i


def test_simhash_negative_majority_bit_clear():
    # a bit whose vote sum is negative must be CLEAR; the round-1 per-doc
    # path wrapped negative uint64 votes positive and set it
    texts = _fixture_texts()
    sigs = simhash_batch(texts, K)
    # at least one doc must have a mix of set and clear bits (majority
    # computation is actually discriminating, not all-ones)
    multi = [s for s in sigs if s not in (0, -1)]
    assert multi, "fixture produced only degenerate simhashes"
