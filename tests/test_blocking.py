"""Blocking-join operator unit tests: pigeonhole chunk bounds, JVM-side
Hamming distance, and m=2 pair completeness vs the O(n^2) oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from humid_spark.operators.blocking import (
    chunk_bounds,
    edit_pairs,
    hamming_distance,
    hamming_pairs,
)
from humid_spark.oracle import build_edges
from humid_spark.sources.pages import base_words, mut


def test_chunk_bounds():
    # remainder goes to the LAST chunk (reference src/fastq.cc:220-230)
    assert chunk_bounds(24, 2) == [(1, 12), (13, 12)]
    assert chunk_bounds(24, 3) == [(1, 8), (9, 8), (17, 8)]
    assert chunk_bounds(25, 3) == [(1, 8), (9, 8), (17, 9)]
    assert chunk_bounds(10, 1) == [(1, 10)]


def test_hamming_distance_expression(spark):
    df = spark.createDataFrame(
        [("AAAA", "AAAA"), ("AAAA", "AATA"), ("ACGT", "TGCA")],
        "a string, b string",
    )
    got = [
        r["d"] for r in df.select(
            hamming_distance(F.col("a"), F.col("b")).alias("d")
        ).collect()
    ]
    assert got == [0, 1, 4]


def test_hamming_pairs_m2_complete(spark):
    words = base_words(8)
    keys = set(words)
    for w in words[:4]:
        keys.add(mut(w, 0))
        keys.add(mut(mut(w, 3), 17))          # distance 2
        keys.add(mut(mut(mut(w, 1), 5), 20))  # distance 3 (no link at m=2)
    keys = sorted(keys)
    oracle_adj = build_edges(keys, 2)
    expect = {
        (a, b) for a in oracle_adj for b in oracle_adj[a] if a < b
    }
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {(r["src"], r["dst"]) for r in hamming_pairs(df, 24, 2).collect()}
    assert got == expect


def test_edit_pairs_includes_shifted_matches(spark):
    # two fixed-length keys at edit distance 1 that are NOT hamming-1:
    # impossible at equal length; instead verify the shift blocking finds
    # substitution pairs and respects the levenshtein verify.
    w = base_words(1)[0]
    keys = [w, mut(w, 0), mut(mut(w, 0), 1)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {(r["src"], r["dst"]) for r in edit_pairs(df, 24, 1).collect()}
    oracle_adj = build_edges(keys, 1, use_edit=True)
    expect = {(a, b) for a in oracle_adj for b in oracle_adj[a] if a < b}
    assert got == expect
