"""Incremental (batch-vs-index) dedup: anti-join exactness, asymmetric
band-join pair-set parity with the naive join, one-sided salting
invariance, cap demotion lineage."""

from __future__ import annotations

from humid_spark.operators.incremental import (
    cross_band_pairs,
    demoted_cross_buckets,
    exact_survivors,
)


def test_exact_survivors_anti_join(spark):
    batch = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc"), (4, "bb")], "doc_id long, fp string"
    )
    index = spark.createDataFrame(
        [(100, "bb"), (101, "zz"), (102, "bb")], "doc_id long, fp string"
    )
    got = sorted(r["doc_id"] for r in exact_survivors(batch, index).collect())
    assert got == [1, 3]  # both "bb" batch rows drop, nothing else


def _naive_pairs(batch_rows, index_rows):
    want = set()
    for bid, bband, bbucket in batch_rows:
        for iid, iband, ibucket in index_rows:
            if (bband, bbucket) == (iband, ibucket):
                want.add((bid, iid))
    return want


def test_cross_band_pairs_matches_naive_and_salting_invariant(spark):
    # hot index bucket (60 members, salt_threshold = 25 at cap 100),
    # cold bucket (3 members), batch hits both plus a miss bucket
    index_rows = [(1000 + i, 0, 7) for i in range(60)]
    index_rows += [(2000 + i, 1, 9) for i in range(3)]
    batch_rows = [(1, 0, 7), (2, 0, 7), (3, 1, 9), (4, 2, 555)]
    batch = spark.createDataFrame(
        batch_rows, "doc_id long, band int, bucket long"
    )
    index = spark.createDataFrame(
        index_rows, "doc_id long, band int, bucket long"
    )
    want = _naive_pairs(batch_rows, index_rows)

    track: list = []
    for salts in (1, 16):
        got = {
            (r["src"], r["dst"])
            for r in cross_band_pairs(
                batch, index, bucket_cap=100, salts=salts, track=track
            ).collect()
        }
        assert got == want
    for df in track:
        df.unpersist()


def test_cross_band_pairs_cap_demotes_with_lineage(spark):
    index_rows = [(1000 + i, 0, 7) for i in range(60)]  # demoted at cap 50
    index_rows += [(2000 + i, 1, 9) for i in range(3)]
    batch_rows = [(1, 0, 7), (2, 1, 9)]
    batch = spark.createDataFrame(
        batch_rows, "doc_id long, band int, bucket long"
    )
    index = spark.createDataFrame(
        index_rows, "doc_id long, band int, bucket long"
    )
    got = {
        (r["src"], r["dst"])
        for r in cross_band_pairs(batch, index, bucket_cap=50).collect()
    }
    assert got == {(2, 2000), (2, 2001), (2, 2002)}
    demoted = demoted_cross_buckets(index, bucket_cap=50).collect()
    assert [(r["band"], r["bucket"], r["bucket_size"]) for r in demoted] == [
        (0, 7, 60)
    ]
