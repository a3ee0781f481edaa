"""Incremental (snapshot-N+1) dedup: dedup a NEW batch against an EXISTING
corpus index without re-clustering the corpus.

The reference engine is batch-only — every run re-reads the full input
(src/humid.cc:443-452 loops the whole FastQ set per invocation).  At web
scale the dominant production shape is different: a crawl snapshot arrives
and must be deduplicated against the *already-ingested* corpus.  Re-running
the self-join over corpus+batch is O((C+B)^2 / buckets) work for what is
really an O(C*B / buckets) question, and at 100 TB the corpus side C is
1000x the batch side B.

Two tiers, mirroring run_web_pipeline's exact->near funnel:

- ``exact_survivors``: fingerprint anti-join.  The index is just the
  corpus's fingerprint column — at scale a bucketed table on ``fp`` so the
  anti-join is a storage-partitioned join with no shuffle of the (huge)
  index side; the batch side shuffles B rows only.  No pair set is ever
  materialized.

- ``cross_band_pairs``: asymmetric LSH band join.  The corpus keeps its
  banded MinHash buckets from ingest (write once, append per batch); the
  new batch computes its own buckets and equi-joins batch-vs-index on
  (band, bucket).  Unlike the self-join path (operators/lsh.py
  candidate_pairs) there is no ``src < dst`` dance — the two sides are
  disjoint by construction — and the skew control is one-sided: bucket
  sizes are measured on the INDEX side (the big side; a boilerplate bucket
  with 10^6 corpus members is the hazard, a hot batch bucket is bounded by
  the batch), hot buckets are salted (index members keep salt =
  hash(id) % S, batch rows replicate once per salt — every (batch, index)
  pair still meets exactly once), and buckets beyond ``bucket_cap`` are
  demoted with lineage (``demoted_cross_buckets``), never silently.

Verification (exact Jaccard / signature estimate) is the caller's existing
machinery — the pair schema matches lsh.verify_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_survivors(
    batch: DataFrame, index: DataFrame, key_col: str = "fp"
) -> DataFrame:
    """Rows of ``batch`` whose ``key_col`` does not appear in ``index``.

    LEFT ANTI join — Catalyst plans a null-safe-free hash anti-join; with a
    broadcastable index it is map-side, with a bucketed index it is
    storage-partitioned.  The index side is projected to the key column
    before the join so a 100-TB corpus contributes only its fingerprint
    column to the exchange.
    """
    return batch.join(
        index.select(key_col).distinct(), key_col, "left_anti"
    )


def cross_band_pairs(
    batch_buckets: DataFrame,
    index_buckets: DataFrame,
    *,
    bucket_cap: int = 2000,
    salts: int = 16,
    track: list | None = None,
) -> DataFrame:
    """Asymmetric candidate generation: batch bands vs index bands.

    Inputs are (doc_id, band, bucket) tables — the same shape
    lsh.band_buckets emits — from DISJOINT id spaces.  Output is distinct
    (src=batch doc, dst=index doc).

    Skew control (one-sided variant of candidate_pairs' scheme):
    - index bucket size > bucket_cap          -> demoted (lineage via
      ``demoted_cross_buckets``); members still pair through their other,
      more selective bands.
    - salt_threshold <= size <= bucket_cap    -> salted: index members get
      salt = xxhash64(id) % salts, batch rows replicate once per salt, the
      join key becomes (band, bucket, salt) — the hot bucket's O(B*size)
      work spreads over ``salts`` tasks with the identical pair set.
    - size < salt_threshold                   -> plain equi-join.

    With ``track`` the pruned index membership is persisted (it feeds both
    the cold and hot branches) and the handle appended for the caller to
    release; without ``track`` nothing is persisted.
    """
    salt_threshold = max(2, bucket_cap // 4)
    sizes = index_buckets.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    eligible = sizes.filter(F.col("bucket_size") <= bucket_cap)
    pruned = index_buckets.join(eligible, ["band", "bucket"])
    if track is not None:
        from pyspark import StorageLevel

        pruned = pruned.persist(StorageLevel.MEMORY_AND_DISK)
        track.append(pruned)

    batch = batch_buckets.select(
        F.col("doc_id").alias("src"), "band", "bucket"
    )

    cold = pruned.filter(F.col("bucket_size") < salt_threshold).select(
        F.col("doc_id").alias("dst"), "band", "bucket"
    )
    cold_pairs = batch.join(cold, ["band", "bucket"]).select("src", "dst")

    hot = pruned.filter(F.col("bucket_size") >= salt_threshold).select(
        F.col("doc_id").alias("dst"),
        "band",
        "bucket",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salts)).alias("salt"),
    )
    batch_salted = batch.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    hot_pairs = batch_salted.join(
        hot, ["band", "bucket", "salt"]
    ).select("src", "dst")

    return cold_pairs.union(hot_pairs).distinct()


def demoted_cross_buckets(
    index_buckets: DataFrame, bucket_cap: int = 2000
) -> DataFrame:
    """Lineage: the (band, bucket, bucket_size) index buckets the cap
    demoted — capped coverage is never silent (same contract as
    lsh.demoted_buckets)."""
    return (
        index_buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > bucket_cap)
    )
