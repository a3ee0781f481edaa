"""LSH band join (J1 at web scale) — from-scratch banding with skew caps.

Replaces the reference's pruned trie similarity search (src/humid.cc:113-130)
with MinHash banding: signature -> B bands of R rows -> xxhash64 per band
slice -> equi-join within (band, bucket).  All candidate generation is
built-in expressions + shuffle joins; AQE's skew-join splitting handles
moderate skew, and `bucket_cap` demotes degenerate buckets (identical
boilerplate) outright — the explicit skew logic BASELINE.json's north_rule
requires (SURVEY.md §4.3.6).  Hot-bucket members still pair through their
other, more selective bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.functions.signatures import est_jaccard


def band_buckets(sigs: DataFrame, cfg: DedupConfig, id_col: str = "doc_id",
                 sig_col: str = "minhash") -> DataFrame:
    """(doc_id, minhash) -> one row per (doc_id, band, bucket).

    bucket = xxhash64 of the band's signature slice (array hashing is a
    built-in; no Python).
    """
    r = cfg.rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice(F.col(sig_col), b * r + 1, r)).alias("bucket"),
            )
            for b in range(cfg.lsh_bands)
        ]
    )
    return sigs.select(id_col, F.explode(bands).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )


def candidate_pairs(buckets: DataFrame, cfg: DedupConfig,
                    id_col: str = "doc_id") -> DataFrame:
    """Within-bucket pair generation with a hard bucket cap.

    Buckets larger than cfg.bucket_cap would contribute O(cap^2) pairs of
    (typically) boilerplate-dominated docs; they are dropped here and
    surfaced to the caller via lineage metrics (count the demotions, don't
    silently hide them).
    """
    sizes = buckets.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    eligible = sizes.filter(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= cfg.bucket_cap)
    )
    pruned = buckets.join(eligible, ["band", "bucket"])
    a = pruned.alias("a")
    b = pruned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("src"),
            F.col(f"b.{id_col}").alias("dst"),
        )
        .distinct()
    )


def demoted_buckets(buckets: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Lineage: the (band, bucket, size) rows the cap dropped."""
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > cfg.bucket_cap)
    )


def verify_pairs(pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig,
                 id_col: str = "doc_id", sig_col: str = "minhash") -> DataFrame:
    """Estimate Jaccard from full signatures; keep pairs >= threshold.

    Two shuffle joins against the signature table (array compare is
    JVM-side).  The signature table is the analog of the reference's
    resident trie: |unique docs| rows, nothing larger ever re-read.
    """
    sa = sigs.select(
        F.col(id_col).alias("src"), F.col(sig_col).alias("sig_a")
    )
    sb = sigs.select(
        F.col(id_col).alias("dst"), F.col(sig_col).alias("sig_b")
    )
    return (
        pairs.join(sa, "src")
        .join(sb, "dst")
        .withColumn("est_jaccard", est_jaccard(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("est_jaccard") >= F.lit(cfg.jaccard_threshold))
        .select("src", "dst", "est_jaccard")
    )
