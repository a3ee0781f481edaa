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
                    id_col: str = "doc_id",
                    track: list | None = None) -> DataFrame:
    """Within-bucket pair generation with explicit skew control:

    - size < 2                     -> no pairs (skipped)
    - 2 <= size < salt_threshold   -> plain within-bucket self-join
    - salt_threshold <= size <= bucket_cap -> SALTED self-join: members get
      salt = hash(id) % S; the left side keeps its salt, the right side is
      replicated once per partner salt, and the join key becomes
      (band, bucket, salt) — a single hot bucket's O(size^2) comparison
      work spreads over S shuffle partitions instead of one straggler task,
      with the EXACT same pair set (every (i, j) salt combination meets
      exactly once).
    - size > bucket_cap            -> demoted (boilerplate explosion);
      surfaced via demoted_buckets lineage, never silently hidden.
    """
    salts = cfg.lsh_salts
    salt_threshold = max(2, cfg.bucket_cap // 4)
    sizes = buckets.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    eligible = sizes.filter(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= cfg.bucket_cap)
    )
    # Materialize the eligible-bucket membership ONCE (compressed columnar
    # cache, spills to disk).  Without this the cold and hot self-joins
    # each recompute the 16x band explode AND the sizes aggregation on
    # BOTH sides — ~6 passes over the signature checkpoint per run.
    # Measured (min-of-3 interleaved, 3M rows, local[8]): candidate+verify
    # stage 77.3s -> 51.1s.  Lazy: first action materializes, every branch
    # reuses; the table holds only multi-member-bucket rows, a small
    # fraction of the explode at any scale.  persist (not localCheckpoint)
    # so the caller can RELEASE the blocks when the stage is done —
    # lineage stays intact, so a post-release action merely recomputes
    # instead of failing; long-lived sessions (bench loops, repeated CLI
    # runs) no longer accumulate executor storage (appended to `track`,
    # surfaced as WebDedupResult.release()).
    from pyspark import StorageLevel

    pruned = buckets.join(eligible, ["band", "bucket"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if track is not None:
        track.append(pruned)

    cold = pruned.filter(F.col("bucket_size") < salt_threshold)
    a = cold.alias("a")
    b = cold.alias("b")
    cold_pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("src"),
        F.col(f"b.{id_col}").alias("dst"),
    )

    hot = pruned.filter(F.col("bucket_size") >= salt_threshold).withColumn(
        "salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts))
    )
    hot_right = hot.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    ha = hot.alias("a")
    hb = hot_right.alias("b")
    hot_pairs = ha.join(
        hb,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.salt") == F.col("b.salt"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("src"),
        F.col(f"b.{id_col}").alias("dst"),
    )

    return cold_pairs.union(hot_pairs).distinct()


def demoted_buckets(buckets: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Lineage: the (band, bucket, size) rows the cap dropped."""
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > cfg.bucket_cap)
    )


def simhash_pairs(
    sims: DataFrame,
    max_bits: int = 3,
    n_bands: int = 4,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    sig_bits: int = 64,
) -> DataFrame:
    """SimHash near-dup candidates: `sig_bits`-bit fingerprints within
    `max_bits` bit-Hamming distance.

    Blocking by the pigeonhole principle on bit-bands: split the sig_bits
    into `n_bands` contiguous bands — two fingerprints within max_bits
    (< n_bands) must agree exactly on at least one band.  Band extraction
    is shift/mask (JVM), candidate join is an equi-join on (band, value),
    verification is bit_count(xor) <= max_bits.  The same shape as the
    MinHash band join, so the same skew/cap reasoning applies upstream.
    """
    width = sig_bits // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(sim_col), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for b in range(n_bands)
        ]
    )
    ex = sims.select(
        F.col(id_col).alias("doc"), F.col(sim_col).alias("sh"),
        F.explode(bands).alias("bb"),
    ).select("doc", "sh", "bb.band", "bb.val")
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("src"),
            F.col("b.doc").alias("dst"),
            F.bit_count(
                F.col("a.sh").bitwiseXOR(F.col("b.sh"))
            ).alias("bit_dist"),
        )
        .filter(F.col("bit_dist") <= max_bits)
        .select("src", "dst", "bit_dist")
        .distinct()
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
