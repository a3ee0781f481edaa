"""Incremental (snapshot-N+1) dedup pipeline: a persistent DedupIndex.

The reference engine is batch-only — every invocation re-reads the full
input (src/humid.cc:443-452 loops the whole FastQ set per run).  The
dominant web-scale production shape is different: a crawl snapshot B
arrives and must be deduplicated against the already-ingested corpus C,
where C is ~1000x B.  Re-running the batch pipeline over C+B costs
O((C+B)^2 / buckets); the incremental question is O(C*B / buckets), and —
crucially — C's expensive work (signature computation, exact collapse)
must be paid ONCE at ingest, not once per snapshot.

`DedupIndex` persists exactly the state the batch pipeline keeps resident
(the unique-text signature table — the analog of the reference's trie,
SURVEY.md §1.2) as a parquet table:

  <root>/_index.json   {config_hash, num_perm, scheme, batches: [...]}
  <root>/uniq/         parquet (text_hash, doc_id, minhash), append-only

  <root>/bands/        parquet (doc_id, band, bucket), the secondary index

Each committed batch owns a subdirectory (`uniq/batch-<id>/`,
`bands/batch-<id>/`); readers list ONLY the subdirectories the manifest
records, and the manifest write is an atomic rename — so the manifest is
the commit point and a crash anywhere mid-append leaves invisible orphans,
never a half-visible batch (the Iceberg snapshot discipline, file-based).

The three per-batch uses each scan ONLY the columns they need — parquet
column pruning does the work, nothing index-sized is ever cached — and
the first two never SHUFFLE the index either (the operators/incremental
plan contract: index scans are probed map-side against broadcast
batch-derived keys, so every exchange carries batch-bounded data):
the exact tier reads the text_hash column alone (~1/70th of the table —
the minhash arrays dominate the bytes) through one broadcast semi-join,
the near tier reads the materialized band table (written at
ingest/append, so the 16x explode + bucket hashing is paid once per
document ever, not once per snapshot) restricted at the scan to
batch-touched buckets, and the verify step reads (doc_id, minhash) into
an equi-join probed map-side against the broadcast candidate set
(``broadcast_candidates``, default on — measured 58.4 -> 47.9s classify
at 1M/100k vs the shuffle verify; switch it off for corpora whose hot
content makes the candidate set outgrow a broadcast, where a uniq table
bucketed by doc_id would storage-partition the shuffle away instead).
Measured (1M-corpus / 100k-batch
A/B, BENCH/incremental_ab.py): the materialized band table cut the
per-snapshot classify ~10% at 1M (93.1s -> 83.6s) — the bigger effect is
structural: without it the near tier re-derives bands from the minhash
column (the dominant index bytes) every snapshot; with it that column is
read once, by the verify join.

Stale-reuse safety mirrors sources/io.py: the manifest pins
cfg.config_hash() — loading or appending with ANY other config raises
(a changed shingle_k silently mixing signature spaces is the incremental
analog of reusing a stale checkpoint).  Batch ids are recorded append-only;
re-appending a batch id raises rather than double-ingesting.

Within-batch near-dup clustering is deliberately NOT folded in here: run
the batch through `run_web_pipeline` first (its exact collapse, LSH and CC
machinery are unchanged), then `dedup_batch` the representatives against
the index.  `dedup_batch` does collapse exact dups within the batch — that
is free on the way to signatures and keeps `survivors` one-row-per-text.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.functions.signatures import est_jaccard, minhash_map_in_arrow
from humid_spark.operators import lsh
from humid_spark.operators.incremental import (
    cross_band_pairs,
    demoted_cross_buckets,
    index_hit_keys,
)


@dataclass
class IncrementalResult:
    batch_uniq: DataFrame   # text_hash, count, doc_id(=min), minhash (in-batch collapse)
    exact_hits: DataFrame   # batch rows whose text already exists in the index
    near_pairs: DataFrame   # (src=batch doc_id, dst=index doc_id, est_jaccard)
    survivors: DataFrame    # batch uniq rows that are NEW content vs the index
    demoted: DataFrame      # capped index-side (band, bucket) lineage
    persisted: list = field(default_factory=list)

    def release(self) -> None:
        """Unpersist the per-batch cached intermediates (the index scan and
        the pruned cross-join membership).  Lineage survives — later
        actions recompute instead of failing."""
        for df in self.persisted:
            df.unpersist()


class DedupIndex:
    """Persistent batch-vs-index dedup state.  Construct via `build` (first
    ingest) or `load` (existing index); both verify the config hash."""

    def __init__(self, root: str, cfg: DedupConfig, manifest: dict):
        self.root = root
        self.cfg = cfg
        self.manifest = manifest

    # ---- lifecycle -------------------------------------------------------

    @classmethod
    def build(
        cls, pages: DataFrame, cfg: DedupConfig, root: str,
        batch_id: str = "initial",
    ) -> "DedupIndex":
        """Bootstrap an index from the initial corpus: exact-collapse +
        signatures (the same two stages run_web_pipeline pays), written
        once.

        Crash-safety layout: every batch (this one included) lands in its
        OWN subdirectory under uniq/ and bands/, and readers list only the
        subdirectories the manifest records — the manifest write (atomic
        tmp+rename) IS the commit point.  A crash between the data writes
        and the manifest leaves orphan subdirectories no reader ever sees;
        a retry overwrites them and commits."""
        if os.path.exists(cls._manifest_path(root)):
            raise ValueError(f"index already exists at {root}; use load()")
        spark = pages.sparkSession
        os.makedirs(root, exist_ok=True)
        uniq = cls._uniq_of(pages, cfg)
        udir = cls._batch_dir(cls._uniq_dir(root), batch_id)
        uniq.write.mode("overwrite").parquet(udir)
        lsh.band_buckets(
            spark.read.schema(cls._UNIQ_SCHEMA).parquet(udir), cfg
        ).write.mode("overwrite").parquet(
            cls._batch_dir(cls._bands_dir(root), batch_id)
        )
        manifest = {
            "config_hash": cfg.config_hash(),
            "num_perm": cfg.num_perm,
            "scheme": cfg.minhash_scheme,
            # batches = LIVE storage subdirectories (compaction rewrites
            # this list); ingested = every snapshot id ever committed (the
            # replay-idempotence ledger — compaction never touches it)
            "batches": [batch_id],
            "ingested": [batch_id],
            "created_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        cls._write_manifest(root, manifest)
        return cls(root, cfg, manifest)

    _UNIQ_SCHEMA = "text_hash long, doc_id long, minhash array<int>"
    _BANDS_SCHEMA = "doc_id long, band int, bucket long"

    @staticmethod
    def _write_manifest(root: str, manifest: dict) -> None:
        """Atomic commit: tmp file + os.replace — readers see the old or
        the new manifest, never a torn one."""
        tmp = DedupIndex._manifest_path(root) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, DedupIndex._manifest_path(root))

    @classmethod
    def load(cls, root: str, cfg: DedupConfig) -> "DedupIndex":
        with open(cls._manifest_path(root)) as f:
            manifest = json.load(f)
        # pre-compaction manifests carried no separate ingest ledger: the
        # live storage list WAS the ledger
        manifest.setdefault("ingested", list(manifest["batches"]))
        if manifest["config_hash"] != cfg.config_hash():
            raise ValueError(
                "config mismatch: index was built with config_hash="
                f"{manifest['config_hash']}, got {cfg.config_hash()} — "
                "signature spaces are incompatible; rebuild the index"
            )
        return cls(root, cfg, manifest)

    # ---- per-snapshot dedup ---------------------------------------------

    def dedup_batch(
        self,
        pages: DataFrame,
        broadcast_batch: bool = True,
        broadcast_candidates: bool | None = None,
    ) -> IncrementalResult:
        """Classify a new snapshot against the index.

        exact tier: ONE column-pruned index scan (text_hash alone) probed
        map-side against the broadcast batch keys; the resulting
        batch-bounded hit-key set is persisted once and broadcast into
        BOTH the exact-hit semi join and the survivor anti join — the
        index side never enters an exchange (operators/incremental.py
        module docstring).  near tier: asymmetric band join
        (cross_band_pairs — batch-touched-bucket restriction, one-sided
        caps and salting on the index side) + signature verify at
        cfg.jaccard_threshold.  survivors = batch uniques that passed both
        tiers; feed them to `append` to ingest.

        ``broadcast_batch=False`` reverts every tier to shuffle joins for
        a "batch" too large to broadcast its distinct keys (results
        identical, plan O(C)-exchange-heavy — see operators docstring).
        ``broadcast_candidates`` (default: follow ``broadcast_batch``)
        additionally broadcasts the verified-candidate side of the
        signature verify join — the one remaining index-sized exchange
        otherwise; its broadcast bound is looser (candidates are
        cap-bounded per batch band row, not batch-bounded), so it gets
        its own switch for corpora where hot content makes the candidate
        set large."""
        from pyspark import StorageLevel

        if broadcast_candidates is None:
            broadcast_candidates = broadcast_batch

        spark = pages.sparkSession
        persisted: list = []
        # the index is NEVER cached whole: each tier scans only its
        # columns (text_hash alone for the exact tier; the materialized
        # band table; (doc_id, minhash) for the verify join) — at corpus
        # scale the pruned scans are cheaper than materializing the
        # signature arrays, and the memory footprint stays batch-sized
        index = self.uniq(spark)

        batch_uniq = self._uniq_of(pages, self.cfg, count=True).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        persisted.append(batch_uniq)

        # hit-key set: <= batch-many longs, persisted once, broadcast into
        # both tiers below — the ONLY read of the index's text_hash column
        hit_keys = index_hit_keys(
            batch_uniq, index, "text_hash", broadcast_batch=broadcast_batch
        ).persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(hit_keys)
        bhits = F.broadcast(hit_keys) if broadcast_batch else hit_keys
        exact_hits = batch_uniq.join(bhits, "text_hash", "semi").select(
            "text_hash", "doc_id", "count"
        )
        fresh = batch_uniq.join(bhits, "text_hash", "anti")

        bsig = fresh.select("doc_id", "minhash")
        isig = index.select("doc_id", "minhash")
        ibuckets = self.bands(spark)
        bbuckets = lsh.band_buckets(bsig, self.cfg)
        cand = cross_band_pairs(
            bbuckets,
            ibuckets,
            bucket_cap=self.cfg.bucket_cap,
            salts=self.cfg.lsh_salts,
            track=persisted,
            broadcast_batch=broadcast_batch,
        )
        withs = cand.join(
            bsig.select(
                F.col("doc_id").alias("src"),
                F.col("minhash").alias("sig_a"),
            ),
            "src",
        )
        if broadcast_candidates:
            # the last index-sized exchange: without the hint the verify
            # equi-join shuffles the index's (doc_id, minhash) — the
            # dominant index bytes — per snapshot; the candidate side is
            # cap-bounded (<= batch band rows x bucket_cap before the
            # distinct, pair-shaped after), so broadcasting it makes the
            # verify a map-side probe of the signature scan
            withs = F.broadcast(withs)
        near_pairs = (
            withs.join(
                isig.select(
                    F.col("doc_id").alias("dst"),
                    F.col("minhash").alias("sig_b"),
                ),
                "dst",
            )
            .withColumn(
                "est_jaccard", est_jaccard(F.col("sig_a"), F.col("sig_b"))
            )
            .filter(
                F.col("est_jaccard") >= F.lit(self.cfg.jaccard_threshold)
            )
            .select("src", "dst", "est_jaccard")
            # pair-sized (post-verify) and read at least twice: once by the
            # survivors anti-join, once by the caller acting on near_pairs —
            # without the persist the band join + verify chain re-runs per
            # action (measured 19.3s -> ~7s for the sf0.01 bench headline)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        persisted.append(near_pairs)
        survivors = fresh.join(
            near_pairs.select(F.col("src").alias("doc_id")).distinct(),
            "doc_id",
            "anti",
        )
        return IncrementalResult(
            batch_uniq=batch_uniq,
            exact_hits=exact_hits,
            near_pairs=near_pairs,
            survivors=survivors,
            demoted=demoted_cross_buckets(
                ibuckets,
                bucket_cap=self.cfg.bucket_cap,
                batch_buckets=bbuckets,
                broadcast_batch=broadcast_batch,
            ),
            persisted=persisted,
        )

    def append(self, survivors: DataFrame, batch_id: str) -> None:
        """Ingest a batch's surviving uniques into the batch's OWN
        subdirectories (mode overwrite — a retry after a crash rewrites
        the same orphan, never doubles data), then commit by recording the
        batch id in the manifest (atomic rename).  Readers list only
        committed subdirectories, so a half-appended batch is invisible
        until the commit lands — the crash-mid-append replay hazard
        (uniq written, bands not, manifest not: every replayed batch row
        would look like an exact hit) cannot occur.  Duplicate batch ids
        raise — re-ingesting a committed snapshot would double the index."""
        if batch_id in self.manifest["ingested"]:
            raise ValueError(f"batch {batch_id!r} already ingested")
        # MATERIALIZE once: the survivors plan scans the committed index
        # (a corpus-sized read) — without the checkpoint the bands write
        # would re-run the whole exact+near chain.  (Correctness no longer
        # depends on this: the new subdirectories are not in any reader's
        # committed path list until the manifest commit below.)
        from humid_spark.operators.cc import CheckpointHandle

        rows = (
            survivors.select("text_hash", "doc_id", "minhash")
            .localCheckpoint(eager=True)
        )
        try:
            rows.write.mode("overwrite").parquet(
                self._batch_dir(self._uniq_dir(self.root), batch_id)
            )
            lsh.band_buckets(rows, self.cfg).write.mode(
                "overwrite"
            ).parquet(
                self._batch_dir(self._bands_dir(self.root), batch_id)
            )
        finally:
            CheckpointHandle(rows).unpersist()
        self.manifest["batches"].append(batch_id)
        self.manifest["ingested"].append(batch_id)
        self._write_manifest(self.root, self.manifest)

    def has_batch(self, batch_id: str) -> bool:
        """True when the manifest already records `batch_id` — the
        idempotence probe streaming replays use to skip re-ingest
        (streaming/incremental.py).  Checked against the INGEST ledger,
        not the live storage list: a replayed snapshot must stay a no-op
        after its rows were folded into a compaction snapshot."""
        return batch_id in self.manifest["ingested"]

    # ---- maintenance -------------------------------------------------------

    def compact(self, spark: SparkSession, partitions: int | None = None) -> bool:
        """Rewrite every committed batch into ONE new base snapshot.

        A year of daily snapshots leaves ~365 subdirectories per table —
        at cluster scale that is the classic small-files problem: every
        dedup_batch scan opens files proportional to the number of
        appends, and parquet footer reads dominate the exact tier.
        Compaction folds the live list back to a single subdirectory,
        exactly the Iceberg rewrite-data-files discipline, with the same
        crash safety as `append`: the merged uniq and band tables are
        written to a NEW subdirectory no reader sees (mode overwrite, so
        a crashed compaction's orphan is simply rewritten on retry), and
        the manifest swap — live list becomes [compact-N] — is the atomic
        commit point.  The ingest ledger is untouched, so replay
        idempotence (`has_batch`) survives compaction.  Old subdirectories
        become invisible orphans; reclaim them with `vacuum` once no
        reader holds plans over the old manifest.

        ``partitions`` optionally repartitions the rewrite (uniq on
        text_hash, bands on (band, bucket)) — sizing the compacted files
        for the cluster instead of inheriting per-batch parallelism.
        Returns False (no-op) when the index is already a single snapshot.
        """
        if len(self.manifest["batches"]) <= 1:
            return False
        n = 1 + max(
            (
                int(b.rsplit("-", 1)[1])
                for b in self.manifest["batches"]
                if b.startswith("compact-") and b.rsplit("-", 1)[1].isdigit()
            ),
            default=0,
        )
        cid = f"compact-{n}"
        uniq = self.uniq(spark)
        bands = self.bands(spark)
        if partitions:
            uniq = uniq.repartition(partitions, "text_hash")
            bands = bands.repartition(partitions, "band", "bucket")
        uniq.write.mode("overwrite").parquet(
            self._batch_dir(self._uniq_dir(self.root), cid)
        )
        bands.write.mode("overwrite").parquet(
            self._batch_dir(self._bands_dir(self.root), cid)
        )
        self.manifest["batches"] = [cid]
        self._write_manifest(self.root, self.manifest)
        return True

    def vacuum(self) -> list[str]:
        """Delete batch subdirectories the manifest no longer references
        (failed-append orphans, pre-compaction snapshots).  Safe whenever
        no concurrent reader still holds plans built from an OLDER
        manifest — the single-writer assumption the whole index already
        makes.  Returns the removed paths."""
        import shutil

        removed = []
        for base in (self._uniq_dir(self.root), self._bands_dir(self.root)):
            if not os.path.isdir(base):
                continue
            keep = {
                os.path.basename(self._batch_dir(base, b))
                for b in self.manifest["batches"]
            }
            for d in sorted(os.listdir(base)):
                path = os.path.join(base, d)
                if d.startswith("batch-") and d not in keep and os.path.isdir(path):
                    shutil.rmtree(path)
                    removed.append(path)
        return removed

    def _committed(self, base: str) -> list[str]:
        return [
            self._batch_dir(base, b) for b in self.manifest["batches"]
        ]

    def uniq(self, spark: SparkSession) -> DataFrame:
        # explicit schema: no footer inference, so a committed batch with
        # ZERO survivors (an empty parquet directory) reads as empty
        # instead of failing inference
        return spark.read.schema(self._UNIQ_SCHEMA).parquet(
            *self._committed(self._uniq_dir(self.root))
        )

    def bands(self, spark: SparkSession) -> DataFrame:
        """The (doc_id, band, bucket) secondary index; derived on the fly
        when the band table is absent (back-compat / manual deletion)."""
        if os.path.exists(self._bands_dir(self.root)):
            return spark.read.schema(self._BANDS_SCHEMA).parquet(
                *self._committed(self._bands_dir(self.root))
            )
        return lsh.band_buckets(self.uniq(spark), self.cfg)

    # ---- internals -------------------------------------------------------

    @staticmethod
    def _manifest_path(root: str) -> str:
        return os.path.join(root, "_index.json")

    @staticmethod
    def _uniq_dir(root: str) -> str:
        return os.path.join(root, "uniq")

    @staticmethod
    def _bands_dir(root: str) -> str:
        return os.path.join(root, "bands")

    @staticmethod
    def _batch_dir(base: str, batch_id: str) -> str:
        import re

        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", batch_id)
        return os.path.join(base, f"batch-{safe}")

    @staticmethod
    def _uniq_of(
        pages: DataFrame, cfg: DedupConfig, count: bool = False
    ) -> DataFrame:
        """pages -> (text_hash, doc_id=min over exact copies, minhash
        [, count]): the same signatures-at-the-scan + exact-collapse shape
        as run_web_pipeline (webdedup.py) — text never enters a shuffle."""
        min_len = max(cfg.shingle_k, 1)
        url = F.col("url")
        if cfg.canonicalize_urls:
            from humid_spark.functions.urls import canonical_url

            url = canonical_url(url)
        usable = (
            pages.withColumn("doc_id", F.xxhash64(url))
            .filter(
                F.col("text").isNotNull()
                & (F.length("text") >= min_len)
            )
            .withColumn("text_hash", F.xxhash64(F.col("text")))
        )
        sigs = minhash_map_in_arrow(
            usable, cfg.shingle_k, cfg.num_perm,
            scheme=cfg.minhash_scheme, passthrough=("text_hash",),
        )
        aggs = [
            F.min("doc_id").alias("doc_id"),
            # exact within a text_hash group: all texts byte-identical,
            # so every candidate minhash is identical
            F.first("minhash").alias("minhash"),
        ]
        if count:
            aggs.insert(0, F.count(F.lit(1)).alias("count"))
        return sigs.groupBy("text_hash").agg(*aggs)
