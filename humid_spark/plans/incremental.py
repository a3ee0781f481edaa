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

  <root>/_index.json   {config_hash, num_perm, scheme, batches: [...],
                        clusters, remap_v}
  <root>/uniq/         parquet (text_hash, doc_id, minhash), append-only

  <root>/bands/        parquet (doc_id, band, bucket), the secondary index
  <root>/clusters/     parquet (doc_id, cluster), append-only cluster map
                       (build(with_clusters=True) + cluster_batch/append)
  <root>/remaps/v-N/   parquet (old_cluster, new_cluster), the tiny
                       root-resolved merge table applied at read time
                       (merge-on-read; compact folds it in and resets it)
  <root>/deletes/v-N/  parquet (text_hash, doc_id) tombstones — row-level
                       deletes applied at read time by one broadcast
                       anti-join (`delete`; compact folds them physically)

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

`dedup_batch` collapses exact dups within the batch (free on the way to
signatures; `survivors` is one-row-per-text) but leaves within-batch NEAR
dups to either `run_web_pipeline` over the batch first, or — when the
index maintains a cluster map — to `cluster_batch`, which computes the
within-batch verified pairs as part of assigning every fresh doc a
persistent cluster id.  The cluster map is the incremental analog of the
batch pipeline's CC output: cluster id = min member doc_id ever seen,
batch-induced merges recorded in a tiny root-resolved remap table applied
at read time (merge-on-read) instead of rewriting the corpus-sized map —
the same discipline Iceberg uses for row-level deletes.
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
from humid_spark.operators.cc import connected_components
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
    fresh: DataFrame = None  # batch uniq rows past the exact tier (near + new)
    fresh_buckets: DataFrame = None  # (doc_id, band, bucket) of fresh docs
    persisted: list = field(default_factory=list)

    def release(self) -> None:
        """Unpersist the per-batch cached intermediates (the index scan and
        the pruned cross-join membership).  Lineage survives — later
        actions recompute instead of failing."""
        for df in self.persisted:
            df.unpersist()

    def funnel(self) -> DataFrame:
        """(metric, value) tier counts for this snapshot — the incremental
        analog of WebDedupResult.funnel(): batch_uniq -> exact_hits ->
        near_dups -> survivors.  combine_single_rows keeps the combination
        join-free (the no-cartesian hygiene shape)."""
        from humid_spark.functions.rows import combine_single_rows

        row = combine_single_rows([
            self.batch_uniq.agg(F.count(F.lit(1)).alias("batch_uniq")),
            self.exact_hits.agg(F.count(F.lit(1)).alias("exact_hits")),
            self.near_pairs.select("src").distinct()
            .agg(F.count(F.lit(1)).alias("near_dups")),
            self.survivors.agg(F.count(F.lit(1)).alias("survivors")),
        ])
        return row.selectExpr(
            "stack(4, "
            "'batch_uniq', batch_uniq, "
            "'exact_hits', exact_hits, "
            "'near_dups', near_dups, "
            "'survivors', survivors"
            ") AS (metric, value)"
        )


@dataclass
class ClusterDelta:
    """One batch's change to the persistent cluster map (`cluster_batch`).

    assignments: (doc_id, cluster) for EVERY fresh batch doc — survivors
    and near-dropped docs alike (a dropped near-dup still belongs to its
    representative's cluster, exactly like the batch pipeline's annotate
    sink).  remap: the full REPLACEMENT root-remap table (old_cluster ->
    new_cluster), already composed with the index's current remap — merges
    caused by this batch relabel existing clusters lazily at read time
    (merge-on-read) instead of rewriting the corpus-sized cluster table.
    batch_pairs: the verified within-batch near pairs (lineage — these
    edges exist in no other surface)."""

    assignments: DataFrame  # (doc_id, cluster) for every fresh batch doc
    remap: DataFrame        # full replacement (old_cluster, new_cluster)
    batch_pairs: DataFrame  # verified within-batch (src, dst, est_jaccard)
    persisted: list = field(default_factory=list)

    def release(self) -> None:
        for h in self.persisted:
            h.unpersist()


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
        batch_id: str = "initial", with_clusters: bool = False,
    ) -> "DedupIndex":
        """Bootstrap an index from the initial corpus: exact-collapse +
        signatures (the same two stages run_web_pipeline pays), written
        once.

        Crash-safety layout: every batch (this one included) lands in its
        OWN subdirectory under uniq/ and bands/, and readers list only the
        subdirectories the manifest records — the manifest write (atomic
        tmp+rename) IS the commit point.  A crash between the data writes
        and the manifest leaves orphan subdirectories no reader ever sees;
        a retry overwrites them and commits.

        ``with_clusters=True`` additionally bootstraps the persistent
        cluster map: the initial corpus is self-joined ONCE (the same
        candidate_pairs + verify + connected-components machinery the
        batch pipeline runs — this is the one time the index pays the
        O(C^2/buckets) cost; every later snapshot pays O(C*B/buckets) in
        `cluster_batch`) and (doc_id, cluster=min member doc_id) rows land
        beside the batch's uniq/bands, under the same manifest commit."""
        if os.path.exists(cls._manifest_path(root)):
            raise ValueError(f"index already exists at {root}; use load()")
        spark = pages.sparkSession
        os.makedirs(root, exist_ok=True)
        uniq = cls._uniq_of(pages, cfg)
        udir = cls._batch_dir(cls._uniq_dir(root), batch_id)
        uniq.write.mode("overwrite").parquet(udir)
        committed = spark.read.schema(cls._UNIQ_SCHEMA).parquet(udir)
        lsh.band_buckets(committed, cfg).write.mode("overwrite").parquet(
            cls._batch_dir(cls._bands_dir(root), batch_id)
        )
        if with_clusters:
            # self-join the WRITTEN tables (no recompute, no lazy
            # self-reference: the clusters write below reads only this
            # batch's uniq/bands dirs) — the band table was materialized
            # one statement up; re-deriving it would pay the 16x explode
            # + bucket hashing a second time over the whole corpus
            track: list = []
            try:
                pairs = lsh.verify_pairs(
                    lsh.candidate_pairs(
                        spark.read.schema(cls._BANDS_SCHEMA).parquet(
                            cls._batch_dir(cls._bands_dir(root), batch_id)
                        ),
                        cfg,
                        track=track,
                    ),
                    committed,
                    cfg,
                )
                comp = connected_components(pairs, track=track)
                (
                    committed.select("doc_id")
                    .join(
                        comp, committed["doc_id"] == comp["node"], "left"
                    )
                    .select(
                        "doc_id",
                        F.coalesce("component", "doc_id").alias("cluster"),
                    )
                    .write.mode("overwrite")
                    .parquet(cls._batch_dir(cls._clusters_dir(root), batch_id))
                )
            finally:
                for h in track:
                    h.unpersist()
        manifest = {
            "config_hash": cfg.config_hash(),
            "num_perm": cfg.num_perm,
            "scheme": cfg.minhash_scheme,
            # batches = LIVE storage subdirectories (compaction rewrites
            # this list); ingested = every snapshot id ever committed (the
            # replay-idempotence ledger — compaction never touches it)
            "batches": [batch_id],
            "ingested": [batch_id],
            "clusters": bool(with_clusters),
            # remap version 0 = empty: no merges recorded yet; remap_rows
            # is the live table's row count — the metadata fact "merges
            # pending" that compact()'s no-op check and clusters()' fast
            # path read (a version counter alone can't say it: appends
            # with zero merges don't bump it)
            "remap_v": 0,
            "remap_rows": 0,
            # same versioned-metadata pattern for row-level deletes
            "delete_v": 0,
            "delete_rows": 0,
            "created_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        cls._write_manifest(root, manifest)
        return cls(root, cfg, manifest)

    _UNIQ_SCHEMA = "text_hash long, doc_id long, minhash array<int>"
    _BANDS_SCHEMA = "doc_id long, band int, bucket long"
    _CLUSTERS_SCHEMA = "doc_id long, cluster long"
    _REMAP_SCHEMA = "old_cluster long, new_cluster long"

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
        # pre-cluster-tier manifests
        manifest.setdefault("clusters", False)
        manifest.setdefault("remap_v", 0)
        manifest.setdefault("remap_rows", 0)
        manifest.setdefault("delete_v", 0)
        manifest.setdefault("delete_rows", 0)
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
            fresh=fresh,
            fresh_buckets=bbuckets,
            demoted=demoted_cross_buckets(
                ibuckets,
                bucket_cap=self.cfg.bucket_cap,
                batch_buckets=bbuckets,
                broadcast_batch=broadcast_batch,
            ),
            persisted=persisted,
        )

    # ---- incremental clustering ------------------------------------------

    def cluster_batch(
        self, res: IncrementalResult, broadcast_batch: bool = True
    ) -> ClusterDelta:
        """Maintain the persistent cluster map across a snapshot: assign a
        cluster id to every fresh batch doc and record the merges the batch
        induced — WITHOUT re-clustering the corpus.

        Call between `dedup_batch` and `append` (it reads the result's
        persisted intermediates; release after, not before), then pass the
        delta to ``append(clusters=...)`` so the map commits atomically
        with the batch.

        Graph shape: the batch contributes BATCH-BOUNDED edges only —
        (src, dst) within-batch verified near pairs (the one edge family
        `dedup_batch` does not compute: two fresh docs that are near-dups
        of each other) plus (src, current cluster of dst) for every
        cross near pair.  Connected components over that small graph give
        each fresh doc its cluster = min(node) — and because existing
        cluster ids ARE min member doc_ids, the invariant "cluster id =
        min member doc id ever seen" is maintained exactly: a batch that
        bridges two existing clusters emits a remap row for the larger
        root, applied lazily at read time (`clusters`), never by rewriting
        the corpus-sized map.

        Plan contract (same as `dedup_batch`): the cluster map is SCANNED
        once, probed map-side against the broadcast touched-doc set; every
        exchange carries batch-bounded data.

        Known, documented divergence from a full re-cluster: a near-dup
        batch doc is recorded in the map but NOT ingested into the index
        (`append` takes survivors), so a LATER snapshot's doc that is
        near-similar only to the dropped doc — not to its surviving
        representative — will not link to the cluster.  Chains through
        dropped docs are the price of not indexing duplicates; within one
        snapshot there is no divergence (pinned by tests)."""
        if not self.manifest.get("clusters"):
            raise ValueError(
                "index has no cluster map: build(with_clusters=True)"
            )
        spark = res.batch_uniq.sparkSession
        persisted: list = []

        fresh_sigs = res.fresh.select("doc_id", "minhash")
        # the fresh band table was already derived in dedup_batch's cross
        # tier — reuse the plan instead of paying the explode twice
        bb = (
            res.fresh_buckets
            if res.fresh_buckets is not None
            else lsh.band_buckets(fresh_sigs, self.cfg)
        )
        internal = lsh.verify_pairs(
            lsh.candidate_pairs(bb, self.cfg, track=persisted),
            fresh_sigs,
            self.cfg,
        )

        touched = res.near_pairs.select(
            F.col("dst").alias("doc_id")
        ).distinct()
        dstc = self.clusters_of(
            spark, touched, broadcast_batch=broadcast_batch, track=persisted
        ).select(
            F.col("doc_id").alias("dst"), F.col("cluster").alias("cur")
        )

        edges = (
            res.near_pairs.join(dstc, "dst")
            .select("src", F.col("cur").alias("dst"))
            .unionByName(internal.select("src", "dst"))
        )
        comp = connected_components(edges, track=persisted)

        assignments = (
            res.fresh.select("doc_id")
            .join(comp, res.fresh["doc_id"] == comp["node"], "left")
            .select(
                "doc_id",
                F.coalesce("component", "doc_id").alias("cluster"),
            )
        )
        # merges: a touched root whose component got a smaller id
        new_remap = (
            dstc.select(F.col("cur").alias("node")).distinct()
            .join(comp, "node")
            .filter(F.col("component") != F.col("node"))
            .select(
                F.col("node").alias("old_cluster"),
                F.col("component").alias("new_cluster"),
            )
        )
        # the composition below references new_remap TWICE (the retarget
        # join and the union): persist the merges-sized table so its
        # cluster-map-probe + CC-consume chain (several broadcast jobs)
        # evaluates once per action, not once per reference
        from pyspark import StorageLevel

        new_remap = new_remap.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(new_remap)
        # compose with the current remap so the stored table stays fully
        # root-resolved (one broadcast join resolves any doc at read time,
        # no chains): old entries whose target just merged follow it.
        # remap_rows == 0 (fresh or freshly-compacted index, the common
        # case at snapshot 1) skips the compose outright — joining and
        # unioning against a provably-empty table only adds exchanges.
        if not self.manifest.get("remap_rows"):
            remap = new_remap
        else:
            old = self.remap(spark)
            remap = (
                old.alias("o")
                .join(
                    new_remap.alias("n"),
                    F.col("o.new_cluster") == F.col("n.old_cluster"),
                    "left",
                )
                .select(
                    F.col("o.old_cluster").alias("old_cluster"),
                    F.coalesce(
                        F.col("n.new_cluster"), F.col("o.new_cluster")
                    ).alias("new_cluster"),
                )
                .unionByName(new_remap)
            )
        return ClusterDelta(
            assignments=assignments,
            remap=remap,
            batch_pairs=internal,
            persisted=persisted,
        )

    def clusters_of(
        self,
        spark: SparkSession,
        docs: DataFrame,
        *,
        broadcast_batch: bool = True,
        track: list | None = None,
    ) -> DataFrame:
        """Point lookup: the current cluster of each ``docs.doc_id``
        (own id when the doc predates the cluster tier or was never seen).

        Plan contract: ONE map-side probe of the resolved cluster-map scan
        against the broadcast lookup set — the corpus-sized map never
        enters an exchange.  With ``track`` the (lookup-bounded) hit set is
        persisted — it feeds two branches (hits + own-id defaults) and
        would otherwise scan the map twice — and the handle appended for
        the caller to release."""
        if not self.manifest.get("clusters"):
            raise ValueError(
                "index has no cluster map: build(with_clusters=True)"
            )
        keys = docs.select("doc_id").distinct()
        bkeys = F.broadcast(keys) if broadcast_batch else keys
        present = self.clusters(spark).join(bkeys, "doc_id", "semi")
        if track is not None:
            from pyspark import StorageLevel

            present = present.persist(StorageLevel.MEMORY_AND_DISK)
            track.append(present)
        hit_ids = present.select("doc_id")
        missing = keys.join(
            F.broadcast(hit_ids) if broadcast_batch else hit_ids,
            "doc_id",
            "anti",
        ).withColumn("cluster", F.col("doc_id"))
        return present.unionByName(missing)

    def annotate_batch(
        self,
        pages: DataFrame,
        res: IncrementalResult,
        delta: ClusterDelta,
        broadcast_batch: bool = True,
    ) -> DataFrame:
        """Every batch page annotated with its persistent cluster id —
        the incremental analog of the batch pipeline's annotate sink
        (same columns: url, warc_ts, html, text, lang, doc_id, usable,
        cluster_id; 0 = unusable, webdedup.py convention).

        Mapping: an exact-hit page follows its text group to the index's
        first-seen doc and THAT doc's current cluster (one column-pruned
        uniq scan probed against the broadcast hit-key set + a
        clusters_of probe — the index is scanned, never shuffled); a
        fresh page follows its batch text group to the delta's
        assignment.  The wide page payload joins exactly once, at the
        end, against the batch-bounded (text_hash, cluster) map."""
        if not self.manifest.get("clusters"):
            raise ValueError(
                "index has no cluster map: build(with_clusters=True)"
            )
        spark = pages.sparkSession
        min_len = max(self.cfg.shingle_k, 1)
        url = F.col("url")
        if self.cfg.canonicalize_urls:
            from humid_spark.functions.urls import canonical_url

            url = canonical_url(url)
        from humid_spark.functions import keys

        docs = pages.withColumn("doc_id", keys.doc_id_expr(url)).withColumn(
            "usable",
            F.col("text").isNotNull() & (F.length("text") >= min_len),
        ).withColumn(
            "text_hash",
            F.when(F.col("usable"), F.xxhash64(F.col("text"))),
        )

        hit_keys = res.exact_hits.select("text_hash")
        bhits = F.broadcast(hit_keys) if broadcast_batch else hit_keys
        ihit = self.uniq(spark).select("text_hash", "doc_id").join(
            bhits, "text_hash", "semi"
        )
        def _b(df):
            return F.broadcast(df) if broadcast_batch else df

        exact_map = ihit.join(
            _b(self.clusters_of(
                spark, ihit, broadcast_batch=broadcast_batch
            )),
            "doc_id",
        ).select("text_hash", F.col("cluster").alias("cluster_id"))
        # keyed off res.fresh, NOT batch_uniq: when one url carries both
        # an indexed text and a new text in the same snapshot, both
        # groups share the doc_id — joining batch_uniq on doc_id would
        # hand the exact-hit group the fresh group's cluster too and fan
        # the final text_hash join out to duplicate conflicting rows
        # (.distinct(): one url carrying two NEW texts duplicates its
        # doc_id in the assignments — same cluster, so dedupe is safe)
        fresh_map = res.fresh.select("text_hash", "doc_id").join(
            _b(delta.assignments), "doc_id"
        ).select("text_hash", F.col("cluster").alias("cluster_id")).distinct()
        # broadcast the batch-bounded map into the final join: the wide
        # page payload (text/html) never enters an exchange at all
        tmap = _b(exact_map.unionByName(fresh_map))
        return (
            docs.join(tmap, "text_hash", "left")
            .withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.lit(0))
            )
            .select("url", "warc_ts", "html", "text", "lang", "doc_id",
                    "usable", "cluster_id")
        )

    def clusters(self, spark: SparkSession) -> DataFrame:
        """The resolved cluster map: (doc_id, cluster) for every fresh doc
        ever committed.  Merge-on-read: ONE broadcast left join applies the
        (tiny, root-resolved) remap table over the cluster scan — the map
        itself is append-only until `compact` folds the remaps in."""
        if not self.manifest.get("clusters"):
            raise ValueError(
                "index has no cluster map: build(with_clusters=True)"
            )
        base = spark.read.schema(self._CLUSTERS_SCHEMA).parquet(
            *self._committed(self._clusters_dir(self.root))
        )
        if self.manifest.get("delete_rows"):
            base = base.join(
                F.broadcast(
                    self._tombstones(spark).select("doc_id").distinct()
                ),
                "doc_id",
                "anti",
            )
        if not self.manifest.get("remap_rows"):
            return base
        rm = self.remap(spark)
        return base.join(
            F.broadcast(rm),
            base["cluster"] == rm["old_cluster"],
            "left",
        ).select(
            "doc_id",
            F.coalesce("new_cluster", "cluster").alias("cluster"),
        )

    def remap(self, spark: SparkSession) -> DataFrame:
        """The current root-remap table (old_cluster -> new_cluster),
        fully resolved — version `remap_v`, empty at version 0.  Its size
        is the number of cluster merges since the last compaction: it must
        stay broadcastable, and `compact` resets it to empty."""
        v = self.manifest.get("remap_v", 0)
        path = os.path.join(self._remaps_dir(self.root), f"v-{v}")
        if self.manifest.get("remap_rows") and not os.path.isdir(path):
            # reading a missing live table as empty would silently
            # un-merge every recorded relabel — storage/manifest mismatch
            # is corruption, not emptiness
            raise ValueError(
                f"index corrupt: manifest records "
                f"{self.manifest['remap_rows']} remap rows but {path} "
                "is missing"
            )
        if v and os.path.isdir(path):
            return spark.read.schema(self._REMAP_SCHEMA).parquet(path)
        return spark.createDataFrame([], self._REMAP_SCHEMA)

    def append(
        self,
        survivors: DataFrame,
        batch_id: str,
        clusters: ClusterDelta | None = None,
    ) -> None:
        """Ingest a batch's surviving uniques into the batch's OWN
        subdirectories (mode overwrite — a retry after a crash rewrites
        the same orphan, never doubles data), then commit by recording the
        batch id in the manifest (atomic rename).  Readers list only
        committed subdirectories, so a half-appended batch is invisible
        until the commit lands — the crash-mid-append replay hazard
        (uniq written, bands not, manifest not: every replayed batch row
        would look like an exact hit) cannot occur.  Duplicate batch ids
        raise — re-ingesting a committed snapshot would double the index.

        With a cluster map, pass the batch's ``ClusterDelta`` — the
        assignments, the new remap version, and the batch share the ONE
        manifest commit, so the map can never drift from the data."""
        if batch_id in self.manifest["ingested"]:
            raise ValueError(f"batch {batch_id!r} already ingested")
        if self.manifest.get("clusters") and clusters is None:
            raise ValueError(
                "index maintains a cluster map: pass clusters="
                "cluster_batch(result) or rebuild without clusters"
            )
        if clusters is not None and not self.manifest.get("clusters"):
            raise ValueError(
                "index has no cluster map: build(with_clusters=True)"
            )
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
        remap_v = self.manifest.get("remap_v", 0)
        handles = [CheckpointHandle(rows)]
        try:
            rows.write.mode("overwrite").parquet(
                self._batch_dir(self._uniq_dir(self.root), batch_id)
            )
            lsh.band_buckets(rows, self.cfg).write.mode(
                "overwrite"
            ).parquet(
                self._batch_dir(self._bands_dir(self.root), batch_id)
            )
            n_remap = self.manifest.get("remap_rows", 0)
            if clusters is not None:
                # same lazy-self-reference discipline: the delta's plans
                # READ the committed cluster map and remap version — the
                # new subdirectory and v-(n+1) are invisible to them, and
                # the checkpoint pins the rows anyway
                arows = clusters.assignments.localCheckpoint(eager=True)
                handles.append(CheckpointHandle(arows))
                rrows = clusters.remap.localCheckpoint(eager=True)
                handles.append(CheckpointHandle(rrows))
                arows.write.mode("overwrite").parquet(
                    self._batch_dir(self._clusters_dir(self.root), batch_id)
                )
                # composition only ever ADDS rows (new merges map current
                # roots, which never appear as old keys), so an unchanged
                # count means an unchanged table: a merge-free batch
                # writes no remap version — the empty-remap fast path in
                # clusters() and compact()'s no-op check stay meaningful
                n_new = rrows.count()
                if n_new != n_remap:
                    rrows.write.mode("overwrite").parquet(
                        os.path.join(
                            self._remaps_dir(self.root), f"v-{remap_v + 1}"
                        )
                    )
                n_remap = n_new
        finally:
            for h in handles:
                h.unpersist()
        self.manifest["batches"].append(batch_id)
        self.manifest["ingested"].append(batch_id)
        if clusters is not None and n_remap != self.manifest.get(
            "remap_rows", 0
        ):
            self.manifest["remap_v"] = remap_v + 1
            self.manifest["remap_rows"] = n_remap
        self._write_manifest(self.root, self.manifest)

    def has_batch(self, batch_id: str) -> bool:
        """True when the manifest already records `batch_id` — the
        idempotence probe streaming replays use to skip re-ingest
        (streaming/incremental.py).  Checked against the INGEST ledger,
        not the live storage list: a replayed snapshot must stay a no-op
        after its rows were folded into a compaction snapshot."""
        return batch_id in self.manifest["ingested"]

    # ---- row-level deletes (merge-on-read tombstones) ----------------------

    def delete(self, docs: DataFrame, broadcast_keys: bool = True) -> int:
        """Remove pages from the index without rewriting it — takedown /
        right-to-be-forgotten at corpus scale, the Iceberg equality-delete
        discipline (file-based).

        ``docs`` names what to remove, by IDENTITY and/or by CONTENT:
        a ``doc_id`` or ``url`` column (identity derives exactly as
        ingest derives it, canonicalization included) targets those docs;
        a ``text`` column additionally targets every uniq row holding
        that content — the right tool when the exact-collapse kept the
        content under a DIFFERENT url's doc_id (ingest keeps one
        representative per text, so an identity-only takedown of the
        non-representative url would silently miss the served copy).
        The matching uniq rows become (text_hash, doc_id) TOMBSTONES in
        ``deletes/v-N/`` — resolved by column-pruned index scans probed
        against the broadcast keys — alongside bare
        (text_hash=NULL, doc_id) rows for requested identities present in
        the cluster map, which never match a uniq row but DO scrub the
        map rows of docs that were dropped as near-dups (they have map
        rows and no uniq rows).  Composed with the existing
        tombstones, committed by the atomic manifest rename.  Returns the
        number of newly recorded tombstones.

        Read semantics: `uniq` anti-joins the broadcast tombstone table,
        so the exact tier no longer matches the content (a re-crawl of it
        re-enters as fresh) and the verify join no longer returns the doc.
        The BAND table is left permissive on purpose: band rows are
        candidate hints, and a candidate whose signature row is gone dies
        at the verify inner join — correctness lives at `uniq`, so the
        read path stays one broadcast anti-join instead of three.  The
        cluster map drops the doc's rows (by doc_id — with shared-url
        identity a delete removes every text the url carried, the same
        identity rule ingest uses).  `compact()` folds tombstones
        physically (the rewrite reads the filtered views) and resets the
        table; a byte-identical re-ingest is suppressed by the live
        tombstone until that fold, and is new content after it.

        Like the remap table, the tombstone table must stay broadcastable
        — it is bounded by deletions since the last compact, and compact
        resets it.  ``broadcast_keys=False`` degrades the key probe to a
        shuffle semi-join for a takedown list too large to broadcast its
        distinct ids (same switch contract as dedup_batch)."""
        spark = docs.sparkSession

        def _b(df):
            return F.broadcast(df) if broadcast_keys else df

        uniq = self.uniq(spark).select("text_hash", "doc_id")
        parts = []
        keys = None
        if "doc_id" in docs.columns:
            keys = docs.select("doc_id").distinct()
        elif "url" in docs.columns:
            url = F.col("url")
            if self.cfg.canonicalize_urls:
                from humid_spark.functions.urls import canonical_url

                url = canonical_url(url)
            from humid_spark.functions import keys as keyfns

            keys = docs.select(
                keyfns.doc_id_expr(url).alias("doc_id")
            ).distinct()
        if keys is not None:
            parts.append(uniq.join(_b(keys), "doc_id", "semi"))
            if self.manifest.get("clusters"):
                # scrub map rows of docs that were DROPPED as near-dups:
                # they have cluster rows but no uniq row, so the identity
                # probe above cannot reach them; restricted to ids the
                # map actually holds, so garbage requests record nothing
                parts.append(
                    self.clusters(spark)
                    .select("doc_id")
                    .join(_b(keys), "doc_id", "semi")
                    .distinct()
                    .select(
                        F.lit(None).cast("long").alias("text_hash"),
                        "doc_id",
                    )
                )
        if "text" in docs.columns:
            tkeys = (
                docs.filter(F.col("text").isNotNull())
                .select(F.xxhash64("text").alias("text_hash"))
                .distinct()
            )
            parts.append(uniq.join(_b(tkeys), "text_hash", "semi"))
        if not parts:
            raise ValueError(
                "delete needs a doc_id, url, or text column to target"
            )
        from humid_spark.operators.cc import CheckpointHandle

        hit = parts[0]
        for p in parts[1:]:
            hit = hit.unionByName(p)
        merged = (
            hit.unionByName(self._tombstones(spark))
            .distinct()
            .localCheckpoint(eager=True)
        )
        handle = CheckpointHandle(merged)
        try:
            n_old = self.manifest.get("delete_rows", 0)
            n_new = merged.count()
            if n_new != n_old:
                v = self.manifest.get("delete_v", 0) + 1
                merged.write.mode("overwrite").parquet(
                    os.path.join(self._deletes_dir(self.root), f"v-{v}")
                )
                self.manifest["delete_v"] = v
                self.manifest["delete_rows"] = n_new
                self._write_manifest(self.root, self.manifest)
            return n_new - n_old
        finally:
            handle.unpersist()

    _DELETES_SCHEMA = "text_hash long, doc_id long"

    def _tombstones(self, spark: SparkSession) -> DataFrame:
        v = self.manifest.get("delete_v", 0)
        path = os.path.join(self._deletes_dir(self.root), f"v-{v}")
        if self.manifest.get("delete_rows") and not os.path.isdir(path):
            # a missing live tombstone table read as empty would silently
            # RESURRECT every taken-down row (and corrupt the next
            # delete()'s composition) — raise, never guess
            raise ValueError(
                f"index corrupt: manifest records "
                f"{self.manifest['delete_rows']} tombstones but {path} "
                "is missing"
            )
        if v and os.path.isdir(path):
            return spark.read.schema(self._DELETES_SCHEMA).parquet(path)
        return spark.createDataFrame([], self._DELETES_SCHEMA)

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
        if (
            len(self.manifest["batches"]) <= 1
            and not self.manifest.get("remap_rows")
            and not self.manifest.get("delete_rows")
        ):
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
        if partitions:
            uniq = uniq.repartition(partitions, "text_hash")
        udir = self._batch_dir(self._uniq_dir(self.root), cid)
        uniq.write.mode("overwrite").parquet(udir)
        if self.manifest.get("delete_rows"):
            # the band table is tombstone-PERMISSIVE at read time, so the
            # fold must re-derive it from the filtered uniq (reading the
            # just-written snapshot — not yet in any reader's path) or
            # deleted docs' band rows would survive every compaction,
            # eating bucket_cap slots forever.  Re-paying the explode is
            # the honest cost of a physical fold.
            bands = lsh.band_buckets(
                spark.read.schema(self._UNIQ_SCHEMA).parquet(udir), self.cfg
            )
        else:
            bands = self.bands(spark)
        if partitions:
            bands = bands.repartition(partitions, "band", "bucket")
        bands.write.mode("overwrite").parquet(
            self._batch_dir(self._bands_dir(self.root), cid)
        )
        if self.manifest.get("clusters"):
            # fold the remaps in: the rewritten map is fully resolved, so
            # the remap table resets to empty (version bump orphans the
            # old directory; no new one is written)
            clusters = self.clusters(spark)
            if partitions:
                clusters = clusters.repartition(partitions, "doc_id")
            clusters.write.mode("overwrite").parquet(
                self._batch_dir(self._clusters_dir(self.root), cid)
            )
            if self.manifest.get("remap_rows"):
                self.manifest["remap_v"] = self.manifest.get("remap_v", 0) + 1
                self.manifest["remap_rows"] = 0
        if self.manifest.get("delete_rows"):
            # the rewrites above read the tombstone-filtered views, so the
            # deletions are now physical — version bump orphans the table
            self.manifest["delete_v"] = self.manifest.get("delete_v", 0) + 1
            self.manifest["delete_rows"] = 0
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
        for base in (
            self._uniq_dir(self.root),
            self._bands_dir(self.root),
            self._clusters_dir(self.root),
        ):
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
        for vbase, vkey in (
            (self._remaps_dir(self.root), "remap_v"),
            (self._deletes_dir(self.root), "delete_v"),
        ):
            if not os.path.isdir(vbase):
                continue
            live = f"v-{self.manifest.get(vkey, 0)}"
            for d in sorted(os.listdir(vbase)):
                path = os.path.join(vbase, d)
                if d.startswith("v-") and d != live and os.path.isdir(path):
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
        base = spark.read.schema(self._UNIQ_SCHEMA).parquet(
            *self._committed(self._uniq_dir(self.root))
        )
        if not self.manifest.get("delete_rows"):
            return base
        # merge-on-read tombstones: one broadcast anti-join over the scan
        return base.join(
            F.broadcast(self._tombstones(spark)),
            ["text_hash", "doc_id"],
            "anti",
        )

    def bands(self, spark: SparkSession) -> DataFrame:
        """The (doc_id, band, bucket) secondary index; derived on the fly
        when the band table is absent (back-compat / manual deletion).
        Deliberately PERMISSIVE of tombstones (`delete`): band rows are
        candidate hints, and a candidate whose uniq row is gone dies at
        the verify inner join — compact() drops the rows physically."""
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
    def _clusters_dir(root: str) -> str:
        return os.path.join(root, "clusters")

    @staticmethod
    def _remaps_dir(root: str) -> str:
        return os.path.join(root, "remaps")

    @staticmethod
    def _deletes_dir(root: str) -> str:
        return os.path.join(root, "deletes")

    @staticmethod
    def _batch_dir(base: str, batch_id: str) -> str:
        """Filesystem-safe, INJECTIVE batch directory.  Sanitizing alone
        is lossy ('a/b' and 'a_b' would share 'batch-a_b': the first
        batch's parquet silently overwritten, the shared path read twice
        by every committed-list scan) — so whenever sanitization changed
        the id, a hash of the RAW id is appended, keeping distinct ids on
        distinct directories with no manifest bookkeeping."""
        import hashlib
        import re

        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", batch_id)
        if safe != batch_id:
            digest = hashlib.md5(batch_id.encode()).hexdigest()[:8]
            safe = f"{safe}-{digest}"
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
        from humid_spark.functions import keys

        usable = (
            pages.withColumn("doc_id", keys.doc_id_expr(url))
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
