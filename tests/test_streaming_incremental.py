"""Streaming ingestion over DedupIndex: micro-batch N+1 deduplicates
against everything micro-batch N brought in; replays skip re-ingest."""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.plans.incremental import DedupIndex
from humid_spark.sources.pages import PAGES_SCHEMA
from humid_spark.streaming.incremental import stream_ingest

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest where nobody ever goes at night time"
)
FRESH1 = (
    "a first entirely new page about spark structured streaming micro "
    "batches and the foreach batch sink with idempotent side effects"
)
FRESH2 = (
    "a second new page describing columnar parquet layouts and adaptive "
    "query execution with runtime skew join splitting in the optimizer"
)


def _pages(spark, rows):
    ts = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, ts, None, t, "en") for u, t in rows], PAGES_SCHEMA
    )


def _drain(stream_writer):
    q = stream_writer.trigger(availableNow=True).start()
    q.awaitTermination(180)
    time.sleep(0.5)


def test_stream_ingest_cross_batch_and_replay(spark, tmp_path):
    cfg = DedupConfig()
    idx = DedupIndex.build(
        _pages(spark, [("http://a/1", BASE)]), cfg, str(tmp_path / "idx")
    )

    # two source files -> two micro-batches (maxFilesPerTrigger=1);
    # file order pinned by write time
    src = str(tmp_path / "src")
    os.makedirs(src)
    _pages(
        spark,
        [("http://b/exact", BASE),      # exact hit vs the built index
         ("http://b/f1", FRESH1)],      # survivor of batch 0
    ).coalesce(1).write.parquet(f"{src}/f0")
    time.sleep(1.1)
    _pages(
        spark,
        [("http://c/near-f1",           # near dup of batch 0's survivor
          FRESH1 + " ok"),              # (high-Jaccard tail edit) — caught
                                        # ONLY if batch 0 was appended
         ("http://c/f2", FRESH2)],      # survivor of batch 1
    ).coalesce(1).write.parquet(f"{src}/f1")

    schema = _pages(spark, []).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream_ingest(stream, idx, out, ckpt))

    s0 = spark.read.parquet(f"{out}/batch_id=0/survivors")
    s1 = spark.read.parquet(f"{out}/batch_id=1/survivors")
    f1_hash = _pages(spark, [("x", FRESH1)]).select(
        F.xxhash64("text")
    ).first()[0]
    f2_hash = _pages(spark, [("x", FRESH2)]).select(
        F.xxhash64("text")
    ).first()[0]
    assert [r["text_hash"] for r in s0.collect()] == [f1_hash]
    assert [r["text_hash"] for r in s1.collect()] == [f2_hash]
    n1 = spark.read.parquet(f"{out}/batch_id=1/near_pairs")
    assert n1.count() == 1  # near-f1 matched batch 0's ingested survivor

    assert idx.manifest["batches"] == ["initial", "stream-0", "stream-1"]
    rows_after = idx.uniq(spark).count()
    assert rows_after == 3  # BASE + FRESH1 + FRESH2

    # replay: a FRESH checkpoint re-delivers batch ids 0 and 1; has_batch
    # skips both ingests, so the index is unchanged
    _drain(stream_ingest(stream, idx, out, str(tmp_path / "ckpt2")))
    assert idx.manifest["batches"] == ["initial", "stream-0", "stream-1"]
    assert idx.uniq(spark).count() == rows_after


def test_stream_ingest_maintains_cluster_map(spark, tmp_path):
    """With a clustered index, each micro-batch writes its (doc_id,
    cluster) assignments beside the survivors and the map delta commits
    with the append — batch 1's near-dup joins the cluster of batch 0's
    survivor, visible in the resolved map."""
    cfg = DedupConfig()
    idx = DedupIndex.build(
        _pages(spark, [("http://a/1", BASE)]), cfg, str(tmp_path / "idx"),
        with_clusters=True,
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    _pages(spark, [("http://b/f1", FRESH1)]).coalesce(1).write.parquet(
        f"{src}/f0"
    )
    time.sleep(1.1)
    _pages(
        spark, [("http://c/near-f1", FRESH1 + " ok")]
    ).coalesce(1).write.parquet(f"{src}/f1")

    schema = _pages(spark, []).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream_ingest(stream, idx, out, ckpt))

    def _id(url):
        return _pages(spark, [(url, "x")]).select(
            F.xxhash64("url")
        ).first()[0]

    f1, near = _id("http://b/f1"), _id("http://c/near-f1")
    c0 = spark.read.parquet(f"{out}/batch_id=0/clusters")
    assert {(r["doc_id"], r["cluster"]) for r in c0.collect()} == {(f1, f1)}
    c1 = spark.read.parquet(f"{out}/batch_id=1/clusters")
    assert {(r["doc_id"], r["cluster"]) for r in c1.collect()} == {
        (near, min(f1, near))
    }
    got = {
        r["doc_id"]: r["cluster"] for r in idx.clusters(spark).collect()
    }
    assert got[f1] == got[near] == min(f1, near)
    # the cross-micro-batch link is a root RELABEL (remap row) iff the
    # later doc id is the smaller one; merge-free batches write no
    # remap version at all
    relabeled = near < f1
    assert idx.manifest["remap_v"] == (1 if relabeled else 0)
    assert (idx.manifest["remap_rows"] > 0) == relabeled
