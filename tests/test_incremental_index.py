"""DedupIndex lifecycle: build/load config guard, batch classification
(exact / near / fresh), append-then-requery convergence, duplicate-batch
guard, empty batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.plans.incremental import DedupIndex
from humid_spark.sources.pages import PAGES_SCHEMA


def _pages(spark, rows):
    # rows: (url, text)
    from datetime import datetime

    ts = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, ts, None, t, "en") for u, t in rows], PAGES_SCHEMA
    )


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest where nobody ever goes at night time"
)
OTHER = (
    "completely different content about databases indexes and storage "
    "engines with columnar layouts and vectorized execution pipelines"
)


@pytest.fixture()
def index(spark, tmp_path):
    cfg = DedupConfig()
    corpus = _pages(
        spark,
        [("http://a/1", BASE), ("http://a/2", OTHER),
         ("http://a/2b", OTHER)],  # exact dup inside the corpus
    )
    return DedupIndex.build(corpus, cfg, str(tmp_path / "idx"))


def test_build_collapses_exact_and_load_guards_config(index, spark):
    assert index.uniq(spark).count() == 2  # OTHER's copy collapsed
    with pytest.raises(ValueError, match="config mismatch"):
        DedupIndex.load(index.root, DedupConfig(shingle_k=7))
    again = DedupIndex.load(index.root, DedupConfig())
    assert again.manifest["batches"] == ["initial"]
    with pytest.raises(ValueError, match="already exists"):
        DedupIndex.build(_pages(spark, []), DedupConfig(), index.root)


def test_batch_classification_and_append_convergence(index, spark):
    near = BASE.replace("lazy dog", "sleepy dog")  # one-token edit
    fresh = (
        "entirely novel page discussing spark shuffle partitions and "
        "adaptive query execution with skew join splitting at runtime"
    )
    batch = _pages(
        spark,
        [("http://b/exact", BASE),     # exact tier
         ("http://b/near", near),      # near tier
         ("http://b/fresh", fresh)],   # survivor
    )
    res = index.dedup_batch(batch)

    assert res.exact_hits.count() == 1
    near_id = batch.filter(F.col("url") == "http://b/near").select(
        F.xxhash64("url")
    ).first()[0]
    assert {r["src"] for r in res.near_pairs.collect()} == {near_id}
    surv = res.survivors.collect()
    assert len(surv) == 1
    assert res.demoted.count() == 0

    index.append(res.survivors, "b")
    res.release()
    with pytest.raises(ValueError, match="already ingested"):
        index.append(res.survivors, "b")

    # the whole batch re-submitted: fresh is now an EXACT hit too
    res2 = index.dedup_batch(batch)
    assert res2.exact_hits.count() == 2
    assert res2.survivors.count() == 0
    res2.release()
    # manifest survives a reload
    assert DedupIndex.load(index.root, DedupConfig()).manifest[
        "batches"
    ] == ["initial", "b"]


def test_batch_plans_are_equi_join_shaped(index, spark):
    """The incremental tier must never degrade to a cross join: the exact
    tier is a hash anti-join, the near tier an equi-join on
    (band, bucket[, salt]) — same hygiene bar as the driver contract."""
    batch = _pages(spark, [("http://c/x", BASE + " tail"), ("http://c/y", OTHER)])
    res = index.dedup_batch(batch)
    for df in (res.survivors, res.near_pairs, res.exact_hits, res.demoted):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
    res.release()


def test_empty_batch_flows(index, spark):
    res = index.dedup_batch(_pages(spark, []))
    assert res.survivors.count() == 0
    assert res.near_pairs.count() == 0
    assert res.exact_hits.count() == 0
    res.release()
