"""64-bit doc_id collision semantics — pinned, not hidden.

doc_id = xxhash64(url) (functions/keys.doc_id_expr).  At 10^10 pages the
birthday bound expects ~3 silent collisions; this file FORCES one (the
helper is monkeypatched to hash two chosen urls to the same id) and pins
the exact blast radius so the accepted tolerance in the doc_id_expr
docstring and README is measured behavior, not hope:

- exact tier: unaffected — uniq keys on text_hash, both texts survive as
  distinct rows (doc_id is only the representative label);
- cluster map: the two unrelated docs become ONE graph node — their
  clusters silently merge (the real casualty);
- identity takedown: OVER-deletes — every text hanging under the shared
  id dies (fail-safe direction for a takedown: removes more than asked,
  never less), and unrelated ids are untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.functions import keys
from humid_spark.plans.incremental import DedupIndex
from tests.test_incremental_index import BASE, OTHER, _pages

CLEAN = (
    "standalone article describing mountain railways and their winding "
    "tunnels through alpine passes with historic steam locomotives"
)

U1 = "http://collide/first"
U2 = "http://collide/second"
SHARED_ID = 777


def _patch_collision(monkeypatch):
    real = keys.doc_id_expr.__wrapped__ if hasattr(
        keys.doc_id_expr, "__wrapped__"
    ) else keys.doc_id_expr

    def fake(url):
        return F.when(
            url.isin(U1, U2), F.lit(SHARED_ID).cast("long")
        ).otherwise(F.xxhash64(url))

    monkeypatch.setattr(keys, "doc_id_expr", fake)
    return real


def test_collision_blast_radius(monkeypatch, spark, tmp_path):
    _patch_collision(monkeypatch)
    idx = DedupIndex.build(
        _pages(
            spark,
            [(U1, BASE), (U2, OTHER), ("http://clean/3", CLEAN)],
        ),
        DedupConfig(),
        str(tmp_path / "cidx"),
        with_clusters=True,
    )

    # exact tier: two distinct texts under ONE id stay two uniq rows
    uniq = idx.uniq(spark).collect()
    assert len(uniq) == 3
    assert sum(1 for r in uniq if r["doc_id"] == SHARED_ID) == 2

    # cluster map: one node per doc_id -> the two unrelated docs share a
    # membership row (silent merge — the documented casualty)
    clusters = {r["doc_id"]: r["cluster"] for r in idx.clusters(spark).collect()}
    assert clusters[SHARED_ID] == SHARED_ID
    assert len(clusters) == 2  # SHARED_ID + the clean doc

    # identity takedown of U1 OVER-deletes: both texts under the shared
    # id die (more than asked, never less); the clean doc survives
    n = idx.delete(spark.createDataFrame([(U1,)], "url string"))
    assert n >= 2
    left = idx.uniq(spark).collect()
    assert [r["doc_id"] for r in left] != []  # clean doc survives
    assert all(r["doc_id"] != SHARED_ID for r in left)
    assert len(left) == 1


def test_no_collision_no_cross_talk(monkeypatch, spark, tmp_path):
    """Control: same corpus WITHOUT the forced collision — distinct ids,
    distinct clusters, identity delete removes exactly one doc."""
    idx = DedupIndex.build(
        _pages(
            spark,
            [(U1, BASE), (U2, OTHER), ("http://clean/3", CLEAN)],
        ),
        DedupConfig(),
        str(tmp_path / "ctrl"),
        with_clusters=True,
    )
    assert idx.uniq(spark).select("doc_id").distinct().count() == 3
    idx.delete(spark.createDataFrame([(U1,)], "url string"))
    assert idx.uniq(spark).count() == 2
