"""Merge-on-read table growth under an adversarial merge-heavy stream.

The cluster-map design note (plans/incremental.py) claims the remap table
"must stay broadcastable" because composition retargets old rows in place
and never chains them.  This file DRIVES that claim: 100 consecutive
micro-batches, every one of which bridges two existing clusters (the
worst case for remap growth — each batch loses a root), asserting after
every append that

  remap_rows == cumulative merges   (exactly one row per lost root,
                                     no chain blowup, no duplication)
  old_cluster set is disjoint from new_cluster set  (fully root-resolved
                                     — one broadcast join resolves any
                                     doc, never a chain walk)

and at the end that the incremental map equals a from-scratch rebuild
over the union corpus (the bridges only ever link INDEXED docs, so the
documented chains-through-dropped-docs divergence cannot trigger).

Fixture geometry (overlapping 30-unit blocks, proven in
test_incremental_clusters): corpus doc D_t = P_t + P_{t+1} gives
J(D_t, D_{t+1}) = 1/3 (no merges at build); bridge Z_t = P_t + P_{t+1} +
P_{t+2} gives J(Z_t, D_t) = J(Z_t, D_{t+1}) = 2/3 (merges exactly those
two components) and J(Z_t, D_{t+2}) = 1/4 (no extra edges).  With
32 bands x 4 rows and threshold 0.5 the levels split with ~4-sigma
margin on the 128-perm estimate.
"""

from __future__ import annotations

import pytest

from humid_spark.config import DedupConfig
from humid_spark.plans.incremental import DedupIndex
from tests.test_incremental_index import _pages

N_BATCHES = 100


def _block(t: int) -> str:
    return " ".join(f"blk{t}w{i} unit{t}x{i}" for i in range(30))


@pytest.mark.slow
def test_remap_stays_flat_over_100_merge_batches(spark, tmp_path):
    blocks = [_block(t) for t in range(N_BATCHES + 2)]
    corpus_rows = [
        (f"http://g/d{t}", blocks[t] + " " + blocks[t + 1])
        for t in range(N_BATCHES + 1)
    ]
    cfg = DedupConfig(lsh_bands=32, jaccard_threshold=0.5)
    idx = DedupIndex.build(
        _pages(spark, corpus_rows),
        cfg,
        str(tmp_path / "growth"),
        with_clusters=True,
    )
    assert idx.manifest["remap_rows" if "remap_rows" in idx.manifest else "remap_v"] == 0
    # 101 singleton clusters before any bridge
    assert idx.clusters(spark).select("cluster").distinct().count() == N_BATCHES + 1

    for t in range(N_BATCHES):
        bridge = _pages(
            spark,
            [(f"http://g/z{t}", blocks[t] + " " + blocks[t + 1] + " " + blocks[t + 2])],
        )
        res = idx.dedup_batch(bridge)
        delta = idx.cluster_batch(res)
        idx.append(res.survivors, f"b{t}", clusters=delta)
        res.release()
        delta.release()
        # THE growth invariant: one row per lost root, every batch
        assert idx.manifest.get("remap_rows", 0) == t + 1, (
            t, idx.manifest.get("remap_rows")
        )
        if t % 20 == 19:
            rows = idx.remap(spark).collect()
            assert len(rows) == t + 1
            old = {r["old_cluster"] for r in rows}
            new = {r["new_cluster"] for r in rows}
            assert len(old) == t + 1  # no duplicated old keys
            assert not (old & new)    # fully root-resolved, no chains

    # all 101 corpus docs + 100 dropped bridges in ONE cluster
    final = {
        r["doc_id"]: r["cluster"] for r in idx.clusters(spark).collect()
    }
    assert len(final) == 2 * N_BATCHES + 1
    assert len(set(final.values())) == 1
    assert set(final.values()) == {min(final)}  # root = min id ever seen

    # from-scratch rebuild over the union corpus agrees exactly
    full = DedupIndex.build(
        _pages(
            spark,
            corpus_rows
            + [
                (f"http://g/z{t}",
                 blocks[t] + " " + blocks[t + 1] + " " + blocks[t + 2])
                for t in range(N_BATCHES)
            ],
        ),
        cfg,
        str(tmp_path / "full"),
        with_clusters=True,
    )
    want = {
        r["doc_id"]: r["cluster"] for r in full.clusters(spark).collect()
    }
    assert final == want

    # compaction folds the 100 merges away and resets the table
    assert idx.compact(spark) is True
    assert idx.manifest.get("remap_rows", 0) == 0
    after = {
        r["doc_id"]: r["cluster"] for r in idx.clusters(spark).collect()
    }
    assert after == final
