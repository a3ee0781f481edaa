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

Fixture geometry (overlapping blocks of per-block RANDOM words — the
engine MinHashes byte 5-shingles, so the blocks must be separated in
CHAR-shingle Jaccard, not word Jaccard; a shared "blk{t}w{i}" scaffold
puts adjacent docs at true shingle-J 0.478, within estimator noise of
the 0.5 threshold): corpus doc D_t = P_t + P_{t+1} measures
J(D_t, D_{t+1}) = 0.331 (no merges at build); bridge Z_t = P_t + P_{t+1}
+ P_{t+2} measures J(Z_t, D_t) = J(Z_t, D_{t+1}) = 0.666 (merges exactly
those two components) and J(Z_t, D_{t+2}) = 0.248 (no extra edges).
With 128 perms and threshold 0.5 every level splits with >= 4-sigma
margin (sigma ~= 0.042).
"""

from __future__ import annotations

import random

import pytest

from humid_spark.config import DedupConfig
from humid_spark.plans.incremental import DedupIndex
from tests.test_incremental_index import _pages

N_BATCHES = 100


def _block(t: int) -> str:
    # per-block RNG: blocks share no character scaffolding, so the
    # char-shingle Jaccard of two docs is set by their block overlap only
    rng = random.Random(0xB10C + t)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    return " ".join(
        "".join(rng.choice(alpha) for _ in range(8)) for _ in range(60)
    )


@pytest.mark.slow
def test_remap_stays_flat_over_100_merge_batches(spark, tmp_path):
    from pyspark.sql import functions as F

    from humid_spark.functions import keys as keyfns

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

    # Exact expected remap growth via a Python union-find replay over the
    # REAL hashed doc ids: a bridge merges the components of D_t and
    # D_{t+1}; the new root is min(root_a, root_b, bridge_id) ("cluster
    # id = min member doc id ever seen"), so the batch loses ONE old root
    # when an old root survives as the minimum and TWO when the bridge's
    # own hashed id is the smallest — one remap row per lost root.
    all_urls = [u for u, _ in corpus_rows] + [
        f"http://g/z{t}" for t in range(N_BATCHES)
    ]
    id_of = {
        r["url"]: r["id"]
        for r in spark.createDataFrame([(u,) for u in all_urls], "url string")
        .select("url", keyfns.doc_id_expr(F.col("url")).alias("id"))
        .collect()
    }
    comp = {id_of[u]: id_of[u] for u, _ in corpus_rows}  # doc -> root
    expected_lost = 0

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
        ra = comp[id_of[f"http://g/d{t}"]]
        rb = comp[id_of[f"http://g/d{t + 1}"]]
        z = id_of[f"http://g/z{t}"]
        new_root = min(ra, rb, z)
        expected_lost += len({ra, rb} - {new_root})
        for doc, r in comp.items():
            if r in (ra, rb):
                comp[doc] = new_root
        comp[z] = new_root
        # THE growth invariant: exactly one row per lost root, every batch
        assert idx.manifest.get("remap_rows", 0) == expected_lost, (
            t, idx.manifest.get("remap_rows"), expected_lost
        )
        if t % 20 == 19:
            rows = idx.remap(spark).collect()
            assert len(rows) == expected_lost
            old = {r["old_cluster"] for r in rows}
            new = {r["new_cluster"] for r in rows}
            assert len(old) == expected_lost  # no duplicated old keys
            assert not (old & new)    # fully root-resolved, no chains
            for r in rows:            # every row retargeted to the CURRENT
                assert r["new_cluster"] == comp[r["old_cluster"]]  # root

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
