"""Distributed directional label propagation for oversized components.

Round-2 VERDICT item 3: a component over `max_component_nodes` no longer
collapses to one cluster — it is clustered by DataFrame-native min-seed
label propagation (operators/directional.py).  The membership is an
order-free approximation of the reference's sequential greedy
(src/cluster.cc:39-87); this test plants a single giant connected
component (hub families linked by low-count bridge nodes, the boilerplate
topology the cap exists for), forces it through the LP path with a tiny
cap, and measures pair-recall vs oracle.cluster_greedy.
"""

from __future__ import annotations

import random

import pytest

from humid_spark.oracle import cluster_greedy
from humid_spark.operators.directional import (
    cluster_keys,
    directional_label_propagation,
)


def _giant_component(n_hubs: int = 40, seed: int = 7):
    """One connected component: hubs (count ~64-128) with 10-25 spokes
    each (count 1-8, some chained two hops deep), hubs linked pairwise
    through count-1 bridge nodes (contested between two hubs)."""
    rng = random.Random(seed)
    counts: dict[str, int] = {}
    edges: list[tuple[str, str]] = []
    hubs = []
    for h in range(n_hubs):
        hk = f"hub{h:03d}"
        hubs.append(hk)
        counts[hk] = rng.randint(64, 128)
        for s in range(rng.randint(10, 25)):
            sk = f"s{h:03d}x{s:02d}"
            counts[sk] = rng.randint(1, 8)
            edges.append((hk, sk))
            if rng.random() < 0.3:
                ck = f"c{h:03d}x{s:02d}"
                counts[ck] = max(1, counts[sk] // 2)
                edges.append((sk, ck))
    # bridges chain the hubs into ONE component; each bridge is a
    # contested node reachable downhill from both endpoints
    for h in range(n_hubs - 1):
        bk = f"b{h:03d}"
        counts[bk] = 1
        edges.append((hubs[h], bk))
        edges.append((hubs[h + 1], bk))
    return counts, edges


def _pair_recall(oracle_of: dict[str, str], got_of: dict[str, str]) -> float:
    from collections import Counter

    o_sizes = Counter(oracle_of.values())
    both = Counter((oracle_of[k], got_of[k]) for k in oracle_of)
    o_pairs = sum(n * (n - 1) // 2 for n in o_sizes.values())
    hit = sum(n * (n - 1) // 2 for n in both.values())
    return hit / o_pairs if o_pairs else 1.0


@pytest.fixture(scope="module")
def planted():
    counts, edges = _giant_component()
    adj: dict[str, list[str]] = {k: [] for k in counts}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    idx_of, clusters = cluster_greedy(counts, adj, maximum=False)
    oracle_of = {k: clusters[i].seed_key for k, i in idx_of.items()}
    return counts, edges, oracle_of, clusters


def test_lp_operator_membership(spark, planted):
    counts, edges, oracle_of, _ = planted
    nodes = spark.createDataFrame(
        [(k, c) for k, c in counts.items()], "key string, count long"
    )
    e = spark.createDataFrame(edges, "src string, dst string")
    labels = {
        r["key"]: r["label"]
        for r in directional_label_propagation(nodes, e).collect()
    }
    # total function: every key labeled exactly once
    assert set(labels) == set(counts)
    recall = _pair_recall(oracle_of, labels)
    assert recall >= 0.99, f"pair recall {recall}"


def test_lp_small_exact_cases(spark):
    """Chain and direct-contest cases where LP and the greedy agree
    exactly (derivations in operators/directional.py docstring)."""
    cases = [
        # downhill chain -> one cluster
        ({"a": 4, "b": 2, "c": 1}, [("a", "b"), ("b", "c")],
         {"a": "a", "b": "a", "c": "a"}),
        # equal counts never propagate -> singletons
        ({"a": 1, "b": 1}, [("a", "b")], {"a": "a", "b": "b"}),
        # direct contest goes to the min seed
        ({"a": 4, "b": 4, "c": 1}, [("a", "c"), ("b", "c")],
         {"a": "a", "b": "b", "c": "a"}),
    ]
    for counts, edges, want in cases:
        nodes = spark.createDataFrame(
            list(counts.items()), "key string, count long"
        )
        e = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["key"]: r["label"]
            for r in directional_label_propagation(nodes, e).collect()
        }
        assert got == want, (counts, got, want)


def test_cluster_keys_routes_oversized_through_lp(spark, planted):
    counts, edges, oracle_of, oracle_clusters = planted
    uniq = spark.createDataFrame(
        [(k, c, None, k) for k, c in counts.items()],
        "key string, count long, first_ts timestamp, first_url string",
    )
    pairs = spark.createDataFrame(edges, "src string, dst string")
    out = cluster_keys(uniq, pairs, max_component_nodes=100).collect()
    assert len(out) == len(counts)
    by_key = {r["key"]: r for r in out}
    # the planted component exceeds the cap -> every row went through LP
    assert all(r["oversized"] for r in out)
    got_of = {k: by_key[k]["cluster_seed"] for k in counts}
    recall = _pair_recall(oracle_of, got_of)
    assert recall >= 0.99, f"pair recall {recall}"
    # per-cluster invariants: seed is the min member, size sums counts,
    # ids are dense and unique per seed
    from collections import defaultdict

    members = defaultdict(list)
    for k, s in got_of.items():
        members[s].append(k)
    for s, ms in members.items():
        assert min(ms) == s
        assert by_key[ms[0]]["cluster_size"] == sum(counts[m] for m in ms)
        mx = min(ms, key=lambda m: (-counts[m], m))
        assert by_key[ms[0]]["max_key"] == mx
    ids = sorted({r["cluster_id"] for r in out})
    assert ids == list(range(1, len(members) + 1))


def test_cluster_keys_oversized_max_mode_exact(spark, planted):
    """Max-mode cluster == whole component, so the oversized path is a
    pure aggregation and must match the sequential greedy EXACTLY
    (membership, seed, size, representative) — no recall budget."""
    counts, edges, _, _ = planted
    adj: dict[str, list[str]] = {k: [] for k in counts}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    idx_of, clusters = cluster_greedy(counts, adj, maximum=True)
    uniq = spark.createDataFrame(
        [(k, c, None, k) for k, c in counts.items()],
        "key string, count long, first_ts timestamp, first_url string",
    )
    pairs = spark.createDataFrame(edges, "src string, dst string")
    out = cluster_keys(uniq, pairs, maximum=True,
                       max_component_nodes=100).collect()
    assert len(out) == len(counts)
    assert all(r["oversized"] for r in out)
    by_key = {r["key"]: r for r in out}
    for k, i in idx_of.items():
        cl = clusters[i]
        r = by_key[k]
        assert r["cluster_seed"] == cl.seed_key
        assert r["cluster_size"] == cl.size
        assert r["max_key"] == cl.max_key
        assert r["max_count"] == cl.max_count


def test_cluster_keys_small_components_still_exact(spark, planted):
    """With a huge cap the same graph takes the exact replay path and
    matches the oracle COMPLETELY (not just >=0.99)."""
    counts, edges, oracle_of, oracle_clusters = planted
    uniq = spark.createDataFrame(
        [(k, c, None, k) for k, c in counts.items()],
        "key string, count long, first_ts timestamp, first_url string",
    )
    pairs = spark.createDataFrame(edges, "src string, dst string")
    out = cluster_keys(uniq, pairs).collect()
    assert all(not r["oversized"] for r in out)
    got_of = {r["key"]: r["cluster_seed"] for r in out}
    want_of = {k: oracle_of[k] for k in counts}
    # exact replay: identical membership keyed by seed
    assert got_of == want_of

def test_replay_bucket_count_scales_with_deployment(spark, monkeypatch):
    """VERDICT r3 item 3: the replay cogroup bucket count derives from the
    deployment (shuffle partitions / env override), not a constant —
    bucket payloads stay bounded as the cluster is sized up."""
    from humid_spark.operators.directional import _n_replay_buckets

    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _n_replay_buckets(spark) == max(256, 32 * sp)
    monkeypatch.setenv("SPARK_GRAFT_REPLAY_BUCKETS", "7")
    assert _n_replay_buckets(spark) == 7


def test_replay_bucketing_invariance(spark, monkeypatch):
    """Cluster assignment is bucket-count-invariant: squeezing MANY
    components into few buckets (7) yields byte-identical clustering to
    the deployment-sized default."""
    from humid_spark.config import DedupConfig
    from humid_spark.plans.pipeline import run_pipeline
    from humid_spark.sources.pages import fx_webtext, to_spark

    cfg = DedupConfig(word_length=12)
    pages = to_spark(spark, fx_webtext(n_seeds=20))
    base = sorted(
        (r["url"], r["cluster_id"])
        for r in run_pipeline(pages, cfg).annotated.collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_REPLAY_BUCKETS", "7")
    squeezed = sorted(
        (r["url"], r["cluster_id"])
        for r in run_pipeline(pages, cfg).annotated.collect()
    )
    assert squeezed == base
