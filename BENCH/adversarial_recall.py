#!/usr/bin/env python
"""Adversarial dup-pair-recall evidence at reference config (round-2
VERDICT item 4).

The >=0.99 dup-pair recall gate previously rested on clean planted
families.  This script generates tie-heavy / contested-node topologies —
the order-sensitive cases SURVEY.md §4.3.1 flags — at 100k+ keys, runs the
ENGINE clustering path (operators/directional.cluster_keys: distributed CC
+ exact per-component greedy replay; the oversized topology additionally
exercises the round-3 distributed label-propagation path), and measures
pair-recall against the sequential reference oracle
(humid_spark.oracle.cluster_greedy, reference src/cluster.cc:39-87).

Writes BENCH/adversarial_recall.json and the table consumed by
BENCH/BASELINE.md.  Pair recall = |same-cluster pairs agreed| /
|oracle same-cluster pairs|.
"""

from __future__ import annotations

import json
import os
import random
import sys
from collections import Counter

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def topo_contested_stars(n_families: int = 12_000, seed: int = 1):
    """Two maxima within 2x of shared spokes: for each family, maxima
    a (count 2c) and b (count in [c, 2c]) both dominate 3-8 shared spokes
    (count 1..c//2) — every spoke is a contested node whose assignment is
    order-sensitive in the sequential walk."""
    rng = random.Random(seed)
    counts, edges = {}, []
    for f in range(n_families):
        c = rng.randint(4, 40)
        a, b = f"f{f:05d}a", f"f{f:05d}b"
        counts[a] = 2 * c
        counts[b] = rng.randint(c, 2 * c)
        for s in range(rng.randint(3, 8)):
            sk = f"f{f:05d}s{s}"
            counts[sk] = rng.randint(1, max(1, c // 2))
            edges.append((a, sk))
            edges.append((b, sk))
    return counts, edges


def topo_tie_chains(n_chains: int = 15_000, seed: int = 2):
    """Chains with EXACT 2x boundary ratios (a >= 2b holds with equality
    at every hop) plus occasional off-by-one (2b-1: the rule just fails)
    — stresses the atLeastDouble boundary (src/cluster.cc:31-33)."""
    rng = random.Random(seed)
    counts, edges = {}, []
    for ch in range(n_chains):
        depth = rng.randint(3, 6)
        c = 1 << depth
        prev = f"c{ch:05d}n0"
        counts[prev] = c
        for i in range(1, depth + 1):
            nk = f"c{ch:05d}n{i}"
            exact = rng.random() < 0.7
            c = c // 2 if exact else max(1, c // 2 + 1)
            counts[nk] = c
            edges.append((prev, nk))
            prev = nk
    return counts, edges


def topo_equal_ties(n_groups: int = 20_000, seed: int = 3):
    """Cliques of EQUAL counts (nothing propagates: every node must become
    its own singleton cluster despite full connectivity)."""
    rng = random.Random(seed)
    counts, edges = {}, []
    for g in range(n_groups):
        c = rng.randint(1, 9)
        ks = [f"e{g:05d}x{i}" for i in range(rng.randint(2, 5))]
        for k in ks:
            counts[k] = c
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                edges.append((ks[i], ks[j]))
    return counts, edges


def topo_giant_oversized(n_hubs: int = 3_000, seed: int = 4):
    """ONE connected component with ~100k nodes (hub families linked by
    contested count-1 bridges) — exceeds the test cap, so it exercises the
    round-3 distributed label-propagation fallback, whose membership is an
    approximation (documented >=0.99 budget)."""
    rng = random.Random(seed)
    counts, edges = {}, []
    hubs = []
    for h in range(n_hubs):
        hk = f"h{h:05d}"
        hubs.append(hk)
        counts[hk] = rng.randint(64, 128)
        for s in range(rng.randint(20, 40)):
            sk = f"h{h:05d}s{s:02d}"
            counts[sk] = rng.randint(1, 8)
            edges.append((hk, sk))
    for h in range(n_hubs - 1):
        bk = f"h{h:05d}b"
        counts[bk] = 1
        edges.append((hubs[h], bk))
        edges.append((hubs[h + 1], bk))
    return counts, edges


TOPOLOGIES = {
    "contested_stars": (topo_contested_stars, None),
    "tie_chains": (topo_tie_chains, None),
    "equal_ties": (topo_equal_ties, None),
    "giant_oversized_lp": (topo_giant_oversized, 50_000),  # force LP
}


def pair_recall(oracle_of, got_of):
    o_sizes = Counter(oracle_of.values())
    both = Counter((oracle_of[k], got_of[k]) for k in oracle_of)
    o_pairs = sum(n * (n - 1) // 2 for n in o_sizes.values())
    hit = sum(n * (n - 1) // 2 for n in both.values())
    return (hit / o_pairs if o_pairs else 1.0), o_pairs


def main() -> None:
    from humid_spark.oracle import cluster_greedy
    from humid_spark.operators.directional import cluster_keys
    from humid_spark.session import get_spark

    spark = get_spark("adversarial-recall", cores=16)
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for name, (gen, cap) in TOPOLOGIES.items():
        counts, edges = gen()
        adj = {k: [] for k in counts}
        for a, b in edges:
            adj[a].append(b)
            adj[b].append(a)
        idx_of, clusters = cluster_greedy(counts, adj, maximum=False)
        oracle_of = {k: clusters[i].seed_key for k, i in idx_of.items()}

        uniq = spark.createDataFrame(
            [(k, c, None, k) for k, c in counts.items()],
            "key string, count long, first_ts timestamp, first_url string",
        )
        pairs = spark.createDataFrame(edges, "src string, dst string")
        kwargs = {"max_component_nodes": cap} if cap else {}
        out = cluster_keys(uniq, pairs, **kwargs).collect()
        got_of = {r["key"]: r["cluster_seed"] for r in out}
        assert set(got_of) == set(counts)
        recall, n_pairs = pair_recall(oracle_of, got_of)
        results[name] = {
            "keys": len(counts),
            "edges": len(edges),
            "oracle_pairs": n_pairs,
            "pair_recall": round(recall, 6),
            "path": "lp" if cap else "exact-replay",
        }
        print(f"[adversarial] {name}: {results[name]}", file=sys.stderr)

    worst = min(r["pair_recall"] for r in results.values())
    summary = {"topologies": results, "worst_recall": worst,
               "target": 0.99, "passes": worst >= 0.99}
    with open(os.path.join(HERE, "adversarial_recall.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
