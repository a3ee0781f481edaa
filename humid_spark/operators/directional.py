"""Clustering (G1/G2/G3): distributed components + exact per-component replay.

The reference's clustering is a *sequential* greedy walk (src/humid.cc:167-193
+ src/cluster.cc).  Key structural fact making it parallelizable EXACTLY:
cluster assignment never crosses a connected component of the neighbour
graph — the climb and the flood both move along edges only.  The global walk
(sorted key order) interleaves components, but the assignment state of one
component never influences another, so replaying the greedy independently
per component, each in its own sorted-key order, produces IDENTICAL
membership, sizes, representatives and seeds.  Only the global id numbering
interleaves — and ids are 1,2,... in seed(=key) walk order, so they are
recovered exactly by ranking all cluster seeds globally (rank.py).

Physical plan:
  1. connected_components(edges)            — O(log n) shuffle rounds
  2. cogroup (nodes, edges) by component    — one shuffle each
  3. applyInPandas: humid_spark.oracle.cluster_greedy per component
     (the same code the tests use as ground truth; components are
     near-dup-cluster-sized, i.e. tiny — Arrow batches them efficiently)
  4. global seed rank -> cluster ids        — range-partitioned rank

Giant components (boilerplate explosions) exceed `max_component_nodes`:
replayed greedily they would serialize; instead they collapse to one
cluster (seed = min key, representative = max count, ties to the smaller
key) and are flagged in `oversized` for lineage.  This is the documented
deviation absorbed by the >=0.99 recall budget (SURVEY.md §4.3.6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from humid_spark.oracle import cluster_greedy
from humid_spark.operators.cc import assign_components
from humid_spark.operators.rank import with_global_rank

_REPLAY_SCHEMA = (
    "key string, count long, first_ts timestamp, first_url string, "
    "component string, cluster_seed string, cluster_size long, "
    "max_key string, max_count long, oversized boolean"
)


def _replay_factory(maximum: bool, max_nodes: int):
    def replay_one(
        nodes: pd.DataFrame, edges: pd.DataFrame | None
    ) -> pd.DataFrame:
        counts = dict(zip(nodes["key"], nodes["count"]))
        # Guard BOTH dimensions: a dense giant component's edge list can
        # exceed worker memory even when its node count is under the cap
        # (cogrouped Arrow batches materialize per group).
        n_edges = 0 if edges is None else len(edges)
        if len(counts) > max_nodes or n_edges > 4 * max_nodes:
            seed = min(counts)
            max_key = min(counts, key=lambda k: (-counts[k], k))
            size = int(sum(counts.values()))
            return nodes.assign(
                cluster_seed=seed,
                cluster_size=size,
                max_key=max_key,
                max_count=int(counts[max_key]),
                oversized=True,
            )
        adj: dict[str, list[str]] = {k: [] for k in counts}
        if edges is not None:
            for s, d in zip(edges["src"], edges["dst"]):
                adj[s].append(d)
                adj[d].append(s)
        cluster_of, clusters = cluster_greedy(counts, adj, maximum=maximum)
        ci = nodes["key"].map(cluster_of)
        return nodes.assign(
            cluster_seed=[clusters[i].seed_key for i in ci],
            cluster_size=[clusters[i].size for i in ci],
            max_key=[clusters[i].max_key for i in ci],
            max_count=[clusters[i].max_count for i in ci],
            oversized=False,
        )

    def replay_bucket(
        _key: tuple, nodes: pd.DataFrame, edges: pd.DataFrame
    ) -> pd.DataFrame:
        """One Arrow group = one hash-bucket of MANY components (batching
        kills the per-group overhead that dominates when components are
        numerous and tiny).  Components stay independent, so replaying them
        in any order inside the bucket is exact."""
        nodes = nodes.drop(columns=["rbucket"])
        edge_groups: dict = {}
        if len(edges):
            edge_groups = {
                comp: g for comp, g in edges.groupby("component", sort=False)
            }
        outs = [
            replay_one(nd, edge_groups.get(comp))
            for comp, nd in nodes.groupby("component", sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    return replay_bucket


def cluster_keys(
    uniq: DataFrame,
    pairs: DataFrame,
    maximum: bool = False,
    # same default as DedupConfig.max_component_nodes — callers bypassing
    # the config must not silently get a different giant-component cap
    max_component_nodes: int = 2_000_000,
) -> DataFrame:
    """uniq(key,count,first_ts,first_url) + once-per-pair edges(src,dst)
    -> one row per key:
      (key, count, first_ts, first_url, component, cluster_seed,
       cluster_size, max_key, max_count, oversized, cluster_id)
    cluster_id is 1-based in global seed-key order — identical to the
    reference's numbering (0 stays reserved for unusable rows)."""
    nodes = assign_components(uniq, pairs)
    comp_of = nodes.select(
        F.col("key").alias("src_key"),
        F.col("component").alias("src_component"),
    )
    edges_c = (
        pairs.join(comp_of, pairs["src"] == comp_of["src_key"])
        .select(F.col("src_component").alias("component"), "src", "dst")
    )
    replay = _replay_factory(maximum, max_component_nodes)
    n_buckets = 1024
    rb = lambda c: F.pmod(F.xxhash64(c), F.lit(n_buckets))  # noqa: E731
    clustered = (
        nodes.withColumn("rbucket", rb(F.col("component")))
        .groupBy("rbucket")
        .cogroup(
            edges_c.withColumn("rbucket", rb(F.col("component")))
            .groupBy("rbucket")
        )
        .applyInPandas(replay, _REPLAY_SCHEMA)
    )
    seeds = clustered.select("cluster_seed").distinct()
    seed_ids = with_global_rank(seeds, "cluster_seed", "cluster_id")
    return clustered.join(seed_ids, "cluster_seed")
