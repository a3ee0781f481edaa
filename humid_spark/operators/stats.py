"""Histogram aggregates and scalar stats (A4-A9, K3).

Reference: runStatistics / clusterStats / writeStatistics
(src/humid.cc:301-357, src/cluster.cc:89-95) — driver-side std::map counters.
Here each histogram is a two-level groupBy (partial aggregation map-side,
tiny results), exactly the shape that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_histogram(uniq: DataFrame) -> DataFrame:
    """counts.dat: freq of exact-duplicate multiplicities (src/humid.cc:308)."""
    return (
        uniq.groupBy(F.col("count").alias("multiplicity"))
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def neighbour_histogram(uniq: DataFrame, pairs: DataFrame) -> DataFrame:
    """neigh.dat: freq of per-key neighbour-list length (src/humid.cc:309).
    Keys with zero neighbours are included (left join), matching the trie
    walk which visits every key."""
    sym = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("key")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return (
        uniq.select("key")
        .join(deg, "key", "left")
        .withColumn("degree", F.coalesce(F.col("degree"), F.lit(0)))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def cluster_histogram(clusters: DataFrame) -> DataFrame:
    """clusters.dat: freq of cluster sizes; size = sum of member counts
    (src/cluster.cc:10-13, :89-95)."""
    return (
        clusters.select("cluster_id", "cluster_size")
        .distinct()
        .groupBy(F.col("cluster_size").alias("size"))
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def scalar_stats(
    keyed_pages: DataFrame, uniq: DataFrame, clusters: DataFrame
) -> DataFrame:
    """stats.dat: total / usable / unique / clusters (src/humid.cc:351-356)."""
    tu = keyed_pages.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if(F.col("usable")).alias("usable"),
    )
    un = uniq.agg(F.count(F.lit(1)).alias("unique"))
    cl = clusters.select("cluster_id").distinct().agg(
        F.count(F.lit(1)).alias("clusters")
    )
    return tu.crossJoin(un).crossJoin(cl)


def representatives(keyed_pages: DataFrame, clustered_keys: DataFrame) -> DataFrame:
    """One row per cluster: the FIRST input-order row whose key is the
    cluster's max-count key (F2, src/humid.cc:224-231; 'visited' flag ==
    emit-once).  Input order is (warc_ts, url).

    Unusable rows never appear (the reference silently drops them from the
    dedup output, src/humid.cc:222)."""
    key_info = clustered_keys.select("key", "cluster_id", "max_key")
    hits = (
        keyed_pages.filter(F.col("usable"))
        .join(key_info, "key")
        .filter(F.col("key") == F.col("max_key"))
    )
    return (
        hits.groupBy("cluster_id")
        .agg(F.min(F.struct("warc_ts", "url")).alias("first"))
        .select("cluster_id", F.col("first.url").alias("url"),
                F.col("first.warc_ts").alias("warc_ts"))
    )
