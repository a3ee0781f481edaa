"""Port of the reference unit tests onto the pure-Python oracle.

Sources: /root/reference/tests/test_cluster.cc (directional clustering) and
the greedy-walk semantics of src/cluster.cc.  The oracle is the ground truth
for the Spark E2E tests, so it must pin the reference exactly.
"""

from __future__ import annotations

from humid_spark.oracle import (
    build_edges,
    cluster_greedy,
    hamming,
    levenshtein,
    run_oracle,
)
from humid_spark.sources.pages import base_words, fx_cluster_chain_gap, mut


def test_at_least_double_boundaries():
    # tests/test_cluster.cc:17-21 -- the rule is a >= 2b
    assert 1 >= 2 * 0
    assert 2 >= 2 * 1
    assert not 3 >= 2 * 2


def test_lone_node():
    # tests/test_cluster.cc:23-28
    cluster_of, clusters = cluster_greedy({"A": 1}, {"A": []})
    assert clusters[0].id == 1
    assert clusters[0].size == 1
    assert clusters[0].max_key == "A"
    assert cluster_of == {"A": 0}


def test_chain_climb_stop():
    # tests/test_cluster.cc:45-71: 1 -> 2 -> 4 climbs; 7 < 2*4 stops the climb.
    counts = {"a": 1, "b": 2, "c": 4, "d": 7}
    adj = {"a": ["b"], "b": ["a", "c"], "c": ["b", "d"], "d": ["c"]}
    cluster_of, clusters = cluster_greedy(counts, adj)
    # seed 'a' climbs to 'c' (count 4), not 'd' (7 < 8)
    assert clusters[0].max_key == "c"
    assert clusters[0].max_count == 4
    # flood from c: absorbs b (4>=4) then a (2>=2); d unreached (4 < 14 no --
    # d unassigned because 4 >= 2*7 is false)
    assert cluster_of["a"] == 0 and cluster_of["b"] == 0 and cluster_of["c"] == 0
    # d seeds its own cluster on the later walk step
    assert cluster_of["d"] == 1
    assert clusters[1].max_key == "d"


def test_five_node_two_clusters():
    # tests/test_cluster.cc:73-137 -- counts 2,4,8,10,3 on a chain where the
    # 3-4 edge is absent: clusters {1,2,3} size 14 rep n3; {4,5} size 13 rep n4.
    counts = {"n1": 2, "n2": 4, "n3": 8, "n4": 10, "n5": 3}
    adj = {
        "n1": ["n2"],
        "n2": ["n1", "n3"],
        "n3": ["n2"],
        "n4": ["n5"],
        "n5": ["n4"],
    }
    cluster_of, clusters = cluster_greedy(counts, adj)
    c1 = clusters[cluster_of["n1"]]
    c2 = clusters[cluster_of["n4"]]
    assert c1 is not c2
    assert {k for k, i in cluster_of.items() if clusters[i] is c1} == {"n1", "n2", "n3"}
    assert {k for k, i in cluster_of.items() if clusters[i] is c2} == {"n4", "n5"}
    assert c1.size == 14 and c2.size == 13
    assert c1.max_key == "n3" and c1.max_count == 8
    assert c2.max_key == "n4" and c2.max_count == 10


def test_assigned_neighbour_blocks_climb():
    # tests/test_cluster.cc:30-43: an already-assigned neighbour is not used.
    # 'b' (count 20) is taken by cluster 1; then 'c' (count 1, adjacent only
    # to b) cannot climb to b and seeds its own cluster.
    counts = {"a": 10, "b": 20, "c": 1}
    adj = {"a": ["b"], "b": ["a", "c"], "c": ["b"]}
    cluster_of, clusters = cluster_greedy(counts, adj)
    # walk order a,b,c: a climbs to b (20>=20), flood from b takes a (20>=20)
    # but not c (20 >= 2 holds! so c IS absorbed downhill).
    assert cluster_of["c"] == cluster_of["b"]
    # Now pin the blocking case: make c too big to absorb but too small to climb
    counts2 = {"a": 10, "b": 20, "c": 15}
    cluster_of2, clusters2 = cluster_greedy(counts2, adj)
    assert cluster_of2["a"] == cluster_of2["b"]
    assert cluster_of2["c"] != cluster_of2["b"]  # b assigned -> c stays alone
    assert clusters2[cluster_of2["c"]].max_key == "c"


def test_max_clustering_is_connected_components():
    counts = {"a": 1, "b": 100, "c": 1, "d": 5}
    adj = {"a": ["b"], "b": ["a", "c"], "c": ["b"], "d": []}
    cluster_of, clusters = cluster_greedy(counts, adj, maximum=True)
    assert cluster_of["a"] == cluster_of["b"] == cluster_of["c"]
    assert cluster_of["d"] != cluster_of["a"]
    assert clusters[cluster_of["a"]].max_key == "b"
    assert clusters[cluster_of["a"]].size == 102


def test_distances():
    assert hamming("AAAA", "AATA") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("AAAA", "AAA") == 1


def test_build_edges_hamming_m1():
    w = base_words(1)[0]
    keys = [w, mut(w, 0), mut(mut(w, 0), 1)]
    adj = build_edges(keys, 1)
    assert set(adj[w]) == {mut(w, 0)}
    assert set(adj[mut(w, 0)]) == {w, mut(mut(w, 0), 1)}


def test_run_oracle_chain_gap_fixture():
    rows = [(r["url"], r["text"]) for r in fx_cluster_chain_gap()]
    res = run_oracle(rows)
    assert res.total == 27 and res.usable == 27 and res.unique == 5
    sizes = sorted(cl.size for cl in res.clusters)
    assert sizes == [13, 14]
    assert len(res.dedup_urls) == 2
    # representative rows are the first input-order rows of n3 and n4
    assert any("/n3/" in u for u in res.dedup_urls)
    assert any("/n4/" in u for u in res.dedup_urls)
    # histograms
    assert res.count_hist == {2: 1, 4: 1, 8: 1, 10: 1, 3: 1}
    assert res.cluster_hist == {14: 1, 13: 1}


def test_run_oracle_unusable_rows():
    rows = [
        ("u1", "ACGT" * 6),      # usable
        ("u2", "ACGT" * 3),      # short -> padded -> unusable in parity mode
        ("u3", ""),               # empty
        ("u4", None),             # null
    ]
    res = run_oracle(rows)
    assert res.total == 4 and res.usable == 1 and res.unique == 1
    annotated = dict(res.annotated)
    assert annotated["u1"] == 1
    assert annotated["u2"] == 0 and annotated["u3"] == 0 and annotated["u4"] == 0
    assert res.dedup_urls == ["u1"]
