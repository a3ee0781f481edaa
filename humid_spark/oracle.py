"""Pure-Python replay of the reference algorithm (exact semantics).

Two consumers:
1. tests/ — ground truth for E2E fixtures (SURVEY.md §5, §7.2 M0).
2. operators/directional.py — the SAME `cluster_greedy` runs inside
   applyInPandas once per connected component.  Because cluster assignment
   never crosses a connected component, replaying the sequential greedy
   independently per component (in its sorted-key order) yields IDENTICAL
   membership and representatives to the reference's single global walk
   (reference src/humid.cc:167-193 walks keys in trie == sorted order;
   neighbours only ever link keys within one component).

Pinned semantics (file:line cite into /root/reference):
- walk order               = sorted key order        (src/humid.cc:178, trie DFS)
- adjacency order          = sorted neighbour order  (pairs appended in walk
                             order during the asymmetric trie search,
                             src/humid.cc:117-126 -> globally sorted lists)
- atLeastDouble rule       = a >= 2*b                (src/cluster.cc:31-33)
- climb (maxNeighbour_)    = follow FIRST unassigned neighbour with
                             count(nb) >= 2*count(cur); restart scan at the
                             new node; stop when none qualifies
                             (src/cluster.cc:39-51)
- directional assign       = updateMaxCount with the climb-top ONCE, then
                             preorder-DFS flood strictly downhill:
                             count(parent) >= 2*count(child), unassigned only
                             (src/cluster.cc:58-69, :82-87)
- max-mode assign          = preorder-DFS flood over all unassigned
                             neighbours; per-node updateMaxCount with strict >
                             so the first-encountered max wins
                             (src/cluster.cc:20-25, :72-80)
- cluster ids              = 1,2,... in seed (walk) order; 0 reserved for
                             unusable rows (src/humid.cc:177-187, :271-277)
"""

from __future__ import annotations

from dataclasses import dataclass, field


def hamming(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@dataclass
class Cluster:
    id: int
    seed_key: str
    size: int = 0
    max_key: str | None = None
    max_count: int = 0
    members: list[str] = field(default_factory=list)


def cluster_greedy(
    counts: dict[str, int],
    adj: dict[str, list[str]],
    maximum: bool = False,
) -> tuple[dict[str, int], list[Cluster]]:
    """Exact replay of findClusters (src/humid.cc:167-193).

    counts: unique key -> exact-duplicate multiplicity.
    adj:    key -> neighbour keys; will be processed in sorted order
            (HUMID's lists are in walk order == sorted order).
    Returns (key -> cluster index into `clusters`, clusters); cluster .id is
    1-based in seed order.
    """
    sorted_adj = {k: sorted(v) for k, v in adj.items()}
    cluster_of: dict[str, int] = {}
    clusters: list[Cluster] = []

    def assign(key: str, cl: Cluster) -> None:
        cluster_of[key] = len(clusters) - 1
        cl.size += counts[key]
        cl.members.append(key)

    def update_max(key: str, cl: Cluster) -> None:
        if counts[key] > cl.max_count:          # strict >: first max wins
            cl.max_key = key
            cl.max_count = counts[key]

    def max_neighbour(leaf: str) -> str:
        nbs = sorted_adj.get(leaf, ())
        i = 0
        while i < len(nbs):
            nb = nbs[i]
            i += 1
            if nb not in cluster_of and counts[nb] >= 2 * counts[leaf]:
                leaf = nb
                nbs = sorted_adj.get(leaf, ())
                i = 0
        return leaf

    def flood(start: str, cl: Cluster, directional: bool) -> None:
        # Iterative preorder DFS preserving the C++ recursion's exact
        # visit order and at-visit-time assignment checks.
        assign(start, cl)
        if not directional:
            update_max(start, cl)
        stack = [(start, iter(sorted_adj.get(start, ())))]
        while stack:
            node, it = stack[-1]
            for nb in it:
                if nb in cluster_of:
                    continue
                if directional and not counts[node] >= 2 * counts[nb]:
                    continue
                assign(nb, cl)
                if not directional:
                    update_max(nb, cl)
                stack.append((nb, iter(sorted_adj.get(nb, ()))))
                break
            else:
                stack.pop()

    for key in sorted(counts):
        if key in cluster_of:
            continue
        cl = Cluster(id=len(clusters) + 1, seed_key=key)
        clusters.append(cl)
        if maximum:
            flood(key, cl, directional=False)
        else:
            top = max_neighbour(key)
            update_max(top, cl)                  # once, with the climb-top
            flood(top, cl, directional=True)
    return cluster_of, clusters


def build_edges(
    keys: list[str], mismatches: int, use_edit: bool = False
) -> dict[str, list[str]]:
    """O(n^2) neighbour search (fixture-scale only)."""
    dist = levenshtein if use_edit else hamming
    adj: dict[str, list[str]] = {k: [] for k in keys}
    ks = sorted(keys)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            if dist(a, b) <= mismatches:
                adj[a].append(b)
                adj[b].append(a)
    return adj


# ---------------------------------------------------------------------------
# Full-pipeline oracle over `pages` rows
# ---------------------------------------------------------------------------

def make_key(text: str | None, n: int, pad: str = "N") -> str:
    return ((text or "")[:n]).ljust(n, pad)


def is_usable(text: str | None, n: int, alphabet: str | None, pad: str = "N") -> bool:
    key = make_key(text, n, pad)
    if alphabet is not None:
        return len(key) == n and all(c in alphabet for c in key)
    return text is not None and len(text) >= n


@dataclass
class OracleResult:
    total: int
    usable: int
    unique: int
    counts: dict[str, int]
    cluster_of_key: dict[str, int]          # key -> cluster id (1-based)
    clusters: list[Cluster]
    annotated: list[tuple[str, int]]        # (url, cluster_id); 0 = unusable
    dedup_urls: list[str]                   # representative rows, input order
    count_hist: dict[int, int]
    neigh_hist: dict[int, int]
    cluster_hist: dict[int, int]


def run_oracle(
    rows: list[tuple[str, str]],
    word_length: int = 24,
    mismatches: int = 1,
    use_edit: bool = False,
    maximum: bool = False,
    alphabet: str | None = "ACGT",
    pad: str = "N",
) -> OracleResult:
    """rows: (url, text) in input order (caller pre-sorts by (warc_ts, url))."""
    counts: dict[str, int] = {}
    usable_n = 0
    for _url, text in rows:
        if is_usable(text, word_length, alphabet, pad):
            key = make_key(text, word_length, pad)
            counts[key] = counts.get(key, 0) + 1
            usable_n += 1

    adj = build_edges(list(counts), mismatches, use_edit)
    cluster_idx_of, clusters = cluster_greedy(counts, adj, maximum)
    cid_of_key = {k: clusters[i].id for k, i in cluster_idx_of.items()}

    annotated: list[tuple[str, int]] = []
    dedup_urls: list[str] = []
    visited: set[int] = set()
    for url, text in rows:
        if is_usable(text, word_length, alphabet, pad):
            key = make_key(text, word_length, pad)
            cid = cid_of_key[key]
            annotated.append((url, cid))
            cl = clusters[cluster_idx_of[key]]
            if cl.id not in visited and cl.max_key == key:
                dedup_urls.append(url)
                visited.add(cl.id)
        else:
            annotated.append((url, 0))

    count_hist: dict[int, int] = {}
    for c in counts.values():
        count_hist[c] = count_hist.get(c, 0) + 1
    neigh_hist: dict[int, int] = {}
    for k in counts:
        d = len(adj.get(k, ()))
        neigh_hist[d] = neigh_hist.get(d, 0) + 1
    cluster_hist: dict[int, int] = {}
    for cl in clusters:
        cluster_hist[cl.size] = cluster_hist.get(cl.size, 0) + 1

    return OracleResult(
        total=len(rows),
        usable=usable_n,
        unique=len(counts),
        counts=counts,
        cluster_of_key=cid_of_key,
        clusters=clusters,
        annotated=annotated,
        dedup_urls=dedup_urls,
        count_hist=count_hist,
        neigh_hist=neigh_hist,
        cluster_hist=cluster_hist,
    )
