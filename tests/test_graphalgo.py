"""Graph analytics (sparkmedkg/graphalgo.py).

Oracle-value parity is covered by the driver gate (kg_degree_dist,
kg_bfs_reach, kg_label_propagation, kg_neighbor_jaccard); here we pin the
algorithmic invariants against brute-force recomputation of the collected
edge set in plain Python.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from sparkmedkg import graphalgo, relations

SF = "/root/testdata/sf0.001"


def _adj(spark):
    edges = relations._cooccur_edges(spark, SF, relations.PR_MIN_DOCS).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
    return adj


def test_bfs_reach_matches_bruteforce(spark):
    adj = _adj(spark)
    seed = min(adj)
    dist = {seed: 0}
    frontier = [seed]
    for k in range(1, graphalgo.BFS_MAX_HOPS + 1):
        frontier = [
            v for u in frontier for v in adj[u] if v not in dist
        ]
        frontier = sorted(set(frontier))
        for v in frontier:
            dist[v] = k
    got = {
        (r["CUI"], r["dist"])
        for r in graphalgo.q_bfs_reach(spark, SF).collect()
    }
    assert got == set(dist.items())


def test_label_propagation_matches_bruteforce(spark):
    adj = _adj(spark)
    labels = {v: v for v in adj}
    for _ in range(graphalgo.LPA_ITERS):
        new = {}
        for v in adj:
            cnt = Counter(labels[u] for u in adj[v])
            top = max(cnt.values())
            # most frequent neighbor label, ties -> smallest label
            new[v] = min(lbl for lbl, c in cnt.items() if c == top)
        labels = new
    got = {
        (r["CUI"], r["label"])
        for r in graphalgo.q_label_propagation(spark, SF).collect()
    }
    assert got == set(labels.items())


def test_neighbor_jaccard_matches_bruteforce(spark):
    adj = _adj(spark)
    want = set()
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            inter = len(adj[a] & adj[b])
            if not inter:
                continue
            j = inter / len(adj[a] | adj[b])
            if j >= graphalgo.NJ_TAU:
                want.add((a, b, round(j, 6)))
    got = {
        (r["a"], r["b"], r["jaccard"])
        for r in graphalgo.q_neighbor_jaccard(spark, SF).collect()
    }
    assert got == want


def test_degree_dist_accounts_for_every_node(spark):
    adj = _adj(spark)
    rows = graphalgo.q_degree_dist(spark, SF).collect()
    assert sum(r["n_nodes"] for r in rows) == len(adj)
    for r in rows:
        assert 2 ** r["bucket"] <= r["min_deg"] <= r["max_deg"] < 2 ** (
            r["bucket"] + 1
        )
