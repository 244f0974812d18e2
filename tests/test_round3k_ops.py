"""Round-3 eleventh-batch operators: node2vec biased second-order walks —
brute-force Python replay over the sf0.001 co-occurrence graph."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from sparkmedkg import graphalgo, relations

SF = "/root/testdata/sf0.001"


def _graph(spark):
    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    adj: dict[str, list[str]] = defaultdict(list)
    eset = set()
    for s, d in edges:
        adj[s].append(d)
        eset.add((s, d))
    for s in adj:
        adj[s].sort()
    return adj, eset


def test_node2vec_walks_match_bruteforce_replay(spark):
    adj, eset = _graph(spark)
    want = set()
    for start in sorted(adj):
        prev, cur = start, start
        want.add((start, 0, cur))
        for t in range(1, graphalgo.N2V_LEN + 1):
            cands = adj[cur]
            wts = [
                graphalgo.N2V_W_RETURN
                if x == prev
                else graphalgo.N2V_W_COMMON
                if (prev, x) in eset
                else graphalgo.N2V_W_OUT
                for x in cands
            ]
            h = hashlib.md5(f"{start}|{t}|{prev}>{cur}".encode()).hexdigest()
            r = int(h[:15], 16) % sum(wts)
            cum = 0
            nxt = None
            for x, w in zip(cands, wts):
                if cum <= r < cum + w:
                    nxt = x
                    break
                cum += w
            assert nxt is not None
            prev, cur = cur, nxt
            want.add((start, t, cur))
    got = {
        (r["walk"], r["step"], r["node"])
        for r in graphalgo.q_node2vec_walks(spark, SF).collect()
    }
    assert got == want


def test_node2vec_walks_are_paths_and_bias_differs_from_uniform(spark):
    adj, eset = _graph(spark)
    rows = graphalgo.q_node2vec_walks(spark, SF).collect()
    by_walk: dict[str, dict[int, str]] = defaultdict(dict)
    for r in rows:
        assert r["step"] not in by_walk[r["walk"]]
        by_walk[r["walk"]][r["step"]] = r["node"]
    for walk, steps in by_walk.items():
        assert steps[0] == walk
        assert sorted(steps) == list(range(graphalgo.N2V_LEN + 1))
        for t in range(1, graphalgo.N2V_LEN + 1):
            assert (steps[t - 1], steps[t]) in eset
