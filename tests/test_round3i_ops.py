"""Round-3 ninth-batch operators: bow-tie decomposition, dangling-aware
host PageRank — brute-force Python twins over the sf0.001 tables."""

from __future__ import annotations

from collections import defaultdict

from sparkmedkg import graphalgo, webgraph

SF = "/root/testdata/sf0.001"


def _reach(seeds, adj):
    seen, stack = set(seeds), list(seeds)
    while stack:
        for n in adj[stack.pop()]:
            if n not in seen:
                seen.add(n)
                stack.append(n)
    return seen


def test_bowtie_bruteforce(spark):
    from tests.test_round3h_ops import _directed_edges

    dedges = _directed_edges(spark)
    nodes = sorted({v for e in dedges for v in e})
    fwd, bwd = defaultdict(set), defaultdict(set)
    for s, d in dedges:
        fwd[s].add(d)
        bwd[d].add(s)

    scc = {
        r["cui"]: r["scc_id"]
        for r in graphalgo.q_scc(spark, SF).collect()
    }
    sizes = defaultdict(int)
    for sid in scc.values():
        sizes[sid] += 1
    core_id = min(
        sizes, key=lambda s: (-sizes[s], s)
    )  # largest SCC, ties to smallest id
    core = {v for v, sid in scc.items() if sid == core_id}
    from_core = _reach(core, fwd)
    to_core = _reach(core, bwd)
    want = {
        "core": len(core),
        "in": len(to_core - core),
        "out": len(from_core - core),
        "other": len(set(nodes) - from_core - to_core),
    }
    got = {
        r["component"]: r["n_nodes"]
        for r in graphalgo.q_bowtie(spark, SF).collect()
    }
    assert got == want
    assert sum(got.values()) == len(nodes)
    # IN and OUT are disjoint from CORE by construction and the 2/3-coin
    # orientation leaves a non-trivial core (same guarantee as q_scc's test)
    assert got["core"] > 1


def test_web_pagerank_bruteforce(spark):
    edges = {
        (r["src_host"], r["dst_host"])
        for r in webgraph.link_graph(spark, SF).collect()
    }
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    out = defaultdict(set)
    for s, d in edges:
        out[s].add(d)
    d = webgraph.WPR_DAMPING
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(webgraph.WPR_ITERS):
        dangling = sum(pr[v] for v in nodes if not out[v])
        contrib = defaultdict(float)
        for s in nodes:
            if out[s]:
                share = pr[s] / len(out[s])
                for t in out[s]:
                    contrib[t] += share
        pr = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n)
            for v in nodes
        }
    got = {
        r["host"]: r["pagerank"]
        for r in webgraph.q_web_pagerank(spark, SF).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - pr[v]) < 1e-8, v
    # dangling redistribution conserves total mass
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_web_pagerank_has_dangling_hosts(spark):
    """The contrast with kg_pagerank only means something if the host
    graph actually HAS sinks — assert the fixture provides them."""
    edges = {
        (r["src_host"], r["dst_host"])
        for r in webgraph.link_graph(spark, SF).collect()
    }
    srcs = {s for s, _ in edges}
    dsts = {t for _, t in edges}
    assert dsts - srcs, "expected at least one dangling (sink) host"
