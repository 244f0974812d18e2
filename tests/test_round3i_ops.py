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


def test_margin_pairs_bruteforce(spark):
    """Margin math checked against the (independently brute-force-tested)
    kNN edge set: exact integer accept decision + rounded double report."""
    from sparkmedkg import simsearch

    knn = simsearch.knn_graph(spark, SF).collect()
    s = defaultdict(int)
    c = defaultdict(int)
    edge = {}
    mutual = set()
    for r in knn:
        s[r["src"]] += r["dot_q"]
        c[r["src"]] += 1
        edge[(r["src"], r["dst"])] = r["dot_q"]
        if r["mutual"]:
            mutual.add((r["src"], r["dst"]))
    want = {}
    for (a, b), dot in edge.items():
        if a >= b or (a, b) not in mutual or (b, a) not in edge:
            continue
        den = s[a] * c[b] + s[b] * c[a]
        if den <= 0:
            continue
        num = 2 * dot * c[a] * c[b]
        want[(a, b)] = (
            round(dot / simsearch.KNN_QK**2, 6),
            round(num / den, 6),
            1000 * num >= simsearch.MARGIN_TAU_MILLI * den,
        )
    got = {
        (r["a"], r["b"]): (r["cos"], r["margin"], r["accept"])
        for r in simsearch.margin_pairs(spark, SF).collect()
    }
    assert got == want
    accepts = {k for k, v in got.items() if v[2]}
    assert accepts and accepts != set(got), (
        "fixture should exercise both sides of the margin threshold"
    )


def test_cocitation_bruteforce(spark):
    edges = {
        (r["src_host"], r["dst_host"])
        for r in webgraph.link_graph(spark, SF).collect()
    }
    outdeg = defaultdict(int)
    indeg = defaultdict(int)
    for st, dt in edges:
        outdeg[st] += 1
        indeg[dt] += 1
    cap = webgraph.COCITE_MAX_DEG
    cocite = defaultdict(int)
    couple = defaultdict(int)
    by_src = defaultdict(set)
    by_dst = defaultdict(set)
    for st, dt in edges:
        if outdeg[st] <= cap:
            by_src[st].add(dt)
        if indeg[dt] <= cap:
            by_dst[dt].add(st)
    for targets in by_src.values():
        ts = sorted(targets)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                cocite[(a, b)] += 1
    for srcs in by_dst.values():
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                couple[(a, b)] += 1
    want = {
        p: (cocite.get(p, 0), couple.get(p, 0))
        for p in set(cocite) | set(couple)
    }
    got = {
        (r["a"], r["b"]): (r["n_cocited"], r["n_coupled"])
        for r in webgraph.q_cocitation(spark, SF).collect()
    }
    assert got == want
    # src-hosts and anchor-target hosts mostly partition in the fixture,
    # so demand each signal individually, not jointly on one pair
    assert any(v[0] for v in got.values())
    assert any(v[1] for v in got.values())
