"""Web-graph family (sparkmedkg/webgraph.py).

Oracle-value parity runs in the driver gate (web_link_graph, web_hits,
corpus_kmv_distinct, kg_adamic_adar, dedup_containment); here we pin the
algorithmic invariants against brute-force recomputation in plain Python.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from sparkmedkg import dedup, graphalgo, relations, webgraph

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# link_graph
# ---------------------------------------------------------------------------

def test_link_graph_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    want: dict[tuple[str, str], int] = defaultdict(int)
    for r in docs:
        src = f"site{r['doc_id'] % webgraph.N_SRC_HOSTS}.example"
        toks = [t for t in r["text"].split(" ") if t][: webgraph.MAX_ANCHORS]
        for t in toks:
            want[(src, f"h{_h60(t) % webgraph.N_DST_HOSTS}.example")] += 1
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in webgraph.link_graph(spark, SF).collect()
    }
    assert got == dict(want)


def test_link_graph_anchor_cap(spark):
    # no page contributes more than MAX_ANCHORS outlinks
    per_src_from_one_doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(
            f"least(size(split(text, ' +')), {webgraph.MAX_ANCHORS}) AS n"
        )
        .collect()
    )
    assert all(r["n"] <= webgraph.MAX_ANCHORS for r in per_src_from_one_doc)


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def test_hits_invariants(spark):
    rows = webgraph.q_hits(spark, SF).collect()
    hubs = sum(r["hub"] for r in rows)
    auths = sum(r["authority"] for r in rows)
    assert hubs == pytest.approx(1.0, abs=1e-3)
    assert auths == pytest.approx(1.0, abs=1e-3)
    assert all(r["hub"] >= 0 and r["authority"] >= 0 for r in rows)
    # the synthesized graph is bipartite site* -> h*: crawl hosts carry all
    # hub mass, anchor-target hosts carry all authority mass
    for r in rows:
        if r["host"].startswith("site"):
            assert r["authority"] == 0.0
        else:
            assert r["hub"] == 0.0


def test_hits_matches_bruteforce(spark):
    edges = {
        (r["src_host"], r["dst_host"])
        for r in webgraph.link_graph(spark, SF).collect()
    }
    nodes = sorted({u for e in edges for u in e})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 1.0 for n in nodes}
    for _ in range(webgraph.HITS_ITERS):
        h = {n: sum(auth[v] for (u, v) in edges if u == n) for n in nodes}
        tot = sum(h.values())
        hub = {n: h[n] / tot for n in nodes}
        a = {n: sum(hub[u] for (u, v) in edges if v == n) for n in nodes}
        tot = sum(a.values())
        auth = {n: a[n] / tot for n in nodes}
    got = {r["host"]: (r["hub"], r["authority"]) for r in webgraph.q_hits(spark, SF).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n][0] == pytest.approx(hub[n], abs=5e-6)
        assert got[n][1] == pytest.approx(auth[n], abs=5e-6)


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------

def test_kmv_exact_when_small(spark):
    rows = webgraph.kmv_distinct(spark, SF).collect()
    assert rows
    for r in rows:
        if r["n_exact"] < webgraph.KMV_K:
            assert r["kmv_est"] == pytest.approx(float(r["n_exact"]))


def test_kmv_estimate_bounded_error(spark):
    # KMV with k=64 has relative std error ~ 1/sqrt(k-2) ~ 12.7%; assert a
    # generous 4-sigma envelope on every group large enough to estimate
    rows = webgraph.kmv_distinct(spark, "/root/testdata/sf0.01").collect()
    for r in rows:
        if r["n_exact"] >= webgraph.KMV_K:
            rel = abs(r["kmv_est"] - r["n_exact"]) / r["n_exact"]
            assert rel < 4 / math.sqrt(webgraph.KMV_K - 2), r


# ---------------------------------------------------------------------------
# Adamic-Adar
# ---------------------------------------------------------------------------

def test_adamic_adar_matches_bruteforce(spark):
    edges = relations._cooccur_edges(spark, SF, relations.PR_MIN_DOCS).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
    nodes = sorted(adj)
    want = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            s = sum(
                1.0 / math.log(len(adj[u]))
                for u in adj[a] & adj[b]
                if len(adj[u]) > 1
            )
            if s >= webgraph.AA_TAU:
                want[(a, b)] = round(s, 6)
    got = {
        (r["a"], r["b"]): r["aa_score"]
        for r in webgraph.q_adamic_adar(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


# ---------------------------------------------------------------------------
# Containment
# ---------------------------------------------------------------------------

def _shingles(text: str, k: int = dedup.SHINGLE_K) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    n = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i:i + k]) for i in range(n)}


def test_containment_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    df = defaultdict(int)
    for s in sh.values():
        for g in s:
            df[g] += 1
    hot = {g for g, c in df.items() if c > webgraph.CONT_MAX_DF}
    kept = {d: s - hot for d, s in sh.items()}
    want = {}
    by_shingle = defaultdict(set)
    for d, s in kept.items():
        for g in s:
            by_shingle[g].add(d)
    cands = {
        (a, b)
        for ds in by_shingle.values()
        for a in ds
        for b in ds
        if a != b
    }
    for a, b in cands:
        if not kept[a]:
            continue
        c = len(kept[a] & kept[b]) / len(kept[a])
        if c >= webgraph.CONT_TAU:
            want[(a, b)] = round(c, 6)
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in webgraph.containment_pairs(spark, SF).collect()
    }
    assert got == want


def test_containment_is_asymmetric(spark):
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in webgraph.containment_pairs(spark, SF, tau=0.0).collect()
    }
    # at tau=0 every candidate pair appears in both directions, and a
    # smaller doc contained in a larger one scores higher than the reverse
    assert any(
        (b, a) in got and got[(a, b)] != got[(b, a)] for (a, b) in got
    )


def test_hll_estimate_bounded_error(spark):
    import math as _m

    for sf in [SF, "/root/testdata/sf0.01"]:
        rows = webgraph.hll_distinct(spark, sf).collect()
        assert rows
        for r in rows:
            assert r["hll_est"] > 0
            rel = abs(r["hll_est"] - r["n_exact"]) / max(r["n_exact"], 1)
            # sigma ~ 1.04/sqrt(64) ~ 13%; allow 4 sigma (linear counting
            # makes small groups much tighter in practice)
            assert rel < 4 * 1.04 / _m.sqrt(webgraph.HLL_M), (sf, dict(r.asDict()))


def test_hll_matches_reference_implementation(spark):
    import hashlib
    import math as _m
    from collections import defaultdict

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "text"
    ).collect()
    seen = defaultdict(set)
    for r in docs:
        seen[r["source"]].add(int(hashlib.md5(r["text"].encode()).hexdigest()[:15], 16))
    m = webgraph.HLL_M
    alpha = 0.7213 / (1.0 + 1.079 / m)
    want = {}
    for src, hs in seen.items():
        regs = {}
        for h in hs:
            reg, rem = h % m, h // m
            rho = (61 - webgraph.HLL_P) if rem == 0 else (60 - webgraph.HLL_P) - rem.bit_length() + 1
            regs[reg] = max(regs.get(reg, 0), rho)
        s = sum(2.0 ** -v for v in regs.values()) + (m - len(regs))
        raw = alpha * m * m / s
        v = m - len(regs)
        est = m * _m.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
        want[src] = round(est, 2)
    got = {
        r["source"]: r["hll_est"]
        for r in webgraph.hll_distinct(spark, SF).collect()
    }
    assert got == want


def test_mirror_hosts_matches_bruteforce(spark):
    import math as _m

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    tf = defaultdict(int)
    for r in docs:
        host = f"site{r['doc_id'] % webgraph.N_SRC_HOSTS}.example"
        for t in [x for x in r["text"].split(" ") if x][: webgraph.MAX_ANCHORS]:
            tf[(host, t)] += 1
    hosts = {h for h, _ in tf}
    df = defaultdict(int)
    for (_, t) in tf:
        df[t] += 1
    n = float(len(hosts))
    w = {
        (h, t): c * _m.log(1.0 + n / df[t])
        for (h, t), c in tf.items()
        if df[t] <= webgraph.MIRROR_MAX_TERM_HOSTS
    }
    vec = defaultdict(dict)
    for (h, t), x in w.items():
        vec[h][t] = x
    want = {}
    hs = sorted(hosts)
    for i, a in enumerate(hs):
        va = vec.get(a, {})
        na = _m.sqrt(sum(x * x for x in va.values()))
        for b in hs[i + 1:]:
            vb = vec.get(b, {})
            if not va or not vb:
                continue
            dot = sum(va[t] * vb.get(t, 0.0) for t in va)
            if dot == 0.0:
                continue
            nb = _m.sqrt(sum(x * x for x in vb.values()))
            cos = dot / (na * nb)
            if cos >= webgraph.MIRROR_TAU:
                want[(a, b)] = round(cos, 6)
    got = {
        (r["host_a"], r["host_b"]): r["cosine"]
        for r in webgraph.mirror_hosts(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=5e-6)
