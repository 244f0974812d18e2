"""Round-3 additions, seventh batch: Katz centrality (exact integer path
counts), Luby's maximal independent set, redirect-chain pointer jumping,
and gram-matrix PCA power iteration.  Oracle-value parity runs in the
driver gate; these pin brute-force equality and algorithmic invariants."""

from __future__ import annotations

from collections import defaultdict

from sparkmedkg import emblinalg, graphalgo, relations, webgraph

SF = "/root/testdata/sf0.001"


def _edge_set(spark):
    return {
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    }


# ---------------------------------------------------------------------------
# Katz centrality
# ---------------------------------------------------------------------------

def test_katz_bruteforce_path_counts(spark):
    edges = _edge_set(spark)
    nodes = sorted({u for e in edges for u in e})
    # p_k(v) = walks of length k ending at v
    p = {n: 1 for n in nodes}  # virtual p_0: one empty walk per node
    levels = []
    for _ in range(graphalgo.KATZ_LEVELS):
        nxt = defaultdict(int)
        for (u, v) in edges:
            nxt[v] += p[u]
        p = {n: nxt.get(n, 0) for n in nodes}
        levels.append(dict(p))
    a = graphalgo.KATZ_INV_ALPHA
    want_num = defaultdict(int)
    for k, lvl in enumerate(levels, start=1):
        for n, cnt in lvl.items():
            want_num[n] += cnt * a ** (graphalgo.KATZ_LEVELS - k)
    want_num = {n: w for n, w in want_num.items() if w > 0}
    got = {
        r["CUI"]: (r["katz_num"], r["katz"])
        for r in graphalgo.q_katz(spark, SF).collect()
    }
    assert {n: g[0] for n, g in got.items()} == dict(want_num)
    denom = float(a**graphalgo.KATZ_LEVELS)
    for n, (num, katz) in got.items():
        assert abs(katz - round(num / denom, 6)) < 1e-9


# ---------------------------------------------------------------------------
# Luby MIS
# ---------------------------------------------------------------------------

def test_luby_mis_independent_and_maximal(spark):
    edges = _edge_set(spark)
    nodes = {u for e in edges for u in e}
    mis = {
        r["CUI"]: r["mis_round"]
        for r in graphalgo.q_luby_mis(spark, SF).collect()
    }
    assert mis
    # independence: no edge joins two MIS members
    for (u, v) in edges:
        assert not (u in mis and v in mis)
    # maximality: every non-member has a MIS neighbor (holds whenever the
    # round budget empties the undecided set — true on this graph)
    nbrs = defaultdict(set)
    for (u, v) in edges:
        nbrs[u].add(v)
    for n in nodes - set(mis):
        assert nbrs[n] & set(mis), f"{n} has no MIS neighbor"
    assert all(1 <= r <= graphalgo.MIS_ROUNDS for r in mis.values())


def test_luby_mis_matches_sequential_simulation(spark):
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    edges = _edge_set(spark)
    undecided = {u for e in edges for u in e}
    want = {}
    for rnd in range(1, graphalgo.MIS_ROUNDS + 1):
        if not undecided:
            break
        live = [(u, v) for (u, v) in edges
                if u in undecided and v in undecided]
        nbr_min = defaultdict(lambda: None)
        for (u, v) in live:
            h = h60(u)
            if nbr_min[v] is None or h < nbr_min[v]:
                nbr_min[v] = h
        winners = {
            n for n in undecided
            if nbr_min[n] is None or h60(n) < nbr_min[n]
        }
        for w in winners:
            want[w] = rnd
        killed = {v for (u, v) in edges if u in winners}
        undecided -= winners | killed
    got = {
        r["CUI"]: r["mis_round"]
        for r in graphalgo.q_luby_mis(spark, SF).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Redirect pointer jumping
# ---------------------------------------------------------------------------

def test_redirect_resolve_bruteforce(spark):
    hids = sorted({
        r["doc_id"] % webgraph.N_SRC_HOSTS
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").collect()
    })
    present = set(hids)

    def parent(h):
        if h % webgraph.REDIRECT_ROOT_MOD == 0 or (h - 1) not in present:
            return None
        return h - 1

    got = {
        r["host"]: (r["canonical_host"], r["n_hops"])
        for r in webgraph.redirect_resolve(spark, SF).collect()
    }
    assert len(got) == len(present)
    for h in hids:
        cur, hops = h, 0
        while parent(cur) is not None:
            cur = parent(cur)
            hops += 1
        assert got[f"site{h}.example"] == (f"site{cur}.example", hops)


def test_redirect_resolve_roots_are_fixed_points(spark):
    rows = webgraph.redirect_resolve(spark, SF).collect()
    canon = {r["canonical_host"] for r in rows}
    by_host = {r["host"]: r for r in rows}
    for c in canon:
        assert by_host[c]["canonical_host"] == c
        assert by_host[c]["n_hops"] == 0
    # log-step bound: 3 doublings resolve chains up to 8 hops; the
    # synthetic chains are at most REDIRECT_ROOT_MOD-1 long
    assert max(r["n_hops"] for r in rows) < webgraph.REDIRECT_ROOT_MOD


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------

def test_pca_power_matches_integer_simulation(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    Q = emblinalg.QUANT
    qs = [
        [int(round(x * Q)) for x in r["embedding"]] for r in rows
    ]
    d = len(qs[0])
    g = [[0] * d for _ in range(d)]
    for q in qs:
        for i in range(d):
            qi = q[i]
            if qi:
                gi = g[i]
                for j in range(d):
                    gi[j] += qi * q[j]
    import math

    gmax = max(abs(g[i][j]) for i in range(d) for j in range(d))
    shift = int(2.0 ** max(0.0, math.floor(math.log2(float(gmax)))
                           - (emblinalg.GRAM_BITS - 1)))
    ghat = [
        [
            (1 if g[i][j] > 0 else -1 if g[i][j] < 0 else 0)
            * math.floor(abs(g[i][j]) / shift)
            for j in range(d)
        ]
        for i in range(d)
    ]
    v = [Q] * d
    for _ in range(emblinalg.PCA_ITERS):
        u = [sum(ghat[i][j] * v[j] for j in range(d)) for i in range(d)]
        umax = max(1, max(abs(x) for x in u))
        v = [
            (1 if x > 0 else -1 if x < 0 else 0)
            * math.floor(abs(x) * Q / umax)
            for x in u
        ]
    got = {
        r["i"]: r["v"] for r in emblinalg.pca_power(spark, SF).collect()
    }
    assert got == {i: v[i] for i in range(d)}


def test_pca_power_tracks_float_power_iteration(spark):
    # the synthetic embeddings are near-isotropic (eigengap ~1.07), so NO
    # power method points at the top eigenvector after 2 steps — the
    # contract is "k exact power steps", so the float reference is G^k @ 1
    import numpy as np

    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    G = X.T @ X
    ref = np.ones(G.shape[0])
    for _ in range(emblinalg.PCA_ITERS):
        ref = G @ ref
    ref = ref / np.linalg.norm(ref)
    got = emblinalg.pca_power(spark, SF).collect()
    v = np.zeros(len(ref))
    for r in got:
        v[r["i"]] = r["v"]
    v = v / np.linalg.norm(v)
    # quantization truncation is the only divergence source
    assert float(np.dot(v, ref)) > 0.99
