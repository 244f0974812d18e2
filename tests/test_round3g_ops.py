"""Round-3 additions, eighth batch: SimRank (2-iteration ppm fixed
point), web-anchor -> KG-entity bridge, embedding dimension correlation,
and the integer-GD linear probe.  Oracle-value parity runs in the driver
gate; these pin brute-force equality and algorithmic invariants."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd

from sparkmedkg import emblinalg, graphalgo, relations, webgraph, webkg

SF = "/root/testdata/sf0.001"


def _edge_set(spark):
    return {
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    }


# ---------------------------------------------------------------------------
# SimRank
# ---------------------------------------------------------------------------

def test_simrank_bruteforce(spark):
    edges = _edge_set(spark)
    nbr = defaultdict(set)  # in-neighbors: I(dst) includes src
    for (u, v) in edges:
        nbr[v].add(u)
    C, PPM = graphalgo.SIMRANK_C_PPM, graphalgo.PPM
    nodes = sorted(nbr)
    s1 = {}
    for a in nodes:
        for b in nodes:
            if a >= b:
                continue
            common = len(nbr[a] & nbr[b])
            if common:
                s1[(a, b)] = (C * common) // (len(nbr[a]) * len(nbr[b]))
    want = {}
    for (a, b), s1ab in s1.items():
        off = 0
        for i in nbr[a]:
            for j in nbr[b]:
                if i == j:
                    continue
                key = (i, j) if i < j else (j, i)
                off += s1.get(key, 0)
        common = len(nbr[a] & nbr[b])
        s2 = (C * (off + PPM * common)) // (
            PPM * len(nbr[a]) * len(nbr[b])
        )
        want[(a, b)] = (common, s1ab, s2)
    got = {
        (r["a"], r["b"]): (r["c_common"], r["s1_ppm"], r["s2_ppm"])
        for r in graphalgo.q_simrank(spark, SF).collect()
    }
    assert got == want


def test_simrank_scores_bounded(spark):
    for r in graphalgo.q_simrank(spark, SF).collect():
        assert 0 <= r["s1_ppm"] <= graphalgo.SIMRANK_C_PPM
        assert 0 <= r["s2_ppm"] <= graphalgo.PPM


# ---------------------------------------------------------------------------
# Anchor-text entity links
# ---------------------------------------------------------------------------

def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_anchor_entity_links_bruteforce(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    alias_pairs = defaultdict(set)
    for alias, cui in webkg.WEB_ALIASES:
        alias_pairs[alias].add(cui)
    want = defaultdict(int)
    for text in docs["text"]:
        toks = re.split(" +", text)[: webgraph.MAX_ANCHORS]
        html = "<html><body>" + "".join(
            f'<a href="https://h{_h60(t) % webgraph.N_DST_HOSTS}'
            f'.example/p">{t}</a>'
            for t in toks
        ) + "</body></html>"
        for tag in re.findall("(<a [^>]*>[^<]*</a>)", html):
            host = re.search('href="https://([^"/]+)', tag).group(1)
            term = re.search(">([^<]*)</a>", tag).group(1).lower()
            for cui in alias_pairs.get(term, ()):
                want[(host, cui)] += 1
    got = {
        (r["dst_host"], r["CUI"]): r["n_anchors"]
        for r in webgraph.anchor_entity_links(spark, SF).collect()
    }
    assert got == dict(want)


# ---------------------------------------------------------------------------
# Dimension correlation
# ---------------------------------------------------------------------------

def _quantized(sf=SF):
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy())
    # numpy rounds half-to-even; Spark/DuckDB round() is half-away —
    # floor(x+0.5) matches for the positive side, mirror for negative.
    q = np.where(x >= 0, np.floor(x * emblinalg.QUANT + 0.5),
                 -np.floor(-x * emblinalg.QUANT + 0.5)).astype(np.int64)
    return q, emb["label"].to_numpy().astype(np.int64)


def test_dim_corr_top_bruteforce(spark):
    q, _ = _quantized()
    n, d = q.shape
    s = q.sum(axis=0, dtype=np.int64)
    ss = (q.astype(object) * q.astype(object)).sum(axis=0)
    g = q.T.astype(object) @ q.astype(object)
    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            vi = n * ss[i] - s[i] * s[i]
            vj = n * ss[j] - s[j] * s[j]
            if vi <= 0 or vj <= 0:
                continue
            corr = round(
                float(n * g[i, j] - s[i] * s[j])
                / np.sqrt(float(vi) * float(vj)),
                6,
            )
            rows.append((i, j, corr))
    rows.sort(key=lambda r: (-abs(r[2]), r[0], r[1]))
    want = rows[: emblinalg.CORR_TOP_K]
    got = [
        (r["i"], r["j"], r["corr"])
        for r in emblinalg.dim_corr_top(spark, SF).collect()
    ]
    assert got == want
    assert all(-1.0 <= c <= 1.0 for _, _, c in got)


# ---------------------------------------------------------------------------
# Linear probe
# ---------------------------------------------------------------------------

def _tdiv(x: int, d: int) -> int:
    return (1 if x > 0 else -1 if x < 0 else 0) * (abs(x) // d)


def test_linear_probe_bruteforce(spark):
    q, y = _quantized()
    g = (q.T.astype(object) @ q.astype(object))
    b = (q.T.astype(object) @ y.astype(object))
    gmax = int(np.abs(g).max())
    shift = int(
        2.0 ** max(0.0, np.floor(np.log2(float(gmax)))
                   - (emblinalg.GRAM_BITS - 1))
    )
    ghat = np.vectorize(lambda v: _tdiv(int(v), shift), otypes=[object])(g)
    bhat = np.vectorize(lambda v: _tdiv(int(v), shift), otypes=[object])(b)
    r = max(int(np.abs(ghat).sum(axis=1).max()), 1)
    d = len(b)
    w = [0] * d
    for _ in range(emblinalg.PROBE_ITERS):
        gw = [int(sum(ghat[i, j] * w[j] for j in range(d)))
              for i in range(d)]
        w = [
            w[i] + _tdiv(int(bhat[i]) * emblinalg.PROBE_W - gw[i], r)
            for i in range(d)
        ]
    got = {
        r_["i"]: r_["w"]
        for r_ in emblinalg.linear_probe(spark, SF).collect()
    }
    assert got == {i: w[i] for i in range(d)}


def test_linear_probe_descends(spark):
    # the probe step must reduce the normal-equation residual norm
    # (non-divergence is the Gershgorin lr guarantee)
    q, y = _quantized()
    g = q.T.astype(np.float64) @ q.astype(np.float64)
    b = q.T.astype(np.float64) @ y.astype(np.float64)
    got = emblinalg.linear_probe(spark, SF).collect()
    w = np.zeros(len(b))
    for r_ in got:
        w[r_["i"]] = r_["w"] / emblinalg.PROBE_W
    assert np.linalg.norm(g @ w - b) < np.linalg.norm(b)


# ---------------------------------------------------------------------------
# Landmark betweenness
# ---------------------------------------------------------------------------

def test_betweenness_bruteforce(spark):
    edges = _edge_set(spark)
    adj = defaultdict(set)
    for (u, v) in edges:
        adj[u].add(v)
    nodes = sorted({u for e in edges for u in e} & {e[0] for e in edges})
    landmarks = sorted({e[0] for e in edges})[: graphalgo.BTW_LANDMARKS]
    PPM = graphalgo.PPM
    want = defaultdict(int)
    for lm in landmarks:
        level = {lm: 0}
        sig = {lm: 1}
        levels = [[lm]]
        for k in range(1, graphalgo.BTW_HOPS + 1):
            nxt = defaultdict(int)
            for u in levels[k - 1]:
                for v in adj[u]:
                    if v not in level:
                        nxt[v] += sig[u]
            for v, s in nxt.items():
                level[v] = k
                sig[v] = s
            levels.append(sorted(nxt))
        delta = {v: 0 for v in level}
        for k in range(graphalgo.BTW_HOPS - 1, 0, -1):
            for v in levels[k]:
                d = 0
                for w_ in adj[v]:
                    if level.get(w_) == k + 1:
                        d += (sig[v] * (PPM + delta[w_])) // sig[w_]
                delta[v] = d
        for k in range(1, graphalgo.BTW_HOPS + 1):
            for v in levels[k]:
                want[v] += delta[v]
    want = {v: d for v, d in want.items() if d > 0}
    got = {
        r["CUI"]: r["bc_ppm"]
        for r in graphalgo.q_betweenness(spark, SF).collect()
    }
    assert got == dict(want)


# ---------------------------------------------------------------------------
# kNN graph
# ---------------------------------------------------------------------------

def test_knn_graph_bruteforce(spark):
    from sparkmedkg import simsearch

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norm = np.linalg.norm(x, axis=1)
    cents = {
        int(i): x[ids == i][0] for i in range(1, simsearch.N_CELLS + 1)
    }
    # cell assignment: argmax cosine, tie-break lowest cid
    cid = {}
    for vid, v in zip(ids, x):
        sims = sorted(
            ((float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c)), -k)
             for k, c in cents.items()),
            reverse=True,
        )
        cid[int(vid)] = -sims[0][1]
    cells = defaultdict(list)
    for vid in ids:
        cells[cid[int(vid)]].append(int(vid))
    idx = {int(v): i for i, v in enumerate(ids)}
    # quantized unit vectors, half-away-from-zero like Spark/DuckDB round
    u = x / norm[:, None] * simsearch.KNN_QK
    qv = np.where(u >= 0, np.floor(u + 0.5), -np.floor(-u + 0.5)).astype(
        np.int64
    )
    want = {}
    for c, members in cells.items():
        for s in members:
            scored = sorted(
                (
                    (-int(qv[idx[s]] @ qv[idx[d]]), d)
                    for d in members if d != s
                ),
            )[: simsearch.KNN_K]
            for rk, (negdot, d) in enumerate(scored, start=1):
                want[(s, d)] = (-negdot, rk)
    got = {}
    mutual_got = {}
    for r in simsearch.knn_graph(spark, SF).collect():
        got[(r["src"], r["dst"])] = (r["dot_q"], r["rk"])
        mutual_got[(r["src"], r["dst"])] = r["mutual"]
        assert r["cos"] == round(r["dot_q"] / simsearch.KNN_QK**2, 6)
    assert got == want
    for (s, d), m in mutual_got.items():
        assert m == ((d, s) in want)
