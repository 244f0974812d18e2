"""Round-3 nineteenth-batch operators: embedding anisotropy, pair-cosine
histogram, global graph summary — brute-force NumPy/Python twins at
sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from sparkmedkg import graphalgo, simsearch
from sparkmedkg.simsearch import ANISO_SCALE, PAIR_OFFSET

SF = "/root/testdata/sf0.001"


def _vecs(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}


def test_anisotropy_matches_bruteforce(spark):
    vecs = _vecs(spark)
    n = len(vecs)
    qsum = None
    for v in vecs.values():
        nrm = math.sqrt(sum(x * x for x in v))  # same fold order
        q = np.floor(v / nrm * ANISO_SCALE + 0.5).astype(np.int64)
        qsum = q if qsum is None else qsum + q
    want = round(
        float((qsum.astype(object) ** 2).sum())
        / (n * n * ANISO_SCALE * ANISO_SCALE),
        6,
    )
    row = simsearch.anisotropy(spark, SF).collect()[0]
    assert row["n_vecs"] == n
    assert row["dim"] == len(qsum)
    assert abs(row["anisotropy"] - want) < 1e-9
    # random gaussian vectors: near-isotropic
    assert row["anisotropy"] < 0.05


def test_pair_cosine_hist_matches_bruteforce(spark):
    vecs = _vecs(spark)
    want = Counter()
    for i, va in vecs.items():
        vb = vecs.get(i + PAIR_OFFSET)
        if vb is None:
            continue
        cos = float(va @ vb) / (
            math.sqrt(float(va @ va)) * math.sqrt(float(vb @ vb))
        )
        want[math.floor(round(cos, 6) * 10)] += 1
    got = {
        r["bin"]: r["n_pairs"]
        for r in simsearch.pair_cosine_hist(spark, SF).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == len(vecs) - PAIR_OFFSET


def test_graph_summary_matches_bruteforce(spark):
    edges = graphalgo._edges(spark, SF, 2).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
    n = len(adj)
    degs = {v: len(nbrs) for v, nbrs in adj.items()}
    n_edges = sum(degs.values()) // 2
    tris = sum(
        1
        for x in adj
        for y in adj[x]
        if x < y
        for z in adj[y]
        if y < z and z in adj[x]
    )
    wedges = sum(d * (d - 1) // 2 for d in degs.values())
    dmax = max(degs.values())
    row = graphalgo.q_graph_summary(spark, SF, 2).collect()[0]
    assert row["n_nodes"] == n
    assert row["n_edges"] == n_edges
    assert row["max_deg"] == dmax
    assert row["n_triangles"] == tris
    assert row["n_wedges"] == wedges
    assert row["transitivity_ppm"] == 3 * tris * 1_000_000 // wedges
    assert row["centralization_ppm"] == (
        (n * dmax - sum(degs.values())) * 1_000_000 // ((n - 1) * (n - 2))
    )
