"""Round-3 tenth-batch operators: SemDeDup, spam mass, community
conductance, soft-dedup weights — brute-force Python twins over the
sf0.001 tables."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from sparkmedkg import dedup, graphalgo, simsearch, webgraph

SF = "/root/testdata/sf0.001"


def test_semdedup_bruteforce(spark):
    """Keep/drop decisions recomputed from the (independently tested)
    quantized cell assignment via exact integer arithmetic."""
    cells = simsearch._cells(spark, SF).collect()
    by_cell = defaultdict(list)
    for r in cells:
        by_cell[r["cid"]].append((r["vec_id"], [int(x) for x in r["q"]]))
    tau, qk2 = simsearch.SEMDEDUP_TAU_MICRO, simsearch.KNN_QK**2
    want = {}
    for members in by_cell.values():
        for vid, q in members:
            n_dups, dup_of = 0, None
            for oid, oq in members:
                if oid == vid:
                    continue
                dot = sum(a * b for a, b in zip(q, oq))
                if 1_000_000 * dot >= tau * qk2:
                    n_dups += 1
                    if oid < vid and (dup_of is None or oid < dup_of):
                        dup_of = oid
            want[vid] = (n_dups, dup_of, dup_of is None)
    got = {
        r["vec_id"]: (r["n_dups"], r["dup_of"], r["keep"])
        for r in simsearch.semdedup(spark, SF).collect()
    }
    assert got == want
    kept = {v for v, (_, _, k) in got.items() if k}
    assert kept and kept != set(got), (
        "fixture should exercise both keep and drop"
    )
    for v, (_, dup_of, k) in got.items():
        if not k:
            assert dup_of is not None and dup_of < v


def test_spam_mass_bruteforce(spark):
    edges = {
        (r["src"], r["dst"])
        for r in webgraph._intra_edges(spark, SF).collect()
    }
    nodes = sorted({v for e in edges for v in e})
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(nodes)
    alpha, iters = webgraph.TRUST_ALPHA, webgraph.TRUST_ITERS
    seeds = set(webgraph.TRUST_SEEDS)
    t = {v: (1 / len(seeds) if v in seeds else 0.0) for v in nodes}
    p = {v: 1 / n for v in nodes}
    for _ in range(iters):
        st, sp = defaultdict(float), defaultdict(float)
        for s, d in edges:
            st[d] += t[s] / deg[s]
            sp[d] += p[s] / deg[s]
        t = {
            v: (1 - alpha) * (1 / len(seeds) if v in seeds else 0.0)
            + alpha * st[v]
            for v in nodes
        }
        p = {v: (1 - alpha) / n + alpha * sp[v] for v in nodes}
    got = {
        r["host"]: (r["pr"], r["trust"], r["spam_mass"], r["spammy"])
        for r in webgraph.q_spam_mass(spark, SF).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        m = round((p[v] - t[v]) / p[v], 6)
        assert got[v] == (
            round(p[v], 9), round(t[v], 9), m,
            m * 1_000_000 >= webgraph.SPAM_MASS_TAU6,
        ), v
    # seeds are trusted (near-zero mass), and some host is spammy
    assert all(not got[s][3] for s in seeds if s in got)
    assert any(v[3] for v in got.values()), "expected spammy hosts"


def test_conductance_bruteforce(spark):
    edges = [
        (r["src"], r["dst"])
        for r in graphalgo._edges(spark, SF, 2).collect()
    ]
    labels = {
        r["CUI"]: r["label"]
        for r in graphalgo.q_label_propagation(
            spark, SF, iters=graphalgo.CONDUCT_ITERS
        ).collect()
    }
    vol, cut, size = defaultdict(int), defaultdict(int), defaultdict(int)
    for v, l in labels.items():
        size[l] += 1
    for s, d in edges:
        vol[labels[s]] += 1
        if labels[s] != labels[d]:
            cut[labels[s]] += 1
    tv = sum(vol.values())
    want = {}
    for l, vl in vol.items():
        m = min(vl, tv - vl)
        want[l] = (
            size[l], vl, cut[l],
            round(cut[l] / m, 6) if m > 0 else None,
        )
    got = {
        r["label"]: (r["n_nodes"], r["vol"], r["cut"], r["conductance"])
        for r in graphalgo.q_conductance(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 1, "fixture should have multiple communities"


def test_soft_dedup_bruteforce(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in dedup._read_docs(spark, SF).select("doc_id", "text").collect()
    }
    k = dedup.SHINGLE_K

    def shingles(text):
        ws = text.split()
        n = max(len(ws) - k + 1, 1)
        return {" ".join(ws[i : i + k]) for i in range(n)}

    sh = {d: shingles(t) for d, t in docs.items()}
    df = defaultdict(int)
    for ss in sh.values():
        for s in ss:
            df[s] += 1
    copies = defaultdict(int)
    for t in docs.values():
        copies[hashlib.md5(t.encode()).hexdigest()] += 1
    got = {
        r["doc_id"]: (r["n_copies"], r["gm_df"], r["soft_weight"])
        for r in dedup.soft_dedup(spark, SF).collect()
    }
    assert set(got) == set(docs)
    for d, t in docs.items():
        mlog = sum(math.log(df[s]) for s in sh[d]) / len(sh[d])
        nc = copies[hashlib.md5(t.encode()).hexdigest()]
        assert got[d][0] == nc, d
        assert abs(got[d][1] - round(math.exp(mlog), 6)) <= 1e-6, d
        assert abs(got[d][2] - round(1 / (nc * math.exp(mlog)), 6)) <= 1e-6, d
    # weights must be a real gradient, not constant
    ws = {v[2] for v in got.values()}
    assert len(ws) > 5 and max(ws) <= 1.0
