"""Round-3 salience/calibration/coreset batch: entity salience,
confidence ECE table, k-center greedy seeds, PRF expansion,
double-sweep diameter bound.

Oracle-value parity is covered by the driver gate (selfcheck-verified);
here we pin brute-force twins built from already-gated constituents.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict, deque

import duckdb

from sparkmedkg import corpusops, graphalgo, metrics, relations, simsearch

SF = "/root/testdata/sf0.001"


def test_entity_salience_matches_bruteforce(spark):
    occ = relations.mention_occurrences(spark, SF).collect()
    bl = {
        r["mention"]: r["CUI"]
        for r in relations._best_links(
            spark, relations.mention_occurrences(spark, SF)
        ).collect()
    }
    con = duckdb.connect()
    lens = dict(
        con.execute(
            "SELECT doc_id, len(string_split(lower(text), ' ')) FROM "
            f"read_parquet('{SF}/documents.parquet') WHERE lang = 'en'"
        ).fetchall()
    )
    con.close()
    tf = defaultdict(int)
    first = {}
    for r in occ:
        if r["mention"] not in bl:  # below the linker threshold
            continue
        key = (r["doc_id"], bl[r["mention"]])
        tf[key] += 1
        s = int(r["start_idx"])
        first[key] = min(first.get(key, s), s)
    got = {
        (r["doc_id"], r["CUI"]): r
        for r in relations.q_entity_salience(spark, SF).collect()
    }
    assert set(got) == set(tf)
    for key, r in got.items():
        n = lens[key[0]]
        early = (n - first[key]) * 1_000_000 // n
        assert int(r["tf"]) == tf[key]
        assert int(r["first_idx"]) == first[key]
        assert int(r["n_toks"]) == n
        assert int(r["early_ppm"]) == early
        assert int(r["salience_ppm"]) == early * tf[key] // (tf[key] + 1)


def test_confidence_ece_matches_constituents(spark):
    conf = {
        (r["subj_cui"], r["obj_cui"]): r["conf6"]
        for r in relations.q_triple_confidence(spark, SF).collect()
    }
    lab = {
        (r["subj_cui"], r["obj_cui"]): bool(r["label"])
        for r in relations.q_weak_supervision_vote(spark, SF).collect()
    }
    bins = defaultdict(lambda: [0, 0, 0])
    for k, c in conf.items():
        if k not in lab:
            continue
        b = min(int(math.floor(c * 10)), 9)
        bins[b][0] += 1
        bins[b][1] += int(round(c * 1e6))
        bins[b][2] += 1 if lab[k] else 0
    got = {int(r["bin"]): r for r in metrics.confidence_ece(spark, SF).collect()}
    assert set(got) == set(bins)
    for b, (n, cs, np) in bins.items():
        r = got[b]
        assert int(r["n_pairs"]) == n
        assert int(r["avg_conf_ppm"]) == cs // n
        assert int(r["pos_ppm"]) == np * 1_000_000 // n
        assert int(r["gap_ppm"]) == abs(cs // n - np * 1_000_000 // n)


def test_kcenter_seeds_matches_bruteforce(spark):
    con = duckdb.connect()
    vecs = {
        vid: [math.floor(float(e) * 1000 + 0.5) for e in emb]
        for vid, emb in con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        ).fetchall()
    }
    con.close()

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seeds = [min(vecs)]
    want = [(1, seeds[0], 0)]
    for rank in range(2, simsearch.KC_K + 1):
        best = max(
            vecs,
            key=lambda v: (min(d2(vecs[v], vecs[s]) for s in seeds), -v),
        )
        want.append(
            (rank, best, min(d2(vecs[best], vecs[s]) for s in seeds))
        )
        seeds.append(best)
    got = sorted(
        (int(r["seed_rank"]), int(r["vec_id"]), int(r["dist2"]))
        for r in simsearch.kcenter_seeds(spark, SF).collect()
    )
    assert got == want
    # greedy radius is non-increasing after each added center
    dists = [d for _, _, d in got[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_prf_expansion_matches_bruteforce(spark):
    bm = {
        r["doc_id"]: r["score"]
        for r in corpusops.bm25_topk(spark, SF).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    w = defaultdict(int)
    nd = defaultdict(int)
    for doc_id, text in docs:
        if doc_id not in bm:
            continue
        ts = re.split(" +", text)
        dl = len(ts)
        tfs = defaultdict(int)
        for t in ts:
            if t not in corpusops.BM25_TERMS:
                tfs[t] += 1
        for t, tf in tfs.items():
            w[t] += math.floor(tf * bm[doc_id] * 1e9 / dl + 0.5)
            nd[t] += 1
    want = sorted(w, key=lambda t: (-w[t], t))[: corpusops.PRF_K_TERMS]
    rows = corpusops.prf_expansion(spark, SF).collect()
    assert [r["term"] for r in rows] == want
    for r in rows:
        assert int(r["weight"]) == w[r["term"]]
        assert int(r["n_docs"]) == nd[r["term"]]


def test_double_sweep_matches_bruteforce_bfs(spark):
    edges = defaultdict(set)
    for r in graphalgo._edges(spark, SF, 2).collect():
        edges[r["src"]].add(r["dst"])

    def bfs(seed):
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            for v in edges[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist
    seed = min(edges)
    d1 = bfs(seed)
    ecc1 = max(d1.values())
    far = min(c for c, d in d1.items() if d == ecc1)
    d2 = bfs(far)
    row = graphalgo.q_double_sweep(spark, SF).collect()[0]
    assert row["seed"] == seed
    assert row["far_node"] == far
    assert int(row["ecc_seed"]) == ecc1
    assert int(row["diameter_lb"]) == max(d2.values())
    assert int(row["n_reached"]) == len(d2)
    # the sweep cap must sit above the observed eccentricities
    assert max(ecc1, max(d2.values())) <= graphalgo.SWEEP_HOPS
