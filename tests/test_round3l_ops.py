"""Round-3 twelfth-batch operators: semantic decontamination, probe
calibration, eccentricity bounds — brute-force Python twins at sf0.001."""

from __future__ import annotations

from collections import defaultdict, deque

from sparkmedkg import corpusops, emblinalg, graphalgo, relations

SF = "/root/testdata/sf0.001"


def test_semantic_decontaminate_matches_bruteforce(spark):
    import math

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    ev = {i: v for i, v in vecs.items() if i % corpusops.EVAL_MOD == 0}
    assert ev  # split non-empty

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return num / (na * nb)

    want = {}
    for i, v in vecs.items():
        if i % corpusops.EVAL_MOD == 0:
            continue
        mc = max(cos(v, e) for e in ev.values())
        want[i] = (round(mc, 6), mc >= corpusops.SEMDECON_TAU)
    got = {
        r["vec_id"]: (r["max_eval_cos"], r["flagged"])
        for r in corpusops.semantic_decontaminate(spark, SF).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i][0] - want[i][0]) <= 1e-6
        assert got[i][1] == want[i][1]
    assert any(f for _, f in got.values())  # non-vacuous flags


def test_probe_calibration_buckets_exact(spark):
    w = {
        r["i"]: r["w"] for r in emblinalg.linear_probe(spark, SF).collect()
    }
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    scored = []
    for r in rows:
        q = [round(x * emblinalg.QUANT) for x in r["embedding"]]
        s = sum(int(qi) * w[i] for i, qi in enumerate(q))
        scored.append((r["vec_id"], r["label"], s))
    got = {
        r["decile"]: (r["n"], r["n_pos"], r["pos_rate_ppm"])
        for r in emblinalg.probe_calibration(spark, SF).collect()
    }
    # bucket sizes total the corpus; pos rate is exact integer ppm
    assert sum(n for n, _, _ in got.values()) == len(scored)
    for d, (n, npos, ppm) in got.items():
        assert ppm == (npos * emblinalg.CAL_PPM) // n
    # overall positives conserved across buckets
    assert sum(npos for _, npos, _ in got.values()) == sum(
        1 for _, lab, _ in scored if lab == 1
    )


def test_eccentricity_matches_bruteforce_bfs(spark):
    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    lms = sorted({s for s, _ in edges})[: graphalgo.CLOSENESS_LANDMARKS]
    acc = defaultdict(lambda: [0, 0])  # node -> [n_lm, max_dist]
    for lm in lms:
        dist = {lm: 0}
        q = deque([lm])
        while q:
            u = q.popleft()
            if dist[u] >= graphalgo.BFS_MAX_HOPS:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for n, d in dist.items():
            if d > 0:
                acc[n][0] += 1
                acc[n][1] = max(acc[n][1], d)
    want = {n: (c, m) for n, (c, m) in acc.items()}
    got = {
        r["CUI"]: (r["n_lm"], r["ecc_lb"])
        for r in graphalgo.q_eccentricity(spark, SF).collect()
    }
    assert got == want
