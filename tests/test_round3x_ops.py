"""Round-3 twenty-fourth-batch operators: TF-IDF weighted cosine pairs,
Lorenz/Pareto decile curve — brute-force Python twins at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from sparkmedkg import er, relops
from sparkmedkg.er import TFIDF_DF_CAP, TFIDF_TAU

SF = "/root/testdata/sf0.001"


def test_tfidf_pairs_match_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    toks = {r["doc_id"]: set(r["text"].lower().split()) for r in docs}
    toks = {d: {t for t in ts if t} for d, ts in toks.items()}
    n = len(docs)
    df = defaultdict(int)
    for ts in toks.values():
        for t in ts:
            df[t] += 1
    q = {t: math.floor(math.log(n / d) * 1000 + 0.5) for t, d in df.items()}
    norms = {d: sum(q[t] * q[t] for t in ts) for d, ts in toks.items()}
    rare_block = defaultdict(set)
    for d, ts in toks.items():
        for t in ts:
            if df[t] <= TFIDF_DF_CAP:
                rare_block[t].add(d)
    cands = set()
    for ds in rare_block.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cands.add((a, b))
    want = {}
    for a, b in cands:
        shared = toks[a] & toks[b]
        dot = sum(q[t] * q[t] for t in shared)
        cos = dot / math.sqrt(norms[a] * norms[b])
        if cos >= TFIDF_TAU:
            want[(a, b)] = (len(shared), round(cos, 6))
    got = {
        (r["a"], r["b"]): (r["n_shared"], r["cos"])
        for r in er.tfidf_pairs(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6
    assert len(got) > 0


def test_pareto_curve_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per = defaultdict(int)
    for r in rows:
        per[r["user_id"]] += 1
    counts = sorted(per.values())

    def cut(qv):
        pos = qv * (len(counts) - 1)
        lo = int(pos)
        frac = pos - lo
        hi = min(lo + 1, len(counts) - 1)
        return counts[lo] + frac * (counts[hi] - counts[lo])

    cuts = [cut(i / 10.0) for i in range(1, 10)]
    per_dec = defaultdict(lambda: [0, 0])
    for c in per.values():
        dec = 1 + sum(c < x for x in cuts)
        per_dec[dec][0] += 1
        per_dec[dec][1] += c
    all_ev = sum(v[1] for v in per_dec.values())
    got = {
        r["decile"]: (r["n_users"], r["n_events"], r["cum_events_ppm"])
        for r in relops.events_pareto_curve(spark, SF).collect()
    }
    assert set(got) == set(per_dec)
    cum = 0
    for dec in sorted(per_dec):
        n_u, n_e = per_dec[dec]
        cum += n_e * 1_000_000 // all_ev
        assert got[dec] == (n_u, n_e, cum)
    # decile 1 (heaviest) must concentrate more than a uniform share
    assert got[1][1] * 10 > all_ev
