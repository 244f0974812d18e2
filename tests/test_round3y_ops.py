"""Round-3 twenty-fifth-batch operators: shingle-novelty growth curve,
doc-feature correlation matrix — brute-force Python twins at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from sparkmedkg import corpusops
from sparkmedkg.corpusops import DECON_K, GROWTH_BUCKETS

SF = "/root/testdata/sf0.001"


def _shingles(text, k):
    toks = [t for t in text.lower().split(" ") if t != ""]
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_shingle_growth_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    ids = [r["doc_id"] for r in docs]
    lo, hi = min(ids), max(ids)

    def bucket(d):
        return min((d - lo) * GROWTH_BUCKETS // (hi - lo + 1), GROWTH_BUCKETS - 1)

    per_docs = defaultdict(set)
    per_shingles = defaultdict(set)
    first_seen = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        b = bucket(r["doc_id"])
        sh = _shingles(r["text"], DECON_K)
        if sh:
            per_docs[b].add(r["doc_id"])
        for s in sh:
            per_shingles[b].add(s)
            if s not in first_seen or first_seen[s] > b:
                first_seen[s] = b
    n_new = defaultdict(int)
    for s, b in first_seen.items():
        n_new[b] += 1
    got = {
        r["bucket"]: (r["n_docs"], r["n_shingles"], r["n_new"], r["pct_new_ppm"])
        for r in corpusops.shingle_growth(spark, SF).collect()
    }
    assert set(got) == set(per_shingles)
    for b in per_shingles:
        want = (
            len(per_docs[b]),
            len(per_shingles[b]),
            n_new[b],
            n_new[b] * 1_000_000 // len(per_shingles[b]),
        )
        assert got[b] == want, b
    # novelty must decay: later buckets bring fewer new shingles (pct)
    assert got[0][3] == 1_000_000
    assert got[GROWTH_BUCKETS - 1][3] < got[0][3]


def test_feature_correlation_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    feats = []
    for r in docs:
        toks = [t for t in r["text"].lower().split(" ") if t != ""]
        feats.append(
            {
                "chars": len(r["text"]),
                "tokens": len(toks),
                "distinct_tokens": len(set(toks)),
            }
        )
    names = ["chars", "distinct_tokens", "tokens"]
    got = {
        (r["fa"], r["fb"]): (r["n_docs"], r["r"])
        for r in corpusops.feature_correlation(spark, SF).collect()
    }
    n = len(feats)
    for i, fa in enumerate(names):
        for fb in names[i + 1 :]:
            xs = [f[fa] for f in feats]
            ys = [f[fb] for f in feats]
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sx2 = sum(x * x for x in xs)
            sy2 = sum(y * y for y in ys)
            r = (n * sxy - sx * sy) / (
                math.sqrt(n * sx2 - sx * sx) * math.sqrt(n * sy2 - sy * sy)
            )
            nd, rr = got[(fa, fb)]
            assert nd == n
            assert abs(rr - round(r, 6)) < 1e-6
    # tokens and distinct tokens must be strongly positively correlated
    assert got[("distinct_tokens", "tokens")][1] > 0.5
