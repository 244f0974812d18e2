"""Round-3 fifteenth-batch operators: WL color refinement, two-star
connected components, butterfly counts, count-min heavy hitters —
brute-force Python twins at sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from sparkmedkg import corpusops, graphalgo, relations

SF = "/root/testdata/sf0.001"


def _edges(spark):
    return [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]


def test_wl_colors_matches_bruteforce(spark):
    edges = _edges(spark)
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    color = {v: str(len(ns)) for v, ns in adj.items()}
    for _ in range(graphalgo.WL_ROUNDS):
        color = {
            v: hashlib.md5(
                (
                    color[v] + "|" + ",".join(sorted(color[u] for u in ns))
                ).encode()
            ).hexdigest()
            for v, ns in adj.items()
        }
    got = {
        r["CUI"]: r["wl_color"]
        for r in graphalgo.q_wl_colors(spark, SF).collect()
    }
    assert got == color
    # refinement must be at least as fine as the degree partition
    deg_classes = defaultdict(set)
    for v, ns in adj.items():
        deg_classes[len(ns)].add(got[v])
    assert all(len(cs) >= 1 for cs in deg_classes.values())


def test_cc_twostar_matches_unionfind(spark):
    edges = _edges(spark)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(set)
    for v in parent:
        comp[find(v)].add(v)
    want = {v: min(comp[find(v)]) for v in parent}
    got = {
        r["CUI"]: r["component"]
        for r in graphalgo.q_cc_twostar(spark, SF).collect()
    }
    assert got == want


def test_butterflies_matches_bruteforce(spark):
    dc = relations._doc_cui(spark, SF).collect()
    by_doc = defaultdict(set)
    for r in dc:
        by_doc[r["url"]].add(r["CUI"])
    codeg = Counter()
    for cuis in by_doc.values():
        ordered = sorted(cuis)
        for i, x in enumerate(ordered):
            for y in ordered[i + 1:]:
                codeg[(x, y)] += 1
    want = Counter()
    for (x, y), cd in codeg.items():
        if cd >= 2:
            bf = cd * (cd - 1) // 2
            want[x] += bf
            want[y] += bf
    got = {
        r["CUI"]: r["bf"] for r in graphalgo.q_butterflies(spark, SF).collect()
    }
    assert got == dict(want)
    assert all(v > 0 for v in got.values())


def test_cms_heavy_hitters_matches_bruteforce(spark):
    import re

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts = Counter()
    for r in docs:
        counts.update(re.split(" +", r["text"]))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        : corpusops.CMS_TOPK
    ]
    reg = Counter()
    cols = {}
    for term, n in counts.items():
        for r in range(corpusops.CMS_D):
            c = (
                int(
                    hashlib.md5(f"{r}:{term}".encode()).hexdigest()[:15], 16
                )
                % corpusops.CMS_W
            )
            cols[(r, term)] = c
            reg[(r, c)] += n
    rows = corpusops.cms_heavy_hitters(spark, SF).collect()
    got = {r["term"]: r for r in rows}
    assert set(got) == {t for t, _ in top}
    for term, n in top:
        est = min(
            reg[(r, cols[(r, term)])] for r in range(corpusops.CMS_D)
        )
        row = got[term]
        assert row["exact_n"] == n
        assert row["cms_est"] == est
        assert row["over_err"] == est - n
        assert row["cms_est"] >= row["exact_n"]  # CMS never undercounts
