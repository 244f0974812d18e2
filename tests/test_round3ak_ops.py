"""Round-3 curation batch: truth discovery (Sums), source trust,
functional-slot conflict resolution, retrieval nDCG, 2-D skyline.

Oracle-value parity is covered by the driver gate (selfcheck-verified);
here we pin brute-force twins and semantic invariants.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

import duckdb

from sparkmedkg import corpusops, metrics, relations, trainprep

SF = "/root/testdata/sf0.001"


def _claims_rows(spark):
    return [
        (r["source"], (r["subj_cui"], r["pred"], r["obj_cui"]))
        for r in relations._claims(spark, SF).collect()
    ]


def _sums(claims):
    t1, b1, t2, b2 = (
        defaultdict(int), defaultdict(int), defaultdict(int),
        defaultdict(int),
    )
    for s, _ in claims:
        t1[s] += 1
    for s, f in claims:
        b1[f] += t1[s]
    for s, f in claims:
        t2[s] += b1[f]
    for s, f in claims:
        b2[f] += t2[s]
    return t1, b1, t2, b2


def test_truth_discovery_matches_bruteforce_sums(spark):
    claims = _claims_rows(spark)
    assert claims
    _, _, t2, b2 = _sums(claims)
    n_src = defaultdict(int)
    for s, f in claims:
        n_src[f] += 1
    mx = max(b2.values())
    got = {
        (r["subj_cui"], r["pred"], r["obj_cui"]): r
        for r in relations.q_truth_discovery(spark, SF).collect()
    }
    assert set(got) == set(b2)
    for f, r in got.items():
        assert int(r["belief"]) == b2[f]
        assert int(r["n_sources"]) == n_src[f]
        assert int(r["belief_ppm"]) == b2[f] * 1_000_000 // mx
    assert max(int(r["belief_ppm"]) for r in got.values()) == 1_000_000


def test_source_trust_matches_bruteforce_sums(spark):
    claims = _claims_rows(spark)
    t1, _, t2, _ = _sums(claims)
    mx = max(t2.values())
    got = {r["source"]: r for r in relations.q_source_trust(spark, SF).collect()}
    assert set(got) == set(t2)
    for s, r in got.items():
        assert int(r["n_claims"]) == t1[s]
        assert int(r["trust"]) == t2[s]
        assert int(r["trust_ppm"]) == t2[s] * 1_000_000 // mx


def test_conflict_resolution_picks_argmax_support(spark):
    rel = [
        (r["subj_cui"], r["pred"], r["obj_cui"], int(r["n_docs"]),
         int(r["n_occ"]))
        for r in relations.q_relations(spark, SF).collect()
    ]
    slots = defaultdict(list)
    for s, p, o, nd, no in rel:
        slots[(s, p)].append((o, nd, no))
    want = {}
    for (s, p), objs in slots.items():
        if len(objs) < 2:
            continue
        kept = sorted(objs, key=lambda t: (-t[1], -t[2], t[0]))[0]
        want[(s, p)] = (
            kept[0], len(objs), kept[1], sum(t[1] for t in objs)
        )
    got = {
        (r["subj_cui"], r["pred"]): (
            r["kept_obj"], int(r["n_objects"]), int(r["kept_docs"]),
            int(r["total_docs"]),
        )
        for r in relations.q_conflict_resolution(spark, SF).collect()
    }
    assert got == want
    for (s, p), (o, n, kd, td) in got.items():
        assert kd <= td


def test_retrieval_ndcg_matches_bruteforce(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    rel = {}
    for doc_id, text in docs:
        toks = re.split(" +", text)
        tf = sum(toks.count(t) for t in corpusops.BM25_TERMS)
        rel[doc_id] = min(tf, metrics.NDCG_REL_CAP)
    bm = corpusops.bm25_topk(spark, SF).collect()
    ranking = sorted(bm, key=lambda r: (-r["score"], r["doc_id"]))

    def nano(g, r):
        return math.floor((2.0 ** g - 1.0) / math.log2(r + 1.0) * 1e9 + 0.5)

    dcg = sum(nano(rel[r["doc_id"]], i + 1) for i, r in enumerate(ranking))
    ideal = sorted((v for v in rel.values() if v > 0), reverse=True)[:10]
    idcg = sum(nano(g, i + 1) for i, g in enumerate(ideal))
    row = metrics.retrieval_ndcg(spark, SF).collect()[0]
    assert row["k"] == 10
    assert row["n_rel_docs"] == sum(1 for v in rel.values() if v > 0)
    assert abs(row["dcg6"] - round(dcg / 1e9, 6)) < 1e-9
    assert abs(row["idcg6"] - round(idcg / 1e9, 6)) < 1e-9
    assert abs(row["ndcg6"] - round(dcg / idcg, 6)) < 1e-9
    assert 0.0 < row["ndcg6"] <= 1.0


def test_doc_skyline_matches_naive(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    pts = {}
    for doc_id, text in docs:
        ts = [t for t in re.split(" +", text)]
        if not ts:
            continue
        x = len(ts)
        y = len(set(ts)) * 1_000_000 // x
        pts[doc_id] = (x, y)
    want = {
        d
        for d, (x, y) in pts.items()
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for qx, qy in pts.values()
        )
    }
    got = {
        r["doc_id"]: (int(r["n_toks"]), int(r["distinct_ppm"]))
        for r in trainprep.doc_skyline(spark, SF).collect()
    }
    assert set(got) == want
    for d, xy in got.items():
        assert xy == pts[d]
