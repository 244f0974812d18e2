"""Round-3 twenty-first-batch operators: modality rollup, hub-skew
report, embedding norm profile, data-mixture plan — brute-force Python
twins at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from sparkmedkg import graphalgo, multimodal, simsearch, trainprep
from sparkmedkg.trainprep import MIX_BUDGET_DOCS, TEMP_ALPHA

SF = "/root/testdata/sf0.001"


def test_modality_rollup_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    mods = ["text", "image", "audio", "video"]
    per = defaultdict(lambda: [0, 0, 0])  # n, total, max
    for r in docs:
        m = mods[r["doc_id"] % 4]
        b = len(r["text"].encode("utf-8"))
        per[m][0] += 1
        per[m][1] += b
        per[m][2] = max(per[m][2], b)
    all_bytes = sum(v[1] for v in per.values())
    got = {
        r["modality"]: (
            r["n_items"],
            r["total_bytes"],
            r["avg_bytes"],
            r["max_bytes"],
            r["pct_bytes_ppm"],
        )
        for r in multimodal.modality_rollup(spark, SF).collect()
    }
    assert set(got) == set(per)
    for m, (n, tot, mx) in per.items():
        assert got[m] == (n, tot, tot // n, mx, tot * 1_000_000 // all_bytes)


def test_skew_report_matches_bruteforce(spark):
    edges = graphalgo._edges(spark, SF, 2).collect()
    deg = defaultdict(int)
    for r in edges:
        deg[r["src"]] += 1
    all_deg = sum(deg.values())
    top = sorted(deg, key=lambda c: (-deg[c], c))[: graphalgo.SKEW_TOP]
    rows = sorted(
        graphalgo.q_skew_report(spark, SF, 2).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["CUI"] for r in rows] == top
    cum = 0
    for r, cui in zip(rows, top):
        ppm = deg[cui] * 1_000_000 // all_deg
        cum += ppm
        assert (r["deg"], r["pct_ppm"], r["cum_ppm"]) == (deg[cui], ppm, cum)


def test_norm_profile_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    qns = []
    for r in rows:
        nrm = 0.0
        for x in r["embedding"]:
            nrm += float(x) * float(x)
        qns.append(math.floor(math.sqrt(nrm) * 1_000_000 + 0.5))
    qns.sort()
    row = simsearch.norm_profile(spark, SF).collect()[0]
    assert row["n_vecs"] == len(qns)
    assert row["n_zero"] == sum(1 for q in qns if q == 0)
    assert row["min_norm_e6"] == qns[0]
    assert row["max_norm_e6"] == qns[-1]
    assert row["avg_norm_e6"] == sum(qns) // len(qns)
    pos = 0.5 * (len(qns) - 1)
    lo = int(pos)
    want_p50 = round(qns[lo] + (pos - lo) * (qns[min(lo + 1, len(qns) - 1)] - qns[lo]), 6)
    assert abs(row["p50_norm_e6"] - want_p50) < 1e-6


def test_mixture_plan_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for r in docs:
        m = r["doc_id"] % 10
        tier = "head" if m < 5 else ("torso" if m < 8 else "tail")
        per[tier][0] += 1
        per[tier][1] += len([t for t in r["text"].split(" ") if t != ""])
    all_docs = sum(v[0] for v in per.values())
    z = 0.0
    for tier in sorted(per):  # same fold order as the struct-sorted fold
        z += per[tier][0] ** TEMP_ALPHA
    got = {
        r["tier"]: r for r in trainprep.mixture_plan(spark, SF).collect()
    }
    assert set(got) == set(per)
    for tier, (n, ntok) in per.items():
        r = got[tier]
        share = n**TEMP_ALPHA / z
        assert r["n_docs"] == n
        assert r["n_tokens"] == ntok
        assert r["nat_share"] == round(n / all_docs, 6)
        assert abs(r["temp_share"] - round(share, 6)) < 1e-9
        assert r["planned_docs"] == math.floor(share * MIX_BUDGET_DOCS)
    # temperature must upweight the tail vs its natural share
    assert got["tail"]["temp_share"] > got["tail"]["nat_share"]
