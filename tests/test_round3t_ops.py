"""Round-3 twentieth-batch operators: contamination scorecard, outlink
entropy, DAU/MAU stickiness — brute-force Python twins at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from sparkmedkg import corpusops, relops, webgraph
from sparkmedkg.corpusops import EVAL_MOD

SF = "/root/testdata/sf0.001"


def test_contamination_report_consistent_with_passes(spark):
    ngram = {
        r["doc_id"] for r in corpusops.decontaminate(spark, SF).collect()
    }
    train_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .where(f"doc_id % {EVAL_MOD} != 0")
        .select("doc_id")
        .collect()
    }
    sem = {
        r["vec_id"]
        for r in corpusops.semantic_decontaminate(spark, SF).collect()
        if r["flagged"] and r["vec_id"] % EVAL_MOD != 0
    } & train_ids
    row = corpusops.contamination_report(spark, SF).collect()[0]
    assert row["n_train_docs"] == len(train_ids)
    assert row["n_ngram_hits"] == len(ngram)
    assert row["n_semantic_hits"] == len(sem)
    assert row["n_either"] == len(ngram | sem)
    assert row["pct_clean"] == round(
        (len(train_ids) - len(ngram | sem)) / len(train_ids) * 100.0, 6
    )


def test_outlink_entropy_matches_bruteforce(spark):
    edges = webgraph.link_graph(spark, SF).collect()
    dist = defaultdict(dict)
    for r in edges:
        dist[r["src_host"]][r["dst_host"]] = r["n_links"]
    got = {
        r["src_host"]: (r["out_hosts"], r["total_links"], r["entropy"])
        for r in webgraph.outlink_entropy(spark, SF).collect()
    }
    assert set(got) == set(dist)
    for host, d in dist.items():
        tot = sum(d.values())
        # same fold order as the operators: sorted by (dst_host, n_links)
        ent = 0.0
        for dst in sorted(d):
            p = d[dst] / tot
            ent += p * math.log2(p)
        ent = round(-ent, 6)
        oh, tl, e = got[host]
        assert oh == len(d)
        assert tl == tot
        assert abs(e - ent) < 1e-6, host
    # entropy must actually vary across hosts (it is a detector, not a
    # constant)
    assert len({v[2] for v in got.values()}) > 1


def test_stickiness_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_month_day = defaultdict(set)
    by_month = defaultdict(set)
    for r in rows:
        ts = r["ts"]
        m = f"{ts.year:04d}-{ts.month:02d}"
        by_month_day[(m, ts.date())].add(r["user_id"])
        by_month[m].add(r["user_id"])
    per_month = defaultdict(lambda: [0, 0])  # n_days, sum_dau
    for (m, _), users in by_month_day.items():
        per_month[m][0] += 1
        per_month[m][1] += len(users)
    got = {
        r["month"]: (r["mau"], r["avg_dau_ppm"], r["stickiness_ppm"])
        for r in relops.events_stickiness(spark, SF).collect()
    }
    assert set(got) == set(by_month)
    for m, (n_days, sum_dau) in per_month.items():
        mau = len(by_month[m])
        assert got[m] == (
            mau,
            sum_dau * 1_000_000 // n_days,
            sum_dau * 1_000_000 // (n_days * mau),
        )
