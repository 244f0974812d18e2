"""Entity resolution (sparkmedkg/er.py), clustering coefficient
(graphalgo.q_clustering_coeff), and SCD2 intervals (relops.events_scd2).

Oracle-value parity runs in the driver gate; these pin the algorithmic
invariants against brute-force recomputation in plain Python.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from sparkmedkg import dedup, er, graphalgo, relations, relops, trainprep

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    recs = []
    for r in docs:
        norm = re.sub(r"\s+", " ", r["text"].lower())
        recs.append((norm[: er.SN_PREFIX], norm, r["doc_id"], norm[: er.LEV_PREFIX]))
    by_block = defaultdict(list)
    for rec in recs:
        by_block[rec[0]].append(rec)
    want = {}
    for block in by_block.values():
        block.sort(key=lambda t: (t[1], t[2]))
        for i, x in enumerate(block):
            for j in range(i + 1, min(i + er.SN_WINDOW, len(block))):
                y = block[j]
                d = _lev(x[3], y[3])
                if d <= er.LEV_MAX:
                    a, b = sorted((x[2], y[2]))
                    # distinct on (a, b, lev): same as the operator
                    want[(a, b, d)] = True
    got = {
        (r["a"], r["b"], r["lev"])
        for r in er.sorted_neighborhood(spark, SF).collect()
    }
    assert got == set(want)


def test_survivorship_rules(spark):
    members = {
        r["doc_id"]: (r["rep_id"], r["cluster_size"])
        for r in dedup.dedup_clusters(spark, SF).collect()
    }
    docs = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    clusters = defaultdict(list)
    for d, (rep, _) in members.items():
        clusters[rep].append(d)
    got = {r["rep_id"]: r for r in er.survivorship(spark, SF).collect()}
    assert set(got) == set(clusters)
    for rep, ds in clusters.items():
        r = got[rep]
        assert r["cluster_size"] == len(ds)
        # longest text wins, ties to smallest doc_id
        want_canon = max(ds, key=lambda d: (docs[d]["n_chars"], -d))
        assert r["canon_text_id"] == want_canon
        assert r["canon_source"] == min(docs[d]["source"] for d in ds)
        assert r["n_langs"] == len({docs[d]["lang"] for d in ds})


def test_clustering_coeff_matches_bruteforce(spark):
    edges = relations._cooccur_edges(spark, SF, relations.PR_MIN_DOCS).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
    want = {}
    for n, nb in adj.items():
        if len(nb) < 2:
            continue
        nbl = sorted(nb)
        tri = sum(
            1
            for i, u in enumerate(nbl)
            for v in nbl[i + 1:]
            if v in adj[u]
        )
        want[n] = (len(nb), round(2.0 * tri / (len(nb) * (len(nb) - 1)), 6))
    got = {
        r["CUI"]: (r["deg"], r["lcc"])
        for r in graphalgo.q_clustering_coeff(spark, SF).collect()
    }
    assert set(got) == set(want)
    for n in want:
        assert got[n][0] == want[n][0]
        assert got[n][1] == pytest.approx(want[n][1], abs=2e-6)


def test_scd2_intervals(spark):
    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    want = []
    for u, rows in by_user.items():
        runs = []
        for r in rows:
            if not runs or runs[-1][0] != r["event_type"]:
                runs.append((r["event_type"], r["ts"]))
        for i, (et, ts) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append(
                (
                    u,
                    et,
                    int(ts.timestamp() * 1_000_000)
                    if hasattr(ts, "timestamp")
                    else ts,
                    int(nxt.timestamp() * 1_000_000) if nxt is not None else None,
                )
            )
    got = [
        (r["user_id"], r["event_type"], r["valid_from_us"], r["valid_to_us"])
        for r in relops.events_scd2(spark, SF).collect()
    ]
    assert sorted(got) == sorted(want)
    # intervals per user are non-overlapping and chain end-to-start
    per_user = defaultdict(list)
    for u, et, f, t in got:
        per_user[u].append((f, t))
    for ivs in per_user.values():
        ivs.sort()
        for (f1, t1), (f2, _) in zip(ivs, ivs[1:]):
            assert t1 == f2
        assert ivs[-1][1] is None  # current row open-ended
