"""Round-3 twenty-third-batch operators: full coreness decomposition
(H-index iteration vs brute-force peel), per-user behavioral entropy —
brute-force Python twins at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from sparkmedkg import graphalgo, relops

SF = "/root/testdata/sf0.001"


def test_coreness_matches_peel(spark):
    edges = graphalgo._edges(spark, SF, 2).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
    # classic min-degree peel with the standard coreness lower-bound fix
    live = {v: len(n) for v, n in adj.items()}
    core = {}
    cur = 0
    while live:
        v = min(live, key=lambda x: (live[x], x))
        cur = max(cur, live[v])
        core[v] = cur
        del live[v]
        for u in adj[v]:
            if u in live:
                live[u] -= 1
    got = {
        r["CUI"]: r["coreness"]
        for r in graphalgo.q_coreness(spark, SF).collect()
    }
    assert got == core
    # the fixture graph must have a non-trivial core structure
    assert max(core.values()) >= 2


def test_coreness_hindex_monotone_converged(spark):
    """One extra H-index round past CORENESS_ITERS changes nothing —
    convergence, not truncation."""
    a = {
        r["CUI"]: r["coreness"]
        for r in graphalgo.q_coreness(
            spark, SF, iters=graphalgo.CORENESS_ITERS
        ).collect()
    }
    b = {
        r["CUI"]: r["coreness"]
        for r in graphalgo.q_coreness(
            spark, SF, iters=graphalgo.CORENESS_ITERS + 1
        ).collect()
    }
    assert a == b


def test_session_entropy_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per = defaultdict(Counter)
    for r in rows:
        per[r["user_id"]][r["event_type"]] += 1
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["entropy"])
        for r in relops.events_session_entropy(spark, SF).collect()
    }
    assert set(got) == set(per)
    for uid, cnt in per.items():
        n = sum(cnt.values())
        ent = 0.0
        for t in sorted(cnt):  # same struct-sorted fold order
            p = cnt[t] / n
            ent += p * math.log2(p)
        n_ev, n_ty, e = got[uid]
        assert n_ev == n
        assert n_ty == len(cnt)
        assert abs(e - round(-ent, 6)) < 1e-6
