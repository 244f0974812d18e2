"""Round-3 privacy/estimator/summary batch: t-closeness EMD audit,
join-cardinality estimator audit, per-document LexRank — independent
brute-force Python twins at sf0.001."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb

from sparkmedkg import corpusops, relops
from sparkmedkg.metrics import join_size_est

SF = "/root/testdata/sf0.001"


def test_t_closeness_matches_emd_definition(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, CAST(hour(ts) AS BIGINT),"
        " CAST(json_extract_string(props, '$.k') AS INT) "
        f"FROM read_parquet('{SF}/events.parquet') "
        "WHERE json_extract_string(props, '$.k') IS NOT NULL"
    ).fetchall()
    con.close()
    cc = Counter()
    gg = Counter()
    for et, hr, sens in rows:
        cc[(et, hr, sens)] += 1
        gg[sens] += 1
    domain = sorted(gg)
    n = sum(gg.values())
    m = len(domain)
    classes = defaultdict(Counter)
    for (et, hr, sens), c in cc.items():
        classes[(et, hr)][sens] += c
    want = {}
    for (et, hr), dist in classes.items():
        n_c = sum(dist.values())
        cum_c = cum_g = 0
        emd_num = 0
        for v in domain:
            cum_c += dist.get(v, 0)
            cum_g += gg[v]
            emd_num += abs(cum_c * n - cum_g * n_c)
        ppm = (1_000_000 * emd_num) // (max(m - 1, 1) * n_c * n)
        want[(et, hr)] = (
            n_c, m, emd_num, ppm, ppm > relops.TCLOSE_T_PPM
        )
    got = {
        (r["event_type"], int(r["hour"])): (
            int(r["n_c"]), int(r["m_vals"]), int(r["emd_num"]),
            int(r["emd_ppm"]), bool(r["at_risk"]),
        )
        for r in relops.events_t_closeness(spark, SF).collect()
    }
    assert got == want
    # EMD in ppm is a proper [0,1] distance
    assert all(0 <= v[3] <= 1_000_000 for v in got.values())


def test_join_size_est_matches_counter_definition(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_id, event_type || '#' || CAST(hour(ts) AS VARCHAR) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    ca = Counter()
    cb = Counter()
    for eid, k in rows:
        (ca if eid % 2 == 0 else cb)[k] += 1
    n_a, n_b = sum(ca.values()), sum(cb.values())
    d_a, d_b = len(ca), len(cb)
    exact = sum(c * cb.get(k, 0) for k, c in ca.items())
    est = (n_a * n_b) // max(d_a, d_b)
    err = (1_000_000 * abs(est - exact)) // max(exact, 1)
    out = join_size_est(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        int(r["n_a"]), int(r["n_b"]), int(r["d_a"]), int(r["d_b"]),
        int(r["exact_rows"]), int(r["est_rows"]), int(r["err_ppm"]),
    ) == (n_a, n_b, d_a, d_b, exact, est, err)
    # the estimate should be the right order of magnitude on this key
    assert 0 < est < 100 * exact


def _lexrank_python():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    want = {}
    tau2 = corpusops.LEX_TAU_PPM ** 2
    for doc_id, text in rows:
        toks = re.split(" +", text.lower())
        sents = defaultdict(Counter)
        for pos, t in enumerate(toks):
            sents[pos // corpusops.LEX_SENT_TOKS][t] += 1
        sids = sorted(sents)
        n2 = {s: sum(v * v for v in sents[s].values()) for s in sids}
        adj = defaultdict(list)
        for i, sa in enumerate(sids):
            for sb in sids[i + 1:]:
                dot = sum(
                    c * sents[sb].get(t, 0) for t, c in sents[sa].items()
                )
                if dot * dot * 10 ** 12 >= tau2 * n2[sa] * n2[sb]:
                    adj[sa].append(sb)
                    adj[sb].append(sa)
        deg = {s: len(adj[s]) for s in sids}
        n_s = len(sids)
        pr = {s: 1_000_000 // n_s for s in sids}
        for _ in range(corpusops.LEX_ITERS):
            nxt = {}
            for s in sids:
                contrib = sum(
                    (17 * pr[j]) // (20 * deg[j]) for j in adj[s]
                )
                nxt[s] = 150_000 // n_s + contrib
            pr = nxt
        ranked = sorted(sids, key=lambda s: (-pr[s], s))
        for rnk, s in enumerate(ranked[: corpusops.LEX_TOPK], 1):
            want[(doc_id, rnk)] = (s, pr[s], deg[s])
    return want


def test_lexrank_matches_python_unroll(spark):
    want = _lexrank_python()
    got = {
        (r["doc_id"], int(r["rnk"])): (
            int(r["sid"]), int(r["rank_micro"]), int(r["deg"])
        )
        for r in corpusops.lexrank_sentences(spark, SF).collect()
    }
    assert got == want
    # at least some documents must have a non-trivial similarity graph
    assert any(d > 0 for _, _, d in got.values())
