"""Round-3 eighteenth-batch operators: edge triangle support / local
bridges, ego density, ontology path counts, RFM segmentation, peak
session concurrency, term burstiness — brute-force Python twins at
sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

from sparkmedkg import graphalgo, hierarchy, relops, textstats
from sparkmedkg.hierarchy import WEB_HIERARCHY
from sparkmedkg.relops import SESSION_GAP_SEC

SF = "/root/testdata/sf0.001"


def _adj(spark):
    edges = graphalgo._edges(spark, SF, 2).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
    return adj


def test_bridge_edges_support_matches_bruteforce(spark):
    adj = _adj(spark)
    want = {}
    for x in adj:
        for y in adj[x]:
            if x < y:
                want[(x, y)] = len(adj[x] & adj[y])
    got = {
        (r["x"], r["y"]): (r["support"], r["is_bridge"])
        for r in graphalgo.q_bridge_edges(spark, SF, 2).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    for k, (supp, flag) in got.items():
        assert flag == (supp == 0)
    assert len(got) > 0


def test_ego_density_matches_bruteforce(spark):
    adj = _adj(spark)
    got = {
        r["CUI"]: (r["deg"], r["ego_edges"], r["ego_density_ppm"])
        for r in graphalgo.q_ego_density(spark, SF, 2).collect()
    }
    assert set(got) == set(adj)
    for n, nbrs in adj.items():
        deg = len(nbrs)
        among = sum(
            1 for u in nbrs for v in nbrs if u < v and v in adj[u]
        )
        ego_edges = deg + among
        ppm = 2 * ego_edges * 1_000_000 // ((deg + 1) * deg)
        assert got[n] == (deg, ego_edges, ppm), n


def test_path_counts_matches_dag_dp(spark):
    children = defaultdict(list)
    parents = defaultdict(list)
    for c, p in WEB_HIERARCHY:
        children[p].append(c)
        parents[c].append(p)
    nodes = {c for c, _ in WEB_HIERARCHY} | {p for _, p in WEB_HIERARCHY}
    roots = {n for n in nodes if n not in parents}

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def paths_up(n, tgt):
        if n == tgt:
            return 1
        return sum(paths_up(p, tgt) for p in parents.get(n, []))

    want = {}
    for n in nodes:
        for r in roots:
            k = paths_up(n, r)
            if k > 0 and n != r:
                want[(n, r)] = k
    got = {
        (r["cui"], r["root"]): r["n_paths"]
        for r in hierarchy.path_counts(spark).collect()
    }
    assert got == want
    # the fixture DAG has at least one diamond (multi-path concept)
    assert max(got.values()) > 1


def test_rfm_segments_match_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per = {}
    for r in rows:
        sec = int(r["ts"].replace(tzinfo=None).timestamp())
        mon = (
            int(round(r["value"] * 1_000_000))
            if r["event_type"] == "purchase"
            else 0
        )
        last, freq, m = per.get(r["user_id"], (0, 0, 0))
        per[r["user_id"]] = (max(last, sec), freq + 1, m + mon)
    now = max(v[0] for v in per.values())
    users = [
        ((now - last) // 86400, freq, mon)
        for last, freq, mon in per.values()
    ]

    def cuts(vals):
        s = sorted(vals)
        out = []
        for q in (0.25, 0.5, 0.75):
            pos = q * (len(s) - 1)
            lo = int(pos)
            frac = pos - lo
            hi = min(lo + 1, len(s) - 1)
            out.append(s[lo] + frac * (s[hi] - s[lo]))
        return out

    rc = cuts([u[0] for u in users])
    fc = cuts([u[1] for u in users])
    mc = cuts([u[2] for u in users])
    want = Counter()
    want_mon = Counter()
    for rec, freq, mon in users:
        key = (
            1 + sum(rec > c for c in rc),
            1 + sum(freq > c for c in fc),
            1 + sum(mon > c for c in mc),
        )
        want[key] += 1
        want_mon[key] += mon
    got = {
        (r["r_q"], r["f_q"], r["m_q"]): (
            r["n_users"],
            r["total_monetary_micros"],
        )
        for r in relops.events_rfm_segments(spark, SF).collect()
    }
    assert got == {k: (want[k], want_mon[k]) for k in want}


def _sessions(rows):
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (r["ts"].replace(tzinfo=None), r["event_id"])
        )
    out = []
    for uid, evs in by_user.items():
        evs.sort()
        start = end = None
        for ts, _ in evs:
            us = int(ts.timestamp() * 1_000_000)
            sec = us // 1_000_000
            if start is None or sec - end // 1_000_000 > SESSION_GAP_SEC:
                if start is not None:
                    out.append((start, end))
                start = us
            end = us
        out.append((start, end))
    return out


def test_peak_concurrency_matches_sweep(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    bounds = []
    for start, end in _sessions(rows):
        bounds.append((start, 1))
        bounds.append((end + 1, -1))
    bounds.sort()
    run = 0
    peak = {}
    for t, d in bounds:
        run += d
        day = t // 86_400_000_000
        peak[day] = max(peak.get(day, -(10**9)), run)
    got = {
        r["day"]: r["peak_concurrent"]
        for r in relops.events_peak_concurrency(spark, SF).collect()
    }
    assert got == peak
    assert max(got.values()) >= 2  # stacked sessions actually occur


def test_term_burstiness_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_docs = len(docs)
    counts = defaultdict(Counter)
    for r in docs:
        for tok in r["text"].lower().split():
            counts[tok][r["doc_id"]] += 1
    stats = {
        t: (
            len(c),
            sum(c.values()),
            sum(v * v for v in c.values()),
        )
        for t, c in counts.items()
    }
    top = sorted(stats, key=lambda t: (-stats[t][1], t))[
        : textstats.BURST_TOP_TERMS
    ]
    got = {
        r["term"]: (r["df"], r["total_count"], r["vmr_ppm"])
        for r in textstats.term_burstiness(spark, SF).collect()
    }
    assert set(got) == set(top)
    for t in top:
        df, s, q = stats[t]
        ppm = (n_docs * q - s * s) * 1_000_000 // (n_docs * s)
        assert got[t] == (df, s, ppm), t
    # function-word glue vs clumping content words must separate
    assert max(v[2] for v in got.values()) > 1_000_000
