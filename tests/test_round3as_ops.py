"""Round-3 sequence/motif/GNN batch: PrefixSpan-style sequential pattern
support, SAX motif discovery, GraphSAGE neighbor aggregation —
brute-force Python twins over the sf0.001 tables."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from sparkmedkg import graphalgo, relations, relops, statops

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, epoch_us(ts) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_seq_patterns_matches_bruteforce(spark):
    rows = _events()
    lo: dict = {}
    hi: dict = {}
    for u, t, ts in rows:
        k = (u, t)
        lo[k] = min(lo.get(k, ts), ts)
        hi[k] = max(hi.get(k, ts), ts)
    users = sorted({u for u, _ in lo})
    n_total = len(users)
    n_type = Counter(t for _, t in lo)
    exp = Counter()
    by_user = defaultdict(list)
    for u, t in lo:
        by_user[u].append(t)
    for u, types in by_user.items():
        for a in types:
            for b in types:
                if lo[(u, a)] < hi[(u, b)]:
                    exp[(a, b)] += 1
    got = {
        (r["type_a"], r["type_b"]): r
        for r in relops.events_seq_patterns(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for (a, b), n in exp.items():
        r = got[(a, b)]
        assert int(r["n_users"]) == n
        assert int(r["support_ppm"]) == n * relops.SEQ_PPM // n_total
        assert int(r["lift_ppm"]) == (
            n * n_total * relops.SEQ_PPM // (n_type[a] * n_type[b])
        )
    # the pattern table must dominate its own reverse where order matters:
    # support is per-user, so n_users(a->b) <= users having both a and b
    for (a, b), n in exp.items():
        both = sum(1 for u in users if (u, a) in lo and (u, b) in lo)
        assert n <= both


def _ntile(n_rows: int, k: int) -> list[int]:
    """Standard NTILE bucket sizes: first n_rows % k tiles get one extra."""
    base, extra = divmod(n_rows, k)
    out = []
    for tile in range(1, k + 1):
        out.extend([tile] * (base + (1 if tile <= extra else 0)))
    return out


def test_sax_motifs_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, epoch_us(ts) // {statops.HOUR_US}, COUNT(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    series = defaultdict(dict)
    for t, hr, c in rows:
        series[t][hr] = c
    exp = Counter()
    for t, by_hr in series.items():
        hrs = range(min(by_hr), max(by_hr) + 1)
        dense = [(by_hr.get(h, 0), h) for h in hrs]
        order = sorted(range(len(dense)), key=lambda i: dense[i])
        tiles = _ntile(len(dense), statops.SAX_ALPHA)
        sym = [0] * len(dense)
        for rank, idx in enumerate(order):
            sym[idx] = tiles[rank]
        for i in range(len(sym) - statops.SAX_WORD + 1):
            word = "".join(str(s) for s in sym[i : i + statops.SAX_WORD])
            exp[(t, word)] += 1
    exp = {k: v for k, v in exp.items() if v >= 2}
    got = {
        (r["event_type"], r["word"]): int(r["n_occ"])
        for r in statops.events_sax_motifs(spark, SF).collect()
    }
    assert got == exp


def test_sage_agg_matches_bruteforce(spark):
    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    deg = Counter(s for s, _ in edges)
    pooled = defaultdict(list)
    for s, d in edges:
        pooled[s].append(deg[d])
    got = {r["CUI"]: r for r in graphalgo.q_sage_agg(spark, SF).collect()}
    assert set(got) == set(deg)
    for v, ds in pooled.items():
        r = got[v]
        assert int(r["deg"]) == deg[v] == len(ds)
        assert int(r["nbr_deg_sum"]) == sum(ds)
        assert int(r["nbr_deg_max"]) == max(ds)
        assert int(r["nbr_deg_mean_milli"]) == sum(ds) * 1000 // len(ds)
