"""Round-3 integrity/report batch: ontology cycle audit, GROUPING SETS
rollup — brute-force twins and structural invariants."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from sparkmedkg import hierarchy, relops

SF = "/root/testdata/sf0.001"


def test_cycle_check_matches_closure(spark):
    row = hierarchy.cycle_check(spark, SF).collect()[0]
    edges = hierarchy.WEB_HIERARCHY
    nodes = {c for c, _ in edges} | {p for _, p in edges}
    # Python transitive closure
    parents = defaultdict(set)
    for c, p in edges:
        parents[c].add(p)
    clo = set()
    for n in nodes:
        stack, seen = list(parents[n]), set()
        while stack:
            a = stack.pop()
            if a in seen:
                continue
            seen.add(a)
            stack.extend(parents[a])
        clo |= {(n, a) for a in seen}
    assert int(row["n_nodes"]) == len(nodes)
    assert int(row["n_edges"]) == len(edges)
    assert int(row["n_closure_pairs"]) == len(clo)
    assert int(row["n_self_reach"]) == sum(1 for c, a in clo if c == a)
    assert bool(row["is_dag"]) is True


def test_grouping_sets_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, (epoch_us(ts) // 3600000000) % 24, "
        "CAST(round(value*100) AS BIGINT) FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])

    def add(key, cents):
        agg[key][0] += 1
        agg[key][1] += cents
    for et, hod, cents in rows:
        add((et, hod, 0), cents)
        add((et, None, 1), cents)
        add((None, hod, 2), cents)
        add((None, None, 3), cents)
    got = {
        (r["event_type"], r["hod"], int(r["gid"])): (
            int(r["n"]), int(r["sum_cents"])
        )
        for r in relops.events_grouping_sets(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # the grand-total row equals the sum of each single-dimension grain
    total = got[(None, None, 3)]
    for gid, pos in ((1, 0), (2, 1)):
        keys = [k for k in got if k[2] == gid]
        assert sum(got[k][0] for k in keys) == total[0]
        assert sum(got[k][1] for k in keys) == total[1]
