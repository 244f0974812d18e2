"""Round-3 placement + clustering-agreement batch: rendezvous shard
plan, mod-vs-HRW resize move audit, Adjusted Rand Index scorecard —
independent brute-force Python twins at sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from sparkmedkg import shardops
from sparkmedkg.metrics import cluster_agreement
from sparkmedkg.simsearch import _cells, kmeans

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hrw(key: str, n: int) -> int:
    return max(range(1, n + 1), key=lambda s: (_h60(f"{key}#{s}"), -s))


def test_rendezvous_plan_matches_bruteforce(spark):
    docs = _docs()
    loads: Counter = Counter()
    nbytes: Counter = Counter()
    for doc_id, text in docs:
        sh = _hrw(str(doc_id), shardops.SHARDS)
        loads[sh] += 1
        nbytes[sh] += len(text)
    total = sum(loads.values())
    got = {
        int(r["shard"]): (
            int(r["n_docs"]), int(r["total_bytes"]),
            int(r["load_ppm"]), int(r["skew_ppm"]),
        )
        for r in shardops.rendezvous_plan(spark, SF).collect()
    }
    assert set(got) == set(loads)
    for sh, c in loads.items():
        ppm = (1_000_000 * c) // total
        assert got[sh] == (
            c, nbytes[sh], ppm, ppm - 1_000_000 // shardops.SHARDS
        )
    # every shard should carry SOME load at 500 keys over 8 shards
    assert len(got) == shardops.SHARDS


def test_shard_move_audit_shows_hrw_minimal_movement(spark):
    docs = _docs()
    n = len(docs)
    mod_m = sum(
        1
        for doc_id, _ in docs
        if _h60(str(doc_id)) % shardops.SHARDS
        != _h60(str(doc_id)) % shardops.SHARDS_GROWN
    )
    hrw_m = sum(
        1
        for doc_id, _ in docs
        if _hrw(str(doc_id), shardops.SHARDS)
        != _hrw(str(doc_id), shardops.SHARDS_GROWN)
    )
    got = {
        r["strategy"]: (int(r["n_keys"]), int(r["n_moved"]),
                        int(r["moved_ppm"]))
        for r in shardops.shard_move_audit(spark, SF).collect()
    }
    assert got == {
        "mod": (n, mod_m, (1_000_000 * mod_m) // n),
        "hrw": (n, hrw_m, (1_000_000 * hrw_m) // n),
    }
    # the point of the operator: HRW moves ~1/(N+1), mod ~N/(N+1)
    assert got["hrw"][2] < got["mod"][2]
    assert got["hrw"][2] < 300_000       # well under a third
    assert got["mod"][2] > 700_000       # well over two thirds


def test_cluster_agreement_matches_ari_formula(spark):
    km = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans(spark, SF).select("vec_id", "cluster").collect()
    }
    cells = {
        int(r["vec_id"]): int(r["cid"])
        for r in _cells(spark, SF).select("vec_id", "cid").collect()
    }
    assert set(km) == set(cells)
    cont: Counter = Counter(
        (km[v], cells[v]) for v in km
    )
    n = sum(cont.values())
    s2ij = sum(c * (c - 1) for c in cont.values())
    ai: Counter = Counter()
    bj: Counter = Counter()
    for (a, b), c in cont.items():
        ai[a] += c
        bj[b] += c
    s2a = sum(c * (c - 1) for c in ai.values())
    s2b = sum(c * (c - 1) for c in bj.values())
    c2n2 = float(n * (n - 1))
    num = c2n2 * float(s2ij) - float(s2a) * float(s2b)
    den = c2n2 * float(s2a + s2b) / 2.0 - float(s2a) * float(s2b)
    rows = cluster_agreement(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (int(r["n"]), int(r["s2ij"]), int(r["s2a"]), int(r["s2b"])) == (
        n, s2ij, s2a, s2b
    )
    if den != 0:
        assert abs(float(r["ari"]) - num / den) <= 2e-6
        # two real clusterings of the same vectors agree above chance
        assert float(r["ari"]) > 0.0
    else:
        assert r["ari"] is None
