"""Round-3 profiler/eval batch: triple classification, FD discovery,
column entropy, histogram selectivity audit — brute-force Python twins.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from sparkmedkg import kgembed, metrics, relations, relops

SF = "/root/testdata/sf0.001"


def _emb(eid: str, kind: str, i: int) -> int:
    h = hashlib.md5(f"{eid}|{kind}|{i}".encode()).hexdigest()[:15]
    return int(h, 16) % kgembed.EMB_MOD


def _score2(s: str, p: str, o: str) -> int:
    t = 0
    for i in range(kgembed.EMB_DIM):
        d = _emb(s, "e", i) + _emb(p, "r", i) - _emb(o, "e", i)
        t += d * d
    return t


def test_triple_classification_matches_bruteforce(spark):
    neg = relations.q_negative_triples(spark, SF).collect()
    pos = {}
    negs = defaultdict(list)
    for r in neg:
        key = (r["subj_cui"], r["pred"], r["obj_cui"])
        pos[key] = _score2(*key)
        negs[r["pred"]].append(
            _score2(r["subj_cui"], r["pred"], r["neg_obj_cui"])
        )
    want = {}
    for p in negs:
        ps = [s for (su, pp, ob), s in pos.items() if pp == p]
        ns = negs[p]
        thr = (sum(ps) * 1000 // len(ps) + sum(ns) * 1000 // len(ns)) // 2
        tp = sum(1 for s in ps if s * 1000 < thr)
        tn = sum(1 for s in ns if s * 1000 >= thr)
        want[p] = (
            len(ps), len(ns), thr, tp, tn,
            (tp + tn) * 1_000_000 // (len(ps) + len(ns)),
        )
    got = {
        r["pred"]: (
            int(r["n_pos"]), int(r["n_neg"]), int(r["thr_milli"]),
            int(r["tp"]), int(r["tn"]), int(r["acc_ppm"]),
        )
        for r in kgembed.q_triple_classification(spark, SF).collect()
    }
    assert got == want
    # sanity: the midpoint threshold can never misclassify EVERYTHING
    for p, (npos, nneg, thr, tp, tn, acc) in got.items():
        assert tp + tn > 0


def test_fd_candidates_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_id, user_id, event_type, props FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    cols = {"event_id": 0, "user_id": 1, "event_type": 2, "props": 3}
    got = {
        (r["lhs"], r["rhs"]): r
        for r in relops.events_fd_candidates(spark, SF).collect()
    }
    assert set(got) == set(relops.FD_CANDIDATES)
    for lhs, rhs in relops.FD_CANDIDATES:
        n_lhs = len({r[cols[lhs]] for r in rows})
        n_pairs = len({(r[cols[lhs]], r[cols[rhs]]) for r in rows})
        r = got[(lhs, rhs)]
        assert int(r["n_lhs"]) == n_lhs
        assert int(r["n_pairs"]) == n_pairs
        assert bool(r["fd_holds"]) is (n_lhs == n_pairs)
        assert int(r["violation_ppm"]) == (n_pairs - n_lhs) * 1_000_000 // n_lhs
    # event_id is the key: its FD must hold
    assert bool(got[("event_id", "user_id")]["fd_holds"]) is True


def test_column_entropy_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, user_id, CAST(round(value*100) AS BIGINT), props"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    got = {
        r["col_name"]: r
        for r in relops.events_column_entropy(spark, SF).collect()
    }
    assert set(got) == set(relops.ENTROPY_COLS)
    for idx, cname in enumerate(relops.ENTROPY_COLS):
        cnt = defaultdict(int)
        for r in rows:
            cnt[r[idx]] += 1
        n = sum(cnt.values())
        s = sum(math.floor(c * math.log(c) * 1e6 + 0.5) for c in cnt.values())
        ent = (math.floor(math.log(n) * 1e6 + 0.5) * n - s) // n
        mx = math.floor(math.log(len(cnt)) * 1e6 + 0.5)
        r = got[cname]
        assert int(r["n_rows"]) == n
        assert int(r["n_distinct"]) == len(cnt)
        assert int(r["entropy_micro_nats"]) == ent
        assert int(r["max_micro_nats"]) == mx
        assert int(r["norm_ppm"]) == ent * 1_000_000 // max(mx, 1)
        # 0 <= H <= ln(n_distinct) up to quantization
        assert -2 <= int(r["entropy_micro_nats"]) <= mx + 2


def test_selectivity_est_matches_bruteforce(spark):
    con = duckdb.connect()
    cents = [
        int(v)
        for (v,) in con.execute(
            "SELECT CAST(round(value*100) AS BIGINT) FROM "
            f"read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    con.close()
    lo, hi, n = min(cents), max(cents), len(cents)
    b = metrics.SEL_BUCKETS
    w = (hi - lo) // b + 1
    p1, p2 = lo + (hi - lo) // 4, lo + (hi - lo) // 2
    hist = defaultdict(int)
    for v in cents:
        hist[(v - lo) // w] += 1
    acc = 0
    for bk, c in hist.items():
        blo, bhi = lo + bk * w, lo + bk * w + w - 1
        acc += c * max(0, min(p2, bhi) - max(p1, blo) + 1)
    est = acc // w
    actual = sum(1 for v in cents if p1 <= v <= p2)
    r = metrics.selectivity_est(spark, SF).collect()[0]
    assert (int(r["n_rows"]), int(r["lo_cents"]), int(r["hi_cents"])) == (
        n, lo, hi,
    )
    assert (int(r["p1"]), int(r["p2"])) == (p1, p2)
    assert int(r["est_rows"]) == est
    assert int(r["actual_rows"]) == actual
    assert int(r["err_ppm"]) == abs(est - actual) * 1_000_000 // max(actual, 1)
