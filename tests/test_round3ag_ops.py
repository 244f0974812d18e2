"""Round-3 sampling/governance/dispersion batch: priority-sampling
audit, right-to-be-forgotten delete plan, Fano factor — independent
brute-force Python twins at sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from sparkmedkg import relops, statops, trainprep

SF = "/root/testdata/sf0.001"


def test_priority_sample_audit_matches_dlt_definition(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, length(text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    two32 = 1 << (4 * trainprep.PS_HASH_HEX)
    items = []
    for doc_id, w in rows:
        h = int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[
                : trainprep.PS_HASH_HEX
            ],
            16,
        ) + 1
        items.append((doc_id, int(w), h))
    total_w = sum(w for _, w, _ in items)
    ranked = sorted(items, key=lambda t: (-(t[1] / t[2]), t[0]))
    k = trainprep.PS_K
    sample, tau_row = ranked[:k], ranked[k]
    tau_w, tau_h = tau_row[1], tau_row[2]
    n_above = sum(1 for _, w, _ in sample if w * tau_h >= tau_w * two32)
    est_num = sum(
        w * tau_h if w * tau_h >= tau_w * two32 else tau_w * two32
        for _, w, _ in sample
    )
    est_w = est_num // tau_h
    err = (1_000_000 * abs(est_w - total_w)) // total_w
    out = trainprep.priority_sample_audit(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        int(r["n_docs"]), int(r["total_w"]), int(r["k"]), int(r["tau_w"]),
        int(r["tau_h"]), int(r["n_above"]), int(r["est_w"]),
        int(r["err_ppm"]),
    ) == (len(items), total_w, k, tau_w, tau_h, n_above, est_w, err)
    # DLT is unbiased: a 64-doc sample of 500 should land within ~30%
    assert err < 300_000


def test_delete_plan_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, epoch_us(ts), user_id "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for et, ts_us, uid in rows:
        day = int(ts_us) // relops.DAY_US
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
        a = agg[(et, day)]
        a[0] += 1
        if h % relops.DEL_MOD == 0:
            a[1] += 1
    want = {
        key: (n, d, (1_000_000 * d) // n, d > 0)
        for key, (n, d) in agg.items()
    }
    got = {
        (r["event_type"], int(r["day"])): (
            int(r["n_rows"]), int(r["n_del"]), int(r["del_ppm"]),
            bool(r["touched"]),
        )
        for r in relops.events_delete_plan(spark, SF).collect()
    }
    assert got == want
    # the amplification story must be visible: FAR more partitions
    # touched than the row-level delete fraction
    n_rows = sum(v[0] for v in got.values())
    n_del = sum(v[1] for v in got.values())
    touched = sum(1 for v in got.values() if v[3])
    assert 0 < n_del < n_rows // 5
    # rewrite amplification: the fraction of partitions touched exceeds
    # the fraction of rows deleted
    assert touched * n_rows > n_del * len(got)
    assert touched > 0


def test_fano_matches_moment_definition(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, epoch_us(ts) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    hours = defaultdict(Counter)
    for et, ts_us in rows:
        hours[et][int(ts_us) // statops.HOUR_US] += 1
    want = {}
    for et, c in hours.items():
        lo, hi = min(c), max(c)
        xs = [c.get(h, 0) for h in range(lo, hi + 1)]
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        fano = (1_000_000 * (n * q - s * s)) // (n * s)
        want[et] = (n, s, q, fano, fano > 1_000_000)
    got = {
        r["event_type"]: (
            int(r["n_hours"]), int(r["sum_c"]), int(r["sum_c2"]),
            int(r["fano_micro"]), bool(r["overdispersed"]),
        )
        for r in statops.events_fano(spark, SF).collect()
    }
    assert got == want
