"""Round-3 masking/IVM batch: T5 span-corruption plan, backfill-parity
audit — independent brute-force Python twins at sf0.001."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import duckdb

from sparkmedkg import corpusops, relops

SF = "/root/testdata/sf0.001"


def test_span_corruption_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()

    def starts(doc_id, p):
        if p < 0:
            return False
        h = int(
            hashlib.md5(f"{doc_id}#{p}".encode()).hexdigest()[:15], 16
        )
        return h % corpusops.SPAN_MOD == 0

    want = {}
    for doc_id, text in rows:
        n = len(re.split(" +", text.lower()))
        m = [
            any(
                starts(doc_id, p - b)
                for b in range(corpusops.SPAN_LEN)
            )
            for p in range(n)
        ]
        n_masked = sum(m)
        n_sent = sum(
            1 for p in range(n) if m[p] and (p == 0 or not m[p - 1])
        )
        want[doc_id] = (
            n, n_masked, n_sent, (1_000_000 * n_masked) // n
        )
    got = {
        r["doc_id"]: (
            int(r["n_tokens"]), int(r["n_masked"]),
            int(r["n_sentinels"]), int(r["mask_ppm"]),
        )
        for r in corpusops.span_corruption_plan(spark, SF).collect()
    }
    assert got == want
    # corruption rate should sit near 1-(1-1/7)^3 ~ 37%
    tot = sum(v[0] for v in got.values())
    masked = sum(v[1] for v in got.values())
    assert 0.30 < masked / tot < 0.45


def test_backfill_parity_holds_and_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, epoch_us(ts), CAST(round(value*100) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    days = [int(ts) // relops.DAY_US for _, ts, _ in rows]
    lo, hi = min(days), max(days)
    cut = lo + (relops.BF_SPLIT_PPM * (hi - lo)) // 1_000_000
    per_type = defaultdict(lambda: [set(), set(), 0, 0])
    for (et, ts, cents), day in zip(rows, days):
        t = per_type[et]
        (t[0] if day <= cut else t[1]).add(day)
        t[2] += 1
        t[3] += int(cents)
    got = {
        r["event_type"]: r
        for r in relops.events_backfill_parity(spark, SF).collect()
    }
    assert set(got) == set(per_type)
    for et, (bdays, ddays, n, s) in per_type.items():
        r = got[et]
        assert int(r["base_days"]) == len(bdays)
        assert int(r["delta_days"]) == len(ddays)
        assert int(r["n_days"]) == len(bdays | ddays)
        assert int(r["merged_rows"]) == int(r["recomputed_rows"]) == n
        assert (
            int(r["merged_sum_cents"])
            == int(r["recomputed_sum_cents"])
            == s
        )
        assert bool(r["parity"]) is True
