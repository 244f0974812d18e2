"""Round-3 seventeenth-batch operators: FastSS edit-distance-1 pairs,
event-type correlation, Gini concentration, doc novelty — brute-force
Python twins at sf0.001."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from sparkmedkg import er, relops, textstats
from sparkmedkg.corpusops import DECON_K

SF = "/root/testdata/sf0.001"


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[-1]


def test_fastss_pairs_exact_recall(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    sigs = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].lower())[: er.FASTSS_LEN]
        for r in docs
    }
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _lev(sigs[a], sigs[b])
            if d <= 1:
                want[(a, b)] = d
    got = {
        (r["a"], r["b"]): r["lev"]
        for r in er.fastss_pairs(spark, SF).collect()
    }
    # FastSS is EXACT for edit distance <= 1: no false negatives, and the
    # verify step removes every false positive.
    assert got == want
    assert len(got) > 0


def test_type_correlation_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = Counter((r["event_type"], r["ts"].date()) for r in rows)
    types = sorted({t for t, _ in daily})
    days = sorted({d for _, d in daily})
    series = {t: [daily.get((t, d), 0) for d in days] for t in types}
    want = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            x, y = series[ta], series[tb]
            n = len(days)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sx2 = sum(a * a for a in x)
            sy2 = sum(b * b for b in y)
            dx, dy = n * sx2 - sx * sx, n * sy2 - sy * sy
            r = (
                round((n * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy)), 6)
                if dx > 0 and dy > 0
                else None
            )
            want[(ta, tb)] = (n, r)
    got = {
        (r["ta"], r["tb"]): (r["n_days"], r["r"])
        for r in relops.events_type_correlation(spark, SF).collect()
    }
    assert got == want


def test_gini_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    counts = Counter(r["user_id"] for r in rows)
    xs = sorted(counts.values())
    n, sx = len(xs), sum(xs)
    six = sum(i * x for i, x in enumerate(xs, 1))
    want = round(2.0 * six / (n * sx) - (n + 1) / n, 6)
    row = relops.events_gini(spark, SF).collect()[0]
    assert row["n_users"] == n
    assert row["total_events"] == sx
    assert row["gini"] == want
    assert 0.0 <= row["gini"] < 1.0


def test_doc_novelty_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    doc_sh = {}
    for r in docs:
        ws = re.split(" +", r["text"])
        n = max(len(ws) - DECON_K + 1, 1)
        doc_sh[r["doc_id"]] = {
            " ".join(ws[i : i + DECON_K]) for i in range(n)
        }
    df = Counter()
    for sh in doc_sh.values():
        df.update(sh)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"], r["novelty_ppm"])
        for r in textstats.doc_novelty(spark, SF).collect()
    }
    for did, sh in doc_sh.items():
        n = len(sh)
        shared = sum(1 for s in sh if df[s] >= 2)
        assert got[did] == (n, shared, (n - shared) * 1_000_000 // n)
    assert len(got) == len(doc_sh)
