"""Round-3 fourteenth-batch operators: lateness audit, Holt forecast,
Louvain move gains — brute-force Python twins at sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from sparkmedkg import graphalgo, relops

SF = "/root/testdata/sf0.001"


def _md5_60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_lateness_audit_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    arr = []
    for r in rows:
        sec = int(r["ts"].timestamp())
        delay = _md5_60(r["event_id"]) % relops.LATE_DELAY_S
        arr.append((sec, (sec + delay) // relops.LATE_WIN_S))
    wmax = {}
    for sec, w in arr:
        wmax[w] = max(wmax.get(w, sec), sec)
    ws = sorted(wmax)
    wm, run = {}, None
    for w in ws:
        if run is not None:
            wm[w] = run
        run = max(run, wmax[w]) if run is not None else wmax[w]
    want = Counter()
    for sec, w in arr:
        if w in wm:
            want[max(wm[w] - sec, 0) // relops.LATE_BUCKET_S] += 1
    got = {
        r["bucket_min"]: r["n"]
        for r in relops.events_lateness_audit(spark, SF).collect()
    }
    assert got == dict(want)
    assert len(got) > 1  # the delayed replay produces a real histogram


def test_holt_forecast_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = Counter((r["event_type"], str(r["ts"].date())) for r in rows)
    series = defaultdict(list)
    for (t, d), n in sorted(daily.items()):
        series[t].append(n)
    want = {}
    for t, vals in series.items():
        tail = vals[-relops.HOLT_T:]
        p = q = s = 0
        for y in tail:
            if s == 0:
                p, q, s = y, 0, 1
            else:
                p, q, s = (
                    2 * s * y + 2 * p + 2 * q,
                    s * y - p + 3 * q,
                    4 * s,
                )
        want[t] = (
            len(tail), round(p / s, 6), round(q / s, 6),
            round((p + q) / s, 6),
        )
    got = {
        r["event_type"]: (
            r["n_days_used"], r["level"], r["trend"], r["forecast"]
        )
        for r in relops.events_holt_forecast(spark, SF).collect()
    }
    assert got == want
    assert want  # non-empty


def test_louvain_gain_matches_bruteforce(spark):
    labels = {
        r["CUI"]: r["label"]
        for r in graphalgo.q_label_propagation(
            spark, SF, iters=graphalgo.LOUVAIN_LPA_ITERS
        ).collect()
    }
    edges = [
        (r["src"], r["dst"])
        for r in graphalgo._edges(
            spark, SF, graphalgo.PR_MIN_DOCS
        ).collect()
    ]
    deg = Counter(s for s, _ in edges)
    m = len(edges)
    tot = Counter()
    for n, k in deg.items():
        tot[labels[n]] += k
    d_ic = Counter()
    for s_, d_ in edges:
        d_ic[(s_, labels[d_])] += 1
    want = {}
    for i in deg:
        a = labels[i]
        d_a = d_ic.get((i, a), 0)
        best = None
        for (src, c), d in d_ic.items():
            if src != i or c == a:
                continue
            g = m * (d - d_a) - deg[i] * (tot[c] - tot[a] + deg[i])
            if best is None or g > best[1] or (g == best[1] and c < best[0]):
                best = (c, g)
        if best is not None:
            want[i] = (a, deg[i], best[0], best[1], best[1] > 0)
    got = {
        r["CUI"]: (
            r["comm"], r["k"], r["best_comm"], r["gain_scaled"], r["move"]
        )
        for r in graphalgo.q_louvain_gain(spark, SF).collect()
    }
    assert got == want
    assert {v[4] for v in got.values()} == {True, False}
