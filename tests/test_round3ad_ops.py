"""Round-3 trend/two-sample/sketch batch: Theil-Sen slope, Mann-Whitney
U, Kolmogorov-Smirnov vs pooled, Good-Turing freq-of-freqs, AMS F2
scorecard — independent brute-force Python twins at sf0.001 (DuckDB
oracle parity covered by selfcheck / test_dtype_parity)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb

from sparkmedkg import metrics, statops, textstats

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, event_id, epoch_us(ts) AS ts_us, value "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def _tok_counts():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    tf = Counter()
    for (text,) in rows:
        tf.update(re.split(" +", text.lower()))
    return tf


def _hourly():
    series = defaultdict(Counter)
    for et, _, ts_us, _ in _events():
        series[et][int(ts_us) // statops.HOUR_US] += 1
    out = {}
    for et, c in series.items():
        lo, hi = min(c), max(c)
        out[et] = [c.get(h, 0) for h in range(lo, hi + 1)]
    return out


def _tdiv(x: int, y: int) -> int:
    """Spark's div: truncate toward zero."""
    return x // y if (x >= 0) == (y > 0) else -(abs(x) // abs(y))


def test_theil_sen_matches_quadratic_definition(spark):
    want = {}
    for et, xs in _hourly().items():
        n = len(xs)
        slopes = sorted(
            _tdiv(1_000_000 * (xs[j] - xs[i]), j - i)
            for i in range(n)
            for j in range(i + 1, n)
        )
        m = len(slopes)
        lo = slopes[(m + 1) // 2 - 1]
        hi = slopes[m // 2]
        want[et] = (n, m, lo, hi, _tdiv(lo + hi, 2))
    got = {
        r["event_type"]: (
            int(r["n_hours"]), int(r["n_pairs"]), int(r["sen_lo_micro"]),
            int(r["sen_hi_micro"]), int(r["sen_micro"]),
        )
        for r in statops.events_theil_sen(spark, SF).collect()
    }
    assert got == want


def test_mann_whitney_matches_rank_definition(spark):
    series = defaultdict(list)
    for et, eid, ts_us, v in _events():
        series[et].append((int(ts_us), eid, int(round(v * statops.V_SCALE))))
    want = {}
    for et, rows in series.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        n = len(vals)
        na = n // 2
        svals = sorted(vals)
        first = {}
        for idx, v in enumerate(svals):
            first.setdefault(v, idx + 1)
        ties = Counter(svals)
        r2 = {v: 2 * first[v] + ties[v] - 1 for v in ties}
        r2_a = sum(r2[v] for v in vals[:na])
        u2 = r2_a - na * (na + 1)
        nb = n - na
        tie_t = sum(t ** 3 - t for t in ties.values())
        var = (na * nb) / 12.0 * ((n + 1) - tie_t / (n * (n - 1)))
        if var > 0:
            cc = 1.0 if u2 > na * nb else (-1.0 if u2 < na * nb else 0.0)
            z = (float(u2) - float(na * nb) - cc) / (2.0 * math.sqrt(var))
        else:
            z = None
        want[et] = (na, nb, u2, tie_t, z)
    got = {
        r["event_type"]: (
            int(r["n_a"]), int(r["n_b"]), int(r["u2_a"]), int(r["tie_t"]),
            None if r["z"] is None else float(r["z"]),
        )
        for r in statops.events_mann_whitney(spark, SF).collect()
    }
    assert set(got) == set(want)
    for et in want:
        assert got[et][:4] == want[et][:4]
        if want[et][4] is None:
            assert got[et][4] is None
        else:
            assert abs(got[et][4] - want[et][4]) <= 2e-6


def test_ks_test_matches_ecdf_definition(spark):
    by_type = defaultdict(Counter)
    for et, _, _, v in _events():
        by_type[et][int(round(v * statops.V_SCALE))] += 1
    pooled = Counter()
    for c in by_type.values():
        pooled.update(c)
    n_all = sum(pooled.values())
    spine = sorted(pooled)
    want = {}
    for et, c in by_type.items():
        n_t = sum(c.values())
        cum_t = cum_all = 0
        d_num = 0
        for v in spine:
            cum_t += c.get(v, 0)
            cum_all += pooled[v]
            d_num = max(d_num, abs(cum_t * n_all - cum_all * n_t))
        d_ppm = (1_000_000 * d_num) // (n_t * n_all)
        kn = math.sqrt(n_t * n_all / (n_t + n_all)) * (
            d_num / (n_t * n_all)
        )
        want[et] = (n_t, n_all, d_num, d_ppm, kn)
    got = {
        r["event_type"]: (
            int(r["n_t"]), int(r["n_all"]), int(r["d_num"]),
            int(r["d_ppm"]), float(r["kn"]),
        )
        for r in statops.events_ks_test(spark, SF).collect()
    }
    assert set(got) == set(want)
    for et in want:
        assert got[et][:4] == want[et][:4]
        assert abs(got[et][4] - want[et][4]) <= 2e-6
    # D against the pooled (superset) sample is a proper distance in
    # [0, 1): ppm form must sit inside the unit interval
    assert all(0 <= g[3] < 1_000_000 for g in got.values())


def test_good_turing_matches_freq_of_freqs(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    tf = Counter()
    for (text,) in rows:
        toks = re.split(" +", text.lower())
        tf.update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    fof = Counter(tf.values())
    n_tokens = sum(tf.values())
    n1 = fof.get(1, 0)
    want = {}
    for r in range(1, textstats.GT_MAX_R + 1):
        if r not in fof:
            continue
        n_r, n_r1 = fof[r], fof.get(r + 1, 0)
        r_star = (
            (1_000_000 * (r + 1) * n_r1) // n_r if n_r1 > 0 else None
        )
        want[r] = (n_r, n_r1, r_star, (1_000_000 * n1) // n_tokens)
    got = {
        int(r["r"]): (
            int(r["n_r"]), int(r["n_r1"]),
            None if r["r_star_micro"] is None else int(r["r_star_micro"]),
            int(r["unseen_ppm"]),
        )
        for r in textstats.good_turing(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0


def test_ams_f2_matches_sketch_definition(spark):
    tf = _tok_counts()
    f2_exact = sum(f * f for f in tf.values())
    ests = []
    for j in range(1, metrics.AMS_K + 1):
        z = 0
        for tok, f in tf.items():
            h = int(hashlib.md5(f"{tok}|{j}".encode()).hexdigest()[:15], 16)
            z += f if h % 2 == 0 else -f
        ests.append(z * z)
    ests.sort()
    f2_est = (ests[metrics.AMS_K // 2 - 1] + ests[metrics.AMS_K // 2]) // 2
    err_ppm = (1_000_000 * abs(f2_est - f2_exact)) // f2_exact
    rows = metrics.ams_f2(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        int(r["n_types"]), int(r["f2_exact"]), int(r["f2_est"]),
        int(r["err_ppm"]),
    ) == (len(tf), f2_exact, f2_est, err_ppm)
    # a 16-estimator median should land well inside an order of magnitude
    assert int(r["err_ppm"]) < 1_000_000
