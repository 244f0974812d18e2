"""Round-3 robust-stats/richness batch: MAD outlier audit,
Wald-Wolfowitz runs test, Chao1/Good/Simpson richness scorecard —
independent brute-force Python twins at sf0.001."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

from sparkmedkg import statops, textstats

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, event_id, epoch_us(ts), value "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_mad_outliers_matches_bruteforce(spark):
    series = defaultdict(list)
    for et, eid, _, v in _events():
        series[et].append((int(round(v * statops.V_SCALE)), eid))
    want = {}
    for et, rows in series.items():
        n = len(rows)
        vs = [v for v, _ in sorted(rows)]
        med = vs[(n + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v, _ in rows)
        mad = devs[(n + 1) // 2 - 1]
        n_out = sum(
            1
            for v, _ in rows
            if 6745 * abs(v - med) > 10 * statops.MAD_Z_MILLI * mad
        )
        want[et] = (n, med, mad, n_out, (1_000_000 * n_out) // n)
    got = {
        r["event_type"]: (
            int(r["n"]), int(r["med_v"]), int(r["mad_v"]),
            int(r["n_outliers"]), int(r["outlier_ppm"]),
        )
        for r in statops.events_mad_outliers(spark, SF).collect()
    }
    assert got == want


def test_runs_test_matches_bruteforce(spark):
    series = defaultdict(list)
    for et, eid, ts_us, v in _events():
        series[et].append(
            (int(ts_us), eid, int(round(v * statops.V_SCALE)))
        )
    want = {}
    for et, rows in series.items():
        n = len(rows)
        med = sorted(v for _, _, v in rows)[(n + 1) // 2 - 1]
        rows.sort()
        signs = [1 if v > med else 0 for _, _, v in rows]
        n1, n2 = sum(signs), n - sum(signs)
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        two = 2 * n1 * n2
        var = (
            float(two) * float(two - n) / float(n) / float(n * (n - 1))
        )
        z = (
            round((runs - (1.0 + float(two) / n)) / math.sqrt(var), 6)
            if var > 0
            else None
        )
        want[et] = (n1, n2, runs, z)
    got = {
        r["event_type"]: (
            int(r["n_above"]), int(r["n_below"]), int(r["runs"]),
            None if r["z"] is None else float(r["z"]),
        )
        for r in statops.events_runs_test(spark, SF).collect()
    }
    assert set(got) == set(want)
    for et in want:
        assert got[et][:3] == want[et][:3]
        if want[et][3] is None:
            assert got[et][3] is None
        else:
            assert abs(got[et][3] - want[et][3]) <= 2e-6


def test_corpus_richness_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    tf = Counter()
    for (text,) in rows:
        toks = re.split(" +", text.lower())
        tf.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    n_types = len(tf)
    n_tokens = sum(tf.values())
    fof = Counter(tf.values())
    n1, n2 = fof.get(1, 0), fof.get(2, 0)
    s2 = sum(f * (f - 1) for f in tf.values())
    chao1 = n_types + (n1 * (n1 - 1)) // (2 * (n2 + 1))
    coverage = 1_000_000 - (1_000_000 * n1) // n_tokens
    simpson = (1_000_000 * s2) // (n_tokens * (n_tokens - 1))
    out = textstats.corpus_richness(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        int(r["n_types"]), int(r["n_tokens"]), int(r["n1"]), int(r["n2"]),
        int(r["chao1_types"]), int(r["coverage_ppm"]),
        int(r["simpson_ppm"]),
    ) == (n_types, n_tokens, n1, n2, chao1, coverage, simpson)
    # Chao1 never underestimates the observed count; coverage is a ppm
    assert chao1 >= n_types
    assert 0 <= coverage <= 1_000_000
