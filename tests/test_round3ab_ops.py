"""Round-3 statistical-audit + curation batch: Benford, Pettitt, ACF,
Yule's K, c-TF-IDF cluster topics, MMR diversified top-k, sampler KL —
independent brute-force Python twins at sf0.001 (the DuckDB oracle parity
is covered separately by selfcheck / test_dtype_parity)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from sparkmedkg import curate, statops, textstats
from sparkmedkg.simsearch import KM_K, kmeans

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, event_id, epoch_us(ts) AS ts_us, value "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_benford_matches_bruteforce_and_ppm_sums(spark):
    by_type = defaultdict(Counter)
    for et, _, _, v in _events():
        cents = int(round(v * 100))
        if cents > 0:
            by_type[et][int(str(cents)[0])] += 1
    got = {
        (r["event_type"], r["digit"]): (
            r["n_obs"], r["freq_ppm"], r["benford_ppm"], r["excess_ppm"]
        )
        for r in statops.events_benford(spark, SF).collect()
    }
    want_keys = {
        (et, d) for et, c in by_type.items() for d in c
    }
    assert set(got) == want_keys
    for (et, d), (n_obs, freq, ben, exc) in got.items():
        n = sum(by_type[et].values())
        assert n_obs == by_type[et][d]
        assert freq == (1_000_000 * n_obs) // n
        assert ben == statops.BENFORD_PPM[d]
        assert exc == freq - ben
    # observed ppm per type sums to 1e6 within the floor-division slack
    for et, c in by_type.items():
        s = sum(got[(et, d)][1] for d in c)
        assert 1_000_000 - 9 <= s <= 1_000_000


def test_pettitt_matches_quadratic_sign_definition(spark):
    series = defaultdict(list)
    for et, eid, ts_us, v in _events():
        series[et].append((ts_us, eid, int(round(v * statops.V_SCALE))))
    want = {}
    for et, rows in series.items():
        rows.sort()
        xs = [v for _, _, v in rows]
        n = len(xs)
        best_k = -1
        u = 0
        for t in range(1, n):  # U_t for t = 1..n-1
            # U_t - U_{t-1} = sum_j sgn(x_t - x_j): the element entering
            # the left block scores against the whole series (diag = 0)
            xt = xs[t - 1]
            u += sum(1 if xt > xj else (-1 if xt < xj else 0) for xj in xs)
            best_k = max(best_k, abs(u))
        want[et] = (best_k, n)
    got = {
        r["event_type"]: (r["k_stat"], r["n_events"])
        for r in statops.events_pettitt(spark, SF).collect()
    }
    assert got == want


def test_pettitt_bruteforce_double_loop_small(spark):
    # direct O(n^2) definition on one series as a sanity anchor
    series = defaultdict(list)
    for et, eid, ts_us, v in _events():
        series[et].append((ts_us, eid, int(round(v * statops.V_SCALE))))
    et, rows = sorted(series.items())[0]
    rows.sort()
    xs = [v for _, _, v in rows]
    n = len(xs)
    ks = []
    for t in range(1, n):
        u = sum(
            1 if xs[i] > xs[j] else (-1 if xs[i] < xs[j] else 0)
            for i in range(t)
            for j in range(t, n)
        )
        ks.append(abs(u))
    want_k = max(ks)
    got = {
        r["event_type"]: r["k_stat"]
        for r in statops.events_pettitt(spark, SF).collect()
    }
    assert got[et] == want_k


def test_acf_matches_bruteforce_densified(spark):
    hours = defaultdict(Counter)
    for et, _, ts_us, _ in _events():
        hours[et][ts_us // statops.HOUR_US] += 1
    want = {}
    for et, c in hours.items():
        lo, hi = min(c), max(c)
        xs = [c.get(h, 0) for h in range(lo, hi + 1)]
        n = len(xs)
        s = sum(xs)
        dev = [n * x - s for x in xs]
        den = sum(d * d for d in dev)
        for k in range(1, statops.ACF_LAGS + 1):
            num = sum(dev[i] * dev[i + k] for i in range(n - k))
            want[(et, k)] = (round(num / den, 6), n)
    got = {
        (r["event_type"], r["lag"]): (r["acf"], r["n_hours"])
        for r in statops.events_acf(spark, SF).collect()
    }
    assert got == want
    # lag-0 normalization sanity: every |acf| <= 1 on a real series
    assert all(abs(a) <= 1.0 for a, _ in got.values())


def test_yule_k_matches_counter(spark):
    tf = Counter()
    for _, text, _ in _docs():
        tf.update(text.lower().split())
    n_tokens = sum(tf.values())
    s2 = sum(m * m for m in tf.values())
    row = textstats.yule_k(spark, SF).collect()[0]
    assert row["n_tokens"] == n_tokens
    assert row["n_types"] == len(tf)
    assert row["hapax_types"] == sum(1 for m in tf.values() if m == 1)
    assert row["dis_types"] == sum(1 for m in tf.values() if m == 2)
    assert row["yule_k"] == round(
        10_000.0 * (s2 - n_tokens) / (n_tokens * n_tokens), 6
    )


def test_cluster_topics_matches_ctfidf(spark):
    km = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(spark, SF).select("vec_id", "cluster").collect()
    }
    tf = defaultdict(Counter)
    for doc_id, text, _ in _docs():
        tf[km[doc_id]].update(text.lower().split())
    ft = Counter()
    for c in tf.values():
        ft.update(c)
    tot = sum(ft.values())
    want = {}
    for cl, c in tf.items():
        scored = sorted(
            (
                (
                    -c[t] * int(math.floor(
                        math.log(1.0 + tot / (KM_K * ft[t])) * 1_000_000 + 0.5
                    )),
                    t,
                )
                for t in c
            )
        )[: curate.TOPIC_TOP]
        for rnk, (negscore, t) in enumerate(scored, 1):
            want[(cl, rnk)] = (t, tf[cl][t], -negscore)
    got = {
        (r["cluster"], r["rnk"]): (r["term"], r["tf_ct"], r["score"])
        for r in curate.cluster_topics(spark, SF).collect()
    }
    assert got == want


def test_mmr_matches_greedy_bruteforce(spark):
    con = duckdb.connect()
    vecs = {
        vid: [int(math.floor(float(x) * 1000 + 0.5)) for x in emb]
        for vid, emb in con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        ).fetchall()
    }
    con.close()
    q0 = vecs[curate.MMR_QUERY_ID]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    rel = {v: dot(q, q0) for v, q in vecs.items() if v != curate.MMR_QUERY_ID}
    short = sorted(rel, key=lambda v: (-rel[v], v))[: curate.MMR_SHORT]
    picked, want = [], {}
    for rnk in range(1, curate.MMR_K + 1):
        best = None
        for v in short:
            if v in picked:
                continue
            ms = max((dot(vecs[v], vecs[p]) for p in picked), default=0)
            s10 = curate.MMR_LAM_REL * rel[v] - curate.MMR_LAM_DIV * ms
            if best is None or (s10, -v) > (best[0], -best[1]):
                best = (s10, v)
        picked.append(best[1])
        want[rnk] = (best[1], rel[best[1]], best[0])
    got = {
        r["rnk"]: (r["vec_id"], r["rel"], r["score10"])
        for r in curate.mmr_topk(spark, SF).collect()
    }
    assert got == want
    # diversification really fired: picks are not simply the top-5 by rel
    top5 = set(sorted(rel, key=lambda v: (-rel[v], v))[: curate.MMR_K])
    assert set(picked) != top5 or len(set(picked)) == curate.MMR_K


def test_sample_kl_matches_bruteforce(spark):
    from sparkmedkg.trainprep import (
        SAMPLE_DEFAULT_BP,
        SAMPLE_MOD,
        SAMPLE_RATES_BP,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, source FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    s_cnt, c_cnt = Counter(), Counter()
    for doc_id, lang, source in rows:
        c_cnt[source] += 1
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % SAMPLE_MOD
        if b < SAMPLE_RATES_BP.get(lang, SAMPLE_DEFAULT_BP):
            s_cnt[source] += 1
    ns, nc = sum(s_cnt.values()), sum(c_cnt.values())
    got = {r["source"]: r for r in curate.sample_kl(spark, SF).collect()}
    assert set(got) == set(s_cnt)
    for src, r in got.items():
        assert r["n_sample"] == s_cnt[src]
        assert r["n_corpus"] == c_cnt[src]
        assert r["p_ppm"] == (1_000_000 * s_cnt[src]) // ns
        assert r["q_ppm"] == (1_000_000 * c_cnt[src]) // nc
        p = s_cnt[src] / ns
        assert r["kl_term"] == round(
            p * math.log((s_cnt[src] * nc) / (ns * c_cnt[src])), 6
        )
