"""Round-3 additions: personalized PageRank, anchor-term aggregation,
key-skew report, TPC-H Q3.  Oracle-value parity runs in the driver gate;
these pin algorithmic invariants and brute-force equality.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from sparkmedkg import relations, relops, webgraph

SF = "/root/testdata/sf0.001"


def test_ppr_mass_conserved_and_seed_dominates(spark):
    rows = relations.q_ppr(spark, SF).collect()
    # restart mass alpha + propagated mass (1-alpha) is conserved every
    # round on a symmetric graph with no dangling nodes
    assert sum(r["ppr"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    seed = min(r["CUI"] for r in rows)
    by = {r["CUI"]: r["ppr"] for r in rows}
    assert by[seed] == max(by.values())
    assert all(v >= 0 for v in by.values())


def test_ppr_differs_from_global_pagerank(spark):
    ppr = {r["CUI"]: r["ppr"] for r in relations.q_ppr(spark, SF).collect()}
    pr = {
        r["CUI"]: r["pagerank"]
        for r in relations.q_pagerank(spark, SF).collect()
    }
    assert set(ppr) == set(pr)
    # personalization reorders the ranking (seed-proximal nodes rise)
    rank_ppr = sorted(ppr, key=lambda c: -ppr[c])
    rank_pr = sorted(pr, key=lambda c: -pr[c])
    assert rank_ppr != rank_pr


def test_anchor_terms_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    counts = defaultdict(int)
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t][: webgraph.MAX_ANCHORS]
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            counts[(f"h{h % webgraph.N_DST_HOSTS}.example", t)] += 1
    per_host = defaultdict(list)
    for (host, term), n in counts.items():
        per_host[host].append((-n, term))
    want = set()
    for host, lst in per_host.items():
        for rank, (negn, term) in enumerate(sorted(lst)[: webgraph.ANCHOR_TOPK], 1):
            want.add((host, term, -negn, rank))
    got = {
        (r["dst_host"], r["term"], r["n"], r["rank"])
        for r in webgraph.anchor_terms(spark, SF).collect()
    }
    assert got == want


def test_key_skew_report_invariants(spark):
    rows = sorted(
        relops.events_key_skew(spark, SF).collect(), key=lambda r: r["rank"]
    )
    assert rows
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n_events"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(r["pct_of_total"] for r in rows) <= 100.0 + 1e-6
    assert all(r["hot_over_median"] >= 1.0 for r in rows if r["rank"] == 1)


def test_tpch_q3_filters_and_order(spark):
    import datetime

    rows = relops.tpch_top_unshipped(spark, SF).collect()
    assert 0 < len(rows) <= relops.Q3_TOPK
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    cutoff_us = int(
        datetime.datetime.fromisoformat(relops.Q3_CUTOFF).timestamp() * 1_000_000
    )
    assert all(r["o_orderdate_us"] < cutoff_us for r in rows)


def test_tpch_q13_includes_zero_order_customers(spark):
    rows = relops.tpch_order_count_dist(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    n_orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .count()
    )
    assert sum(r["custdist"] for r in rows) == n_cust
    assert sum(r["c_count"] * r["custdist"] for r in rows) == n_orders
    with_orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    zero = {r["c_count"]: r["custdist"] for r in rows}.get(0, 0)
    assert zero == n_cust - with_orders


def test_quality_deciles_partition_the_corpus(spark):
    from sparkmedkg import textstats

    rows = sorted(
        textstats.quality_deciles(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(1 <= r["decile"] <= 10 for r in rows)
    for r in rows:
        assert r["min_score"] <= r["avg_score"] <= r["max_score"]
    # score ranges are non-overlapping and ordered across deciles
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_score"] <= hi["min_score"]


def test_funnel_matches_bruteforce(spark):
    from collections import defaultdict

    from sparkmedkg.relops import FUNNEL_STEPS

    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_type"]))
    n = dict.fromkeys(FUNNEL_STEPS, 0)
    for rows in by_user.values():
        t1 = next((t for t, e in rows if e == FUNNEL_STEPS[0]), None)
        if t1 is None:
            continue
        n[FUNNEL_STEPS[0]] += 1
        t2 = next(
            (t for t, e in rows if e == FUNNEL_STEPS[1] and t > t1), None
        )
        if t2 is None:
            continue
        n[FUNNEL_STEPS[1]] += 1
        t3 = next(
            (t for t, e in rows if e == FUNNEL_STEPS[2] and t > t2), None
        )
        if t3 is not None:
            n[FUNNEL_STEPS[2]] += 1
    got = {
        r["stage"]: r["n_users"]
        for r in relops.events_funnel(spark, SF).collect()
    }
    assert got == n
    assert got[FUNNEL_STEPS[0]] >= got[FUNNEL_STEPS[1]] >= got[FUNNEL_STEPS[2]]


def test_cube_lattice_consistency(spark):
    rows = relops.events_cube(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    # grand total row (gid=3) equals the table count; each marginal layer
    # also sums to the table count
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["n_events"] == total
    for gid in (0, 1, 2):
        assert sum(r["n_events"] for r in rows if r["gid"] == gid) == total


def test_lm_perplexity_matches_bruteforce(spark):
    import math as _m
    from collections import Counter

    from sparkmedkg import textstats

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    cnt = Counter()
    for r in docs:
        cnt.update(r["text"].split(" "))
    total, v, k = sum(cnt.values()), len(cnt), textstats.PPL_SMOOTH
    got = {
        r["doc_id"]: r["ppl"]
        for r in textstats.lm_perplexity(spark, SF).collect()
    }
    for r in docs[:100]:
        toks = r["text"].split(" ")
        s = sum(_m.log((cnt[t] + k) / (total + k * v)) for t in toks)
        want = round(_m.exp(-s / len(toks)), 4)
        assert abs(got[r["doc_id"]] - want) < 2e-3, (r["doc_id"], got[r["doc_id"]], want)


def test_retention_triangle_invariants(spark):
    rows = relops.events_retention(spark, SF).collect()
    assert rows
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    # offset-0 across cohorts counts every user exactly once
    assert sum(r["n_users"] for r in rows if r["week_offset"] == 0) == n_users
    assert all(r["week_offset"] >= 0 for r in rows)
    # within a cohort no later week exceeds the cohort's own size
    from collections import defaultdict

    by_cohort = defaultdict(dict)
    for r in rows:
        by_cohort[r["cohort_wk"]][r["week_offset"]] = r["n_users"]
    for offs in by_cohort.values():
        for off, n in offs.items():
            assert n <= offs[0]


def test_phash_buckets_bruteforce_and_grouping(spark):
    from collections import Counter

    from sparkmedkg import multimodal

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    want_hash = {
        r["doc_id"]: multimodal._phash_bits(r["text"].encode())
        for r in docs
    }
    sizes = Counter(want_hash.values())
    got = {
        r["doc_id"]: (r["phash"], r["n_bucket"])
        for r in multimodal.phash_buckets(spark, SF).collect()
    }
    assert set(got) == set(want_hash)
    for d, (ph, nb) in got.items():
        assert ph == want_hash[d]
        assert nb == sizes[ph]
    # identical payloads share a bucket (the fixture has exact dups)
    assert any(nb > 1 for _, nb in got.values())


def test_promo_revenue_share_bounds(spark):
    r = relops.tpch_promo_revenue(spark, SF).collect()[0]
    assert 0.0 <= r["promo_revenue_pct"] <= 100.0
    assert 0 < r["promo_rev"] < r["total_rev"]


def test_large_orders_having_gate(spark):
    rows = relops.tpch_large_orders(spark, SF).collect()
    assert rows
    assert all(r["sum_qty"] > relops.Q18_QTY for r in rows)
    # every qualifying aggregate key appears exactly once after hydration
    keys = [r["o_orderkey"] for r in rows]
    assert len(keys) == len(set(keys))


def test_zscore_matches_bruteforce(spark):
    import statistics
    from collections import defaultdict

    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    hist = defaultdict(list)
    want = {}
    for r in ev:
        h = hist[r["user_id"]]
        if len(h) >= relops.ZSCORE_MIN_N:
            mu = sum(h) / len(h)
            sd = statistics.pstdev(h)
            if sd > 0:
                z = (r["value"] - mu) / sd
                if abs(z) > relops.ZSCORE_TAU:
                    want[r["event_id"]] = round(z, 4)
        h.append(r["value"])
    got = {
        r["event_id"]: r["z"]
        for r in relops.events_zscore(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-3


def test_supplier_revenue_rollup_consistency(spark):
    rows = relops.tpch_supplier_revenue(spark, SF).collect()
    assert rows
    # nation totals sum to the overall joined-lineitem revenue
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    total = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .selectExpr(
            "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) "
            "AS DECIMAL(18,6))) AS DOUBLE) AS t"
        )
        .collect()[0]["t"]
    )
    assert sum(r["nation_revenue"] for r in rows) == pytest.approx(
        total, rel=1e-9
    )
    for r in rows:
        assert r["top_supplier_rev"] <= r["nation_revenue"] + 1e-9
        assert r["top_supplier"]
