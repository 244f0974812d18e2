"""Round-3 additions, third batch: TransE ranking, predicate signatures,
N-Triples export, k-truss peel, TPC-H Q2/Q21 shapes, compaction planning,
crawl-frontier scheduling.  Oracle-value parity runs in the driver gate;
these pin brute-force equality and algorithmic invariants."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from sparkmedkg import corpusops, graphalgo, kgembed, relations, relops, webclean

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# TransE ranking
# ---------------------------------------------------------------------------

def _emb(x: str, kind: str, i: int) -> int:
    h = hashlib.md5(f"{x}|{kind}|{i}".encode()).hexdigest()
    return int(h[:15], 16) % kgembed.EMB_MOD


def _score2(s: str, p: str, o: str) -> int:
    return sum(
        (_emb(s, "e", i) + _emb(p, "r", i) - _emb(o, "e", i)) ** 2
        for i in range(kgembed.EMB_DIM)
    )


def test_transe_rank_scores_and_bounds(spark):
    rows = kgembed.q_transe_rank(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["pos_score2"] == _score2(r["subj_cui"], r["pred"], r["obj_cui"])
        assert 1 <= r["pos_rank"] <= r["n_neg"] + 1
        assert 1 <= r["n_neg"] <= relations.NEG_K


def test_transe_rank_against_bruteforce_negatives(spark):
    neg = relations.q_negative_triples(spark, SF).collect()
    by_pos = defaultdict(list)
    for r in neg:
        by_pos[(r["subj_cui"], r["pred"], r["obj_cui"])].append(r["neg_obj_cui"])
    got = {
        (r["subj_cui"], r["pred"], r["obj_cui"]): (r["n_neg"], r["pos_rank"])
        for r in kgembed.q_transe_rank(spark, SF).collect()
    }
    assert set(got) == set(by_pos)
    for key, negs in by_pos.items():
        s, p, o = key
        pos = _score2(s, p, o)
        rank = 1 + sum(1 for n in negs if _score2(s, p, n) < pos)
        assert got[key] == (len(negs), rank)


# ---------------------------------------------------------------------------
# Predicate signatures
# ---------------------------------------------------------------------------

def test_pred_signature_topk_ordering(spark):
    rel = relations.q_relations(spark, SF).collect()
    mass = defaultdict(int)
    for r in rel:
        mass[(r["pred"], "subj", r["subj_cui"])] += r["n_occ"]
        mass[(r["pred"], "obj", r["obj_cui"])] += r["n_occ"]
    want = defaultdict(list)
    for (pred, side, cui), m in mass.items():
        want[(pred, side)].append((-m, cui))
    expect = set()
    for (pred, side), lst in want.items():
        for rk, (negm, cui) in enumerate(sorted(lst)[: kgembed.SIG_TOPK], 1):
            expect.add((pred, side, cui, -negm, rk))
    got = {
        (r["pred"], r["side"], r["cui"], r["occ_sum"], r["rk"])
        for r in kgembed.q_pred_signature(spark, SF).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# N-Triples export
# ---------------------------------------------------------------------------

def test_export_ntriples_shape(spark):
    rel = relations.q_relations(spark, SF).collect()
    rows = kgembed.q_export_ntriples(spark, SF).collect()
    assert len(rows) == 2 * len(rel)
    by_stmt = defaultdict(list)
    for r in rows:
        assert r["line"].endswith(" .")
        assert r["n_chars"] == len(r["line"])
        by_stmt[r["stmt_id"]].append(r["line"])
    for r in rel:
        stmt = f"{r['subj_cui']}|{r['pred']}|{r['obj_cui']}"
        lines = by_stmt[stmt]
        assert len(lines) == 2
        edge = (
            f"<urn:cui:{r['subj_cui']}> <urn:kg:{r['pred']}> "
            f"<urn:cui:{r['obj_cui']}> ."
        )
        assert edge in lines
        prov = [l for l in lines if l != edge][0]
        assert f'"{r["n_docs"]}"^^<{kgembed.XSD_INT}>' in prov


# ---------------------------------------------------------------------------
# k-truss peel
# ---------------------------------------------------------------------------

def test_truss_edges_matches_bruteforce_peel(spark):
    sym = relations._cooccur_edges(spark, SF, graphalgo.TRUSS_MIN_DOCS).collect()
    edges = {(min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in sym}

    def supports(es):
        adj = defaultdict(set)
        for u, v in es:
            adj[u].add(v)
            adj[v].add(u)
        return {(u, v): len(adj[u] & adj[v]) for (u, v) in es}

    t = graphalgo.TRUSS_SUPPORT
    s1 = supports(edges)
    e1 = {e for e in edges if s1[e] >= t}
    s2 = supports(e1)
    want = {e: s2[e] for e in e1 if s2[e] >= t}
    got = {
        (r["src"], r["dst"]): r["support"]
        for r in graphalgo.q_truss_edges(spark, SF).collect()
    }
    assert got == want
    assert want  # non-degenerate on the fixture graph


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q21 shapes
# ---------------------------------------------------------------------------

def test_min_cost_supplier_bruteforce(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    supp = {r["s_suppkey"]: r for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()}
    nat = {r["n_nationkey"]: r for r in spark.read.parquet(f"{SF}/nation.parquet").collect()}
    reg = {r["r_regionkey"]: r["r_name"] for r in spark.read.parquet(f"{SF}/region.parquet").collect()}
    part = {
        r["p_partkey"]: r["p_name"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
        if r["p_type"] == relops.MINCOST_PTYPE
    }
    eur = {
        k: v["s_name"]
        for k, v in supp.items()
        if reg[nat[v["s_nationkey"]]["n_regionkey"]] == relops.MINCOST_REGION
    }
    by_part = defaultdict(list)
    for r in li:
        if r["l_suppkey"] in eur and r["l_partkey"] in part:
            by_part[r["l_partkey"]].append(r)
    want = set()
    for pk, rows in by_part.items():
        mn = min(r["l_extendedprice"] for r in rows)
        for r in rows:
            if r["l_extendedprice"] == mn:
                want.add((pk, part[pk], eur[r["l_suppkey"]], mn))
    got = {
        (r["p_partkey"], r["p_name"], r["s_name"], r["min_price"])
        for r in relops.tpch_min_cost_supplier(spark, SF).collect()
    }
    assert got == want and want


def test_waiting_orders_bruteforce(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    odate = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    sname = {
        r["s_suppkey"]: r["s_name"]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    per = defaultdict(lambda: (set(), set()))
    for r in li:
        supp_set, late_set = per[r["l_orderkey"]]
        supp_set.add(r["l_suppkey"])
        if r["l_shipdate"] > odate[r["l_orderkey"]] + timedelta(
            days=relops.WAIT_LATE_DAYS
        ):
            late_set.add(r["l_suppkey"])
    numwait = defaultdict(int)
    for supp_set, late_set in per.values():
        if len(supp_set) >= 2 and len(late_set) == 1:
            numwait[sname[next(iter(late_set))]] += 1
    want = sorted(
        ((n, s) for s, n in numwait.items()), key=lambda t: (-t[0], t[1])
    )[: relops.WAIT_TOPK]
    got = [
        (r["numwait"], r["s_name"])
        for r in relops.tpch_waiting_orders(spark, SF).collect()
    ]
    assert got == want and want


# ---------------------------------------------------------------------------
# Compaction plan
# ---------------------------------------------------------------------------

def test_compaction_plan_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    groups = defaultdict(list)
    for r in docs:
        groups[(r["lang"], r["doc_id"] % corpusops.COMPACT_SHARDS)].append(r)
    want = defaultdict(lambda: [0, 0, None, None])
    for (lang, shard), rows in groups.items():
        cum = 0
        for r in sorted(rows, key=lambda x: x["doc_id"]):
            bucket = cum // corpusops.COMPACT_TARGET_BYTES
            cum += r["n_chars"]
            acc = want[(lang, shard, bucket)]
            acc[0] += 1
            acc[1] += r["n_chars"]
            acc[2] = r["doc_id"] if acc[2] is None else min(acc[2], r["doc_id"])
            acc[3] = r["doc_id"] if acc[3] is None else max(acc[3], r["doc_id"])
    got = {
        (r["lang"], r["shard"], r["bucket"]): [
            r["n_docs"], r["total_bytes"], r["min_doc"], r["max_doc"]
        ]
        for r in corpusops.compaction_plan(spark, SF).collect()
    }
    assert got == dict(want)
    # no bucket (except possibly the last per group) ends undersized with
    # a successor: buckets are contiguous from 0
    for (lang, shard, bucket) in got:
        if bucket > 0:
            assert (lang, shard, bucket - 1) in got


# ---------------------------------------------------------------------------
# Crawl frontier
# ---------------------------------------------------------------------------

def test_crawl_frontier_schedule(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    hosts = sorted({r["source"] for r in docs})
    hidx = {h: i + 1 for i, h in enumerate(hosts)}
    by_host = defaultdict(list)
    for r in docs:
        by_host[r["source"]].append(r)
    want = set()
    for h, rows in by_host.items():
        ordered = sorted(rows, key=lambda x: (-x["n_chars"], x["doc_id"]))
        for wave, r in enumerate(ordered[: webclean.FRONTIER_PER_HOST], 1):
            slot = (wave - 1) * len(hosts) + hidx[h] - 1
            want.add((h, r["doc_id"], r["n_chars"], wave, slot))
    got = {
        (r["host"], r["doc_id"], r["n_chars"], r["wave"], r["fetch_slot"])
        for r in webclean.crawl_frontier(spark, SF).collect()
    }
    assert got == want
    # politeness: within a wave, each host appears exactly once
    slots = sorted(r[4] for r in got)
    assert len(slots) == len(set(slots))


# ---------------------------------------------------------------------------
# Markov transitions / bigram LM / KMV intersection (batch 4)
# ---------------------------------------------------------------------------

def test_markov_transitions_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    counts = defaultdict(int)
    for rows in by_user.values():
        ordered = sorted(rows, key=lambda x: (x["ts"], x["event_id"]))
        for prev, cur in zip(ordered, ordered[1:]):
            counts[(prev["event_type"], cur["event_type"])] += 1
    totals = defaultdict(int)
    for (p, _), n in counts.items():
        totals[p] += n
    want = {
        (p, c, n, n * relops.MKV_PPM // totals[p])
        for (p, c), n in counts.items()
    }
    got = {
        (r["prev_type"], r["event_type"], r["n"], r["p_ppm"])
        for r in relops.events_markov_transitions(spark, SF).collect()
    }
    assert got == want and want


def test_bigram_lm_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts = defaultdict(int)
    for r in docs:
        ws = r["text"].lower().split(" ")
        for a, b in zip(ws, ws[1:]):
            counts[(a, b)] += 1
    totals = defaultdict(int)
    vocab = set()
    for (a, b), n in counts.items():
        totals[a] += n
        vocab.add(b)
    v = len(vocab)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    want = {
        (a, b, n, (n + 1) * corpusops.LM_PPM // (totals[a] + v))
        for (a, b), n in ranked[: corpusops.LM_TOPK]
    }
    got = {
        (r["w1"], r["w2"], r["n"], r["p_ppm"])
        for r in corpusops.bigram_lm(spark, SF).collect()
    }
    assert got == want and len(got) == corpusops.LM_TOPK


def test_kmv_intersect_bruteforce(spark):
    import itertools

    from sparkmedkg import webgraph

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("source").isin(list(webgraph.KMVI_SOURCES)))
        .collect()
    )
    k = webgraph.KMVI_K

    def shingles(text):
        ws = text.split()
        if len(ws) <= 3:
            return {" ".join(ws[:3])}
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sets = defaultdict(set)
    for r in docs:
        sets[r["source"]] |= {h60(s) for s in shingles(r["text"])}
    want = {}
    for a, b in itertools.combinations(webgraph.KMVI_SOURCES, 2):
        union = sorted(sets[a] | sets[b])
        inter = sets[a] & sets[b]
        if len(union) < k:
            est = round(float(len(inter)), 2)
        else:
            sk = union[:k]
            ints = sum(1 for h in sk if h in inter)
            est = round((ints / float(k)) * (webgraph._KMVI_C / sk[-1]), 2)
        want[(a, b)] = (len(inter), est)
    got = {
        (r["src_a"], r["src_b"]): (r["n_exact"], r["kmv_est"])
        for r in webgraph.kmv_intersect(spark, SF).collect()
    }
    assert got == want and len(got) == 10


# ---------------------------------------------------------------------------
# SimHash pairs / LCA / Q17 (batch 5)
# ---------------------------------------------------------------------------

def test_simhash_pairs_bruteforce(spark):
    from sparkmedkg import dedup

    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(spark, SF).collect()}
    hexv = {c: i for i, c in enumerate("0123456789abcdef")}
    pop = [bin(i).count("1") for i in range(16)]

    def ham(x, y):
        return sum(pop[hexv[a] ^ hexv[b]] for a, b in zip(x, y))

    # brute force: all pairs with hamming <= max, minus hot-band-only pairs
    bands = defaultdict(list)
    for d, s in sigs.items():
        for i in range(dedup.SIMHAM_BANDS):
            bands[(i, s[4 * i:4 * i + 4])].append(d)
    kept = {k: v for k, v in bands.items() if len(v) <= dedup.SIMHAM_MAX_DF}
    cand = set()
    for docs in kept.values():
        docs = sorted(docs)
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                cand.add((a, b))
    want = {
        (a, b): ham(sigs[a], sigs[b])
        for (a, b) in cand
        if ham(sigs[a], sigs[b]) <= dedup.SIMHAM_MAX
    }
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_pairs(spark, SF).collect()
    }
    assert got == want and want


def test_simhash_banding_recall_guarantee(spark):
    # pigeonhole: any pair at hamming <= 3 over 4x16-bit bands shares a
    # band; with no hot-band drops the banded pairs == all close pairs
    from sparkmedkg import dedup

    sigs = sorted(dedup.simhash(spark, SF).collect(), key=lambda r: r["doc_id"])
    hexv = {c: i for i, c in enumerate("0123456789abcdef")}
    pop = [bin(i).count("1") for i in range(16)]
    got = {
        (r["a"], r["b"])
        for r in dedup.simhash_pairs(spark, SF, max_df=10**9).collect()
    }
    for i, ra in enumerate(sigs):
        for rb in sigs[i + 1:]:
            d = sum(
                pop[hexv[x] ^ hexv[y]]
                for x, y in zip(ra["simhash"], rb["simhash"])
            )
            if d <= dedup.SIMHAM_MAX:
                assert (ra["doc_id"], rb["doc_id"]) in got


def test_lca_pairs_bruteforce(spark):
    from sparkmedkg import hierarchy

    kids = defaultdict(set)
    for c, p in hierarchy.WEB_HIERARCHY:
        kids[c].add(p)

    def ancs(c):
        out = {c: 0}
        frontier = {c: 0}
        while frontier:
            nxt = {}
            for node, d in frontier.items():
                for p in kids.get(node, ()):
                    if p not in out or out[p] > d + 1:
                        out[p] = d + 1
                        nxt[p] = d + 1
            frontier = nxt
        return out

    leaves = sorted({c for c, _ in hierarchy.WEB_HIERARCHY})
    want = {}
    for i, a in enumerate(leaves):
        for b in leaves[i + 1:]:
            aa, ab = ancs(a), ancs(b)
            common = set(aa) & set(ab)
            if common:
                lca = min(common, key=lambda c: (aa[c] + ab[c], c))
                want[(a, b)] = (lca, aa[lca], ab[lca])
    got = {
        (r["a"], r["b"]): (r["lca"], r["da"], r["db"])
        for r in hierarchy.lca_pairs(spark).collect()
    }
    assert got == want and want


def test_small_qty_revenue_bruteforce(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
        if r["p_brand"] in relops.Q17_BRANDS
    }
    per_part = defaultdict(list)
    for r in li:
        if r["l_partkey"] in brand:
            per_part[r["l_partkey"]].append(r)
    agg = defaultdict(lambda: [0, 0.0])
    for pk, rows in per_part.items():
        sum_qty_u = sum(int(round(r["l_quantity"] * 1_000_000)) for r in rows)
        cnt = len(rows)
        for r in rows:
            if 5 * int(round(r["l_quantity"] * 1_000_000)) * cnt < sum_qty_u:
                a = agg[brand[pk]]
                a[0] += 1
                a[1] += r["l_extendedprice"]
    want = {
        b: (n, round(total / 7.0, 4)) for b, (n, total) in agg.items()
    }
    got = {
        r["p_brand"]: (r["n_small"], r["avg_yearly"])
        for r in relops.tpch_small_qty_revenue(spark, SF).collect()
    }
    assert set(got) == set(want)
    for b in got:
        assert got[b][0] == want[b][0]
        assert abs(got[b][1] - want[b][1]) < 1e-6


def test_ann_pq_recall_bounds(spark):
    from sparkmedkg import metrics

    r = metrics.ann_pq_recall(spark, SF).collect()
    assert len(r) == 1
    row = r[0]
    assert 0 <= row["n_hits"] <= row["k"] == 10
    assert abs(row["recall"] - row["n_hits"] / 10.0) < 1e-9
