"""Round-3 additions, fourth batch: TPC-H Q7/Q22 shapes, DistMult ranking,
resource-allocation / preferential-attachment link prediction, degree
assortativity, Flesch readability, Gopher-style quality rules.
Oracle-value parity runs in the driver gate; these pin brute-force
equality and algorithmic invariants."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from sparkmedkg import graphalgo, kgembed, relations, relops, textstats, webclean, webgraph

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# TPC-H Q7: volume shipping
# ---------------------------------------------------------------------------

def test_volume_shipping_bruteforce(spark):
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in relops.tpch_volume_shipping(spark, SF).collect()
    }
    assert got
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    supp_n = {
        r["s_suppkey"]: nation[r["s_nationkey"]]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    cust_n = {
        r["c_custkey"]: nation[r["c_nationkey"]]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    want = defaultdict(float)
    tracked = set(relops.Q7_NATIONS)
    for r in li:
        y = r["l_shipdate"].year
        if y not in relops.Q7_YEARS:
            continue
        sn = supp_n[r["l_suppkey"]]
        cn = cust_n[orders[r["l_orderkey"]]]
        if sn in tracked and cn in tracked and sn != cn:
            want[(sn, cn, y)] += r["l_extendedprice"] * (1.0 - r["l_discount"])
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-4


# ---------------------------------------------------------------------------
# TPC-H Q22: above-average balance, no urgent orders
# ---------------------------------------------------------------------------

def test_above_avg_no_orders_bruteforce(spark):
    got = {
        r["n_name"]: (r["n_custs"], r["total_acctbal"])
        for r in relops.tpch_above_avg_no_orders(spark, SF).collect()
    }
    assert got  # non-degenerate at sf0.001 (5 customers survive)
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    urgent = {
        r["o_custkey"]
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        if r["o_orderpriority"] == relops.Q22_PRIORITY
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    pos = [round(r["c_acctbal"] * 1_000_000) for r in cust if r["c_acctbal"] > 0]
    sum_u, cnt = sum(pos), len(pos)
    want = defaultdict(lambda: [0, 0.0])
    for r in cust:
        if (
            round(r["c_acctbal"] * 1_000_000) * cnt > sum_u
            and r["c_custkey"] not in urgent
        ):
            w = want[nation[r["c_nationkey"]]]
            w[0] += 1
            w[1] += r["c_acctbal"]
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


# ---------------------------------------------------------------------------
# DistMult ranking
# ---------------------------------------------------------------------------

def _emb(x: str, kind: str, i: int) -> int:
    h = hashlib.md5(f"{x}|{kind}|{i}".encode()).hexdigest()
    return int(h[:15], 16) % kgembed.EMB_MOD


def _dm_score(s: str, p: str, o: str) -> int:
    return sum(
        _emb(s, "e", i) * _emb(p, "r", i) * _emb(o, "e", i)
        for i in range(kgembed.EMB_DIM)
    )


def test_distmult_rank_bruteforce(spark):
    neg = relations.q_negative_triples(spark, SF).collect()
    by_pos = defaultdict(list)
    for r in neg:
        by_pos[(r["subj_cui"], r["pred"], r["obj_cui"])].append(r["neg_obj_cui"])
    got = {
        (r["subj_cui"], r["pred"], r["obj_cui"]): (
            r["pos_score"], r["n_neg"], r["pos_rank"]
        )
        for r in kgembed.q_distmult_rank(spark, SF).collect()
    }
    assert set(got) == set(by_pos)
    for key, negs in by_pos.items():
        s, p, o = key
        pos = _dm_score(s, p, o)
        rank = 1 + sum(1 for n in negs if _dm_score(s, p, n) > pos)
        assert got[key] == (pos, len(negs), rank)


# ---------------------------------------------------------------------------
# Link-prediction scores (RA + PA) and assortativity
# ---------------------------------------------------------------------------

def _edge_set(spark):
    return [
        (r["src"], r["dst"])
        for r in graphalgo._edges(spark, SF, relations.PR_MIN_DOCS).collect()
    ]


def test_link_pred_scores_bruteforce(spark):
    edges = _edge_set(spark)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    got = {
        (r["a"], r["b"]): (r["n_common"], r["ra_score"], r["pa_score"])
        for r in webgraph.q_link_pred_scores(spark, SF).collect()
    }
    assert got
    nodes = sorted(adj)
    want = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            common = adj[a] & adj[b]
            if len(common) >= webgraph.LP_MIN_COMMON:
                ra = round(sum(1.0 / len(adj[u]) for u in common), 6)
                want[(a, b)] = (len(common), ra, len(adj[a]) * len(adj[b]))
    assert got == want


def test_assortativity_bruteforce(spark):
    edges = _edge_set(spark)
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    xs = [deg[s] for s, _ in edges]
    ys = [deg[d] for _, d in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    row = graphalgo.q_assortativity(spark, SF).collect()[0]
    assert row["n_edges"] == n
    assert abs(row["assortativity"] - want) < 1e-6
    assert -1.0 <= row["assortativity"] <= 1.0


# ---------------------------------------------------------------------------
# Readability
# ---------------------------------------------------------------------------

def test_readability_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {r["doc_id"]: r for r in textstats.readability(spark, SF).collect()}
    assert len(got) == len(docs)
    for d in docs[:100]:
        w = len(re.split(" +", d["text"]))
        s = max(1, len(re.findall(r"[.!?]+", d["text"])))
        syl = max(1, len(re.findall(r"[aeiouy]+", d["text"].lower())))
        r = got[d["doc_id"]]
        assert (r["n_words"], r["n_sents"], r["n_syllables"]) == (w, s, syl)
        assert abs(r["fre"] - (206.835 - 1.015 * w / s - 84.6 * syl / w)) < 5e-4
        assert abs(r["fk_grade"] - (0.39 * w / s + 11.8 * syl / w - 15.59)) < 5e-4


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------

def test_gopher_rules_bruteforce_and_discriminative(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {r["doc_id"]: r for r in webclean.gopher_rules(spark, SF).collect()}
    assert len(got) == len(docs)
    stop = set(textstats.STOPWORDS)
    n_pass = 0
    for d in docs:
        toks = re.split(" +", d["text"])
        nw = len(toks)
        sum_wlen = len(d["text"]) - (nw - 1)
        n_sym = len(re.findall(r"#+|\.\.\.", d["text"]))
        n_alpha = sum(1 for t in toks if re.search("[a-z]", t))
        n_stop = len({t for t in toks if t in stop})
        r = got[d["doc_id"]]
        assert r["ok_word_count"] == (
            webclean.GOPHER_MIN_WORDS <= nw <= webclean.GOPHER_MAX_WORDS
        )
        assert r["ok_word_len"] == (
            webclean.GOPHER_MIN_WLEN_X1 * nw
            <= sum_wlen
            <= webclean.GOPHER_MAX_WLEN_X1 * nw
        )
        assert r["ok_symbols"] == (10 * n_sym <= nw)
        assert r["ok_alpha_words"] == (5 * n_alpha >= 4 * nw)
        assert r["ok_stopwords"] == (n_stop >= webclean.GOPHER_MIN_STOP)
        assert r["gopher_pass"] == all(
            [r["ok_word_count"], r["ok_word_len"], r["ok_symbols"],
             r["ok_alpha_words"], r["ok_stopwords"]]
        )
        n_pass += r["gopher_pass"]
    # the gate must actually discriminate on this corpus
    assert 0 < n_pass < len(docs)


# ---------------------------------------------------------------------------
# TPC-H Q8: market share
# ---------------------------------------------------------------------------

def test_market_share_bruteforce(spark):
    got = {
        r["o_year"]: (r["total_rev"], r["target_rev"], r["mkt_share"])
        for r in relops.tpch_market_share(spark, SF).collect()
    }
    assert got
    nation = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in spark.read.parquet(f"{SF}/region.parquet").collect()
    }
    cust_r = {
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        if region[nation[r["c_nationkey"]][1]] == relops.Q8_REGION
    }
    supp_n = {
        r["s_suppkey"]: nation[r["s_nationkey"]][0]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    orders = {
        r["o_orderkey"]: (r["o_custkey"], r["o_orderdate"].year)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    tot, tgt = defaultdict(float), defaultdict(float)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        cust, year = orders[r["l_orderkey"]]
        if cust not in cust_r:
            continue
        rev = r["l_extendedprice"] * (1.0 - r["l_discount"])
        tot[year] += rev
        if supp_n[r["l_suppkey"]] == relops.Q8_TARGET_NATION:
            tgt[year] += rev
    assert set(got) == set(tot)
    for y in tot:
        assert abs(got[y][0] - tot[y]) < 1e-4
        assert abs(got[y][1] - tgt[y]) < 1e-4
        assert abs(got[y][2] - tgt[y] / tot[y]) < 1e-6


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def test_dsir_weights_bruteforce(spark):
    from sparkmedkg import trainprep

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    B, PPM = trainprep.DSIR_BUCKETS, trainprep.DSIR_PPM

    def bucket(bg: str) -> int:
        return int(hashlib.md5(bg.encode()).hexdigest()[:15], 16) % B

    feats, is_t = {}, {}
    for d in docs:
        ws = d["text"].lower().split(" ")
        is_t[d["doc_id"]] = len(ws) >= trainprep.DSIR_TARGET_MIN_WORDS
        feats[d["doc_id"]] = [
            bucket(f"{ws[i]} {ws[i + 1]}") for i in range(len(ws) - 1)
        ]
    n_c, n_t = defaultdict(int), defaultdict(int)
    for did, bs in feats.items():
        for b in bs:
            n_c[b] += 1
            if is_t[did]:
                n_t[b] += 1
    tot_c, tot_t = sum(n_c.values()), sum(n_t.values())
    got = {
        r["doc_id"]: (r["is_target"], r["n_feats"], r["dsir_score_ppm"])
        for r in trainprep.dsir_weights(spark, SF).collect()
    }
    assert set(got) == set(feats)
    n_targets = sum(is_t.values())
    assert 0 < n_targets < len(docs)  # target slice is non-degenerate
    for did, bs in feats.items():
        score = sum(
            (n_t[b] + 1) * (tot_c + B) * PPM // ((n_c[b] + 1) * (tot_t + B))
            for b in bs
        )
        assert got[did] == (is_t[did], len(bs), score)


def test_dsir_target_docs_score_higher_on_average(spark):
    from sparkmedkg import trainprep

    rows = trainprep.dsir_weights(spark, SF).collect()
    t = [r["dsir_score_ppm"] / r["n_feats"] for r in rows if r["is_target"]]
    o = [r["dsir_score_ppm"] / r["n_feats"] for r in rows if not r["is_target"]]
    assert sum(t) / len(t) > sum(o) / len(o)


# ---------------------------------------------------------------------------
# Landmark closeness
# ---------------------------------------------------------------------------

def test_closeness_bruteforce(spark):
    edges = _edge_set(spark)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    lms = sorted(adj)[: graphalgo.CLOSENESS_LANDMARKS]
    dist = {}
    for lm in lms:
        seen = {lm: 0}
        frontier = [lm]
        for k in range(1, graphalgo.BFS_MAX_HOPS + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in seen:
                        seen[v] = k
                        nxt.append(v)
            frontier = nxt
        for v, dd in seen.items():
            if dd > 0:
                dist[(lm, v)] = dd
    want = defaultdict(lambda: [0, 0])
    for (lm, v), dd in dist.items():
        want[v][0] += 1
        want[v][1] += dd
    got = {
        r["CUI"]: (r["n_lm"], r["sum_dist"], r["closeness"])
        for r in graphalgo.q_closeness(spark, SF).collect()
    }
    assert set(got) == set(want)
    for v, (n_lm, sd) in want.items():
        assert got[v][0] == n_lm and got[v][1] == sd
        assert abs(got[v][2] - round(n_lm / sd, 6)) < 1e-9


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------

def test_zipf_fit_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts = defaultdict(int)
    for d in docs:
        for t in re.split(" +", d["text"].lower()):
            counts[t] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(n) for _, n in ranked]
    k = len(ranked)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    row = textstats.zipf_fit(spark, SF).collect()[0]
    assert row["n_types"] == k
    assert row["n_tokens"] == sum(counts.values())
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert row["zipf_slope"] < 0  # frequency falls with rank


# ---------------------------------------------------------------------------
# Streaming replays vs batch twins
# ---------------------------------------------------------------------------

def test_stream_tumbling_replay_matches_batch(spark):
    from sparkmedkg import streaming

    got = sorted(
        tuple(r) for r in streaming.q_stream_tumbling_replay(spark, SF).collect()
    )
    want = sorted(
        tuple(r) for r in relops.events_tumbling_counts(spark, SF).collect()
    )
    assert got == want


def test_stream_first_seen_replay_matches_groupby_min(spark):
    from sparkmedkg import streaming

    got = sorted(
        tuple(r)
        for r in streaming.q_stream_first_seen_replay(spark, SF).collect()
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = sorted(
        tuple(r)
        for r in ev.groupBy(
            F.concat(
                F.lit("u"), F.col("user_id").cast("string"),
                F.lit("/"), F.col("event_type"),
            ).alias("url")
        )
        .agg(F.unix_micros(F.min(F.col("ts").cast("timestamp"))).alias("first_seen_us"))
        .collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# TPC-H Q10: returned items
# ---------------------------------------------------------------------------

def test_returned_items_bruteforce(spark):
    got = [
        (r["c_custkey"], r["n_name"], r["lost_revenue"])
        for r in relops.tpch_returned_items(spark, SF).collect()
    ]
    assert len(got) == relops.Q10_TOPK
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    lost = defaultdict(float)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if r["l_returnflag"] == "R":
            lost[orders[r["l_orderkey"]]] += r["l_extendedprice"] * (
                1.0 - r["l_discount"]
            )
    ranked = sorted(lost.items(), key=lambda kv: (-kv[1], kv[0]))
    for (ck, _, lr), (wck, wlr) in zip(got, ranked[: relops.Q10_TOPK]):
        assert ck == wck
        assert abs(lr - wlr) < 1e-4
    # revenue descending
    assert all(got[i][2] >= got[i + 1][2] for i in range(len(got) - 1))


# ---------------------------------------------------------------------------
# Modularity
# ---------------------------------------------------------------------------

def test_modularity_bruteforce(spark):
    edges = _edge_set(spark)
    labels = {
        r["CUI"]: r["label"]
        for r in graphalgo.q_label_propagation(spark, SF).collect()
    }
    m = len(edges)
    e_c, deg_c = defaultdict(int), defaultdict(int)
    for s, d in edges:
        deg_c[labels[s]] += 1
        if labels[s] == labels[d]:
            e_c[labels[s]] += 1
    comms = set(deg_c)
    num = sum(e_c[c] * m - deg_c[c] * deg_c[c] for c in comms)
    row = graphalgo.q_modularity(spark, SF).collect()[0]
    assert row["n_comms"] == len(comms)
    assert row["m_edges"] == m
    assert abs(row["modularity"] - num / (m * m)) < 1e-6
    assert -0.5 <= row["modularity"] <= 1.0


# ---------------------------------------------------------------------------
# Packing efficiency
# ---------------------------------------------------------------------------

def test_packing_efficiency_consistent_with_placement(spark):
    from sparkmedkg import corpusops, metrics

    placed = corpusops.pack_sequences(spark, SF).collect()
    total = sum(r["n_tokens"] for r in placed)
    n_seqs = max(r["last_seq"] for r in placed) + 1
    row = metrics.packing_efficiency(spark, SF).collect()[0]
    assert row["n_docs"] == len(placed)
    assert row["total_tokens"] == total
    assert row["n_seqs"] == n_seqs
    assert row["capacity"] == n_seqs * corpusops.PACK_BLOCK
    assert row["fill_ppm"] == total * 1_000_000 // (n_seqs * corpusops.PACK_BLOCK)
    assert 0 < row["fill_ppm"] <= 1_000_000


# ---------------------------------------------------------------------------
# Matryoshka recall
# ---------------------------------------------------------------------------

def test_matryoshka_recall_bruteforce(spark):
    from sparkmedkg import simsearch

    embs = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    def topk(d):
        qv = embs[0][:d]
        def cos(v):
            v = v[:d]
            num = sum(a * b for a, b in zip(v, qv))
            den = math.sqrt(sum(a * a for a in v)) * math.sqrt(
                sum(b * b for b in qv)
            )
            return num / den
        scored = sorted(
            ((vid, cos(v)) for vid, v in embs.items() if vid != 0),
            key=lambda t: (-t[1], t[0]),
        )
        return {vid for vid, _ in scored[:10]}

    want_hits = len(topk(simsearch.MRL_DIM) & topk(simsearch.DIM))
    row = simsearch.matryoshka_recall(spark, SF).collect()[0]
    assert (row["k"], row["dims"]) == (10, simsearch.MRL_DIM)
    assert row["n_hits"] == want_hits
    assert abs(row["recall"] - want_hits / 10.0) < 1e-9


# ---------------------------------------------------------------------------
# TPC-H Q19: disjunctive revenue
# ---------------------------------------------------------------------------

def test_disjunctive_revenue_bruteforce(spark):
    parts = {
        r["p_partkey"]: (r["p_brand"], r["p_size"])
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    n, rev = 0, 0.0
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        brand, size = parts[r["l_partkey"]]
        q = r["l_quantity"]
        if any(
            brand == b and slo <= size <= shi and qlo <= q <= qhi
            for b, slo, shi, qlo, qhi in relops.Q19_CLAUSES
        ):
            n += 1
            rev += r["l_extendedprice"] * (1.0 - r["l_discount"])
    row = relops.tpch_disjunctive_revenue(spark, SF).collect()[0]
    assert row["n_items"] == n and n > 0
    assert abs(row["revenue"] - rev) < 1e-4


# ---------------------------------------------------------------------------
# KG schema stats
# ---------------------------------------------------------------------------

def test_schema_stats_bruteforce(spark):
    rel = relations.q_relations(spark, SF).collect()
    want = defaultdict(lambda: [0, set(), set(), 0])
    for r in rel:
        w = want[r["pred"]]
        w[0] += 1
        w[1].add(r["subj_cui"])
        w[2].add(r["obj_cui"])
        w[3] += r["n_occ"]
    got = {r["pred"]: r for r in kgembed.q_schema_stats(spark, SF).collect()}
    assert set(got) == set(want)
    for p, (nt, subj, obj, occ) in want.items():
        g = got[p]
        assert (g["n_triples"], g["n_subj"], g["n_obj"], g["occ_mass"]) == (
            nt, len(subj), len(obj), occ
        )
        assert g["avg_fanout_ppm"] == nt * 1_000_000 // len(subj)


# ---------------------------------------------------------------------------
# ER blocking recall
# ---------------------------------------------------------------------------

def test_er_blocking_recall_bruteforce(spark):
    from sparkmedkg import er, metrics

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import re as _re

    def norm(t):
        return _re.sub("[^a-z0-9 ]", "", t.lower())

    by_block = defaultdict(list)
    for d in docs:
        n = norm(d["text"])
        by_block[n[: er.SN_PREFIX]].append((d["doc_id"], n[: er.LEV_PREFIX]))

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    true_pairs = set()
    for block, rows in by_block.items():
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, sa = rows[i]
                b, sb = rows[j]
                if lev(sa, sb) <= er.LEV_MAX:
                    true_pairs.add((min(a, b), max(a, b)))
    cand = {
        (r["a"], r["b"])
        for r in er.sorted_neighborhood(spark, SF).collect()
    }
    row = metrics.er_blocking_recall(spark, SF).collect()[0]
    assert row["n_true_pairs"] == len(true_pairs)
    assert row["n_candidates"] == len(cand)
    assert row["n_hits"] == len(cand & true_pairs)
    assert cand <= true_pairs  # candidates are verified-true by construction
    assert 0 < row["recall"] <= 1.0
    assert abs(row["recall"] - len(cand & true_pairs) / len(true_pairs)) < 1e-6


# ---------------------------------------------------------------------------
# Split manifest
# ---------------------------------------------------------------------------

def test_split_manifest_bruteforce_and_growth_stable(spark):
    from sparkmedkg import trainprep

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    lo, hi = trainprep.SPLIT_BOUNDS_BP
    want = defaultdict(lambda: [0, 0])
    assign = {}
    for d in docs:
        b = int(
            hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:15], 16
        ) % trainprep.SAMPLE_MOD
        split = "train" if b < lo else ("val" if b < hi else "test")
        assign[d["doc_id"]] = split
        want[split][0] += 1
        want[split][1] += len(re.split(" +", d["text"].lower()))
    got = {
        r["split"]: (r["n_docs"], r["n_tokens"])
        for r in trainprep.split_manifest(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert set(got) == {"train", "val", "test"}
    # growth stability: assignment depends on doc_id only — recompute on a
    # half corpus, every shared doc keeps its split
    for d in docs[: len(docs) // 2]:
        b = int(
            hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:15], 16
        ) % trainprep.SAMPLE_MOD
        split = "train" if b < lo else ("val" if b < hi else "test")
        assert split == assign[d["doc_id"]]


# ---------------------------------------------------------------------------
# Winsorization and robust z-score
# ---------------------------------------------------------------------------

def _pctl(vals, p):
    vals = sorted(vals)
    idx = p * (len(vals) - 1)
    lo = int(math.floor(idx))
    hi = int(math.ceil(idx))
    return vals[lo] + (vals[hi] - vals[lo]) * (idx - lo)


def test_winsorize_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append(r["value"])
    got = {r["event_type"]: r for r in relops.events_winsorize(spark, SF).collect()}
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        lo = _pctl(vals, relops.WINSOR_LO)
        hi = _pctl(vals, relops.WINSOR_HI)
        g = got[t]
        assert g["n"] == len(vals)
        assert g["n_capped_lo"] == sum(1 for v in vals if v < lo)
        assert g["n_capped_hi"] == sum(1 for v in vals if v > hi)
        assert g["n_capped_lo"] > 0 or g["n_capped_hi"] > 0  # clamp is live
        want_sum = sum(min(max(v, lo), hi) for v in vals)
        assert abs(g["sum_winsorized"] - want_sum) < 1e-3


def test_robust_zscore_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append(r["value"])
    got = {
        r["event_type"]: r
        for r in relops.events_robust_zscore(spark, SF).collect()
    }
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        med = _pctl(vals, 0.5)
        mad = _pctl([abs(v - med) for v in vals], 0.5)
        g = got[t]
        assert g["n"] == len(vals)
        assert abs(g["median"] - med) < 1e-6
        assert abs(g["mad"] - mad) < 1e-6
        assert g["n_anomalies"] == sum(
            1 for v in vals if abs(v - med) > relops.MAD_K * mad
        )


# ---------------------------------------------------------------------------
# Link ambiguity
# ---------------------------------------------------------------------------

def test_link_ambiguity_bruteforce(spark):
    from sparkmedkg import link, ner, webkg

    # Expected: aggregate the threshold-0.0 top-5 candidate set by hand.
    mentions = ner.detect_mentions(
        webkg.docs_df(spark, SF), webkg.alias_bc(spark), mode="all"
    )
    raw = link.link_mentions(
        mentions,
        webkg.aliases_df(spark),
        webkg.concepts_df(spark),
        threshold=0.0,
    ).collect()
    by_src = defaultdict(list)
    for r in raw:
        by_src[r["source"]].append((round(r["kb_score"], 6), r["CUI"]))
    got = {r["source"]: r for r in webkg.q_link_ambiguity(spark, SF).collect()}
    assert set(got) == set(by_src)
    for s, cands in by_src.items():
        cands.sort(key=lambda t: (-t[0], t[1]))
        g = got[s]
        assert g["n_cands"] == len(cands)
        assert abs(g["top1_score"] - cands[0][0]) < 1e-9
        t2 = cands[1][0] if len(cands) > 1 else 0.0
        assert abs(g["top2_score"] - t2) < 1e-9
        assert abs(g["margin"] - round(cands[0][0] - t2, 6)) < 1e-9
        assert g["ambiguous"] == (len(cands) > 1)
    assert any(g["ambiguous"] for g in got.values())

    # Cross-check: for every source q_links (threshold 0.7) emits, the
    # ambiguity report's best score must be that source's best link score.
    links = webkg.q_links(spark, SF).collect()
    best_link = {}
    for r in links:
        best_link[r["source"]] = max(
            best_link.get(r["source"], 0.0), r["kb_score"]
        )
    for s, sc in best_link.items():
        assert abs(got[s]["top1_score"] - round(sc, 6)) < 1e-9


# ---------------------------------------------------------------------------
# JSONL export
# ---------------------------------------------------------------------------

def test_export_jsonl_parses_and_round_trips(spark):
    import json

    from sparkmedkg import corpusops

    docs = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    rows = corpusops.export_jsonl(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows[:200]:
        obj = json.loads(r["line"])  # every line is valid JSON
        d = docs[r["doc_id"]]
        assert obj == {"id": d["doc_id"], "lang": d["lang"], "text": d["text"]}
        assert r["n_chars"] == len(r["line"])
