"""Round-2 operator batch: as-of join, tumbling windows, JSON props,
batch ANN, int8 quantization, repetition/normalization, domain stats.

Oracle-value parity is covered by the driver gate; these pin the semantics
against independent brute-force recomputation in plain Python.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from sparkmedkg import relops, simsearch, textstats, trainprep

SF = "/root/testdata/sf0.001"


def test_asof_join_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    views = defaultdict(list)
    for r in ev:
        if r["event_type"] == "view":
            views[r["user_id"]].append((r["ts"], r["event_id"]))
    for v in views.values():
        v.sort()
    want = {}
    for r in ev:
        if r["event_type"] != "click":
            continue
        prior = [(ts, vid) for ts, vid in views[r["user_id"]] if ts <= r["ts"]]
        want[r["event_id"]] = max(prior) if prior else None
    got = relops.events_asof_join(spark, SF).collect()
    assert {r["click_id"] for r in got} == set(want)
    for r in got:
        exp = want[r["click_id"]]
        if exp is None:
            assert r["view_id"] is None and r["view_ts_us"] is None
        else:
            assert r["view_id"] == exp[1]
    # every click appears exactly once (left-join semantics)
    assert len(got) == len(want)


def test_tumbling_counts_total(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = relops.events_tumbling_counts(spark, SF)
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # window starts are hour-aligned epoch micros
    assert (
        out.where(F.col("window_start_us") % (3600 * 1_000_000) != 0).count()
        == 0
    )


def test_json_props_matches_bruteforce(spark):
    import json

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    want = defaultdict(list)
    for r in ev:
        k = json.loads(r["props"]).get("k") if r["props"] else None
        want[r["event_type"]].append(k)
    for r in relops.events_json_props(spark, SF).collect():
        ks = [k for k in want[r["event_type"]] if k is not None]
        assert r["n"] == len(want[r["event_type"]])
        assert r["n_with_k"] == len(ks)
        assert r["min_k"] == min(ks) and r["max_k"] == max(ks)
        assert r["sum_k"] == sum(ks)


def test_batch_topk_equals_single_query_topk(spark):
    rows = simsearch.batch_topk(spark, SF, n_queries=3, k=5).collect()
    by_q = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q[r["query_id"]].append((r["vec_id"], r["cos"]))
    assert set(by_q) == {1, 2, 3}
    for qid, got in by_q.items():
        single = [
            (r["vec_id"], r["cos"])
            for r in simsearch.cosine_topk(spark, SF, query_id=qid, k=5).collect()
        ]
        assert got == single


def test_int8_quant_error_bound(spark):
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    for r in simsearch.int8_quant(spark, SF).collect():
        v = emb[r["vec_id"]]
        scale = (max(v) - min(v)) / 255.0
        # round-to-nearest code -> per-dim error <= scale/2
        assert r["mse_e9"] <= (scale / 2.0) ** 2 * 1e9 + 1
        assert 0 <= r["q_checksum"] <= 255 * len(v)


def test_repetition_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50).collect()
    got = {
        r["doc_id"]: (r["top_bigram_frac"], r["dup_5gram_frac"])
        for r in textstats.repetition(spark, SF).collect()
    }
    from collections import Counter

    for d in docs:
        toks = [t for t in d["text"].lower().split(" ") if t != ""]
        if len(toks) < 2:
            assert d["doc_id"] not in got
            continue
        bgs = Counter(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
        top = round(max(bgs.values()) / sum(bgs.values()), 6)
        fives = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        dup5 = (
            0.0 if len(toks) < 5 else round(1.0 - len(set(fives)) / len(fives), 6)
        )
        assert got[d["doc_id"]] == (top, dup5)


def test_normalize_hand_case(spark, tmp_path):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "Hello,   WORLD!! x9 ", "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(f"{d}/documents.parquet")
    r = textstats.normalize(spark, d).collect()[0]
    import hashlib

    want = "hello world x9"
    assert r["norm_len"] == len(want)
    assert r["norm_md5"] == hashlib.md5(want.encode()).hexdigest()


def test_domain_stats_consistent_with_quality(spark):
    q = {
        r["doc_id"]: (r["n_tokens"], r["quality_score"])
        for r in textstats.quality(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per_src = defaultdict(list)
    for d in docs:
        per_src[d["source"]].append((d["lang"], *q[d["doc_id"]]))
    for r in trainprep.domain_stats(spark, SF).collect():
        rows = per_src[r["source"]]
        assert r["n_docs"] == len(rows)
        assert r["n_en"] == sum(1 for lang, *_ in rows if lang == "en")
        assert r["total_tokens"] == sum(nt for _, nt, _ in rows)
        avg = sum(qs for *_, qs in rows) / len(rows)
        assert abs(r["avg_quality"] - avg) < 1e-5


def test_quantized_topk_shortlist_contains_exact_topk(spark):
    """With a 4x shortlist on this corpus the quantized path recovers the
    exact top-k, and approx_cos stays within the quantizer error bound of
    the true cosine."""
    exact = [
        (r["vec_id"], r["cos"])
        for r in simsearch.cosine_topk(spark, SF, k=10).collect()
    ]
    quant = [
        (r["vec_id"], r["cos"])
        for r in simsearch.quantized_topk(spark, SF, k=10).collect()
    ]
    assert quant == exact
    for r in simsearch.quantized_topk(spark, SF, k=10).collect():
        assert abs(r["cos"] - r["approx_cos"]) < 0.05


def test_latest_per_key_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    want = {}
    for r in ev:
        k = (r["user_id"], r["event_type"])
        cand = (r["ts"], r["event_id"])
        if k not in want or cand > want[k][:2]:
            want[k] = (r["ts"], r["event_id"], round(r["value"], 6))
    got = relops.events_latest_per_key(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        ts, eid, val = want[(r["user_id"], r["event_type"])]
        assert r["event_id"] == eid and abs(r["value"] - val) < 1e-9


def test_sliding_sum_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    got = {r["event_id"]: r for r in relops.events_sliding_sum(spark, SF).collect()}
    assert len(got) == len(ev)
    for r in ev:
        t0 = r["ts"].timestamp()
        in_win = [
            x
            for x in by_user[r["user_id"]]
            if t0 - relops.SLIDE_SEC <= x["ts"].timestamp() <= t0
        ]
        g = got[r["event_id"]]
        assert g["w_cnt"] == len(in_win)
        assert abs(g["w_sum"] - sum(x["value"] for x in in_win)) < 1e-4


def test_dedup_clusters_structure(spark):
    """Clusters cover exactly the docs appearing in exact near-dup pairs,
    every rep is a member of its own cluster with the minimum doc_id, and
    cluster sizes are consistent."""
    from sparkmedkg import dedup

    pairs = dedup.jaccard_pairs_prefix(spark, SF).collect()
    in_pairs = {r["a"] for r in pairs} | {r["b"] for r in pairs}
    rows = dedup.dedup_clusters(spark, SF).collect()
    assert {r["doc_id"] for r in rows} == in_pairs
    by_rep = defaultdict(set)
    for r in rows:
        by_rep[r["rep_id"]].add(r["doc_id"])
    for r in rows:
        assert r["cluster_size"] == len(by_rep[r["rep_id"]])
        assert r["rep_id"] == min(by_rep[r["rep_id"]])
        assert r["rep_id"] in by_rep[r["rep_id"]]
    # every pair lands in one cluster
    rep_of = {r["doc_id"]: r["rep_id"] for r in rows}
    for p in pairs:
        assert rep_of[p["a"]] == rep_of[p["b"]]


def test_ontology_closure_matches_bruteforce(spark):
    from sparkmedkg import hierarchy

    # brute-force min-depth closure over the DAG
    kids = defaultdict(list)
    for c, p in hierarchy.WEB_HIERARCHY:
        kids[c].append(p)
    want = {}
    for start in {c for c, _ in hierarchy.WEB_HIERARCHY}:
        frontier, d = [start], 0
        while frontier:
            d += 1
            frontier = [p for n in frontier for p in kids.get(n, [])]
            for p in frontier:
                want.setdefault((start, p), d)
    got = {
        (r["cui"], r["ancestor"]): r["min_depth"]
        for r in hierarchy.ontology_closure(spark).collect()
    }
    assert got == want
    # the diamond: hash join reaches relational concept at depth 3 via
    # either path, and both intermediate parents at depth 2
    assert got[("W0001", "W0102")] == 3
    assert got[("W0001", "W0101")] == 2 and got[("W0001", "W0106")] == 2


def test_category_rollup_subsumption(spark):
    """Counts are monotone up the hierarchy: an ancestor's doc count is at
    least any descendant category's (every subsumed mention propagates)."""
    from sparkmedkg import hierarchy

    rows = {r["ancestor"]: r for r in hierarchy.category_rollup(spark, SF).collect()}
    assert rows["W0102"]["n_docs"] >= rows["W0101"]["n_docs"] >= rows["W0100"]["n_docs"]
    assert rows["W0100"]["n_mentions"] > 0


def test_range_join_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    clicks = defaultdict(list)
    for r in ev:
        if r["event_type"] == "click":
            clicks[r["user_id"]].append((r["ts"], r["event_id"]))
    win_us = relops.RANGE_WIN_SEC * 1_000_000
    want = set()
    for r in ev:
        if r["event_type"] != "error":
            continue
        e_us = int(r["ts"].timestamp() * 1_000_000)
        for cts, cid in clicks[r["user_id"]]:
            c_us = int(cts.timestamp() * 1_000_000)
            if c_us < e_us and c_us >= e_us - win_us:
                want.add((r["event_id"], cid, e_us - c_us))
    got = {
        (r["error_id"], r["click_id"], r["gap_us"])
        for r in relops.events_range_join(spark, SF).collect()
    }
    assert got == want
    assert want, "fixture must exercise the window"


def test_kcore_matches_peeling(spark):
    from sparkmedkg import graphalgo, relations

    edges = {
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, graphalgo.PR_MIN_DOCS
        ).collect()
    }
    k = graphalgo.KCORE_K
    alive = {s for s, _ in edges}
    while True:
        deg = defaultdict(int)
        for s, d in edges:
            if s in alive and d in alive:
                deg[s] += 1
        nxt = {n for n in alive if deg[n] >= k}
        if nxt == alive:
            break
        alive = nxt
    want = {n: deg[n] for n in alive}
    got = {
        r["CUI"]: r["core_deg"] for r in graphalgo.q_kcore(spark, SF).collect()
    }
    assert got == want


def test_kcore_iterative_peeling(spark):
    """Clique + attached path: the path peels away one node per round (the
    corpus graph is too dense to exercise the iteration), and the clique's
    3-core survives."""
    from sparkmedkg import graphalgo

    und = [("k1", "k2"), ("k1", "k3"), ("k1", "k4"), ("k2", "k3"),
           ("k2", "k4"), ("k3", "k4"),            # K4: every degree 3
           ("k4", "p1"), ("p1", "p2"), ("p2", "p3")]  # path tail
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    got = {
        r["CUI"]: r["core_deg"]
        for r in graphalgo.kcore_from_edges(edges, k=2).collect()
    }
    # 2-core: the path tail (p3 deg 1 -> peel; then p2 -> peel; then p1)
    # disappears over THREE rounds; K4 remains at degree 3
    assert got == {"k1": 3, "k2": 3, "k3": 3, "k4": 3}
    assert graphalgo.kcore_from_edges(edges, k=4).count() == 0


def test_weighted_sssp_matches_bellman_ford(spark):
    from sparkmedkg import graphalgo, relations

    doc_cui = relations._doc_cui(spark, SF)
    pairs = defaultdict(int)
    rows = doc_cui.collect()
    by_doc = defaultdict(set)
    for r in rows:
        by_doc[r["url"]].add(r["CUI"])
    for cuis in by_doc.values():
        s = sorted(cuis)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pairs[(s[i], s[j])] += 1
    edges = []
    for (x, y), n in pairs.items():
        if n >= graphalgo.PR_MIN_DOCS:
            c = graphalgo.SSSP_COST_NUM // n
            edges.append((x, y, c))
            edges.append((y, x, c))
    src0 = min(s for s, _, _ in edges)
    dist = {src0: 0}
    for _ in range(graphalgo.SSSP_ROUNDS):
        nxt = dict(dist)
        for s, d, c in edges:
            if s in dist and dist[s] + c < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + c
        dist = nxt
    got = {
        r["CUI"]: r["dist"]
        for r in graphalgo.q_weighted_sssp(spark, SF).collect()
    }
    assert got == dist
    assert len(got) > 1 and got[src0] == 0
