"""Round-3 eleventh-batch operators: node2vec biased second-order walks —
brute-force Python replay over the sf0.001 co-occurrence graph."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from sparkmedkg import graphalgo, relations

SF = "/root/testdata/sf0.001"


def _graph(spark):
    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    adj: dict[str, list[str]] = defaultdict(list)
    eset = set()
    for s, d in edges:
        adj[s].append(d)
        eset.add((s, d))
    for s in adj:
        adj[s].sort()
    return adj, eset


def test_node2vec_walks_match_bruteforce_replay(spark):
    adj, eset = _graph(spark)
    want = set()
    for start in sorted(adj):
        prev, cur = start, start
        want.add((start, 0, cur))
        for t in range(1, graphalgo.N2V_LEN + 1):
            cands = adj[cur]
            wts = [
                graphalgo.N2V_W_RETURN
                if x == prev
                else graphalgo.N2V_W_COMMON
                if (prev, x) in eset
                else graphalgo.N2V_W_OUT
                for x in cands
            ]
            h = hashlib.md5(f"{start}|{t}|{prev}>{cur}".encode()).hexdigest()
            r = int(h[:15], 16) % sum(wts)
            cum = 0
            nxt = None
            for x, w in zip(cands, wts):
                if cum <= r < cum + w:
                    nxt = x
                    break
                cum += w
            assert nxt is not None
            prev, cur = cur, nxt
            want.add((start, t, cur))
    got = {
        (r["walk"], r["step"], r["node"])
        for r in graphalgo.q_node2vec_walks(spark, SF).collect()
    }
    assert got == want


def test_node2vec_walks_are_paths_and_bias_differs_from_uniform(spark):
    adj, eset = _graph(spark)
    rows = graphalgo.q_node2vec_walks(spark, SF).collect()
    by_walk: dict[str, dict[int, str]] = defaultdict(dict)
    for r in rows:
        assert r["step"] not in by_walk[r["walk"]]
        by_walk[r["walk"]][r["step"]] = r["node"]
    for walk, steps in by_walk.items():
        assert steps[0] == walk
        assert sorted(steps) == list(range(graphalgo.N2V_LEN + 1))
        for t in range(1, graphalgo.N2V_LEN + 1):
            assert (steps[t - 1], steps[t]) in eset


def test_topo_layers_is_valid_longest_path_layering(spark):
    from sparkmedkg import hierarchy

    layers = {
        r["node"]: r["layer"]
        for r in hierarchy.topo_layers(spark).collect()
    }
    nodes = set()
    for c, p in hierarchy.WEB_HIERARCHY:
        nodes.update((c, p))
    assert set(layers) == nodes
    # every edge goes strictly upward; layer = 1 + max child layer
    import collections

    children = collections.defaultdict(list)
    for c, p in hierarchy.WEB_HIERARCHY:
        children[p].append(c)
        assert layers[p] > layers[c]
    for n in nodes:
        if children[n]:
            assert layers[n] == 1 + max(layers[c] for c in children[n])
        else:
            assert layers[n] == 0


def test_harmonic_matches_bruteforce_bfs(spark):
    from collections import defaultdict, deque

    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    lms = sorted({s for s, _ in edges})[: graphalgo.CLOSENESS_LANDMARKS]
    acc = defaultdict(lambda: [0, 0])  # node -> [n_lm, h6]
    w6 = {1: 6, 2: 3, 3: 2}
    for lm in lms:
        dist = {lm: 0}
        q = deque([lm])
        while q:
            u = q.popleft()
            if dist[u] >= graphalgo.BFS_MAX_HOPS:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for n, d in dist.items():
            if d > 0:
                acc[n][0] += 1
                acc[n][1] += w6[d]
    want = {
        n: (c, round(h / 6.0, 6)) for n, (c, h) in acc.items()
    }
    got = {
        r["CUI"]: (r["n_lm"], r["harmonic"])
        for r in graphalgo.q_harmonic(spark, SF).collect()
    }
    assert got == want


def test_salsa_normalized_and_degree_weighted(spark):
    from sparkmedkg import webgraph

    rows = webgraph.q_salsa(spark, SF).collect()
    assert rows
    # L1-normalized per round: both vectors sum to ~1
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-3
    # degree normalization: SALSA differs from raw HITS on this graph
    hits = {
        r["host"]: (r["hub"], r["authority"])
        for r in webgraph.q_hits(spark, SF).collect()
    }
    salsa = {r["host"]: (r["hub"], r["authority"]) for r in rows}
    assert set(salsa) == set(hits)
    assert any(salsa[h] != hits[h] for h in salsa)


def test_ewma_matches_bruteforce(spark):
    from decimal import Decimal

    from sparkmedkg import relops

    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["value"])
            for r in spark.read.parquet(f"{SF}/events.parquet").collect()
        )
    )
    from collections import defaultdict

    hist = defaultdict(list)
    want = {}
    wts = [2 ** (relops.EWMA_LAGS - 1 - k) for k in range(relops.EWMA_LAGS)]
    for uid, ts, eid, val in ev:
        hist[uid].append(Decimal(str(round(val, 6))))
        tail = hist[uid][-relops.EWMA_LAGS:][::-1]  # newest first
        num = sum(v * w for v, w in zip(tail, wts))
        den = sum(w for _, w in zip(tail, wts))
        want[eid] = round(float(num) / float(den), 6)
    got = {
        r["event_id"]: r["ewma"]
        for r in relops.events_ewma(spark, SF).collect()
    }
    assert got == want


def test_phash_pairs_hamming_exact_and_banded(spark):
    from sparkmedkg import multimodal

    hashed = {
        r["doc_id"]: r["phash"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .transform(multimodal.with_payload)
        .select("doc_id", "payload")
        .mapInPandas(
            lambda it: (
                __import__("pandas").DataFrame(
                    [
                        (int(d), multimodal._phash_bits(bytes(p)))
                        for d, p in zip(pdf["doc_id"], pdf["payload"])
                    ],
                    columns=["doc_id", "phash"],
                )
                for pdf in it
            ),
            multimodal.PHASH_SCHEMA,
        )
        .collect()
    }
    width = multimodal.PHASH_CELLS // multimodal.PHASH_BANDS
    want = set()
    ids = sorted(hashed)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ha, hb = hashed[a], hashed[b]
            if not any(
                ha[k * width : (k + 1) * width] == hb[k * width : (k + 1) * width]
                for k in range(multimodal.PHASH_BANDS)
            ):
                continue
            ham = sum(x != y for x, y in zip(ha, hb))
            if ham <= multimodal.PHASH_HAM_MAX:
                want.add((a, b, ham))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal.phash_pairs(spark, SF).collect()
    }
    assert got == want
    assert got  # non-vacuous at sf0.001


def test_kneser_ney_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from sparkmedkg import corpusops

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    c = Counter()
    for t in texts:
        ws = t.lower().split(" ")
        c.update(zip(ws, ws[1:]))
    c1 = defaultdict(int)
    fwd = defaultdict(int)
    bwd = defaultdict(int)
    for (w1, w2), n in c.items():
        c1[w1] += n
        fwd[w1] += 1
        bwd[w2] += 1
    n_types = len(c)
    want = {}
    for (w1, w2), n in c.items():
        num = (max(4 * n - 3, 0) * n_types + 3 * fwd[w1] * bwd[w2]) * 1_000_000
        want[(w1, w2)] = (n, num // (4 * c1[w1] * n_types))
    top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        : corpusops.LM_TOPK
    ]
    got = {
        (r["w1"], r["w2"]): (r["n"], r["pkn_ppm"])
        for r in corpusops.kneser_ney(spark, SF).collect()
    }
    assert got == dict(top)


def test_rake_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from sparkmedkg import corpusops
    from sparkmedkg.textstats import STOPWORDS

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    occ = Counter()
    freq = defaultdict(int)
    deg = defaultdict(int)
    for t in texts:
        toks = ["|" if w in STOPWORDS else w for w in t.lower().split(" ")]
        for p in " ".join(toks).split("|"):
            p = p.strip()
            if not p:
                continue
            occ[p] += 1
            ws = p.split(" ")
            for w in ws:
                freq[w] += 1
                deg[w] += len(ws)
    wscore = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
    scored = {
        p: (n, sum(wscore[w] for w in p.split(" "))) for p, n in occ.items()
    }
    top = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))[
        : corpusops.RAKE_TOPK
    ]
    got = [
        ((r["phrase"]), (r["n_occ"], r["score_ppm"]))
        for r in corpusops.rake_keyphrases(spark, SF).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1][1], kv[0])) == top


def test_jl_topk_recall_and_exact_rerank(spark):
    from sparkmedkg import metrics, simsearch

    # reranked scores must be EXACT cosines (identical to brute force for
    # the ids both return)
    exact = {
        r["vec_id"]: r["cos"]
        for r in simsearch.cosine_topk(spark, SF, k=50).collect()
    }
    got = simsearch.jl_topk(spark, SF).collect()
    for r in got:
        if r["vec_id"] in exact:
            assert r["cos"] == exact[r["vec_id"]]
    rec = metrics.ann_jl_recall(spark, SF).collect()[0]
    # synthetic embeddings are near-uniform (top cosine ~0.33), so the
    # bar is "beats the other sketch geometries at equal k": >= the
    # hyperplane-LSH recall (0.2 here) and above chance
    assert rec["n_hits"] == round(rec["recall"] * rec["k"])
    assert rec["recall"] >= 0.3


def test_window_hll_exact_column_and_estimate_error(spark):
    from collections import defaultdict

    from sparkmedkg import relops

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    want = defaultdict(set)
    for r in ev:
        ts = r["ts"]
        start = ts.replace(minute=0, second=0, microsecond=0)
        want[start] = want[start] | {r["user_id"]}
    got = {r["window_start_us"]: r for r in relops.events_window_hll(spark, SF).collect()}
    import datetime

    assert len(got) == len(want)
    for start, users in want.items():
        us = int(start.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        assert got[us]["n_exact"] == len(users)
        # m=64 registers -> ~13% std error; allow generous 3-sigma
        assert abs(got[us]["hll_est"] - len(users)) <= max(5, 0.5 * len(users))


def test_rpq_reach_matches_bruteforce_bfs(spark):
    from collections import defaultdict, deque

    from sparkmedkg import webkg

    tr = webkg.q_triples(spark, SF).where("pred = 'CONTAINS'").collect()
    adj = defaultdict(list)
    starts = set()
    for r in tr:
        adj[(r["src_label"], r["src_id"])].append((r["dst_label"], r["dst_id"]))
        if r["src_label"] == webkg.RPQ_SRC_LABEL:
            starts.add(r["src_id"])
    want = {}
    for s in starts:
        dist = {}
        q = deque([((webkg.RPQ_SRC_LABEL, s), 0)])
        seen = {(webkg.RPQ_SRC_LABEL, s)}
        while q:
            node, d = q.popleft()
            if d >= webkg.RPQ_MAX_HOPS:
                continue
            for nxt in adj.get(node, ()):
                if nxt not in seen:
                    seen.add(nxt)
                    dist[nxt] = d + 1
                    q.append((nxt, d + 1))
        for (dl, did), d in dist.items():
            want[(s, dl, did)] = d
    got = {
        (r["src_id"], r["dst_label"], r["dst_id"]): r["min_hops"]
        for r in webkg.q_rpq_reach(spark, SF).collect()
    }
    assert got == want


def test_densest_subgraph_matches_bruteforce_peel(spark):
    from collections import defaultdict

    from sparkmedkg import graphalgo

    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    alive = {s for s, _ in edges} | {d for _, d in edges}
    snaps = []
    for r in range(graphalgo.DSG_ROUNDS + 1):
        sub = [(s, d) for s, d in edges if s in alive and d in alive]
        deg = defaultdict(int)
        for s, _ in sub:
            deg[s] += 1
        v, e = len(alive), len(sub)
        if v == 0:
            break
        snaps.append((r, v, e, set(alive)))
        if r == graphalgo.DSG_ROUNDS:
            break
        alive = {n for n in alive if deg[n] * v > graphalgo.DSG_EPS_NUM * e}
    br, bv, be, bset = max(snaps, key=lambda s: (s[2] / s[1], -s[0]))
    rows = graphalgo.q_densest_subgraph(spark, SF).collect()
    assert {r["CUI"] for r in rows} == bset
    assert all(
        (r["best_round"], r["n_nodes"], r["n_edges"]) == (br, bv, be)
        for r in rows
    )
    # the kept subgraph is at least as dense as the full graph
    full_v = len({s for s, _ in edges} | {d for _, d in edges})
    assert be / bv >= len(edges) / full_v


def test_soundex_classic_vectors_and_pair_join(spark):
    from sparkmedkg import er
    from pyspark.sql import functions as F

    # published Soundex vectors that our h/w-as-vowel simplification
    # preserves
    vec = {
        "robert": "R163",
        "rupert": "R163",
        "tymczak": "T522",
        "jackson": "J250",
        "euler": "E460",
        "gauss": "G200",
        "hilbert": "H416",
        "knuth": "K530",
        "lloyd": "L300",
        "key": "K000",
    }
    df = spark.createDataFrame([(t,) for t in vec], "tok string")
    got = {
        r["tok"]: r["code"]
        for r in df.select("tok", er._soundex(F.col("tok")).alias("code")).collect()
    }
    assert got == vec
    # DuckDB twin agrees token-for-token
    import duckdb

    con = duckdb.connect()
    toks = ", ".join(f"('{t}')" for t in vec)
    sql = (
        f"SELECT tok, {er._sql_soundex('tok')} AS code "
        f"FROM (VALUES {toks}) t(tok)"
    )
    assert {t: c for t, c in con.execute(sql).fetchall()} == vec


def test_phonetic_keys_cover_vocab_and_pairs_gate_on_lev(spark):
    from sparkmedkg import er

    keys = er.phonetic_keys(spark, SF).collect()
    assert keys and all(r["code"] and len(r["code"]) == 4 for r in keys)
    # testdata vocabulary is phonetically disjoint -> no pairs
    assert er.phonetic_pairs(spark, SF).count() == 0


def test_k_anonymity_matches_bruteforce(spark):
    from collections import defaultdict

    from sparkmedkg import relops

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    classes = defaultdict(set)
    for r in ev:
        classes[(r["event_type"], r["ts"].hour)].add(r["user_id"])
    got = {
        (r["event_type"], r["hour"]): (r["class_size"], r["at_risk"])
        for r in relops.events_k_anonymity(spark, SF).collect()
    }
    want = {
        k: (len(u), len(u) < relops.KANON_K) for k, u in classes.items()
    }
    assert got == want


def test_maximal_matching_bruteforce_and_properties(spark):
    from collections import defaultdict

    from sparkmedkg import graphalgo

    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    eset = set(edges)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    alive = {s for s, _ in edges}
    want = set()
    for r in range(1, graphalgo.MATCH_ROUNDS + 1):
        prop = {
            u: min(x for x in adj[u] if x in alive)
            for u in alive
            if any(x in alive for x in adj[u])
        }
        matched = {
            (u, v, r)
            for u, v in prop.items()
            if v in prop and prop[v] == u and u < v
        }
        want |= matched
        gone = {u for u, v, _ in matched} | {v for _, v, _ in matched}
        alive -= gone
        if not alive:
            break
    got = {
        (r["a"], r["b"], r["round"])
        for r in graphalgo.q_maximal_matching(spark, SF).collect()
    }
    assert got == want
    # it IS a matching: no node appears twice, every pair is an edge
    seen = set()
    for a, b, _ in got:
        assert (a, b) in eset
        assert a not in seen and b not in seen
        seen.update((a, b))


def test_heaps_law_matches_bruteforce(spark):
    from sparkmedkg import textstats

    docs = sorted(
        (r["doc_id"], r["text"].lower().split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    n = len(docs)
    cps = [1 << j for j in range(n.bit_length()) if (1 << j) <= n]
    if cps[-1] != n:
        cps.append(n)
    want = {}
    for cp in cps:
        toks = 0
        types = set()
        for did, ws in docs:
            if did < cp:
                toks += len(ws)
                types |= set(ws)
        want[cp] = (toks, len(types))
    got = {
        r["checkpoint"]: (r["n_tokens_cum"], r["n_types_cum"])
        for r in textstats.heaps_law(spark, SF).collect()
    }
    assert got == want


def test_bpe_fertility_consistent_with_encode(spark):
    from collections import defaultdict

    from sparkmedkg import corpusops

    enc = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in corpusops.bpe_encode(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(r["text"])
        a[2] += enc[r["doc_id"]]
    got = {
        r["source"]: (
            r["n_docs"],
            r["total_bytes"],
            r["total_bpe_tokens"],
            r["bytes_per_token_ppm"],
        )
        for r in corpusops.bpe_fertility(spark, SF).collect()
    }
    want = {
        s: (n, b, t, (b * 1_000_000) // t) for s, (n, b, t) in agg.items()
    }
    assert got == want
