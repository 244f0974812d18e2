"""Round-3 eighth-batch operators: SCC, host boilerplate strip, CCNet
perplexity buckets — brute-force Python twins over the sf0.001 tables."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pandas as pd

from sparkmedkg import graphalgo, textstats, webclean

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _directed_edges(spark):
    sym = graphalgo._edges(spark, SF, graphalgo.PR_MIN_DOCS).collect()
    pairs = sorted({(r["src"], r["dst"]) for r in sym if r["src"] < r["dst"]})
    out = set()
    for x, y in pairs:
        if _h60(f"{x}>{y}") % 3 != 0:
            out.add((x, y))
        if _h60(f"{y}>{x}") % 3 != 0:
            out.add((y, x))
    return out


def test_scc_bruteforce(spark):
    dedges = _directed_edges(spark)
    nodes = sorted({v for e in dedges for v in e})
    adj = defaultdict(set)
    for s, d in dedges:
        adj[s].add(d)

    def reach(v):
        seen, stack = {v}, [v]
        while stack:
            for n in adj[stack.pop()]:
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        return seen

    fwd = {v: reach(v) for v in nodes}
    want = {
        v: min([v] + [u for u in fwd[v] if v in fwd[u]]) for v in nodes
    }
    got = {
        r["cui"]: r["scc_id"] for r in graphalgo.q_scc(spark, SF).collect()
    }
    assert got == want
    assert set(got) == set(nodes)


def test_scc_has_nontrivial_component(spark):
    # the 2/3-coin orientation keeps ~4/9 of pairs bidirectional, so the
    # backbone should yield at least one multi-node SCC (guards against a
    # degenerate all-singleton test graph proving nothing)
    rows = graphalgo.q_scc(spark, SF).collect()
    sizes = defaultdict(int)
    for r in rows:
        sizes[r["scc_id"]] += 1
    assert max(sizes.values()) >= 2


def test_boilerplate_strip_bruteforce(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    w = webclean.CHUNK_W
    chunks_of = {}
    host_df = defaultdict(set)
    for doc_id, text in docs.itertuples(index=False):
        toks = text.split()
        cs = [
            " ".join(toks[i * w : i * w + w])
            for i in range((len(toks) + w - 1) // w)
        ]
        chunks_of[doc_id] = cs
        host = f"site{doc_id % webclean.BP_N_HOSTS}.example"
        for c in set(cs):
            host_df[host].add((c, doc_id))
    boiler = defaultdict(set)
    for host, pairs in host_df.items():
        df = defaultdict(int)
        for c, _ in pairs:
            df[c] += 1
        boiler[host] = {c for c, n in df.items() if n >= webclean.BP_MIN_DF}
    want = {}
    for doc_id, cs in chunks_of.items():
        host = f"site{doc_id % webclean.BP_N_HOSTS}.example"
        kept = [c for c in cs if c not in boiler[host]]
        want[doc_id] = (len(cs), len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
        for r in webclean.boilerplate_strip(spark, SF).collect()
    }
    assert got == want
    # the operator must actually strip something on this corpus
    assert any(g[1] < g[0] for g in got.values())


def test_ccnet_buckets_properties(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    lang_n = docs.groupby("lang").size().to_dict()
    rows = textstats.ccnet_buckets(spark, SF).collect()
    by_lang = defaultdict(dict)
    for r in rows:
        by_lang[r["lang"]][r["bucket"]] = r
    for lang, buckets in by_lang.items():
        ns = [buckets[b]["n_docs"] for b in ("head", "middle", "tail") if b in buckets]
        assert sum(ns) == lang_n[lang]
        # ntile: earlier buckets are >= later ones and differ by <= 1
        assert max(ns) - min(ns) <= 1
        assert ns == sorted(ns, reverse=True)
        # ppl ranges are ordered head <= middle <= tail
        order = [b for b in ("head", "middle", "tail") if b in buckets]
        for a, b in zip(order, order[1:]):
            assert buckets[a]["max_ppl"] <= buckets[b]["min_ppl"]
            assert buckets[a]["min_ppl"] <= buckets[a]["max_ppl"]


def test_dup_spans_bruteforce(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    w = webclean.DUP_W
    wins_of = {}
    owners = defaultdict(set)
    for doc_id, text in docs.itertuples(index=False):
        toks = text.split()
        ws = [
            " ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)
        ]
        wins_of[doc_id] = ws
        for win in set(ws):
            owners[win].add(doc_id)
    dup = {win for win, ds in owners.items() if len(ds) >= 2}
    want = set()
    for doc_id, ws in wins_of.items():
        hits = [i for i, win in enumerate(ws) if win in dup]
        if not hits:
            continue
        start, prev, n = hits[0], hits[0], 1
        for p in hits[1:]:
            if p > prev + w:
                want.add((doc_id, start, prev + w, n))
                start, n = p, 0
            prev = p
            n += 1
        want.add((doc_id, start, prev + w, n))
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in webclean.dup_spans(spark, SF).collect()
    }
    assert got == want
    assert got, "corpus should contain at least one cross-doc duplicate span"


def test_edge_history_bruteforce(spark):
    from sparkmedkg import relations

    doc_cui = relations._doc_cui(spark, SF).collect()
    by_doc = defaultdict(set)
    for r in doc_cui:
        by_doc[int(r["url"])].add(r["CUI"])
    agg = {}
    for doc, cuis in by_doc.items():
        snap = doc % relations.KG_N_SNAPSHOTS
        for x in cuis:
            for y in cuis:
                if x < y:
                    e = agg.setdefault((x, y), [0, set()])
                    e[0] += 1
                    e[1].add(snap)
    want = {
        (x, y, n, min(s), max(s), len(s))
        for (x, y), (n, s) in agg.items()
        if n >= relations.PR_MIN_DOCS
    }
    got = {
        tuple(r)
        for r in relations.q_edge_history(spark, SF).collect()
    }
    assert got == want


def test_neighborhood_func_bruteforce(spark):
    adj = defaultdict(set)
    for r in graphalgo._edges(spark, SF, graphalgo.PR_MIN_DOCS).collect():
        adj[r["src"]].add(r["dst"])
    want = defaultdict(int)
    for s in adj:
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier and d < graphalgo.NF_MAX_D:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            want[d] += len(nxt)
            frontier = nxt
    got = {
        r["d"]: r["n_pairs"]
        for r in graphalgo.q_neighborhood_func(spark, SF).collect()
    }
    assert got == {d: want.get(d, 0) for d in range(1, graphalgo.NF_MAX_D + 1)}


def test_ontology_reduction_bruteforce(spark):
    from sparkmedkg import hierarchy

    edges = set(hierarchy.WEB_HIERARCHY)
    # python closure
    closure = set(edges)
    while True:
        new = {
            (c, a2)
            for (c, a) in closure
            for (c2, a2) in closure
            if a == c2
        } - closure
        if not new:
            break
        closure |= new
    mid = {
        (c, a2)
        for (c, a) in closure
        for (c2, a2) in closure
        if a == c2
    }
    want = closure - mid
    got = {
        (r["cui"], r["ancestor"])
        for r in hierarchy.ontology_reduction(spark).collect()
    }
    assert got == want
    # defining property: closure(reduction) == closure(original)
    red_closure = set(got)
    while True:
        new = {
            (c, a2)
            for (c, a) in red_closure
            for (c2, a2) in red_closure
            if a == c2
        } - red_closure
        if not new:
            break
        red_closure |= new
    assert red_closure == closure
    # and it is minimal: strictly fewer pairs than the closure
    assert len(got) < len(closure)


def test_cdc_chunks_bruteforce(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    mod = webclean.CDC_MOD
    chunks_of = {}
    owners = defaultdict(set)
    for doc_id, text in docs.itertuples(index=False):
        toks = text.split()
        chunks, cur = [], []
        for t in toks:
            cur.append(t)
            if _h60(t) % mod == 0:
                chunks.append(" ".join(cur))
                cur = []
        if cur:
            chunks.append(" ".join(cur))
        chunks_of[doc_id] = chunks
        for c in set(chunks):
            owners[c].add(doc_id)
    want = {}
    for doc_id, chunks in chunks_of.items():
        dup = sum(1 for c in chunks if len(owners[c]) >= 2)
        want[doc_id] = (len(chunks), dup)
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"])
        for r in webclean.cdc_chunks(spark, SF).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in got.values())


def test_cdc_shift_robustness():
    # the FastCDC property the operator exists for: prepending tokens
    # changes only the FIRST chunk; every later chunk is identical
    def cdc(toks, mod=webclean.CDC_MOD):
        chunks, cur = [], []
        for t in toks:
            cur.append(t)
            if _h60(t) % mod == 0:
                chunks.append(" ".join(cur))
                cur = []
        if cur:
            chunks.append(" ".join(cur))
        return chunks

    base = "the fast key order sort table scan merge part window".split() * 4
    shifted = ["inserted", "prefix"] + base
    a, b = cdc(base), cdc(shifted)
    assert a[1:] == b[1:] or a == b[1:] or a[1:] == b[2:] or set(a[1:]) <= set(b)
    # at minimum the tail chunks coincide
    assert a[-1] == b[-1] and a[-2] == b[-2]


def test_distinct_ngrams_bruteforce(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["source", "text"]]
    agg = defaultdict(lambda: [0, set(), 0, set()])
    for source, text in docs.itertuples(index=False):
        toks = text.split()
        e = agg[source]
        e[0] += len(toks)
        e[1].update(toks)
        bis = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        e[2] += len(bis)
        e[3].update(bis)
    want = {
        s: (n, round(len(d1) / n, 6), round(len(d2) / nb, 6))
        for s, (n, d1, nb, d2) in agg.items()
    }
    got = {
        r["source"]: (r["n_tokens"], r["distinct_1"], r["distinct_2"])
        for r in textstats.distinct_ngrams(spark, SF).collect()
    }
    assert got == want


def test_trustrank_bruteforce(spark):
    from sparkmedkg import webgraph

    edges = {
        (r["src"], r["dst"])
        for r in webgraph._intra_edges(spark, SF).collect()
    }
    nodes = sorted({v for e in edges for v in e})
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    e_s = {
        v: (1.0 / len(webgraph.TRUST_SEEDS) if v in webgraph.TRUST_SEEDS else 0.0)
        for v in nodes
    }
    t = dict(e_s)
    a = webgraph.TRUST_ALPHA
    for _ in range(webgraph.TRUST_ITERS):
        nxt = {}
        inc = defaultdict(float)
        for s, d in edges:
            inc[d] += t[s] / outdeg[s]
        for v in nodes:
            nxt[v] = (1 - a) * e_s[v] + a * inc[v]
        t = nxt
    got = {r["host"]: r["trust"] for r in webgraph.q_trustrank(spark, SF).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - t[v]) < 1e-6
    # seeds hold trust; a host unreachable from seeds scores ~0 restart-only
    assert max(got[s] for s in webgraph.TRUST_SEEDS if s in got) > 0


def test_shortest_path_tree_bruteforce(spark):
    adj = defaultdict(set)
    for r in graphalgo._edges(spark, SF, graphalgo.PR_MIN_DOCS).collect():
        adj[r["src"]].add(r["dst"])
    seed = min(adj)
    dist = {seed: 0}
    frontier = [seed]
    d = 0
    while frontier and d < graphalgo.BFS_MAX_HOPS:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    want = {}
    for v, dv in dist.items():
        if dv == 0:
            want[v] = (0, None)
        else:
            want[v] = (
                dv,
                min(u for u in adj if v in adj[u] and dist.get(u) == dv - 1),
            )
    got = {
        r["cui"]: (r["dist"], r["parent"])
        for r in graphalgo.q_shortest_path_tree(spark, SF).collect()
    }
    assert got == want
    # every parent chain terminates at the seed
    for v in got:
        cur, seen = v, set()
        while got[cur][1] is not None:
            assert cur not in seen
            seen.add(cur)
            cur = got[cur][1]
        assert cur == seed


def test_decay_topk_bruteforce(spark):
    from sparkmedkg import relops

    ev = pd.read_parquet(f"{SF}/events.parquet")[["ts", "event_type"]]
    us = ev["ts"].astype("int64")  # epoch micros
    tm = int(us.max())
    hl = relops.DECAY_HALF_LIFE_SEC * 1_000_000
    want = defaultdict(lambda: [0, 0])
    for t_us, et in zip(us, ev["event_type"]):
        step = ((tm - int(t_us)) * 8) // hl
        w = 0 if step >= 8 * 21 else relops.DECAY_LUT_PPM[step % 8] >> (step // 8)
        want[et][0] += 1
        want[et][1] += w
    got = {
        r["event_type"]: (r["n_events"], r["decayed_ppm"])
        for r in relops.events_decay_topk(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # a fully-aged synthetic event set would make the op vacuous
    assert any(v[1] > 0 for v in got.values())


def test_inverted_index_and_phrase_bruteforce(spark):
    from sparkmedkg import corpusops

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    postings = defaultdict(dict)
    for doc_id, text in docs.itertuples(index=False):
        for i, t in enumerate(text.split()):
            postings[t].setdefault(doc_id, []).append(i)
    want_idx = {
        (t, len(ds), d, ",".join(map(str, ps)))
        for t, ds in postings.items()
        if len(ds) >= corpusops.INV_MIN_DF
        for d, ps in ds.items()
    }
    got_idx = {
        (r["term"], r["df"], r["doc_id"], r["positions"])
        for r in corpusops.inverted_index(spark, SF).collect()
    }
    assert got_idx == want_idx

    t1, t2 = corpusops.PHRASE
    want_ph = {}
    for doc_id, text in docs.itertuples(index=False):
        toks = text.split()
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == t1 and toks[i + 1] == t2
        )
        if n:
            want_ph[doc_id] = n
    got_ph = {
        r["doc_id"]: r["n_occurrences"]
        for r in corpusops.phrase_search(spark, SF).collect()
    }
    assert got_ph == want_ph
    assert got_ph, "fixture corpus should contain the demo phrase"


def test_item_similarity_bruteforce(spark):
    import json as _json
    from sparkmedkg import relops

    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "props"]]
    ui = {
        (u, _json.loads(p)["k"])
        for u, p in ev.itertuples(index=False)
        if _json.loads(p).get("k") is not None
    }
    items = defaultdict(set)
    for u, k in ui:
        items[k].add(u)
    by_user = defaultdict(set)
    for u, k in ui:
        by_user[u].add(k)
    co = defaultdict(int)
    for u, ks in by_user.items():
        ks = sorted(ks)
        for i, x in enumerate(ks):
            for y in ks[i + 1 :]:
                co[(x, y)] += 1
    want = {
        (a, b, n, round(n / (len(items[a]) * len(items[b])) ** 0.5, 6))
        for (a, b), n in co.items()
        if n >= relops.ITEM_SIM_MIN_CO
    }
    got = {
        (r["item_a"], r["item_b"], r["n_co"], r["cosine"])
        for r in relops.events_item_similarity(spark, SF).collect()
    }
    assert got == want


def test_code_switch_bruteforce(spark):
    import math

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    w = textstats.CS_W
    markers = set(textstats.EN_MARKERS)
    want = {}
    for doc_id, text in docs.itertuples(index=False):
        toks = text.lower().split()
        chunks = [
            toks[i * w : i * w + w]
            for i in range((len(toks) + w - 1) // w)
        ]
        n_en = sum(1 for c in chunks if any(t in markers for t in c))
        n = len(chunks)
        p = n_en / n
        q = 1 - p
        ent = -(
            (p * math.log2(p) if p > 0 else 0.0)
            + (q * math.log2(q) if q > 0 else 0.0)
        )
        want[doc_id] = (n, n_en, round(ent, 6))
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_en_chunks"], r["mix_entropy"])
        for r in textstats.code_switch(spark, SF).collect()
    }
    assert got == want
    # the signal must actually vary on this corpus
    assert len({v[2] for v in got.values()}) > 1


def test_metapath_counts_consistency(spark):
    from sparkmedkg import webkg

    triples = [tuple(r) for r in webkg.q_triples(spark, SF).collect()]
    paths = defaultdict(int)
    by_src = defaultdict(list)
    for sl, si, p, dl, di in triples:
        by_src[(sl, si)].append((p, dl, di))
    for sl, si, p, dl, di in triples:
        for p2, dl2, _ in by_src.get((dl, di), ()):
            paths[(sl, p, dl, p2, dl2)] += 1
    got = {
        (r["src_label"], r["pred_1"], r["mid_label"], r["pred_2"], r["dst_label"]): r["n_paths"]
        for r in webkg.q_metapath_counts(spark, SF).collect()
    }
    assert got == dict(paths)
    assert got, "triple graph should contain 2-hop paths"


def test_ab_test_bruteforce(spark):
    import math
    from sparkmedkg import relops

    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "event_type"]]
    per_user = defaultdict(int)
    for u, et in ev.itertuples(index=False):
        if et == relops.AB_CONV_EVENT:
            per_user[u] += 1
    users = sorted(set(ev["user_id"]))
    conv = {u: int(per_user.get(u, 0) >= relops.AB_CONV_MIN) for u in users}
    n_a = sum(1 for u in users if u % 2 == 0)
    n_b = len(users) - n_a
    c_a = sum(conv[u] for u in users if u % 2 == 0)
    c_b = sum(conv[u] for u in users if u % 2 == 1)
    row = relops.events_ab_test(spark, SF).collect()[0]
    assert (row["n_a"], row["n_b"], row["conv_a"], row["conv_b"]) == (
        n_a, n_b, c_a, c_b,
    )
    pool = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
    if se > 0:
        assert abs(row["z_score"] - (c_b / n_b - c_a / n_a) / se) < 1e-5
    # conversion split must be non-degenerate for the stat to mean anything
    assert 0 < c_a + c_b < n_a + n_b


def test_rich_club_bruteforce(spark):
    edges = {
        (r["src"], r["dst"])
        for r in graphalgo._edges(spark, SF, graphalgo.PR_MIN_DOCS).collect()
    }
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    want = {}
    for k in range(1, graphalgo.RC_MAX_K + 1):
        club = {v for v, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        e_k = sum(
            1 for (s, d) in edges if s < d and s in club and d in club
        )
        want[k] = (
            len(club),
            e_k,
            round(e_k / (len(club) * (len(club) - 1) / 2), 6),
        )
    got = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in graphalgo.q_rich_club(spark, SF).collect()
    }
    assert got == want


def test_edge_provenance_bruteforce(spark):
    from sparkmedkg import relations

    doc_cui = relations._doc_cui(spark, SF).collect()
    by_doc = defaultdict(set)
    for r in doc_cui:
        by_doc[int(r["url"])].add(r["CUI"])
    agg = defaultdict(list)
    for doc, cuis in by_doc.items():
        for x in cuis:
            for y in cuis:
                if x < y:
                    agg[(x, y)].append(doc)
    want = {
        (x, y): (
            len(ds),
            ",".join(map(str, sorted(ds)[: relations.PROV_MAX_DOCS])),
        )
        for (x, y), ds in agg.items()
        if len(ds) >= relations.PR_MIN_DOCS
    }
    got = {
        (r["src"], r["dst"]): (r["n_docs"], r["doc_ids"])
        for r in relations.q_edge_provenance(spark, SF).collect()
    }
    assert got == want
    # at least one edge's exemplar list is capped below its exact count
    # OR all edges fit — either way counts must exceed list length never
    for (n, ds) in got.values():
        assert len(ds.split(",")) == min(n, relations.PROV_MAX_DOCS)


def test_ivf_curve_monotone(spark):
    from sparkmedkg import metrics, simsearch

    rows = {r["n_probe"]: r for r in metrics.ann_ivf_curve(spark, SF).collect()}
    assert set(rows) == set(metrics.IVF_CURVE_PROBES)
    recalls = [rows[p]["recall"] for p in metrics.IVF_CURVE_PROBES]
    # probing more cells can only add candidates -> recall is monotone
    assert recalls == sorted(recalls)
    for p, r in rows.items():
        assert r["n_hits"] == round(r["recall"] * 10)
    # and the widest probe should be doing better than nothing
    assert recalls[-1] > 0


def test_hyperball_bruteforce(spark):
    """Replicate the register iteration in Python and pin exact equality,
    then sanity-check the estimate against the exact ball sizes."""
    adj = defaultdict(set)
    for r in graphalgo._edges(spark, SF, graphalgo.PR_MIN_DOCS).collect():
        adj[r["src"]].add(r["dst"])
    nodes = sorted(adj)
    M, P = graphalgo.HB_M, graphalgo.HB_P

    def rho(h):
        rem = h >> P
        return (61 - P) if rem == 0 else (60 - P) - rem.bit_length() + 1

    regs = {
        v: {(_h60(v) % M): rho(_h60(v))} for v in nodes
    }
    alpha = 0.7213 / (1.0 + 1.079 / M)

    def estimate(r):
        s = sum(2.0 ** -mx for mx in r.values()) + (M - len(r))
        raw = alpha * M * M / s
        zeros = M - len(r)
        if raw <= 2.5 * M and zeros > 0:
            import math
            return M * math.log(M / zeros)
        return raw

    want = {}
    cur = regs
    for d in range(1, graphalgo.NF_MAX_D + 1):
        nxt = {v: dict(cur[v]) for v in nodes}
        for u in nodes:
            for v in adj[u]:
                for reg, mx in cur[u].items():
                    if nxt[v].get(reg, -1) < mx:
                        nxt[v][reg] = mx
        cur = nxt
        cents = sum(round(estimate(cur[v]) * 100) for v in nodes)
        want[d] = (len(nodes), round(cents / 100.0, 2))
    got = {
        r["d"]: (r["n_nodes"], r["est_total"])
        for r in graphalgo.q_hyperball(spark, SF).collect()
    }
    assert got == want
    # the sketch should land within HLL error of the exact ball sums
    exact_pairs = {
        r["d"]: r["n_pairs"]
        for r in graphalgo.q_neighborhood_func(spark, SF).collect()
    }
    n = len(nodes)
    exact_balls = {}
    run = n  # ball(v,0) summed = n
    for d in range(1, graphalgo.NF_MAX_D + 1):
        run += exact_pairs[d]
        exact_balls[d] = run
    for d in range(1, graphalgo.NF_MAX_D + 1):
        assert abs(got[d][1] - exact_balls[d]) / exact_balls[d] < 0.35


def test_domain_similarity_bruteforce(spark):
    import math

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["source", "text"]]
    prof = defaultdict(lambda: defaultdict(int))
    for source, text in docs.itertuples(index=False):
        for t in text.split():
            prof[source][t] += 1
    S = textstats.JSD_SCALE
    srcs = sorted(prof)
    want = {}
    for i, a in enumerate(srcs):
        ta = sum(prof[a].values())
        for b in srcs[i + 1 :]:
            tb = sum(prof[b].values())
            cn = pn = qn = 0
            for t in set(prof[a]) & set(prof[b]):
                p, q = prof[a][t] / ta, prof[b][t] / tb
                m = (p + q) / 2
                cn += round(
                    (0.5 * p * math.log2(p / m) + 0.5 * q * math.log2(q / m))
                    * S
                )
                pn += round(p * S)
                qn += round(q * S)
            want[(a, b)] = round(
                (cn + 0.5 * (S - pn) + 0.5 * (S - qn)) / S, 6
            )
    got = {
        (r["src_a"], r["src_b"]): r["jsd"]
        for r in textstats.domain_similarity(spark, SF).collect()
    }
    assert got == want
    assert all(-1e-9 <= v <= 1.0 + 1e-9 for v in got.values())


def test_split_leakage_consistency(spark):
    from sparkmedkg import dedup, metrics, trainprep

    pairs = {
        (r["a"], r["b"])
        for r in dedup.jaccard_pairs_prefix(
            spark, SF, tau=dedup.JACCARD_TAU
        ).collect()
    }
    lo, hi = trainprep.SPLIT_BOUNDS_BP

    def split(doc_id):
        b = _h60(str(doc_id)) % trainprep.SAMPLE_MOD
        return "train" if b < lo else ("val" if b < hi else "test")

    want = defaultdict(int)
    for a, b in pairs:
        sa, sb = sorted((split(a), split(b)))
        want[(sa, sb)] += 1
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in metrics.split_leakage(spark, SF).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == len(pairs)


def test_centroid_drift_bruteforce(spark):
    import numpy as np
    from sparkmedkg import emblinalg

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy())
    ids = emb["vec_id"].to_numpy()
    qx = np.where(
        x * emblinalg.QUANT >= 0,
        np.floor(x * emblinalg.QUANT + 0.5),
        -np.floor(-x * emblinalg.QUANT + 0.5),
    ).astype(np.int64)
    sa = qx[ids % 2 == 0].sum(axis=0)
    sb = qx[ids % 2 == 1].sum(axis=0)
    n_a, n_b = int((ids % 2 == 0).sum()), int((ids % 2 == 1).sum())
    dot = int((sa * sb).sum())
    cos = round(dot / (np.sqrt(float((sa * sa).sum())) * np.sqrt(float((sb * sb).sum()))), 6)
    drift = np.abs(sa * n_b - sb * n_a)
    top = int(np.max(drift))
    top_dim = int(np.min(np.where(drift == top)[0]))
    row = emblinalg.centroid_drift(spark, SF).collect()[0]
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    assert row["cosine"] == cos
    assert (row["top_dim"], row["top_drift"]) == (top_dim, top)


def test_bpe_roundtrip_all_ok(spark):
    from sparkmedkg import corpusops

    row = corpusops.bpe_roundtrip(spark, SF).collect()[0]
    assert row["n_docs"] == 500
    # merges must be perfectly reversible on every document
    assert row["n_roundtrip_ok"] == row["n_docs"]
    # and the gate must be non-vacuous: merges actually applied
    enc = corpusops.bpe_encode(spark, SF).collect()
    assert any(r["n_merges_applied"] > 0 for r in enc)


def test_coverage_report_bruteforce(spark):
    from sparkmedkg import hierarchy, webkg

    closure = set()
    edges = set(hierarchy.WEB_HIERARCHY)
    closure |= edges
    while True:
        new = {
            (c, a2) for (c, a) in closure for (c2, a2) in closure if a == c2
        } - closure
        if not new:
            break
        closure |= new
    alias_cui = dict(webkg.WEB_ALIASES)
    mentions = {
        r["mention"] for r in webkg.q_mentions(spark, SF).collect()
    }
    observed = {alias_cui[m] for m in mentions if m in alias_cui}
    per_anc_all = defaultdict(set)
    per_anc_obs = defaultdict(set)
    for c, a in closure:
        per_anc_all[a].add(c)
        if c in observed:
            per_anc_obs[a].add(c)
    want = {
        a: (
            len(cs),
            len(per_anc_obs[a]),
            round(len(per_anc_obs[a]) / len(cs), 6),
        )
        for a, cs in per_anc_all.items()
    }
    got = {
        r["ancestor"]: (r["n_concepts"], r["n_observed"], r["coverage"])
        for r in hierarchy.coverage_report(spark, SF).collect()
    }
    assert got == want


def test_winnowing_bruteforce(spark):
    from sparkmedkg import dedup

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    k, w = dedup.WIN_K, dedup.WIN_W
    fps_of = {}
    for doc_id, text in docs.itertuples(index=False):
        toks = text.split()
        grams = [
            _h60(" ".join(toks[i : i + k]))
            for i in range(len(toks) - k + 1)
        ]
        sel = set()
        for j in range(len(grams) - w + 1):
            sel.add(
                min(
                    (grams[j + o] >> 20) * (1 << 20)
                    + ((1 << 20) - 1 - (j + o))
                    for o in range(w)
                )
            )
        fps_of[doc_id] = sel
    dfreq = defaultdict(int)
    for ds in fps_of.values():
        for f in ds:
            dfreq[f] += 1
    kept = {
        d: {f for f in fs if dfreq[f] <= dedup.WIN_MAX_DF}
        for d, fs in fps_of.items()
    }
    want = {}
    ids = sorted(kept)
    inv = defaultdict(set)
    for d, fs in kept.items():
        for f in fs:
            inv[f].add(d)
    pair_counts = defaultdict(int)
    for f, ds in inv.items():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                pair_counts[(a, b)] += 1
    want = {p: n for p, n in pair_counts.items() if n >= 2}
    got = {
        (r["a"], r["b"]): r["n_shared"]
        for r in dedup.winnowing_pairs(spark, SF).collect()
    }
    assert got == want
    assert got, "corpus should contain winnowing-detectable overlap"


def test_winnowing_guarantee():
    """Any shared run of >= w+k-1 tokens yields >= 1 shared fingerprint."""
    from sparkmedkg import dedup

    k, w = dedup.WIN_K, dedup.WIN_W

    def fps(toks):
        grams = [
            _h60(" ".join(toks[i : i + k]))
            for i in range(len(toks) - k + 1)
        ]
        out = set()
        for j in range(len(grams) - w + 1):
            # strip the position encode: fingerprints match on hash only
            out.add(
                min(
                    (grams[j + o] >> 20)
                    for o in range(w)
                )
            )
        return out

    shared = "alpha beta gamma delta epsilon zeta eta theta".split()
    assert len(shared) >= w + k - 1
    a = "one two three".split() + shared + "four five".split()
    b = "six seven eight nine".split() + shared + "ten".split()
    assert fps(a) & fps(b)


def test_cusum_bruteforce(spark):
    from sparkmedkg import relops

    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["event_type", "event_id", "ts", "value"]
    ]
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["v"] = (ev["value"] * relops.CUSUM_SCALE).round().astype("int64")
    want = {}
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["ts_us", "event_id"])
        n = len(g)
        tot = int(g["v"].sum())
        s = 0
        best, best_ts = -1, None
        for _, row in g.iterrows():
            s = max(0, s + int(row["v"]) * n - tot)
            if s > best:
                best, best_ts = s, int(row["ts_us"])
        want[et] = (best // n, best_ts, n)
    got = {
        r["event_type"]: (r["max_cusum_milli"], r["at_ts_us"], r["n_events"])
        for r in relops.events_cusum(spark, SF).collect()
    }
    assert got == want


def test_collocation_bruteforce(spark):
    import math
    from sparkmedkg import relations

    doc_cui = relations._doc_cui(spark, SF).collect()
    by_doc = defaultdict(set)
    for r in doc_cui:
        by_doc[r["url"]].add(r["CUI"])
    N = len(by_doc)
    marg = defaultdict(int)
    co = defaultdict(int)
    for cuis in by_doc.values():
        for c in cuis:
            marg[c] += 1
        cs = sorted(cuis)
        for i, x in enumerate(cs):
            for y in cs[i + 1 :]:
                co[(x, y)] += 1
    want = {}
    for (x, y), n_ab in co.items():
        if n_ab < relations.PR_MIN_DOCS:
            continue
        n_a, n_b = marg[x], marg[y]
        d = n_ab * (N - n_a - n_b + n_ab) - (n_a - n_ab) * (n_b - n_ab)
        chi2 = N * d * d / (n_a * n_b * (N - n_a) * (N - n_b))
        t = (n_ab - n_a * n_b / N) / math.sqrt(n_ab)
        want[(x, y)] = (n_ab, round(chi2, 6), round(t, 6))
    got = {
        (r["src"], r["dst"]): (r["n_ab"], r["chi2"], r["t_score"])
        for r in relations.q_collocation_scores(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-4
        assert abs(got[k][2] - want[k][2]) < 1e-6
