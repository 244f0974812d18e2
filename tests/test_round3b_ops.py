"""Round-3 additions, second batch: nearest-class-mean classifier, two-hop
motif paths, deterministic random walks.  Oracle-value parity runs in the
driver gate; these pin brute-force equality and algorithmic invariants.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from sparkmedkg import graphalgo, relations, simsearch

SF = "/root/testdata/sf0.001"


def _bucket(vec_id: int) -> int:
    h = hashlib.md5(str(vec_id).encode()).hexdigest()
    return int(h[:15], 16) % simsearch.TRAIN_MOD


def _quant(v) -> list[int]:
    import math

    return [int(math.floor(float(x) * simsearch.KM_SCALE + 0.5)) for x in v]


def test_centroid_classify_matches_bruteforce(spark):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    train = [r for r in emb if _bucket(r["vec_id"]) < simsearch.TRAIN_BP]
    test = [r for r in emb if _bucket(r["vec_id"]) >= simsearch.TRAIN_BP]
    assert train and test
    sums: dict[int, list[int]] = defaultdict(lambda: [0] * simsearch.DIM)
    counts: dict[int, int] = defaultdict(int)
    for r in train:
        q = _quant(r["embedding"])
        s = sums[r["label"]]
        for i, x in enumerate(q):
            s[i] += x
        counts[r["label"]] += 1
    cents = {
        lbl: [simsearch._tdiv(s, counts[lbl]) for s in sums[lbl]]
        for lbl in sums
    }
    want: dict[tuple[int, int], int] = defaultdict(int)
    for r in test:
        q = _quant(r["embedding"])
        best = min(
            sorted(cents),
            key=lambda lbl: (
                sum((a - b) * (a - b) for a, b in zip(q, cents[lbl])),
                lbl,
            ),
        )
        want[(r["label"], best)] += 1
    got = {
        (r["label"], r["predicted"]): r["n"]
        for r in simsearch.centroid_classify(spark, SF).collect()
    }
    assert got == dict(want)
    # every held-out row is classified exactly once
    assert sum(got.values()) == len(test)


def test_motif_paths_matches_bruteforce(spark):
    rel = relations.q_relations(spark, SF).collect()
    in_deg: dict[str, int] = defaultdict(int)
    out_deg: dict[str, int] = defaultdict(int)
    for r in rel:
        in_deg[r["obj_cui"]] += 1
        out_deg[r["subj_cui"]] += 1
    ok = {
        m
        for m in set(in_deg) & set(out_deg)
        if in_deg[m] * out_deg[m] <= relations.MOTIF_MID_CAP
    }
    want = set()
    for a in rel:
        if a["obj_cui"] not in ok:
            continue
        for b in rel:
            if b["subj_cui"] == a["obj_cui"] and a["subj_cui"] != b["obj_cui"]:
                want.add(
                    (
                        a["subj_cui"],
                        a["pred"],
                        a["obj_cui"],
                        b["pred"],
                        b["obj_cui"],
                        min(a["n_docs"], b["n_docs"]),
                    )
                )
    got = {
        (
            r["subj_cui"],
            r["pred1"],
            r["mid_cui"],
            r["pred2"],
            r["obj_cui"],
            r["support"],
        )
        for r in relations.q_motif_paths(spark, SF).collect()
    }
    assert got == want
    assert got  # the fixture graph has two-hop structure


def test_motif_hub_cap_excludes_heavy_mids(spark):
    # with cap 0 nothing qualifies; the cap is a real gate, not decoration
    assert relations.q_motif_paths(spark, SF, mid_cap=0).count() == 0


def test_random_walks_match_bruteforce_replay(spark):
    edges = [
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    ]
    adj: dict[str, list[str]] = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    for s in adj:
        adj[s].sort()
    want = set()
    for start in sorted(adj):
        cur = start
        want.add((start, 0, cur))
        for t in range(1, graphalgo.WALK_LEN + 1):
            h = hashlib.md5(f"{start}|{t}|{cur}".encode()).hexdigest()
            cur = adj[cur][int(h[:15], 16) % len(adj[cur])]
            want.add((start, t, cur))
    got = {
        (r["walk"], r["step"], r["node"])
        for r in graphalgo.q_random_walks(spark, SF).collect()
    }
    assert got == want


def test_random_walks_are_paths_on_the_graph(spark):
    edges = {
        (r["src"], r["dst"])
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    }
    rows = graphalgo.q_random_walks(spark, SF).collect()
    by_walk: dict[str, dict[int, str]] = defaultdict(dict)
    for r in rows:
        # exactly one node per (walk, step)
        assert r["step"] not in by_walk[r["walk"]]
        by_walk[r["walk"]][r["step"]] = r["node"]
    for walk, steps in by_walk.items():
        assert steps[0] == walk
        assert sorted(steps) == list(range(graphalgo.WALK_LEN + 1))
        for t in range(1, graphalgo.WALK_LEN + 1):
            assert (steps[t - 1], steps[t]) in edges


def test_walk_skipgrams_match_bruteforce(spark):
    walks = graphalgo.q_random_walks(spark, SF).collect()
    by_walk: dict[str, dict[int, str]] = defaultdict(dict)
    for r in walks:
        by_walk[r["walk"]][r["step"]] = r["node"]
    want: dict[tuple[str, str], int] = defaultdict(int)
    for steps in by_walk.values():
        for i, ci in steps.items():
            for j, cj in steps.items():
                if i != j and abs(i - j) <= graphalgo.SG_WINDOW:
                    want[(ci, cj)] += 1
    got = {
        (r["center"], r["context"]): r["n"]
        for r in graphalgo.q_walk_skipgrams(spark, SF).collect()
    }
    assert got == dict(want)
    # symmetric window => the pair table is symmetric with equal counts
    for (a, b), n in got.items():
        assert got[(b, a)] == n


def test_line_dedup_matches_bruteforce(spark):
    from sparkmedkg import webclean

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    w = webclean.CHUNK_W
    want = {}
    for r in docs:
        toks = r["text"].split(" ")
        chunks = [
            " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
        ]
        seen, kept = set(), []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        want[r["doc_id"]] = (len(chunks), len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
        for r in webclean.line_dedup(spark, SF).collect()
    }
    assert got == want
    # the fixture corpus contains intra-doc repetition somewhere
    assert any(nk < nc for nc, nk, _ in got.values())


def test_blocklist_suffix_semantics(spark):
    from sparkmedkg import webclean

    rows = webclean.blocklist_filter(spark, SF).collect()
    assert rows
    for r in rows:
        assert any(
            r["host"] == b or r["host"].endswith("." + b)
            for b in webclean.BLOCKLIST
        ), r
        # the reported rule is the longest matching suffix
        matches = [
            b
            for b in webclean.BLOCKLIST
            if r["host"] == b or r["host"].endswith("." + b)
        ]
        assert r["blocked_by"] == max(matches, key=lambda b: (len(b), b))
    # exact-host and parent-domain rules both fire; the miss never does
    fired = {r["blocked_by"] for r in rows}
    assert "www.src3.example.com" in fired
    assert "src7.example.com" in fired
    assert "spam.example.net" not in fired
    # nothing outside the listed suffixes is blocked
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) < n_docs


def test_quantile_sketch_matches_binned_order_statistic(spark):
    import math
    from collections import defaultdict as dd

    from sparkmedkg import relops

    vals = dd(list)
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        vals[r["event_type"]].append(r["value"])
    sk = {
        r["event_type"]: r
        for r in relops.events_quantile_sketch(spark, SF).collect()
    }
    assert set(sk) == set(vals)
    for et, s in sk.items():
        vs = sorted(vals[et])
        assert s["n"] == len(vs)
        for q in (0.5, 0.9, 0.99):
            # the estimate is the lower bin edge of the ceil(q*n)-th order
            # statistic — within max_err of it by construction
            k = math.ceil(q * len(vs))
            true_k = vs[k - 1]
            est = s[f"p{int(q * 100)}_est"]
            want = math.floor(true_k / s["max_err"]) * s["max_err"]
            assert est == want, (et, q, est, want, true_k)
            assert est <= true_k < est + s["max_err"]


def test_zorder_key_bit_interleave(spark):
    from sparkmedkg import relops

    rows = relops.events_zorder_key(spark, SF).collect()
    assert rows
    for r in rows[:500]:
        x, y, z = r["user_bucket"], r["time_bucket"], r["zkey"]
        want = 0
        for i in range(relops.Z_BITS):
            want |= ((x >> i) & 1) << (2 * i)
            want |= ((y >> i) & 1) << (2 * i + 1)
        assert z == want
    # z-order locality: sorting by zkey co-locates both dimensions —
    # adjacent keys differ in at most the full bucket range, and the key
    # is a bijection of (x, y)
    seen = {}
    for r in rows:
        k = (r["user_bucket"], r["time_bucket"])
        if k in seen:
            assert seen[k] == r["zkey"]
        seen[k] = r["zkey"]


def test_bloom_filter_no_false_negatives(spark):
    from sparkmedkg import relops

    rows = relops.bloom_prune_suppliers(spark, SF).collect()
    assert rows
    # the contract: every true member passes the filter
    for r in rows:
        if r["in_dim"]:
            assert r["in_bloom"], r
    # and the filter actually prunes (most non-members rejected)
    non = [r for r in rows if not r["in_dim"]]
    pruned = [r for r in non if not r["in_bloom"]]
    assert non and len(pruned) > len(non) * 0.5, (
        len(pruned),
        len(non),
    )


def test_hybrid_rrf_matches_component_ranks(spark):
    from sparkmedkg import corpusops, simsearch

    bm = sorted(
        corpusops.bm25_topk(spark, SF).collect(),
        key=lambda r: (-r["score"], r["doc_id"]),
    )
    ann = sorted(
        simsearch.cosine_topk(spark, SF).collect(),
        key=lambda r: (-r["cos"], r["vec_id"]),
    )
    bm_rank = {r["doc_id"]: i + 1 for i, r in enumerate(bm)}
    ann_rank = {r["vec_id"]: i + 1 for i, r in enumerate(ann)}
    got = {
        r["doc_id"]: r for r in corpusops.hybrid_rrf(spark, SF).collect()
    }
    assert set(got) == set(bm_rank) | set(ann_rank)
    for d, r in got.items():
        assert r["bm25_rank"] == bm_rank.get(d)
        assert r["ann_rank"] == ann_rank.get(d)
        want = sum(
            1.0 / (corpusops.RRF_K + rk)
            for rk in (bm_rank.get(d), ann_rank.get(d))
            if rk is not None
        )
        assert abs(r["rrf"] - want) < 1e-6
    # docs on both lists outrank single-list docs with the same best rank
    both = [r for r in got.values() if r["bm25_rank"] and r["ann_rank"]]
    if both:
        single = [
            r for r in got.values() if (r["bm25_rank"] is None) != (r["ann_rank"] is None)
        ]
        assert max(r["rrf"] for r in both) >= max(
            (r["rrf"] for r in single), default=0.0
        )


def test_corpus_profile_matches_bruteforce(spark):
    from sparkmedkg import webclean

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {
        r["column"]: r for r in webclean.corpus_profile(spark, SF).collect()
    }
    assert set(got) == set(webclean.PROFILE_COLS)
    for c in webclean.PROFILE_COLS:
        vals = [r[c] for r in docs]
        nn = [v for v in vals if v is not None]
        strs = [str(v) for v in nn]
        r = got[c]
        assert r["n"] == len(vals)
        assert r["n_null"] == len(vals) - len(nn)
        assert r["n_distinct"] == len(set(nn))
        assert r["min_s"] == min(strs)
        assert r["max_s"] == max(strs)


def test_attribution_matches_bruteforce(spark):
    from sparkmedkg import relops

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    want = {}
    for u, rows in by_user.items():
        for p in rows:
            if p["event_type"] != "purchase":
                continue
            pt = p["ts"]
            lo_us = int(pt.timestamp() * 1_000_000) - relops.ATTR_SEC * 1_000_000
            clicks = [
                c
                for c in rows
                if c["event_type"] == "click"
                and lo_us
                <= int(c["ts"].timestamp() * 1_000_000)
                <= int(pt.timestamp() * 1_000_000) - 1
            ]
            key = lambda c: (c["ts"], c["event_id"])  # noqa: E731
            want[p["event_id"]] = (
                u,
                min(clicks, key=key)["event_id"] if clicks else None,
                max(clicks, key=key)["event_id"] if clicks else None,
                len(clicks),
            )
    got = {
        r["event_id"]: (
            r["user_id"],
            r["first_click_id"],
            r["last_click_id"],
            r["n_clicks"],
        )
        for r in relops.events_attribution(spark, SF).collect()
    }
    assert got == want
    assert any(n > 0 for *_, n in got.values())
    assert any(n == 0 for *_, n in got.values()) or len(got) > 0


def test_snapshot_neardup_matches_bruteforce(spark):
    from sparkmedkg import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def shingles(text: str) -> set:
        ws = text.split()
        k = dedup.SHINGLE_K
        n = max(len(ws) - k + 1, 1)
        return {" ".join(ws[i : i + k]) for i in range(n)}

    new = [
        r
        for r in docs
        if r["doc_id"] % dedup.SNAP_OLD_MOD == 0
        and r["doc_id"] % dedup.SNAP_NEW_MOD != 0
    ]
    old = [r for r in docs if r["doc_id"] % dedup.SNAP_OLD_MOD != 0]
    want = set()
    for a in new:
        sa = shingles(a["text"])
        for b in old:
            sb = shingles(b["text"])
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
            if j >= dedup.SNAP_TAU:
                want.add((a["doc_id"], b["doc_id"], round(j, 6)))
    got = {
        (r["new_id"], r["old_id"], r["jaccard"])
        for r in dedup.snapshot_near_dup(spark, SF).collect()
    }
    assert got == want
    assert got  # fixture delta contains near-dups of the old corpus


def test_audio_vad_matches_bruteforce(spark):
    from sparkmedkg import multimodal as mm

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    want = set()
    for r in docs:
        cs = [ord(ch) for ch in r["text"]]
        W, TH = mm.VAD_FRAME, mm.VAD_TH
        nf = (len(cs) - 1) // W + 1
        act = []
        for f in range(nf):
            fr = cs[f * W : (f + 1) * W]
            act.append(sum(fr) >= TH * len(fr))
        seg = 0
        i = 0
        while i < nf:
            if act[i]:
                j = i
                while j + 1 < nf and act[j + 1]:
                    j += 1
                seg += 1
                want.add((r["doc_id"], seg, i + 1, j + 1, j - i + 1))
                i = j + 1
            else:
                i += 1
    got = {
        (
            r["doc_id"],
            r["seg"],
            r["start_frame"],
            r["end_frame"],
            r["n_frames"],
        )
        for r in mm.audio_vad_segments(spark, SF).collect()
    }
    assert got == want
    assert got  # active speech exists in the fixture "audio"


def test_bpe_encode_matches_bruteforce(spark):
    from collections import Counter

    from sparkmedkg import corpusops

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    raw_n = {d: len(t) for d, t in toks.items()}
    for _ in range(corpusops.BPE_ENCODE_M):
        cnt = Counter()
        for t in toks.values():
            for x, y in zip(t, t[1:]):
                cnt[(x, y)] += 1
        cands = [(p, n) for p, n in cnt.items() if p[0] != p[1]]
        (a, b), _n = min(cands, key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        for d, t in toks.items():
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + "_" + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[d] = out
    got = {
        r["doc_id"]: (
            r["n_tokens_raw"],
            r["n_tokens_bpe"],
            r["n_merges_applied"],
        )
        for r in corpusops.bpe_encode(spark, SF).collect()
    }
    want = {
        d: (raw_n[d], len(t), raw_n[d] - len(t)) for d, t in toks.items()
    }
    assert got == want
    assert any(m > 0 for *_, m in got.values())


def test_hll_union_merges_registers(spark):
    from sparkmedkg import webgraph

    row = webgraph.hll_union(spark, SF).collect()[0]
    per_src = webgraph.hll_distinct(spark, SF).collect()
    # exact bookkeeping
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "text"
    ).collect()
    pairs = {(r["source"], r["text"]) for r in docs}
    texts = {t for _, t in pairs}
    assert row["n_sources"] == len({s for s, _ in pairs})
    assert row["sum_exact"] == len(pairs) == sum(r["n_exact"] for r in per_src)
    assert row["n_exact_global"] == len(texts)
    # the union estimate tracks GLOBAL distinct count (within HLL error for
    # m=64, ~13% standard error -> generous 3-sigma bound), and sits well
    # below the naive per-source sum when sources share texts
    est = row["hll_union_est"]
    assert abs(est - len(texts)) / len(texts) < 0.4, (est, len(texts))
    if row["sum_exact"] > 1.5 * row["n_exact_global"]:
        assert est < row["sum_exact"]
