"""Round-4 additions: ComplEx and RotatE-analog link-prediction ranking."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from sparkmedkg import kgembed, relations

SF = "/root/testdata/sf0.001"


def _emb(x: str, kind: str, i: int) -> int:
    h = hashlib.md5(f"{x}|{kind}|{i}".encode()).hexdigest()
    return int(h[:15], 16) % kgembed.EMB_MOD


def _cx_score(s: str, p: str, o: str) -> int:
    tot = 0
    for i in range(kgembed.EMB_DIM):
        hr, hi = _emb(s, "cr", i), _emb(s, "ci", i)
        rr, ri = _emb(p, "rr2", i), _emb(p, "ri", i)
        tr, ti = _emb(o, "cr", i), _emb(o, "ci", i)
        tot += hr * rr * tr + hi * rr * ti + hr * ri * ti - hi * ri * tr
    return tot


def _rot_dist(s: str, p: str, o: str) -> int:
    m = kgembed.EMB_MOD
    tot = 0
    for i in range(kgembed.EMB_DIM):
        d = (_emb(s, "e", i) + _emb(p, "ph", i) - _emb(o, "e", i)) % m
        tot += min(d, m - d)
    return tot


def _by_pos(spark):
    neg = relations.q_negative_triples(spark, SF).collect()
    by_pos = defaultdict(list)
    for r in neg:
        by_pos[(r["subj_cui"], r["pred"], r["obj_cui"])].append(
            r["neg_obj_cui"]
        )
    return by_pos


def test_complex_rank_bruteforce(spark):
    by_pos = _by_pos(spark)
    got = {
        (r["subj_cui"], r["pred"], r["obj_cui"]): (
            r["pos_score"], r["n_neg"], r["pos_rank"]
        )
        for r in kgembed.q_complex_rank(spark, SF).collect()
    }
    assert set(got) == set(by_pos)
    for (s, p, o), negs in by_pos.items():
        pos = _cx_score(s, p, o)
        rank = 1 + sum(1 for n in negs if _cx_score(s, p, n) > pos)
        assert got[(s, p, o)] == (pos, len(negs), rank)


def test_complex_models_asymmetry():
    """The reason ComplEx exists: score(h,r,t) != score(t,r,h) in general
    (DistMult's diagonal bilinear form is symmetric by construction)."""
    sym_breaks = sum(
        1
        for a, b in [("C001", "C002"), ("C003", "C004"), ("C005", "C006")]
        if _cx_score(a, "affects", b) != _cx_score(b, "affects", a)
    )
    assert sym_breaks == 3


def test_rotate_rank_bruteforce(spark):
    by_pos = _by_pos(spark)
    got = {
        (r["subj_cui"], r["pred"], r["obj_cui"]): (
            r["pos_dist"], r["n_neg"], r["pos_rank"]
        )
        for r in kgembed.q_rotate_rank(spark, SF).collect()
    }
    assert set(got) == set(by_pos)
    for (s, p, o), negs in by_pos.items():
        pos = _rot_dist(s, p, o)
        rank = 1 + sum(1 for n in negs if _rot_dist(s, p, n) < pos)
        assert got[(s, p, o)] == (pos, len(negs), rank)
    # circular distance is bounded per dimension by M/2
    assert all(
        v[0] <= kgembed.EMB_DIM * (kgembed.EMB_MOD // 2)
        for v in got.values()
    )


def test_rotate_phase_composition():
    """Phase rotations compose additively: rotating by r1 then r2 equals
    rotating by (r1+r2) mod M per dimension — the RotatE property the
    integer lane preserves exactly."""
    m = kgembed.EMB_MOD
    for i in range(kgembed.EMB_DIM):
        r1 = _emb("treats", "ph", i)
        r2 = _emb("causes", "ph", i)
        h = _emb("C010", "e", i)
        assert ((h + r1) % m + r2) % m == (h + (r1 + r2) % m) % m


def test_kge_scorecard_consistency(spark):
    """The scorecard rows must be recomputable from the four rank tables:
    exact integer MRR and monotone hits1 <= hits3 <= hits10 <= n."""
    ranks = {
        "transe": [r["pos_rank"] for r in kgembed.q_transe_rank(spark, SF).collect()],
        "distmult": [r["pos_rank"] for r in kgembed.q_distmult_rank(spark, SF).collect()],
        "complex": [r["pos_rank"] for r in kgembed.q_complex_rank(spark, SF).collect()],
        "rotate": [r["pos_rank"] for r in kgembed.q_rotate_rank(spark, SF).collect()],
    }
    got = {
        r["model"]: r for r in kgembed.q_kge_scorecard(spark, SF).collect()
    }
    assert set(got) == set(ranks)
    for model, rs in ranks.items():
        row = got[model]
        assert row["n_triples"] == len(rs)
        assert row["mrr_ppm"] == sum(1_000_000 // r for r in rs) // len(rs)
        h1 = sum(1 for r in rs if r <= 1)
        h3 = sum(1 for r in rs if r <= 3)
        h10 = sum(1 for r in rs if r <= 10)
        assert (row["hits1"], row["hits3"], row["hits10"]) == (h1, h3, h10)
        assert h1 <= h3 <= h10 <= len(rs)


# ---------------------------------------------------------------------------
# Assertion status / mention qualifiers (NegEx-style window triggers)
# ---------------------------------------------------------------------------

def test_mention_qualifiers_bruteforce(spark):
    """Recompute (mention, nearest-qualifier, count) in pure Python from
    the same tokenization and window rule."""
    import duckdb as _dd
    from collections import Counter

    from sparkmedkg import webkg

    con = _dd.connect()
    docs = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE lang = 'en'"
    ).fetchall()
    con.close()
    single = {a for a, _ in webkg.alias_label_pairs() if " " not in a}
    trigs = set(webkg.QUAL_TRIGGERS)
    want: Counter = Counter()
    for (text,) in docs:
        toks = [t for t in text.lower().split(" ") if t != ""]
        for p, tok in enumerate(toks):
            if tok not in single:
                continue
            q = ""
            for j in range(max(0, p - webkg.QUAL_WINDOW), p):
                if toks[j] in trigs:
                    q = toks[j]  # later (nearer) trigger wins
            want[(tok, q)] += 1
    got = {
        (r["mention"], r["qualifier"]): r["n_occ"]
        for r in webkg.q_mention_qualifiers(spark, SF).collect()
    }
    assert got == dict(want)
    # non-vacuous: some occurrences are qualified, some are not
    assert any(q for (_, q) in got)
    assert any(not q for (_, q) in got)


def test_mention_qualifiers_negex_on_medical_corpus(spark, tmp_path):
    """The medical deployment of the same operator: real NegEx cues over
    the medical fixture corpus — 'Methotrexate is not a treatment for
    hyperthyroidism' must yield a not-qualified hyperthyroidism mention."""
    from sparkmedkg import fixtures, webkg

    rows = [
        (i, r[3], r[4])  # (doc_id, text, lang)
        for i, r in enumerate(fixtures.gen_doc_rows(300))
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    lex = (
        "hyperthyroidism", "phenylketonuria", "epilepsy", "aspirin",
        "phenylalanine",
    )
    got = {
        (r["mention"], r["qualifier"]): r["n_occ"]
        for r in webkg.q_mention_qualifiers(
            spark,
            str(tmp_path),
            triggers=("no", "not", "without", "never"),
            window=4,
            lexicon=lex,
        ).collect()
    }
    # 'does not respond to dietary phenylalanine restriction': the cue
    # sits exactly window tokens before the mention
    assert got.get(("phenylalanine", "not"), 0) > 0
    # plain mentions of every disease term exist unqualified
    for term in ("hyperthyroidism", "phenylketonuria", "epilepsy",
                 "aspirin"):
        assert got.get((term, ""), 0) > 0
    # tokenization is punctuation-naive by design: 'epilepsy.' != 'epilepsy'
    # (the corpus-wide split-on-spaces convention) — sanity: counts positive
    assert sum(got.values()) > 0


def test_asserted_cooccurrence_suppresses_negated(spark):
    """Bruteforce the assertion-gated edge build, and pin the semantics:
    the asserted edge set differs from the raw qualifier-blind one only
    by pairs whose support relied on suppressed occurrences."""
    import duckdb as _dd
    from collections import Counter

    from sparkmedkg import webkg

    con = _dd.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE lang = 'en'"
    ).fetchall()
    con.close()
    single = {a for a, _ in webkg.alias_label_pairs() if " " not in a}
    trigs = set(webkg.QUAL_TRIGGERS)
    negs = set(webkg.NEG_QUALIFIERS)
    per_doc: dict = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split(" ") if t != ""]
        kept = set()
        for p, tok in enumerate(toks):
            if tok not in single:
                continue
            q = ""
            for j in range(max(0, p - webkg.QUAL_WINDOW), p):
                if toks[j] in trigs:
                    q = toks[j]
            if q not in negs:
                kept.add(tok)
        per_doc[doc_id] = kept
    want: Counter = Counter()
    for kept in per_doc.values():
        ks = sorted(kept)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                want[(ks[i], ks[j])] += 1
    want = {k: v for k, v in want.items() if v >= 2}
    got = {
        (r["e1"], r["e2"]): r["n_docs"]
        for r in webkg.q_asserted_cooccurrence(spark, SF).collect()
    }
    assert got == want
    # suppression is real on this corpus: some doc keeps fewer mentions
    # under the gate than it has raw lexicon occurrences
    raw_any = any(
        len(per_doc[d]) < len({t for t in txt.lower().split(" ")
                               if t in single})
        for d, txt in docs
    )
    assert raw_any


def test_ring_plan_bruteforce(spark):
    """Recompute the ring assignment in pure Python and pin the arc
    accounting: arcs partition the 2^60 space exactly, every doc lands on
    the shard owning its clockwise-next vnode, and load_ppm sums to ~1e6."""
    import duckdb as _dd
    import hashlib

    from sparkmedkg import shardops

    ring = shardops._ring()
    arcs = shardops._ring_arcs()
    assert sum(arcs.values()) == 1 << 60
    con = _dd.connect()
    ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    ]
    con.close()
    from collections import Counter

    want: Counter = Counter()
    hs = [h for h, _ in ring]
    import bisect

    for d in ids:
        kh = int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
        i = bisect.bisect_left(hs, kh)
        s = ring[i][1] if i < len(ring) else ring[0][1]
        want[s] += 1
    got = {
        r["shard"]: r for r in shardops.ring_plan(spark, SF).collect()
    }
    assert set(got) == set(range(1, shardops.SHARDS + 1))
    total = sum(want.values())
    for s, row in got.items():
        assert row["n_docs"] == want.get(s, 0)
        assert row["n_vnodes"] == shardops.RING_VNODES
        assert row["arc_ppm"] == (arcs[s] * 1_000_000) >> 60
        assert row["load_ppm"] == 1_000_000 * want.get(s, 0) // total
        assert row["skew_vs_arc_ppm"] == row["load_ppm"] - row["arc_ppm"]
    s_ppm = sum(r["load_ppm"] for r in got.values())
    assert 1_000_000 - shardops.SHARDS <= s_ppm <= 1_000_000
