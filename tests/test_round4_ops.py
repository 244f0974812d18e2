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
