"""Round-3 pattern-mining batch: predicate surface patterns, gap
ablation — brute-force twins over the occurrence primitives."""

from __future__ import annotations

from collections import defaultdict

from sparkmedkg import relations

SF = "/root/testdata/sf0.001"


def test_context_patterns_matches_bruteforce(spark):
    occ = defaultdict(list)
    for r in relations.mention_occurrences(spark, SF).collect():
        occ[r["doc_id"]].append(
            (int(r["start_idx"]), int(r["end_idx"]), r["label"])
        )
    import duckdb

    con = duckdb.connect()
    texts = dict(
        con.execute(
            "SELECT doc_id, lower(text) FROM "
            f"read_parquet('{SF}/documents.parquet') WHERE lang = 'en'"
        ).fetchall()
    )
    con.close()
    counts = defaultdict(int)
    for doc_id, os_ in occ.items():
        ws = texts[doc_id].split(" ")
        for s1, e1, l1 in os_:
            for s2, e2, l2 in os_:
                if 1 <= s2 - e1 <= relations.MAX_GAP + 1:
                    pat = " ".join(ws[e1 + 1:s2])
                    counts[(l1, l2, pat)] += 1
    per_pair = defaultdict(list)
    for (l1, l2, pat), n in counts.items():
        per_pair[(l1, l2)].append((pat, n))
    want = {}
    for key, lst in per_pair.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for rk, (pat, n) in enumerate(lst[: relations.PATTERN_TOPK], 1):
            want[(key[0], key[1], pat)] = (n, rk)
    got = {
        (r["l1"], r["l2"], r["pattern"]): (int(r["n_occ"]), int(r["rk"]))
        for r in relations.q_context_patterns(spark, SF).collect()
    }
    assert got == want


def test_gap_ablation_monotone_and_consistent(spark):
    row = relations.q_gap_ablation(spark, SF).collect()[0]
    g1 = {
        (r["subj_cui"], r["pred"], r["obj_cui"])
        for r in relations.q_relations(spark, SF, max_gap=1).collect()
    }
    g2 = {
        (r["subj_cui"], r["pred"], r["obj_cui"])
        for r in relations.q_relations(spark, SF).collect()
    }
    assert int(row["n_facts_g1"]) == len(g1)
    assert int(row["n_facts_g2"]) == len(g2)
    assert int(row["n_shared"]) == len(g1 & g2)
    # widening the window only ADDS occurrence pairs -> g1 subset of g2
    assert g1 <= g2
    assert int(row["n_shared"]) == len(g1)
    union = len(g1 | g2)
    assert int(row["jaccard_ppm"]) == len(g1 & g2) * 1_000_000 // union
    assert int(row["growth_ppm"]) == (
        (len(g2) - len(g1 & g2)) * 1_000_000 // max(len(g1), 1)
    )
