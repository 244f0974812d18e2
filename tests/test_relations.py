"""Typed relation extraction + PageRank (sparkmedkg/relations.py).

Oracle-value parity is covered by the driver gate (kg_relations,
kg_pagerank); here we pin the positional semantics, the equivalence with
the trie NER's mention set, and PageRank's conservation invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkmedkg import ner, relations, webkg

SF = "/root/testdata/sf0.001"


def test_occurrence_spans_exact(spark, tmp_path):
    """Hand corpus: every word-boundary alias occurrence with its 0-based
    token span, including overlapping multi-word aliases."""
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "hash join the table scan", "en")], "doc_id long, text string, lang string"
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        (r["doc_id"], r["start_idx"], r["end_idx"], r["mention"])
        for r in relations.mention_occurrences(spark, d).collect()
    }
    assert got == {
        (1, 0, 0, "hash"),
        (1, 0, 1, "hash join"),
        (1, 1, 1, "join"),
        (1, 3, 3, "table"),
        (1, 3, 4, "table scan"),
        (1, 4, 4, "scan"),
    }


def test_occurrences_match_trie_ner_mention_set(spark):
    """The positional matcher finds exactly the trie NER's (doc, mention)
    set — same word-boundary semantics, position-bearing."""
    occ = {
        (r["doc_id"], r["mention"])
        for r in relations.mention_occurrences(spark, SF)
        .select(F.col("doc_id").cast("string").alias("doc_id"), "mention")
        .distinct()
        .collect()
    }
    trie = {
        (r["url"], r["mention"])
        for r in ner.detect_mentions(
            webkg.docs_df(spark, SF).where(F.col("lang") == "en"),
            webkg.alias_bc(spark),
            mode="all",
        )
        .select("url", "mention")
        .distinct()
        .collect()
    }
    assert occ == trie


def test_relations_typed_and_supported(spark):
    rows = relations.q_relations(spark, SF).collect()
    assert rows
    preds = {r["pred"] for r in rows}
    assert preds <= set(relations.PRED_BY_PAIR.values())
    for r in rows:
        assert r["subj_cui"] != r["obj_cui"]
        assert 1 <= r["n_docs"] <= r["n_occ"]


def test_relations_gap_zero_is_adjacent_subset(spark):
    """Tightening the window can only remove pairs / reduce support."""
    wide = {
        (r["subj_cui"], r["pred"], r["obj_cui"]): r["n_occ"]
        for r in relations.q_relations(spark, SF, max_gap=2).collect()
    }
    adj = {
        (r["subj_cui"], r["pred"], r["obj_cui"]): r["n_occ"]
        for r in relations.q_relations(spark, SF, max_gap=0).collect()
    }
    assert set(adj) <= set(wide)
    for k, n in adj.items():
        assert n <= wide[k]


def test_pagerank_conserves_mass_and_is_positive(spark):
    rows = relations.q_pagerank(spark, SF).collect()
    assert rows
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)
    assert all(r["pagerank"] > 0 for r in rows)


def test_pagerank_two_node_graph_analytic(spark, tmp_path):
    """Two entities always co-occurring -> symmetric 2-cycle; PageRank is
    exactly 0.5 each at every iteration."""
    d = str(tmp_path / "docs")
    # 'filter' -> W0004 and 'query' -> W0008 both self-link at score 1.0
    spark.createDataFrame(
        [(i, "filter query", "en") for i in range(3)],
        "doc_id long, text string, lang string",
    ).write.parquet(f"{d}/documents.parquet")
    rows = relations.q_pagerank(spark, d).collect()
    got = {r["CUI"]: r["pagerank"] for r in rows}
    assert got == {"W0004": 0.5, "W0008": 0.5}


def test_mention_contexts_window(spark):
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = relations.q_mention_contexts(spark, sf).collect()
    assert rows
    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .where(F.col("lang") == "en")
        .collect()
    }
    for r in rows[:200]:
        ws = docs[r["doc_id"]]
        n_m = len(r["mention"].split(" "))
        lo = max(r["start_idx"] - relations.CTX_W, 0)
        hi = min(r["start_idx"] + n_m - 1 + relations.CTX_W, len(ws) - 1)
        assert r["context"] == " ".join(ws[lo:hi + 1])
        # the mention itself sits inside the window
        assert r["mention"] in r["context"]


def test_negative_triples_filtered_setting(spark):
    sf = "/root/testdata/sf0.001"
    pos = {
        (r["subj_cui"], r["pred"], r["obj_cui"])
        for r in relations.q_relations(spark, sf).collect()
    }
    entities = {s for s, _, _ in pos} | {o for _, _, o in pos}
    neg = relations.q_negative_triples(spark, sf).collect()
    assert neg
    for r in neg:
        # every negative corrupts a real positive...
        assert (r["subj_cui"], r["pred"], r["obj_cui"]) in pos
        # ...into a tail that is a real entity but NOT a true triple
        assert r["neg_obj_cui"] in entities
        assert r["neg_obj_cui"] != r["obj_cui"]
        assert (r["subj_cui"], r["pred"], r["neg_obj_cui"]) not in pos
        assert 0 <= r["neg_idx"] < relations.NEG_K
    # determinism: re-running yields the identical multiset
    again = relations.q_negative_triples(spark, sf).collect()
    key = lambda r: (r["subj_cui"], r["pred"], r["obj_cui"], r["neg_idx"])
    assert sorted(map(key, neg)) == sorted(map(key, again))
