"""Tests for the web-corpus KG queries: lexicon invariants + a Python-oracle
mention check on the sf0.001 documents table."""

import re

from sparkmedkg import webkg

SF = "/root/testdata/sf0.001"


def test_ambiguous_aliases_agree_on_semtype():
    # broadcast_alias_index requires label-unambiguous aliases (the NER label
    # comes from the model side in the reference, not the linker)
    sem = {c[0]: c[3] for c in webkg.WEB_CONCEPTS}
    by_alias: dict[str, set[str]] = {}
    for alias, cui in webkg.WEB_ALIASES:
        by_alias.setdefault(alias, set()).add(sem[cui])
    assert all(len(v) == 1 for v in by_alias.values())


def test_all_alias_cuis_have_concepts():
    cuis = {c[0] for c in webkg.WEB_CONCEPTS}
    assert {c for _, c in webkg.WEB_ALIASES} <= cuis


def test_mentions_match_python_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {
        (r["doc_id"], r["mention"], r["label"])
        for r in webkg.q_mentions(spark, SF).collect()
    }
    pairs = webkg.alias_label_pairs()
    expected = set()
    for row in docs:
        if row["lang"] != "en":
            continue
        padded = " " + row["text"].lower() + " "
        for alias, label in pairs:
            if f" {alias} " in padded:
                expected.add((row["doc_id"], alias, label))
    assert got == expected


def test_links_scores_within_bounds(spark):
    rows = webkg.q_links(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.7 <= r["kb_score"] <= 1.0
    # canonical surface forms must link to their own concept with score 1.0
    exact = {r["source"]: r["kb_score"] for r in rows if r["kb_score"] == 1.0}
    assert "filter" in exact


def test_triples_flagship_shape(spark):
    df = webkg.q_triples(spark, SF)
    assert df.columns == ["src_label", "src_id", "pred", "dst_label", "dst_id"]
    rows = df.collect()
    assert rows
    assert {r["pred"] for r in rows} == {"CONTAINS"}
    levels = {(r["src_label"], r["dst_label"]) for r in rows}
    assert ("SearchTerm", "Paper") in levels
    assert ("Paper", "OPERATOR") in levels
    assert any(dst == "UMLS" for _, dst in levels)
