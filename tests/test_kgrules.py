"""Round-3 KG-construction batch: AMIE rule mining, predicate
functionality audit, noisy-or triple confidence, Resnik/Lin IC
similarity, fastText-style hashed scorer, and the north-rule triple P/R
scorecard.

Oracle-value parity is covered by the driver gate (selfcheck-verified);
here we pin the semantic invariants each operator promises.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sparkmedkg import hierarchy, relations, textstats, webkg

SF = "/root/testdata/sf0.001"


def test_amie_rules_invariants(spark):
    rows = relations.q_amie_rules(spark, SF).collect()
    assert rows, "expected at least one mined rule at sf0.001"
    preds = set(relations.PRED_BY_PAIR.values())
    for r in rows:
        assert r["rule_type"] in ("inverse", "chain")
        assert r["head_pred"] in preds and r["body_pred_1"] in preds
        if r["rule_type"] == "inverse":
            assert r["body_pred_2"] == ""
        else:
            assert r["body_pred_2"] in preds
        # confidence/head-coverage are exact ppm ratios of their counts
        assert r["support"] >= relations.RULE_MIN_SUPPORT
        assert r["support"] <= r["n_body"]
        assert r["conf_ppm"] == r["support"] * 1_000_000 // r["n_body"]
        assert r["hc_ppm"] == r["support"] * 1_000_000 // r["n_head"]
    # the extractor's typing makes OPERATES_ON(x,y) co-exist with
    # INPUT_TO(y,x) whenever the reversed-order pair also occurs in-gap:
    # the miner must surface that inverse rule shape
    assert any(
        r["rule_type"] == "inverse"
        and {r["head_pred"], r["body_pred_1"]} == {"OPERATES_ON", "INPUT_TO"}
        for r in rows
    )


def test_amie_fanout_cap_drops_hub_chains(spark):
    """With a fanout cap of 0 every chain-join entity z is 'hot', so no
    chain rules survive; inverse rules are unaffected."""
    rows = relations.q_amie_rules(spark, SF, fanout_cap=0).collect()
    assert rows and all(r["rule_type"] == "inverse" for r in rows)


def test_functional_audit_bounds(spark):
    rows = relations.q_functional_audit(spark, SF).collect()
    assert {r["pred"] for r in rows} <= set(relations.PRED_BY_PAIR.values())
    for r in rows:
        assert 0 < r["n_subj"] <= r["n_facts"]
        assert 0 < r["n_obj"] <= r["n_facts"]
        assert r["fun_ppm"] == r["n_subj"] * 1_000_000 // r["n_facts"]
        assert r["n_multi_subj"] <= r["n_subj"]
        # a predicate is functional iff no subject has 2+ objects
        assert (r["fun_ppm"] == 1_000_000) == (r["n_multi_subj"] == 0)


def test_triple_confidence_noisy_or(spark):
    rows = relations.q_triple_confidence(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 2
        assert 0.0 < r["conf6"] <= 1.0
    # noisy-or with evidence p <= prior: conf can never exceed
    # 1 - (1-prior)^n and never fall below a single max-evidence doc's p
    cap = {r["n_docs"]: 1 - (1 - relations.EVIDENCE_PRIOR) ** r["n_docs"]
           for r in rows}
    for r in rows:
        assert r["conf6"] <= cap[r["n_docs"]] + 1e-6


def test_resnik_lin_ic_semantics(spark):
    rows = hierarchy.resnik_lin(spark, SF).collect()
    assert rows
    by_pair = {(r["a"], r["b"]): r for r in rows}
    # same pair universe + same LCA choice as wu_palmer (shared lca_pairs)
    wp = {(r["a"], r["b"]): r["lca"] for r in hierarchy.wu_palmer(spark, SF).collect()}
    assert {k: v["lca"] for k, v in by_pair.items()} == wp
    for r in rows:
        assert r["resnik6"] >= 0.0
        assert 0.0 <= r["lin6"] <= 1.0 + 1e-9


def test_fasttext_score_matches_python(spark):
    rows = textstats.fasttext_score(spark, SF).orderBy("doc_id").limit(3).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id").limit(3).collect()
    }
    import re

    half = textstats.FT_BUCKETS // 2
    for r in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", docs[r["doc_id"]].lower()) if t]
        wsum = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            % textstats.FT_BUCKETS - half
            for t in toks
        )
        assert r["n_toks"] == len(toks)
        assert r["w_sum"] == wsum
        score = 1.0 / (1.0 + math.exp(-wsum / (len(toks) * float(half))))
        assert abs(r["score6"] - round(score, 6)) < 1e-9
        assert r["keep"] == (wsum > 0)


def test_triple_pr_lanes_agree(spark):
    row = webkg.q_triple_pr(spark, SF).collect()[0]
    assert row["meets_north_rule"] is True
    assert row["precision_ppm"] == 1_000_000
    assert row["recall_ppm"] == 1_000_000
    assert row["n_ref"] == row["n_sys"] == row["n_common"] > 0
