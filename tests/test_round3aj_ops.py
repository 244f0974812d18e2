"""Round-3 KG-QA batch: weak-supervision label model, domain/range
schema audit, sentence-segmentation profile.

Oracle-value parity is covered by the driver gate (selfcheck-verified);
here we pin semantic invariants and brute-force twins.
"""

from __future__ import annotations

import re

import duckdb

from sparkmedkg import relations, textstats

SF = "/root/testdata/sf0.001"


def test_weak_supervision_vote_semantics(spark):
    rows = relations.q_weak_supervision_vote(spark, SF).collect()
    assert rows
    for r in rows:
        votes = int(r["lf_support"]) + int(r["lf_pmi"]) + int(r["lf_llr"])
        assert r["votes"] == votes
        assert bool(r["label"]) is (votes >= 2)
        assert r["n_ab"] >= 1
        assert bool(r["lf_support"]) is (r["n_ab"] >= 2)


def test_weak_supervision_llr_flag_matches_llr_scores(spark):
    # lf_llr on the supported pairs must agree with the already
    # oracle-proven q_llr_scores statistic at the same 95% cut.
    llr = {
        (r["src"], r["dst"]): r["llr"]
        for r in relations.q_llr_scores(spark, SF).collect()
    }
    ws = {
        (r["subj_cui"], r["obj_cui"]): r
        for r in relations.q_weak_supervision_vote(spark, SF).collect()
    }
    supported = {k for k, r in ws.items() if r["lf_support"]}
    assert supported == set(llr)
    for k in supported:
        assert bool(ws[k]["lf_llr"]) is (llr[k] >= relations.LLR_CRIT_95)


def test_domain_range_audit_schema_conformance(spark):
    rows = relations.q_domain_range_audit(spark, SF).collect()
    assert rows
    schema_pairs = {
        (p, l1, l2) for (l1, l2), p in relations.PRED_BY_PAIR.items()
    }
    for r in rows:
        key = (r["pred"], r["subj_semtype"], r["obj_semtype"])
        assert bool(r["conforms"]) is (key in schema_pairs)
        assert r["n_facts"] >= 1
    # every extracted fact has both semtypes (concept table is total),
    # so the rollup partitions the fact set exactly
    n_facts = relations.q_relations(spark, SF).count()
    assert sum(r["n_facts"] for r in rows) == n_facts


def test_sentence_stats_matches_bruteforce(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    want = {}
    for doc_id, text in docs:
        sents = [s.strip() for s in re.split(r"[.!?]+", text)]
        sents = [s for s in sents if s]
        if not sents:
            continue
        nt = [len([t for t in re.split(" +", s) if t]) for s in sents]
        tot = sum(nt)
        want[doc_id] = (
            len(sents),
            tot,
            tot * 1000 // len(sents),
            max(nt),
            sum(1 for x in nt if x <= 3),
        )
    got = {
        r["doc_id"]: (
            int(r["n_sents"]),
            int(r["n_toks"]),
            int(r["mean_sent_toks_milli"]),
            int(r["max_sent_toks"]),
            int(r["n_short_sents"]),
        )
        for r in textstats.sentence_stats(spark, SF).collect()
    }
    assert got == want
