"""Round-3 thirteenth-batch operators: dedup ensemble voting table."""

from __future__ import annotations

import hashlib

from sparkmedkg import dedup, metrics

SF = "/root/testdata/sf0.001"


def test_dedup_ensemble_matches_detectors(spark):
    lsh = {
        (r["a"], r["b"])
        for r in dedup.lsh_candidate_pairs(spark, SF).collect()
    }
    sim = {(r["a"], r["b"]) for r in dedup.simhash_pairs(spark, SF).collect()}
    jac = {
        (r["a"], r["b"])
        for r in dedup.jaccard_pairs_prefix(
            spark, SF, tau=dedup.JACCARD_TAU
        ).collect()
    }
    emb = {
        (r["a"], r["b"])
        for r in dedup.embedding_near_dups(spark, SF).collect()
    }
    md5 = {
        r["doc_id"]: hashlib.md5(r["text"].encode()).hexdigest()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    rows = metrics.dedup_ensemble(spark, SF).collect()
    got = {(r["a"], r["b"]): r for r in rows}

    # the ensemble is exactly the union of the four sparse pair sets
    assert set(got) == lsh | sim | jac | emb
    assert len(rows) == len(got)  # no duplicate (a, b) rows

    for (a, b), r in got.items():
        assert r["lsh"] == ((a, b) in lsh)
        assert r["simhash"] == ((a, b) in sim)
        assert r["jaccard"] == ((a, b) in jac)
        assert r["embedding"] == ((a, b) in emb)
        assert r["exact"] == (md5[a] == md5[b])
        assert r["n_votes"] == sum(
            (r["lsh"], r["simhash"], r["jaccard"], r["embedding"], r["exact"])
        )

    # non-vacuous: at least one multi-vote pair and one single-vote pair
    votes = [r["n_votes"] for r in rows]
    assert max(votes) >= 2 and min(votes) >= 1
