"""Training-corpus preparation (sparkmedkg/trainprep.py).

Value parity with the DuckDB oracles is covered by the driver gate
(corpus_training_ready, corpus_stratified_sample, kg_triangles); here we
pin the composition semantics and the determinism / scale invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmedkg import dedup, textstats, trainprep

SF = "/root/testdata/sf0.001"


def test_training_ready_is_intersection_of_gates(spark):
    got = {r["doc_id"] for r in trainprep.training_ready(spark, SF).collect()}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    en = {r["doc_id"] for r in docs.where(F.col("lang") == "en").collect()}
    q = {
        r["doc_id"]
        for r in textstats.quality(spark, SF)
        .where(F.col("quality_score") >= trainprep.QUALITY_MIN)
        .collect()
    }
    keep_exact = {r["keep_id"] for r in dedup.exact_dedup(spark, SF).collect()}
    near_drop = {r["b"] for r in dedup.jaccard_pairs(spark, SF).collect()}

    assert got == (en & q & keep_exact) - near_drop
    assert got  # non-degenerate on the fixture corpus


def test_training_ready_drops_near_dup_right_member(spark):
    pairs = dedup.jaccard_pairs(spark, SF).collect()
    assert pairs, "fixture corpus must contain near-dups for this test"
    survivors = {r["doc_id"] for r in trainprep.training_ready(spark, SF).collect()}
    for p in pairs:
        assert p["b"] not in survivors


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    a = sorted(r["doc_id"] for r in trainprep.stratified_sample(spark, SF).collect())
    b = sorted(r["doc_id"] for r in trainprep.stratified_sample(spark, SF).collect())
    assert a == b  # same plan, same sample — no rand()
    rows = trainprep.stratified_sample(spark, SF).collect()
    for r in rows:
        bp = trainprep.SAMPLE_RATES_BP.get(r["lang"], trainprep.SAMPLE_DEFAULT_BP)
        assert 0 <= r["bucket"] < bp


def test_stratified_sample_is_map_only(spark):
    """The sample plan must contain no Exchange — a pure scan + filter."""
    plan = trainprep.stratified_sample(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_triangles_match_bruteforce(spark):
    """Degree-oriented enumeration == brute-force triple-join count."""
    from sparkmedkg.relations import _cooccur_edges

    sym = _cooccur_edges(spark, SF, min_docs=2)
    und = {
        (r["src"], r["dst"])
        for r in sym.collect()
        if r["src"] < r["dst"]
    }
    nodes = sorted({x for e in und for x in e})
    brute = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in und:
                continue
            for c in nodes:
                if c > b and (b, c) in und and (a, c) in und:
                    for v in (a, b, c):
                        brute[v] = brute.get(v, 0) + 1
    got = {
        r["CUI"]: r["n_triangles"]
        for r in trainprep.kg_triangles(spark, SF).collect()
    }
    assert got == brute
    assert brute  # graph has triangles on the fixture corpus
