"""Corpus-level training-data ops (sparkmedkg/corpusops.py).

Value parity with DuckDB is covered by the driver gate (corpus_decontaminate,
corpus_pack_sequences, corpus_bm25_topk); here we pin the semantics against
plain-Python brute force and the packing invariants.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkmedkg import corpusops

SF = "/root/testdata/sf0.001"


def _doc_texts(spark):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def _py_shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    if len(toks) <= k:
        return {" ".join(toks[:k])}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_decontaminate_matches_bruteforce(spark):
    texts = _doc_texts(spark)
    eval_sh = set()
    for d, t in texts.items():
        if d % corpusops.EVAL_MOD == 0:
            eval_sh |= _py_shingles(t, corpusops.DECON_K)
    want = {}
    for d, t in texts.items():
        if d % corpusops.EVAL_MOD == 0:
            continue
        n = len(_py_shingles(t, corpusops.DECON_K) & eval_sh)
        if n:
            want[d] = n
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in corpusops.decontaminate(spark, SF).collect()
    }
    assert got == want
    assert want, "fixture corpus must actually contain contaminated docs"


def test_pack_sequences_invariants(spark):
    rows = sorted(
        corpusops.pack_sequences(spark, SF).collect(),
        key=lambda r: r["doc_id"],
    )
    # contiguous stream: each doc starts where the previous ended
    off = 0
    for r in rows:
        assert r["start_off"] == off
        off += r["n_tokens"]
        assert r["first_seq"] == r["start_off"] // corpusops.PACK_BLOCK
        assert (
            r["last_seq"]
            == (r["start_off"] + r["n_tokens"] - 1) // corpusops.PACK_BLOCK
        )
    # every fixed-size block except the tail is fully covered
    assert rows[-1]["last_seq"] == (off - 1) // corpusops.PACK_BLOCK


def test_bm25_matches_bruteforce(spark):
    texts = _doc_texts(spark)
    k1, b = corpusops.BM25_K1, corpusops.BM25_B
    dls = {d: len(t.split()) for d, t in texts.items()}
    n_docs = len(texts)
    avgdl = sum(dls.values()) / n_docs
    scores = {}
    for term in corpusops.BM25_TERMS:
        df = sum(1 for t in texts.values() if term in t.split())
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        for d, t in texts.items():
            tf = t.split().count(term)
            part = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dls[d] / avgdl)
            )
            scores[d] = scores.get(d, 0.0) + part
    want = sorted(
        ((d, s) for d, s in scores.items() if s > 0),
        key=lambda x: (-x[1], x[0]),
    )[: corpusops.BM25_TOPK]
    got = [
        (r["doc_id"], r["score"])
        for r in corpusops.bm25_topk(spark, SF).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (gd, gs, ws)


def test_bm25_plan_has_no_token_explode(spark):
    """The corpus must never be exploded to (doc, token) rows: tf comes
    from array ops inside the scan projection."""
    plan = (
        corpusops.bm25_topk(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan  # Generate == explode operator


def test_pack_sequences_df_wrapper_equivalence(spark):
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    via_dir = {tuple(r) for r in corpusops.pack_sequences(spark, sf).collect()}
    via_df = {
        tuple(r)
        for r in corpusops.pack_sequences_df(
            spark.read.parquet(f"{sf}/documents.parquet")
        ).collect()
    }
    assert via_dir == via_df
    # packing a FILTERED corpus yields a contiguous, gap-free token stream
    sub = spark.read.parquet(f"{sf}/documents.parquet").where(
        F.col("doc_id") % 3 == 0
    )
    rows = sorted(
        corpusops.pack_sequences_df(sub).collect(), key=lambda r: r["doc_id"]
    )
    off = 0
    for r in rows:
        assert r["start_off"] == off
        off += r["n_tokens"]


def test_mask_contaminated_consistent_with_decontaminate(spark):
    sf = "/root/testdata/sf0.001"
    masked = {
        r["doc_id"]: r
        for r in corpusops.mask_contaminated(spark, sf).collect()
    }
    flagged = {
        r["doc_id"] for r in corpusops.decontaminate(spark, sf).collect()
    }
    # a doc has masked tokens iff decontaminate flagged it
    assert {d for d, r in masked.items() if r["n_masked"] > 0} == flagged
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    for d, r in masked.items():
        orig = [t for t in docs[d].split(" ") if t]
        out = r["masked_text"].split(" ")
        assert len(out) == len(orig)
        assert sum(1 for t in out if t == "<mask>") == r["n_masked"]
        # unmasked positions are byte-identical to the original tokens
        assert all(
            o == w for o, w in zip(out, orig) if o != "<mask>"
        )


def test_bpe_pair_counts_shape(spark):
    from sparkmedkg import corpusops

    sf = "/root/testdata/sf0.001"
    rows = corpusops.bpe_pair_counts(spark, sf).collect()
    assert len(rows) == corpusops.BPE_TOPK
    # descending counts, each pair is two space-joined tokens
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(len(r["pair"].split(" ")) == 2 for r in rows)


def test_tfidf_keywords_contract(spark):
    from sparkmedkg import corpusops

    sf = "/root/testdata/sf0.001"
    out = corpusops.tfidf_keywords(spark, sf).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    n_docs = len(per_doc)
    assert n_docs > 0
    for doc, rs in per_doc.items():
        assert 1 <= len(rs) <= corpusops.TFIDF_TOPK
        scores = [r["score"] for r in rs]
        # integer-exact scores, no float boundary
        assert all(isinstance(s, int) for s in scores)


def test_countmin_overestimates_never_under(spark):
    from sparkmedkg import corpusops

    rows = corpusops.countmin_freq(spark, "/root/testdata/sf0.001").collect()
    assert {r["term"] for r in rows} == set(corpusops.CMS_TERMS)
    for r in rows:
        # count-min property: estimate >= true frequency
        assert r["cms_est"] >= r["exact_n"], r


def test_bpe_merge_step_removes_winning_pair(spark):
    from sparkmedkg import corpusops

    sf = "/root/testdata/sf0.001"
    before = corpusops.bpe_pair_counts(spark, sf, topk=200).collect()
    # the winning pair: most frequent with distinct tokens
    win = next(
        r["pair"] for r in before
        if r["pair"].split(" ")[0] != r["pair"].split(" ")[1]
    )
    after = corpusops.bpe_merge_step(spark, sf, topk=1_000_000).collect()
    after_pairs = {r["pair"] for r in after}
    a, b = win.split(" ")
    # every adjacent (a, b) occurrence was merged away
    assert win not in after_pairs
    # the merged symbol participates in new pairs
    assert any(f"{a}_{b}" in p.split(" ") for p in after_pairs)
