"""Incremental / temporal KG maintenance invariants (sparkmedkg.kgdelta).

Value-level parity with DuckDB is covered by the oracle gate
(__spark_entry__ entries kg_incremental_update, kg_temporal_edges,
kg_nil_clusters, kg_salt_plan, stream_kg_mentions_replay); these tests pin
the algebraic invariants the oracles alone can't express — merge
consistency with the monolithic rebuild, status partitioning, temporal
bounds, NIL/confident disjointness, and streaming == batch equality.
"""

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from sparkmedkg import kgdelta, relations

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def incremental(spark):
    return kgdelta.incremental_update(spark, SF).collect()


def test_incremental_merge_equals_monolithic_rebuild(spark, incremental):
    """The delta-merged edge set must be value-identical to a from-scratch
    rebuild over the full corpus: same pairs, same total support."""
    full = {
        (r["subj_cui"], r["obj_cui"]): r["n_full"]
        for r in kgdelta._pair_counts(
            relations.doc_cui_cached(spark, SF), "n_full"
        ).collect()
    }
    merged = {
        (r["subj_cui"], r["obj_cui"]): r["n_total"] for r in incremental
    }
    assert merged == full


def test_incremental_with_stored_base_edges(spark, incremental):
    """Passing a materialized base edge table (the deployment form — the
    stored graph, no corpus rescan) must give exactly the derived-base
    result."""
    base = kgdelta._pair_counts(
        relations.doc_cui_cached(spark, SF).where(~kgdelta._delta_pred()),
        "n_base",
    ).localCheckpoint(eager=True)
    got = {
        (r["subj_cui"], r["obj_cui"]): (
            r["n_base"], r["n_delta"], r["n_total"], r["status"]
        )
        for r in kgdelta.incremental_update(spark, SF, base_edges=base).collect()
    }
    want = {
        (r["subj_cui"], r["obj_cui"]): (
            r["n_base"], r["n_delta"], r["n_total"], r["status"]
        )
        for r in incremental
    }
    assert got == want


def test_incremental_status_partition(incremental):
    for r in incremental:
        assert r["n_total"] == r["n_base"] + r["n_delta"] > 0
        if r["n_base"] == 0:
            assert r["status"] == "new" and r["n_delta"] > 0
        elif r["n_delta"] == 0:
            assert r["status"] == "unchanged"
        else:
            assert r["status"] == "updated"
    # the fixture split must actually exercise all three classes
    assert {r["status"] for r in incremental} == {
        "new", "updated", "unchanged"
    }


def test_temporal_bounds(spark):
    from datetime import date

    rows = kgdelta.temporal_edges(spark, SF).collect()
    assert rows
    for r in rows:
        first = date.fromisoformat(r["first_seen"])
        last = date.fromisoformat(r["last_seen"])
        assert first <= last
        assert r["span_days"] == (last - first).days + 1
        assert 1 <= r["n_days"] <= min(r["span_days"], r["n_docs"])


def test_nil_disjoint_and_deterministic(spark):
    nil = kgdelta.nil_clusters(spark, SF).collect()
    assert nil, "fixture lexicon must produce NIL surfaces"
    reasons = {r["reason"] for r in nil}
    assert reasons <= {"no_candidate", "low_confidence"}
    for r in nil:
        digest = hashlib.md5(r["surface"].encode()).hexdigest()[:8]
        assert r["nil_id"] == f"NIL_{digest}"
        if r["reason"] == "no_candidate":
            assert r["best_score"] is None
        else:
            assert r["best_score"] < kgdelta.NIL_THRESHOLD
    # NIL surfaces are exactly the complement of confidently-linked ones
    confident = {
        r["mention"]
        for r in kgdelta.link.link_mentions(
            kgdelta.ner.detect_mentions(
                kgdelta.webkg.docs_df(spark, SF).where(F.col("lang") == "en"),
                kgdelta.webkg.alias_bc(spark),
                mode="all",
            ),
            kgdelta.webkg.aliases_df(spark),
            kgdelta.webkg.concepts_df(spark),
        )
        .groupBy(F.col("source").alias("mention"))
        .agg(F.max("kb_score").alias("s"))
        .where(F.col("s") >= kgdelta.NIL_THRESHOLD)
        .collect()
    }
    assert confident.isdisjoint({r["surface"] for r in nil})


def test_alias_candidates_are_nil_and_confident(spark):
    """Every candidate surface is a NIL surface; every (surface, CUI)
    passes both gates; conf_ppm is the exact integer ratio."""
    cands = kgdelta.alias_candidates(spark, SF).collect()
    assert cands
    nil_surfaces = {
        r["surface"] for r in kgdelta.nil_clusters(spark, SF).collect()
    }
    for r in cands:
        assert r["surface"] in nil_surfaces
        assert r["n_co"] >= kgdelta.ALIAS_MIN_CO
        assert 0 < r["n_co"] <= r["n_s"]
        assert r["conf_ppm"] == r["n_co"] * 1_000_000 // r["n_s"]
        assert r["conf_ppm"] >= kgdelta.ALIAS_TAU_PPM


def test_source_diversity_invariants(spark):
    """hhi is exact, bounded, and 1e6 exactly when one source carries
    the whole edge; n_sources consistent with the support."""
    rows = kgdelta.source_diversity(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_sources"] <= r["n_docs"]
        # HHI bounds: 1e6/n_sources <= hhi <= 1e6 (floor-div slack of 1)
        assert r["hhi_ppm"] <= 1_000_000
        assert r["hhi_ppm"] >= 1_000_000 // r["n_sources"] - 1
        if r["n_sources"] == 1:
            assert r["hhi_ppm"] == 1_000_000
    # edge set and support must match the plain co-occurrence counts
    base = {
        (r["subj_cui"], r["obj_cui"]): r["n_full"]
        for r in kgdelta._pair_counts(
            relations.doc_cui_cached(spark, SF), "n_full"
        ).collect()
    }
    assert {(r["subj_cui"], r["obj_cui"]): r["n_docs"] for r in rows} == base


def test_salt_plan_arithmetic(spark):
    rows = kgdelta.salt_plan(spark, SF).collect()
    total = sum(r["n_docs"] for r in rows)
    for r in rows:
        assert r["salt_factor"] == math.ceil(
            r["n_docs"] / kgdelta.SALT_TARGET
        )
        assert r["share_ppm"] == r["n_docs"] * 1_000_000 // total
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000


def test_entity_trend_invariants(spark):
    rows = kgdelta.entity_trend(spark, SF).collect()
    assert rows
    by_cui = {}
    for r in rows:
        by_cui.setdefault(r["CUI"], []).append(r)
    for cui, rs in by_cui.items():
        rs.sort(key=lambda r: r["week"])
        prev = {r["week"]: r["n_docs"] for r in rs}
        for r in rs:
            if r["week"] - 1 in prev:
                assert r["prev_docs"] == prev[r["week"] - 1]
                assert r["ratio_ppm"] == r["n_docs"] * 1_000_000 // r["prev_docs"]
                expected = (
                    "rising" if r["n_docs"] > r["prev_docs"]
                    else "falling" if r["n_docs"] < r["prev_docs"]
                    else "flat"
                )
                assert r["trend"] == expected
            else:
                assert r["prev_docs"] is None and r["trend"] == "new"
                assert r["ratio_ppm"] is None


def test_stream_kg_mentions_equals_batch(spark):
    got = {
        (r["window_start_us"], r["mention"]): r["n_docs"]
        for r in kgdelta.q_stream_kg_mentions_replay(spark, SF).collect()
    }
    win_us = kgdelta.KG_STREAM_WIN_DAYS * 86400 * 1_000_000
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("lang") == "en")
        .select(
            "doc_id",
            "text",
            F.date_add(
                F.to_date(F.lit(kgdelta.CRAWL_EPOCH)),
                (F.col("doc_id") % kgdelta.CRAWL_DAYS).cast("int"),
            )
            .cast("timestamp")
            .alias("crawl_ts"),
        )
    )
    aliases = sorted({a for a, _ in kgdelta.webkg.WEB_ALIASES})
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    matched = F.filter(
        F.array(*[F.lit(a) for a in aliases]),
        lambda a: padded.contains(F.concat(F.lit(" "), a, F.lit(" "))),
    )
    batch = {
        (r["w"], r["m"]): r["n"]
        for r in docs.select(
            F.unix_micros("crawl_ts").alias("us"),
            F.explode(matched).alias("m"),
        )
        .select((F.col("us") - F.col("us") % win_us).alias("w"), "m")
        .groupBy("w", "m")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch
    assert all(w % win_us == 0 for w, _ in got)
