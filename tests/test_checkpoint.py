"""Checkpoint/resume: crash mid-run, resume, identical final graph, no dups."""

import pytest

from pyspark.sql import functions as F

from sparkmedkg import checkpoint, pipeline
from sparkmedkg.materialize import GraphStore


def _full_run(spark, docs, lkp, root):
    store = GraphStore(spark, f"{root}/graph")
    log = checkpoint.CheckpointLog(f"{root}/markers.jsonl")
    links = checkpoint.LinksStore(spark, f"{root}/links")
    checkpoint.run_resumable(spark, docs, lkp, store, log, links,
                             n_buckets=4, group_size=2)
    checkpoint.finalize(spark, store, links, lkp)
    return store, log


def test_resume_after_crash_identical(spark, docs, lkp, tmp_path):
    # baseline: uninterrupted checkpointed run
    base_store, _ = _full_run(spark, docs, lkp, str(tmp_path / "base"))
    base_edges = {tuple(r) for r in base_store.read_edges().collect()}

    # crashed run: first group only, then simulated crash
    root = str(tmp_path / "crash")
    store = GraphStore(spark, f"{root}/graph")
    log = checkpoint.CheckpointLog(f"{root}/markers.jsonl")
    links = checkpoint.LinksStore(spark, f"{root}/links")
    with pytest.raises(RuntimeError, match="simulated crash"):
        checkpoint.run_resumable(spark, docs, lkp, store, log, links,
                                 n_buckets=4, group_size=2, fail_after_groups=1)
    assert log.done_buckets() == {0, 1}

    # resume: only pending buckets processed; finalize
    checkpoint.run_resumable(spark, docs, lkp, store, log, links,
                             n_buckets=4, group_size=2)
    assert log.done_buckets() == {0, 1, 2, 3}
    checkpoint.finalize(spark, store, links, lkp)

    resumed_edges = {tuple(r) for r in store.read_edges().collect()}
    assert resumed_edges == base_edges

    # no duplicates in the physical table
    e = store.read_edges()
    assert e.count() == e.dropDuplicates().count()
    n = store.read_nodes()
    assert n.count() == n.dropDuplicates(["node_label", "node_id"]).count()


def test_checkpointed_equals_single_run(spark, docs, lkp, tables, tmp_path):
    store, _ = _full_run(spark, docs, lkp, str(tmp_path / "cmp"))
    ck_edges = {tuple(r) for r in store.read_edges().collect()}
    single = {tuple(r) for r in pipeline.triples(tables).collect()}
    assert ck_edges == single


def test_metrics_lineage_written(spark, docs, lkp, tmp_path):
    root = str(tmp_path / "metrics")
    store, log = _full_run(spark, docs, lkp, root)
    mdf = log.metrics_df(spark)
    rows = mdf.collect()
    assert {r.bucket for r in rows} == {0, 1, 2, 3}
    assert all(r.n_triples > 0 for r in rows)
    assert all(r.wall_sec >= 0 for r in rows)
