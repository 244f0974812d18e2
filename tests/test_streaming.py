"""Structured Streaming: incremental ingestion == batch results, exactly
once across re-runs (checkpointed availableNow)."""

import os

import pytest

from sparkmedkg import fixtures, ner, schemas, streaming


@pytest.fixture(scope="module")
def alias_bc(spark, lkp):
    return ner.broadcast_alias_index(spark, lkp["aliases"], lkp["concepts"])


def _write_slice(spark, rows, path):
    spark.createDataFrame(rows, schemas.DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_ingest_matches_batch(tmp_path_factory, spark, alias_bc):
    base = str(tmp_path_factory.mktemp("stream"))
    in_dir, out_dir, ckpt = (
        os.path.join(base, d) for d in ("in", "out", "ckpt")
    )

    all_rows = fixtures.gen_doc_rows(120)
    _write_slice(spark, all_rows[:60], in_dir)

    s1 = streaming.stream_mentions(streaming.stream_docs(spark, in_dir), alias_bc)
    streaming.run_available_now(s1, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    batch1 = ner.detect_mentions(
        spark.createDataFrame(all_rows[:60], schemas.DOCS_SCHEMA), alias_bc
    )
    assert got1.count() == batch1.count()

    # second crawl drop: only the delta is processed (exactly-once)
    _write_slice(spark, all_rows[60:], in_dir)
    s2 = streaming.stream_mentions(streaming.stream_docs(spark, in_dir), alias_bc)
    streaming.run_available_now(s2, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    batch_all = ner.detect_mentions(
        spark.createDataFrame(all_rows, schemas.DOCS_SCHEMA), alias_bc
    )
    assert got2.count() == batch_all.count()
    a = {tuple(r) for r in got2.select("url", "mention", "node_label").collect()}
    b = {tuple(r) for r in batch_all.select("url", "mention", "node_label").collect()}
    assert a == b


def test_windowed_counts_match_batch(tmp_path_factory, spark, alias_bc):
    base = str(tmp_path_factory.mktemp("streamw"))
    in_dir = os.path.join(base, "in")
    rows = fixtures.gen_doc_rows(80)
    _write_slice(spark, rows, in_dir)

    counts = streaming.windowed_mention_counts(
        streaming.stream_mentions(streaming.stream_docs(spark, in_dir), alias_bc)
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["mention"], r["node_label"]): r["n_mentions"]
        for r in spark.sql("select * from wcounts").collect()
    }

    from pyspark.sql import functions as F

    batch = (
        ner.detect_mentions(
            spark.createDataFrame(rows, schemas.DOCS_SCHEMA), alias_bc
        )
        .join(
            spark.createDataFrame(rows, schemas.DOCS_SCHEMA).select("url", "warc_ts"),
            "url",
        )
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"), "mention", "node_label"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {
        (r["w"]["start"], r["mention"], r["node_label"]): r["n"] for r in batch
    }
    assert got == expected
