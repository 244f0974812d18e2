"""Structured Streaming: incremental ingestion == batch results, exactly
once across re-runs (checkpointed availableNow)."""

import os

import pytest

from pyspark.sql import functions as F

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


def test_stateful_first_seen_url_dedup(tmp_path_factory, spark):
    base = str(tmp_path_factory.mktemp("streamst"))
    in_dir, out_dir, ckpt = (
        os.path.join(base, d) for d in ("in", "out", "ckpt")
    )
    rows = fixtures.gen_doc_rows(40)

    # slice 1: docs 0..29
    _write_slice(spark, rows[:30], in_dir)
    s1 = streaming.stream_first_seen_urls(streaming.stream_docs(spark, in_dir))
    streaming.run_available_now(s1, out_dir, ckpt)
    got1 = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {r[0] for r in rows[:30]}

    # slice 2: re-crawl of 20..29 (duplicate urls) + new docs 30..39 — the
    # stateful dedup must emit ONLY the 10 new urls across micro-batches
    _write_slice(spark, rows[20:], in_dir)
    s2 = streaming.stream_first_seen_urls(streaming.stream_docs(spark, in_dir))
    streaming.run_available_now(s2, out_dir, ckpt)
    out = spark.read.parquet(out_dir).collect()
    urls = [r["url"] for r in out]
    assert len(urls) == len(set(urls)) == 40
    assert set(urls) == {r[0] for r in rows}


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


def test_first_seen_ttl_expires_state(tmp_path_factory, spark):
    """With a re-crawl-horizon TTL (event-time timeout), a url re-crawled
    AFTER the horizon re-enters the corpus (state dropped once the
    watermark passes last sighting + ttl); within the horizon it is still
    deduped. Event-time driven — fully deterministic, no sleeps."""
    from datetime import datetime, timedelta

    base = str(tmp_path_factory.mktemp("streamttl"))
    in_dir, out_dir, ckpt = (
        os.path.join(base, d) for d in ("in", "out", "ckpt")
    )
    t0 = datetime(2024, 1, 1)

    def rows_at(urls, ts):
        return [(u, ts, None, f"text {u}", "en") for u in urls]

    def run():
        s = streaming.stream_first_seen_urls(
            streaming.stream_docs(spark, in_dir), ttl="1 hour"
        )
        streaming.run_available_now(s, out_dir, ckpt)
        return [r["url"] for r in spark.read.parquet(out_dir).collect()]

    # crawl 1: u0..u3 at t0
    _write_slice(spark, rows_at(["u0", "u1", "u2", "u3"], t0), in_dir)
    assert sorted(run()) == ["u0", "u1", "u2", "u3"]

    # crawl 2: u0 re-crawled INSIDE the horizon (t0+30m, deduped) + new
    # urls at t0+2h — the watermark then passes t0+1h, expiring u1..u3
    # (u0's horizon slid to t0+90m, also expired by t0+2h)
    _write_slice(
        spark,
        rows_at(["u0"], t0 + timedelta(minutes=30))
        + rows_at(["u4", "u5"], t0 + timedelta(hours=2)),
        in_dir,
    )
    urls = run()
    assert sorted(urls) == ["u0", "u1", "u2", "u3", "u4", "u5"]

    # crawl 3: u0..u3 re-crawled AFTER expiry -> re-admitted
    _write_slice(
        spark, rows_at(["u0", "u1", "u2", "u3"], t0 + timedelta(hours=3)), in_dir
    )
    urls = run()
    assert len(urls) == 10
    for u in ("u0", "u1", "u2", "u3"):
        assert urls.count(u) == 2  # first sighting + post-expiry re-crawl


def test_stream_kg_update_matches_batch_and_is_idempotent(
    tmp_path_factory, spark, lkp, alias_bc
):
    """Two crawl drops merged incrementally == one-shot batch build; a
    re-run with no new files merges nothing."""
    from sparkmedkg import pipeline
    from sparkmedkg.materialize import GraphStore

    base = str(tmp_path_factory.mktemp("kgstream"))
    in_dir, store_dir, ckpt = (
        os.path.join(base, d) for d in ("in", "store", "ckpt")
    )
    rows = fixtures.gen_doc_rows(60)

    _write_slice(spark, rows[:30], in_dir)
    m1 = streaming.stream_kg_update(spark, in_dir, store_dir, ckpt, lkp, alias_bc)
    assert m1 and sum(m["new_edges"] for m in m1) > 0

    _write_slice(spark, rows[30:], in_dir)
    m2 = streaming.stream_kg_update(spark, in_dir, store_dir, ckpt, lkp, alias_bc)
    assert m2 and sum(m["new_edges"] for m in m2) > 0

    store = GraphStore(spark, store_dir)
    got_edges = {tuple(r) for r in store.read_edges().collect()}
    got_nodes = {
        (r["node_label"], r["node_id"]) for r in store.read_nodes().collect()
    }

    # selection (top-15 entities) is corpus-level per batch — the reference
    # semantics is per-request selection (manager.py), so the incremental
    # graph equals the MERGE of the per-slice batch builds, not a one-shot
    # 60-doc build.
    want_edges, want_nodes = set(), set()
    for sl in (rows[:30], rows[30:]):
        tables = pipeline.build_graph(
            spark, spark.createDataFrame(sl, schemas.DOCS_SCHEMA), lkp,
            alias_bc=alias_bc,
        )
        want_edges |= {
            tuple(r) for r in pipeline.triples(tables).distinct().collect()
        }
        want_nodes |= {
            (r["node_label"], r["node_id"])
            for r in pipeline.all_nodes(tables).collect()
        }
        tables["mentions"].unpersist()
        tables["links"].unpersist()
    assert got_edges == want_edges
    assert got_nodes == want_nodes

    # no new files -> the checkpoint yields no batches (or empty merges)
    m3 = streaming.stream_kg_update(spark, in_dir, store_dir, ckpt, lkp, alias_bc)
    assert sum(m["new_nodes"] + m["new_edges"] for m in m3) == 0


def test_stream_error_click_join_matches_batch(tmp_path_factory, spark):
    from pyspark.sql import functions as F
    import shutil

    from sparkmedkg import relops

    base = str(tmp_path_factory.mktemp("streamj"))
    in_dir, out_dir, ckpt = (
        os.path.join(base, d) for d in ("in", "out", "ckpt")
    )
    os.makedirs(in_dir)
    # two crawl-slice drops, split by time so the join state crosses
    # micro-batch boundaries without violating the watermark
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    mid = ev.selectExpr("percentile(unix_micros(ts), 0.5) p").first()["p"]
    ev.where(F.unix_micros("ts") <= mid).coalesce(1).write.parquet(
        os.path.join(in_dir, "slice=0")
    )
    ev.where(F.unix_micros("ts") > mid).coalesce(1).write.parquet(
        os.path.join(in_dir, "slice=1")
    )

    s = streaming.stream_error_click_join(
        streaming.stream_events(spark, f"{in_dir}/slice=*"),
        window_sec=relops.RANGE_WIN_SEC,
        watermark="30 days",
    )
    streaming.run_available_now(s, out_dir, ckpt)
    got = {
        (r["error_id"], r["click_id"], r["gap_us"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["error_id"], r["click_id"], r["gap_us"])
        for r in relops.events_range_join(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == want
    assert want


def test_stream_sessionize_matches_bruteforce(tmp_path_factory, spark):
    import datetime
    from collections import defaultdict

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    # write the slice then stream it back
    base = str(tmp_path_factory.mktemp("streamsess"))
    in_dir = os.path.join(base, "in")
    ev.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(ev.schema).parquet(in_dir)

    sess = streaming.stream_sessionize(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessout")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("select * from sessout").collect()
    }

    # brute-force replay under session_window's contract:
    # merge when next event < last_ts + gap; end = last_ts + gap
    gap_us = 30 * 60 * 1_000_000
    rows = sorted(ev.collect(), key=lambda r: (r["user_id"], r["ts"]))
    per_user = defaultdict(list)
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        per_user[r["user_id"]].append(us)
    want = set()
    for u, times in per_user.items():
        start = times[0]
        last = times[0]
        n = 1
        for t in times[1:]:
            if t < last + gap_us:
                last = t
                n += 1
            else:
                want.add((u, start, last + gap_us, n))
                start = last = t
                n = 1
        want.add((u, start, last + gap_us, n))
    assert got == want


def test_sliding_replay_matches_batch_window(spark):
    """The availableNow sliding replay must equal the BATCH F.window
    aggregation with the same win/hop (complete replay, generous
    watermark) — and each event must appear in exactly win/hop windows."""
    from pyspark.sql import functions as F

    from sparkmedkg import streaming as st

    sf = "/root/testdata/sf0.001"
    got = {
        (r["window_start_us"], r["event_type"]): (
            r["n_events"], round(r["sum_value"], 6)
        )
        for r in st.q_stream_sliding_replay(spark, sf).collect()
    }
    batch = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy(
            F.window(
                F.col("ts").cast("timestamp"),
                f"{st.SLIDE_WIN_MIN} minutes",
                f"{st.SLIDE_HOP_MIN} minutes",
            ).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("s"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("ws"), "event_type",
            "n", "s",
        )
        .collect()
    )
    want = {
        (r["ws"], r["event_type"]): (r["n"], round(r["s"], 6))
        for r in batch
    }
    assert got == want
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    fanout = st.SLIDE_WIN_MIN // st.SLIDE_HOP_MIN
    assert sum(n for n, _ in got.values()) == n_events * fanout


def test_replay_declared_schemas_match_actual(spark):
    """REPLAY_RESULT_SCHEMAS (the static schemas the cheap guard sweep
    reads instead of executing the replay builders) must equal the REAL
    replay output schemas — one execution per entry, here, where running
    streaming jobs is this file's whole point."""
    import __spark_entry__ as entrymod
    from pyspark.sql import types as T

    sf = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    for name, ddl in streaming.REPLAY_RESULT_SCHEMAS.items():
        got = qs[name](spark, sf).schema
        want = T._parse_datatype_string(ddl)
        # nullability is an execution artifact (aggregates come back
        # non-nullable); the sweep only needs names + types
        assert [(f.name, f.dataType) for f in got.fields] == [
            (f.name, f.dataType) for f in want.fields
        ], (name, got.simpleString(), want.simpleString())
