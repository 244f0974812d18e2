"""Structured Streaming: incremental corpus ingestion.

The reference is strictly request-batch (SURVEY.md §2.5), but a web-scale
training-data pipeline ingests new crawl segments continuously. This module
runs the SAME mention-detection stage (the ner.py mapInPandas trie — it is
stateless, so it composes with streaming unchanged) over a file-source
stream of doc parquet drops, with:

- event-time watermarking on ``warc_ts`` for late crawl records,
- windowed mention counts (the streaming analogue of A1 top-k input),
- exactly-once incremental output via checkpointed ``availableNow`` runs —
  re-running after new files land processes only the new files.

At cluster scale the file source becomes Kafka/queue ingestion; the
transformation graph is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import ner, schemas

STREAM_MENTION_SCHEMA = (
    "url string, warc_ts timestamp, mention string, node_label string"
)


def stream_docs(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of doc parquet drops (one file per crawl slice)."""
    return (
        spark.readStream.schema(schemas.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def stream_mentions(docs_stream: DataFrame, alias_bc) -> DataFrame:
    """Stateless mapInPandas mention detection with the event-time column
    carried through (same trie + per-doc dedup as ner.detect_mentions)."""
    src = docs_stream.where(F.col("lang") == "en").select(
        "url", "warc_ts", "text"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        trie = ner._get_trie(alias_bc)
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "mention": [], "node_label": []}
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                if not text:
                    continue
                for mention, _resolved, label in ner.find_mentions(text, trie):
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["mention"].append(mention)
                    out["node_label"].append(label)
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, STREAM_MENTION_SCHEMA)


def windowed_mention_counts(
    mentions: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window mention counts (late data beyond the
    watermark is dropped; state is bounded)."""
    return (
        mentions.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            "mention",
            "node_label",
        )
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "mention",
            "node_label",
            "n_mentions",
        )
    )


FIRST_SEEN_SCHEMA = "url string, warc_ts timestamp"
_FIRST_SEEN_STATE_SCHEMA = "seen boolean"


def stream_first_seen_urls(
    docs_stream: DataFrame,
    ttl: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): cross-micro-batch
    first-seen URL dedup of a crawl stream.

    A re-crawled url must not re-enter the corpus: per url key, the state
    records the last-seen event time; only the first occurrence (min
    warc_ts within its first batch, deterministic) passes through. State
    survives restarts via the stream checkpoint, so dedup is exact across
    availableNow re-runs — the streaming analogue of the batch pipeline's
    idempotent MERGE appends (materialize.GraphStore).

    Scale note: state is one timestamp per distinct url, hash-partitioned
    by the grouping key across executors. At 10^12 urls unbounded state is
    a non-starter, so ``ttl`` (the re-crawl horizon, e.g. ``'30 days'``)
    arms an EVENT-TIME timeout per key: once the stream's watermark passes
    a url's last sighting + ttl, its state is dropped and a later re-crawl
    re-enters the corpus — bounded state, at the cost of re-admitting urls
    older than the horizon (exactly the trade a crawl pipeline wants).
    Event time (crawl time), not wall-clock, drives expiry, so the horizon
    is deterministic and replayable; a processing-time timeout would also
    keep availableNow runs alive polling for wall-clock expiries. ``None``
    keeps exact unbounded dedup for bounded corpora.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = _parse_duration_ms(ttl) if ttl is not None else None
    src = docs_stream.select("url", "warc_ts")
    timeout_conf = GroupStateTimeout.NoTimeout
    if ttl_ms is not None:
        src = src.withWatermark("warc_ts", watermark_delay)
        timeout_conf = GroupStateTimeout.EventTimeTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # watermark passed last sighting + ttl: drop the key's state
            state.remove()
            return
        first = None
        latest = None
        for pdf in pdfs:
            if len(pdf):
                row = pdf.loc[pdf["warc_ts"].idxmin()]
                if first is None or row["warc_ts"] < first["warc_ts"]:
                    first = row
                mx = pdf["warc_ts"].max()
                if latest is None or mx > latest:
                    latest = mx
        emit = not state.exists
        last_ms = int(pd.Timestamp(latest).value // 1_000_000) if latest is not None else 0
        state.update((True,))
        if ttl_ms is not None and latest is not None:
            # slide the horizon to the latest sighting; a timeout timestamp
            # must stay ahead of the watermark (late re-crawls would
            # otherwise set one in the past and fail the batch)
            state.setTimeoutTimestamp(
                max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        if emit and first is not None:
            yield pd.DataFrame(
                {"url": [first["url"]], "warc_ts": [first["warc_ts"]]}
            )

    return src.groupBy("url").applyInPandasWithState(
        fn,
        FIRST_SEEN_SCHEMA,
        _FIRST_SEEN_STATE_SCHEMA,
        "append",
        timeout_conf,
    )


_DURATION_UNITS_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _parse_duration_ms(s: str) -> int:
    n, unit = s.strip().split()
    return int(n) * _DURATION_UNITS_MS[unit.rstrip("s")]


def run_available_now(
    result: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Process everything currently available, exactly once, then stop.
    Re-invoking after new files land processes only the delta (the batch
    pipeline's resume analogue, but driven by stream checkpoints)."""
    q = (
        result.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()


def stream_kg_update(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    checkpoint_dir: str,
    lkp: dict[str, DataFrame],
    alias_bc=None,
) -> list[dict]:
    """Incremental KG maintenance: an ``availableNow`` foreachBatch run of
    the FULL batch pipeline (NER -> link -> select -> enrich -> triples +
    nodes) per micro-batch of newly-landed crawl files, MERGEd into the
    GraphStore.  The streaming analogue of the reference's per-request
    incremental build loop (manager.py), with two idempotency layers:

    - the stream checkpoint makes re-invocation process only new files;
    - ``merge_nodes`` / ``merge_edges`` are idempotent on node/edge
      identity, so foreachBatch's at-least-once replay after a crash
      cannot duplicate graph rows — effective exactly-once output.

    Returns per-batch telemetry (batch id, newly merged node/edge counts).
    """
    from sparkmedkg import pipeline
    from sparkmedkg.materialize import GraphStore

    store = GraphStore(spark, store_root)
    if alias_bc is None:
        alias_bc = ner.broadcast_alias_index(spark, lkp["aliases"], lkp["concepts"])
    metrics: list[dict] = []

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        tables = pipeline.build_graph(spark, batch_df, lkp, alias_bc=alias_bc)
        n_nodes = store.merge_nodes(pipeline.all_nodes(tables))
        n_edges = store.merge_edges(pipeline.triples(tables))
        tables["mentions"].unpersist()
        tables["links"].unpersist()
        metrics.append(
            {"batch_id": batch_id, "new_nodes": n_nodes, "new_edges": n_edges}
        )

    q = (
        stream_docs(spark, input_dir)
        .writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    return metrics


# ---------------------------------------------------------------------------
# Watermarked stream-stream interval join.
# ---------------------------------------------------------------------------

EVENTS_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of event parquet drops."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def stream_error_click_join(
    events: DataFrame,
    window_sec: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming analogue of relops.events_range_join: every error event
    paired with same-user clicks in the preceding ``window_sec`` seconds,
    as a watermarked stream-stream inner join.

    Both sides carry an event-time watermark and the join condition bounds
    click_ts to [error_ts - window, error_ts), so Spark's state store
    retains each side only for watermark + window — bounded state at any
    input rate, the scale answer for joining two infinite streams.  (The
    batch twin events_range_join is the oracle-gated semantics witness;
    the streaming test asserts availableNow output == the batch join.)"""
    ts = F.col("ts").cast("timestamp")  # tolerate timestamp_ntz sources
    errors = (
        events.where(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            ts.alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            ts.alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = errors.join(
        clicks,
        F.expr(
            f"""e_user = c_user
                AND click_ts < error_ts
                AND click_ts >= error_ts - INTERVAL {window_sec} SECONDS"""
        ),
    )
    return joined.select(
        F.col("e_user").alias("user_id"),
        "error_id",
        F.unix_micros("error_ts").alias("error_ts_us"),
        "click_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
        (F.unix_micros("error_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization via the built-in
    ``session_window`` (merging session state, not a tumbling bucket):
    per user, events closer than ``gap`` merge into one session row with
    count and bounds — the streaming twin of the batch
    relops.events_sessionize.

    Built-in session windows keep per-(user, open-session) state and emit
    a session only once the watermark passes its close, so state is
    bounded by active sessions, not history — the 10^12-event answer; no
    custom applyInPandasWithState needed when the built-in operator
    expresses the semantics (the brief's order of preference).  Session
    bounds use session_window's [start, last_event + gap) contract; the
    test pins equivalence against a brute-force replay under that same
    contract."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Driver-visible availableNow replays (batch-oracle-gated streaming).
#
# The DuckDB correctness gate is batch-only, so the streaming operators
# above are otherwise pytest-gated.  These two entries run the REAL
# streaming queries (session_window sessionization, watermarked
# stream-stream interval join) over the driver's events table via an
# availableNow replay and return the result as a plain DataFrame, with an
# ANSI-SQL oracle expressing the same semantics — a driver-green row for
# the streaming lane.
# ---------------------------------------------------------------------------

SESS_GAP_MIN = 30

#: Statically-declared result schemas of the driver-visible replay
#: queries.  The replay builders are NOT lazy (each one writes a parquet
#: copy of events and runs a full availableNow query before returning),
#: so schema-only sweeps (tests/test_contract_guards.py) read these
#: instead of invoking the builders; test_streaming pins each declared
#: schema against the real replay output so they cannot drift.
REPLAY_RESULT_SCHEMAS: dict[str, str] = {
    "stream_tumbling_replay":
        "window_start_us bigint, event_type string, n_events bigint, "
        "sum_value double",
    "stream_sliding_replay":
        "window_start_us bigint, event_type string, n_events bigint, "
        "sum_value double",
    "stream_first_seen_replay": "url string, first_seen_us bigint",
    "stream_sessionize_replay":
        "user_id bigint, session_start_us bigint, session_end_us bigint, "
        "n_events bigint",
    "stream_error_click_replay":
        "user_id bigint, error_id bigint, error_ts_us bigint, "
        "click_id bigint, click_ts_us bigint, gap_us bigint",
    # implemented in sparkmedkg.kgdelta (the KG mention-extraction lane)
    "stream_kg_mentions_replay":
        "window_start_us bigint, mention string, n_docs bigint",
}


def _replay_dirs() -> tuple[str, str]:
    import tempfile

    base = tempfile.mkdtemp(prefix="sparkmedkg_replay_")
    return f"{base}/in", f"{base}/ckpt"


def q_stream_sessionize_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_start_us, session_end_us, n_events): the
    streaming ``stream_sessionize`` (built-in merging session_window)
    replayed availableNow over the events table, complete-mode memory
    sink.  Oracle: gap-sessionization under session_window's contract —
    a NEW session starts when the inter-event gap is >= gap (strict-<
    merge), and session_end = last event + gap."""
    import uuid

    in_dir, _ = _replay_dirs()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    ev.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(ev.schema).parquet(in_dir)
    name = f"sess_replay_{uuid.uuid4().hex[:12]}"
    q = (
        stream_sessionize(stream, gap=f"{SESS_GAP_MIN} minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)


def sql_stream_sessionize_replay() -> str:
    gap_us = SESS_GAP_MIN * 60 * 1_000_000
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked
)
SELECT user_id,
       MIN(epoch_us(ts)) AS session_start_us,
       MAX(epoch_us(ts)) + {gap_us} AS session_end_us,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_idx
"""


def q_stream_error_click_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(user_id, error_id, error_ts_us, click_id, click_ts_us, gap_us):
    the watermarked stream-stream interval join replayed availableNow
    over the events table (inner stream-stream joins emit matches
    eagerly; the watermark only bounds state retention, so a full replay
    with a generous watermark reproduces the batch join exactly).
    Oracle: the batch interval-join SQL (same as events_range_join)."""
    import uuid

    from sparkmedkg import relops

    in_dir, _ = _replay_dirs()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.write.mode("overwrite").parquet(in_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(in_dir)
    )
    s = stream_error_click_join(
        stream, window_sec=relops.RANGE_WIN_SEC, watermark="365 days"
    )
    name = f"ecj_replay_{uuid.uuid4().hex[:12]}"
    q = (
        s.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)


def sql_stream_error_click_replay() -> str:
    from sparkmedkg import relops

    return relops.sql_events_range_join()


def q_stream_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_start_us, event_type, n_events, sum_value): the watermarked
    tumbling-window aggregation (the same built-in ``F.window`` +
    watermark operator as windowed_mention_counts) replayed availableNow
    over the events table, complete-mode memory sink — a driver-green row
    for the windowed-aggregation streaming lane.  A generous watermark
    means the full replay drops nothing, so the oracle is exactly the
    batch tumbling SQL (relops.events_tumbling_counts' twin).  In
    production the watermark bounds state to live windows; the operator
    and plan are identical."""
    import uuid

    in_dir, _ = _replay_dirs()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
        )
    )
    ev.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(ev.schema).parquet(in_dir)
    agg = (
        stream.withWatermark("ts", "365 days")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = f"tumb_replay_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)


def sql_stream_tumbling_replay() -> str:
    from sparkmedkg import relops

    return relops.sql_events_tumbling_counts()


def q_stream_first_seen_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, first_seen_us): the custom stateful first-seen URL dedup
    (applyInPandasWithState, stream_first_seen_urls) replayed availableNow
    over a synthetic crawl stream derived from the events table
    (url = 'u<user_id>/<event_type>', warc_ts = ts) — a driver-green row
    for the custom-stateful-operator lane.  All files land in one
    availableNow batch, so each key's emitted timestamp is its global
    minimum and the oracle is a plain GROUP BY MIN; the cross-batch state
    semantics (and the event-time TTL expiry) stay pinned by
    tests/test_streaming.py's multi-batch replays."""
    import uuid

    in_dir, _ = _replay_dirs()
    crawl = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.concat(
                F.lit("u"), F.col("user_id").cast("string"),
                F.lit("/"), F.col("event_type"),
            ).alias("url"),
            F.col("ts").cast("timestamp").alias("warc_ts"),
        )
    )
    crawl.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(crawl.schema).parquet(in_dir)
    name = f"fs_replay_{uuid.uuid4().hex[:12]}"
    q = (
        stream_first_seen_urls(stream)
        .select("url", F.unix_micros("warc_ts").alias("first_seen_us"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)


def sql_stream_first_seen_replay() -> str:
    return """
SELECT 'u' || CAST(user_id AS VARCHAR) || '/' || event_type AS url,
       epoch_us(MIN(ts)) AS first_seen_us
FROM events
GROUP BY 1
"""


SLIDE_WIN_MIN = 60   # sliding window length (minutes)
SLIDE_HOP_MIN = 15   # hop / slide (minutes)


def q_stream_sliding_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_start_us, event_type, n_events, sum_value): the watermarked
    SLIDING (hopping) window aggregation — ``F.window(ts, '60 minutes',
    '15 minutes')``, the built-in overlapping-window operator tumbling
    cannot express (each event lands in win/hop = 4 live windows) —
    replayed availableNow over the events table, complete-mode memory
    sink.  Spark aligns hop starts to the epoch, so the oracle assigns
    each event its 4 window starts by exact integer arithmetic:
    floor(us/hop)*hop - k*hop for k in 0..3 (every one satisfies
    start <= ts < start+win by construction).  In production the
    watermark bounds live-window state to win/hop overlapping panes;
    operator and plan are identical."""
    import uuid

    in_dir, _ = _replay_dirs()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
        )
    )
    ev.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(ev.schema).parquet(in_dir)
    agg = (
        stream.withWatermark("ts", "365 days")
        .groupBy(
            F.window(
                "ts", f"{SLIDE_WIN_MIN} minutes", f"{SLIDE_HOP_MIN} minutes"
            ).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = f"slide_replay_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)


def sql_stream_sliding_replay() -> str:
    hop_us = SLIDE_HOP_MIN * 60 * 1_000_000
    n_k = SLIDE_WIN_MIN // SLIDE_HOP_MIN
    return f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us, value FROM events
),
assigned AS (
  SELECT event_type, value,
         (us // {hop_us}) * {hop_us} - g.k * {hop_us} AS window_start_us
  FROM ev
  CROSS JOIN LATERAL UNNEST(generate_series(0, {n_k - 1})) AS g(k)
)
SELECT window_start_us, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM assigned GROUP BY 1, 2
"""
