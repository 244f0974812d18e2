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
