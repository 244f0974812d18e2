"""Web-corpus cleaning operators: global span-level dedup and PII redaction.

The C4/RefinedWeb recipe removes *spans* (sentences / three-sentence
windows) that repeat anywhere in the corpus, not just whole-document
duplicates; dataset releases likewise redact phone numbers and other PII
before publishing.  Both are re-expressed here Spark-first over the
driver's synthetic tables:

- ``chunk_dedup`` — corpus-global first-occurrence dedup of fixed-width
  token chunks (the sentence-segmentation stand-in for the punctuation-free
  synthetic text), reassembling each document from its surviving chunks.
- ``pii_redact`` — phone / long-digit-run redaction with per-row match
  counts, run over the TPC-H ``customer`` table whose ``c_phone`` column
  actually exercises the patterns.

Everything is built-in pyspark.sql.functions (JVM-side, codegen); each
operator has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_W = 3

# Valid in both Java regex (Spark) and RE2 (DuckDB). Phones first: a phone
# match contains digit runs < 4, so the two passes never overlap.
PHONE_RE = r"\d{2}-\d{3}-\d{3}-\d{4}"
NUM_RE = r"\d{4,}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Corpus-global chunk dedup (C4-style duplicate-span removal).
# ---------------------------------------------------------------------------

def chunk_dedup(
    spark: SparkSession, sf_dir: str, w: int = CHUNK_W
) -> DataFrame:
    """(doc_id, n_kept, clean_text): split every document into
    non-overlapping ``w``-token chunks, keep each distinct chunk only at
    its globally-first occurrence (ordered by (doc_id, pos)), and rebuild
    each document from its surviving chunks in original order.  Documents
    whose every chunk appeared earlier elsewhere drop out entirely.

    Plan: one shuffle keyed on the chunk string where ``min(struct(doc_id,
    pos))`` — partial-aggregatable, so map-side combine collapses each
    partition's repeats before the exchange — *is* the keeper set (no join
    back against the exploded corpus), then one shuffle on doc_id to
    reassemble.  Chunk-frequency skew (boilerplate repeated 10^8 times at
    web scale) is absorbed by the map-side combine: each map task emits one
    row per distinct chunk regardless of local repeat count."""
    toks = F.split(F.col("text"), " +")
    n_chunks = (F.size(toks) + F.lit(w - 1)) / F.lit(w)
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor(n_chunks).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * w + 1, w)),
    )
    ex = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    )
    keep = ex.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    return (
        keep.select(F.col("k.doc_id").alias("doc_id"), F.col("k.pos").alias("pos"), "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s["chunk"],
                ),
            ).alias("clean_text"),
        )
    )


def sql_chunk_dedup(w: int = CHUNK_W) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest([{{'pos': i,
                   'chunk': array_to_string(list_slice({toks}, i*{w}+1, i*{w}+{w}), ' ')}}
                 for i in generate_series(0, (len({toks})+{w - 1})//{w} - 1)]) AS u
  FROM documents
),
flat AS (SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM ex),
keep AS (
  SELECT doc_id, pos, chunk
  FROM (SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        FROM flat)
  WHERE rn = 1
)
SELECT doc_id, COUNT(*) AS n_kept,
       string_agg(chunk, ' ' ORDER BY pos) AS clean_text
FROM keep GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction.
# ---------------------------------------------------------------------------

PHONE_FMT = "%02d-%03d-%03d-%04d"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, n_phones, n_nums, redacted): free-text per customer
    with TPC-H-format phone numbers replaced by ``[PHONE]`` and remaining
    >=4-digit runs (the ``Customer#000000042`` id tail) by ``[NUM]``, plus
    match counts.  The driver's synthetic ``customer`` table drops TPC-H's
    ``c_phone``, so the column is reconstructed deterministically from the
    keys (same ``NN-NNN-NNN-NNNN`` shape as the spec) before redaction —
    the Spark side and the oracle rebuild it with the same pure formula.

    Pure per-row regexp expressions — no shuffle, no UDF; at 100 TB this
    is a map-only pass that rides the scan."""
    phone = F.format_string(
        PHONE_FMT,
        F.col("c_nationkey") % 90 + 10,
        F.col("c_custkey") % 1000,
        (F.col("c_custkey") / 7).cast("long") % 1000,
        F.col("c_custkey") % 10000,
    )
    s = F.concat_ws(" ", F.col("c_name"), F.col("c_mktsegment"), phone)
    no_phone = F.regexp_replace(s, PHONE_RE, "[PHONE]")
    return (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            "c_custkey",
            F.regexp_count(s, F.lit(PHONE_RE)).alias("n_phones"),
            F.regexp_count(no_phone, F.lit(NUM_RE)).alias("n_nums"),
            F.regexp_replace(no_phone, NUM_RE, "[NUM]").alias("redacted"),
        )
    )


def sql_pii_redact() -> str:
    phone = (
        f"printf('{PHONE_FMT}', c_nationkey % 90 + 10, c_custkey % 1000, "
        "(c_custkey // 7) % 1000, c_custkey % 10000)"
    )
    s = f"concat_ws(' ', c_name, c_mktsegment, {phone})"
    return rf"""
SELECT c_custkey,
       len(regexp_extract_all({s}, '{PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(regexp_replace({s}, '{PHONE_RE}', '[PHONE]', 'g'),
                              '{NUM_RE}')) AS n_nums,
       regexp_replace(regexp_replace({s}, '{PHONE_RE}', '[PHONE]', 'g'),
                      '{NUM_RE}', '[NUM]', 'g') AS redacted
FROM customer
"""
