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

from pyspark.sql import DataFrame, SparkSession, Window

from sparkmedkg import exactq
from pyspark.sql import functions as F

CHUNK_W = 3

# Valid in both Java regex (Spark) and RE2 (DuckDB). Phones first: a phone
# match contains digit runs < 4, so the two passes never overlap.
PHONE_RE = r"\d{2}-\d{3}-\d{3}-\d{4}"
NUM_RE = r"\d{4,}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT widened: several consumers (pii_redact, url_normalize) are pure
    # map-only passes whose plans should stay shuffle-free; the
    # compute-bound consumer (chunk_dedup) widens locally.
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
    from sparkmedkg.session import widen_scan

    # token array bound as a lambda variable (evaluates once per row;
    # slice over the raw split() re-evaluates it per chunk — O(n^2))
    def _chunks_of(ws):
        n_chunks = (F.size(ws) + F.lit(w - 1)) / F.lit(w)
        return F.transform(
            F.sequence(F.lit(0), F.floor(n_chunks).cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i * w + 1, w)),
        )

    chunks = F.element_at(
        F.transform(F.array(F.split(F.col("text"), " +")), _chunks_of), 1
    )
    ex = widen_scan(_docs(spark, sf_dir)).select(
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


# ---------------------------------------------------------------------------
# URL canonicalization + host rollup.
# ---------------------------------------------------------------------------
# The driver's documents table carries no URL column, so a messy URL is
# reconstructed deterministically from (source, lang, doc_id) — uppercase
# host, explicit default port, tracking params — and the operator's job is
# to normalize it exactly the way a crawl-frontier dedup would: lowercase
# host, drop the default port, strip utm_*/ref= tracking params, sort the
# survivors.  The oracle rebuilds the same URL with the same pure formula.

TRACKING_PREFIXES = ("utm_", "ref=")


def _messy_url():
    return F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id"),
        F.lit("?utm_source=feed&ref="),
        F.col("source"),
        F.lit("&x="),
        F.col("doc_id") % 7,
        F.lit("&b="),
        F.col("doc_id") % 3,
    )


def url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, host, domain, path, n_dropped, canon_url): URL
    canonicalization — lowercase host, default port dropped (the host
    capture stops at ':'), tracking params (utm_*, ref=) stripped, the
    remaining query params sorted.  Map-only regexp/array expressions, no
    shuffle, no UDF — at 10^12 URLs this rides the scan."""
    url = _messy_url()
    host = F.lower(F.regexp_extract(url, r"^https?://([^/:?#]+)", 1))
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    path = F.regexp_extract(url, r"^https?://[^/?#]+([^?#]*)", 1)
    params = F.split(F.regexp_extract(url, r"\?(.*)$", 1), "&")
    kept = F.filter(
        params,
        lambda p: ~(p.startswith(TRACKING_PREFIXES[0]) | p.startswith(TRACKING_PREFIXES[1])),
    )
    canon_q = F.array_join(F.array_sort(kept), "&")
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        host.alias("host"),
        domain.alias("domain"),
        path.alias("path"),
        (F.size(params) - F.size(kept)).alias("n_dropped"),
        F.concat(
            F.lit("https://"),
            host,
            path,
            F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
        ).alias("canon_url"),
    )


def sql_url_normalize() -> str:
    url = (
        "concat('https://WWW.', source, '.Example.COM:443/', lang, '/doc/', doc_id, "
        "'?utm_source=feed&ref=', source, '&x=', doc_id % 7, '&b=', doc_id % 3)"
    )
    host = rf"lower(regexp_extract({url}, '^https?://([^/:?#]+)', 1))"
    path = rf"regexp_extract({url}, '^https?://[^/?#]+([^?#]*)', 1)"
    kept = (
        rf"list_filter(string_split(regexp_extract({url}, '\?(.*)$', 1), '&'), "
        "p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'ref=')))"
    )
    return rf"""
SELECT doc_id,
       {host} AS host,
       regexp_extract({host}, '([^.]+\.[^.]+)$', 1) AS domain,
       {path} AS path,
       len(string_split(regexp_extract({url}, '\?(.*)$', 1), '&')) - len({kept}) AS n_dropped,
       concat('https://', {host}, {path},
              CASE WHEN array_to_string(list_sort({kept}), '&') <> ''
                   THEN concat('?', array_to_string(list_sort({kept}), '&'))
                   ELSE '' END) AS canon_url
FROM documents
"""


def host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, n_docs, n_langs, n_chars): per-host crawl rollup over the
    canonicalized corpus — one partial-aggregated shuffle keyed on host.
    Host skew (one domain owning 10% of the crawl) is the classic hot key;
    count/sum partials collapse it map-side before the exchange."""
    url = _messy_url()
    host = F.lower(F.regexp_extract(url, r"^https?://([^/:?#]+)", 1))
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(host.alias("host"), "lang", "n_chars")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


def sql_host_stats() -> str:
    url = (
        "concat('https://WWW.', source, '.Example.COM:443/', lang, '/doc/', doc_id, "
        "'?utm_source=feed&ref=', source, '&x=', doc_id % 7, '&b=', doc_id % 3)"
    )
    host = rf"lower(regexp_extract({url}, '^https?://([^/:?#]+)', 1))"
    return f"""
SELECT {host} AS host, COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Percentile-threshold quality filter.
# ---------------------------------------------------------------------------

QUALITY_PCT = 0.5


def quality_filter(
    spark: SparkSession, sf_dir: str, pct: float = QUALITY_PCT
) -> DataFrame:
    """(doc_id, quality_score, p_cut): documents at or above the discrete
    corpus ``pct``-quantile of textstats.quality's score — the
    "keep the top half by quality" training-mix gate.

    The cut is RANK-BASED and integer-exact: quality_score is already
    rounded to 6dp, so scores map losslessly to micro-units (bigint), and
    p_cut = the smallest score whose cumulative count reaches
    ceil(pct * n).  An interpolated percentile (Spark ``percentile`` vs
    DuckDB ``quantile_cont``) is a float seam — a last-ulp difference
    between engines flips boundary rows in/out of the release set.

    Plan: the cumulative window runs over the micro-unit VALUE HISTOGRAM
    (<= 1e6 + 1 distinct values by construction — bounded regardless of
    corpus size), the 1-row cut broadcasts back, and the corpus is
    scanned twice but never shuffled."""
    from sparkmedkg.textstats import quality

    q = quality(spark, sf_dir).select(
        "doc_id",
        "quality_score",
        F.round(F.col("quality_score") * 1_000_000)
        .cast("bigint")
        .alias("s_micro"),
    )
    hist = q.groupBy("s_micro").agg(F.count(F.lit(1)).alias("cnt"))
    cum = exactq.cumsum_by_value(hist, "s_micro", "cnt")
    pnum = round(pct * 1_000_000)
    cut = (
        cum.crossJoin(F.broadcast(hist.agg(F.sum("cnt").alias("n"))))
        .where(
            F.col("cum")
            >= F.expr(f"div(n * {pnum} + 999999, 1000000)")
        )
        .agg(F.min("s_micro").alias("cut_micro"))
    )
    return (
        q.crossJoin(F.broadcast(cut))
        .where(F.col("s_micro") >= F.col("cut_micro"))
        .select(
            "doc_id",
            "quality_score",
            F.round(F.col("cut_micro") / 1_000_000, 6).alias("p_cut"),
        )
    )


def sql_quality_filter(pct: float = QUALITY_PCT) -> str:
    from sparkmedkg.textstats import sql_quality

    pnum = round(pct * 1_000_000)
    return f"""
WITH q AS (
  SELECT doc_id, quality_score,
         CAST(round(quality_score * 1000000) AS BIGINT) AS s_micro
  FROM ({sql_quality()})
),
hist AS (SELECT s_micro, COUNT(*) AS cnt FROM q GROUP BY 1),
cum AS (
  SELECT s_micro, cnt,
         SUM(cnt) OVER (ORDER BY s_micro
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
),
tot AS (SELECT SUM(cnt) AS n FROM hist),
cut AS (
  SELECT MIN(s_micro) AS cut_micro
  FROM cum, tot
  WHERE cum >= (n * {pnum} + 999999) // 1000000
)
SELECT doc_id, quality_score,
       round(cut.cut_micro / 1000000.0, 6) AS p_cut
FROM q, cut WHERE q.s_micro >= cut.cut_micro
"""


# ---------------------------------------------------------------------------
# Crawl snapshot diff.
# ---------------------------------------------------------------------------
# Two crawl snapshots are derived deterministically from the documents
# table (no external data): the OLD snapshot misses doc_id % 11 == 0, the
# NEW snapshot misses doc_id % 13 == 0 and carries revised text for
# doc_id % 7 == 0.  The operator is the incremental-recrawl diff itself.

DIFF_OLD_MOD = 11
DIFF_NEW_MOD = 13
DIFF_REV_MOD = 7


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, status, old_digest, new_digest): added / removed / changed
    documents between two crawl snapshots, by content digest; unchanged
    rows are dropped.  This is the incremental-KG input selector: only
    rows emitted here need re-extraction.

    Plan: full outer join on the crawl key with digest compare — one
    co-partitioned sort-merge join (both sides shuffled on doc_id once).
    At 100 TB both snapshots live bucketed on the crawl key (see
    materialize.write_bucketed_graph for the bucketing seam), making the
    diff exchange-free."""
    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % DIFF_OLD_MOD != 0).select(
        "doc_id", F.md5("text").alias("old_digest")
    )
    new = docs.where(F.col("doc_id") % DIFF_NEW_MOD != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % DIFF_REV_MOD == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text"))
        ).alias("new_digest"),
    )
    j = old.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select("doc_id", "status", "old_digest", "new_digest")
    )


def sql_snapshot_diff() -> str:
    return f"""
WITH old AS (
  SELECT doc_id, md5(text) AS old_digest FROM documents
  WHERE doc_id % {DIFF_OLD_MOD} <> 0
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {DIFF_REV_MOD} = 0 THEN text || ' rev2'
                  ELSE text END) AS new_digest
  FROM documents WHERE doc_id % {DIFF_NEW_MOD} <> 0
)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old_digest IS NULL THEN 'added'
            WHEN new_digest IS NULL THEN 'removed'
            WHEN old_digest <> new_digest THEN 'changed' END AS status,
       old_digest, new_digest
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
WHERE CASE WHEN old_digest IS NULL THEN 'added'
           WHEN new_digest IS NULL THEN 'removed'
           WHEN old_digest <> new_digest THEN 'changed' END IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Corpus drift detection between crawl snapshots.
# ---------------------------------------------------------------------------

DRIFT_TOPK = 20


def corpus_drift(
    spark: SparkSession, sf_dir: str, topk: int = DRIFT_TOPK
) -> DataFrame:
    """(term, p_old, p_new, jsd_contrib, rank): the ``topk`` terms whose
    unigram probability moved most between the two crawl snapshots (same
    old/new synthesis as ``snapshot_diff``), with each term's contribution
    to the Jensen-Shannon divergence — the data-quality tripwire that
    catches a template change, a spam flood, or a parser regression
    before it poisons a training mix.

    Plan: one explode+count per snapshot (map-side combinable), totals as
    1-row broadcasts, a full-outer term join (both sides already hashed on
    term), and a TakeOrdered-style ranked top-k.  Nothing touches the
    corpus twice and nothing sorts more than the term table."""
    docs = _docs(spark, sf_dir)
    toks = F.explode(F.split(F.col("text"), " +")).alias("term")
    old_tf = (
        docs.where(F.col("doc_id") % DIFF_OLD_MOD != 0)
        .select(toks)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_old"))
    )
    new_text = F.when(
        F.col("doc_id") % DIFF_REV_MOD == 0,
        F.concat(F.col("text"), F.lit(" rev2")),
    ).otherwise(F.col("text"))
    new_tf = (
        docs.where(F.col("doc_id") % DIFF_NEW_MOD != 0)
        .select(F.explode(F.split(new_text, " +")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_new"))
    )
    tot_old = old_tf.agg(F.sum("c_old").alias("t_old"))
    tot_new = new_tf.agg(F.sum("c_new").alias("t_new"))
    joined = (
        old_tf.join(new_tf, "term", "full_outer")
        .na.fill({"c_old": 0, "c_new": 0})
        .crossJoin(F.broadcast(tot_old))
        .crossJoin(F.broadcast(tot_new))
        .select(
            "term",
            (F.col("c_old") / F.col("t_old")).alias("p"),
            (F.col("c_new") / F.col("t_new")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2.0
    contrib = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    )
    gap = F.abs(F.col("p") - F.col("q"))
    # distributed top-k (TakeOrderedAndProject) over the vocab-sized term
    # table; only the <= topk survivors get ranked (bounded window)
    w = exactq.bounded_window(
        "term", F.abs(F.col("p") - F.col("q")).desc(), F.col("term")
    )
    return (
        joined.withColumn("jsd_contrib", contrib)
        .orderBy(gap.desc(), F.col("term"))
        .limit(topk)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "term",
            F.round("p", 6).alias("p_old"),
            F.round("q", 6).alias("p_new"),
            F.round("jsd_contrib", 6).alias("jsd_contrib"),
            "rank",
        )
    )


def sql_corpus_drift(topk: int = DRIFT_TOPK) -> str:
    return f"""
WITH old_terms AS (
  SELECT unnest(regexp_split_to_array(text, ' +')) AS term
  FROM documents WHERE doc_id % {DIFF_OLD_MOD} <> 0
),
old_tf AS (SELECT term, COUNT(*) AS c_old FROM old_terms GROUP BY term),
new_terms AS (
  SELECT unnest(regexp_split_to_array(
           CASE WHEN doc_id % {DIFF_REV_MOD} = 0 THEN text || ' rev2'
                ELSE text END, ' +')) AS term
  FROM documents WHERE doc_id % {DIFF_NEW_MOD} <> 0
),
new_tf AS (SELECT term, COUNT(*) AS c_new FROM new_terms GROUP BY term),
j AS (
  SELECT COALESCE(o.term, n.term) AS term,
         COALESCE(c_old, 0)::DOUBLE / (SELECT SUM(c_old) FROM old_tf) AS p,
         COALESCE(c_new, 0)::DOUBLE / (SELECT SUM(c_new) FROM new_tf) AS q
  FROM old_tf o FULL OUTER JOIN new_tf n ON o.term = n.term
),
scored AS (
  SELECT term, p, q,
         (CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0 END
          + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0 END)
           AS jsd_contrib,
         ROW_NUMBER() OVER (ORDER BY abs(p - q) DESC, term) AS rank
  FROM j
)
SELECT term, round(p, 6) AS p_old, round(q, 6) AS p_new,
       round(jsd_contrib, 6) AS jsd_contrib, rank
FROM scored WHERE rank <= {topk}
"""


# ---------------------------------------------------------------------------
# Intra-document repeated-span removal (map-only C4 companion).
# ---------------------------------------------------------------------------

def line_dedup(
    spark: SparkSession, sf_dir: str, w: int = CHUNK_W
) -> DataFrame:
    """(doc_id, n_chunks, n_kept, clean_text): drop repeats of a
    ``w``-token chunk WITHIN each document, keeping first occurrences in
    order — the intra-doc half of the C4 recipe (its corpus-global half is
    ``chunk_dedup``).  Boilerplate that repeats inside one page (nav bars,
    cookie banners) dies here without any cross-document coordination.

    Plan: pure projection — chunking, first-occurrence filtering
    (array_position(chunks, chunk) == own index), and reassembly are all
    higher-order array functions on the row, so a 10^12-document pass is
    map-only with ZERO exchanges; this is the cheap gate you run before
    the corpus-global shuffle ops."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / w))
    chunks = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i * w + 1, w), " "),
    )
    kept = F.filter(
        chunks,
        lambda c, i: F.array_position(chunks, c) == i + 1,
    )
    return docs.select(
        "doc_id",
        F.size(chunks).alias("n_chunks"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def sql_line_dedup(w: int = CHUNK_W) -> str:
    chunks = (
        f"[array_to_string(ws[(i - 1) * {w} + 1 : (i - 1) * {w} + {w}], ' ') "
        f"for i in generate_series(1, (len(ws) - 1) // {w} + 1)]"
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (SELECT doc_id, {chunks} AS chunks FROM t),
k AS (
  SELECT doc_id, chunks,
         [chunks[i] for i in generate_series(1, len(chunks))
          if list_position(chunks, chunks[i]) = i] AS kept
  FROM c
)
SELECT doc_id, len(chunks) AS n_chunks, len(kept) AS n_kept,
       array_to_string(kept, ' ') AS clean_text
FROM k
"""


# ---------------------------------------------------------------------------
# Domain-blocklist filter (suffix-explode + broadcast semi-join).
# ---------------------------------------------------------------------------

# suffix-semantics fixtures: one exact host, one parent domain that
# blocks every subdomain, one miss
BLOCKLIST = [
    "www.src3.example.com",   # exact host
    "src7.example.com",       # parent domain -> blocks www.src7...
    "spam.example.net",       # not in the crawl
]


def _host_suffixes(host) -> F.Column:
    """All dot-suffixes of a host (a.b.c -> [a.b.c, b.c, c]) — the
    constant-fan-out (<= label count) explode that turns 'host or any
    parent domain is listed' into an equi-join."""
    labels = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )


def blocklist_filter(
    spark: SparkSession, sf_dir: str, blocklist: list[str] | None = None
) -> DataFrame:
    """(doc_id, host, blocked_by): the audit table of documents removed by
    a domain blocklist, with parent-suffix semantics (listing
    ``example.org`` blocks every subdomain) — the SafeSearch/spam-list
    gate every crawl pipeline runs, and the log of what it dropped.

    Scale shape: each host explodes to its <= label-count dot-suffixes
    (constant fan-out), which equi-join the blocklist — broadcast here; a
    10^6-entry list at 10^12 URLs would shuffle-join on the suffix key
    instead, same plan shape.  Ties (host matches two listed suffixes)
    resolve to the longest, most specific rule via one partial-agg max."""
    rules = spark.createDataFrame(
        [(b,) for b in (blocklist or BLOCKLIST)], "rule string"
    )
    url = _messy_url()
    host = F.lower(F.regexp_extract(url, r"^https?://([^/:?#]+)", 1))
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        host.alias("host"),
        F.explode(_host_suffixes(host)).alias("sfx"),
    )
    return (
        docs.join(F.broadcast(rules), docs["sfx"] == rules["rule"])
        .groupBy("doc_id", "host")
        .agg(F.max(F.struct(F.length("rule"), F.col("rule"))).alias("m"))
        .select("doc_id", "host", F.col("m.rule").alias("blocked_by"))
    )


def sql_blocklist_filter(blocklist: list[str] | None = None) -> str:
    vals = ", ".join(f"('{b}')" for b in (blocklist or BLOCKLIST))
    url = (
        "concat('https://WWW.', source, '.Example.COM:443/', lang, '/doc/', doc_id, "
        "'?utm_source=feed&ref=', source, '&x=', doc_id % 7, '&b=', doc_id % 3)"
    )
    host = rf"lower(regexp_extract({url}, '^https?://([^/:?#]+)', 1))"
    return rf"""
WITH d AS (SELECT doc_id, {host} AS host FROM documents),
s AS (
  SELECT doc_id, host,
         unnest([array_to_string(string_split(host, '.')[i:], '.')
                 for i in generate_series(1, len(string_split(host, '.')))])
         AS sfx
  FROM d
),
rules AS (SELECT * FROM (VALUES {vals}) v(rule))
SELECT doc_id, host, rule AS blocked_by
FROM s JOIN rules ON s.sfx = rules.rule
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY length(rule) DESC, rule DESC) = 1
"""


# ---------------------------------------------------------------------------
# One-pass table profiling (ANALYZE-style column statistics).
# ---------------------------------------------------------------------------

PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(column, n, n_null, n_distinct, min_s, max_s): per-column profile
    of the documents table — the ANALYZE/stats-collection pass every
    ingestion pipeline runs before planning (NDV feeds join-strategy and
    partition-count choices; null/min/max feed skipping metadata).

    Plan: ONE full-table aggregate computes every column's metrics in the
    same pass (count/min/max partial-agg; countDistinct expands to the
    standard per-column expand-aggregate), then the single result row is
    unpivoted to per-column rows via a row-local explode — the corpus is
    scanned exactly once regardless of column count, vs the naive
    one-query-per-column loop's C scans."""
    docs = _docs(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__mn"),
            F.max(F.col(c).cast("string")).alias(f"{c}__mx"),
        ]
    one = docs.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"{c}__nn").alias("n_null"),
                    F.col(f"{c}__nd").alias("n_distinct"),
                    F.col(f"{c}__mn").alias("min_s"),
                    F.col(f"{c}__mx").alias("max_s"),
                )
                for c in PROFILE_COLS
            ]
        )
    ).alias("p")
    return one.select("n", per_col).select(
        "p.column", "n", "p.n_null", "p.n_distinct", "p.min_s", "p.max_s"
    )


def sql_corpus_profile() -> str:
    parts = []
    for c in PROFILE_COLS:
        parts.append(
            f"""SELECT '{c}' AS "column", COUNT(*) AS n,
       COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_s,
       MAX(CAST({c} AS VARCHAR)) AS max_s
FROM documents"""
        )
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Crawl frontier scheduling: per-host politeness waves.
# ---------------------------------------------------------------------------

FRONTIER_PER_HOST = 5


def crawl_frontier(
    spark: SparkSession, sf_dir: str, per_host: int = FRONTIER_PER_HOST
) -> DataFrame:
    """(host, doc_id, n_chars, wave, fetch_slot): the politeness-aware
    crawl schedule a frontier manager emits — within each host (the
    `source` crawl domain), candidate pages rank by descending content
    size (the recrawl-value proxy; ties by doc_id), capped at per_host;
    the global fetch order interleaves hosts wave-major
    (fetch_slot = (wave-1)*n_hosts + host_idx) so no host is hit twice
    before every host's wave-1 fetch — the round-robin schedule that
    respects per-host rate limits without starving small hosts.

    Scale: the per-URL work is one window per host key (cap keeps output
    small); host enumeration (dense index) runs over the DISTINCT host
    table only — never the URL fact table — and uses the two-phase
    range-partitioned numbering (exactq.global_row_number), so the ~10^8
    hosts of a web-scale frontier stay partition-parallel."""
    d = _docs(spark, sf_dir).select(
        F.col("source").alias("host"), "doc_id", "n_chars"
    )
    wv = Window.partitionBy("host").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = d.withColumn("wave", F.row_number().over(wv).cast("bigint")).where(
        F.col("wave") <= per_host
    )
    hosts = d.select("host").distinct()
    # two-phase global numbering: hosts number ~1e8 at web scale, so the
    # lexical index is range-partitioned, never one window task
    hidx = exactq.global_row_number(hosts, ["host"], out="host_idx")
    n_hosts = hidx.groupBy().agg(F.max("host_idx").alias("n_hosts"))
    return (
        ranked.join(F.broadcast(hidx), "host")
        .join(F.broadcast(n_hosts))
        .select(
            "host",
            "doc_id",
            "n_chars",
            "wave",
            ((F.col("wave") - 1) * F.col("n_hosts") + F.col("host_idx") - 1)
            .cast("bigint")
            .alias("fetch_slot"),
        )
    )


def sql_crawl_frontier(per_host: int = FRONTIER_PER_HOST) -> str:
    return f"""
WITH ranked AS (
  SELECT source AS host, doc_id, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT)
           AS wave
  FROM documents
),
hidx AS (
  SELECT host, CAST(ROW_NUMBER() OVER (ORDER BY host) AS BIGINT) AS host_idx
  FROM (SELECT DISTINCT source AS host FROM documents)
),
nh AS (SELECT MAX(host_idx) AS n_hosts FROM hidx)
SELECT r.host, r.doc_id, r.n_chars, r.wave,
       CAST((r.wave - 1) * nh.n_hosts + h.host_idx - 1 AS BIGINT)
         AS fetch_slot
FROM ranked r JOIN hidx h ON r.host = h.host CROSS JOIN nh
WHERE r.wave <= {per_host}
"""


# ---------------------------------------------------------------------------
# Gopher-style composite quality rules.
# ---------------------------------------------------------------------------
# The rule battery from the Gopher corpus paper (word-count window, mean
# word length window, symbol ratio, alpha-word ratio, stopword presence),
# with thresholds calibrated to the synthetic corpus so each rule actually
# discriminates.  Every ratio compares in cross-multiplied integer form
# (5*n_alpha >= 4*n_words instead of n_alpha/n_words >= 0.8), so the gate
# is exact and engine-identical — no float thresholds anywhere.

GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 90
GOPHER_MIN_WLEN_X1 = 3      # mean word length lower bound (chars/word)
GOPHER_MAX_WLEN_X1 = 10     # upper bound
GOPHER_MIN_STOP = 2         # distinct stopword markers required


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, ok_word_count, ok_word_len, ok_symbols,
    ok_alpha_words, ok_stopwords, gopher_pass): per-document booleans for
    the five Gopher repetition-free quality rules plus the conjunction —
    the rule-battery gate a production crawl-cleaning pipeline applies
    before dedup.  Map-only (one pass over the scan, all built-in array
    expressions); downstream consumers filter on gopher_pass, so at scale
    the gate fuses into the same codegen stage as the scan."""
    from sparkmedkg.textstats import STOPWORDS

    toks = F.split(F.col("text"), " +")
    n_words = F.size(toks).cast("bigint")
    sum_wlen = (
        F.length("text") - (F.size(toks) - F.lit(1))
    ).cast("bigint")  # total chars minus the single-space separators
    n_sym = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit("#+|\\.\\.\\."), F.lit(0)))
    ).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ).cast("bigint")
    stop = F.array(*[F.lit(m) for m in STOPWORDS])
    n_stop = F.size(
        F.array_distinct(F.filter(toks, lambda t: F.array_contains(stop, t)))
    ).cast("bigint")
    ok_wc = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_wl = (sum_wlen >= F.lit(GOPHER_MIN_WLEN_X1) * n_words) & (
        sum_wlen <= F.lit(GOPHER_MAX_WLEN_X1) * n_words
    )
    ok_sym = F.lit(10) * n_sym <= n_words          # <= 10% symbol runs
    ok_alpha = F.lit(5) * n_alpha >= F.lit(4) * n_words   # >= 80% alpha words
    ok_stop = n_stop >= GOPHER_MIN_STOP
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_words.alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_wl.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_wl & ok_sym & ok_alpha & ok_stop).alias("gopher_pass"),
    )


def sql_gopher_rules() -> str:
    from sparkmedkg.textstats import STOPWORDS

    stop = ", ".join(f"'{m}'" for m in STOPWORDS)
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n_words,
         CAST(length(text) - (len({toks}) - 1) AS BIGINT) AS sum_wlen,
         CAST(len(regexp_extract_all(text, '#+|\\.\\.\\.')) AS BIGINT) AS n_sym,
         CAST(len(list_filter({toks}, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(list_distinct(list_filter({toks},
              x -> list_contains([{stop}], x)))) AS BIGINT) AS n_stop
  FROM documents
),
r AS (
  SELECT doc_id, n_words,
         n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
           AS ok_word_count,
         sum_wlen >= {GOPHER_MIN_WLEN_X1} * n_words
           AND sum_wlen <= {GOPHER_MAX_WLEN_X1} * n_words AS ok_word_len,
         10 * n_sym <= n_words AS ok_symbols,
         5 * n_alpha >= 4 * n_words AS ok_alpha_words,
         n_stop >= {GOPHER_MIN_STOP} AS ok_stopwords
  FROM t
)
SELECT doc_id, n_words, ok_word_count, ok_word_len, ok_symbols,
       ok_alpha_words, ok_stopwords,
       ok_word_count AND ok_word_len AND ok_symbols AND ok_alpha_words
         AND ok_stopwords AS gopher_pass
FROM r
"""


# ---------------------------------------------------------------------------
# Per-host boilerplate-span removal (RefinedWeb/CCNet host-level cleanup).
# ---------------------------------------------------------------------------

BP_MIN_DF = 2        # a chunk on >= this many of a host's pages is boilerplate
BP_N_HOSTS = 97      # matches webgraph.N_SRC_HOSTS / the fixtures url scheme


def boilerplate_strip(
    spark: SparkSession,
    sf_dir: str,
    w: int = CHUNK_W,
    min_df: int = BP_MIN_DF,
) -> DataFrame:
    """(doc_id, n_chunks, n_kept, clean_text): remove HOST-LEVEL
    boilerplate — ``w``-token chunks that appear on >= ``min_df`` distinct
    pages of the same host (nav bars, cookie banners, footers) — keeping
    each page's residual chunks in order.  This is the per-host half of
    the C4/RefinedWeb recipe (``chunk_dedup`` is the corpus-global half;
    ``line_dedup`` the intra-page half): a template shared by one site's
    pages is boilerplate even though it never repeats off-site.

    Plan: explode once; the boiler set is one (host, chunk) partial-agg
    shuffle with countDistinct(doc_id) — map-side combinable, and the
    surviving boiler rows are a tiny fraction of distinct chunks (only
    templates cross min_df), so the removal join is a left_anti against a
    small side that AQE broadcasts; reassembly is the same one doc_id
    shuffle as chunk_dedup.  A hot template repeated on 10^8 pages of one
    host collapses map-side to one row per partition before the exchange."""
    from sparkmedkg.session import widen_scan

    def _chunks_of(ws):
        n_chunks = (F.size(ws) + F.lit(w - 1)) / F.lit(w)
        return F.transform(
            F.sequence(F.lit(0), F.floor(n_chunks).cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i * w + 1, w)),
        )

    chunks = F.element_at(
        F.transform(F.array(F.split(F.col("text"), " +")), _chunks_of), 1
    )
    host = F.concat(
        F.lit("site"),
        (F.col("doc_id") % BP_N_HOSTS).cast("string"),
        F.lit(".example"),
    )
    ex = (
        widen_scan(_docs(spark, sf_dir))
        .select("doc_id", host.alias("host"), F.posexplode(chunks).alias("pos", "chunk"))
    )
    boiler = (
        ex.groupBy("host", "chunk")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= min_df)
        .select("host", "chunk")
    )
    kept = ex.join(boiler, ["host", "chunk"], "left_anti")
    totals = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return totals.join(
        kept.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s["chunk"],
                ),
            ).alias("clean_text"),
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def sql_boilerplate_strip(w: int = CHUNK_W, min_df: int = BP_MIN_DF) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH ex AS (
  SELECT doc_id, 'site' || (doc_id % {BP_N_HOSTS}) || '.example' AS host,
         unnest([{{'pos': i,
                   'chunk': array_to_string(list_slice({toks}, i*{w}+1, i*{w}+{w}), ' ')}}
                 for i in generate_series(0, (len({toks})+{w - 1})//{w} - 1)]) AS u
  FROM documents
),
flat AS (SELECT doc_id, host, u.pos AS pos, u.chunk AS chunk FROM ex),
boiler AS (
  SELECT host, chunk FROM flat
  GROUP BY host, chunk HAVING COUNT(DISTINCT doc_id) >= {min_df}
),
kept AS (
  SELECT f.* FROM flat f ANTI JOIN boiler b
    ON f.host = b.host AND f.chunk = b.chunk
),
totals AS (SELECT doc_id, COUNT(*) AS n_chunks FROM flat GROUP BY doc_id)
SELECT t.doc_id, t.n_chunks,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.clean_text, '') AS clean_text
FROM totals t LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(chunk, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
) k ON t.doc_id = k.doc_id
"""


# ---------------------------------------------------------------------------
# Cross-document duplicate SPANS via sliding windows (substring dedup).
# ---------------------------------------------------------------------------

DUP_W = 8   # sliding window width (tokens)


def dup_spans(spark: SparkSession, sf_dir: str, w: int = DUP_W) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows): maximal token spans
    covered by sliding ``w``-token windows that also appear in at least one
    OTHER document — the exact-substring dedup of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), which
    catches UNALIGNED duplicates that chunk-boundary dedup (chunk_dedup)
    structurally misses.  span_start is the 0-based first duplicated token,
    span_end the exclusive end; adjacent/overlapping duplicate windows are
    merged gaps-and-islands style.

    Plan: one posexplode (fan-out = n_tokens rows per doc), ONE window-key
    partial-agg shuffle for the cross-doc frequency (map-side combine
    collapses within-partition repeats of hot boilerplate windows), a
    semi-join back, then a per-document sort window for the island merge —
    partitioned by doc_id, so no global sort.  At 10^12 docs the window
    string key is replaced by its 60-bit rolling hash (same join shape,
    8x narrower shuffle); the string form here keeps the oracle exact."""
    from sparkmedkg.session import widen_scan

    def _wins_of(ws):
        return F.when(
            F.size(ws) >= w,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - w),
                lambda i: F.concat_ws(" ", F.slice(ws, i + 1, w)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    wins = F.element_at(
        F.transform(F.array(F.split(F.col("text"), " +")), _wins_of), 1
    )
    ex = widen_scan(_docs(spark, sf_dir)).select(
        "doc_id", F.posexplode(wins).alias("pos", "win")
    )
    dup = (
        ex.groupBy("win")
        .agg(F.countDistinct("doc_id").alias("dfreq"))
        .where(F.col("dfreq") >= 2)
        .select("win")
    )
    hits = ex.join(dup, "win", "left_semi").select("doc_id", "pos")
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    new_island = F.when(
        F.col("pos") > F.lag("pos").over(wnd) + w, 1
    ).otherwise(0)
    islands = hits.select(
        "doc_id",
        "pos",
        F.sum(F.coalesce(new_island, F.lit(0)))
        .over(wnd.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + w).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select("doc_id", "span_start", "span_end", "n_windows")


def sql_dup_spans(w: int = DUP_W) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest([{{'pos': i,
                   'win': array_to_string(list_slice({toks}, i+1, i+{w}), ' ')}}
                 for i in generate_series(0, len({toks}) - {w})]) AS u
  FROM documents
  WHERE len({toks}) >= {w}
),
flat AS (SELECT doc_id, u.pos AS pos, u.win AS win FROM ex),
dup AS (SELECT win FROM flat GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT f.doc_id, f.pos FROM flat f SEMI JOIN dup d ON f.win = d.win),
lagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), pos) + {w}
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM lagged
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {w} AS span_end,
       COUNT(*) AS n_windows
FROM isl GROUP BY doc_id, island
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (FastCDC-style) + corpus chunk-dup rate.
# ---------------------------------------------------------------------------

CDC_MOD = 8   # expected chunk length in tokens (boundary prob 1/8)


def cdc_chunks(
    spark: SparkSession, sf_dir: str, mod: int = CDC_MOD
) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks): content-defined chunking — a
    chunk boundary falls AFTER any token whose 60-bit hash ≡ 0 (mod
    ``mod``), so boundaries depend on content, not position.  Unlike
    fixed-width chunking (chunk_dedup), an insertion near a document's
    head shifts NO downstream chunk boundaries, so shared suffixes still
    dedup — the FastCDC property, with the token-hash gate standing in for
    the byte-level gear hash.  n_dup_chunks counts this document's chunks
    whose content also appears in >= 1 other document.

    Plan: one posexplode, a per-document running-boundary-count window
    (partitioned by doc_id — never a global sort), one groupBy to
    assemble chunks, one chunk-key partial-agg shuffle for the cross-doc
    frequency, and a broadcast-able semi-join back.  Fan-out is exactly
    n_tokens rows per doc; hot chunks collapse map-side."""
    from sparkmedkg.session import widen_scan

    toks = F.split(F.col("text"), " +")
    ex = widen_scan(_docs(spark, sf_dir)).select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )
    is_bnd = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("bigint")
        % mod
        == 0
    ).cast("int")
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    marked = ex.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(
            F.sum(is_bnd).over(
                wnd.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("chunk_id"),
    )
    chunks = marked.groupBy("doc_id", "chunk_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("chunk")
    )
    dup = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("dfreq"))
        .where(F.col("dfreq") >= 2)
        .select("chunk")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    dups = (
        chunks.join(dup, "chunk", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_chunks"))
    )
    return per_doc.join(dups, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_dup_chunks"), F.lit(0).cast("bigint")).alias(
            "n_dup_chunks"
        ),
    )


def sql_cdc_chunks(mod: int = CDC_MOD) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest([{{'pos': i - 1, 'tok': t[i]}}
                 for i in generate_series(1, len(t))]) AS u
  FROM (SELECT doc_id, {toks} AS t FROM documents)
),
flat AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM ex),
marked AS (
  SELECT doc_id, pos, tok,
         COALESCE(SUM(CASE WHEN CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT)
                                % {mod} = 0 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS chunk_id
  FROM flat
),
chunks AS (
  SELECT doc_id, chunk_id,
         string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM marked GROUP BY doc_id, chunk_id
),
dup AS (
  SELECT chunk FROM chunks GROUP BY chunk
  HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id),
dups AS (
  SELECT c.doc_id, COUNT(*) AS n_dup_chunks
  FROM chunks c SEMI JOIN dup d ON c.chunk = d.chunk
  GROUP BY c.doc_id
)
SELECT p.doc_id, p.n_chunks, COALESCE(x.n_dup_chunks, 0) AS n_dup_chunks
FROM per_doc p LEFT JOIN dups x ON p.doc_id = x.doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction residual audit (governance release gate).
# ---------------------------------------------------------------------------

def pii_residual_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_rows, phones_redacted, nums_redacted, residual_phones,
    residual_nums, clean): the release gate on top of pii_redact — after
    redaction, re-scan the OUTPUT with the SAME patterns and prove the
    residual match count is zero.  Redaction without a residual audit is
    a claim, not a control: a pattern drift (new phone format, partial
    replace) shows up here as clean=false before any data ships.

    Plan: composes the gated map-only redaction pass; the audit adds two
    more regexp counts to the same projection and one 1-row rollup."""
    r = pii_redact(spark, sf_dir)
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("n_phones").cast("bigint").alias("phones_redacted"),
        F.sum("n_nums").cast("bigint").alias("nums_redacted"),
        F.sum(F.regexp_count(F.col("redacted"), F.lit(PHONE_RE)))
        .cast("bigint")
        .alias("residual_phones"),
        F.sum(F.regexp_count(F.col("redacted"), F.lit(NUM_RE)))
        .cast("bigint")
        .alias("residual_nums"),
    ).select(
        "n_rows",
        "phones_redacted",
        "nums_redacted",
        "residual_phones",
        "residual_nums",
        ((F.col("residual_phones") == 0) & (F.col("residual_nums") == 0))
        .alias("clean"),
    )


def sql_pii_residual_audit() -> str:
    return rf"""
WITH r AS ({sql_pii_redact()})
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
       CAST(SUM(n_nums) AS BIGINT) AS nums_redacted,
       CAST(SUM(len(regexp_extract_all(redacted, '{PHONE_RE}')))
            AS BIGINT) AS residual_phones,
       CAST(SUM(len(regexp_extract_all(redacted, '{NUM_RE}')))
            AS BIGINT) AS residual_nums,
       SUM(len(regexp_extract_all(redacted, '{PHONE_RE}'))) = 0
         AND SUM(len(regexp_extract_all(redacted, '{NUM_RE}'))) = 0
         AS clean
FROM r
"""
