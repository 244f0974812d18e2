"""Corpus-level training-data operators: eval-set decontamination,
concat-and-chunk sequence packing, and BM25 keyword retrieval.

These are the pipeline stages an LLM-training corpus needs *after* the
per-document signals (textstats) and near-dup removal (dedup) are done:

- **decontaminate** — n-gram overlap against a held-out eval set (the
  GPT-3/Llama decontamination recipe): any training document sharing a
  k-word shingle with an eval document is flagged with its overlap count.
  The eval set is tiny relative to the corpus (benchmarks are KBs against
  100 TB), so its distinct shingle set is BROADCAST and the corpus is
  touched exactly once — a broadcast semi-join-shaped inner join followed
  by one map-side-combinable count.  No shuffle keyed on anything wider
  than doc_id.
- **pack_sequences** — GPT-style concat-and-chunk packing: documents in
  deterministic doc_id order form one virtual token stream, cut into
  fixed ``block`` token sequences; each doc maps to its [first_seq,
  last_seq] span.  The global running offset is computed with a TWO-PHASE
  scan (per-range partial sums -> tiny cumulative offset table ->
  broadcast back), never a single-partition global window: an unbounded
  ``Window.orderBy`` pulls the whole corpus into one task at 100 TB,
  while the bucket table here has one row per ~4k docs.
- **bm25_topk** — Okapi BM25 scoring of a fixed query-term list.  Term
  frequencies come from JVM-side array ops on the token array (one
  map-only projection per term — no explode of the corpus into a
  (doc, token) stream), corpus stats (N, avgdl, per-term df) are
  scalar/3-row aggregates broadcast back, and the final top-k is a
  TakeOrderedAndProject.  The corpus is scanned twice (stats + score) and
  never shuffled on a token key.

All three have DuckDB oracles; scores/offsets are emitted as
round(x, 6) / exact longs so the driver hash is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from sparkmedkg import exactq
from pyspark.sql import functions as F

DECON_K = 5            # shingle width (words) for eval-overlap matching
EVAL_MOD = 97          # doc_id % EVAL_MOD == 0 -> held-out eval doc
PACK_BLOCK = 512       # tokens per packed training sequence
PACK_BUCKET = 4096     # docs per partial-sum range in the two-phase scan
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ["hash", "join", "window"]
BM25_TOPK = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkmedkg.session import widen_scan

    # shingling / tokenization stages below are per-row heavy; widen
    # single-row-group fixture scans (no-op at scale)
    return widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _toks(text_col: str = "text"):
    return F.split(F.col(text_col), " +")


# ---------------------------------------------------------------------------
# Eval-set decontamination.
# ---------------------------------------------------------------------------

def _shingles_k(text_col: str, k: int):
    # token array bound as a lambda variable so it evaluates once per row
    # (slice over the raw split() re-evaluates it per shingle — O(n^2))
    def of(ws):
        n = F.size(ws)
        starts = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(ws, i, k)))
        )

    return F.element_at(F.transform(F.array(_toks(text_col)), of), 1)


def decontaminate(
    spark: SparkSession, sf_dir: str, k: int = DECON_K
) -> DataFrame:
    """(doc_id, n_overlap): training docs sharing >=1 distinct k-word
    shingle with the held-out eval split (doc_id % EVAL_MOD == 0), with
    the count of distinct shared shingles.  These docs would be dropped
    (or have the overlapping spans masked) before training.

    Plan: eval shingles -> distinct -> broadcast; corpus shingles joined
    against it (BroadcastHashJoin, corpus scanned once); count-distinct
    rides the doc_id shuffle with partial aggregation."""
    docs = _docs(spark, sf_dir)
    sh = F.explode(_shingles_k("text", k)).alias("shingle")
    eval_sh = (
        docs.where(F.col("doc_id") % EVAL_MOD == 0)
        .select(sh)
        .distinct()
    )
    train_sh = docs.where(F.col("doc_id") % EVAL_MOD != 0).select("doc_id", sh)
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_overlap"))
    )


def _sql_shingles_k(expr: str, k: int) -> str:
    toks = f"regexp_split_to_array({expr}, ' +')"
    return (
        f"list_distinct([array_to_string(list_slice({toks}, i, i + {k - 1}), ' ') "
        f"for i in generate_series(1, greatest(len({toks}) - {k - 1}, 1))])"
    )


def sql_decontaminate(k: int = DECON_K) -> str:
    return f"""
WITH eval_sh AS (
  SELECT DISTINCT unnest({_sql_shingles_k('text', k)}) AS shingle
  FROM documents WHERE doc_id % {EVAL_MOD} = 0
),
train_sh AS (
  SELECT doc_id, unnest({_sql_shingles_k('text', k)}) AS shingle
  FROM documents WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_overlap
FROM train_sh t JOIN eval_sh e USING (shingle)
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Concat-and-chunk sequence packing.
# ---------------------------------------------------------------------------

def pack_sequences(
    spark: SparkSession, sf_dir: str, block: int = PACK_BLOCK
) -> DataFrame:
    """(doc_id, n_tokens, start_off, first_seq, last_seq): position of each
    document in the packed fixed-``block``-token training stream, docs
    concatenated in doc_id order.

    The global exclusive prefix sum is two-phase: (1) partial token sums
    per doc_id range of PACK_BUCKET docs — a map-side-combinable groupBy
    with one row out per range; (2) a cumulative window over that tiny
    range table (safe: |ranges| = |corpus| / 4096); (3) broadcast the
    range offsets back and finish with a within-range window partitioned
    by range.  No stage ever sorts more than one range's docs in a task."""
    return pack_sequences_df(_docs(spark, sf_dir), block)


def pack_sequences_df(docs_in: DataFrame, block: int = PACK_BLOCK) -> DataFrame:
    """DataFrame-in variant of ``pack_sequences`` so a pipeline can pack a
    FILTERED corpus (e.g. jobs/prep_corpus_job.py packs the survivors of
    the quality/dedup gates, not the raw table).  ``docs_in`` needs
    (doc_id, text)."""
    docs = docs_in.select(
        "doc_id",
        F.size(_toks()).alias("n_tokens"),
        (F.col("doc_id") / F.lit(PACK_BUCKET)).cast("long").alias("rng"),
    )
    rng_tot = docs.groupBy("rng").agg(F.sum("n_tokens").alias("rng_tokens"))
    # range-bucket offsets via exactq's two-phase partial cumsum (the
    # bucket table scales with corpus/PACK_BUCKET); exclusive prefix =
    # inclusive cum minus own count
    rng_cum = exactq.cumsum_by_value(rng_tot, "rng", "rng_tokens")
    rng_off = rng_cum.select(
        "rng",
        (
            F.coalesce(
                F.col("cum") - F.col("rng_tokens"),
                F.lit(0),
            )
        ).alias("rng_off"),
    )
    w_in = (
        Window.partitionBy("rng")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.join(F.broadcast(rng_off), "rng")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("rng_off")
                + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
            ).alias("start_off"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_off",
            F.floor(F.col("start_off") / block).alias("first_seq"),
            F.floor(
                (F.col("start_off") + F.col("n_tokens") - 1) / block
            ).alias("last_seq"),
        )
    )


def sql_pack_sequences(block: int = PACK_BLOCK) -> str:
    return f"""
WITH sized AS (
  SELECT doc_id, len(regexp_split_to_array(text, ' +')) AS n_tokens
  FROM documents
),
offs AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_off
  FROM sized
)
SELECT doc_id, n_tokens, start_off,
       CAST(FLOOR(start_off / {block}) AS BIGINT) AS first_seq,
       CAST(FLOOR((start_off + n_tokens - 1) / {block}) AS BIGINT) AS last_seq
FROM offs
"""


# ---------------------------------------------------------------------------
# BM25 keyword retrieval.
# ---------------------------------------------------------------------------

def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: list[str] | None = None,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """(doc_id, score): top-``topk`` docs by Okapi BM25 for the fixed
    query-term list, score rounded to 6 (ties broken by doc_id asc).

    tf per term is a JVM array-filter on the token array — the corpus is
    never exploded to (doc, token) rows.  N/avgdl/df are tiny aggregates
    joined back via broadcast; the result is a TakeOrderedAndProject."""
    terms = terms or BM25_TERMS

    def _tf(term: str):
        # NB: the lambda must take exactly one arg — PySpark higher-order
        # functions treat a second parameter as the element index.
        return F.size(F.filter(_toks(), lambda x: x == F.lit(term)))

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(_toks()).alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = docs.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        tf = F.col(f"tf_{i}").cast("double")
        part = idf * (
            tf
            * (BM25_K1 + 1.0)
            / (
                tf
                + BM25_K1
                * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    return (
        scored.select("doc_id", score.alias("raw"))
        .where(F.col("raw") > 0)
        .orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(topk)
        .select("doc_id", F.round("raw", 6).alias("score"))
    )


def sql_bm25_topk(terms: list[str] | None = None, topk: int = BM25_TOPK) -> str:
    terms = terms or BM25_TERMS
    toks = "regexp_split_to_array(text, ' +')"
    tf_cols = ", ".join(
        f"len(list_filter({toks}, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * (d.tf_{i} * ({BM25_K1} + 1.0)"
        f" / (d.tf_{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl)))"
        for i in range(len(terms))
    )
    return f"""
WITH d AS (
  SELECT doc_id, len({toks}) AS dl, {tf_cols} FROM documents
),
s AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_cols} FROM d
)
SELECT doc_id, ROUND(score, 6) AS score FROM (
  SELECT d.doc_id, {parts} AS score FROM d CROSS JOIN s
) WHERE score > 0
ORDER BY score DESC, doc_id ASC
LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary + per-doc OOV rate.
# ---------------------------------------------------------------------------

VOCAB_V = 24


def oov_rate(
    spark: SparkSession, sf_dir: str, v: int = VOCAB_V
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_rate): score every document against
    the corpus's own top-``v`` token vocabulary — the tokenizer-coverage
    signal used to flag docs a fixed vocab would shred into rare pieces.

    Plan: phase 1 builds the vocabulary with a partial-aggregated token
    count + TakeOrdered top-v (deterministic (count desc, token) order);
    phase 2 folds the v tokens into ONE broadcast array row and scores
    each doc with a row-local array filter — the corpus is never exploded
    into a shuffle for scoring, so the second pass is map-only at any
    scale."""
    docs = _docs(spark, sf_dir)
    toks = _toks()
    vocab_rows = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(v)
    )
    vocab = vocab_rows.agg(
        F.array_sort(F.collect_list("token")).alias("vocab")
    )
    n_tokens = F.size(toks)
    n_oov = F.size(
        F.filter(toks, lambda t: ~F.array_contains(F.col("vocab"), t))
    )
    return (
        docs.crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_oov.alias("n_oov"),
            F.round(
                n_oov.cast("double") / n_tokens.cast("double"), 6
            ).alias("oov_rate"),
        )
    )


def sql_oov_rate(v: int = VOCAB_V) -> str:
    toks = "regexp_split_to_array(text, ' +')"  # corpusops._toks: no lower()
    return f"""
WITH tok AS (SELECT unnest({toks}) AS token FROM documents),
vocab_rows AS (
  SELECT token FROM (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
  ORDER BY n DESC, token LIMIT {v}
),
vocab AS (SELECT list_sort(list(token)) AS vl FROM vocab_rows)
SELECT doc_id,
       len({toks}) AS n_tokens,
       len(list_filter({toks}, t -> NOT list_contains(vocab.vl, t))) AS n_oov,
       round(len(list_filter({toks}, t -> NOT list_contains(vocab.vl, t)))::DOUBLE
             / len({toks})::DOUBLE, 6) AS oov_rate
FROM documents, vocab
"""


def mask_contaminated(
    spark: SparkSession, sf_dir: str, k: int = DECON_K
) -> DataFrame:
    """(doc_id, n_masked, masked_text): the REMOVAL half of
    decontamination — every training-doc token covered by a k-shingle
    that appears in the eval split is replaced with ``<mask>``, keeping
    the rest of the document (dropping whole documents over one leaked
    phrase wastes data; span masking is what production pipelines do).

    Plan: positional shingles explode once, hit the broadcast eval set
    (BroadcastHashJoin), and collapse to a per-doc start-offset list; the
    token rewrite is then a row-local nested higher-order expression
    (transform + exists) — the corpus is scanned twice (once for spans,
    once for rewrite) and shuffled only on doc_id for the tiny hit
    list."""
    docs = _docs(spark, sf_dir)
    toks = _toks()

    # token array bound as a lambda variable (evaluates once per row)
    def _sh_of(ws):
        n = F.size(ws)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(ws, i, k)),
        )

    sh_arr = F.element_at(F.transform(F.array(toks), _sh_of), 1)
    eval_sh = (
        docs.where(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode(_shingles_k("text", k)).alias("shingle"))
        .distinct()
    )
    pos = docs.where(F.col("doc_id") % EVAL_MOD != 0).select(
        "doc_id", F.posexplode(sh_arr).alias("i0", "shingle")
    )
    hits = (
        pos.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.collect_set("i0").alias("starts"))
    )
    train = docs.where(F.col("doc_id") % EVAL_MOD != 0).select(
        "doc_id", toks.alias("toks")
    )
    joined = train.join(hits, "doc_id", "left").withColumn(
        "starts", F.coalesce("starts", F.array().cast("array<int>"))
    )
    covered = lambda j: F.exists(  # noqa: E731
        F.col("starts"), lambda s: (s <= j) & (j <= s + F.lit(k - 1))
    )
    idx = F.sequence(F.lit(0), F.size("toks") - 1)
    masked = F.transform(
        idx,
        lambda j: F.when(covered(j), F.lit("<mask>")).otherwise(
            F.element_at("toks", (j + 1).cast("int"))
        ),
    )
    return joined.select(
        "doc_id",
        F.size(F.filter(idx, covered)).alias("n_masked"),
        F.concat_ws(" ", masked).alias("masked_text"),
    )


def sql_mask_contaminated(k: int = DECON_K) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    sh_pos = (
        f"[{{'i0': i - 1, "
        f"'sh': array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')}} "
        f"for i in generate_series(1, greatest(len({toks}) - {k - 1}, 1))]"
    )
    return f"""
WITH eval_sh AS (
  SELECT DISTINCT unnest({_sql_shingles_k('text', k)}) AS shingle
  FROM documents WHERE doc_id % {EVAL_MOD} = 0
),
pos AS (
  SELECT doc_id, u.i0 AS i0, u.sh AS shingle
  FROM (SELECT doc_id, unnest({sh_pos}) AS u
        FROM documents WHERE doc_id % {EVAL_MOD} <> 0)
),
hits AS (
  SELECT p.doc_id, list(DISTINCT p.i0) AS starts
  FROM pos p JOIN eval_sh e ON p.shingle = e.shingle
  GROUP BY p.doc_id
),
train AS (
  SELECT doc_id, {toks} AS toks FROM documents
  WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT t.doc_id,
       len(list_filter(generate_series(0, len(t.toks) - 1),
           j -> len(list_filter(COALESCE(h.starts, []),
                    s -> s <= j AND j <= s + {k - 1})) > 0)) AS n_masked,
       array_to_string(
         [CASE WHEN len(list_filter(COALESCE(h.starts, []),
                       s -> s <= j AND j <= s + {k - 1})) > 0
               THEN '<mask>' ELSE t.toks[j + 1] END
          for j in generate_series(0, len(t.toks) - 1)], ' ') AS masked_text
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
"""


# ---------------------------------------------------------------------------
# BPE-style adjacent-pair frequency (the inner loop of tokenizer training).
# ---------------------------------------------------------------------------

BPE_TOPK = 30


def _pairs_of(ws):
    """Adjacent-pair array over a MATERIALIZED token-array column."""
    n = F.size(ws)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(
    spark: SparkSession, sf_dir: str, topk: int = BPE_TOPK
) -> DataFrame:
    """(pair, n): the ``topk`` most frequent ADJACENT token pairs across
    the corpus — the statistic a BPE/unigram tokenizer trainer computes
    every merge iteration.  Deterministic order: (n desc, pair asc).

    Plan: pair enumeration is a per-row transform over the token array
    (no join), the count is ONE map-side-combinable groupBy on the pair
    key, and the top-k is TakeOrdered — at 10^12 docs the exchange
    carries only partial (pair, count) rows, the canonical word-count
    shape.  A full BPE trainer would iterate: count -> merge best pair
    into the token stream (a row-local transform) -> recount.

    The token array is materialized as a column BEFORE the pair
    transform: element_at over the raw split() expression would
    re-evaluate the split per access (O(tokens^2) per doc — measured
    4x slower even on abstract-sized docs)."""
    docs = _docs(spark, sf_dir)
    words = docs.select(_toks().alias("ws"))
    return (
        words.select(F.explode(_pairs_of(F.col("ws"))).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(topk)
    )


def sql_bpe_pair_counts(topk: int = BPE_TOPK) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH t AS (SELECT {toks} AS ws FROM documents),
pairs AS (
  SELECT unnest([ws[i] || ' ' || ws[i + 1]
                 for i in generate_series(1, len(ws) - 1)]) AS pair
  FROM t
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (integer-quantized idf for cross-engine
# exactness, the KM_SCALE convention).
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3
IDF_SCALE = 1_000_000


def tfidf_keywords(
    spark: SparkSession, sf_dir: str, topk: int = TFIDF_TOPK
) -> DataFrame:
    """(doc_id, term, tf, score): each doc's ``topk`` terms by tf-idf,
    with idf quantized to idf_q = (N * IDF_SCALE) div df so the score
    (tf * idf_q) is EXACT integer arithmetic — bit-identical across
    engines, no float-boundary flakiness at the top-k cut.  Ties break
    (score desc, term asc).

    Plan: tf is one (doc, term) groupBy of the exploded token stream; df
    derives from tf (one more partial-agg shuffle on term); N is a 1-row
    broadcast; the per-doc top-k compiles to WindowGroupLimit, so each
    map task keeps only its local k before the doc_id exchange."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_toks()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score",
            F.col("tf") * F.expr(f"div(n_docs * {IDF_SCALE}, df)"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("doc_id", "term", "tf", "score")
    )


def sql_tfidf_keywords(topk: int = TFIDF_TOPK) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT doc_id, term, tf,
       CAST(tf * ((n.n_docs * {IDF_SCALE}) // df.df) AS BIGINT) AS score
FROM tf JOIN df USING (term) CROSS JOIN n
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, term) <= {topk}
"""


# ---------------------------------------------------------------------------
# Count-min sketch frequency estimation (mergeable heavy-hitter counts).
# ---------------------------------------------------------------------------

CMS_W = 256   # buckets per row
CMS_D = 4     # hash rows
CMS_TERMS = ["hash", "join", "window", "stream", "the"]


def _cms_bucket(d_col, term_col):
    # identical in DuckDB: CAST('0x' || substring(md5(d || '|' || term),
    # 1, 15) AS BIGINT) % CMS_W — the repo's md5 idiom, exact both sides.
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(d_col.cast("string"), F.lit("|"), term_col)),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_W
    )


def countmin_freq(
    spark: SparkSession, sf_dir: str, terms: list[str] | None = None
) -> DataFrame:
    """(term, exact_n, cms_est): corpus frequency of the probe terms,
    exact vs the count-min estimate (min over CMS_D hashed-bucket sums;
    always >= exact).  The sketch is what a 10^12-token corpus keeps when
    exact per-term counts don't fit: CMS_D x CMS_W counters, built in ONE
    pass with map-side partial aggregation (the exchange carries at most
    parts * D * W rows), mergeable across any partitioning.  Determinism:
    buckets come from md5(d || '|' || term), identical in DuckDB."""
    if terms is None:
        terms = CMS_TERMS
    toks = _docs(spark, sf_dir).select(F.explode(_toks()).alias("term"))
    d = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d")
    sketch = (
        toks.select("term", d)
        .select("d", _cms_bucket(F.col("d"), F.col("term")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = spark.createDataFrame([(t,) for t in terms], "term string")
    probe_cells = probes.select(
        "term",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
    ).select(
        "term", "d", _cms_bucket(F.col("d"), F.col("term")).alias("bucket")
    )
    est = (
        probe_cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    exact = (
        toks.join(F.broadcast(probes), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return (
        probes.join(F.broadcast(exact), "term", "left")
        .join(F.broadcast(est), "term", "left")
        .select(
            "term",
            F.coalesce("exact_n", F.lit(0)).alias("exact_n"),
            F.coalesce("cms_est", F.lit(0)).alias("cms_est"),
        )
    )


def sql_countmin_freq(terms: list[str] | None = None) -> str:
    if terms is None:
        terms = CMS_TERMS
    vals = ", ".join(f"('{t}')" for t in terms)
    bucket = (
        "CAST('0x' || substring(md5(CAST(d AS VARCHAR) || '|' || term), "
        f"1, 15) AS BIGINT) % {CMS_W}"
    )
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(text, ' +')) AS term FROM documents
),
ds AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS d),
sketch AS (
  SELECT d, {bucket} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN ds GROUP BY 1, 2
),
probes AS (SELECT * FROM (VALUES {vals}) v(term)),
cells AS (SELECT term, d, {bucket} AS bucket FROM probes CROSS JOIN ds),
est AS (
  SELECT term, CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS cms_est
  FROM cells c LEFT JOIN sketch s USING (d, bucket) GROUP BY term
),
exact AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM toks JOIN probes USING (term) GROUP BY term
)
SELECT p.term,
       CAST(COALESCE(e.exact_n, 0) AS BIGINT) AS exact_n,
       CAST(COALESCE(s.cms_est, 0) AS BIGINT) AS cms_est
FROM probes p LEFT JOIN exact e USING (term) LEFT JOIN est s USING (term)
"""


# ---------------------------------------------------------------------------
# BPE merge application: apply the best (distinct-token) merge, recount.
# ---------------------------------------------------------------------------

def bpe_merge_step(
    spark: SparkSession, sf_dir: str, topk: int = BPE_TOPK
) -> DataFrame:
    """(pair, n): pair counts AFTER applying the corpus's best merge — one
    full iteration of BPE training on top of ``bpe_pair_counts``.  The
    winning pair is the most frequent whose two tokens DIFFER (for a != b
    adjacent matches cannot overlap, so the left-to-right non-overlapping
    merge is a closed-form row-local transform — no sequential scan); its
    merged symbol joins with '_'.

    Plan: one tiny driver collect for the winning pair (like the k-means
    centroid literals), then the merge rewrite is a pure projection over
    the token array and the recount is the same word-count shape as
    bpe_pair_counts — corpus scanned twice, shuffles carry (pair, count)
    partials only.  Each derived array (ws, then the rewritten nt) is
    MATERIALIZED as a column before element_at indexes into it —
    element_at over an unmaterialized expression re-evaluates it per
    access, turning the rewrite O(tokens^2) per doc (measured: 28s ->
    1.5s at sf0.001)."""
    docs = _docs(spark, sf_dir)
    words = docs.select(_toks().alias("ws"))
    top = (
        words.select(F.explode(_pairs_of(F.col("ws"))).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(
            F.element_at(F.split("pair", " "), 1)
            != F.element_at(F.split("pair", " "), 2)
        )
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .collect()
    )
    a, b = top[0]["pair"].split(" ")
    # eligible positions (t[i]=a, t[i+1]=b) cannot be adjacent when a != b,
    # so the non-overlapping rewrite is the shared closed form
    rewritten = words.select(_apply_merge(F.col("ws"), a, b).alias("nt"))
    return (
        rewritten.select(F.explode(_pairs_of(F.col("nt"))).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(topk)
    )


def sql_bpe_merge_step(topk: int = BPE_TOPK) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH t0 AS (SELECT {toks} AS ws FROM documents),
p0 AS (
  SELECT unnest([ws[i] || ' ' || ws[i + 1]
                 for i in generate_series(1, len(ws) - 1)]) AS pair
  FROM t0
),
top1 AS (
  SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
  FROM (SELECT pair, COUNT(*) AS n FROM p0 GROUP BY pair)
  WHERE string_split(pair, ' ')[1] <> string_split(pair, ' ')[2]
  ORDER BY n DESC, pair LIMIT 1
),
t1 AS (
  SELECT list_filter(
           [CASE WHEN i < len(ws) AND ws[i] = a AND ws[i + 1] = b
                   THEN a || '_' || b
                 WHEN i > 1 AND ws[i - 1] = a AND ws[i] = b
                   THEN NULL
                 ELSE ws[i] END
            for i in generate_series(1, len(ws))],
           x -> x IS NOT NULL) AS ws
  FROM t0 CROSS JOIN top1
),
p1 AS (
  SELECT unnest([ws[i] || ' ' || ws[i + 1]
                 for i in generate_series(1, len(ws) - 1)]) AS pair
  FROM t1
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM p1 GROUP BY pair
ORDER BY n DESC, pair LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding ANN.
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF damping constant


def hybrid_rrf(
    spark: SparkSession, sf_dir: str, k: int = RRF_K
) -> DataFrame:
    """(doc_id, bm25_rank, ann_rank, rrf): reciprocal-rank fusion of the
    lexical (BM25 top-k) and dense (brute-cosine top-k over the aligned
    embedding table) retrieval lists — the standard hybrid-search
    combiner (score = sum 1/(k + rank)), composed entirely from two
    operators this repo already gates.

    Scale shape: both component lists are top-k results (<= tens of
    rows), so the fusion itself — two row_number windows and a full-outer
    join — runs on driver-trivial data; ALL the heavy lifting stays in
    the component retrievers, which is the point of RRF (no score
    calibration across systems, only ranks).  Determinism: component
    scores are engine-identical, ranks tie-break on doc_id, and
    1/(k+rank) is exact double arithmetic."""
    from sparkmedkg import simsearch

    # bounded: both inputs are top-k retriever outputs (<= k rows each)
    bm = bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(exactq.bounded_window("doc_id", F.desc("score"), F.asc("doc_id")))
        .alias("bm25_rank"),
    )
    ann = simsearch.cosine_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(exactq.bounded_window("vec_id", F.desc("cos"), F.asc("vec_id")))
        .alias("ann_rank"),
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(k) + F.col(r)), F.lit(0.0)
    )
    return (
        bm.join(ann, "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "ann_rank",
            F.round(contrib("bm25_rank") + contrib("ann_rank"), 6).alias(
                "rrf"
            ),
        )
    )


def sql_hybrid_rrf(k: int = RRF_K) -> str:
    from sparkmedkg import simsearch

    return f"""
WITH bm_raw AS ({sql_bm25_topk()}),
ann_raw AS ({simsearch.sql_cosine_topk()}),
bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
  FROM bm_raw
),
ann AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos DESC, vec_id) AS ann_rank
  FROM ann_raw
)
SELECT COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
       bm25_rank, ann_rank,
       round(COALESCE(1.0 / ({k} + bm25_rank), 0)
             + COALESCE(1.0 / ({k} + ann_rank), 0), 6) AS rrf
FROM bm FULL OUTER JOIN ann USING (doc_id)
"""


# ---------------------------------------------------------------------------
# BPE encode: M iterative merges (the full trainer loop, unrolled).
# ---------------------------------------------------------------------------

BPE_ENCODE_M = 3


def _apply_merge(ws, a: str, b: str):
    """Row-local non-overlapping rewrite of adjacent (a, b) -> 'a_b'
    (requires a != b — guaranteed by the distinct-pair winner rule; same
    closed form as bpe_merge_step)."""
    al, bl, merged = F.lit(a), F.lit(b), F.lit(a + "_" + b)
    n = F.size(ws)

    def elig(i):
        return (F.element_at(ws, i) == al) & (F.element_at(ws, i + 1) == bl)

    return F.filter(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when((i < n) & elig(i), merged)
            .when((i > 1) & elig(i - 1), F.lit(None).cast("string"))
            .otherwise(F.element_at(ws, i)),
        ),
        lambda x: x.isNotNull(),
    )


def _bpe_encoded(spark: SparkSession, sf_dir: str, m: int) -> DataFrame:
    """(doc_id, ws, n0, orig): the BPE trainer loop factored out of
    bpe_encode so the round-trip gate shares the exact same merges; orig
    carries the pre-merge token stream for the decode comparison."""
    docs = _docs(spark, sf_dir)
    cur = docs.select(
        "doc_id",
        _toks().alias("ws"),
        F.size(_toks()).alias("n0"),
        F.array_join(_toks(), " ").alias("orig"),
    )
    for _ in range(m):
        top = (
            cur.select(F.explode(_pairs_of(F.col("ws"))).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(
                F.element_at(F.split("pair", " "), 1)
                != F.element_at(F.split("pair", " "), 2)
            )
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        a, b = top[0]["pair"].split(" ")
        cur = cur.select(
            "doc_id", _apply_merge(F.col("ws"), a, b).alias("ws"), "n0", "orig"
        )
    return cur


def bpe_encode(
    spark: SparkSession, sf_dir: str, m: int = BPE_ENCODE_M
) -> DataFrame:
    """(doc_id, n_tokens_raw, n_tokens_bpe, n_merges_applied): every
    document re-tokenized by ``m`` iterations of BPE training — each
    round finds the corpus-wide most-frequent distinct-token pair (tiny
    driver collect, the k-means-literal pattern) and applies the
    row-local merge rewrite.  This is the full trainer loop
    (bpe_pair_counts = the count inside one round, bpe_merge_step = one
    round; this runs ``m`` rounds and reports the compression each doc
    got).

    Plan: rewrites COMPOSE as stacked projections, so round k's pair
    count scans the raw corpus once through the composed expression — m
    scans total + 1 for the output, every shuffle a map-side-combinable
    (pair, count) partial.  Nothing iterative ever shuffles the token
    arrays themselves."""
    cur = _bpe_encoded(spark, sf_dir, m)
    return cur.select(
        "doc_id",
        F.col("n0").alias("n_tokens_raw"),
        F.size("ws").alias("n_tokens_bpe"),
        (F.col("n0") - F.size("ws")).alias("n_merges_applied"),
    )


def sql_bpe_encode(m: int = BPE_ENCODE_M) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH t0 AS (SELECT doc_id, {toks} AS ws, len({toks}) AS n0,
                   array_to_string({toks}, ' ') AS orig
            FROM documents),
{_sql_bpe_steps(m)}
SELECT doc_id, n0 AS n_tokens_raw, len(ws) AS n_tokens_bpe,
       n0 - len(ws) AS n_merges_applied
FROM t{m}
"""


# ---------------------------------------------------------------------------
# Compaction planning: bin-pack documents into target-size output files.
# ---------------------------------------------------------------------------

COMPACT_TARGET_BYTES = 16_384
COMPACT_SHARDS = 8


def compaction_plan(
    spark: SparkSession,
    sf_dir: str,
    target_bytes: int = COMPACT_TARGET_BYTES,
    shards: int = COMPACT_SHARDS,
) -> DataFrame:
    """(lang, shard, bucket, n_docs, total_bytes, min_doc, max_doc): the
    small-file compaction plan an Iceberg-style table-maintenance job
    executes — documents are bin-packed in doc_id order into output file
    groups of ~target_bytes each, independently per (lang, shard).

    The bucket id is floor(start_offset / target), where start_offset is
    the running byte total BEFORE the row — so the first doc of a group
    always lands at the group start and no group is split mid-document
    (the same first-fit rule as corpus_pack_sequences, which packs tokens
    into model contexts).

    Scale: the prefix sum is a per-(lang, shard) window — shards bound the
    sequential region, so a skewed lang ('en' at web scale) still
    parallelizes; integer byte math end-to-end (hash-stable)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    shard = (F.col("doc_id") % shards).cast("int")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = (
        d.withColumn("shard", shard)
        .withColumn("cum", F.sum("n_chars").over(w))
        .withColumn(
            "bucket",
            F.floor((F.col("cum") - F.col("n_chars")) / target_bytes).cast(
                "bigint"
            ),
        )
    )
    return placed.groupBy("lang", "shard", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def sql_compaction_plan(
    target_bytes: int = COMPACT_TARGET_BYTES, shards: int = COMPACT_SHARDS
) -> str:
    return f"""
WITH placed AS (
  SELECT lang, CAST(doc_id % {shards} AS INT) AS shard, doc_id, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY lang, doc_id % {shards} ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM documents
)
SELECT lang, shard,
       CAST(floor((cum - n_chars) / {target_bytes}) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM placed
GROUP BY lang, shard, bucket
"""


# ---------------------------------------------------------------------------
# Bigram language-model training counts (add-one smoothed).
# ---------------------------------------------------------------------------

LM_TOPK = 100
LM_PPM = 1_000_000


def bigram_lm(spark: SparkSession, sf_dir: str, topk: int = LM_TOPK) -> DataFrame:
    """(w1, w2, n, p_ppm): the top-k corpus bigrams with their add-one
    smoothed conditional probability P(w2|w1) = (n+1)/(total_w1 + V),
    integer-quantized to parts-per-million — the count table an n-gram LM
    trainer materializes (text_lm_perplexity is the matching scorer).

    Scale: bigram enumeration is arrays_zip over two slices of the token
    array (row-local, no index-loop HOF re-evaluation); the corpus is
    scanned ONCE — V and the per-w1 normalizer both derive from the
    persisted (w1, w2) count table (vocab-bounded, orders of magnitude
    below the corpus), V as a broadcast 1-row count and the normalizer as
    a window whose exchange moves only aggregated rows.  Top-k via
    TakeOrdered, ties broken (w1, w2)."""
    ws = F.split(F.lower(F.col("text")), " ")
    d = _docs(spark, sf_dir).select(ws.alias("ws"))
    pairs = d.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("w1"),
                F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n")).persist()
    # distinct w2 over the aggregated table == distinct w2 over raw pairs,
    # but costs a vocab-sized scan instead of a second corpus pass
    vocab = counts.agg(F.countDistinct("w2").alias("v"))
    return (
        counts.join(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "n",
            F.expr(
                f"(n + 1) * {LM_PPM} div "
                "(sum(n) over (partition by w1) + v)"
            )
            .cast("bigint")
            .alias("p_ppm"),
        )
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(topk)
    )


def sql_bigram_lm(topk: int = LM_TOPK) -> str:
    return f"""
WITH toks AS (
  SELECT string_split(lower(text), ' ') AS ws FROM documents
),
pos AS (
  SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM toks
),
pairs AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM pos),
counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs GROUP BY w1, w2
),
vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM pairs)
SELECT w1, w2, n,
       CAST((n + 1) * {LM_PPM} //
            (SUM(n) OVER (PARTITION BY w1) + v) AS BIGINT) AS p_ppm
FROM counts CROSS JOIN vocab
ORDER BY n DESC, w1, w2
LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# JSONL training-data export.
# ---------------------------------------------------------------------------

def export_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, line, n_chars): each document serialized as one JSON-Lines
    training record {"id":..,"lang":"..","text":".."} — the interchange
    format a tokenizer/trainer ingests (the text twin of
    kgembed.q_export_ntriples).  Escaping is explicit string math
    (backslash then quote) so the byte layout is deterministic and
    engine-identical — engine-native JSON serializers disagree on key
    order and whitespace, which would break verification.  Map-only:
    lines serialize partition-local, no shuffle at any scale."""

    def esc(c):
        return F.regexp_replace(
            F.regexp_replace(c, F.lit(r"\\"), F.lit(r"\\\\")),
            F.lit('"'),
            F.lit('\\"'),
        )

    line = F.concat(
        F.lit('{"id":'), F.col("doc_id").cast("string"),
        F.lit(',"lang":"'), esc(F.col("lang")),
        F.lit('","text":"'), esc(F.col("text")),
        F.lit('"}'),
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        line.alias("line"),
        F.length(line).cast("bigint").alias("n_chars"),
    )


def sql_export_jsonl() -> str:
    esc = (
        "replace(replace({c}, '\\', '\\\\'), '\"', '\\\"')"
    )
    line = (
        "'{{\"id\":' || CAST(doc_id AS VARCHAR) || ',\"lang\":\"' || "
        + esc.format(c="lang")
        + " || '\",\"text\":\"' || "
        + esc.format(c="text")
        + " || '\"}}'"
    ).format()
    return f"""
SELECT doc_id, {line} AS line,
       CAST(length({line}) AS BIGINT) AS n_chars
FROM documents
"""


# ---------------------------------------------------------------------------
# Positional inverted index + phrase search over it.
# ---------------------------------------------------------------------------

INV_MIN_DF = 5          # index terms appearing in >= this many docs
PHRASE = ("hash", "join")   # the phrase the positional-search demo answers


def inverted_index(
    spark: SparkSession, sf_dir: str, min_df: int = INV_MIN_DF
) -> DataFrame:
    """(term, df, doc_id, positions): the positional inverted index — per
    (term, document): the sorted token positions, alongside the term's
    document frequency.  This is the search-engine-side materialization of
    the corpus (what BM25 scoring and phrase/proximity queries consume);
    building it IS the canonical web-scale batch job.

    Plan: one posexplode, one (term, doc_id) groupBy assembling the sorted
    position list (map-side combinable — positions within a partition
    pre-collect), one term-level count for df joined back semi-broadcast.
    Postings are emitted partitioned by term, exactly how a shard-per-term
    index wants them; the min_df floor drops the hapax tail (at web scale
    you'd keep it — the floor here keeps the fixture index skimmable)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " +")).alias("pos", "term")
    )
    # positions is serialized to a canonical comma-joined string (scalar-only
    # result schemas — list cells are unhashable in pandas-side comparators).
    postings = ex.groupBy("term", "doc_id").agg(
        F.array_join(
            F.sort_array(F.collect_list("pos")).cast("array<string>"), ","
        ).alias("positions")
    )
    df_t = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    return postings.join(df_t, "term").select(
        "term", "df", "doc_id", "positions"
    )


def sql_inverted_index(min_df: int = INV_MIN_DF) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest([{{'pos': i - 1, 'term': t[i]}}
                 for i in generate_series(1, len(t))]) AS u
  FROM (SELECT doc_id, {toks} AS t FROM documents)
),
flat AS (SELECT doc_id, u.pos AS pos, u.term AS term FROM ex),
postings AS (
  SELECT term, doc_id,
         array_to_string(list(pos ORDER BY pos), ',') AS positions
  FROM flat GROUP BY term, doc_id
),
df_t AS (
  SELECT term, COUNT(*) AS df FROM postings GROUP BY term
  HAVING COUNT(*) >= {min_df}
)
SELECT p.term, d.df, p.doc_id, p.positions
FROM postings p JOIN df_t d ON p.term = d.term
"""


def phrase_search(
    spark: SparkSession, sf_dir: str, phrase: tuple = PHRASE
) -> DataFrame:
    """(doc_id, n_occurrences): documents containing the exact consecutive
    phrase, answered FROM THE POSITIONAL INDEX — postings of the two terms
    equi-joined on doc_id, then an adjacency intersection (pos+1) counted
    row-locally.  The proof that inverted_index supports phrase queries
    without rescanning text: the corpus-scale work is two posting lookups,
    not a regex over 100 TB.

    Plan: both posting lists arrive pre-sharded by term from the index
    build (here rebuilt inline — index reuse is a read of the materialized
    table); the doc_id equi-join touches only the two terms' postings, and
    the position intersection is an array expression on the joined row."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " +")).alias("pos", "term")
    )
    t1, t2 = phrase
    p1 = ex.where(F.col("term") == t1).groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("pa")
    )
    p2 = ex.where(F.col("term") == t2).groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("pb")
    )
    n_occ = F.size(
        F.filter(
            F.col("pa"), lambda p: F.array_contains(F.col("pb"), p + 1)
        )
    ).cast("bigint")
    return (
        p1.join(p2, "doc_id")
        .select("doc_id", n_occ.alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )


def sql_phrase_search(phrase: tuple = PHRASE) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    t1, t2 = phrase
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest([{{'pos': i - 1, 'term': t[i]}}
                 for i in generate_series(1, len(t))]) AS u
  FROM (SELECT doc_id, {toks} AS t FROM documents)
),
flat AS (SELECT doc_id, u.pos AS pos, u.term AS term FROM ex),
p1 AS (SELECT doc_id, list(pos ORDER BY pos) AS pa FROM flat
       WHERE term = '{t1}' GROUP BY doc_id),
p2 AS (SELECT doc_id, list(pos ORDER BY pos) AS pb FROM flat
       WHERE term = '{t2}' GROUP BY doc_id)
SELECT p1.doc_id,
       CAST(len(list_filter(pa, p -> list_contains(pb, p + 1))) AS BIGINT)
         AS n_occurrences
FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id
WHERE len(list_filter(pa, p -> list_contains(pb, p + 1))) > 0
"""


# ---------------------------------------------------------------------------
# BPE round-trip gate (encode -> decode identity).
# ---------------------------------------------------------------------------

def bpe_roundtrip(
    spark: SparkSession, sf_dir: str, m: int = BPE_ENCODE_M
) -> DataFrame:
    """(n_docs, n_roundtrip_ok): the tokenizer-correctness release gate —
    decode(encode(doc)) must reproduce every document byte-identically
    (merged pieces carry their boundary as '_', so decode is a per-piece
    replace).  Any row short of n_docs means the merge rewrite corrupted
    a document; a production pipeline blocks the tokenizer rollout on
    this number.

    Plan: shares bpe_encode's composed-projection lineage (m pair-count
    scans); the decode comparison is one row-local expression and the
    gate is a 1-row conditional aggregate."""
    cur = _bpe_encoded(spark, sf_dir, m)
    decoded = F.array_join(
        F.transform(F.col("ws"), lambda t: F.replace(t, F.lit("_"), F.lit(" "))),
        " ",
    )
    return cur.select(
        (decoded == F.col("orig")).cast("int").alias("ok")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ok").cast("bigint").alias("n_roundtrip_ok"),
    )


def _sql_bpe_steps(m: int) -> str:
    """The unrolled trainer CTE chain shared by sql_bpe_encode and
    sql_bpe_roundtrip (t0 .. t{m}, orig carried through)."""
    steps = []
    for k in range(m):
        steps.append(
            f"""p{k} AS (
  SELECT unnest([ws[i] || ' ' || ws[i + 1]
                 for i in generate_series(1, len(ws) - 1)]) AS pair
  FROM t{k}
),
top{k} AS (
  SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
  FROM (SELECT pair, COUNT(*) AS n FROM p{k} GROUP BY pair)
  WHERE string_split(pair, ' ')[1] <> string_split(pair, ' ')[2]
  ORDER BY n DESC, pair LIMIT 1
),
t{k + 1} AS (
  SELECT doc_id, n0, orig, list_filter(
           [CASE WHEN i < len(ws) AND ws[i] = a AND ws[i + 1] = b
                   THEN a || '_' || b
                 WHEN i > 1 AND ws[i - 1] = a AND ws[i] = b
                   THEN NULL
                 ELSE ws[i] END
            for i in generate_series(1, len(ws))],
           x -> x IS NOT NULL) AS ws
  FROM t{k} CROSS JOIN top{k}
)"""
        )
    return ",\n".join(steps)


def sql_bpe_roundtrip(m: int = BPE_ENCODE_M) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH t0 AS (SELECT doc_id, {toks} AS ws, len({toks}) AS n0,
                   array_to_string({toks}, ' ') AS orig
            FROM documents),
{_sql_bpe_steps(m)}
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN array_to_string(
                list_transform(ws, x -> replace(x, '_', ' ')), ' ') = orig
                THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
FROM t{m}
"""


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram probabilities (exact integer arithmetic).
# ---------------------------------------------------------------------------

KN_D_NUM, KN_D_DEN = 3, 4  # absolute discount D = 3/4


def kneser_ney(
    spark: SparkSession, sf_dir: str, topk: int = LM_TOPK
) -> DataFrame:
    """(w1, w2, n, pkn_ppm): the top-k corpus bigrams under interpolated
    Kneser-Ney smoothing — the n-gram smoother that won the empirical
    bake-offs (Chen & Goodman 1999) and what KenLM builds for LLM-corpus
    perplexity filters; bigram_lm's add-one is the classroom baseline,
    this is the production one.

        P_KN(w2|w1) = max(c12 - D, 0)/c1
                      + D*N1+(w1,.)/c1 * N1+(.,w2)/n_types

    With D = 3/4 the whole value is one exact rational,
        [max(4*c12-3, 0)*n_types + 3*N1+(w1,.)*N1+(.,w2)]
        / (4*c1*n_types),
    quantized by integer div to parts-per-million — BIGINT-exact across
    engines (headroom to ~1e18; at trillion-token scale the numerator
    wants DECIMAL(38,0), same expression).

    Scale: the corpus is scanned ONCE into the persisted (w1, w2, n)
    table; every KN statistic (c1, the two continuation counts, the type
    total) derives from that vocab-bounded table via map-side-combinable
    groupBys, joined back small-to-small, type total as a broadcast
    1-row."""
    ws = F.split(F.lower(F.col("text")), " ")
    d = _docs(spark, sf_dir).select(ws.alias("ws"))
    pairs = d.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("w1"),
                F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    counts = (
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n")).persist()
    )
    w1s = counts.groupBy("w1").agg(
        F.sum("n").alias("c1"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    w2s = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    types = counts.agg(F.count(F.lit(1)).alias("n_types"))
    num = (
        F.greatest(
            F.lit(KN_D_DEN) * F.col("n") - F.lit(KN_D_NUM), F.lit(0)
        ).cast("bigint")
        * F.col("n_types")
        + F.lit(KN_D_NUM) * F.col("n1p_fwd") * F.col("n1p_bwd")
    )
    den = F.lit(KN_D_DEN) * F.col("c1") * F.col("n_types")
    out = (
        counts.join(w1s, "w1")
        .join(w2s, "w2")
        .join(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "n",
            (num * F.lit(LM_PPM)).cast("bigint").alias("_num_ppm"),
            den.cast("bigint").alias("_den"),
        )
        .select(
            "w1",
            "w2",
            "n",
            F.expr("_num_ppm div _den").cast("bigint").alias("pkn_ppm"),
        )
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(topk)
    )
    return out


def sql_kneser_ney(topk: int = LM_TOPK) -> str:
    return f"""
WITH toks AS (
  SELECT string_split(lower(text), ' ') AS ws FROM documents
),
pairs AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, LATERAL unnest(generate_series(1, len(ws) - 1)) t(i)
),
counts AS (SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY w1, w2),
w1s AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c1,
               COUNT(*) AS n1p_fwd FROM counts GROUP BY w1),
w2s AS (SELECT w2, COUNT(*) AS n1p_bwd FROM counts GROUP BY w2),
types AS (SELECT COUNT(*) AS n_types FROM counts)
SELECT c.w1, c.w2, CAST(c.n AS BIGINT) AS n,
       CAST((CAST(GREATEST({KN_D_DEN} * c.n - {KN_D_NUM}, 0) AS BIGINT)
              * t.n_types
             + {KN_D_NUM} * a.n1p_fwd * b.n1p_bwd) * {LM_PPM}
            // ({KN_D_DEN} * a.c1 * t.n_types) AS BIGINT) AS pkn_ppm
FROM counts c
JOIN w1s a ON a.w1 = c.w1
JOIN w2s b ON b.w2 = c.w2
CROSS JOIN types t
ORDER BY c.n DESC, c.w1, c.w2
LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction (Rose et al. 2010).
# ---------------------------------------------------------------------------

RAKE_TOPK = 50


def rake_keyphrases(
    spark: SparkSession, sf_dir: str, topk: int = RAKE_TOPK
) -> DataFrame:
    """(phrase, n_occ, score_ppm): the top-k RAKE keyphrases of the corpus
    — candidate phrases are maximal stopword-free token runs, each word
    scores deg(w)/freq(w) (deg = total length of phrases containing w),
    and a phrase scores the sum of its words.  The zero-model keyphrase
    extractor corpus-curation stacks use to label domain clusters;
    complements tfidf_keywords (per-doc, single words) with corpus-level
    multi-word phrases.

    Word scores are integer-quantized (deg*PPM div freq) before the
    phrase sum, so every aggregate is BIGINT-exact — no float
    accumulation order to disagree on.  Scale: the corpus is scanned
    once into phrase occurrences (row-local HOF transforms, no UDF,
    no regex backtracking); all downstream stats are vocab-bounded
    groupBys.  Ties break lexicographically."""
    from sparkmedkg.textstats import STOPWORDS

    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.split(F.lower(F.col("text")), " ")
    marked = F.transform(
        toks,
        lambda t: F.when(F.array_contains(stops, t), F.lit("|")).otherwise(t),
    )
    phrases = F.filter(
        F.transform(
            F.split(F.array_join(marked, " "), "\\|"),
            lambda p: F.trim(p),
        ),
        lambda p: p != "",
    )
    ph = (
        _docs(spark, sf_dir)
        .select(F.explode(phrases).alias("phrase"))
        .persist()
    )
    occ = ph.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    wocc = ph.select(
        F.explode(F.split("phrase", " ")).alias("word"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    wstats = (
        wocc.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
        .select(
            "word",
            F.expr(f"(deg * {LM_PPM}) div freq").cast("bigint").alias("wscore"),
        )
    )
    out = (
        occ.select("phrase", "n_occ", F.explode(F.split("phrase", " ")).alias("word"))
        .join(wstats, "word")
        .groupBy("phrase", "n_occ")
        .agg(F.sum("wscore").cast("bigint").alias("score_ppm"))
        .orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(topk)
        .localCheckpoint(eager=True)
    )
    ph.unpersist()
    return out


def sql_rake_keyphrases(topk: int = RAKE_TOPK) -> str:
    from sparkmedkg.textstats import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH marked AS (
  SELECT array_to_string(
           [CASE WHEN t IN ({stops}) THEN '|' ELSE t END
            for t in string_split(lower(text), ' ')], ' ') AS s
  FROM documents
),
ph AS (
  SELECT trim(p) AS phrase
  FROM marked, LATERAL unnest(string_split(s, '|')) t(p)
  WHERE trim(p) <> ''
),
occ AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM ph GROUP BY phrase),
wocc AS (
  SELECT w AS word, len(string_split(phrase, ' ')) AS plen
  FROM ph, LATERAL unnest(string_split(phrase, ' ')) t(w)
),
wstats AS (
  SELECT word,
         CAST((CAST(SUM(plen) AS BIGINT) * {LM_PPM}) // COUNT(*) AS BIGINT)
           AS wscore
  FROM wocc GROUP BY word
)
SELECT o.phrase, o.n_occ,
       CAST(SUM(w.wscore) AS BIGINT) AS score_ppm
FROM occ o, LATERAL unnest(string_split(o.phrase, ' ')) t(wd)
JOIN wstats w ON w.word = t.wd
GROUP BY o.phrase, o.n_occ
ORDER BY score_ppm DESC, o.phrase
LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility / compression ratio per source.
# ---------------------------------------------------------------------------

def bpe_fertility(
    spark: SparkSession, sf_dir: str, m: int = BPE_ENCODE_M
) -> DataFrame:
    """(source, n_docs, total_bytes, total_bpe_tokens, bytes_per_token_ppm):
    tokenizer fertility per corpus source — how many text bytes one BPE
    token covers after ``m`` trained merges.  The tokenizer-rollout
    metric (compression ratio by domain): sources whose bytes/token sits
    far below the corpus norm are being shredded by the vocab and will
    dominate training cost per byte.

    Reuses ``_bpe_encoded``'s composed-projection merges (the corpus is
    scanned m+1 times total, nothing iterative shuffles token arrays)
    joined back to the per-doc byte length; the rollup is one map-side
    combinable groupBy on the low-cardinality source key.  The ratio is
    integer-quantized (bytes * PPM div tokens) — BIGINT-exact across
    engines."""
    enc = _bpe_encoded(spark, sf_dir, m).select(
        "doc_id", F.size("ws").alias("n_bpe")
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.length("text").alias("n_bytes")
    )
    return (
        docs.join(enc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_bytes",
            "total_bpe_tokens",
            F.expr(f"(total_bytes * {LM_PPM}) div total_bpe_tokens")
            .cast("bigint")
            .alias("bytes_per_token_ppm"),
        )
    )


def sql_bpe_fertility(m: int = BPE_ENCODE_M) -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH t0 AS (SELECT doc_id, {toks} AS ws, len({toks}) AS n0,
                   array_to_string({toks}, ' ') AS orig
            FROM documents),
{_sql_bpe_steps(m)},
enc AS (SELECT doc_id, len(ws) AS n_bpe FROM t{m}),
d AS (SELECT doc_id, source, length(text) AS n_bytes FROM documents)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(d.n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(e.n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(CAST(SUM(d.n_bytes) AS BIGINT) * {LM_PPM}
            // CAST(SUM(e.n_bpe) AS BIGINT) AS BIGINT)
         AS bytes_per_token_ppm
FROM d JOIN enc e ON e.doc_id = d.doc_id
GROUP BY d.source
"""


# ---------------------------------------------------------------------------
# Semantic decontamination (embedding-cosine eval overlap).
# ---------------------------------------------------------------------------

SEMDECON_TAU = 0.30  # cosine flag threshold vs the eval set


def semantic_decontaminate(
    spark: SparkSession, sf_dir: str, tau: float = SEMDECON_TAU
) -> DataFrame:
    """(vec_id, max_eval_cos, flagged): every training document scored by
    its maximum embedding cosine against the held-out eval split (vec_id
    % EVAL_MOD == 0, the same split rule as the shingle-based
    ``decontaminate``) — the SEMANTIC decontamination pass that catches
    paraphrased eval leakage n-gram overlap misses.  Docs at or above
    ``tau`` are release-blocked.

    Plan: the eval split is small BY DEFINITION (eval suites are
    thousands of rows, the corpus is trillions), so it broadcasts and
    the corpus pays one scan with |eval| fused dot products per row —
    a bounded broadcast nested loop, the same contract as decontaminate's
    broadcast shingle set.  max() is order-independent, so no float
    accumulation hazard; the fold itself runs in index order."""
    from sparkmedkg.simsearch import _dot, _norm

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ev = emb.where(F.col("vec_id") % EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("ev")
    )
    train = emb.where(F.col("vec_id") % EVAL_MOD != 0)
    cos = _dot("v", "ev") / (_norm(F.col("v")) * _norm(F.col("ev")))
    scored = (
        train.crossJoin(F.broadcast(ev))
        .select("vec_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("mc"))
    )
    return scored.select(
        "vec_id",
        F.round("mc", 6).alias("max_eval_cos"),
        (F.col("mc") >= tau).alias("flagged"),
    )


def sql_semantic_decontaminate(tau: float = SEMDECON_TAU) -> str:
    from sparkmedkg.simsearch import _SQL_DOT, _SQL_NORM

    cos = (
        f"({_SQL_DOT.format(a='t.v', b='e.ev')}) / "
        f"({_SQL_NORM.format(a='t.v')} * {_SQL_NORM.format(a='e.ev')})"
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding AS v FROM embeddings),
ev AS (SELECT vec_id AS eval_id, v AS ev FROM emb
       WHERE vec_id % {EVAL_MOD} = 0),
scored AS (
  SELECT t.vec_id, MAX({cos}) AS mc
  FROM emb t CROSS JOIN ev e
  WHERE t.vec_id % {EVAL_MOD} <> 0
  GROUP BY t.vec_id
)
SELECT vec_id, round(mc, 6) AS max_eval_cos, mc >= {tau} AS flagged
FROM scored
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode & Muthukrishnan) + overestimate
# audit against exact counts.
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 64  # counters per row
CMS_TOPK = 20


def cms_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    d: int = CMS_D,
    w: int = CMS_W,
    k: int = CMS_TOPK,
) -> DataFrame:
    """(term, exact_n, cms_est, over_err): the top-k corpus tokens by
    exact frequency, alongside the count-min-sketch estimate from a d x w
    register table and the sketch's overestimate (cms_est >= exact_n
    always — CMS errs only upward).  The streaming-frequency workhorse:
    the register table is d*w MERGEABLE integers, so per-shard sketches
    from 1000 executors combine by elementwise addition while the exact
    count needs a full token shuffle.

    Plan: exact counts are one map-side-combinable groupBy (the sketch is
    DERIVED from the count table — vocab-sized, not corpus-sized work);
    the register build is a vocab x d explode into a d*w-row aggregate;
    estimation joins the top-k candidates against the BROADCAST register
    table (d*w rows).  Hashes are 60-bit md5 prefixes mod w — the same
    engine-portable integer idiom as the md5-bucket samplers, so the
    DuckDB twin is bit-exact.  At production scale the top-k candidate
    set comes from per-partition Misra-Gries pre-aggregation rather than
    the exact table (documented seam; the exact table here is what makes
    the sketch auditable)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " +")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    rows = counts.select(
        "term",
        "n",
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    )
    cells = rows.select(
        "term",
        "n",
        "r",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("r").cast("string"), F.lit(":"), F.col("term")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(w),
        ).alias("col"),
    )
    reg = cells.groupBy("r", "col").agg(F.sum("n").alias("cnt"))
    topk = counts.orderBy(F.desc("n"), F.asc("term")).limit(k)
    out = (
        topk.join(cells.select("term", "r", "col"), "term")
        .join(F.broadcast(reg), ["r", "col"])
        .groupBy("term", "n")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .select(
            "term",
            F.col("n").alias("exact_n"),
            "cms_est",
            (F.col("cms_est") - F.col("n")).cast("bigint").alias("over_err"),
        )
    )
    counts.unpersist()
    return out


def sql_cms_heavy_hitters(
    d: int = CMS_D, w: int = CMS_W, k: int = CMS_TOPK
) -> str:
    return f"""
WITH counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_split_to_array(text, ' +')) AS term
        FROM documents)
  GROUP BY term
),
cells AS (
  SELECT term, n, r,
         CAST('0x' || substring(
           md5(CAST(r AS VARCHAR) || ':' || term), 1, 15) AS BIGINT) % {w}
           AS col
  FROM counts, (SELECT unnest(range({d})) AS r)
),
reg AS (SELECT r, col, SUM(n) AS cnt FROM cells GROUP BY r, col),
topk AS (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT {k})
SELECT t.term, t.n AS exact_n,
       CAST(MIN(g.cnt) AS BIGINT) AS cms_est,
       CAST(MIN(g.cnt) - t.n AS BIGINT) AS over_err
FROM topk t
JOIN cells c ON c.term = t.term
JOIN reg g ON g.r = c.r AND g.col = c.col
GROUP BY t.term, t.n
"""


# ---------------------------------------------------------------------------
# TextRank keywords (Mihalcea & Tarau) over the word-adjacency graph.
# ---------------------------------------------------------------------------

TR_ITERS = 3
TR_DAMPING = 0.85
TR_MIN_PAIR = 2   # adjacency support floor — drops hapax edges
TR_TOPK = 30


def textrank_keywords(
    spark: SparkSession,
    sf_dir: str,
    iters: int = TR_ITERS,
    damping: float = TR_DAMPING,
    min_pair: int = TR_MIN_PAIR,
    topk: int = TR_TOPK,
) -> DataFrame:
    """(term, score): corpus-level TextRank — PageRank over the undirected
    word graph whose edges are token adjacencies with support >= min_pair,
    top-k by score.  The graph-based complement to RAKE (degree/frequency
    scoring) and tf-idf: a word ranks high when its NEIGHBORS rank high,
    which surfaces connective domain vocabulary frequency alone misses.

    Plan: the bigram edge build is one posexplode + one (doc, pos+1)
    self-join fused on the doc key + one pair groupBy — the same shape as
    kneser_ney's bigram table; the graph is VOCAB-sized, so the PR
    iterations (broadcast-join rank against edges, grouped sum) never
    touch the corpus again.  Doubles survive the cross-engine gate the
    same way pagerank's do: values O(1/|V|), reassociation error O(1e-17),
    output rounded at 6; top-k ordering breaks ties on the term."""
    docs = _docs(spark, sf_dir)
    ex = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " +")).alias(
            "pos", "term"
        ),
    )
    a = ex.select("doc_id", "pos", F.col("term").alias("ta"))
    b = ex.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("term").alias("tb")
    )
    und = (
        a.join(b, ["doc_id", "pos"])
        .where(F.col("ta") != F.col("tb"))
        .select(
            F.least("ta", "tb").alias("x"), F.greatest("ta", "tb").alias("y")
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_pair)
        .select("x", "y")
    )
    edges = und.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionByName(
        und.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    ed = edges.join(deg, "src").persist()
    nodes = ed.select(F.col("src").alias("term")).distinct().persist()
    n = nodes.count()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["term"])
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes["term"] == contrib["dst"], "left"
        ).select(
            "term",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
    out = (
        ranks.select("term", F.round("pr", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(topk)
        .localCheckpoint(eager=True)
    )
    ed.unpersist()
    nodes.unpersist()
    return out


def sql_textrank_keywords(
    iters: int = TR_ITERS,
    damping: float = TR_DAMPING,
    min_pair: int = TR_MIN_PAIR,
    topk: int = TR_TOPK,
) -> str:
    toks = "regexp_split_to_array(lower(text), ' +')"
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""tr_r{k} AS (
  SELECT n.term,
         (1 - {damping}) / (SELECT n FROM tr_n)
         + {damping} * COALESCE(c.s, 0) AS pr
  FROM tr_nodes n LEFT JOIN (
    SELECT e.dst AS term, SUM(p.pr / dg.deg) AS s
    FROM tr_edges e
    JOIN tr_r{k - 1} p ON e.src = p.term
    JOIN tr_deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) c ON c.term = n.term
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH ex AS (
  SELECT doc_id,
         unnest([{{'pos': i - 1, 'term': t[i]}}
                 for i in generate_series(1, len(t))]) AS u
  FROM (SELECT doc_id, {toks} AS t FROM documents)
),
flat AS (SELECT doc_id, u.pos AS pos, u.term AS term FROM ex),
und AS (
  SELECT least(a.term, b.term) AS x, greatest(a.term, b.term) AS y
  FROM flat a JOIN flat b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term <> b.term
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_pair}
),
tr_edges AS (SELECT x AS src, y AS dst FROM und
             UNION ALL SELECT y, x FROM und),
tr_deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
           FROM tr_edges GROUP BY src),
tr_nodes AS (SELECT DISTINCT src AS term FROM tr_edges),
tr_n AS (SELECT COUNT(*) AS n FROM tr_nodes),
tr_r0 AS (SELECT term, 1.0 / (SELECT n FROM tr_n) AS pr FROM tr_nodes),
{unrolled}
SELECT term, round(pr, 6) AS score
FROM tr_r{iters}
ORDER BY score DESC, term LIMIT {topk}
"""


# ---------------------------------------------------------------------------
# Contamination scorecard (n-gram + semantic passes, one row).
# ---------------------------------------------------------------------------

def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_train_docs, n_ngram_hits, n_semantic_hits, n_either,
    pct_clean): the one-row eval-contamination scorecard a release gate
    signs off on — how many training docs the exact k-shingle pass flags,
    how many the embedding-cosine pass flags (paraphrase leakage the
    n-gram pass misses), the union, and the surviving-clean percentage.
    Composes the two gated passes (decontaminate,
    semantic_decontaminate), so the numbers are BY CONSTRUCTION the same
    docs those queries flag — no twin-drift between the report and the
    enforcement ops.

    Plan: both passes broadcast the (definitionally small) eval split and
    scan the corpus once each; the roll-up joins run over the flagged
    sets only.  doc_id and vec_id share the id space in the fixtures
    (documents and embeddings are row-aligned), which stands in for the
    production doc->embedding join key."""
    train = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id")
    )
    ngram = decontaminate(spark, sf_dir).select("doc_id").distinct()
    sem = (
        semantic_decontaminate(spark, sf_dir)
        .where(F.col("flagged"))
        .where(F.col("vec_id") % EVAL_MOD != 0)
        .select(F.col("vec_id").alias("doc_id"))
        .join(train, "doc_id", "left_semi")
    )
    either = ngram.unionByName(sem).distinct()
    agg = (
        train.agg(F.count(F.lit(1)).alias("n_train_docs"))
        .crossJoin(ngram.agg(F.count(F.lit(1)).alias("n_ngram_hits")))
        .crossJoin(sem.agg(F.count(F.lit(1)).alias("n_semantic_hits")))
        .crossJoin(either.agg(F.count(F.lit(1)).alias("n_either")))
    )
    return agg.select(
        "n_train_docs",
        "n_ngram_hits",
        "n_semantic_hits",
        "n_either",
        F.round(
            (F.col("n_train_docs") - F.col("n_either")).cast("double")
            / F.col("n_train_docs")
            * 100.0,
            6,
        ).alias("pct_clean"),
    )


def sql_contamination_report() -> str:
    return f"""
WITH ngram AS (
  SELECT DISTINCT doc_id FROM ({sql_decontaminate()})
),
sem AS (
  SELECT vec_id AS doc_id FROM ({sql_semantic_decontaminate()})
  WHERE flagged AND vec_id % {EVAL_MOD} <> 0
    AND vec_id IN (SELECT doc_id FROM documents WHERE doc_id % {EVAL_MOD} <> 0)
),
either AS (SELECT doc_id FROM ngram UNION SELECT doc_id FROM sem),
base AS (
  SELECT CAST((SELECT COUNT(*) FROM documents
               WHERE doc_id % {EVAL_MOD} <> 0) AS BIGINT) AS n_train_docs,
         CAST((SELECT COUNT(*) FROM ngram) AS BIGINT) AS n_ngram_hits,
         CAST((SELECT COUNT(*) FROM sem) AS BIGINT) AS n_semantic_hits,
         CAST((SELECT COUNT(*) FROM either) AS BIGINT) AS n_either
)
SELECT n_train_docs, n_ngram_hits, n_semantic_hits, n_either,
       round((n_train_docs - n_either)::DOUBLE / n_train_docs * 100.0, 6)
         AS pct_clean
FROM base
"""


# ---------------------------------------------------------------------------
# Bloom-filter false-positive audit (mergeable bit registers).
# ---------------------------------------------------------------------------

BLOOM_M = 4096
BLOOM_K = 3


def bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(m_bits, k_hashes, n_build, n_probe, n_set_bits, n_false_pos,
    fpr_ppm, expected_fpr): build a Bloom filter over the even-doc_id
    half's text fingerprints and measure its REAL false-positive rate on
    the disjoint odd half — the audit that validates a bloom-prefilter
    stage (e.g. cross-snapshot "have we crawled this content before")
    before trusting it at 10^12 keys.  expected_fpr = (set_bits/m)^k is
    the textbook estimate; the measured fpr_ppm sits next to it so drift
    (hash correlation, undersized m) is visible.

    The register set is MERGEABLE by construction — it is just the
    distinct (bit) relation, so shard filters union bitwise like the HLL
    and count-min registers.  All hashing is the repo's 60-bit md5
    idiom (bit-identical in DuckDB); membership is a k-way bit semi-join
    + per-key ALL() — no filter object ever sits on the driver."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.col("text")).alias("fp")
    )
    build_fps = docs.where(F.col("doc_id") % 2 == 0).select("fp").distinct()
    probe_fps = docs.where(F.col("doc_id") % 2 == 1).select("fp").distinct()

    def bits(df):
        j = F.explode(F.array(*[F.lit(i) for i in range(1, BLOOM_K + 1)]))
        return df.select("fp", j.alias("j")).select(
            "fp",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("fp"), F.lit("|"), F.col("j"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % BLOOM_M
            ).alias("bit"),
        )

    registers = bits(build_fps).select("bit").distinct()
    probed = (
        bits(probe_fps)
        .join(
            registers.withColumn("hit", F.lit(True)), "bit", "left"
        )
        .groupBy("fp")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(False))).alias("present"))
    )
    fps = (
        probed.where("present")
        .join(build_fps, "fp", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_false_pos"))
    )
    agg = (
        build_fps.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
        .crossJoin(
            probe_fps.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
        )
        .crossJoin(
            registers.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_set_bits")
            )
        )
        .crossJoin(fps)
    )
    return agg.select(
        F.lit(BLOOM_M).cast("bigint").alias("m_bits"),
        F.lit(BLOOM_K).cast("bigint").alias("k_hashes"),
        "n_build",
        "n_probe",
        "n_set_bits",
        "n_false_pos",
        F.expr("n_false_pos * 1000000 div n_probe")
        .cast("bigint")
        .alias("fpr_ppm"),
        F.round(
            F.pow(
                F.col("n_set_bits").cast("double") / BLOOM_M, F.lit(BLOOM_K)
            ),
            6,
        ).alias("expected_fpr"),
    )


def sql_bloom_fpr() -> str:
    h = (
        "CAST('0x' || substring(md5(fp || '|' || j), 1, 15) AS BIGINT) "
        f"% {BLOOM_M}"
    )
    return f"""
WITH fps AS (SELECT doc_id, md5(text) AS fp FROM documents),
build AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
probe AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 1),
build_bits AS (
  SELECT DISTINCT {h} AS bit
  FROM build CROSS JOIN (SELECT unnest(generate_series(1, {BLOOM_K})) AS j)
),
probe_bits AS (
  SELECT fp, {h} AS bit
  FROM probe CROSS JOIN (SELECT unnest(generate_series(1, {BLOOM_K})) AS j)
),
probed AS (
  SELECT p.fp, MIN(b.bit IS NOT NULL) AS present
  FROM probe_bits p LEFT JOIN build_bits b ON b.bit = p.bit
  GROUP BY p.fp
),
fp_cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_false_pos
  FROM probed WHERE present AND fp NOT IN (SELECT fp FROM build)
),
base AS (
  SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build,
         CAST((SELECT COUNT(*) FROM probe) AS BIGINT) AS n_probe,
         CAST((SELECT COUNT(*) FROM build_bits) AS BIGINT) AS n_set_bits,
         (SELECT n_false_pos FROM fp_cnt) AS n_false_pos
)
SELECT CAST({BLOOM_M} AS BIGINT) AS m_bits,
       CAST({BLOOM_K} AS BIGINT) AS k_hashes,
       n_build, n_probe, n_set_bits, n_false_pos,
       CAST(n_false_pos * 1000000 // n_probe AS BIGINT) AS fpr_ppm,
       round(pow(n_set_bits::DOUBLE / {BLOOM_M}, {BLOOM_K}), 6)
         AS expected_fpr
FROM base
"""


# ---------------------------------------------------------------------------
# Shingle-novelty growth curve (crawl-value decay audit).
# ---------------------------------------------------------------------------

GROWTH_BUCKETS = 10


def shingle_growth(
    spark: SparkSession, sf_dir: str, k: int = DECON_K
) -> DataFrame:
    """(bucket, n_docs, n_shingles, n_new, pct_new_ppm): ingest the
    corpus in doc_id order in ``GROWTH_BUCKETS`` equal slices and count,
    per slice, how many of its distinct k-shingles were NEVER seen in an
    earlier slice — the crawl-value decay curve.  heaps_law tracks
    vocabulary growth; this is the CONTENT-level twin dedup planners
    read: when pct_new flattens, additional crawling is mostly re-paying
    storage for text you already have.

    Plan: each shingle's first-seen bucket is one grouped MIN over the
    (shingle, bucket) projection — novelty never needs a self-join or an
    ordered scan; per-bucket totals ride the same map-side-combinable
    shape.  All counts BIGINT, share in exact ppm."""
    docs = _docs(spark, sf_dir)
    ids = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    sh = (
        docs.crossJoin(F.broadcast(ids))
        .select(
            "doc_id",
            F.least(
                F.expr(
                    f"(doc_id - lo) * {GROWTH_BUCKETS} div (hi - lo + 1)"
                ),
                F.lit(GROWTH_BUCKETS - 1),
            )
            .cast("bigint")
            .alias("bucket"),
            F.explode(F.array_distinct(_shingles_k("text", k))).alias("s"),
        )
    )
    per_bucket = sh.groupBy("bucket").agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.count_distinct("s").cast("bigint").alias("n_shingles"),
    )
    first_seen = sh.groupBy("s").agg(F.min("bucket").alias("bucket"))
    new_per = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    return (
        per_bucket.join(new_per, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            "n_shingles",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.expr(
                "coalesce(n_new, 0) * 1000000 div n_shingles"
            )
            .cast("bigint")
            .alias("pct_new_ppm"),
        )
    )


def sql_shingle_growth(k: int = DECON_K) -> str:
    return f"""
WITH ids AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
sh AS (
  SELECT doc_id,
         least((doc_id - lo) * {GROWTH_BUCKETS} // (hi - lo + 1),
               {GROWTH_BUCKETS - 1}) AS bucket,
         unnest(list_distinct({_sql_shingles_k('text', k)})) AS s
  FROM documents CROSS JOIN ids
),
per_bucket AS (
  SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT s) AS BIGINT) AS n_shingles
  FROM sh GROUP BY bucket
),
first_seen AS (SELECT s, MIN(bucket) AS bucket FROM sh GROUP BY s),
new_per AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY bucket
)
SELECT p.bucket, p.n_docs, p.n_shingles,
       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(n.n_new, 0) * 1000000 // p.n_shingles AS BIGINT)
         AS pct_new_ppm
FROM per_bucket p LEFT JOIN new_per n ON n.bucket = p.bucket
"""


# ---------------------------------------------------------------------------
# Doc-feature Pearson correlation matrix.
# ---------------------------------------------------------------------------

def feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fa, fb, n_docs, r): Pearson correlation between every pair of the
    three cheap per-doc features quality gates threshold on — chars,
    tokens, distinct tokens.  Highly-correlated features are redundant
    gates (tune one, drop the other); a LOW chars-tokens correlation
    flags tokenization pathologies (huge unsegmented blobs).  The feature
    audit run before fitting any quality classifier.

    Same exactness contract as events_type_correlation: all five moments
    BIGINT, one IEEE division + correctly-rounded sqrts at emit, round 6.
    Plan: one map-only feature projection, a features-sized unpivot, one
    pair join keyed on doc_id over a 3-row-per-doc table."""
    toks = _toks()
    feats = _docs(spark, sf_dir).select(
        "doc_id",
        F.length("text").cast("bigint").alias("chars"),
        F.size(toks).cast("bigint").alias("tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("distinct_tokens"),
    )
    long = feats.selectExpr(
        "doc_id",
        "stack(3, 'chars', chars, 'tokens', tokens, "
        "'distinct_tokens', distinct_tokens) AS (f, v)",
    )
    a = long.select("doc_id", F.col("f").alias("fa"), F.col("v").alias("x"))
    b = long.select("doc_id", F.col("f").alias("fb"), F.col("v").alias("y"))
    m = (
        a.join(b, "doc_id")
        .where(F.col("fa") < F.col("fb"))
        .groupBy("fa", "fb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sy2"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")).cast("double")
    r = F.when(
        (dx > 0) & (dy > 0), F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)
    )
    return m.select("fa", "fb", F.col("n").alias("n_docs"), r.alias("r"))


def sql_feature_correlation() -> str:
    toks = "regexp_split_to_array(lower(text), ' +')"
    return f"""
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(len({toks}) AS BIGINT) AS tokens,
         CAST(len(list_distinct({toks})) AS BIGINT) AS distinct_tokens
  FROM documents
),
long AS (
  SELECT doc_id, 'chars' AS f, chars AS v FROM feats
  UNION ALL SELECT doc_id, 'tokens', tokens FROM feats
  UNION ALL SELECT doc_id, 'distinct_tokens', distinct_tokens FROM feats
),
m AS (
  SELECT a.f AS fa, b.f AS fb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a.v) AS BIGINT) AS sx,
         CAST(SUM(b.v) AS BIGINT) AS sy,
         CAST(SUM(a.v * b.v) AS BIGINT) AS sxy,
         CAST(SUM(a.v * a.v) AS BIGINT) AS sx2,
         CAST(SUM(b.v * b.v) AS BIGINT) AS sy2
  FROM long a JOIN long b ON a.doc_id = b.doc_id AND a.f < b.f
  GROUP BY a.f, b.f
)
SELECT fa, fb, n AS n_docs,
       CASE WHEN (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
            THEN round((n * sxy - sx * sy)::DOUBLE
                       / (sqrt((n * sx2 - sx * sx)::DOUBLE)
                          * sqrt((n * sy2 - sy * sy)::DOUBLE)), 6)
       END AS r
FROM m
"""


# ---------------------------------------------------------------------------
# LexRank extractive summarization (per-document sentence PageRank).
# ---------------------------------------------------------------------------

LEX_SENT_TOKS = 12      # sentence boundary: fixed token chunks (the
                        # synthetic corpus has no punctuation; real text
                        # swaps in a sentence splitter — the graph math
                        # below is boundary-agnostic)
LEX_TAU_PPM = 330_000   # cosine edge threshold (LexRank's 0.1-0.3 band)
LEX_ITERS = 2           # PageRank iterations (oracle-unrolled)
LEX_TOPK = 3            # summary sentences per document


def lexrank_sentences(
    spark: SparkSession,
    sf_dir: str,
    iters: int = LEX_ITERS,
    topk: int = LEX_TOPK,
) -> DataFrame:
    """(doc_id, rnk, sid, rank_micro, deg): per-document LexRank (Erkan
    & Radev 2004) — sentences are nodes, edges connect sentence pairs
    whose term-frequency cosine clears {LEX_TAU_PPM} ppm, and the
    summary is the top-{LEX_TOPK} sentences by degree-normalized
    PageRank.  The extractive-summary complement to textrank_keywords
    (words) at the sentence granularity a training-data pipeline uses
    for document condensation.  Sentences here are fixed
    {LEX_SENT_TOKS}-token chunks (see LEX_SENT_TOKS note).

    Determinism: the cosine threshold compares exact integers (1e12 *
    dot^2 >= tau_ppm^2 * |a|^2 * |b|^2 — no sqrt); ranks live in exact
    micro units with truncating division (base = div(150000, n_s),
    contribution = div(17 * r_j, 20 * deg_j) per neighbor — 0.85 as
    17/20), so both engines iterate bit-identically; top-k breaks ties
    on sid.

    Plan: tokenize + chunk in the scan projection; the tf table is one
    (doc, sid, term) groupBy; the similarity join is DOC-LOCAL (equi-key
    on (doc_id, term), sid_a < sid_b) so fan-out is bounded by sentences
    per doc, never cross-document; every PageRank round is one
    broadcast-joinable rank join + grouped sum over the sparse edge
    set."""
    docs = _docs(spark, sf_dir)
    ex = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " +")).alias(
            "pos", "term"
        ),
    ).select(
        "doc_id", F.expr(f"div(pos, {LEX_SENT_TOKS})").alias("sid"), "term"
    )
    tf = ex.groupBy("doc_id", "sid", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    norm2 = tf.groupBy("doc_id", "sid").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    ).persist()
    a = tf.select("doc_id", F.col("sid").alias("sa"), "term",
                  F.col("tf").alias("tfa"))
    b = tf.select("doc_id", F.col("sid").alias("sb"), "term",
                  F.col("tf").alias("tfb"))
    dots = (
        a.join(b, ["doc_id", "term"])
        .where(F.col("sa") < F.col("sb"))
        .groupBy("doc_id", "sa", "sb")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    sim = (
        dots.join(
            norm2.select("doc_id", F.col("sid").alias("sa"),
                         F.col("n2").alias("n2a")),
            ["doc_id", "sa"],
        )
        .join(
            norm2.select("doc_id", F.col("sid").alias("sb"),
                         F.col("n2").alias("n2b")),
            ["doc_id", "sb"],
        )
        .where(
            F.col("dot") * F.col("dot") * F.lit(1_000_000_000_000)
            >= F.lit(LEX_TAU_PPM * LEX_TAU_PPM)
            * F.col("n2a")
            * F.col("n2b")
        )
        .select("doc_id", "sa", "sb")
    )
    edges = sim.select(
        "doc_id", F.col("sa").alias("src"), F.col("sb").alias("dst")
    ).unionByName(
        sim.select("doc_id", F.col("sb").alias("src"),
                   F.col("sa").alias("dst"))
    )
    deg = edges.groupBy("doc_id", "src").agg(
        F.count(F.lit(1)).alias("deg")
    )
    ed = edges.join(
        deg, ["doc_id", "src"]
    ).localCheckpoint(eager=True)
    nodes = norm2.select("doc_id", "sid").join(
        norm2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_s")),
        "doc_id",
    ).localCheckpoint(eager=True)
    ranks = nodes.select(
        "doc_id", "sid", F.expr("div(1000000, n_s)").alias("pr")
    )
    for _ in range(iters):
        contrib = (
            ed.join(
                ranks.select(
                    "doc_id", F.col("sid").alias("src"),
                    F.col("pr").alias("pr_src"),
                ),
                ["doc_id", "src"],
            )
            .select(
                "doc_id",
                F.col("dst").alias("sid"),
                F.expr("div(17 * pr_src, 20 * deg)").alias("c"),
            )
            .groupBy("doc_id", "sid")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, ["doc_id", "sid"], "left")
            .select(
                "doc_id",
                "sid",
                (
                    F.expr("div(150000, n_s)")
                    + F.coalesce(F.col("s"), F.lit(0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("pr"), F.asc("sid")
    )
    out = (
        ranks.join(
            deg.select("doc_id", F.col("src").alias("sid"), "deg"),
            ["doc_id", "sid"],
            "left",
        )
        .select(
            "doc_id",
            F.row_number().over(w).alias("rnk"),
            "sid",
            F.col("pr").cast("bigint").alias("rank_micro"),
            F.coalesce(F.col("deg"), F.lit(0)).cast("bigint").alias("deg"),
        )
        .where(F.col("rnk") <= topk)
    )
    tf.unpersist()
    norm2.unpersist()
    return out


def sql_lexrank_sentences(
    iters: int = LEX_ITERS, topk: int = LEX_TOPK
) -> str:
    rounds = []
    prev = "r0"
    for i in range(1, iters + 1):
        rounds.append(
            f"""c{i} AS (
  SELECT e.doc_id, e.dst AS sid,
         SUM((17 * r.pr) // (20 * e.deg)) AS s
  FROM ed e JOIN {prev} r ON r.doc_id = e.doc_id AND r.sid = e.src
  GROUP BY e.doc_id, e.dst
),
r{i} AS (
  SELECT n.doc_id, n.sid,
         150000 // n.n_s + COALESCE(c.s, 0) AS pr
  FROM nodes n LEFT JOIN c{i} c
    ON c.doc_id = n.doc_id AND c.sid = n.sid
)"""
        )
        prev = f"r{i}"
    unrolled = ",\n".join(rounds)
    return f"""
WITH ex AS (
  SELECT doc_id, (g.i - 1) // {LEX_SENT_TOKS} AS sid, a[g.i] AS term
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS a
        FROM documents) t,
  LATERAL UNNEST(generate_series(1, len(a))) AS g(i)
),
tf AS (
  SELECT doc_id, sid, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2, 3
),
norm2 AS (
  SELECT doc_id, sid, SUM(tf * tf) AS n2 FROM tf GROUP BY 1, 2
),
dots AS (
  SELECT a.doc_id, a.sid AS sa, b.sid AS sb, SUM(a.tf * b.tf) AS dot
  FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND a.term = b.term
  WHERE a.sid < b.sid
  GROUP BY 1, 2, 3
),
sim AS (
  SELECT d.doc_id, d.sa, d.sb
  FROM dots d
  JOIN norm2 na ON na.doc_id = d.doc_id AND na.sid = d.sa
  JOIN norm2 nb ON nb.doc_id = d.doc_id AND nb.sid = d.sb
  WHERE d.dot * d.dot * 1000000000000
        >= {LEX_TAU_PPM * LEX_TAU_PPM} * na.n2 * nb.n2
),
edges AS (
  SELECT doc_id, sa AS src, sb AS dst FROM sim
  UNION ALL
  SELECT doc_id, sb AS src, sa AS dst FROM sim
),
deg AS (
  SELECT doc_id, src, COUNT(*) AS deg FROM edges GROUP BY 1, 2
),
ed AS (
  SELECT e.doc_id, e.src, e.dst, d.deg
  FROM edges e JOIN deg d ON d.doc_id = e.doc_id AND d.src = e.src
),
nodes AS (
  SELECT n.doc_id, n.sid, t.n_s
  FROM norm2 n
  JOIN (SELECT doc_id, COUNT(*) AS n_s FROM norm2 GROUP BY doc_id) t
    ON t.doc_id = n.doc_id
),
r0 AS (
  SELECT doc_id, sid, 1000000 // n_s AS pr FROM nodes
),
{unrolled}
SELECT doc_id, CAST(rnk AS INT) AS rnk, sid,
       CAST(pr AS BIGINT) AS rank_micro,
       CAST(COALESCE(deg, 0) AS BIGINT) AS deg
FROM (
  SELECT r.doc_id, r.sid, r.pr, d.deg,
         row_number() OVER (PARTITION BY r.doc_id
                            ORDER BY r.pr DESC, r.sid ASC) AS rnk
  FROM r{iters} r
  LEFT JOIN deg d ON d.doc_id = r.doc_id AND d.src = r.sid
)
WHERE rnk <= {topk}
"""


# ---------------------------------------------------------------------------
# Span-corruption masking plan (T5-style denoising objective).
# ---------------------------------------------------------------------------

SPAN_MOD = 7      # a span STARTS at pos iff h60(doc#pos) % SPAN_MOD == 0
SPAN_LEN = 3      # tokens per raw span (overlaps merge)


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_masked, n_sentinels, mask_ppm): the
    span-corruption masking plan of the T5 denoising objective — every
    token position draws a deterministic coin (md5 bridge) to START a
    {SPAN_LEN}-token span, overlapping spans merge, and each merged run
    is replaced by one sentinel.  The plan reports per document how many
    tokens fall under masks and how many sentinels the encoder input
    will carry — the numbers that size a denoising pretraining batch
    (expected corruption rate = 1 - (1-1/{SPAN_MOD})^{SPAN_LEN} ~ 37%).

    The masking decision is RECOMPUTABLE per position from hashes alone:
    masked(p) = any of positions p-2..p starts a span, and a merged run
    begins where masked(p) and not masked(p-1) — so the whole plan is a
    map-only expression pass (no window, no self-join) followed by one
    per-doc aggregate.  That recomputability is the point at 10^12
    tokens: no mask state is ever materialized or shuffled.

    Determinism: coins are the 60-bit md5 idiom on "doc_id#pos"; all
    counts exact; ppm one floor division."""
    docs = _docs(spark, sf_dir)
    ex = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " +")).alias(
            "pos", "term"
        ),
    ).select("doc_id", "pos")

    def starts(p) -> F.Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#"),
                        p.cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        return (p >= 0) & (h % SPAN_MOD == 0)

    def masked(p) -> F.Column:
        m = F.lit(False)
        for back in range(SPAN_LEN):
            m = m | starts(p - back)
        return m

    per = ex.select(
        "doc_id",
        masked(F.col("pos")).cast("int").alias("m"),
        (
            masked(F.col("pos"))
            & ((F.col("pos") == 0) | ~masked(F.col("pos") - 1))
        ).cast("int").alias("run_start"),
    )
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("m").cast("bigint").alias("n_masked"),
        F.sum("run_start").cast("bigint").alias("n_sentinels"),
        F.expr("div(1000000 * sum(m), count(1))").alias("mask_ppm"),
    )


def sql_span_corruption_plan() -> str:
    def starts(expr: str) -> str:
        h = (
            "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' ||"
            f" CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT)"
        )
        return f"(({expr}) >= 0 AND {h} % {SPAN_MOD} = 0)"

    def masked(expr: str) -> str:
        return "(" + " OR ".join(
            starts(f"({expr}) - {back}") for back in range(SPAN_LEN)
        ) + ")"

    return f"""
WITH ex AS (
  SELECT doc_id, g.i - 1 AS pos
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS a
        FROM documents) t,
  LATERAL UNNEST(generate_series(1, len(a))) AS g(i)
),
per AS (
  SELECT doc_id,
         CAST({masked("pos")} AS INT) AS m,
         CAST({masked("pos")}
              AND (pos = 0 OR NOT {masked("pos - 1")}) AS INT)
           AS run_start
  FROM ex
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(m) AS BIGINT) AS n_masked,
       CAST(SUM(run_start) AS BIGINT) AS n_sentinels,
       CAST((1000000 * SUM(m)) // COUNT(*) AS BIGINT) AS mask_ppm
FROM per GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback: RM1-style query expansion terms.
# ---------------------------------------------------------------------------

PRF_K_TERMS = 5


def prf_expansion(
    spark: SparkSession,
    sf_dir: str,
    terms: list[str] | None = None,
    k_docs: int = BM25_TOPK,
    k_terms: int = PRF_K_TERMS,
) -> DataFrame:
    """(term, weight, n_docs): RM1-style pseudo-relevance-feedback
    expansion terms — take the BM25 top-``k_docs`` documents (the gated
    corpus_bm25_topk ranking), weight every non-query term by
    sum over those docs of tf(t, d) / |d| * score(d), and emit the
    top-``k_terms`` candidates a retrieval stack appends to the query.

    Float discipline: the per-(doc, term) contribution is quantized ONCE
    to integer nano-units (floor(tf * score * 1e9 / dl + .5)) and summed
    exactly, the repo's standard order-independent pattern.

    Plan: everything downstream of the ranking touches only k_docs rows
    — the explode, the (doc, term) count, and the term rollup are all
    k-row-bounded; the final cut is a TakeOrdered."""
    terms = terms or BM25_TERMS
    bm = bm25_topk(spark, sf_dir, terms, k_docs)
    docs = _docs(spark, sf_dir).select(
        "doc_id", _toks().alias("ts"), F.size(_toks()).alias("dl")
    )
    tok = (
        bm.join(docs, "doc_id")
        .select("doc_id", "score", "dl", F.explode("ts").alias("term"))
        .where(~F.col("term").isin(terms))
    )
    per = tok.groupBy("doc_id", "term", "score", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    w_nano = F.floor(
        F.col("tf").cast("double") * F.col("score") * F.lit(1e9)
        / F.col("dl")
        + F.lit(0.5)
    ).cast("bigint")
    return (
        per.select("doc_id", "term", w_nano.alias("w"))
        .groupBy("term")
        .agg(
            F.sum("w").alias("weight"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(k_terms)
    )


def sql_prf_expansion(
    terms: list[str] | None = None,
    k_docs: int = BM25_TOPK,
    k_terms: int = PRF_K_TERMS,
) -> str:
    terms = terms or BM25_TERMS
    not_in = ", ".join(f"'{t}'" for t in terms)
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH bm AS ({sql_bm25_topk(terms, k_docs)}),
d AS (SELECT doc_id, {toks} AS ts, len({toks}) AS dl FROM documents),
tok AS (
  SELECT b.doc_id, b.score, d.dl, unnest(d.ts) AS term
  FROM bm b JOIN d ON b.doc_id = d.doc_id
),
per AS (
  SELECT doc_id, term, score, dl, COUNT(*) AS tf
  FROM tok WHERE term NOT IN ({not_in})
  GROUP BY 1, 2, 3, 4
),
w AS (
  SELECT term,
         CAST(SUM(CAST(floor(tf::DOUBLE * score * 1e9 / dl + 0.5)
                       AS BIGINT)) AS BIGINT) AS weight,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM per GROUP BY 1
)
SELECT term, weight, n_docs FROM w
ORDER BY weight DESC, term ASC LIMIT {k_terms}
"""
