"""Text analysis operators for training-data pipelines.

Language-ID (marker-token heuristic), quality scoring, token counting and
rolling-hash document fingerprinting over ``documents(doc_id, text, ...)``.
Everything is built-in pyspark.sql.functions — JVM-side, whole-stage-codegen
— with a DuckDB oracle per operator. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkmedkg import exactq

EN_MARKERS = ["the", "a", "of", "and", "is", "to"]
STOPWORDS = EN_MARKERS
FP_MOD = 1_000_000_007
FP_BASE = 31
TOKEN_RE = "[a-z0-9]+"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT widened: every consumer here is a map-only signal pass whose
    # plan should stay shuffle-free (rides the scan at any scale).
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks():
    return F.split(F.lower(F.col("text")), " +")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_markers, lang_pred): n-gram/marker-token heuristic.
    The corpus text is synthetic, so the heuristic is exercised on marker
    density, not real language signal — the operator shape is what scales."""
    markers = F.array(*[F.lit(m) for m in EN_MARKERS])
    n_markers = F.size(F.filter(_toks(), lambda t: F.array_contains(markers, t)))
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_markers.alias("n_markers"),
        F.when(n_markers > 0, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
    )


def sql_lang_id() -> str:
    markers = ", ".join(f"'{m}'" for m in EN_MARKERS)
    n = (
        "len(list_filter(regexp_split_to_array(lower(text), ' +'), "
        f"t -> list_contains([{markers}], t)))"
    )
    return f"""
SELECT doc_id, {n} AS n_markers,
       CASE WHEN {n} > 0 THEN 'en' ELSE 'und' END AS lang_pred
FROM documents
"""


def quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr, stop_ratio, quality_score):
    length / type-token / stopword-density quality signals."""
    toks = _toks()
    stop = F.array(*[F.lit(m) for m in STOPWORDS])
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    ttr = F.round(n_types.cast("double") / n_tokens.cast("double"), 6)
    stop_ratio = F.round(n_stop.cast("double") / n_tokens.cast("double"), 6)
    score = F.round(
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * ttr, 6
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        ttr.alias("ttr"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def sql_quality() -> str:
    stop = ", ".join(f"'{m}'" for m in STOPWORDS)
    toks = "regexp_split_to_array(lower(text), ' +')"
    return f"""
WITH t AS (
  SELECT doc_id,
         len({toks}) AS n_tokens,
         len(list_distinct({toks})) AS n_types,
         len(list_filter({toks}, x -> list_contains([{stop}], x))) AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens, n_types,
       round(n_types::DOUBLE / n_tokens::DOUBLE, 6) AS ttr,
       round(n_stop::DOUBLE / n_tokens::DOUBLE, 6) AS stop_ratio,
       round(least(n_tokens::DOUBLE / 100.0, 1.0)
             * round(n_types::DOUBLE / n_tokens::DOUBLE, 6), 6) AS quality_score
FROM t
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ws_tokens, re_tokens, n_chars_calc): whitespace split count
    vs regex token count (the BPE-ish pre-tokenizer analogue)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " +")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0))).alias(
            "re_tokens"
        ),
        F.length("text").alias("n_chars_calc"),
    )


def sql_token_counts() -> str:
    return f"""
SELECT doc_id,
       len(regexp_split_to_array(text, ' +')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS re_tokens,
       length(text) AS n_chars_calc
FROM documents
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp): rolling polynomial hash of the full text —
    fp = fold(chars, acc -> (acc * 31 + ascii(c)) % 1e9+7). A pure
    JVM-side fold via ``aggregate`` over a char-index sequence."""
    text = F.col("text")
    fp = F.aggregate(
        F.sequence(F.lit(1), F.length(text)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * FP_BASE + F.ascii(text.substr(i, F.lit(1)))) % FP_MOD,
    )
    return _docs(spark, sf_dir).select("doc_id", fp.alias("fp"))


def sql_fingerprint() -> str:
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
                      generate_series(1, length(text))::BIGINT[]),
         (acc, i) -> (acc * {FP_BASE} + ascii(substring(text, i::INT, 1)))
                     % {FP_MOD}
       ) AS fp
FROM documents
"""


def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, top_bigram_frac, dup_5gram_frac): Gopher-style repetition
    signals — the fraction of bigram occurrences taken by the single most
    frequent bigram, and the fraction of 5-gram positions that repeat an
    earlier 5-gram.  Templated/spun pages (boilerplate farms, scraper
    mirrors) light up on exactly these two numbers.

    Plan shape: the 5-gram signal is ROW-LOCAL (array sizes of the
    non-distinct vs distinct shingle arrays — no shuffle at all); the
    bigram mode needs a count-per-(doc, bigram), which is one explode +
    map-side-combinable groupBy — the same shape as dedup's shingle pass,
    linear in corpus size.  Docs with < 2 tokens have no bigrams and are
    excluded (same rows in both engines)."""
    toks = _toks()
    n = F.size(toks)

    # bind the token array, then the shingle array, as lambda variables so
    # each evaluates once per row (slice over the raw split() expression
    # re-evaluates it per shingle — O(tokens^2) per doc)
    def _dup5_of(ws):
        m = F.size(ws)
        five = F.transform(
            F.sequence(F.lit(1), F.greatest(m - F.lit(4), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
        )
        return F.element_at(
            F.transform(
                F.array(five),
                lambda fv: F.when(m < 5, F.lit(0.0)).otherwise(
                    F.lit(1.0)
                    - F.size(F.array_distinct(fv)).cast("double")
                    / F.size(fv).cast("double")
                ),
            ),
            1,
        )

    dup5 = F.element_at(F.transform(F.array(toks), _dup5_of), 1)
    d = _docs(spark, sf_dir).select(
        "doc_id", toks.alias("toks"), F.round(dup5, 6).alias("dup_5gram_frac")
    )
    bigrams = d.select(
        "doc_id",
        "dup_5gram_frac",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - F.lit(1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, 2)),
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "dup_5gram_frac", "bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("doc_id", "dup_5gram_frac").agg(
        F.round(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("top_bigram_frac")
    ).select("doc_id", "top_bigram_frac", "dup_5gram_frac")


def sql_repetition() -> str:
    toks = "regexp_split_to_array(lower(text), ' +')"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
five AS (
  SELECT doc_id,
         [array_to_string(list_slice(toks, i, i + 4), ' ')
          for i in generate_series(1, greatest(len(toks) - 4, 1))] AS fv,
         len(toks) AS n
  FROM t
),
dup5 AS (
  SELECT doc_id,
         CASE WHEN n < 5 THEN 0.0
              ELSE round(1.0 - len(list_distinct(fv))::DOUBLE
                         / len(fv)::DOUBLE, 6) END AS dup_5gram_frac
  FROM five
),
bg AS (
  SELECT doc_id, unnest([toks[i] || ' ' || toks[i + 1]
                         for i in generate_series(1, len(toks) - 1)]) AS bg
  FROM t
),
counts AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
top AS (
  SELECT doc_id,
         round(MAX(c)::DOUBLE / SUM(c)::DOUBLE, 6) AS top_bigram_frac
  FROM counts GROUP BY doc_id
)
SELECT top.doc_id, top_bigram_frac, dup_5gram_frac
FROM top JOIN dup5 ON top.doc_id = dup5.doc_id
"""


def normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, norm_len, norm_md5): canonical text-normalization pass
    (lowercase, strip non-alphanumerics to spaces, collapse runs, trim) —
    the first stage of every exact-dedup / fingerprint pipeline.  The
    normalized text itself stays distributed; only its length and digest
    come back (at 100 TB you never ship normalized bodies to a driver).
    NB: DuckDB's regexp_replace replaces the FIRST match unless given the
    'g' flag — the oracle must pass it explicitly to match Spark."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_md5"),
    )


def sql_normalize() -> str:
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
        " '  +', ' ', 'g'))"
    )
    return f"""
SELECT doc_id, length({norm}) AS norm_len, md5({norm}) AS norm_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality deciles WITHOUT a global-sort ntile.
# ---------------------------------------------------------------------------

def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_docs, min_score, max_score, avg_score): the corpus
    bucketed by exact quality-score decile cutpoints.

    ntile(10) OVER (ORDER BY score) would collapse the corpus into ONE
    window partition — the classic global-sort scale killer.  Instead the
    nine exact cutpoints are one aggregate row (percentile array),
    broadcast back, and each doc's decile is the expression
    1 + #{cutpoints strictly below its score} — two corpus passes, zero
    global sort, identical tie handling in both engines."""
    score = F.round(
        F.least(F.size(_toks()).cast("double") / F.lit(100.0), F.lit(1.0))
        * F.round(
            F.size(F.array_distinct(_toks())).cast("double")
            / F.size(_toks()).cast("double"),
            6,
        ),
        6,
    )
    # scores are 6dp-rounded -> micro-unit bigints, so the decile cuts run
    # through exactq's integer-exact interpolation (last-ulp percentile
    # differences between engines can flip boundary rows' deciles)
    scored = _docs(spark, sf_dir).select(
        "doc_id",
        score.alias("s"),
        F.round(score * 1_000_000).cast("bigint").alias("s_micro"),
    )
    cuts = exactq.quantile_cuts_scaled(
        scored, "s_micro", list(range(1, 10)), 10
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select("s", exactq.bucket_expr("s_micro", 10).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("s"), 6).alias("min_score"),
            F.round(F.max("s"), 6).alias("max_score"),
            F.round(F.avg("s"), 6).alias("avg_score"),
        )
    )


def sql_quality_deciles() -> str:
    toks = "regexp_split_to_array(lower(text), ' +')"
    score = (
        f"round(least(len({toks})::DOUBLE / 100.0, 1.0) * "
        f"round(len(list_distinct({toks}))::DOUBLE / len({toks})::DOUBLE, 6), 6)"
    )
    return f"""
WITH scored AS (
  SELECT doc_id, {score} AS s,
         CAST(round(({score}) * 1000000) AS BIGINT) AS s_micro
  FROM documents
),
{exactq.sql_cuts_cte("scored", "s_micro", list(range(1, 10)), 10)},
assigned AS (
  SELECT s,
         1 + len(list_filter(cuts_scaled, c -> 10 * s_micro > c)) AS decile
  FROM scored CROSS JOIN qc_cuts
)
SELECT decile, COUNT(*) AS n_docs,
       round(MIN(s), 6) AS min_score,
       round(MAX(s), 6) AS max_score,
       round(AVG(s), 6) AS avg_score
FROM assigned GROUP BY decile
"""


# ---------------------------------------------------------------------------
# Unigram-LM perplexity (CCNet-style quality scoring, deterministic).
# ---------------------------------------------------------------------------

PPL_SMOOTH = 0.5  # add-k smoothing mass


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, ppl): per-document perplexity under an add-k
    unigram LM fit on the corpus itself — the CCNet-recipe quality signal
    (a KenLM 5-gram in production; the unigram variant is the honest
    in-sandbox stand-in, same plumbing).  High-ppl docs are OOV-ish noise,
    very-low-ppl docs are repetitive boilerplate; both ends get filtered.

    Plan: ONE explode+count shuffle fits the LM; the vocabulary folds into
    a single broadcast map row; scoring is then a map-only pass over the
    corpus (aggregate over the token array against the broadcast map) —
    the corpus is never exploded a second time."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " +")
    tf = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lm = tf.agg(
        F.map_from_arrays(
            F.collect_list("tok"), F.collect_list("c")
        ).alias("cnt"),
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("v"),
    )
    # add-k smoothed log-prob; unseen tokens impossible here (LM fit on the
    # same corpus) but the smoothing keeps the formula well-defined anyway
    denom = F.col("total").cast("double") + F.lit(PPL_SMOOTH) * F.col("v")
    logp = lambda t: F.log(  # noqa: E731
        (
            F.coalesce(F.element_at(F.col("cnt"), t), F.lit(0)).cast("double")
            + F.lit(PPL_SMOOTH)
        )
        / denom
    )
    n = F.size(toks)
    s = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + logp(t))
    return docs.crossJoin(F.broadcast(lm)).select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(F.exp(-s / n.cast("double")), 4).alias("ppl"),
    )


def sql_lm_perplexity() -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH tok AS (
  SELECT unnest({toks}) AS tok FROM documents
),
tf AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
lm AS (SELECT map(list(tok), list(c)) AS cnt, SUM(c) AS total,
              COUNT(*) AS v FROM tf)
SELECT d.doc_id, len({toks}) AS n_tokens,
       round(exp(-list_sum([ln(
           (COALESCE(map_extract(cnt, t)[1], 0)::DOUBLE + {PPL_SMOOTH})
           / (total::DOUBLE + {PPL_SMOOTH} * v))
         for t in {toks}]) / len({toks})::DOUBLE), 4) AS ppl
FROM documents d CROSS JOIN lm
"""


# ---------------------------------------------------------------------------
# Readability (Flesch reading ease + Flesch-Kincaid grade).
# ---------------------------------------------------------------------------

SYLL_RE = "[aeiouy]+"
SENT_RE = "[.!?]+"


def readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_sents, n_syllables, fre, fk_grade): Flesch
    reading ease and Flesch-Kincaid grade level with the standard
    vowel-group syllable approximation — the classic readability signals a
    training-mix curator bins corpora by.  Counts are exact integers; the
    two formulas are a fixed left-to-right chain of IEEE double ops over
    those integers, so the result is engine-identical before the final
    round.  Map-only: rides the scan, no shuffle at any scale.  The
    synthetic corpus has no sentence punctuation, so n_sents floors at 1
    (the same guard a real pipeline needs for fragments)."""
    n_words = F.size(F.split(F.col("text"), " +")).cast("bigint")
    n_sents = F.greatest(
        F.lit(1).cast("bigint"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(SENT_RE), F.lit(0)))
        .cast("bigint"),
    )
    n_syll = F.greatest(
        F.lit(1).cast("bigint"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(SYLL_RE), F.lit(0))
        ).cast("bigint"),
    )
    wps = n_words.cast("double") / n_sents.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syllables"),
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "fre"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4).alias(
            "fk_grade"
        ),
    )


def sql_readability() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT) AS n_words,
         greatest(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(text, '{SENT_RE}')) AS BIGINT))
           AS n_sents,
         greatest(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(lower(text), '{SYLL_RE}'))
                       AS BIGINT)) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sents, n_syllables,
       round(206.835 - 1.015 * (n_words::DOUBLE / n_sents::DOUBLE)
             - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE), 4) AS fre,
       round(0.39 * (n_words::DOUBLE / n_sents::DOUBLE)
             + 11.8 * (n_syllables::DOUBLE / n_words::DOUBLE) - 15.59, 4)
         AS fk_grade
FROM t
"""


# ---------------------------------------------------------------------------
# Zipf fit: rank-frequency power-law slope of the corpus vocabulary.
# ---------------------------------------------------------------------------

def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_types, n_tokens, zipf_slope): OLS slope of ln(frequency) on
    ln(rank) over the corpus token-frequency table — the classic corpus
    health check (natural text sits near -1; boilerplate-heavy or
    templated crawls drift shallow).  One corpus pass builds the
    vocab-sized count table; ranking sorts ONLY that table via the
    two-phase range-partitioned numbering (exactq.global_row_number,
    deterministic: count desc, token asc) so even a web-scale vocabulary
    never funnels through one task; the five OLS moments reduce in one
    agg.  The ln() sums
    are double accumulations over vocab-sized input — the one float
    reduction here — rounded to 6, far above double associativity noise
    at any realistic vocabulary size."""
    counts = (
        _docs(spark, sf_dir)
        .select(F.explode(_toks()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = exactq.global_row_number(
        counts, [F.col("n").desc(), F.col("tok")], out="rk"
    ).select(
        F.log(F.col("rk").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
        F.col("n"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (
        F.col("k").cast("double") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (
        F.col("k").cast("double") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("k").alias("n_types"),
        "n_tokens",
        F.round(slope, 6).alias("zipf_slope"),
    )


def sql_zipf_fit() -> str:
    return """
WITH counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_split_to_array(lower(text), ' +')) AS tok
        FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS DOUBLE)) AS x,
         ln(CAST(n AS DOUBLE)) AS y, n
  FROM counts
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n_tokens,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM ranked
)
SELECT k AS n_types, n_tokens,
       round((CAST(k AS DOUBLE) * sxy - sx * sy)
             / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope
FROM m
"""


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity buckets per language.
# ---------------------------------------------------------------------------

CCNET_N_BUCKETS = 3


def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, bucket, n_docs, min_ppl, max_ppl): the CCNet recipe's
    per-language perplexity terciles — 'head' (lowest-ppl third), 'middle',
    'tail' — the buckets Wenzek et al. publish Common Crawl under and the
    knob LLM data mixes tune (train on head+middle, drop tail).  Bucketing
    is ntile(3) over the deterministic total order (ppl, doc_id), so ties
    are engine-stable; the summary reports each bucket's size and ppl range.

    Plan: the LM fit + scoring is ``lm_perplexity``'s single explode
    shuffle + broadcast map (no second corpus pass); the ntile is one
    per-language sort — at 100 TB you'd replace the exact per-lang sort
    with sampled tercile thresholds (trainprep.stratified_sample feeding
    percentile estimates) and a map-only bucket assign; the exact window
    here is the oracle-checkable small-scale form of the same contract."""
    ppl = lm_perplexity(spark, sf_dir)
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    wnd = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        F.ntile(CCNET_N_BUCKETS).over(wnd),
    )
    return (
        ppl.join(langs, "doc_id")
        .select("lang", "ppl", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ppl").alias("min_ppl"),
            F.max("ppl").alias("max_ppl"),
        )
    )


def sql_ccnet_buckets() -> str:
    return f"""
WITH scored AS (
  SELECT d.lang, p.ppl,
         (['head', 'middle', 'tail'])[
           ntile({CCNET_N_BUCKETS}) OVER (PARTITION BY d.lang
                                          ORDER BY p.ppl, p.doc_id)] AS bucket
  FROM ({sql_lm_perplexity()}) p JOIN documents d ON d.doc_id = p.doc_id
)
SELECT lang, bucket, COUNT(*) AS n_docs,
       MIN(ppl) AS min_ppl, MAX(ppl) AS max_ppl
FROM scored GROUP BY lang, bucket
"""


# ---------------------------------------------------------------------------
# Corpus diversity: distinct-n ratios per source (Li et al. distinct-n).
# ---------------------------------------------------------------------------

def distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, distinct_1, distinct_2): lexical-diversity
    scorecard per corpus slice — |distinct n-grams| / |n-grams| for n=1,2
    (the distinct-n metric of Li et al. 2016, the standard check that a
    synthetic or deduped slice hasn't collapsed into repetitive text; a
    mode-collapsed generator scores near 0).

    Plan: one explode per n (the bigram explode rides the same scan),
    each followed by a two-level partial-agg (exact distinct via
    (source, gram) pre-aggregation, never a global distinct) — all
    map-side combinable, join at the end is per-source rows (tiny,
    broadcast).  Ratios are single double divisions of exact BIGINTs, so
    both engines agree bit-for-bit before the final round."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " +")
    uni = docs.select("source", F.explode(toks).alias("g"))
    u = (
        uni.groupBy("source", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("d1"),
        )
    )
    # bind the token array as a lambda variable so split() evaluates once
    # per row — element_at over the raw split() re-evaluates it per bigram
    # (the O(n^2) pitfall the BPE operators hit)
    def _bis_of(ws):
        return F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bi_arr = F.element_at(F.transform(F.array(toks), _bis_of), 1)
    bi = docs.select("source", F.explode(bi_arr).alias("g"))
    b = (
        bi.groupBy("source", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(F.sum("c").alias("nb"), F.count(F.lit(1)).alias("d2"))
    )
    return u.join(b, "source").select(
        "source",
        "n_tokens",
        F.round(F.col("d1").cast("double") / F.col("n_tokens"), 6).alias(
            "distinct_1"
        ),
        F.round(F.col("d2").cast("double") / F.col("nb"), 6).alias(
            "distinct_2"
        ),
    )


def sql_distinct_ngrams() -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH uni AS (
  SELECT source, unnest({toks}) AS g FROM documents
),
u AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS d1
  FROM (SELECT source, g, COUNT(*) AS c FROM uni GROUP BY source, g)
  GROUP BY source
),
bi AS (
  SELECT source,
         unnest([t[i] || ' ' || t[i + 1]
                 for i in generate_series(1, len(t) - 1)]) AS g
  FROM (SELECT source, {toks} AS t FROM documents)
  WHERE len(t) >= 2
),
b AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS nb, COUNT(*) AS d2
  FROM (SELECT source, g, COUNT(*) AS c FROM bi GROUP BY source, g)
  GROUP BY source
)
SELECT u.source, u.n_tokens,
       round(u.d1::DOUBLE / u.n_tokens, 6) AS distinct_1,
       round(b.d2::DOUBLE / b.nb, 6) AS distinct_2
FROM u JOIN b ON u.source = b.source
"""


# ---------------------------------------------------------------------------
# Code-switching / language-mixture detection (chunk-level marker mixing).
# ---------------------------------------------------------------------------

CS_W = 16   # chunk width (tokens) for the chunk-level lang signal


def code_switch(spark: SparkSession, sf_dir: str, w: int = CS_W) -> DataFrame:
    """(doc_id, n_chunks, n_en_chunks, mix_entropy): chunk-level language
    mixing — each ``w``-token chunk is classified by the same marker
    heuristic as ``lang_id`` and the document scored by the binary entropy
    of its chunk-class mixture.  Pure single-language pages score 0;
    half-and-half code-switched pages score 1.0 — the filter signal CCNet
    and multilingual curation pipelines use to route mixed pages away from
    monolingual training mixes.  (Synthetic-corpus caveat as lang_id: the
    heuristic exercises marker density; the operator SHAPE is what scales.)

    Plan: chunking and per-chunk classification are higher-order array
    expressions on the row — the whole operator is map-only, rides the
    scan, zero exchanges at any corpus size; entropy is a row-local
    closed-form over two integers (no float-sum ordering anywhere)."""
    toks = F.split(F.lower(F.col("text")), " +")
    markers = F.array(*[F.lit(m) for m in EN_MARKERS])

    def _chunks_of(ws):
        n_chunks = (F.size(ws) + F.lit(w - 1)) / F.lit(w)
        return F.transform(
            F.sequence(F.lit(0), F.floor(n_chunks).cast("int") - 1),
            lambda i: F.slice(ws, i * w + 1, w),
        )

    chunks = F.element_at(F.transform(F.array(toks), _chunks_of), 1)
    is_en = lambda c: F.size(  # noqa: E731
        F.filter(c, lambda t: F.array_contains(markers, t))
    ) > 0
    n_chunks = F.size(chunks)
    n_en = F.size(F.filter(chunks, is_en))
    p = n_en.cast("double") / n_chunks.cast("double")
    q = 1.0 - p
    ent = -(
        F.when(p > 0, p * F.log2(p)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log2(q)).otherwise(F.lit(0.0))
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_chunks.alias("n_chunks"),
        n_en.alias("n_en_chunks"),
        F.round(ent, 6).alias("mix_entropy"),
    )


def sql_code_switch(w: int = CS_W) -> str:
    markers = ", ".join(f"'{m}'" for m in EN_MARKERS)
    toks = "regexp_split_to_array(lower(text), ' +')"
    chunks = (
        f"[list_slice({toks}, i*{w}+1, i*{w}+{w}) "
        f"for i in generate_series(0, (len({toks})+{w - 1})//{w} - 1)]"
    )
    n_en = (
        f"len(list_filter({chunks}, "
        f"c -> len(list_filter(c, t -> list_contains([{markers}], t))) > 0))"
    )
    n_chunks = f"len({chunks})"
    p = f"({n_en}::DOUBLE / {n_chunks})"
    q = f"(1.0 - {p})"
    ent = (
        f"-(CASE WHEN {p} > 0 THEN {p} * log2({p}) ELSE 0.0 END"
        f" + CASE WHEN {q} > 0 THEN {q} * log2({q}) ELSE 0.0 END)"
    )
    return f"""
SELECT doc_id, {n_chunks} AS n_chunks, {n_en} AS n_en_chunks,
       round({ent}, 6) AS mix_entropy
FROM documents
"""


# ---------------------------------------------------------------------------
# Domain-similarity matrix: pairwise Jensen-Shannon divergence per source.
# ---------------------------------------------------------------------------

JSD_SCALE = 1_000_000_000   # per-token contributions integerized to nano


def domain_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_a, src_b, jsd): pairwise Jensen-Shannon divergence between the
    unigram distributions of every source pair (src_a < src_b) — the
    domain-similarity matrix data-mixing work (DoReMi-style reweighting,
    curriculum grouping) consults to decide which corpus slices are
    near-duplicates of each other distributionally.  0 = identical
    distributions; 1 (log2) = disjoint vocabularies.

    Determinism: tokens shared by a pair contribute
    0.5 p log2(p/m) + 0.5 q log2(q/m) each, integerized to nano-units
    BEFORE the per-pair sum (exact BIGINT); tokens private to one side
    contribute 0.5 of their mass in closed form from the same integer
    sums — so no float accumulation order anywhere.

    Plan: per-source profiles are one (source, token) partial agg;
    the pair join keys on token (never a profile cross-join), and at
    10^5 sources x 10^6 vocab the shuffle is the profile table, not the
    corpus."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " +")
    prof = (
        docs.select("source", F.explode(toks).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = prof.groupBy("source").agg(F.sum("c").alias("tot"))
    pa = prof.join(tot, "source").select(
        F.col("source").alias("src_a"),
        "tok",
        (F.col("c").cast("double") / F.col("tot")).alias("p"),
    )
    pb = prof.join(tot, "source").select(
        F.col("source").alias("src_b"),
        "tok",
        (F.col("c").cast("double") / F.col("tot")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2.0
    contrib = (
        0.5 * F.col("p") * F.log2(F.col("p") / m)
        + 0.5 * F.col("q") * F.log2(F.col("q") / m)
    )
    shared = (
        pa.join(pb, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.round(contrib * JSD_SCALE).cast("bigint")).alias("cn"),
            F.sum(F.round(F.col("p") * JSD_SCALE).cast("bigint")).alias("pn"),
            F.sum(F.round(F.col("q") * JSD_SCALE).cast("bigint")).alias("qn"),
        )
    )
    # private tokens: each contributes 0.5 * mass * log2(2) = 0.5 * mass;
    # total private mass per side = 1 - (shared mass), exact from the sums
    jsd = (
        F.col("cn").cast("double")
        + 0.5 * (JSD_SCALE - F.col("pn"))
        + 0.5 * (JSD_SCALE - F.col("qn"))
    ) / JSD_SCALE
    return shared.select(
        "src_a", "src_b", F.round(jsd, 6).alias("jsd")
    )


def sql_domain_similarity() -> str:
    toks = "regexp_split_to_array(text, ' +')"
    S = JSD_SCALE
    return f"""
WITH prof AS (
  SELECT source, unnest({toks}) AS tok FROM documents
),
cnt AS (SELECT source, tok, COUNT(*) AS c FROM prof GROUP BY source, tok),
tot AS (SELECT source, SUM(c) AS tot FROM cnt GROUP BY source),
p AS (
  SELECT c.source, c.tok, c.c::DOUBLE / t.tot AS p
  FROM cnt c JOIN tot t ON c.source = t.source
),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(SUM(CAST(round((0.5 * a.p * log2(a.p / ((a.p + b.p) / 2.0))
                              + 0.5 * b.p * log2(b.p / ((a.p + b.p) / 2.0)))
                             * {S}) AS BIGINT)) AS BIGINT) AS cn,
         CAST(SUM(CAST(round(a.p * {S}) AS BIGINT)) AS BIGINT) AS pn,
         CAST(SUM(CAST(round(b.p * {S}) AS BIGINT)) AS BIGINT) AS qn
  FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b,
       round((cn::DOUBLE + 0.5 * ({S} - pn) + 0.5 * ({S} - qn)) / {S}, 6)
         AS jsd
FROM shared
"""


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth curve.
# ---------------------------------------------------------------------------

def heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(checkpoint, n_tokens_cum, n_types_cum): the Heaps'-law vocabulary
    growth curve — cumulative distinct token types vs cumulative token
    count over the corpus in doc_id order, sampled at power-of-two
    document checkpoints.  Natural text grows V ~ K*N^beta (beta 0.4-0.6);
    a flattening curve means the crawl is re-reading templates, a
    super-linear one means encoding noise — the companion diagnostic to
    zipf_fit.

    Exact without any per-prefix rescan: each type contributes at its
    FIRST document (one groupBy min over the exploded token stream) and
    each doc's size at its own id, so both cumulatives are broadcast
    theta-joins of two vocab/corpus-row tables against the ~log2(N)-row
    checkpoint list, then map-side-combinable counts.  The corpus is
    scanned once."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    n_docs = docs.count()  # driver scalar, bounds the checkpoint list
    cps = [1 << j for j in range((n_docs).bit_length()) if (1 << j) <= n_docs]
    if not cps or cps[-1] != n_docs:
        cps.append(n_docs)
    cp_df = F.broadcast(
        spark.createDataFrame([(c,) for c in cps], "checkpoint bigint")
    )
    first_seen = (
        docs.select("doc_id", F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    types_cum = (
        first_seen.join(cp_df, F.col("first_doc") < F.col("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).alias("n_types_cum"))
    )
    tokens_cum = (
        docs.select("doc_id", F.size("ws").alias("n"))
        .join(cp_df, F.col("doc_id") < F.col("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.sum("n").cast("bigint").alias("n_tokens_cum"))
    )
    # both sides are checkpoint-sized (~log2 N rows); broadcast, don't sort
    return tokens_cum.join(F.broadcast(types_cum), "checkpoint").select(
        "checkpoint", "n_tokens_cum", "n_types_cum"
    )


def sql_heaps_law() -> str:
    return """
WITH docs AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
cps AS (
  SELECT DISTINCT checkpoint FROM (
    SELECT (CAST(1 AS BIGINT) << j) AS checkpoint
    FROM n, LATERAL unnest(generate_series(0, 40)) t(j)
    WHERE (CAST(1 AS BIGINT) << j) <= n_docs
    UNION ALL
    SELECT n_docs FROM n
  )
),
first_seen AS (
  SELECT w AS tok, MIN(doc_id) AS first_doc
  FROM docs, LATERAL unnest(ws) t(w)
  GROUP BY w
),
types_cum AS (
  SELECT c.checkpoint, COUNT(*) AS n_types_cum
  FROM first_seen f JOIN cps c ON f.first_doc < c.checkpoint
  GROUP BY c.checkpoint
),
tokens_cum AS (
  SELECT c.checkpoint, CAST(SUM(len(d.ws)) AS BIGINT) AS n_tokens_cum
  FROM docs d JOIN cps c ON d.doc_id < c.checkpoint
  GROUP BY c.checkpoint
)
SELECT t.checkpoint, t.n_tokens_cum, y.n_types_cum
FROM tokens_cum t JOIN types_cum y ON t.checkpoint = y.checkpoint
"""


ENTROPY_LO = 2.0   # below: repeated-char / single-token gibberish
ENTROPY_HI = 5.5   # above: random-byte noise (English text sits ~4.0-4.5)


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, n_distinct, entropy, suspect): per-document
    character-unigram Shannon entropy in bits — the classic gibberish
    gate (CCNet/Gopher-family): near-zero entropy is one character
    repeated, abnormally high entropy is random bytes or base64 blobs;
    natural-language text clusters in a narrow band.

    Plan: map-only, no shuffle and no second corpus pass — the char
    histogram is built per ROW by folding over the doc's own sorted
    distinct characters (vocabulary per doc is alphabet-bounded, so the
    per-row cost is n_chars * |alphabet|).  The entropy fold runs in
    sorted-character order on BOTH engines (H = log2(n) - sum(c*log2(c))
    / n), so the float summation order is pinned and the rounded value
    is reproducible."""
    docs = _docs(spark, sf_dir)
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != F.lit(""))
    # bind the char array once per row (the dedup._shingles_col trick);
    # re-evaluating split() per distinct char would be O(n^2) in doc size
    def of(cs):
        n = F.size(cs)
        uniq = F.array_sort(F.array_distinct(cs))
        s = F.aggregate(
            uniq,
            F.lit(0.0),
            lambda acc, u: acc
            + F.size(F.filter(cs, lambda c: c == u)).cast("double")
            * F.log2(F.size(F.filter(cs, lambda c: c == u)).cast("double")),
        )
        ent = F.log2(n.cast("double")) - s / n.cast("double")
        return F.struct(
            n.alias("n_chars"),
            F.size(uniq).alias("n_distinct"),
            F.round(ent, 6).alias("entropy"),
        )

    st = F.element_at(F.transform(F.array(chars), of), 1)
    return docs.select("doc_id", st.alias("st")).select(
        "doc_id",
        F.col("st.n_chars").cast("bigint").alias("n_chars"),
        F.col("st.n_distinct").cast("bigint").alias("n_distinct"),
        F.col("st.entropy").alias("entropy"),
        (
            (F.col("st.entropy") < ENTROPY_LO)
            | (F.col("st.entropy") > ENTROPY_HI)
        ).alias("suspect"),
    )


def sql_char_entropy() -> str:
    return f"""
WITH ch AS (
  SELECT doc_id,
         list_filter(string_split(text, ''), c -> c <> '') AS cs
  FROM documents
),
st AS (
  SELECT doc_id, len(cs) AS n_chars,
         list_sort(list_distinct(cs)) AS uniq,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_sort(list_distinct(cs)),
               u -> len(list_filter(cs, c -> c = u))::DOUBLE
                    * log2(len(list_filter(cs, c -> c = u))::DOUBLE))),
           (acc, e) -> acc + e) AS s
  FROM ch
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(uniq) AS BIGINT) AS n_distinct,
       round(log2(n_chars::DOUBLE) - s / n_chars, 6) AS entropy,
       round(log2(n_chars::DOUBLE) - s / n_chars, 6) < {ENTROPY_LO}
       OR round(log2(n_chars::DOUBLE) - s / n_chars, 6) > {ENTROPY_HI}
         AS suspect
FROM st
"""


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch + exactness audit.
# ---------------------------------------------------------------------------

QSK_BUCKETS = 32
QSK_QS = (50, 90, 99)


def len_quantile_sketch(
    spark: SparkSession, sf_dir: str, b: int = QSK_BUCKETS
) -> DataFrame:
    """(q_pct, exact_val, sketch_est, abs_err): P50/P90/P99 of document
    length (n_chars) from a b-bucket equi-width histogram, audited against
    the exact order statistic.  The histogram is the MERGEABLE quantile
    path: per-shard bucket counts from 1000 executors combine by addition
    (one map-side-combinable groupBy over <= b keys), where the exact
    quantile needs a global sort — the audit column exists to certify the
    sketch, the sketch is what runs at 100 TB.

    Exactness discipline: bucket width, bucket index, the ceil-rank
    need = (q*N + 99) div 100, and the within-bucket interpolation are all
    BIGINT integer arithmetic, so both engines agree bit-for-bit; the
    exact column is the value at sorted rank `need` (deterministic under
    ties because ties share the value)."""
    docs = _docs(spark, sf_dir)
    stats = docs.agg(
        F.min("n_chars").cast("bigint").alias("lo"),
        F.max("n_chars").cast("bigint").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    hist = (
        docs.crossJoin(F.broadcast(stats))
        .select(
            F.expr(f"(n_chars - lo) div ((hi - lo) div {b} + 1)").alias(
                "bucket"
            ),
            "lo",
            F.expr(f"(hi - lo) div {b} + 1").alias("width"),
            "n",
        )
        .groupBy("bucket", "lo", "width", "n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # bounded: <= b histogram buckets
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            exactq.bounded_window("bucket", "bucket").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    qs = spark.createDataFrame(
        [(int(q),) for q in QSK_QS], "q_pct bigint"
    )
    need = F.expr("(q_pct * n + 99) div 100").alias("need")
    cand = (
        qs.crossJoin(F.broadcast(cum))
        .select("q_pct", "bucket", "lo", "width", "cnt", "cum", "n", need)
        .where(F.col("cum") >= F.col("need"))
    )
    w = Window.partitionBy("q_pct").orderBy("bucket")
    est = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "q_pct",
            F.expr(
                "lo + bucket * width"
                " + ((need - (cum - cnt)) * width) div (cnt + 1)"
            )
            .cast("bigint")
            .alias("sketch_est"),
            "need",
        )
    )
    # exact rank lookup WITHOUT a corpus-wide single-task sort: the
    # value at sorted rank `need` is the unique n_chars whose cumulative
    # count block contains `need` (cum - cnt < need <= cum) over the
    # value histogram, cumulated by the two-phase partial cumsum
    vhist = (
        docs.groupBy(F.col("n_chars").cast("bigint").alias("v"))
        .agg(F.count(F.lit(1)).alias("vcnt"))
    )
    vcum = exactq.cumsum_by_value(vhist, "v", "vcnt")
    exact = est.join(
        F.broadcast(vcum),
        (F.col("cum") >= F.col("need"))
        & (F.col("cum") - F.col("vcnt") < F.col("need")),
    ).select(
        "q_pct",
        F.col("v").cast("bigint").alias("exact_val"),
        "sketch_est",
    )
    return exact.select(
        "q_pct",
        "exact_val",
        "sketch_est",
        F.abs(F.col("sketch_est") - F.col("exact_val"))
        .cast("bigint")
        .alias("abs_err"),
    )


def sql_len_quantile_sketch(b: int = QSK_BUCKETS) -> str:
    qvals = ", ".join(f"({q})" for q in QSK_QS)
    return f"""
WITH stats AS (
  SELECT CAST(MIN(n_chars) AS BIGINT) AS lo,
         CAST(MAX(n_chars) AS BIGINT) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents
),
hist AS (
  SELECT (d.n_chars - s.lo) // ((s.hi - s.lo) // {b} + 1) AS bucket,
         s.lo, (s.hi - s.lo) // {b} + 1 AS width, s.n,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents d, stats s
  GROUP BY 1, 2, 3, 4
),
cum AS (
  SELECT *, SUM(cnt) OVER (ORDER BY bucket
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
qs AS (SELECT * FROM (VALUES {qvals}) t(q_pct)),
cand AS (
  SELECT q.q_pct, c.bucket, c.lo, c.width, c.cnt, c.cum, c.n,
         (q.q_pct * c.n + 99) // 100 AS need,
         row_number() OVER (PARTITION BY q.q_pct ORDER BY c.bucket) AS rn
  FROM qs q JOIN cum c ON c.cum >= (q.q_pct * c.n + 99) // 100
),
est AS (
  SELECT q_pct,
         CAST(lo + bucket * width
              + ((need - (cum - cnt)) * width) // (cnt + 1) AS BIGINT)
           AS sketch_est,
         need
  FROM cand WHERE rn = 1
),
ranked AS (
  SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn
  FROM documents
)
SELECT CAST(e.q_pct AS BIGINT) AS q_pct,
       CAST(r.n_chars AS BIGINT) AS exact_val,
       e.sketch_est,
       CAST(abs(e.sketch_est - r.n_chars) AS BIGINT) AS abs_err
FROM est e JOIN ranked r ON r.rn = e.need
"""


# ---------------------------------------------------------------------------
# Per-document novelty vs the rest of the corpus.
# ---------------------------------------------------------------------------


def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_shared, novelty_ppm): per document, its
    distinct k-word shingles, how many of them also occur in ANY other
    document, and the novel fraction in ppm — the inverse-boilerplate
    signal: low novelty marks template/syndicated text that per-pair
    near-dup detectors only catch when a specific partner exceeds tau,
    and a data-mixing pass up-weights high-novelty docs.

    Plan: per-doc distinct shingles once (row-local HOF, the shared
    _shingles_k idiom); shingle document frequency is one
    map-side-combinable groupBy; the join back keys on the shingle and
    immediately re-aggregates to doc_id — two shuffles total, both on
    keys that partial-agg collapses.  At 10^12 docs the shingle string
    key swaps for its 60-bit md5 prefix (same seam as the memorization
    audit).  All-BIGINT; ppm by integer division."""
    from sparkmedkg.corpusops import DECON_K, _shingles_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dsh = docs.select(
        "doc_id", F.explode(_shingles_k("text", DECON_K)).alias("shingle")
    )
    df_s = dsh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    per_doc = (
        dsh.join(df_s, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("bigint"))
            .cast("bigint")
            .alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        F.expr("(n_shingles - n_shared) * 1000000 div n_shingles")
        .cast("bigint")
        .alias("novelty_ppm"),
    )


def sql_doc_novelty() -> str:
    from sparkmedkg.corpusops import DECON_K, _sql_shingles_k

    return f"""
WITH dsh AS (
  SELECT doc_id, unnest({_sql_shingles_k('text', DECON_K)}) AS shingle
  FROM documents
),
df_s AS (
  SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM dsh GROUP BY shingle
),
per_doc AS (
  SELECT d.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared
  FROM dsh d JOIN df_s f ON f.shingle = d.shingle
  GROUP BY d.doc_id
)
SELECT doc_id, n_shingles, n_shared,
       CAST((n_shingles - n_shared) * 1000000 // n_shingles AS BIGINT)
         AS novelty_ppm
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Term burstiness (Fano factor of per-document counts).
# ---------------------------------------------------------------------------

BURST_TOP_TERMS = 20


def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, total_count, vmr_ppm): variance-to-mean ratio (Fano
    factor) of each top term's per-document count, zeros included — the
    Church-Gale burstiness signal.  A term that is Poisson-scattered has
    VMR ~ 1; content words CLUMP (high VMR) while function words and
    boilerplate spread evenly (VMR near 1 even at huge counts), so this
    separates topical vocabulary from glue better than raw frequency —
    the up-weighting signal keyword extraction and stopword induction
    both need.

    Kept EXACT: with N docs, S = sum of counts and Q = sum of squared
    counts (absent docs contribute 0 to both, so the per-doc explode
    never materializes zeros), population VMR = (N*Q - S^2) / (N*S) — a
    rational of BIGINTs emitted in ppm by integer division.  Plan: one
    explode + (term, doc) count, one term rollup, top terms by total
    count (ties broken by term) via TakeOrdered — two map-side-combinable
    shuffles over the token stream, N is a 1-row broadcast."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    td = (
        docs.select(
            "doc_id", F.explode(_toks()).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    return (
        stats.orderBy(F.desc("s"), F.asc("term"))
        .limit(BURST_TOP_TERMS)
        .select(
            "term",
            "df",
            F.col("s").alias("total_count"),
            F.expr(f"({n_docs} * q - s * s) * 1000000 div ({n_docs} * s)")
            .cast("bigint")
            .alias("vmr_ppm"),
        )
    )


def sql_term_burstiness() -> str:
    toks = "regexp_split_to_array(lower(text), ' +')"
    return f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
td AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest({toks}) AS term FROM documents)
  GROUP BY term, doc_id
),
stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM td GROUP BY term
)
SELECT term, df, s AS total_count,
       CAST((n_docs * q - s * s) * 1000000 // (n_docs * s) AS BIGINT)
         AS vmr_ppm
FROM stats CROSS JOIN n
ORDER BY s DESC, term LIMIT {BURST_TOP_TERMS}
"""


# ---------------------------------------------------------------------------
# Encoding-damage (mojibake) audit.
# ---------------------------------------------------------------------------

def mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_docs, n_replacement_docs, n_control_docs, n_nonascii_docs,
    replacement_ppm, control_ppm, nonascii_ppm): corpus-level encoding-
    damage scorecard — documents containing U+FFFD replacement chars
    (decode already failed upstream), C0/C1 control chars other than
    tab/newline/CR (binary bleed-through), and any non-ASCII at all (the
    denominator for judging the other two).  Mojibake is the web-crawl
    failure mode quality classifiers are notoriously blind to, so this
    gate runs BEFORE model-based scoring.

    All three detectors are single regexp_like expressions riding the
    scan (whole-stage codegen, no UDF); the rollup is one 1-row
    aggregate.  The synthetic corpus is clean ASCII by construction —
    zeros here are the assertion, and the unit test injects damaged rows
    through the same expressions to prove the detectors fire."""
    docs = _docs(spark, sf_dir)
    repl = F.col("text").contains("�")
    ctrl = F.col("text").rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]")
    nonascii = F.col("text").rlike("[^\\x00-\\x7f]")
    agg = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(repl.cast("int")).cast("bigint").alias("n_replacement_docs"),
        F.sum(ctrl.cast("int")).cast("bigint").alias("n_control_docs"),
        F.sum(nonascii.cast("int")).cast("bigint").alias("n_nonascii_docs"),
    )
    return agg.select(
        "n_docs",
        "n_replacement_docs",
        "n_control_docs",
        "n_nonascii_docs",
        F.expr("n_replacement_docs * 1000000 div n_docs")
        .cast("bigint")
        .alias("replacement_ppm"),
        F.expr("n_control_docs * 1000000 div n_docs")
        .cast("bigint")
        .alias("control_ppm"),
        F.expr("n_nonascii_docs * 1000000 div n_docs")
        .cast("bigint")
        .alias("nonascii_ppm"),
    )


def sql_mojibake_audit() -> str:
    return r"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(CASE WHEN contains(text, chr(65533))
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_replacement_docs,
         CAST(COALESCE(SUM(CASE WHEN regexp_matches(text,
                    '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_control_docs,
         CAST(COALESCE(SUM(CASE WHEN regexp_matches(text, '[^\x00-\x7f]')
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_nonascii_docs
  FROM documents
)
SELECT n_docs, n_replacement_docs, n_control_docs, n_nonascii_docs,
       CAST(n_replacement_docs * 1000000 // n_docs AS BIGINT)
         AS replacement_ppm,
       CAST(n_control_docs * 1000000 // n_docs AS BIGINT) AS control_ppm,
       CAST(n_nonascii_docs * 1000000 // n_docs AS BIGINT) AS nonascii_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# Yule's K vocabulary-richness characteristic.
# ---------------------------------------------------------------------------

def yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_tokens, n_types, hapax_types, dis_types, yule_k):
    corpus-level Yule's K = 1e4 * (sum_m m^2*V_m - N) / N^2 over the
    term-frequency spectrum V_m (# types occurring exactly m times), plus
    the hapax/dis legomena counts — the classic vocabulary-richness
    characteristic (length-invariant, unlike raw TTR), the aggregate
    twin of the per-doc signals in ``quality``.

    Determinism: N, sum m^2*V_m and the spectrum counts are exact BIGINTs
    (two map-side-combinable aggregations); K divides exact integers
    < 2^53 as doubles and rounds to 6dp — bit-identical across engines.

    Plan: explode -> per-term count is ONE partial-aggregated shuffle on
    the term key; the spectrum (group by m) and the final fold operate on
    the type table, never the token stream.  No windows, no joins."""
    tf = (
        _docs(spark, sf_dir)
        .select(F.explode(_toks()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    spec = tf.groupBy("m").agg(F.count(F.lit(1)).alias("vm"))
    agg = spec.agg(
        F.sum(F.col("m") * F.col("vm")).alias("n_tokens"),
        F.sum("vm").alias("n_types"),
        F.sum(F.col("m") * F.col("m") * F.col("vm")).alias("s2"),
        F.sum(F.when(F.col("m") == 1, F.col("vm")).otherwise(F.lit(0)))
        .alias("hapax_types"),
        F.sum(F.when(F.col("m") == 2, F.col("vm")).otherwise(F.lit(0)))
        .alias("dis_types"),
    )
    return agg.select(
        "n_tokens",
        "n_types",
        "hapax_types",
        "dis_types",
        F.round(
            F.lit(10_000.0)
            * (F.col("s2") - F.col("n_tokens")).cast("double")
            / (F.col("n_tokens") * F.col("n_tokens")).cast("double"),
            6,
        ).alias("yule_k"),
    )


def sql_yule_k() -> str:
    return """
WITH tf AS (
  SELECT term, COUNT(*) AS m
  FROM (SELECT unnest(regexp_split_to_array(lower(text), ' +')) AS term
        FROM documents)
  GROUP BY term
),
spec AS (SELECT m, COUNT(*) AS vm FROM tf GROUP BY m),
agg AS (
  SELECT CAST(SUM(m * vm) AS BIGINT) AS n_tokens,
         CAST(SUM(vm) AS BIGINT) AS n_types,
         CAST(SUM(m * m * vm) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN m = 1 THEN vm ELSE 0 END) AS BIGINT)
           AS hapax_types,
         CAST(SUM(CASE WHEN m = 2 THEN vm ELSE 0 END) AS BIGINT)
           AS dis_types
  FROM spec
)
SELECT n_tokens, n_types, hapax_types, dis_types,
       round(10000.0 * CAST(s2 - n_tokens AS DOUBLE)
             / CAST(n_tokens * n_tokens AS DOUBLE), 6) AS yule_k
FROM agg
"""


# ---------------------------------------------------------------------------
# Good-Turing frequency-of-frequencies smoothing.
# ---------------------------------------------------------------------------

GT_MAX_R = 10


def good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, n_r, n_r1, r_star_micro, unseen_ppm): the Good-Turing
    frequency-of-frequencies table over corpus BIGRAMS, r =
    1..{GT_MAX_R} — N_r = number of bigram types seen exactly r times,
    the Turing-smoothed count r* = (r+1) * N_{{r+1}} / N_r (micro-units,
    null when N_{{r+1}} = 0), and the unseen probability mass p_0 =
    N_1 / n_bigrams in ppm (constant across rows; it is the corpus-level
    headline the smoothing exists for).  This is GT in its classic LM
    role — Katz-backoff bigram smoothing (Gale & Sampson's simple
    Good-Turing, the unsmoothed head rows); bigrams, not unigrams,
    because the n-gram tail is where unseen mass lives (the synthetic
    unigram vocabulary is closed — every type occurs 29+ times).

    Determinism: all counts are exact integers; r* and p_0 are integer
    floor divisions to micro/ppm.

    Plan: bigrams form in the scan projection (a transform over the
    token array, zero shuffle), then ONE bigram-count shuffle
    (bigram-vocab-sized output), a frequency-of-frequencies groupBy over
    THAT table, a self-join on r+1 over the <= {GT_MAX_R}-row result,
    and 1-row broadcasts of the totals.  Map-side combinable
    throughout."""
    bg = F.expr(
        "transform(sequence(1, size(a) - 1), "
        "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
    )
    counts = (
        _docs(spark, sf_dir)
        .select(_toks().alias("a"))
        .where(F.size(F.col("a")) >= 2)
        .select(F.explode(bg).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    fof = (
        counts.groupBy(F.col("f").alias("r"))
        .agg(F.count(F.lit(1)).alias("n_r"))
    )
    tot = counts.agg(
        F.sum("f").alias("n_bigrams"),
        F.coalesce(
            F.sum(F.when(F.col("f") == 1, 1)), F.lit(0)
        ).cast("bigint").alias("n_1"),
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    return (
        fof.where(F.col("r") <= GT_MAX_R)
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_r1"), F.lit(0)).cast("bigint").alias("n_r1"),
            F.when(
                F.coalesce(F.col("n_r1"), F.lit(0)) > 0,
                F.expr("div(1000000 * (r + 1) * n_r1, n_r)"),
            ).alias("r_star_micro"),
            F.expr("div(1000000 * n_1, n_bigrams)").alias("unseen_ppm"),
        )
    )


def sql_good_turing() -> str:
    return f"""
WITH toks AS (
  SELECT regexp_split_to_array(lower(text), ' +') AS a FROM documents
),
counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT a[i] || ' ' || a[i + 1] AS bigram
        FROM toks, LATERAL UNNEST(generate_series(1, len(a) - 1)) AS g(i)
        WHERE len(a) >= 2)
  GROUP BY bigram
),
fof AS (
  SELECT f AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM counts GROUP BY f
),
tot AS (
  SELECT CAST(SUM(f) AS BIGINT) AS n_bigrams,
         CAST(COALESCE(SUM(CASE WHEN f = 1 THEN 1 END), 0) AS BIGINT)
           AS n_1
  FROM counts
)
SELECT a.r, a.n_r,
       CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r1,
       CASE WHEN COALESCE(b.n_r, 0) > 0
            THEN CAST((1000000 * (a.r + 1) * b.n_r) // a.n_r AS BIGINT)
            END AS r_star_micro,
       CAST((1000000 * tot.n_1) // tot.n_bigrams AS BIGINT) AS unseen_ppm
FROM fof a
LEFT JOIN fof b ON b.r = a.r + 1
CROSS JOIN tot
WHERE a.r <= {GT_MAX_R}
"""


# ---------------------------------------------------------------------------
# Vocabulary richness / coverage scorecard (Chao1 + Good + Simpson).
# ---------------------------------------------------------------------------

def corpus_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_types, n_tokens, n1, n2, chao1_types, coverage_ppm,
    simpson_ppm): the species-richness scorecard over corpus BIGRAM
    types — Chao1's lower-bound estimate of the TRUE type count
    (observed + n1*(n1-1)/(2*(n2+1)), bias-corrected form, from the
    hapax/dis counts), Good's sample coverage 1 - n1/N (what fraction
    of the underlying bigram mass this crawl has already seen — the
    "is more crawling worth it" number, the same question
    shingle-novelty answers longitudinally), and Simpson concentration
    sum f(f-1)/(N(N-1)) (repeat-collision probability, the diversity
    twin of Yule's K).  Bigrams for the same reason as good_turing:
    the synthetic unigram vocabulary is closed.

    Determinism: every statistic is exact-integer (counts, one floor
    division each) — no logs, no floats.

    Plan: bigrams form in the scan projection; ONE bigram-count
    shuffle; the spectrum fold is a single aggregate over the
    type table.  Map-side combinable throughout."""
    bg = F.expr(
        "transform(sequence(1, size(a) - 1), "
        "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
    )
    counts = (
        _docs(spark, sf_dir)
        .select(_toks().alias("a"))
        .where(F.size(F.col("a")) >= 2)
        .select(F.explode(bg).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    agg = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("f") == 1, 1)), F.lit(0))
        .cast("bigint").alias("n1"),
        F.coalesce(F.sum(F.when(F.col("f") == 2, 1)), F.lit(0))
        .cast("bigint").alias("n2"),
        F.sum(F.col("f") * (F.col("f") - 1)).cast("bigint").alias("s2"),
    )
    return agg.select(
        "n_types",
        "n_tokens",
        "n1",
        "n2",
        (
            F.col("n_types")
            + F.expr("div(n1 * (n1 - 1), 2 * (n2 + 1))")
        ).cast("bigint").alias("chao1_types"),
        (
            F.lit(1_000_000) - F.expr("div(1000000 * n1, n_tokens)")
        ).cast("bigint").alias("coverage_ppm"),
        F.expr("div(1000000 * s2, n_tokens * (n_tokens - 1))")
        .alias("simpson_ppm"),
    )


def sql_corpus_richness() -> str:
    return """
WITH toks AS (
  SELECT regexp_split_to_array(lower(text), ' +') AS a FROM documents
),
counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT a[i] || ' ' || a[i + 1] AS bigram
        FROM toks, LATERAL UNNEST(generate_series(1, len(a) - 1)) AS g(i)
        WHERE len(a) >= 2)
  GROUP BY bigram
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(f) AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(CASE WHEN f = 1 THEN 1 END), 0) AS BIGINT)
           AS n1,
         CAST(COALESCE(SUM(CASE WHEN f = 2 THEN 1 END), 0) AS BIGINT)
           AS n2,
         CAST(SUM(f * (f - 1)) AS BIGINT) AS s2
  FROM counts
)
SELECT n_types, n_tokens, n1, n2,
       CAST(n_types + (n1 * (n1 - 1)) // (2 * (n2 + 1)) AS BIGINT)
         AS chao1_types,
       CAST(1000000 - (1000000 * n1) // n_tokens AS BIGINT)
         AS coverage_ppm,
       CAST((1000000 * s2) // (n_tokens * (n_tokens - 1)) AS BIGINT)
         AS simpson_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# Hashed-ngram linear quality classifier (fastText-style scoring pass).
# ---------------------------------------------------------------------------

FT_BUCKETS = 2001  # odd so the integer weight range is symmetric


def fasttext_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_toks, w_sum, score6, keep): fastText-style linear
    document classifier over hashed bag-of-words — the CCNet/LLaMA-lineage
    quality-filter shape: each token hashes to one of FT_BUCKETS weight
    buckets, the document logit is the mean bucket weight, and the score
    is its sigmoid.  The weight table here is the deterministic
    ((h60 % FT_BUCKETS) - FT_BUCKETS div 2) stand-in (the sandbox trains
    no model); swapping in learned weights changes one broadcast map, not
    the plan.

    Float discipline: the per-doc logit numerator is an exact integer
    fold over the token array (order-fixed within the doc, integer adds),
    so both engines agree bit-for-bit; the single sigmoid+round happens
    per output row.  Plan: map-only projection riding the scan — no
    shuffle, no UDF, whole-stage codegen end to end."""
    half = FT_BUCKETS // 2
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
    )
    w = lambda t: (
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
        % FT_BUCKETS
        - half
    )
    d = _docs(spark, sf_dir).select(
        "doc_id", toks.alias("ts")
    ).where(F.size("ts") > 0)
    wsum = F.aggregate(
        F.col("ts"), F.lit(0).cast("bigint"), lambda acc, t: acc + w(t)
    )
    return d.select(
        "doc_id",
        F.size("ts").cast("bigint").alias("n_toks"),
        wsum.alias("w_sum"),
    ).select(
        "doc_id",
        "n_toks",
        "w_sum",
        F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(F.col("w_sum").cast("double"))
                    / (F.col("n_toks").cast("double") * F.lit(float(half)))
                )
            ),
            6,
        ).alias("score6"),
        (F.col("w_sum") > 0).alias("keep"),
    )


def sql_fasttext_score() -> str:
    half = FT_BUCKETS // 2
    h = "CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)"
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents
),
s AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
         CAST(list_aggregate(
                list_transform(ts, t -> {h} % {FT_BUCKETS} - {half}),
                'sum') AS BIGINT) AS w_sum
  FROM d WHERE len(ts) > 0
)
SELECT doc_id, n_toks, w_sum,
       round(1.0 / (1.0 + exp(-(w_sum::DOUBLE)
                              / (n_toks::DOUBLE * {float(half)}))), 6)
         AS score6,
       w_sum > 0 AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# Sentence segmentation profile (packing / curriculum layout signal).
# ---------------------------------------------------------------------------

def sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_sents, n_toks, mean_sent_toks_milli, max_sent_toks,
    n_short_sents): regex sentence segmentation with per-document length
    profile — the layout signal sequence-packing and curriculum samplers
    read (short choppy sentences = listy/boilerplate text; one giant
    run-on = extraction failure).  Sentences split on [.!?]+ runs,
    trimmed, empties dropped; token counts per sentence; the mean is
    exact integer milli-tokens (sum * 1000 div n).

    Plan: map-only array expressions riding the scan — no shuffle, no
    UDF, the same single-pass shape as the other textstats signals."""
    sents = F.filter(
        F.transform(F.split(F.col("text"), "[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    ntoks = F.transform(
        F.col("sents"),
        lambda s: F.size(F.filter(F.split(s, " +"), lambda t: t != "")),
    )
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", sents.alias("sents"))
        .where(F.size("sents") > 0)
        .select("doc_id", F.size("sents").cast("bigint").alias("n_sents"),
                ntoks.alias("nt"))
    )
    tot = F.aggregate(
        F.col("nt"), F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    return d.select(
        "doc_id",
        "n_sents",
        tot.alias("n_toks"),
        F.expr(
            "aggregate(nt, CAST(0 AS BIGINT), (a, x) -> a + x) * 1000"
            " div n_sents"
        ).cast("bigint").alias("mean_sent_toks_milli"),
        F.array_max("nt").cast("bigint").alias("max_sent_toks"),
        F.size(F.filter(F.col("nt"), lambda x: x <= F.lit(3)))
        .cast("bigint")
        .alias("n_short_sents"),
    )


def sql_sentence_stats() -> str:
    sents = (
        "list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),"
        " s -> trim(s)), s -> s <> '')"
    )
    nt = (
        "list_transform(sents, s -> len(list_filter("
        "regexp_split_to_array(s, ' +'), t -> t <> '')))"
    )
    return f"""
WITH d AS (
  SELECT doc_id, {sents} AS sents FROM documents
),
e AS (
  SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sents, {nt} AS nt
  FROM d WHERE len(sents) > 0
)
SELECT doc_id, n_sents,
       CAST(list_aggregate(nt, 'sum') AS BIGINT) AS n_toks,
       CAST(CAST(list_aggregate(nt, 'sum') AS BIGINT) * 1000 // n_sents
            AS BIGINT) AS mean_sent_toks_milli,
       CAST(list_max(nt) AS BIGINT) AS max_sent_toks,
       CAST(len(list_filter(nt, x -> x <= 3)) AS BIGINT) AS n_short_sents
FROM e
"""
