"""Training-corpus preparation: composed filtering, stratified sampling,
and graph-shape analytics — the end-to-end "documents -> training-ready
corpus" stages a 100 TB LLM-data pipeline runs after the per-signal
operators (textstats, dedup) have been verified individually.

- **training_ready** — the C4-style composed filter: language gate +
  quality-score floor + exact-dedup canonical-keep + near-dup drop (right
  member of every verified Jaccard pair).  All four signals reuse the
  already-oracle-gated operators, composed as one declarative plan so
  Catalyst pushes the cheap gates below the expensive dedup anti-join.
- **stratified_sample** — deterministic per-language hash sampling (data
  mixing): keep a doc iff md5(doc_id) mod 10_000 < rate_bp(lang).  md5 is
  computed identically by Spark and DuckDB, so the sample is reproducible
  across engines and runs — no rand(), no seed drift between retries of a
  failed partition (the property that matters on a 1000-executor job).
- **kg_triangles** — per-entity triangle participation over the
  co-occurrence graph, enumerated on DEGREE-ORIENTED edges (each
  undirected edge points from the lower-(degree, id) endpoint to the
  higher): the wedge fan-out is bounded by arboricity instead of max
  degree, which is what keeps a hot hub node (a ubiquitous CUI) from
  creating a quadratic wedge explosion at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkmedkg import dedup, exactq, textstats

QUALITY_MIN = 0.2
SAMPLE_MOD = 10_000
# per-language keep rates in basis points of SAMPLE_MOD (data mixing:
# upweight en, downsample the rest).
SAMPLE_RATES_BP = {"en": 9_000, "de": 5_000, "es": 5_000, "fr": 5_000, "zh": 2_500}
SAMPLE_DEFAULT_BP = 1_000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Composed training-ready filter.
# ---------------------------------------------------------------------------

def training_ready(
    spark: SparkSession, sf_dir: str, quality_min: float = QUALITY_MIN
) -> DataFrame:
    """(doc_id, n_tokens, quality_score) of docs that survive ALL of:
    lang == 'en', quality_score >= quality_min, not a non-canonical exact
    copy, and not the dropped (higher-id) member of any near-dup pair."""
    q = textstats.quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    base = (
        _docs(spark, sf_dir)
        .where(F.col("lang") == "en")
        .select("doc_id")
        .join(q, "doc_id")
        .where(F.col("quality_score") >= quality_min)
    )
    # exact dedup: keep only each text group's canonical (min) doc_id
    keep_exact = dedup.exact_dedup(spark, sf_dir).select(
        F.col("keep_id").alias("doc_id")
    )
    base = base.join(keep_exact, "doc_id", "left_semi")
    # near-dup: drop the right (higher-id) member of every verified pair.
    # jaccard_pairs is the prefix-filtered exact path — never all-pairs.
    drops = dedup.jaccard_pairs(spark, sf_dir).select(
        F.col("b").alias("doc_id")
    )
    return base.join(drops, "doc_id", "left_anti")


def sql_training_ready(quality_min: float = QUALITY_MIN) -> str:
    toks = "regexp_split_to_array(lower(text), ' +')"
    return f"""
WITH q AS (
  SELECT doc_id, lang,
         len({toks}) AS n_tokens,
         round(least(len({toks})::DOUBLE / 100.0, 1.0)
               * round(len(list_distinct({toks}))::DOUBLE
                       / len({toks})::DOUBLE, 6), 6) AS quality_score
  FROM documents
),
keep_exact AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
near_drops AS (SELECT DISTINCT b AS doc_id FROM ({dedup.sql_jaccard_pairs()}) p)
SELECT doc_id, n_tokens, quality_score
FROM q
WHERE lang = 'en' AND quality_score >= {quality_min}
  AND doc_id IN (SELECT doc_id FROM keep_exact)
  AND doc_id NOT IN (SELECT doc_id FROM near_drops)
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (data mixing).
# ---------------------------------------------------------------------------

def _bucket_col():
    # identical in DuckDB: CAST('0x' || substring(md5(doc_id::VARCHAR),1,15)
    # AS BIGINT) % MOD — same idiom the minhash signatures use.
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % SAMPLE_MOD
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, bucket): the deterministic per-language sample.
    One scan, no shuffle — the keep decision is a pure row-local
    expression, so the sample of a 10^12-row table is a map-only job."""
    rate = F.lit(SAMPLE_DEFAULT_BP)
    for lang, bp in SAMPLE_RATES_BP.items():
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", _bucket_col().alias("bucket"))
        .where(F.col("bucket") < rate)
    )


def sql_stratified_sample() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {bp}"
        for lang, bp in SAMPLE_RATES_BP.items()
    )
    bucket = (
        "CAST('0x' || substring(md5(doc_id::VARCHAR), 1, 15) AS BIGINT) "
        f"% {SAMPLE_MOD}"
    )
    return f"""
SELECT doc_id, lang, {bucket} AS bucket
FROM documents
WHERE {bucket} < (CASE {cases} ELSE {SAMPLE_DEFAULT_BP} END)
"""


# ---------------------------------------------------------------------------
# Degree-oriented triangle participation over the co-occurrence graph.
# ---------------------------------------------------------------------------

def tris_df(
    spark: SparkSession, sf_dir: str, min_docs: int = 2
) -> DataFrame:
    """(u, v, w) triangle instances of the co-occurrence graph, each
    enumerated exactly once.  Edges are oriented from the lower-(degree,
    id) endpoint to the higher before wedge enumeration, so per-node
    fan-out is bounded by arboricity — the classic skew-proof triangle
    plan.  Shared by kg_triangles, clustering-coefficient, and the
    k-truss peel (graphalgo.q_truss_edges)."""
    from sparkmedkg.relations import _cooccur_edges

    # Eagerly checkpoint the edge set: it feeds deg + two sides of the
    # wedge join + the closing join — without truncation each branch
    # re-runs the whole NER->link->pair pipeline (measured 29-89s at
    # sf0.001 across the triangle family; sub-10s checkpointed).  The
    # edge list is O(|E|) — small relative to the corpus it came from.
    sym = _cooccur_edges(spark, sf_dir, min_docs).localCheckpoint(eager=True)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        sym.join(deg.withColumnRenamed("src", "src_"), sym["src"] == F.col("src_"))
        .drop("src_")
        .withColumnRenamed("deg", "sdeg")
        .join(deg.withColumnRenamed("src", "dst_"), sym["dst"] == F.col("dst_"))
        .drop("dst_")
        .withColumnRenamed("deg", "ddeg")
    )
    # oriented feeds three join branches (e1, e2, closer) — checkpoint so
    # the deg-join runs once, not per branch.
    oriented = (
        ranked.where(
            (F.col("sdeg") < F.col("ddeg"))
            | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )

    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("u2"), F.col("dst").alias("w"))
    # wedges at u: (v, w) both out-neighbors; close with oriented edge v->w
    wedges = e1.join(e2, e1["u"] == e2["u2"]).where(F.col("v") < F.col("w"))
    closer = oriented.select(
        F.col("src").alias("cv"), F.col("dst").alias("cw")
    )
    tri = wedges.join(
        closer,
        ((F.col("v") == F.col("cv")) & (F.col("w") == F.col("cw")))
    ).select("u", "v", "w")
    # a (v, w) wedge pair can close with the oriented edge in either
    # direction; check both (w -> v covers ties broken by degree).
    tri2 = wedges.join(
        closer,
        ((F.col("w") == F.col("cv")) & (F.col("v") == F.col("cw")))
    ).select("u", "v", "w")
    return tri.unionByName(tri2)


def kg_triangles(
    spark: SparkSession, sf_dir: str, min_docs: int = 2
) -> DataFrame:
    """(CUI, n_triangles): how many co-occurrence triangles each entity
    participates in (enumeration: tris_df)."""
    tris = tris_df(spark, sf_dir, min_docs)
    per_node = (
        tris.select(F.col("u").alias("CUI"))
        .unionByName(tris.select(F.col("v").alias("CUI")))
        .unionByName(tris.select(F.col("w").alias("CUI")))
    )
    return per_node.groupBy("CUI").agg(F.count(F.lit(1)).alias("n_triangles"))


def sql_tri_cte(min_docs: int = 2) -> str:
    """WITH-body prefix (aliases .. tris, plus sym/deg) for the oriented
    triangle enumeration — shared by the triangle-count oracle here and
    graphalgo's clustering-coefficient oracle."""
    from sparkmedkg.webkg import _links_cte, sql_aliases_cte

    return f"""{sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
und AS (
  SELECT a.cui AS x, b.cui AS y
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY a.cui, b.cui
  HAVING COUNT(*) >= {min_docs}
),
sym AS (SELECT x AS src, y AS dst FROM und UNION ALL SELECT y, x FROM und),
deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
oriented AS (
  SELECT s.src, s.dst
  FROM sym s JOIN deg d1 ON s.src = d1.src JOIN deg d2 ON s.dst = d2.src
  WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND s.src < s.dst)
),
wedges AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
  WHERE e1.dst < e2.dst
),
tris AS (
  SELECT wg.u, wg.v, wg.w FROM wedges wg
  JOIN oriented c ON wg.v = c.src AND wg.w = c.dst
  UNION ALL
  SELECT wg.u, wg.v, wg.w FROM wedges wg
  JOIN oriented c ON wg.w = c.src AND wg.v = c.dst
)"""


def sql_kg_triangles(min_docs: int = 2) -> str:
    return f"""
WITH {sql_tri_cte(min_docs)}
SELECT cui AS CUI, COUNT(*) AS n_triangles
FROM (SELECT u AS cui FROM tris UNION ALL SELECT v FROM tris
      UNION ALL SELECT w FROM tris)
GROUP BY cui
"""


# ---------------------------------------------------------------------------
# Per-source (crawl-domain) corpus statistics.
# ---------------------------------------------------------------------------

def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_en, total_tokens, avg_quality): the per-domain
    rollup crawl curation runs before per-document filtering — domains
    whose aggregate quality collapses get dropped wholesale (cheaper than
    scoring their documents one by one).  One broadcast-free shuffle on
    ``source``; quality sums accumulate in DECIMAL so the average is
    independent of partial-aggregation order."""
    q = textstats.quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    d = _docs(spark, sf_dir).select("doc_id", "source", "lang").join(q, "doc_id")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            (
                F.sum(F.col("quality_score").cast("decimal(18,6)"))
                / F.count(F.lit(1))
            ).cast("double"),
            6,
        ).alias("avg_quality"),
    )


def sql_domain_stats() -> str:
    toks = "regexp_split_to_array(lower(text), ' +')"
    return f"""
WITH q AS (
  SELECT doc_id, source, lang,
         len({toks}) AS n_tokens,
         round(least(len({toks})::DOUBLE / 100.0, 1.0)
               * round(len(list_distinct({toks}))::DOUBLE
                       / len({toks})::DOUBLE, 6), 6) AS quality_score
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) / COUNT(*)
                  AS DOUBLE), 6) AS avg_quality
FROM q GROUP BY source
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES).
# ---------------------------------------------------------------------------

WS_K = 100
WS_HEX = 15  # first 60 bits of md5 -> deterministic uniform u, portable


def weighted_sample(
    spark: SparkSession, sf_dir: str, k: int = WS_K
) -> DataFrame:
    """(doc_id, n_chars, skey): k documents sampled without replacement
    with probability proportional to length — the Efraimidis-Spirakis
    one-pass reservoir: per-row key ln(u)/w with u deterministic from
    md5(doc_id), take the k largest keys.  Longer docs get larger
    (less-negative) keys more often; a fixed u per doc makes the draw
    reproducible across engines and reruns.

    Plan: map-only key projection + TakeOrderedAndProject — each partition
    keeps its local top-k and only k-row heads reach the driver merge; no
    shuffle of the corpus, identical shape at 10^12 rows."""
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, WS_HEX), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << (WS_HEX * 4)))
    skey = F.log(u) / F.col("n_chars").cast("double")
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars", F.round(skey, 10).alias("skey"))
        .orderBy(F.col("skey").desc(), F.col("doc_id"))
        .limit(k)
    )


def sql_weighted_sample(k: int = WS_K) -> str:
    h = f"CAST('0x' || substring(md5(doc_id::VARCHAR), 1, {WS_HEX}) AS BIGINT)"
    u = f"(({h})::DOUBLE + 0.5) / {float(1 << (WS_HEX * 4))}"
    return f"""
SELECT doc_id, n_chars, round(ln({u}) / n_chars::DOUBLE, 10) AS skey
FROM documents
ORDER BY skey DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (XLM-R-style alpha sampling).
# ---------------------------------------------------------------------------

TEMP_ALPHA = 0.5


def _tier_col():
    """Deterministic skewed source tier: the driver's synthetic sources are
    equal-sized, so a 5:3:2 tier split is derived from doc_id to give the
    temperature rule realistic imbalance to correct (same spirit as the
    reconstructed c_phone / messy-URL columns)."""
    m = F.col("doc_id") % 10
    return (
        F.when(m < 5, F.lit("head"))
        .when(m < 8, F.lit("torso"))
        .otherwise(F.lit("tail"))
    )


def temperature_sample(
    spark: SparkSession, sf_dir: str, alpha: float = TEMP_ALPHA
) -> DataFrame:
    """(doc_id, tier, bucket, thr): deterministic sample whose per-tier
    volume follows c_t^alpha — the temperature-scaled data-mixing rule that
    upweights small sources relative to their natural share.  Each tier's
    keep-rate is (c_min / c_t)^(1-alpha): the smallest tier is kept in
    full and larger tiers are progressively downsampled.  The keep
    decision reuses the md5-bucket idiom, so membership is reproducible
    row-local arithmetic.

    Plan: per-tier counts are a tiny partial-aggregated rollup joined
    back by explicit broadcast; the keep filter is then map-only over the
    corpus scan — at 10^12 rows the only exchange is the |tiers|-row
    count aggregate."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", _tier_col().alias("tier"), _bucket_col().alias("bucket")
    )
    counts = docs.groupBy("tier").agg(F.count(F.lit(1)).alias("c_t"))
    c_min = counts.agg(F.min("c_t").alias("c_min"))
    thr = F.floor(
        F.pow(F.col("c_min") / F.col("c_t"), F.lit(1.0 - alpha))
        * F.lit(SAMPLE_MOD)
        + F.lit(1e-9)
    ).cast("bigint")
    rates = counts.crossJoin(F.broadcast(c_min)).select(
        "tier", thr.alias("thr")
    )
    return (
        docs.join(F.broadcast(rates), "tier")
        .where(F.col("bucket") < F.col("thr"))
        .select("doc_id", "tier", "bucket", "thr")
    )


def sql_temperature_sample(alpha: float = TEMP_ALPHA) -> str:
    bucket = (
        "CAST('0x' || substring(md5(doc_id::VARCHAR), 1, 15) AS BIGINT) "
        f"% {SAMPLE_MOD}"
    )
    tier = (
        "CASE WHEN doc_id % 10 < 5 THEN 'head' "
        "WHEN doc_id % 10 < 8 THEN 'torso' ELSE 'tail' END"
    )
    return f"""
WITH d AS (SELECT doc_id, {tier} AS tier, {bucket} AS bucket FROM documents),
counts AS (SELECT tier, COUNT(*) AS c_t FROM d GROUP BY tier),
rates AS (
  SELECT tier,
         CAST(floor(pow((SELECT MIN(c_t) FROM counts)::DOUBLE / c_t,
                        {1.0 - alpha}) * {SAMPLE_MOD} + 1e-9) AS BIGINT) AS thr
  FROM counts
)
SELECT d.doc_id, d.tier, d.bucket, r.thr
FROM d JOIN rates r USING (tier)
WHERE d.bucket < r.thr
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights (hashed n-gram domain resampling scores).
# ---------------------------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al., 2023): score every
# corpus document by how target-domain-like its hashed bigram features are,
# weight = sum over doc features of the target/corpus probability ratio.
# The target here is the deterministic "long documents" slice (a real run
# swaps in any labeled in-domain sample; the plan is unchanged).  The
# classic formulation sums log-ratios; this one sums the Laplace-smoothed
# ratios integer-quantized to ppm, so every arithmetic step is exact
# BIGINT and engine-identical — no cross-row float accumulation at all.

DSIR_BUCKETS = 256
DSIR_PPM = 1_000_000
DSIR_TARGET_MIN_WORDS = 60


def dsir_weights(
    spark: SparkSession, sf_dir: str, n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """(doc_id, is_target, n_feats, dsir_score_ppm): per-document DSIR
    importance score — the sum over the doc's hashed-bigram features of
    ppm((n_target_b + 1) * (C + B) / ((n_corpus_b + 1) * (T + B))), the
    add-one-smoothed target/corpus bucket-probability ratio.

    Plan: ONE corpus pass builds the exploded (doc, bucket) feature table
    (arrays_zip over two token-array slices — row-local, no index-loop
    HOF); bucket stats AND their totals both derive from the
    B-row aggregate (B = 256), which broadcasts back over the feature
    table for scoring — so the corpus shuffles once (the per-doc score
    groupBy) and the ratio table never shuffles at all.  The feature
    table is persisted across its two consumers (stats pass + scoring
    pass) via the corpus-query cache registry.  BIGINT headroom: the
    ppm numerator is bounded by (T+1)*(C+B)*1e6 — fine through ~1e9
    bigrams; past that, pre-divide the ratio's constant factor or score
    in DECIMAL(38,0), same plan."""
    from sparkmedkg import webkg
    from sparkmedkg.webgraph import _h60

    toks = F.split(F.lower(F.col("text")), " ")
    feats = webkg._track(
        _docs(spark, sf_dir)
        .select("doc_id", toks.alias("ws"))
        .select(
            "doc_id",
            (F.size("ws") >= DSIR_TARGET_MIN_WORDS).alias("is_target"),
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("w1"),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            "is_target",
            (_h60(F.concat_ws(" ", "bg.w1", "bg.w2")) % n_buckets).alias("b"),
        )
    )
    stats = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_t"),
    )
    totals = stats.agg(
        F.sum("n_c").alias("tot_c"), F.sum("n_t").alias("tot_t")
    )
    term = F.expr(
        f"(n_t + 1) * (tot_c + {n_buckets}) * {DSIR_PPM}"
        f" div ((n_c + 1) * (tot_t + {n_buckets}))"
    )
    return (
        feats.join(F.broadcast(stats), "b")
        .join(F.broadcast(totals))
        .select("doc_id", "is_target", term.alias("term_ppm"))
        .groupBy("doc_id", "is_target")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("term_ppm").cast("bigint").alias("dsir_score_ppm"),
        )
    )


def sql_dsir_weights(n_buckets: int = DSIR_BUCKETS) -> str:
    from sparkmedkg.webgraph import _sql_h60

    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
),
pos AS (
  SELECT doc_id, len(ws) >= {DSIR_TARGET_MIN_WORDS} AS is_target, ws,
         unnest(generate_series(1, len(ws) - 1)) AS i
  FROM toks
),
feats AS MATERIALIZED (
  SELECT doc_id, is_target,
         {_sql_h60("ws[i] || ' ' || ws[i + 1]")} % {n_buckets} AS b
  FROM pos
),
stats AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS n_t
  FROM feats GROUP BY b
),
tot AS (
  SELECT CAST(SUM(n_c) AS BIGINT) AS tot_c,
         CAST(SUM(n_t) AS BIGINT) AS tot_t
  FROM stats
)
SELECT doc_id, is_target, CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM((n_t + 1) * (tot_c + {n_buckets}) * {DSIR_PPM}
                // ((n_c + 1) * (tot_t + {n_buckets}))) AS BIGINT)
         AS dsir_score_ppm
FROM feats JOIN stats USING (b) CROSS JOIN tot
GROUP BY doc_id, is_target
"""


# ---------------------------------------------------------------------------
# Train/val/test split manifest (growth-stable assignment).
# ---------------------------------------------------------------------------

SPLIT_BOUNDS_BP = (9800, 9900)   # train < 9800 <= val < 9900 <= test (of 10k)


def split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split, n_docs, n_tokens): corpus partitioned into train/val/test
    by the deterministic md5 bucket of doc_id alone — so a document's
    split NEVER changes as the corpus grows (the property that prevents
    eval contamination across dataset refreshes; date- or
    position-based splits lack it).  Map-only bucket + one 3-row
    aggregate; the per-doc assignment is the same
    md5-mod-10000 primitive as stratified_sample, reusable as a column
    anywhere."""
    lo, hi = SPLIT_BOUNDS_BP
    split = (
        F.when(_bucket_col() < lo, F.lit("train"))
        .when(_bucket_col() < hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    toks = F.split(F.lower(F.col("text")), " +")
    return (
        _docs(spark, sf_dir)
        .select(split.alias("split"), F.size(toks).cast("bigint").alias("n_tokens"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def sql_split_manifest() -> str:
    lo, hi = SPLIT_BOUNDS_BP
    bucket = (
        "(CAST('0x' || substring(md5(doc_id::VARCHAR), 1, 15) AS BIGINT) "
        f"% {SAMPLE_MOD})"
    )
    return f"""
WITH t AS (
  SELECT CASE WHEN {bucket} < {lo} THEN 'train'
              WHEN {bucket} < {hi} THEN 'val'
              ELSE 'test' END AS split,
         CAST(len(regexp_split_to_array(lower(text), ' +')) AS BIGINT)
           AS n_tokens
  FROM documents
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM t GROUP BY split
"""


# ---------------------------------------------------------------------------
# Data-mixture plan (temperature-weighted token budget).
# ---------------------------------------------------------------------------

MIX_BUDGET_DOCS = 10_000


def mixture_plan(
    spark: SparkSession, sf_dir: str, alpha: float = TEMP_ALPHA
) -> DataFrame:
    """(tier, n_docs, n_tokens, nat_share, temp_share, planned_docs): the
    data-mixing plan — each source tier's natural share vs its
    temperature-scaled share c_t^alpha / sum(c^alpha), and the doc budget
    that share buys out of ``MIX_BUDGET_DOCS``.  This is the PLANNING
    twin of temperature_sample (which executes a mixture row-locally):
    the table a training run reviews before committing a budget.

    Determinism: tier sizes are exact BIGINTs; the alpha powers are
    doubles, so the denominator is a fixed-order fold over the
    tier-sorted struct array (the outlink_entropy convention — the tier
    universe is enum-sized, so the per-row array is tiny) and shares
    round at emit.  Plan: one groupBy over the corpus, then a 1-row
    broadcast — no second scan."""
    per = (
        _docs(spark, sf_dir)
        .withColumn("tier", _tier_col())
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " +")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("all_docs"),
        F.array_sort(F.collect_list(F.struct("tier", "n_docs"))).alias("ts"),
    ).select(
        "all_docs",
        F.aggregate(
            "ts",
            F.lit(0.0),
            lambda acc, s: acc + F.pow(s["n_docs"].cast("double"), alpha),
        ).alias("z"),
    )
    temp_share = F.pow(F.col("n_docs").cast("double"), alpha) / F.col("z")
    return per.crossJoin(F.broadcast(tot)).select(
        "tier",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs").cast("double") / F.col("all_docs"), 6).alias(
            "nat_share"
        ),
        F.round(temp_share, 6).alias("temp_share"),
        F.floor(temp_share * MIX_BUDGET_DOCS).cast("bigint").alias(
            "planned_docs"
        ),
    )


def sql_mixture_plan(alpha: float = TEMP_ALPHA) -> str:
    tier = (
        "CASE WHEN doc_id % 10 < 5 THEN 'head' "
        "WHEN doc_id % 10 < 8 THEN 'torso' ELSE 'tail' END"
    )
    return f"""
WITH per AS (
  SELECT {tier} AS tier,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(text, ' +'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs,
         list_reduce(list_prepend(0.0::DOUBLE, list_transform(
           list_sort(list({{'tier': tier, 'n_docs': n_docs}})),
           s -> pow(s.n_docs::DOUBLE, {alpha}))),
           (acc, e) -> acc + e) AS z
  FROM per
)
SELECT tier, n_docs, n_tokens,
       round(n_docs::DOUBLE / all_docs, 6) AS nat_share,
       round(pow(n_docs::DOUBLE, {alpha}) / z, 6) AS temp_share,
       CAST(floor(pow(n_docs::DOUBLE, {alpha}) / z * {MIX_BUDGET_DOCS})
            AS BIGINT) AS planned_docs
FROM per CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Priority sampling audit (Duffield-Lund-Thorup subset-sum estimator).
# ---------------------------------------------------------------------------

PS_K = 64            # sample size
PS_HASH_HEX = 8      # 32-bit md5 prefix -> u in (0, 1] at 2^-32 grain


def priority_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_docs, total_w, k, tau_w, tau_h, n_above, est_w, err_ppm): the
    priority-sampling scorecard — every doc draws u = h/2^32 from the
    md5 bridge and priority q = w/u (w = text bytes); the top-{PS_K}
    priorities form the sample, tau = the (k+1)-th priority, and the
    Duffield-Lund-Thorup estimator sum(max(w_i, tau)) over the sample
    estimates the EXACT corpus byte total (provably optimal variance
    among k-sample subset-sum schemes).  A pipeline uses exactly this to
    budget downstream stages from a fixed-size sample; the audit prints
    the realized estimation error.

    Determinism: u comes from a 32-bit md5 prefix (+1, so u > 0) and
    every decision is exact-integer — the priority ORDER is a double
    w/h, but both engines divide identical BIGINTs (identical IEEE
    result) with doc_id tiebreak; the w >= tau test cross-multiplies
    integers (w * tau_h vs tau_w * 2^32, all < 2^46); est_w returns to
    weight units by one truncating division.  Degenerate corpus (<= k
    docs): tau is null and est_w = total_w exactly.

    Plan: weights and hashes fold into the scan projection; ONE top-(k+1)
    sort bounded by rank (TakeOrdered-sized, never a full materialized
    sort at scale — a k-sized heap per partition then a k-merge); the
    estimator aggregates k rows against the 1-row tau broadcast."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.length("text").cast("bigint").alias("w"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1,
                            PS_HASH_HEX),
                16,
                10,
            ).cast("bigint")
            + 1
        ).alias("h"),
    )
    pri = F.desc(F.col("w").cast("double") / F.col("h").cast("double"))
    # real TakeOrderedAndProject: sort+limit keeps the top-(k+1) per
    # partition then k-merges; only those k+1 rows get ranked (bounded)
    w_rank = exactq.bounded_window("doc_id", pri, F.asc("doc_id"))
    ranked = (
        docs.orderBy(pri, F.asc("doc_id"))
        .limit(PS_K + 1)
        .select("doc_id", "w", "h")
        .withColumn("rn", F.row_number().over(w_rank))
        .select("w", "h", "rn")
        .localCheckpoint(eager=True)
    )
    tot = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("total_w"),
    )
    tau = ranked.agg(
        F.min(F.when(F.col("rn") == PS_K + 1, F.col("w"))).alias("tau_w"),
        F.min(F.when(F.col("rn") == PS_K + 1, F.col("h"))).alias("tau_h"),
    )
    two32 = 1 << (4 * PS_HASH_HEX)
    samp = (
        ranked.where(F.col("rn") <= PS_K)
        .crossJoin(F.broadcast(tau))
        .agg(
            F.min("tau_w").cast("bigint").alias("tau_w"),
            F.min("tau_h").cast("bigint").alias("tau_h"),
            F.sum(
                F.when(
                    F.col("w") * F.col("tau_h")
                    >= F.col("tau_w") * F.lit(two32),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_above"),
            F.sum(
                F.when(
                    F.col("w") * F.col("tau_h")
                    >= F.col("tau_w") * F.lit(two32),
                    F.col("w") * F.col("tau_h"),
                ).otherwise(F.col("tau_w") * F.lit(two32))
            ).alias("est_num"),
        )
    )
    return tot.crossJoin(samp).select(
        "n_docs",
        "total_w",
        F.lit(PS_K).cast("bigint").alias("k"),
        "tau_w",
        "tau_h",
        F.coalesce(F.col("n_above"), F.lit(0)).cast("bigint")
        .alias("n_above"),
        F.when(F.col("tau_w").isNull(), F.col("total_w"))
        .otherwise(F.expr("div(est_num, tau_h)"))
        .cast("bigint")
        .alias("est_w"),
        F.expr(
            "div(1000000 * abs((CASE WHEN tau_w IS NULL THEN total_w"
            " ELSE div(est_num, tau_h) END) - total_w), total_w)"
        ).alias("err_ppm"),
    )


def sql_priority_sample_audit() -> str:
    two32 = 1 << (4 * PS_HASH_HEX)
    return f"""
WITH docs AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS w,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1,
                                {PS_HASH_HEX}) AS BIGINT) + 1 AS h
  FROM documents
),
ranked AS (
  SELECT w, h,
         row_number() OVER (ORDER BY CAST(w AS DOUBLE) / CAST(h AS DOUBLE)
                            DESC, doc_id ASC) AS rn
  FROM docs
  QUALIFY rn <= {PS_K + 1}
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS total_w
  FROM docs
),
tau AS (
  SELECT MIN(CASE WHEN rn = {PS_K + 1} THEN w END) AS tau_w,
         MIN(CASE WHEN rn = {PS_K + 1} THEN h END) AS tau_h
  FROM ranked
),
samp AS (
  SELECT CAST(MIN(t.tau_w) AS BIGINT) AS tau_w,
         CAST(MIN(t.tau_h) AS BIGINT) AS tau_h,
         CAST(SUM(CASE WHEN r.w * t.tau_h >= t.tau_w * {two32}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
         SUM(CASE WHEN r.w * t.tau_h >= t.tau_w * {two32}
                  THEN r.w * t.tau_h
                  ELSE t.tau_w * {two32} END) AS est_num
  FROM ranked r CROSS JOIN tau t
  WHERE r.rn <= {PS_K}
)
SELECT tot.n_docs, tot.total_w, CAST({PS_K} AS BIGINT) AS k,
       s.tau_w, s.tau_h,
       CAST(COALESCE(s.n_above, 0) AS BIGINT) AS n_above,
       CAST(CASE WHEN s.tau_w IS NULL THEN tot.total_w
                 ELSE CAST(s.est_num AS BIGINT) // s.tau_h END AS BIGINT)
         AS est_w,
       CAST((1000000 * abs(CAST(CASE WHEN s.tau_w IS NULL
                                     THEN tot.total_w
                                     ELSE CAST(s.est_num AS BIGINT)
                                          // s.tau_h END AS BIGINT)
                           - tot.total_w)) // tot.total_w AS BIGINT)
         AS err_ppm
FROM tot CROSS JOIN samp s
"""


# ---------------------------------------------------------------------------
# 2-D Pareto skyline over (length, lexical diversity).
# ---------------------------------------------------------------------------

SKY_GRID = 64  # token-count bucket width for the distributed prune


def doc_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_toks, distinct_ppm): the Pareto skyline of the corpus
    over x = token count and y = lexical diversity (distinct tokens per
    million tokens) — the multi-criteria selection operator ("longest
    docs that are also the least repetitive") data-curation UIs expose;
    a doc survives iff NO other doc is >= on both axes and > on one.
    Duplicates of a skyline point all survive (neither dominates).

    Scale shape (the classic distributed-skyline recipe): a GRID PRUNE
    first — per x-bucket (n_toks div SKY_GRID) max-y is a tiny aggregate;
    a row dominated by the best y of any strictly-higher bucket is
    provably dominated (that bucket's witness has strictly greater x),
    so the broadcast-joined suffix-max eliminates all but a
    near-skyline-sized survivor set BEFORE the exact pass.  The exact
    pass then runs two range-frame windows (max y over x' > x, max y
    over x' = x) on the survivors only; skyline rows are never pruned
    and dominance is transitive, so checking survivors against survivors
    is exact.  No crossJoin anywhere; the oracle is the naive
    NOT EXISTS all-pairs twin."""
    ts = F.split(F.col("text"), " +")
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", ts.alias("ts"))
        .where(F.size("ts") > 0)
        .select(
            "doc_id",
            F.size("ts").cast("bigint").alias("x"),
            F.expr(
                "CAST(size(array_distinct(ts)) AS BIGINT) * 1000000"
                " div size(ts)"
            ).alias("y"),
        )
    )
    buckets = d.groupBy(F.expr("x div 64").alias("b")).agg(
        F.max("y").alias("by")
    )
    # bounded: one row per 64-token-wide length bucket (max-doc-len/64)
    wb = exactq.bounded_window("b", "b").rangeBetween(
        1, Window.unboundedFollowing
    )
    suffix = buckets.select("b", F.max("by").over(wb).alias("hi_b"))
    survivors = d.join(
        F.broadcast(suffix), F.expr("x div 64") == F.col("b")
    ).where(F.col("hi_b").isNull() | (F.col("hi_b") < F.col("y")))
    # bounded: the bucket-pruned skyline candidate set (dominated docs
    # are already gone, so this is the near-frontier, not the corpus)
    w_gt = exactq.bounded_window("x", "x").rangeBetween(
        1, Window.unboundedFollowing
    )
    w_eq = exactq.bounded_window("x", "x").rangeBetween(0, 0)
    out = (
        survivors.withColumn("hi_gt", F.max("y").over(w_gt))
        .withColumn("hi_eq", F.max("y").over(w_eq))
        .where(
            (F.col("hi_gt").isNull() | (F.col("hi_gt") < F.col("y")))
            & (F.col("hi_eq") <= F.col("y"))
        )
    )
    return out.select(
        "doc_id",
        F.col("x").alias("n_toks"),
        F.col("y").alias("distinct_ppm"),
    )


def sql_doc_skyline() -> str:
    toks = "regexp_split_to_array(text, ' +')"
    return f"""
WITH d AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS x,
         CAST(CAST(len(list_distinct(ts)) AS BIGINT) * 1000000 // len(ts)
              AS BIGINT) AS y
  FROM (SELECT doc_id, {toks} AS ts FROM documents)
  WHERE len(ts) > 0
)
SELECT r.doc_id, r.x AS n_toks, r.y AS distinct_ppm
FROM d r
WHERE NOT EXISTS (
  SELECT 1 FROM d q
  WHERE q.x >= r.x AND q.y >= r.y AND (q.x > r.x OR q.y > r.y)
)
"""


# ---------------------------------------------------------------------------
# Class-balanced downsampling plan (training-label rebalance).
# ---------------------------------------------------------------------------

def class_balance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_before, n_after, kept_share_ppm): deterministic
    balanced-downsample plan over the labeled embedding table — every
    class is cut to the minority class's size by keeping the md5-lowest
    vec_ids (the same engine-reproducible hash-order trick as
    stratified_sample: no rand(), no seed drift on partition retry).
    The summary a training-data pipeline logs before fitting anything on
    an imbalanced label.

    Plan: one class-count aggregate (broadcast back as the 1-row min),
    one per-class hash-rank window (classes are the bounded partition
    key), one class-sized rollup."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label"
    )
    counts = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    target = counts.agg(F.min("n_before").alias("target"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = e.withColumn("rn", F.row_number().over(w)).crossJoin(
        F.broadcast(target)
    )
    after = (
        ranked.where(F.col("rn") <= F.col("target"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_after"))
    )
    return (
        counts.join(after, "label")
        .select(
            "label",
            "n_before",
            "n_after",
            F.expr("n_after * 1000000 div n_before")
            .cast("bigint")
            .alias("kept_share_ppm"),
        )
    )


def sql_class_balance_plan() -> str:
    return """
WITH e AS (SELECT vec_id, label FROM embeddings),
counts AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_before FROM e GROUP BY 1
),
t AS (SELECT MIN(n_before) AS target FROM counts),
ranked AS (
  SELECT label,
         ROW_NUMBER() OVER (
           PARTITION BY label
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS rn
  FROM e
),
after AS (
  SELECT r.label, CAST(COUNT(*) AS BIGINT) AS n_after
  FROM ranked r CROSS JOIN t WHERE r.rn <= t.target GROUP BY 1
)
SELECT c.label, c.n_before, a.n_after,
       CAST(a.n_after * 1000000 // c.n_before AS BIGINT) AS kept_share_ppm
FROM counts c JOIN after a ON c.label = a.label
"""
