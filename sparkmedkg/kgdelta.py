"""Incremental / temporal KG maintenance + linking-ops over the web corpus.

A 100 TB knowledge graph is not rebuilt per crawl — it is *maintained*:
each new crawl snapshot contributes a delta of documents whose triples must
be merged into the stored edge table, edges carry temporal validity derived
from crawl timestamps, unlinkable mentions must surface as NIL entities
instead of silently dropping, and the hot-key layout (which CUIs need
salting) has to be derived from the live incidence distribution.  This
module adds those four maintenance operators plus the streaming twin of the
mention-extraction lane, all over the same deterministic web lexicon and
DuckDB oracles as ``sparkmedkg.webkg``.

Reference anchors: the reference rebuilds its whole graph per request
(``_init_new_neo4j_graph`` wipes and re-uploads, neo4jconnector.py:244-256)
— the incremental / temporal operators here are the bulk-scale replacement
for that wipe-and-reload, per BASELINE.json's north_star ("graph
materialization into partitioned Iceberg node/edge tables instead of Neo4j
writes") and north_rule resumability.

Scale shapes (audited like the rest of the engine):
- the incremental lane runs mention detection ONLY over the delta snapshot
  (the crawl-partition filter is pushed below the NER stage, so extraction
  cost tracks |delta|, not |corpus|); the base side stands in for the
  stored edge table and arrives pre-aggregated (node-pair-sized);
- every pair fan-out rides the per-doc distinct-CUI bound (lexicon-bounded)
  exactly like webkg.q_cooccurrence — never corpus x corpus;
- the salt-plan total is a 1-row broadcast attachment
  (BroadcastNestedLoopJoin, the labeled pattern plan_sweep accepts);
- the streaming lane is a pure row-local projection (token match against a
  literal alias array) + one watermarked windowed count — no Python, no
  unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import link, ner, relations, webkg

#: docs with doc_id % DELTA_MOD == 0 form the "new crawl snapshot" delta;
#: the rest are the already-ingested base corpus whose edges live in the
#: stored graph.  Deterministic so the DuckDB oracle sees the same split.
DELTA_MOD = 5

#: deterministic crawl-day derivation (the documents fixture carries no
#: timestamp column): day = 2024-01-01 + (doc_id % CRAWL_DAYS) days.
CRAWL_EPOCH = "2024-01-01"
CRAWL_DAYS = 90

#: streaming mention-count window (tumbling, epoch-aligned like F.window).
KG_STREAM_WIN_DAYS = 7

#: per-surface best-link confidence below which a mention is NIL (the
#: reference's selection threshold, medgen.py:149).
NIL_THRESHOLD = 0.85

#: target per-(CUI, salt) partition load for the salt plan.
SALT_TARGET = 20


def _delta_pred(col: str = "url"):
    return F.col(col).cast("bigint") % DELTA_MOD == 0


def _pair_counts(doc_cui: DataFrame, count_alias: str) -> DataFrame:
    """(subj_cui < obj_cui) doc-co-occurrence pair counts — the same
    bounded per-doc fan-out as webkg.q_cooccurrence."""
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("subj_cui"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("obj_cui"))
    return (
        a.join(b, "u")
        .where(F.col("subj_cui") < F.col("obj_cui"))
        .groupBy("subj_cui", "obj_cui")
        .agg(F.count(F.lit(1)).alias(count_alias))
    )


def incremental_update(
    spark: SparkSession, sf_dir: str, base_edges: DataFrame | None = None
) -> DataFrame:
    """Incremental KG maintenance: merge the new crawl snapshot's triples
    into the stored co-occurrence edge set, classifying every edge as
    new / updated / unchanged.

    Replaces the reference's per-request wipe-and-reload
    (neo4jconnector.py:244-256 + the MERGE upload loop at :195-221) with
    the delta-merge a standing 10^12-doc graph needs:

    - the DELTA lane filters the corpus to the new snapshot *before* the
      mapInPandas NER stage (plan: partition filter under the Python
      stage), so extraction cost tracks |delta|;
    - the BASE side is the session-cached (url, CUI) incidence — the
      stand-in for scanning the stored, already-aggregated edge table; at
      deployment this input is `spark.read.table('kg.edges')` and costs a
      node-pair-sized scan, no re-extraction;
    - doc-sets are disjoint by construction, so the merge is one
      full-outer join on the edge key with additive support counts — the
      exact shape of an Iceberg `MERGE INTO ... WHEN MATCHED UPDATE /
      WHEN NOT MATCHED INSERT` over the edge table.

    ``base_edges`` (subj_cui, obj_cui, n_base) lets a deployment pass the
    STORED edge table directly — the corpus is then never rescanned for
    the base side (tests/test_kgdelta.py proves the two forms identical).
    """
    if base_edges is not None:
        base_pairs = base_edges.select("subj_cui", "obj_cui", "n_base")
    else:
        base_pairs = _pair_counts(
            relations.doc_cui_cached(spark, sf_dir).where(~_delta_pred()),
            "n_base",
        )
    d = webkg.docs_df(spark, sf_dir).where(
        (F.col("lang") == "en") & _delta_pred()
    )
    mentions = webkg._track(
        ner.detect_mentions(d, webkg.alias_bc(spark), mode="all")
    )
    links = link.link_mentions(
        mentions, webkg.aliases_df(spark), webkg.concepts_df(spark)
    )
    delta_dc = (
        mentions.select("url", "mention")
        .join(links.select(F.col("source").alias("mention"), "CUI"), "mention")
        .select("url", "CUI")
        .distinct()
    )
    merged = base_pairs.join(
        _pair_counts(delta_dc, "n_delta"),
        ["subj_cui", "obj_cui"],
        "full_outer",
    )
    n_base = F.coalesce(F.col("n_base"), F.lit(0).cast("bigint"))
    n_delta = F.coalesce(F.col("n_delta"), F.lit(0).cast("bigint"))
    return merged.select(
        "subj_cui",
        F.lit("COOCCURS_WITH").alias("pred"),
        "obj_cui",
        n_base.alias("n_base"),
        n_delta.alias("n_delta"),
        (n_base + n_delta).alias("n_total"),
        F.when(n_base == 0, F.lit("new"))
        .when(n_delta == 0, F.lit("unchanged"))
        .otherwise(F.lit("updated"))
        .alias("status"),
    )


def _crawl_day(col: str = "url"):
    return F.date_add(
        F.to_date(F.lit(CRAWL_EPOCH)),
        (F.col(col).cast("bigint") % CRAWL_DAYS).cast("int"),
    )


def temporal_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal KG: per co-occurrence edge, its crawl-time validity —
    first_seen / last_seen crawl day, number of distinct active days, doc
    support, and the active span in days.

    The crawl day is derived deterministically from the doc id (the
    fixture corpus carries no timestamp; at deployment this is the
    input_hint's ``warc_ts`` column read straight off the Iceberg scan).
    Scale shape: the incidence table gains one derived column; the pair
    fan-out and the (min, max, count-distinct-day) aggregation ride the
    same bounded per-doc self-join + one grouped shuffle as the plain
    edge builder."""
    dcd = relations.doc_cui_cached(spark, sf_dir).withColumn(
        "crawl_day", _crawl_day()
    )
    a = dcd.select(
        F.col("url").alias("u"), "crawl_day", F.col("CUI").alias("subj_cui")
    )
    b = dcd.select(F.col("url").alias("u"), F.col("CUI").alias("obj_cui"))
    return (
        a.join(b, "u")
        .where(F.col("subj_cui") < F.col("obj_cui"))
        .groupBy("subj_cui", "obj_cui")
        .agg(
            F.min("crawl_day").alias("_first"),
            F.max("crawl_day").alias("_last"),
            F.countDistinct("crawl_day").alias("n_days"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "subj_cui",
            "obj_cui",
            # ISO strings, not DATE: Spark dates reach pandas as object
            # (datetime.date) while DuckDB dates arrive as datetime64, so
            # the driver's dtype-sensitive hash would split on the type
            # even with identical values (tools/dtype_audit.py class)
            F.col("_first").cast("string").alias("first_seen"),
            F.col("_last").cast("string").alias("last_seen"),
            "n_days",
            "n_docs",
            (F.datediff(F.col("_last"), F.col("_first")) + F.lit(1))
            .cast("bigint")
            .alias("span_days"),
        )
    )


def nil_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = NIL_THRESHOLD
) -> DataFrame:
    """NIL entity detection: surfaces whose best link confidence is below
    the selection threshold (or that produce no candidate at all) become
    NIL entities with deterministic ids, instead of silently dropping.

    The reference keeps only links above 0.85 (medgen.py:149) and the rest
    of each mention's evidence vanishes; at corpus scale the unlinkable
    surface forms ARE the signal for vocabulary growth (new drugs, new
    procedures), so they get stable ids — ``NIL_`` + md5 prefix of the
    surface, the same engine-portable hash used for split manifests — and
    doc-support counts, ready to MERGE into the node table as candidate
    entities.  Scale shape: one distinct-surface aggregation (vocab-sized)
    left-joined against the per-surface best score (also vocab-sized);
    the corpus is touched once by the mention scan."""
    d = webkg.docs_df(spark, sf_dir).where(F.col("lang") == "en")
    mentions = webkg._track(
        ner.detect_mentions(d, webkg.alias_bc(spark), mode="all")
    )
    links = link.link_mentions(
        mentions, webkg.aliases_df(spark), webkg.concepts_df(spark)
    )
    surf = mentions.groupBy("mention").agg(
        F.countDistinct("url").alias("n_docs")
    )
    best = links.groupBy(F.col("source").alias("mention")).agg(
        F.max("kb_score").alias("best_score")
    )
    return (
        surf.join(best, "mention", "left")
        .where(
            F.col("best_score").isNull() | (F.col("best_score") < threshold)
        )
        .select(
            F.concat(
                F.lit("NIL_"), F.substring(F.md5(F.col("mention")), 1, 8)
            ).alias("nil_id"),
            F.col("mention").alias("surface"),
            "n_docs",
            "best_score",
            F.when(F.col("best_score").isNull(), F.lit("no_candidate"))
            .otherwise(F.lit("low_confidence"))
            .alias("reason"),
        )
    )


#: alias-candidate gates: a NIL surface must co-occur with a CUI in at
#: least MIN_CO docs and in at least ALIAS_TAU_PPM of its own docs.
ALIAS_MIN_CO = 2
ALIAS_TAU_PPM = 500_000


def alias_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth: mine new alias candidates for existing concepts
    from co-mention evidence — the curation loop that closes
    ``nil_clusters``.

    A NIL surface (below-threshold or candidate-less, same definition as
    nil_clusters) becomes an alias CANDIDATE for concept c when it
    appears in >= {ALIAS_MIN_CO} docs that link to c, and those docs are
    >= {ALIAS_TAU_PPM} ppm of all docs containing the surface — i.e. the
    surface's document contexts are dominated by c.  The reference has no
    such loop (its lexicon is the fixed scispaCy KB); at web scale this
    is how "new drug name spiking in crawls" (entity_trend) turns into a
    lexicon row instead of a permanent NIL.

    Integer-exact: confidence is BIGINT ppm (n_co * 1e6 DIV n_s).  Scale
    shape: the NIL surface set is vocab-sized; its (url, surface)
    incidence equi-joins doc_cui on the doc key with fan-out bounded by
    per-doc distinct CUIs (lexicon-bounded), then one grouped count —
    never corpus x corpus."""
    d = webkg.docs_df(spark, sf_dir).where(F.col("lang") == "en")
    mentions = webkg._track(
        ner.detect_mentions(d, webkg.alias_bc(spark), mode="all")
    )
    links = link.link_mentions(
        mentions, webkg.aliases_df(spark), webkg.concepts_df(spark)
    )
    best = links.groupBy(F.col("source").alias("mention")).agg(
        F.max("kb_score").alias("best_score")
    )
    nil_surf = (
        mentions.select("mention")
        .distinct()
        .join(best, "mention", "left")
        .where(
            F.col("best_score").isNull()
            | (F.col("best_score") < NIL_THRESHOLD)
        )
        .select("mention")
    )
    surf_docs = mentions.join(F.broadcast(nil_surf), "mention").select(
        "url", "mention"
    ).distinct()
    n_s = surf_docs.groupBy("mention").agg(
        F.count(F.lit(1)).alias("n_s")
    )
    doc_cui = (
        mentions.select("url", "mention")
        .join(links.select(F.col("source").alias("mention"), "CUI"), "mention")
        .select("url", "CUI")
        .distinct()
    )
    co = (
        surf_docs.join(doc_cui, "url")
        .groupBy("mention", "CUI")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    return (
        co.join(n_s, "mention")
        .select(
            F.col("mention").alias("surface"),
            "CUI",
            "n_co",
            "n_s",
            F.expr("(n_co * CAST(1000000 AS BIGINT)) DIV n_s").alias(
                "conf_ppm"
            ),
        )
        .where(
            (F.col("n_co") >= ALIAS_MIN_CO)
            & (
                F.expr("(n_co * CAST(1000000 AS BIGINT)) DIV n_s")
                >= ALIAS_TAU_PPM
            )
        )
    )


def salt_plan(
    spark: SparkSession, sf_dir: str, target: int = SALT_TARGET
) -> DataFrame:
    """Skew layout audit: per-CUI incidence with the salt factor the
    north_rule's hot-key handling prescribes ("salting hot CUIs like
    common drugs") — salt_factor = ceil(n_docs / target) partitions per
    CUI, plus each CUI's share of total incidence in exact ppm.

    All arithmetic is integer (ceil via (n + t - 1) DIV t, share via
    BIGINT DIV), so the plan is bit-identical cross-engine.  Scale shape:
    one grouped count of the incidence table (lexicon-sized output) plus a
    1-row broadcast total attachment."""
    per = relations.doc_cui_cached(spark, sf_dir).groupBy("CUI").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = per.agg(F.sum("n_docs").alias("_total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "CUI",
            "n_docs",
            F.expr(f"(n_docs + {target - 1}) DIV {target}").alias(
                "salt_factor"
            ),
            F.expr("(n_docs * CAST(1000000 AS BIGINT)) DIV _total").alias(
                "share_ppm"
            ),
        )
    )


def entity_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-level trend detection: per (CUI, crawl week), the linked-doc
    count, the previous week's count, the week-over-week ratio in exact
    ppm, and a trend label (new / rising / falling / flat).

    The CUI-level twin of ``textstats.term_burstiness`` (term-level): what
    a standing web-scale KG monitors to catch emerging entities — a new
    drug name spiking across crawl snapshots — before curation.  All
    arithmetic is BIGINT (ratio = cnt * 1e6 DIV prev), so the table is
    bit-identical cross-engine.  Scale shape: one grouped count of the
    incidence table keyed (CUI, week) — lexicon x weeks sized — then a
    lag window PARTITIONED by CUI over the bounded per-CUI week series;
    the corpus is touched once via the shared doc_cui substrate."""
    from pyspark.sql import Window

    wk = relations.doc_cui_cached(spark, sf_dir).withColumn(
        "week",
        F.expr(f"(CAST(url AS BIGINT) % {CRAWL_DAYS}) DIV 7"),
    )
    per = wk.groupBy("CUI", "week").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("CUI").orderBy("week")
    prev = F.lag("n_docs").over(w)
    prev_week = F.lag("week").over(w)
    # a gap week (no docs at all) breaks the streak: prev counts only a
    # directly-preceding week
    adjacent = prev_week == F.col("week") - 1
    prev_adj = F.when(adjacent, prev)
    lagged = per.select(
        "CUI", "week", "n_docs", prev_adj.alias("prev_docs")
    )
    return lagged.select(
        "CUI",
        "week",
        "n_docs",
        "prev_docs",
        # BIGINT DIV: exact cross-engine, no float seam
        F.expr("(n_docs * CAST(1000000 AS BIGINT)) DIV prev_docs").alias(
            "ratio_ppm"
        ),
        F.when(F.col("prev_docs").isNull(), F.lit("new"))
        .when(F.col("n_docs") > F.col("prev_docs"), F.lit("rising"))
        .when(F.col("n_docs") < F.col("prev_docs"), F.lit("falling"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
    )


def source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge provenance diversity: for each co-occurrence edge, the
    doc support, the number of distinct source domains behind it, and
    the Herfindahl concentration of that support in exact ppm
    (sum over sources of cnt^2, scaled by 1e6 DIV n_docs^2 — 1e6 means
    every supporting doc came from ONE domain).

    Web-scale KGs must distrust single-domain edges: a Common-Crawl
    mirror farm repeating one page inflates raw support while adding no
    evidence (the reason BENCH's dedup family exists).  This surfaces
    the signal as an audit column instead of burying it in a float
    heuristic; all arithmetic is BIGINT so the table is bit-identical
    cross-engine.  Scale shape: the pair fan-out is the same bounded
    per-doc self-join as the edge builder, with source riding along;
    two grouped aggregations keyed (pair, source) then (pair)."""
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"), "source"
    )
    dcs = relations.doc_cui_cached(spark, sf_dir).join(src, "url")
    a = dcs.select(
        F.col("url").alias("u"), "source", F.col("CUI").alias("subj_cui")
    )
    b = dcs.select(F.col("url").alias("u"), F.col("CUI").alias("obj_cui"))
    per_src = (
        a.join(b, "u")
        .where(F.col("subj_cui") < F.col("obj_cui"))
        .groupBy("subj_cui", "obj_cui", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_src.groupBy("subj_cui", "obj_cui")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.count(F.lit(1)).alias("n_sources"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("_sq"),
        )
        .select(
            "subj_cui",
            "obj_cui",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_sources",
            F.expr(
                "(_sq * CAST(1000000 AS BIGINT)) DIV (n_docs * n_docs)"
            ).alias("hhi_ppm"),
        )
    )


def q_stream_kg_mentions_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(window_start_us, mention, n_docs): the KG mention-extraction lane
    as a Structured Streaming job — crawl-stream in, watermarked tumbling
    per-window mention doc-counts out — replayed availableNow over the
    fixture corpus so the DuckDB oracle can gate it.

    The match step is the pure-projection twin of the trie lane (the
    boundary-padded containment the mention oracle itself uses,
    webkg._MENTION_FROM): a row-local ``F.filter`` over the literal alias
    array, then one explode — streaming-safe, no Python workers, no
    shuffle before the windowed count.  Each (doc, mention) emits once
    (the filter yields distinct aliases per doc), so the windowed
    ``count(*)`` is exactly the per-window doc-frequency — the streaming
    form of A1's mention counting that never needs a (distinct) streaming
    agg.  A generous watermark makes the availableNow replay lossless;
    in production the watermark bounds state to live crawl windows."""
    import uuid

    from sparkmedkg.streaming import _replay_dirs

    in_dir, _ = _replay_dirs()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("lang") == "en")
        .select(
            F.col("doc_id").cast("string").alias("url"),
            "text",
            F.date_add(
                F.to_date(F.lit(CRAWL_EPOCH)),
                (F.col("doc_id") % CRAWL_DAYS).cast("int"),
            )
            .cast("timestamp")
            .alias("crawl_ts"),
        )
    )
    docs.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(docs.schema).parquet(in_dir)

    aliases = sorted({a for a, _ in webkg.WEB_ALIASES})
    alias_arr = F.array(*[F.lit(a) for a in aliases])
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    matched = F.filter(
        alias_arr,
        lambda a: padded.contains(F.concat(F.lit(" "), a, F.lit(" "))),
    )
    m = stream.select(
        "url", "crawl_ts", F.explode(matched).alias("mention")
    )
    agg = (
        m.withWatermark("crawl_ts", "365 days")
        .groupBy(
            F.window("crawl_ts", f"{KG_STREAM_WIN_DAYS} days").alias("w"),
            "mention",
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "mention",
            "n_docs",
        )
    )
    name = f"kgm_replay_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Oracle SQL builders (DuckDB; lexicon inlined, same CTEs as webkg).
# ---------------------------------------------------------------------------

def _doc_cui_ctes() -> str:
    from sparkmedkg.webkg import _links_cte, sql_aliases_cte

    return (
        f"{sql_aliases_cte()},\n"
        "read_docs AS (SELECT * FROM documents WHERE lang = 'en'),\n"
        f"{_links_cte().lstrip()},\n"
        "doc_cui AS (\n"
        "  SELECT DISTINCT m.doc_id, l.cui\n"
        "  FROM mentions m JOIN links l ON l.mention = m.mention\n"
        ")"
    )


def sql_incremental_update() -> str:
    return f"""
WITH {_doc_cui_ctes()},
base_pairs AS (
  SELECT a.cui AS subj_cui, b.cui AS obj_cui, COUNT(*) AS n_base
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  WHERE a.doc_id % {DELTA_MOD} <> 0
  GROUP BY 1, 2
),
delta_pairs AS (
  SELECT a.cui AS subj_cui, b.cui AS obj_cui, COUNT(*) AS n_delta
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  WHERE a.doc_id % {DELTA_MOD} = 0
  GROUP BY 1, 2
)
SELECT COALESCE(b.subj_cui, d.subj_cui) AS subj_cui,
       'COOCCURS_WITH' AS pred,
       COALESCE(b.obj_cui, d.obj_cui) AS obj_cui,
       COALESCE(b.n_base, 0) AS n_base,
       COALESCE(d.n_delta, 0) AS n_delta,
       COALESCE(b.n_base, 0) + COALESCE(d.n_delta, 0) AS n_total,
       CASE WHEN COALESCE(b.n_base, 0) = 0 THEN 'new'
            WHEN COALESCE(d.n_delta, 0) = 0 THEN 'unchanged'
            ELSE 'updated' END AS status
FROM base_pairs b
FULL OUTER JOIN delta_pairs d
  ON b.subj_cui = d.subj_cui AND b.obj_cui = d.obj_cui
"""


def sql_temporal_edges() -> str:
    return f"""
WITH {_doc_cui_ctes()},
dcd AS (
  SELECT doc_id, cui,
         DATE '{CRAWL_EPOCH}' + CAST(doc_id % {CRAWL_DAYS} AS INT) AS crawl_day
  FROM doc_cui
)
SELECT a.cui AS subj_cui, b.cui AS obj_cui,
       CAST(MIN(a.crawl_day) AS VARCHAR) AS first_seen,
       CAST(MAX(a.crawl_day) AS VARCHAR) AS last_seen,
       COUNT(DISTINCT a.crawl_day) AS n_days,
       COUNT(*) AS n_docs,
       CAST(MAX(a.crawl_day) - MIN(a.crawl_day) + 1 AS BIGINT) AS span_days
FROM dcd a JOIN dcd b ON a.doc_id = b.doc_id AND a.cui < b.cui
GROUP BY 1, 2
"""


def sql_nil_clusters(threshold: float = NIL_THRESHOLD) -> str:
    from sparkmedkg.webkg import _links_cte, sql_aliases_cte

    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
surf AS (
  SELECT mention, COUNT(DISTINCT doc_id) AS n_docs
  FROM mentions GROUP BY mention
),
best AS (
  SELECT mention, MAX(kb_score) AS best_score
  FROM links GROUP BY mention
)
SELECT 'NIL_' || substr(md5(s.mention), 1, 8) AS nil_id,
       s.mention AS surface,
       s.n_docs,
       b.best_score,
       CASE WHEN b.best_score IS NULL THEN 'no_candidate'
            ELSE 'low_confidence' END AS reason
FROM surf s LEFT JOIN best b USING (mention)
WHERE b.best_score IS NULL OR b.best_score < {threshold}
"""


def sql_alias_candidates() -> str:
    from sparkmedkg.webkg import _links_cte, sql_aliases_cte

    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
best AS (
  SELECT mention, MAX(kb_score) AS best_score FROM links GROUP BY mention
),
nil_surf AS (
  SELECT m.mention FROM (SELECT DISTINCT mention FROM mentions) m
  LEFT JOIN best b USING (mention)
  WHERE b.best_score IS NULL OR b.best_score < {NIL_THRESHOLD}
),
surf_docs AS (
  SELECT DISTINCT m.doc_id, m.mention
  FROM mentions m JOIN nil_surf USING (mention)
),
n_s AS (SELECT mention, COUNT(*) AS n_s FROM surf_docs GROUP BY mention),
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
co AS (
  SELECT s.mention, d.cui, COUNT(*) AS n_co
  FROM surf_docs s JOIN doc_cui d USING (doc_id)
  GROUP BY s.mention, d.cui
)
SELECT co.mention AS surface, co.cui AS CUI, co.n_co,
       CAST(n_s.n_s AS BIGINT) AS n_s,
       (co.n_co * CAST(1000000 AS BIGINT)) // CAST(n_s.n_s AS BIGINT)
         AS conf_ppm
FROM co JOIN n_s USING (mention)
WHERE co.n_co >= {ALIAS_MIN_CO}
  AND (co.n_co * CAST(1000000 AS BIGINT)) // CAST(n_s.n_s AS BIGINT)
        >= {ALIAS_TAU_PPM}
"""


def sql_salt_plan(target: int = SALT_TARGET) -> str:
    return f"""
WITH {_doc_cui_ctes()},
per AS (SELECT cui, COUNT(*) AS n_docs FROM doc_cui GROUP BY cui),
-- SUM(BIGINT) is HUGEINT in DuckDB -> pandas float; cast back so the
-- DIV result stays int64 like Spark's (dtype_audit class)
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM per)
SELECT per.cui AS CUI, per.n_docs,
       (per.n_docs + {target - 1}) // {target} AS salt_factor,
       (per.n_docs * CAST(1000000 AS BIGINT)) // tot.total AS share_ppm
FROM per, tot
"""


def sql_entity_trend() -> str:
    return f"""
WITH {_doc_cui_ctes()},
wk AS (
  SELECT cui, (doc_id % {CRAWL_DAYS}) // 7 AS week
  FROM doc_cui
),
per AS (
  SELECT cui, week, COUNT(*) AS n_docs FROM wk GROUP BY cui, week
),
lagged AS (
  SELECT cui, week, n_docs,
         CASE WHEN lag(week) OVER w = week - 1
              THEN lag(n_docs) OVER w END AS prev_docs
  FROM per
  WINDOW w AS (PARTITION BY cui ORDER BY week)
)
SELECT cui AS CUI, week, n_docs, prev_docs,
       (n_docs * CAST(1000000 AS BIGINT)) // prev_docs AS ratio_ppm,
       CASE WHEN prev_docs IS NULL THEN 'new'
            WHEN n_docs > prev_docs THEN 'rising'
            WHEN n_docs < prev_docs THEN 'falling'
            ELSE 'flat' END AS trend
FROM lagged
"""


def sql_source_diversity() -> str:
    return f"""
WITH {_doc_cui_ctes()},
dcs AS (
  SELECT dc.doc_id, dc.cui, d.source
  FROM doc_cui dc JOIN read_docs d USING (doc_id)
),
per_src AS (
  SELECT a.cui AS subj_cui, b.cui AS obj_cui, a.source, COUNT(*) AS cnt
  FROM dcs a JOIN dcs b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY 1, 2, 3
)
SELECT subj_cui, obj_cui,
       CAST(SUM(cnt) AS BIGINT) AS n_docs,
       COUNT(*) AS n_sources,
       (CAST(SUM(cnt * cnt) AS BIGINT) * CAST(1000000 AS BIGINT))
         // (CAST(SUM(cnt) AS BIGINT) * CAST(SUM(cnt) AS BIGINT))
         AS hhi_ppm
FROM per_src
GROUP BY 1, 2
"""


def sql_stream_kg_mentions_replay() -> str:
    from sparkmedkg.webkg import _MENTION_FROM, sql_aliases_cte

    win_us = KG_STREAM_WIN_DAYS * 86400 * 1_000_000
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
mentions AS (
  SELECT DISTINCT d.doc_id, a.alias AS mention
  FROM {_MENTION_FROM}
),
ts AS (
  SELECT doc_id,
         CAST(DATE '{CRAWL_EPOCH}' + CAST(doc_id % {CRAWL_DAYS} AS INT)
              AS TIMESTAMP) AS crawl_ts
  FROM read_docs
)
SELECT (epoch_us(t.crawl_ts) // {win_us}) * {win_us} AS window_start_us,
       m.mention,
       COUNT(*) AS n_docs
FROM mentions m JOIN ts t USING (doc_id)
GROUP BY 1, 2
"""
