"""KG construction over the driver's generic web-documents corpus.

The driver's testdata ``documents`` table (doc_id, text, lang, source,
n_chars) is the stand-in web corpus for the DuckDB correctness gate.  Since
its vocabulary is generic (not medical), this module carries a deterministic
*web-domain lexicon* with exactly the same shape as the medical ontology
(``sparkmedkg.ontology``): concepts with canonical names/definitions and a
lower-cased alias index, including ambiguous aliases (one surface form ->
two concept ids) so disambiguation + connected components are exercised.

Every function here mirrors a reference operator (file:line cites into
/root/reference) and is paired with an ANSI-SQL oracle builder so the DuckDB
gate can verify the Spark result value-for-value:

- mention detection  = the real ``ner.detect_mentions`` mapInPandas trie in
  ``all`` mode (measured 3-5x faster than the lane-equal JVM HOF matcher
  ``ner.detect_mentions_jvm`` — see BENCH.md "mention-detection lanes");
  oracle = word-boundary LIKE join (entityrecognition.py:43-74)
- linking            = the real ``link.link_mentions`` trigram-cosine scorer;
  oracle = DuckDB list-comprehension trigrams (entityrecognition.py:87-116)
- selection          = top-15 entities x top-4 CUIs (medgen.py:136-163)
- triples            = the 3 corpus-level CONTAINS edge sets (SURVEY.md §1.3)
- intersection       = pairwise reach overlap (neo4jconnector.py:267-316)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkmedkg import link, ner, select

# (concept_id, canonical_name, definition, semtype). Semtypes OPERATOR /
# DATASTRUCT play the DISEASE / CHEMICAL roles of the medical ontology.
WEB_CONCEPTS: list[tuple[str, str, str, str]] = [
    ("W0001", "hash join", "Equi join via build and probe hash table.", "OPERATOR"),
    ("W0002", "sort merge join", "Join of two sorted inputs.", "OPERATOR"),
    ("W0003", "table scan", "Sequential read of a table.", "OPERATOR"),
    ("W0004", "filter", "Row predicate evaluation.", "OPERATOR"),
    ("W0005", "aggregation", "Grouped reduction of rows.", "OPERATOR"),
    ("W0006", "window function", "Per-row computation over a frame.", "OPERATOR"),
    ("W0007", "sort", "Total ordering of rows.", "OPERATOR"),
    ("W0008", "query", "A declarative request for data.", "OPERATOR"),
    ("W0010", "table", "A named relation of rows.", "DATASTRUCT"),
    ("W0011", "row", "A single tuple of a relation.", "DATASTRUCT"),
    ("W0012", "column", "A named attribute vector.", "DATASTRUCT"),
    ("W0013", "hash", "A fixed-size digest of a value.", "DATASTRUCT"),
    ("W0014", "stream", "An unbounded ordered sequence.", "DATASTRUCT"),
    ("W0015", "batch", "A bounded group of rows.", "DATASTRUCT"),
    ("W0016", "partition", "A horizontal slice of data.", "DATASTRUCT"),
    ("W0017", "key", "The identifying attribute of a row.", "DATASTRUCT"),
    ("W0018", "duplicate", "A repeated logical row.", "DATASTRUCT"),
]

# (alias, concept_id). Lower-case surface forms from the corpus vocabulary.
# 'join' and 'order' are AMBIGUOUS (two concepts each) -> exercise
# disambiguation scoring + alias-cluster connected components.
WEB_ALIASES: list[tuple[str, str]] = [
    ("hash join", "W0001"),
    ("join", "W0001"),
    ("join", "W0002"),          # ambiguous
    ("merge", "W0002"),
    ("sort merge", "W0002"),
    ("table scan", "W0003"),
    ("scan", "W0003"),
    ("filter", "W0004"),
    ("agg", "W0005"),
    ("group", "W0005"),
    ("aggregation", "W0005"),
    ("window", "W0006"),
    ("window function", "W0006"),
    ("sort", "W0007"),
    ("order", "W0007"),
    ("order", "W0008"),         # ambiguous
    ("query", "W0008"),
    ("table", "W0010"),
    ("row", "W0011"),
    ("line", "W0011"),
    ("column", "W0012"),
    ("vector", "W0012"),
    ("hash", "W0013"),
    ("stream", "W0014"),
    ("batch", "W0015"),
    ("part", "W0016"),
    ("partition", "W0016"),
    ("key", "W0017"),
    ("dup", "W0018"),
    ("duplicate", "W0018"),
]


# ---------------------------------------------------------------------------
# Spark-side lookup DataFrames (same shapes as fixtures.lookups()).
# ---------------------------------------------------------------------------

def alias_label_pairs() -> list[tuple[str, str]]:
    sem = {c[0]: c[3] for c in WEB_CONCEPTS}
    return sorted({(a, sem[c]) for a, c in WEB_ALIASES})


def alias_bc(spark: SparkSession):
    """Broadcast (alias, label) index straight from the driver-side
    lexicon constants — no Spark job needed to build it."""
    return ner.broadcast_alias_index_local(spark, alias_label_pairs())


def lex_df(spark: SparkSession) -> DataFrame:
    """Lexicon DataFrame for the JVM matcher (ner.detect_mentions_jvm) —
    same (alias, label) contents as ``alias_bc``."""
    return ner.alias_label_df_local(spark, alias_label_pairs())


def concepts_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        WEB_CONCEPTS, "CUI string, canonical_name string, definition string, semtype string"
    )


def aliases_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(WEB_ALIASES, "alias string, CUI string")


def docs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as the docs contract: (url=doc_id, text, lang)."""
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("url"), "text", "lang")
    )


# ---------------------------------------------------------------------------
# Spark queries (each returns a DataFrame matching its oracle builder below).
# ---------------------------------------------------------------------------

# DataFrames persisted by the last q_triples / q_intersection call; released
# on the next call (or explicitly via release_cache) so repeated invocations
# in a long-lived session don't accumulate cached NER blocks.
_CACHED: list[DataFrame] = []


def _track(df: DataFrame) -> DataFrame:
    _release_cache()
    _CACHED.append(df.persist())
    return df


def _release_cache() -> None:
    while _CACHED:
        _CACHED.pop().unpersist()


def release_cache() -> None:
    """Free blocks persisted by the most recent corpus-query invocation."""
    _release_cache()


def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 invariant (parser.py:79-87 / input_hint): wrap each text into an
    html binary payload, run the real pandas-UDF extractor, and return the
    extracted text — the oracle asserts it is byte-identical to the source
    text for every doc."""
    from sparkmedkg import extract

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
            ),
            "utf-8",
        ).alias("html"),
    )
    return extract.with_extracted_text(docs, out_col="text_out").select(
        "doc_id", "text_out"
    )


def sql_extract_text() -> str:
    return "SELECT doc_id, text AS text_out FROM documents"


def q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real mapInPandas trie NER (mode='all') over the web corpus."""
    m = ner.detect_mentions(docs_df(spark, sf_dir), alias_bc(spark), mode="all")
    return m.select(
        F.col("url").cast("bigint").alias("doc_id"),
        "mention",
        F.col("node_label").alias("label"),
    )


def q_mentions_topk(spark: SparkSession, sf_dir: str, n: int = 15) -> DataFrame:
    """A1 (medgen.py:154): top-n OPERATOR mentions by document frequency."""
    m = q_mentions(spark, sf_dir).where(F.col("label") == "OPERATOR")
    return (
        m.groupBy(F.col("mention").alias("text"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("text"))
        .limit(n)
    )


def _links_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    mentions = ner.detect_mentions(docs_df(spark, sf_dir), alias_bc(spark), mode="all")
    return link.link_mentions(mentions, aliases_df(spark), concepts_df(spark))


def q_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4/A2 (entityrecognition.py:87-116): trigram-cosine linking, top-5."""
    return _links_raw(spark, sf_dir).select(
        "source",
        "CUI",
        F.round("kb_score", 6).alias("kb_score"),
        "name",
        "Definition",
    )


def q_selected_cuis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A3 (medgen.py:136-163): top-15 entities x top-4 CUIs > 0.85."""
    mentions = ner.detect_mentions(
        docs_df(spark, sf_dir), alias_bc(spark), mode="all"
    ).where(F.col("node_label") == "OPERATOR")
    links = link.link_mentions(mentions, aliases_df(spark), concepts_df(spark))
    ents = select.top_entities(mentions, n=15, label="OPERATOR")
    return (
        select.top_cuis_per_entity(links, ents, cui_n=4)
        .select("CUI")
        .distinct()
    )


def q_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the 3 corpus-level CONTAINS edge sets as one table
    (SearchTerm->Paper, Paper->mention, mention->CUI; SURVEY.md §1.3)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("lang") == "en"
    )
    d = docs.select(F.col("doc_id").cast("string").alias("url"), "text", "lang")
    # the mapInPandas NER stage feeds three edge sets below — persist so the
    # Python stage runs once, not once per branch (tracked: released on the
    # next corpus-query call)
    mentions = _track(ner.detect_mentions(d, alias_bc(spark), mode="all"))
    links = link.link_mentions(mentions, aliases_df(spark), concepts_df(spark))

    e1 = docs.select(
        F.lit("SearchTerm").alias("src_label"),
        F.col("source").alias("src_id"),
        F.lit("CONTAINS").alias("pred"),
        F.lit("Paper").alias("dst_label"),
        F.col("doc_id").cast("string").alias("dst_id"),
    ).distinct()
    e2 = mentions.select(
        F.lit("Paper").alias("src_label"),
        F.col("url").alias("src_id"),
        F.lit("CONTAINS").alias("pred"),
        F.col("node_label").alias("dst_label"),
        F.col("mention").alias("dst_id"),
    ).distinct()
    mention_labels = mentions.select(
        F.col("mention").alias("_m"), F.col("node_label").alias("_l")
    ).distinct()
    e3 = (
        links.join(mention_labels, links["source"] == F.col("_m"))
        .select(
            F.col("_l").alias("src_label"),
            F.col("source").alias("src_id"),
            F.lit("CONTAINS").alias("pred"),
            F.lit("UMLS").alias("dst_label"),
            F.col("CUI").alias("dst_id"),
        )
        .distinct()
    )
    return e1.unionByName(e2).unionByName(e3)


def q_cooccurrence(
    spark: SparkSession, sf_dir: str, min_docs: int = 2
) -> DataFrame:
    """Relation extraction into canonical (subj_cui, pred, obj_cui) rows
    (north_star triple contract): doc-level CUI co-occurrence with support
    counts. Two linked CUIs co-occurring in >= min_docs documents emit one
    COOCCURS_WITH triple, subj < obj canonical order.

    Scale shape: the per-doc pair fan-out is bounded by the per-doc
    distinct-CUI count (lexicon-bounded, typically <= tens), so the
    self-join on the doc key never approaches |corpus|^2; the pair count is
    a map-side-combinable agg, and hot pairs (two ubiquitous concepts) are
    one grouped row each, not a skewed join key.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("lang") == "en"
    )
    d = docs.select(F.col("doc_id").cast("string").alias("url"), "text", "lang")
    mentions = _track(ner.detect_mentions(d, alias_bc(spark), mode="all"))
    links = link.link_mentions(mentions, aliases_df(spark), concepts_df(spark))
    doc_cui = (
        mentions.select("url", "mention")
        .join(links.select(F.col("source").alias("mention"), "CUI"), "mention")
        .select("url", "CUI")
        .distinct()
    )
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("subj_cui"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("obj_cui"))
    return (
        a.join(b, "u")
        .where(F.col("subj_cui") < F.col("obj_cui"))
        .groupBy("subj_cui", "obj_cui")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select(
            "subj_cui",
            F.lit("COOCCURS_WITH").alias("pred"),
            "obj_cui",
            "n_docs",
        )
    )


def q_salted_mention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 hardening (north_rule skew handling): explicit two-phase salted
    count by mention key. Semantically identical to a plain groupBy-count —
    the oracle proves it — but the partial (salt, key) phase bounds the
    per-task load of hot keys at scale."""
    from sparkmedkg.canon import salted_counts

    m = ner.detect_mentions(docs_df(spark, sf_dir), alias_bc(spark), mode="all")
    return salted_counts(m, "mention").select(
        F.col("mention"), F.col("count").alias("n_rows")
    )


def q_search_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (neo4jconnector.py:258-265): the SearchTerm listing."""
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("lang") == "en")
        .select(F.col("source").alias("search_term"))
        .distinct()
    )


def q_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (neo4jconnector.py:267-316): pairwise |reach(t1) ∩ reach(t2)| at
    the UMLS level (3 hops: term -> doc -> mention -> CUI), via a self-join
    on the reached node rather than collect_set x array_intersect — the
    equivalent join formulation is oracle-friendly and shuffles less."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("lang") == "en"
    )
    d = docs.select(F.col("doc_id").cast("string").alias("url"), "text", "lang")
    mentions = _track(ner.detect_mentions(d, alias_bc(spark), mode="all"))
    links = link.link_mentions(mentions, aliases_df(spark), concepts_df(spark))
    reach = (
        docs.select(F.col("doc_id").cast("string").alias("url"), "source")
        .join(mentions.select("url", "mention"), "url")
        .join(links.select(F.col("source").alias("mention"), "CUI"), "mention")
        .select(F.col("source").alias("term"), F.col("CUI").alias("node"))
        .distinct()
    )
    a = reach.select(F.col("term").alias("e1"), "node")
    b = reach.select(F.col("term").alias("e2"), "node")
    return (
        a.join(b, "node")
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .orderBy("e1", "e2")
    )


# ---------------------------------------------------------------------------
# Oracle SQL builders (DuckDB; lexicon inlined as VALUES).
# ---------------------------------------------------------------------------

def _values(rows: list[tuple], cols: str) -> str:
    def lit(v) -> str:
        return "'" + str(v).replace("'", "''") + "'"

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS t({cols})"


def sql_aliases_cte() -> str:
    distinct_pairs = sorted(set(WEB_ALIASES))
    labeled = []
    sem = {c[0]: c[3] for c in WEB_CONCEPTS}
    for alias, cui in distinct_pairs:
        labeled.append((alias, cui, sem[cui]))
    return (
        "aliases AS (SELECT * FROM "
        + _values(labeled, "alias, cui, label")
        + "),\nconcepts AS (SELECT * FROM "
        + _values(WEB_CONCEPTS, "cui, canonical_name, definition, semtype")
        + ")"
    )


# Word-boundary alias occurrence in a doc (mode='all' trie semantics: the
# corpus has no punctuation, so space padding == token boundaries).
_MENTION_FROM = (
    "read_docs d JOIN (SELECT DISTINCT alias, label FROM aliases) a "
    "ON ' ' || lower(d.text) || ' ' LIKE '% ' || a.alias || ' %'"
)


def sql_mentions() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en')
SELECT DISTINCT d.doc_id AS doc_id, a.alias AS mention, a.label AS label
FROM {_MENTION_FROM}
"""


def sql_mentions_topk(n: int = 15) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
mentions AS (
  SELECT DISTINCT d.doc_id, a.alias AS mention, a.label
  FROM {_MENTION_FROM}
)
SELECT mention AS text, COUNT(*) AS n_docs
FROM mentions WHERE label = 'OPERATOR'
GROUP BY mention
ORDER BY n_docs DESC, text ASC
LIMIT {n}
"""


# DuckDB equivalent of schemas.trigrams: distinct char-3-grams incl. the
# short tail grams, lower-cased.
def _sql_trigrams(expr: str) -> str:
    return (
        f"list_distinct([substring(lower({expr}), i, 3) "
        f"for i in generate_series(1, greatest(length({expr}) - 2, 1))])"
    )


_SQL_LINKS_CTE = """
mentions AS (
  SELECT DISTINCT d.doc_id, a.alias AS mention, a.label
  FROM {mention_from}
),
cands AS (
  SELECT DISTINCT m.mention, a.cui
  FROM (SELECT DISTINCT mention FROM mentions{label_filter}) m
  JOIN aliases a ON m.mention = a.alias
),
scored AS (
  SELECT c.mention, c.cui, k.canonical_name, k.definition,
         CASE WHEN sqrt(len(ga)::DOUBLE * len(gb)::DOUBLE) > 0
              THEN len(list_intersect(ga, gb))::DOUBLE
                   / sqrt(len(ga)::DOUBLE * len(gb)::DOUBLE)
              ELSE 0.0 END AS kb_score
  FROM (SELECT *, {ga} AS ga FROM cands) c
  JOIN (SELECT *, {gb} AS gb FROM concepts) k USING (cui)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY mention
                               ORDER BY kb_score DESC, cui ASC) AS rk
  FROM scored WHERE kb_score >= {threshold}
),
links AS (SELECT * FROM ranked WHERE rk <= 5)
"""


def _links_cte(label_filter: str = "", threshold: float = 0.7) -> str:
    return _SQL_LINKS_CTE.format(
        mention_from=_MENTION_FROM,
        label_filter=label_filter,
        threshold=threshold,
        ga=_sql_trigrams("mention"),
        gb=_sql_trigrams("canonical_name"),
    )


def sql_links() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()}
SELECT mention AS source, cui AS CUI, round(kb_score, 6) AS kb_score,
       canonical_name AS name, coalesce(definition, '') AS "Definition"
FROM links
"""


def sql_selected_cuis() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte(" WHERE label = 'OPERATOR'").lstrip()},
top_ents AS (
  SELECT mention AS text, COUNT(*) AS n_docs
  FROM mentions WHERE label = 'OPERATOR'
  GROUP BY mention
  ORDER BY n_docs DESC, text ASC
  LIMIT 15
),
per_ent AS (
  SELECT l.*, row_number() OVER (PARTITION BY l.mention
                                 ORDER BY l.kb_score DESC, l.cui ASC) AS rk2
  FROM links l JOIN top_ents e ON l.mention = e.text
  WHERE l.kb_score > 0.85
)
SELECT DISTINCT cui AS CUI FROM per_ent WHERE rk2 <= 4
"""


def sql_triples() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()}
SELECT 'SearchTerm' AS src_label, source AS src_id, 'CONTAINS' AS pred,
       'Paper' AS dst_label, doc_id::VARCHAR AS dst_id
FROM read_docs
UNION
SELECT 'Paper', doc_id::VARCHAR, 'CONTAINS', label, mention FROM mentions
UNION
SELECT DISTINCT m.label, l.mention, 'CONTAINS', 'UMLS', l.cui
FROM links l JOIN (SELECT DISTINCT mention, label FROM mentions) m
  ON l.mention = m.mention
"""


def sql_cooccurrence(min_docs: int = 2) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
)
SELECT a.cui AS subj_cui, 'COOCCURS_WITH' AS pred, b.cui AS obj_cui,
       COUNT(*) AS n_docs
FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
GROUP BY a.cui, b.cui
HAVING COUNT(*) >= {min_docs}
"""


def sql_salted_mention_counts() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
mentions AS (
  SELECT DISTINCT d.doc_id, a.alias AS mention, a.label
  FROM {_MENTION_FROM}
)
SELECT mention, COUNT(*) AS n_rows FROM mentions GROUP BY mention
"""


def sql_search_terms() -> str:
    return (
        "SELECT DISTINCT source AS search_term FROM documents WHERE lang = 'en'"
    )


def sql_intersection() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
reach AS (
  SELECT DISTINCT d.source AS term, l.cui AS node
  FROM read_docs d
  JOIN mentions m ON m.doc_id = d.doc_id
  JOIN links l ON l.mention = m.mention
)
SELECT a.term AS e1, b.term AS e2, COUNT(*) AS n_common
FROM reach a JOIN reach b ON a.node = b.node
GROUP BY a.term, b.term
ORDER BY e1, e2
"""


def q_link_ambiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_cands, top1_score, top2_score, margin, ambiguous): the
    linker-confidence report — per mention, its surviving candidate count
    and the score margin between the best and second-best CUI (small
    margin = genuinely ambiguous surface form, the rows a curator
    reviews first).  Built on the same windowed top-5 candidate set as
    q_links: the per-mention window partitions by the subsequent groupBy
    key, so ranking and the conditional aggregate share one exchange.
    Tie order inside the window matches the links CTE (raw score desc,
    CUI asc); emitted scores are rounded AFTER ranking, so rounding can
    never reorder."""
    mentions = ner.detect_mentions(docs_df(spark, sf_dir), alias_bc(spark), mode="all")
    raw = link.link_mentions(
        mentions, aliases_df(spark), concepts_df(spark), threshold=0.0
    )
    w = Window.partitionBy("source").orderBy(
        F.col("kb_score").desc(), F.col("CUI").asc()
    )
    ranked = raw.withColumn("rk", F.row_number().over(w))
    top1 = F.max(F.when(F.col("rk") == 1, F.round("kb_score", 6)))
    top2 = F.max(F.when(F.col("rk") == 2, F.round("kb_score", 6)))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cands"),
            top1.alias("t1"),
            F.coalesce(top2, F.lit(0.0)).alias("t2"),
        )
        .select(
            "source",
            "n_cands",
            F.col("t1").alias("top1_score"),
            F.col("t2").alias("top2_score"),
            F.round(F.col("t1") - F.col("t2"), 6).alias("margin"),
            (F.col("n_cands") > 1).alias("ambiguous"),
        )
    )


def sql_link_ambiguity() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte(threshold=0.0).lstrip()},
agg AS (
  SELECT mention AS source,
         CAST(COUNT(*) AS BIGINT) AS n_cands,
         MAX(CASE WHEN rk = 1 THEN round(kb_score, 6) END) AS t1,
         COALESCE(MAX(CASE WHEN rk = 2 THEN round(kb_score, 6) END), 0.0)
           AS t2
  FROM links GROUP BY mention
)
SELECT source, n_cands, t1 AS top1_score, t2 AS top2_score,
       round(t1 - t2, 6) AS margin, n_cands > 1 AS ambiguous
FROM agg
"""


# ---------------------------------------------------------------------------
# Metapath statistics over the heterogeneous triple graph.
# ---------------------------------------------------------------------------

def q_metapath_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_label, pred_1, mid_label, pred_2, dst_label, n_paths): counts of
    every 2-hop typed path (metapath) through the triple graph — the schema
    profile heterogeneous-graph pipelines (metapath2vec walk design, GNN
    relation sampling) read before choosing which paths to traverse, and a
    drift check on the KG's shape between builds.

    Plan: the triple table is built once (q_triples' cached lineage) and
    self-joined on the typed midpoint (dst_id = src_id AND dst_label =
    src_label) — an equi-join on the id column that AQE broadcast-sizes;
    the rollup is by five low-cardinality label columns, so map-side
    combine collapses it to schema-sized rows before the exchange."""
    tr = q_triples(spark, sf_dir)
    a = tr.select(
        F.col("src_label").alias("src_label"),
        F.col("pred").alias("pred_1"),
        F.col("dst_label").alias("mid_label"),
        F.col("dst_id").alias("mid_id"),
    )
    b = tr.select(
        F.col("src_label").alias("mid_label"),
        F.col("src_id").alias("mid_id"),
        F.col("pred").alias("pred_2"),
        F.col("dst_label").alias("dst_label"),
    )
    return (
        a.join(b, ["mid_label", "mid_id"])
        .groupBy("src_label", "pred_1", "mid_label", "pred_2", "dst_label")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )


def sql_metapath_counts() -> str:
    return f"""
WITH tr AS MATERIALIZED (SELECT * FROM ({sql_triples()}))
SELECT a.src_label, a.pred AS pred_1, a.dst_label AS mid_label,
       b.pred AS pred_2, b.dst_label, COUNT(*) AS n_paths
FROM tr a JOIN tr b
  ON a.dst_id = b.src_id AND a.dst_label = b.src_label
GROUP BY a.src_label, a.pred, a.dst_label, b.pred, b.dst_label
"""


# ---------------------------------------------------------------------------
# Regular path query (SPARQL property-path / Cypher variable-length parity).
# ---------------------------------------------------------------------------

RPQ_PRED = "CONTAINS"
RPQ_SRC_LABEL = "SearchTerm"
RPQ_MAX_HOPS = 3


def q_rpq_reach(
    spark: SparkSession,
    sf_dir: str,
    pred: str = RPQ_PRED,
    src_label: str = RPQ_SRC_LABEL,
    max_hops: int = RPQ_MAX_HOPS,
) -> DataFrame:
    """(src_id, dst_label, dst_id, min_hops): the regular path query
    ``(:SearchTerm)-[:CONTAINS*1..3]->(x)`` — every node reachable from a
    SearchTerm anchor through 1..max_hops edges of the given predicate,
    with the shortest derivation length.  The SPARQL property-path /
    Cypher variable-length-relationship primitive the reference's Neo4j
    backend answers natively; here it's semi-naive BFS over the triple
    table, the same bulk shape a Datalog engine would pick.

    Scale: the frontier — never the closure — joins the persisted
    predicate-filtered edge set each round (rounds = max_hops, a query
    constant); min-hop dedup is a left anti-join against the visited set,
    so each (src, node) pair crosses the exchange once.  Lineage is
    truncated per hop."""
    tr = q_triples(spark, sf_dir).where(F.col("pred") == pred)
    edges = tr.select(
        F.col("src_label").alias("e_sl"),
        F.col("src_id").alias("e_sid"),
        F.col("dst_label").alias("e_dl"),
        F.col("dst_id").alias("e_did"),
    ).persist()
    edges.count()
    visited = (
        edges.where(F.col("e_sl") == src_label)
        .select(
            F.col("e_sid").alias("src_id"),
            F.col("e_dl").alias("dst_label"),
            F.col("e_did").alias("dst_id"),
            F.lit(1).cast("bigint").alias("min_hops"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for k in range(2, max_hops + 1):
        nxt = (
            frontier.join(
                edges,
                (frontier["dst_label"] == edges["e_sl"])
                & (frontier["dst_id"] == edges["e_sid"]),
            )
            .select(
                "src_id",
                F.col("e_dl").alias("dst_label"),
                F.col("e_did").alias("dst_id"),
            )
            .distinct()
            .join(
                visited.select("src_id", "dst_label", "dst_id"),
                ["src_id", "dst_label", "dst_id"],
                "left_anti",
            )
            .withColumn("min_hops", F.lit(k).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        frontier = nxt
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    edges.unpersist()
    return visited


def sql_rpq_reach(
    pred: str = RPQ_PRED,
    src_label: str = RPQ_SRC_LABEL,
    max_hops: int = RPQ_MAX_HOPS,
) -> str:
    steps = []
    for k in range(2, max_hops + 1):
        steps.append(
            f"""r{k} AS MATERIALIZED (
  SELECT src_id, dst_label, dst_id, MIN(min_hops) AS min_hops FROM (
    SELECT src_id, dst_label, dst_id, min_hops FROM r{k - 1}
    UNION ALL
    SELECT p.src_id, e.dst_label, e.dst_id, p.min_hops + 1 AS min_hops
    FROM r{k - 1} p
    JOIN e ON e.src_label = p.dst_label AND e.src_id = p.dst_id
    WHERE p.min_hops = {k - 1}
  ) GROUP BY src_id, dst_label, dst_id
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH tr AS MATERIALIZED (
  SELECT * FROM ({sql_triples()}) WHERE pred = '{pred}'
),
e AS MATERIALIZED (SELECT src_label, src_id, dst_label, dst_id FROM tr),
r1 AS (
  SELECT DISTINCT src_id, dst_label, dst_id, CAST(1 AS BIGINT) AS min_hops
  FROM e WHERE src_label = '{src_label}'
),
{unrolled}
SELECT src_id, dst_label, dst_id, CAST(min_hops AS BIGINT) AS min_hops
FROM r{max_hops}
"""


def q_triple_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_ref, n_sys, n_common, precision_ppm, recall_ppm, meets_north_rule):
    the north_rule's triple-extraction P/R scorecard as a driver-visible
    query — the reference-semantics lane (the mapInPandas trie matcher,
    byte-tested against the reference's span semantics) is the gold triple
    set; the independent JVM higher-order-function lane is the system
    under audit.  P = |common| / |sys|, R = |common| / |ref|, exact
    integer ppm; meets_north_rule asserts both >= 950000 (the P/R >= 0.95
    bar).  Because the two lanes are required to agree exactly (and the
    DuckDB oracle recomputes the same triple set relationally), a green
    row here certifies lane equivalence AND the absolute triple count.

    Plan: each lane builds its triple set once (the shared doc scan is
    persisted); the comparison is one equi-join on the full 5-column key
    plus three scalar counts folded into a single row."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("lang") == "en"
    )
    d = docs.select(F.col("doc_id").cast("string").alias("url"), "text", "lang")

    def triples_of(mentions: DataFrame) -> DataFrame:
        links = link.link_mentions(mentions, aliases_df(spark), concepts_df(spark))
        e1 = docs.select(
            F.lit("SearchTerm").alias("src_label"),
            F.col("source").alias("src_id"),
            F.lit("CONTAINS").alias("pred"),
            F.lit("Paper").alias("dst_label"),
            F.col("doc_id").cast("string").alias("dst_id"),
        ).distinct()
        e2 = mentions.select(
            F.lit("Paper").alias("src_label"),
            F.col("url").alias("src_id"),
            F.lit("CONTAINS").alias("pred"),
            F.col("node_label").alias("dst_label"),
            F.col("mention").alias("dst_id"),
        ).distinct()
        ml = mentions.select(
            F.col("mention").alias("_m"), F.col("node_label").alias("_l")
        ).distinct()
        e3 = (
            links.join(ml, links["source"] == F.col("_m"))
            .select(
                F.col("_l").alias("src_label"),
                F.col("source").alias("src_id"),
                F.lit("CONTAINS").alias("pred"),
                F.lit("UMLS").alias("dst_label"),
                F.col("CUI").alias("dst_id"),
            )
            .distinct()
        )
        return e1.unionByName(e2).unionByName(e3)

    key = ["src_label", "src_id", "pred", "dst_label", "dst_id"]
    ref = _track(triples_of(ner.detect_mentions(d, alias_bc(spark), mode="all")))
    sys_t = triples_of(ner.detect_mentions_jvm(d, lex_df(spark), mode="all"))
    sys_t = sys_t.persist()
    _CACHED.append(sys_t)
    n_ref = ref.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_ref"))
    n_sys = sys_t.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_sys"))
    n_common = (
        ref.join(sys_t, key)
        .groupBy()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        n_ref.crossJoin(F.broadcast(n_sys))
        .crossJoin(F.broadcast(n_common))
        .select(
            "n_ref",
            "n_sys",
            "n_common",
            F.expr("n_common * 1000000 div n_sys").cast("bigint")
            .alias("precision_ppm"),
            F.expr("n_common * 1000000 div n_ref").cast("bigint")
            .alias("recall_ppm"),
            (
                (F.expr("n_common * 1000000 div n_sys") >= 950000)
                & (F.expr("n_common * 1000000 div n_ref") >= 950000)
            ).alias("meets_north_rule"),
        )
    )


def sql_triple_pr() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
triples AS (
  SELECT 'SearchTerm' AS src_label, source AS src_id, 'CONTAINS' AS pred,
         'Paper' AS dst_label, doc_id::VARCHAR AS dst_id
  FROM read_docs
  UNION
  SELECT 'Paper', doc_id::VARCHAR, 'CONTAINS', label, mention FROM mentions
  UNION
  SELECT DISTINCT m.label, l.mention, 'CONTAINS', 'UMLS', l.cui
  FROM links l JOIN (SELECT DISTINCT mention, label FROM mentions) m
    ON l.mention = m.mention
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM triples)
SELECT n AS n_ref, n AS n_sys, n AS n_common,
       CAST(1000000 AS BIGINT) AS precision_ppm,
       CAST(1000000 AS BIGINT) AS recall_ppm,
       TRUE AS meets_north_rule
FROM n
"""


# ---------------------------------------------------------------------------
# Assertion-status / qualifier detection (NegEx-style window triggers).
# ---------------------------------------------------------------------------

#: window-before-mention trigger vocabulary.  In the medical deployment
#: this is the NegEx cue list ("no", "not", "without", "denies", ... —
#: Chapman et al. 2001, the assertion-status pass every clinical NER
#: pipeline runs after span detection); the driver corpus's qualifier
#: vocabulary plays that role here so the oracle-gated query is
#: non-vacuous on the sf tables.  tests/test_round4_ops.py exercises the
#: same operator with real negation cues on the medical fixture corpus.
QUAL_TRIGGERS = ("slow", "fast", "big", "small")
QUAL_WINDOW = 2


def q_mention_qualifiers(
    spark: SparkSession,
    sf_dir: str,
    triggers: tuple = QUAL_TRIGGERS,
    window: int = QUAL_WINDOW,
    lexicon: tuple | None = None,
) -> DataFrame:
    """(mention, qualifier, n_occ): every single-token lexicon mention
    occurrence, grouped by the NEAREST trigger token in the ``window``
    tokens before it ('' when unqualified) — the assertion-status /
    attribute-extraction primitive of KG construction: a mention's edge
    is written with (or suppressed by) its qualifier, so this table is
    what turns raw spans into asserted vs negated vs modified triples.

    Determinism: nearest = max trigger position (positions are distinct
    integers, max_by is tie-free); tokenization is the corpus-wide
    split-on-spaces convention.

    Scale: one token posexplode feeds BOTH sides (mentions filter vs an
    in-lexicon literal set, triggers vs the cue set — each a pushed-down
    IN filter on the same scan); the proximity join is doc-keyed with a
    +-window position band, so fan-out is bounded by cues-per-window,
    never cross-document; the final count is map-side combinable."""
    single = (
        sorted(lexicon)
        if lexicon is not None
        else sorted({a for a, _ in alias_label_pairs() if " " not in a})
    )
    toks = (
        docs_df(spark, sf_dir)
        .where(F.col("lang") == "en")
        .select(
            "url",
            F.posexplode(F.split(F.lower(F.col("text")), " +")).alias(
                "pos", "tok"
            ),
        )
    )
    m = toks.where(F.col("tok").isin(single)).select(
        "url", F.col("pos").alias("mpos"), F.col("tok").alias("mention")
    )
    t = toks.where(F.col("tok").isin(list(triggers))).select(
        F.col("url").alias("t_url"),
        F.col("pos").alias("tpos"),
        F.col("tok").alias("trig"),
    )
    per_occ = (
        m.join(
            t,
            (F.col("url") == F.col("t_url"))
            & (F.col("tpos") >= F.col("mpos") - window)
            & (F.col("tpos") < F.col("mpos")),
            "left",
        )
        .groupBy("url", "mpos", "mention")
        .agg(F.max_by("trig", "tpos").alias("q"))
    )
    return (
        per_occ.groupBy(
            "mention", F.coalesce("q", F.lit("")).alias("qualifier")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )


def sql_mention_qualifiers(
    triggers: tuple = QUAL_TRIGGERS, window: int = QUAL_WINDOW
) -> str:
    single = sorted(
        {a for a, _ in alias_label_pairs() if " " not in a}
    )
    lex = ", ".join(f"'{a}'" for a in single)
    cues = ", ".join(f"'{t}'" for t in triggers)
    return f"""
WITH toks AS (
  SELECT doc_id::VARCHAR AS url, u.pos, u.tok
  FROM (
    SELECT doc_id,
           unnest([{{'pos': i - 1, 'tok': t[i]}}
                   for i in generate_series(1, len(t))]) AS u
    FROM (SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS t
          FROM documents WHERE lang = 'en')
  )
),
m AS (SELECT url, pos AS mpos, tok AS mention FROM toks
      WHERE tok IN ({lex})),
trg AS (SELECT url, pos AS tpos, tok AS trig FROM toks
        WHERE tok IN ({cues})),
per_occ AS (
  SELECT m.url, m.mpos, m.mention, max_by(t.trig, t.tpos) AS q
  FROM m LEFT JOIN trg t
    ON t.url = m.url AND t.tpos >= m.mpos - {window} AND t.tpos < m.mpos
  GROUP BY m.url, m.mpos, m.mention
)
SELECT mention, COALESCE(q, '') AS qualifier,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM per_occ GROUP BY mention, COALESCE(q, '')
"""


#: qualifiers that SUPPRESS an occurrence from the asserted edge build —
#: the NegEx cue subset in the medical deployment ("no evidence of X"
#: must not write an X edge); the corpus's own qualifier vocabulary
#: stands in here.
NEG_QUALIFIERS = ("slow", "small")


def q_asserted_cooccurrence(
    spark: SparkSession,
    sf_dir: str,
    min_docs: int = 2,
    triggers: tuple = QUAL_TRIGGERS,
    neg: tuple = NEG_QUALIFIERS,
    window: int = QUAL_WINDOW,
    lexicon: tuple | None = None,
) -> DataFrame:
    """(e1, e2, n_docs): co-occurrence edges built ONLY from asserted
    mention occurrences — each occurrence's nearest window-before trigger
    is resolved (q_mention_qualifiers' rule) and occurrences whose
    qualifier is in ``neg`` are suppressed before the pair count.  This
    is assertion-aware KG construction end-to-end: a document saying
    "no evidence of X" must not contribute an X edge, so the qualifier
    pass gates the edge build rather than annotating it after the fact.

    Plan: identical to the qualifier table through per-occurrence
    resolution; the kept stream collapses to per-doc DISTINCT mentions
    (bounded by lexicon size) before the doc-keyed pair self-join, so
    pair fan-out is lexicon^2 per doc max — same shape as
    q_cooccurrence, never corpus x corpus."""
    single = (
        sorted(lexicon)
        if lexicon is not None
        else sorted({a for a, _ in alias_label_pairs() if " " not in a})
    )
    toks = (
        docs_df(spark, sf_dir)
        .where(F.col("lang") == "en")
        .select(
            "url",
            F.posexplode(F.split(F.lower(F.col("text")), " +")).alias(
                "pos", "tok"
            ),
        )
    )
    m = toks.where(F.col("tok").isin(single)).select(
        "url", F.col("pos").alias("mpos"), F.col("tok").alias("mention")
    )
    t = toks.where(F.col("tok").isin(list(triggers))).select(
        F.col("url").alias("t_url"),
        F.col("pos").alias("tpos"),
        F.col("tok").alias("trig"),
    )
    per_occ = (
        m.join(
            t,
            (F.col("url") == F.col("t_url"))
            & (F.col("tpos") >= F.col("mpos") - window)
            & (F.col("tpos") < F.col("mpos")),
            "left",
        )
        .groupBy("url", "mpos", "mention")
        .agg(F.max_by("trig", "tpos").alias("q"))
    )
    kept = (
        per_occ.where(
            F.coalesce("q", F.lit("")).isin(list(neg)) == False  # noqa: E712
        )
        .select("url", "mention")
        .distinct()
    )
    a = kept.select("url", F.col("mention").alias("e1"))
    b = kept.select("url", F.col("mention").alias("e2"))
    return (
        a.join(b, "url")
        .where(F.col("e1") < F.col("e2"))
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def sql_asserted_cooccurrence(
    min_docs: int = 2,
    triggers: tuple = QUAL_TRIGGERS,
    neg: tuple = NEG_QUALIFIERS,
    window: int = QUAL_WINDOW,
) -> str:
    single = sorted(
        {a for a, _ in alias_label_pairs() if " " not in a}
    )
    lex = ", ".join(f"'{a}'" for a in single)
    cues = ", ".join(f"'{t}'" for t in triggers)
    negs = ", ".join(f"'{t}'" for t in neg)
    return f"""
WITH toks AS (
  SELECT doc_id::VARCHAR AS url, u.pos, u.tok
  FROM (
    SELECT doc_id,
           unnest([{{'pos': i - 1, 'tok': t[i]}}
                   for i in generate_series(1, len(t))]) AS u
    FROM (SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS t
          FROM documents WHERE lang = 'en')
  )
),
m AS (SELECT url, pos AS mpos, tok AS mention FROM toks
      WHERE tok IN ({lex})),
trg AS (SELECT url, pos AS tpos, tok AS trig FROM toks
        WHERE tok IN ({cues})),
per_occ AS (
  SELECT m.url, m.mpos, m.mention, max_by(t.trig, t.tpos) AS q
  FROM m LEFT JOIN trg t
    ON t.url = m.url AND t.tpos >= m.mpos - {window} AND t.tpos < m.mpos
  GROUP BY m.url, m.mpos, m.mention
),
kept AS (
  SELECT DISTINCT url, mention FROM per_occ
  WHERE COALESCE(q, '') NOT IN ({negs})
)
SELECT a.mention AS e1, b.mention AS e2,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM kept a JOIN kept b ON a.url = b.url AND a.mention < b.mention
GROUP BY 1, 2
HAVING COUNT(*) >= {min_docs}
"""
