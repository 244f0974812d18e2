"""Typed relation extraction + entity salience over the web-corpus KG.

north_star contract: "relation/triple extraction into canonical
(subj_cui, pred, obj_cui) rows".  Two operators beyond doc-level
co-occurrence (webkg.q_cooccurrence):

- **q_relations** — positional typed relation extraction.  Mention
  occurrences are found in token space (posexplode + broadcast alias join:
  the inverted-index formulation of the reference's span matching,
  /root/reference/pymedgraph/dataextraction/entityrecognition.py:43-74),
  then paired with a BOUNDED token-gap **equi-join** (subject-end + gap ==
  object-start), never a per-doc quadratic self-join.  The predicate is
  typed from the (subject semtype, object semtype) pair — the UMLS
  semantic-type predicate-typing analog of disease/drug -> TREATS.

- **q_pagerank** — fixed-iteration PageRank over the co-occurrence edge
  set: entity salience for canonicalization/ranking.  The DuckDB oracle is
  the same iteration unrolled as chained CTEs (same pattern as the
  recursive-CTE oracle for connected components in canon.py).

Scale notes (100 TB / 10^12 docs):
- occurrence extraction is explode + broadcast-hash-join fused into ONE
  whole-stage-codegen stage — no shuffle, no exchange carries the token
  array; the only shuffles in q_relations are the bounded-fanout pair
  equi-join on (doc_id, position) and the final partial-aggregated groupBy.
- the pair join's fan-out per occurrence is exactly max_gap+1 rows
  (the exploded gap sequence), so candidate volume is O(tokens * gap),
  linear in corpus size — a hot mention pair becomes one grouped row, not
  a skewed join key.
- PageRank joins ranks (|V| rows) to edges (|E| rows) on src each
  iteration; edges+degree are persisted once and reused, each iteration's
  ranks are persisted eagerly and the previous unpersisted so lineage stays
  O(1) deep (at real scale swap persist for localCheckpoint every few
  iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import link
from sparkmedkg.webkg import (
    _links_cte,
    aliases_df,
    alias_label_pairs,
    concepts_df,
    sql_aliases_cte,
)

MAX_GAP = 2          # max intervening tokens between subject and object
PR_ITERS = 3         # fixed PageRank iterations (unrolled in the oracle)
PR_DAMPING = 0.85
PR_MIN_DOCS = 2      # co-occurrence support threshold for the edge set

# (subject semtype, object semtype) -> predicate. Mirrors UMLS
# semantic-type pair relation typing (e.g. Disease x Drug -> TREATS).
PRED_BY_PAIR = {
    ("OPERATOR", "DATASTRUCT"): "OPERATES_ON",
    ("DATASTRUCT", "OPERATOR"): "INPUT_TO",
    ("OPERATOR", "OPERATOR"): "COMPOSES_WITH",
    ("DATASTRUCT", "DATASTRUCT"): "RELATED_TO",
}


def _read_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkmedkg.session import widen_scan

    # widen AFTER filter+select so the lang predicate stays pushed to the
    # scan and only surviving rows are redistributed (no-op at scale)
    return widen_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("lang") == "en")
        .select("doc_id", "text")
    )


def _alias_tokens_df(spark: SparkSession) -> DataFrame:
    """(alias, label, toks, n_toks, first_tok) — the broadcastable lexicon."""
    rows = alias_label_pairs()
    return (
        spark.createDataFrame(rows, "alias string, label string")
        .withColumn("toks", F.split("alias", " "))
        .withColumn("n_toks", F.size("toks"))
        .withColumn("first_tok", F.col("toks")[0])
    )


def mention_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, start_idx, end_idx, mention, label) — every word-boundary
    alias occurrence with its 0-based token span.  Semantically the same
    match set as ner.detect_mentions(mode='all') but position-bearing
    (test_relations asserts the distinct (doc, mention) sets are equal)."""
    words = _read_docs(spark, sf_dir).select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    # posexplode keeps ws in scope for the slice check; explode + broadcast
    # join + filter fuse into one codegen stage, so the array never enters
    # an exchange.
    tok = words.select(
        "doc_id", "ws", F.posexplode("ws").alias("idx", "w")
    )
    lex = F.broadcast(_alias_tokens_df(spark))
    return (
        tok.join(lex, tok["w"] == lex["first_tok"])
        .where(F.slice("ws", F.col("idx") + 1, F.col("n_toks")) == F.col("toks"))
        .select(
            "doc_id",
            F.col("idx").alias("start_idx"),
            (F.col("idx") + F.col("n_toks") - 1).alias("end_idx"),
            F.col("alias").alias("mention"),
            "label",
        )
    )


def _best_links(spark: SparkSession, occ: DataFrame) -> DataFrame:
    """mention -> its single best CUI (top-1 trigram-cosine link)."""
    m = occ.select(
        F.col("doc_id").cast("string").alias("url"),
        "mention",
        F.col("mention").alias("resolved"),
        F.col("label").alias("node_label"),
    ).distinct()
    links = link.link_mentions(m, aliases_df(spark), concepts_df(spark), top_k=1)
    return links.select(F.col("source").alias("mention"), "CUI")


def q_relations(
    spark: SparkSession,
    sf_dir: str,
    max_gap: int = MAX_GAP,
    use_cache: bool = True,
) -> DataFrame:
    """Canonical typed triples (subj_cui, pred, obj_cui) with support
    counts: subject occurrence followed by object occurrence within
    ``max_gap`` intervening tokens, predicate from the semtype pair,
    entities resolved to their best-linked CUI.

    The (tiny, schema-bounded) output and its occurrence/link inputs are
    session-memoized via _KG_CACHE — AMIE, the conflict/schema audits and
    the ablation all consume this table, and should pay the extraction
    lineage once per session, not once each.  ``use_cache=False`` builds
    the full declarative plan (what tools/explain_report.py audits —
    identical computation, run once)."""
    from sparkmedkg import webkg

    if use_cache:
        return _kg_cached(
            spark, "rel", (sf_dir, max_gap),
            lambda: q_relations(spark, sf_dir, max_gap, use_cache=False),
        )
    # occ feeds the subject fan-out, the object side, and best-link
    # candidate generation — persist (tracked) so the token-scan join runs
    # once across the three branches.
    occ = webkg._track(mention_occurrences(spark, sf_dir))

    # subject side fans out to its max_gap+1 admissible object start
    # positions -> a pure equi-join on (doc_id, position), bounded fan-out.
    subj = occ.select(
        "doc_id",
        F.col("mention").alias("m1"),
        F.col("label").alias("l1"),
        F.explode(
            F.sequence(F.col("end_idx") + 1, F.col("end_idx") + 1 + max_gap)
        ).alias("tgt"),
    )
    obj = occ.select(
        F.col("doc_id").alias("o_doc"),
        F.col("start_idx").alias("b_start"),
        F.col("mention").alias("m2"),
        F.col("label").alias("l2"),
    )
    pairs = subj.join(
        obj,
        (subj["doc_id"] == obj["o_doc"]) & (subj["tgt"] == obj["b_start"]),
    )

    pred = F.lit(None).cast("string")
    for (l1, l2), p in PRED_BY_PAIR.items():
        pred = F.when(
            (F.col("l1") == l1) & (F.col("l2") == l2), F.lit(p)
        ).otherwise(pred)

    bl = _best_links(spark, occ)
    s = bl.select(F.col("mention").alias("m1"), F.col("CUI").alias("subj_cui"))
    o = bl.select(F.col("mention").alias("m2"), F.col("CUI").alias("obj_cui"))
    return (
        pairs.withColumn("pred", pred)
        .join(F.broadcast(s), "m1")
        .join(F.broadcast(o), "m2")
        .where(F.col("subj_cui") != F.col("obj_cui"))
        .groupBy("subj_cui", "pred", "obj_cui")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
    )


def sql_relations(max_gap: int = MAX_GAP) -> str:
    cases = "\n         ".join(
        f"WHEN a.label = '{l1}' AND b.label = '{l2}' THEN '{p}'"
        for (l1, l2), p in PRED_BY_PAIR.items()
    )
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
best_links AS (SELECT mention, cui FROM links WHERE rk = 1),
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM read_docs),
alias_toks AS (
  SELECT alias, label, string_split(alias, ' ') AS ts,
         len(string_split(alias, ' ')) AS n
  FROM (SELECT DISTINCT alias, label FROM aliases)
),
pos AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM toks
),
occ AS (
  SELECT p.doc_id, p.i - 1 AS start_idx, p.i - 2 + a.n AS end_idx,
         a.alias AS mention, a.label
  FROM pos p
  JOIN alias_toks a
    ON p.ws[p.i] = a.ts[1] AND list_slice(p.ws, p.i, p.i + a.n - 1) = a.ts
)
SELECT s.cui AS subj_cui,
       CASE {cases} END AS pred,
       o.cui AS obj_cui,
       COUNT(DISTINCT a.doc_id) AS n_docs,
       COUNT(*) AS n_occ
FROM occ a
JOIN occ b ON a.doc_id = b.doc_id
          AND b.start_idx - a.end_idx BETWEEN 1 AND {max_gap + 1}
JOIN best_links s ON a.mention = s.mention
JOIN best_links o ON b.mention = o.mention
WHERE s.cui <> o.cui
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration) over the co-occurrence graph.
# ---------------------------------------------------------------------------

def _doc_cui(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (url, CUI) linked-mention incidence — the shared input of
    the co-occurrence edge builder and the PMI scorer.  Persisted via
    webkg._track: the Python NER stage feeds both sides of the pair
    self-join AND the count/edge fan-out downstream, so it must run once,
    not once per branch (released on the next corpus-query call)."""
    from sparkmedkg import ner, webkg
    from sparkmedkg.webkg import alias_bc, docs_df

    d = docs_df(spark, sf_dir).where(F.col("lang") == "en")
    mentions = ner.detect_mentions(d, alias_bc(spark), mode="all")
    links = link.link_mentions(mentions, aliases_df(spark), concepts_df(spark))
    return webkg._track(
        mentions.select("url", "mention")
        .join(links.select(F.col("source").alias("mention"), "CUI"), "mention")
        .select("url", "CUI")
        .distinct()
    )


#: Session-scoped materialized edge sets.  The co-occurrence graph is the
#: shared input of a dozen analytics queries (PageRank, Katz, closeness,
#: betweenness, SimRank, truss, modularity, walks, ...), each of which
#: would otherwise replay the full NER -> link -> pair-join lineage just
#: to rebuild the same few-hundred-row edge list.  Materialize it once per
#: (session, sf_dir, min_docs) — a materialized view, exactly the persist
#: strategy the individual algorithms already apply per query.  Keyed by
#: applicationId so a cached plan can never outlive its SparkContext;
#: post-aggregation edge lists are node-pair-sized (far below the corpus),
#: so a session's worth of entries is trivially bounded (cleared at 8).
_EDGE_CACHE: dict[tuple, DataFrame] = {}


#: Session-scoped materialized KG-extraction intermediates, the same
#: materialized-view strategy as _EDGE_CACHE: a dozen KG-construction
#: queries (relations, AMIE, conflict resolution, truth discovery,
#: salience, pattern mining, ablation) share the occurrence scan, the
#: best-link table, the support-counted fact table and the source-claims
#: set — all post-aggregation, orders of magnitude below the corpus, so
#: checkpointing them once per (session, sf_dir[, gap]) trades a few MB
#: of executor storage for not replaying the NER -> link lineage per
#: query.  Keyed by applicationId so a cached plan can't outlive its
#: SparkContext; cleared at 32 entries.
_KG_CACHE: dict[tuple, DataFrame] = {}


def _kg_cached(
    spark: SparkSession, tag: str, extra: tuple, builder,
    checkpoint: bool = True,
):
    key = (spark.sparkContext.applicationId, tag) + extra
    hit = _KG_CACHE.get(key)
    if hit is not None:
        return hit
    out = builder()
    if checkpoint:
        out = out.localCheckpoint(eager=True)
    if len(_KG_CACHE) >= 32:
        _KG_CACHE.clear()
    _KG_CACHE[key] = out
    return out


def occ_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mention_occurrences, checkpointed once per session+sf_dir."""
    return _kg_cached(
        spark, "occ", (sf_dir,), lambda: mention_occurrences(spark, sf_dir)
    )


def best_links_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_best_links over the cached occurrence set, checkpointed."""
    return _kg_cached(
        spark, "bl", (sf_dir,),
        lambda: _best_links(spark, occ_cached(spark, sf_dir)),
    )


def doc_cui_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_doc_cui, checkpointed once per session+sf_dir — shared by the
    edge builder and PathSim so the NER -> link lineage behind the
    incidence table is paid once per session, not per query."""
    return _kg_cached(
        spark, "dc", (sf_dir,), lambda: _doc_cui(spark, sf_dir)
    )


def _cooccur_edges(
    spark: SparkSession, sf_dir: str, min_docs: int
) -> DataFrame:
    """Symmetric (src, dst) edge list from doc-level CUI co-occurrence with
    support >= min_docs (same pair definition as webkg.q_cooccurrence),
    materialized once per session via `_EDGE_CACHE`."""
    key = (spark.sparkContext.applicationId, sf_dir, min_docs)
    hit = _EDGE_CACHE.get(key)
    if hit is not None:
        return hit
    doc_cui = doc_cui_cached(spark, sf_dir)
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("x"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("y"))
    und = (
        a.join(b, "u")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("x", "y")
    )
    sym = und.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionByName(
        und.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    out = sym.localCheckpoint(eager=True)
    if len(_EDGE_CACHE) >= 8:
        _EDGE_CACHE.clear()
    _EDGE_CACHE[key] = out
    return out


def q_pagerank(
    spark: SparkSession,
    sf_dir: str,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, pagerank) after ``iters`` synchronous iterations, damping
    ``damping``, uniform init 1/N.  The graph is symmetric, so there are no
    dangling nodes and rank mass is conserved (test asserts sum == 1)."""
    edges = _cooccur_edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    # edges+degree reused every iteration: persist once.
    ed = edges.join(deg, "src").persist()
    nodes = ed.select(F.col("src").alias("CUI")).distinct().persist()
    n = nodes.count()  # one scalar action, mirrors the oracle's subquery

    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for i in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["CUI"])
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes["CUI"] == contrib["dst"], "left"
        ).select(
            "CUI",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
        # few fixed iterations -> one terminal action runs the whole DAG
        # (ed/nodes cached, reused each round). For deep iteration counts
        # at real scale, truncate lineage every ~5 rounds instead:
        if (i + 1) % 5 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    # eager-materialize the (|V|-row) result so ed/nodes can be released
    # before returning the lazy handle to the caller.
    out = ranks.select("CUI", F.round("pr", 6).alias("pagerank")).localCheckpoint(
        eager=True
    )
    ed.unpersist()
    nodes.unpersist()
    return out


def sql_cooccur_edges_cte(min_docs: int = PR_MIN_DOCS) -> str:
    """WITH-body prefix (aliases .. edges) building the symmetric
    co-occurrence edge list — shared by every graph-analytics oracle
    (pagerank here, plus graphalgo.py's BFS / label propagation / degree /
    neighbor-Jaccard) so all of them provably run on the same graph."""
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
edges AS (SELECT x AS src, y AS dst FROM und
          UNION ALL SELECT y, x FROM und)"""


def sql_pagerank(
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""r{k} AS (
  SELECT n.cui,
         (1 - {damping}) / (SELECT n FROM nn)
         + {damping} * COALESCE(c.s, 0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS cui, SUM(p.pr / dg.deg) AS s
    FROM edges e JOIN r{k - 1} p ON e.src = p.cui
                 JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON n.cui = c.cui
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS cui FROM edges),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
r0 AS (SELECT cui, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
{unrolled}
SELECT cui AS CUI, round(pr, 6) AS pagerank FROM r{iters}
"""


# ---------------------------------------------------------------------------
# PMI association scoring for co-occurring entity pairs.
# ---------------------------------------------------------------------------

def q_pmi_edges(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(src, dst, n_ab, n_a, n_b, pmi): pointwise mutual information
    ln(P(a,b) / (P(a)P(b))) = ln(n_ab * N / (n_a * n_b)) over doc-level
    co-occurrence, one row per unordered pair (src < dst) with support
    >= min_docs.  PMI separates genuinely associated concept pairs from
    pairs that co-occur only because both are frequent — the standard
    edge-weighting step before thresholding a co-occurrence KG.

    Plan: the (url, CUI) incidence is persisted once and feeds (a) the
    pair self-join on url (bounded per-doc fan-out, same shape as
    q_cooccurrence), (b) the per-CUI marginal counts, and (c) the scalar
    N.  Marginals are lexicon-bounded (|concepts| rows) so both joins onto
    the pair set are explicit broadcasts — the only real shuffle is the
    pair groupBy."""
    doc_cui = doc_cui_cached(spark, sf_dir)
    n_docs = doc_cui.select("url").distinct().count()
    marg = doc_cui.groupBy("CUI").agg(F.count(F.lit(1)).alias("n_c"))
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("src"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("dst"))
    pairs = (
        a.join(b, "u")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_docs)
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("CUI").alias("src"), F.col("n_c").alias("n_a"))),
            "src",
        )
        .join(
            F.broadcast(marg.select(F.col("CUI").alias("dst"), F.col("n_c").alias("n_b"))),
            "dst",
        )
        .select(
            "src",
            "dst",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.lit(float(n_docs))
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def sql_pmi_edges(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
nd AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM doc_cui),
marg AS (SELECT cui, COUNT(*) AS n_c FROM doc_cui GROUP BY cui),
pairs AS (
  SELECT a.cui AS src, b.cui AS dst, COUNT(*) AS n_ab
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY a.cui, b.cui
  HAVING COUNT(*) >= {min_docs}
)
SELECT p.src, p.dst, p.n_ab, ma.n_c AS n_a, mb.n_c AS n_b,
       round(ln(p.n_ab::DOUBLE * (SELECT n FROM nd)
                / (ma.n_c::DOUBLE * mb.n_c::DOUBLE)), 6) AS pmi
FROM pairs p JOIN marg ma ON ma.cui = p.src
             JOIN marg mb ON mb.cui = p.dst
"""


# ---------------------------------------------------------------------------
# Personalized PageRank (random walk with restart) from a seed entity.
# ---------------------------------------------------------------------------

PPR_ITERS = 3
PPR_ALPHA = 0.15  # restart probability


def q_ppr(
    spark: SparkSession,
    sf_dir: str,
    iters: int = PPR_ITERS,
    alpha: float = PPR_ALPHA,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, ppr) after ``iters`` random-walk-with-restart rounds from the
    deterministic seed (smallest CUI): p <- alpha*e_seed + (1-alpha)*W p.
    The KG-proximity score behind 'related entities' panels — unlike
    global PageRank it ranks nodes BY RELEVANCE TO the seed.

    Same persisted-edges iteration shape as q_pagerank; the seed indicator
    is a 1-row broadcast join (no collect), restart mass is added as a
    column expression.  Rank mass is conserved (symmetric graph, no
    dangling nodes), which the test asserts."""
    edges = _cooccur_edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ed = edges.join(deg, "src").persist()
    nodes = ed.select(F.col("src").alias("CUI")).distinct().persist()
    seed = nodes.agg(F.min("CUI").alias("seed_cui"))
    is_seed = F.when(F.col("seed_cui").isNotNull(), 1.0).otherwise(0.0)
    base = nodes.join(
        F.broadcast(seed), nodes["CUI"] == F.col("seed_cui"), "left"
    ).select("CUI", is_seed.alias("e"))
    ranks = base.select("CUI", F.col("e").alias("pr"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["CUI"])
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = base.join(
            contrib, base["CUI"] == contrib["dst"], "left"
        ).select(
            "CUI",
            (
                F.lit(alpha) * F.col("e")
                + F.lit(1.0 - alpha) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
    out = ranks.select("CUI", F.round("pr", 6).alias("ppr")).localCheckpoint(
        eager=True
    )
    ed.unpersist()
    nodes.unpersist()
    return out


def sql_ppr(
    iters: int = PPR_ITERS,
    alpha: float = PPR_ALPHA,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""r{k} AS (
  SELECT n.cui,
         {alpha} * (CASE WHEN n.cui = (SELECT s FROM seed) THEN 1.0 ELSE 0.0 END)
         + {1.0 - alpha} * COALESCE(c.s, 0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS cui, SUM(p.pr / dg.deg) AS s
    FROM edges e JOIN r{k - 1} p ON e.src = p.cui
                 JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON n.cui = c.cui
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS cui FROM edges),
seed AS (SELECT MIN(cui) AS s FROM nodes),
r0 AS (SELECT cui, CASE WHEN cui = (SELECT s FROM seed) THEN 1.0 ELSE 0.0 END
         AS pr FROM nodes),
{unrolled}
SELECT cui AS CUI, round(pr, 6) AS ppr FROM r{iters}
"""


# ---------------------------------------------------------------------------
# Mention context-window extraction (distant-supervision training data).
# ---------------------------------------------------------------------------

CTX_W = 3  # tokens of context each side


def q_mention_contexts(
    spark: SparkSession, sf_dir: str, w: int = CTX_W
) -> DataFrame:
    """(doc_id, start_idx, mention, label, context): every positional
    mention occurrence with its +/-``w``-token context window — the rows a
    distant-supervision relation-extraction trainer consumes.

    Same single-codegen-stage occurrence machinery as
    ``mention_occurrences`` (posexplode + broadcast alias join + slice
    verify), but the token array stays in flight so the context slice is
    a free projection — no join back against the corpus."""
    words = _read_docs(spark, sf_dir).select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    tok = words.select("doc_id", "ws", F.posexplode("ws").alias("idx", "wd"))
    lex = F.broadcast(_alias_tokens_df(spark))
    occ = tok.join(lex, tok["wd"] == lex["first_tok"]).where(
        F.slice("ws", F.col("idx") + 1, F.col("n_toks")) == F.col("toks")
    )
    lo = F.greatest(F.col("idx") + 1 - w, F.lit(1))
    hi_end = F.col("idx") + F.col("n_toks")  # 1-based end token
    length = F.least(hi_end + w, F.size("ws")) - lo + 1
    return occ.select(
        "doc_id",
        F.col("idx").alias("start_idx"),
        F.col("alias").alias("mention"),
        "label",
        F.concat_ws(" ", F.slice("ws", lo, length)).alias("context"),
    )


def sql_mention_contexts(w: int = CTX_W) -> str:
    from sparkmedkg.webkg import sql_aliases_cte

    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM read_docs),
alias_toks AS (
  SELECT alias, label, string_split(alias, ' ') AS ts,
         len(string_split(alias, ' ')) AS n
  FROM (SELECT DISTINCT alias, label FROM aliases)
),
pos AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM toks
)
SELECT p.doc_id, p.i - 1 AS start_idx, a.alias AS mention, a.label,
       array_to_string(
         list_slice(p.ws, greatest(p.i - {w}, 1),
                    least(p.i + a.n - 1 + {w}, len(p.ws))), ' ') AS context
FROM pos p
JOIN alias_toks a
  ON p.ws[p.i] = a.ts[1] AND list_slice(p.ws, p.i, p.i + a.n - 1) = a.ts
"""


# ---------------------------------------------------------------------------
# Negative sampling for KG-embedding training (TransE-style corruption).
# ---------------------------------------------------------------------------

NEG_K = 2


def q_negative_triples(
    spark: SparkSession, sf_dir: str, k: int = NEG_K, max_gap: int = MAX_GAP
) -> DataFrame:
    """Session-memoized negatives substrate: the four KGE ranking lanes
    (TransE/DistMult/ComplEx/RotatE) and the scorecard/classification
    queries all consume the SAME filtered corruption set, so it joins the
    occ/doc_cui materialized views in _KG_CACHE keyed by
    (sf_dir, k, max_gap) — kg_kge_scorecard stops rebuilding the
    positives + vocab four times (VERDICT r4 task 3).  The builder already
    ends in an eager localCheckpoint, so the cache stores it as-is."""
    return _kg_cached(
        spark, "neg", (sf_dir, k, max_gap),
        lambda: _build_negative_triples(spark, sf_dir, k, max_gap),
        checkpoint=False,
    )


def _build_negative_triples(
    spark: SparkSession, sf_dir: str, k: int = NEG_K, max_gap: int = MAX_GAP
) -> DataFrame:
    """(subj_cui, pred, obj_cui, neg_idx, neg_obj_cui): each positive
    extracted triple paired with ``k`` deterministic tail-corruption
    negatives — the contrastive rows a TransE/DistMult-style KG-embedding
    trainer consumes.  The corrupted tail is picked by md5-hash index into
    the sorted entity vocabulary (engine-portable, replayable across
    retries); corruptions that collide with the true tail or with ANY
    positive triple are filtered (the standard 'filtered setting').

    Scale: the entity vocabulary is lexicon-bounded (UMLS ~4M CUIs — a few
    hundred MB sorted array, broadcastable); the positive set joins as a
    broadcast anti-join.  The corpus-scale work stays in the one relation
    extraction pass."""
    pos = q_relations(spark, sf_dir, max_gap=max_gap).select(
        "subj_cui", "pred", "obj_cui"
    ).persist()
    vocab = (
        pos.select(F.col("subj_cui").alias("c"))
        .union(pos.select("obj_cui"))
        .distinct()
        .agg(F.array_sort(F.collect_set("c")).alias("vocab"))
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", "subj_cui", "pred", "obj_cui", F.col("neg_idx")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    cand = (
        pos.crossJoin(F.broadcast(vocab))
        .select(
            "subj_cui",
            "pred",
            "obj_cui",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx"),
            F.col("vocab"),
        )
        .select(
            "subj_cui",
            "pred",
            "obj_cui",
            "neg_idx",
            F.element_at("vocab", (h % F.size("vocab") + 1).cast("int")).alias(
                "neg_obj_cui"
            ),
        )
        .where(F.col("neg_obj_cui") != F.col("obj_cui"))
    )
    out = cand.join(
        pos.select(
            "subj_cui", "pred", F.col("obj_cui").alias("neg_obj_cui")
        ),
        ["subj_cui", "pred", "neg_obj_cui"],
        "left_anti",
    ).localCheckpoint(eager=True)
    pos.unpersist()
    return out


def sql_negative_triples(k: int = NEG_K, max_gap: int = MAX_GAP) -> str:
    return f"""
WITH pos AS (
  SELECT subj_cui, pred, obj_cui FROM ({sql_relations(max_gap)}) r
),
vocab AS (
  SELECT list_sort(list(DISTINCT c)) AS v
  FROM (SELECT subj_cui AS c FROM pos UNION SELECT obj_cui FROM pos)
),
cand AS (
  SELECT p.subj_cui, p.pred, p.obj_cui, i.neg_idx,
         v.v[(CAST('0x' || substring(
                md5(p.subj_cui || '|' || p.pred || '|' || p.obj_cui
                    || '|' || i.neg_idx), 1, 15) AS BIGINT)
              % len(v.v)) + 1] AS neg_obj_cui
  FROM pos p
  CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS neg_idx) i
  CROSS JOIN vocab v
)
SELECT c.subj_cui, c.pred, c.obj_cui, c.neg_idx, c.neg_obj_cui
FROM cand c
WHERE c.neg_obj_cui <> c.obj_cui
  AND NOT EXISTS (
    SELECT 1 FROM pos q
    WHERE q.subj_cui = c.subj_cui AND q.pred = c.pred
      AND q.obj_cui = c.neg_obj_cui
  )
"""


# ---------------------------------------------------------------------------
# Two-hop motif paths: the KG pattern-match primitive.
# ---------------------------------------------------------------------------

MOTIF_MID_CAP = 4096


def q_motif_paths(
    spark: SparkSession,
    sf_dir: str,
    max_gap: int = MAX_GAP,
    mid_cap: int = MOTIF_MID_CAP,
) -> DataFrame:
    """(subj_cui, pred1, mid_cui, pred2, obj_cui, support): every two-hop
    typed path (a)-[p1]->(b)-[p2]->(c) with a != c over the canonical
    triple table — the Cypher ``(a)-[]->(b)-[]->(c)`` pattern match the
    reference's fixed /intersection endpoint cannot express
    (/root/reference/pymedgraph/graph/neo4jconnector.py:267-316), and the
    first query a KG consumer runs (drug -> disease -> gene inference
    chains).  ``support`` = least of the two hops' document support.

    Scale shape: the self-join key is the MID node, so both sides
    co-partition on one shuffle key; the quadratic hazard is a hub mid
    (fan-out = in_deg(b) * out_deg(b)), bounded here by an explicit
    degree-product cap computed from two map-side-combinable degree
    counts — the same hub discipline as dedup_containment's hot-shingle
    cap (the default bounds per-key join work at 4096 rows; the fixture
    graph stays well under it at every SF, while a web-scale hub — a
    ubiquitous CUI with 10^5 in- and out-triples — is excluded).  At web scale the capped mids are the skew you'd otherwise salt;
    excluding (and logging) them keeps per-key join work <= mid_cap."""
    from sparkmedkg import webkg

    rel = webkg._track(q_relations(spark, sf_dir, max_gap))
    ind = rel.groupBy(F.col("obj_cui").alias("mid")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    outd = rel.groupBy(F.col("subj_cui").alias("mid")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ok_mid = (
        ind.join(outd, "mid")
        .where(F.col("in_deg") * F.col("out_deg") <= mid_cap)
        .select("mid")
    )
    a = rel.select(
        "subj_cui",
        F.col("pred").alias("pred1"),
        F.col("obj_cui").alias("mid"),
        F.col("n_docs").alias("nd1"),
    )
    b = rel.select(
        F.col("subj_cui").alias("mid"),
        F.col("pred").alias("pred2"),
        "obj_cui",
        F.col("n_docs").alias("nd2"),
    )
    return (
        a.join(ok_mid, "mid", "left_semi")
        .join(b, "mid")
        .where(F.col("subj_cui") != F.col("obj_cui"))
        .select(
            "subj_cui",
            "pred1",
            F.col("mid").alias("mid_cui"),
            "pred2",
            "obj_cui",
            F.least("nd1", "nd2").alias("support"),
        )
    )


def sql_motif_paths(
    max_gap: int = MAX_GAP, mid_cap: int = MOTIF_MID_CAP
) -> str:
    return f"""
WITH rel AS ({sql_relations(max_gap)}),
ind AS (SELECT obj_cui AS mid, COUNT(*) AS in_deg FROM rel GROUP BY 1),
outd AS (SELECT subj_cui AS mid, COUNT(*) AS out_deg FROM rel GROUP BY 1),
ok AS (
  SELECT mid FROM ind JOIN outd USING (mid)
  WHERE in_deg * out_deg <= {mid_cap}
)
SELECT a.subj_cui, a.pred AS pred1, a.obj_cui AS mid_cui,
       b.pred AS pred2, b.obj_cui,
       CAST(LEAST(a.n_docs, b.n_docs) AS BIGINT) AS support
FROM rel a
JOIN ok ON a.obj_cui = ok.mid
JOIN rel b ON b.subj_cui = a.obj_cui
WHERE a.subj_cui <> b.obj_cui
"""


# ---------------------------------------------------------------------------
# Temporal edge history (snapshot validity intervals).
# ---------------------------------------------------------------------------

KG_N_SNAPSHOTS = 4   # synthetic crawl snapshots: snap = doc_id % 4


def q_edge_history(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(src, dst, n_docs, first_seen, last_seen, n_snaps): the temporal-KG
    view of the co-occurrence edge set — each edge annotated with the first
    and last crawl snapshot it was observed in and how many distinct
    snapshots support it.  In production snap comes from the page's
    warc_ts; the synthetic convention is doc_id % KG_N_SNAPSHOTS (the same
    scheme snapshot_diff uses).  An as-of query is then a plain filter
    (first_seen <= t), and edge churn between crawls is last_seen < t —
    the provenance dimension the reference's one-shot Neo4j load discards.

    Plan: the pair self-join is the SAME one the static edge builder runs
    (doc-keyed equi-join); the snapshot annotations ride the existing
    groupBy(x, y) as three extra partial aggregates — temporal lineage
    costs zero additional shuffles over the static graph build."""
    doc_cui = doc_cui_cached(spark, sf_dir)
    snap = (F.col("url").cast("bigint") % KG_N_SNAPSHOTS).alias("snap")
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("x"), snap)
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("y"))
    return (
        a.join(b, "u")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("snap").alias("first_seen"),
            F.max("snap").alias("last_seen"),
            F.countDistinct("snap").alias("n_snaps"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            F.col("x").alias("src"), F.col("y").alias("dst"),
            "n_docs", "first_seen", "last_seen", "n_snaps",
        )
    )


def sql_edge_history(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
pairs AS (
  SELECT a.cui AS x, b.cui AS y, a.doc_id % {KG_N_SNAPSHOTS} AS snap
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
)
SELECT x AS src, y AS dst, COUNT(*) AS n_docs,
       MIN(snap) AS first_seen, MAX(snap) AS last_seen,
       COUNT(DISTINCT snap) AS n_snaps
FROM pairs GROUP BY x, y HAVING COUNT(*) >= {min_docs}
"""


# ---------------------------------------------------------------------------
# Triple provenance (supporting-document lineage per edge).
# ---------------------------------------------------------------------------

PROV_MAX_DOCS = 8


def q_edge_provenance(
    spark: SparkSession,
    sf_dir: str,
    min_docs: int = PR_MIN_DOCS,
    max_docs: int = PROV_MAX_DOCS,
) -> DataFrame:
    """(src, dst, n_docs, doc_ids): each co-occurrence edge with the sorted
    ids of (up to ``max_docs``) documents that attest it — the provenance
    a production KG stores next to every triple so a curator can answer
    'WHY does this edge exist?' with source pages, and the audit trail
    regulations demand of medical KGs.  The cap keeps hot edges (attested
    by millions of pages at web scale) storage-bounded; n_docs remains the
    exact count.

    Plan: the SAME doc-keyed pair join as the static edge build; the
    provenance array rides the existing groupBy as a slice(sort(collect))
    aggregate — exact count + capped exemplars, zero extra shuffles."""
    doc_cui = doc_cui_cached(spark, sf_dir)
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("x"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("y"))
    return (
        a.join(b, "u")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # Serialized as a canonical comma-joined string (not array<bigint>)
            # so the result schema stays scalar-only — downstream hashers and
            # cross-engine comparators treat list cells as unhashable.
            F.array_join(
                F.slice(
                    F.sort_array(F.collect_list(F.col("u").cast("bigint"))),
                    1,
                    max_docs,
                ).cast("array<string>"),
                ",",
            ).alias("doc_ids"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            F.col("x").alias("src"), F.col("y").alias("dst"),
            "n_docs", "doc_ids",
        )
    )


def sql_edge_provenance(
    min_docs: int = PR_MIN_DOCS, max_docs: int = PROV_MAX_DOCS
) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
pairs AS (
  SELECT a.cui AS x, b.cui AS y, a.doc_id
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
)
SELECT x AS src, y AS dst, COUNT(*) AS n_docs,
       array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, {max_docs}), ',') AS doc_ids
FROM pairs GROUP BY x, y HAVING COUNT(*) >= {min_docs}
"""


# ---------------------------------------------------------------------------
# Collocation significance scores (chi-square + t-score edge weighting).
# ---------------------------------------------------------------------------

def q_collocation_scores(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(src, dst, n_ab, chi2, t_score): the two classic collocation
    significance tests beside PMI (q_pmi_edges) — Pearson chi-square over
    the 2x2 co-occurrence contingency table and the t-score against the
    independence expectation.  PMI over-rewards rare pairs; chi-square and
    t-score penalize low support, so a production edge-weighting pipeline
    thresholds on a combination (Manning & Schutze's collocation chapter).

    Determinism: both statistics are single closed-form double expressions
    over the exact BIGINT counts (n_ab, n_a, n_b, N) — no accumulation,
    rounded at emit.  Plan: identical to q_pmi_edges (one pair groupBy,
    broadcast marginals); the contingency cells derive from the same four
    integers row-locally."""
    doc_cui = doc_cui_cached(spark, sf_dir)
    n_docs = doc_cui.select("url").distinct().count()
    marg = doc_cui.groupBy("CUI").agg(F.count(F.lit(1)).alias("n_c"))
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("src"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("dst"))
    pairs = (
        a.join(b, "u")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_docs)
    )
    N = F.lit(float(n_docs))
    o11 = F.col("n_ab").cast("double")
    o12 = (F.col("n_a") - F.col("n_ab")).cast("double")
    o21 = (F.col("n_b") - F.col("n_ab")).cast("double")
    o22 = N - F.col("n_a") - F.col("n_b") + F.col("n_ab")
    # chi2 = N (o11 o22 - o12 o21)^2 / (n_a n_b (N-n_a) (N-n_b))
    chi2 = (
        N
        * (o11 * o22 - o12 * o21)
        * (o11 * o22 - o12 * o21)
        / (
            F.col("n_a")
            * F.col("n_b")
            * (N - F.col("n_a"))
            * (N - F.col("n_b"))
        )
    )
    expected = F.col("n_a") * F.col("n_b") / N
    t = (o11 - expected) / F.sqrt(o11)
    return (
        pairs.join(
            F.broadcast(
                marg.select(F.col("CUI").alias("src"), F.col("n_c").alias("n_a"))
            ),
            "src",
        )
        .join(
            F.broadcast(
                marg.select(F.col("CUI").alias("dst"), F.col("n_c").alias("n_b"))
            ),
            "dst",
        )
        .select(
            "src",
            "dst",
            "n_ab",
            F.round(chi2, 6).alias("chi2"),
            F.round(t, 6).alias("t_score"),
        )
    )


def sql_collocation_scores(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
nn AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM doc_cui),
marg AS (SELECT cui, COUNT(*) AS n_c FROM doc_cui GROUP BY cui),
pairs AS (
  SELECT a.cui AS src, b.cui AS dst, COUNT(*) AS n_ab
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY a.cui, b.cui HAVING COUNT(*) >= {min_docs}
),
j AS (
  SELECT p.src, p.dst, p.n_ab, ma.n_c AS n_a, mb.n_c AS n_b, nn.n AS N
  FROM pairs p JOIN marg ma ON p.src = ma.cui
               JOIN marg mb ON p.dst = mb.cui
               CROSS JOIN nn
)
SELECT src, dst, n_ab,
       round(N * (n_ab::DOUBLE * (N - n_a - n_b + n_ab)
                  - (n_a - n_ab)::DOUBLE * (n_b - n_ab))
               * (n_ab::DOUBLE * (N - n_a - n_b + n_ab)
                  - (n_a - n_ab)::DOUBLE * (n_b - n_ab))
             / (n_a * n_b * (N - n_a) * (N - n_b)), 6) AS chi2,
       round((n_ab::DOUBLE - n_a * n_b / N) / sqrt(n_ab::DOUBLE), 6)
         AS t_score
FROM j
"""


def q_llr_scores(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(src, dst, n_ab, llr): Dunning's log-likelihood ratio (G^2) per
    co-occurring concept pair — the collocation statistic of record for
    SPARSE counts (Dunning 1993): chi-square's normal approximation
    overstates significance exactly where web corpora live (rare events),
    while G^2 stays calibrated.  Completes the significance family next
    to PMI (q_pmi_edges) and chi-square/t (q_collocation_scores).

    G^2 = 2 * sum over the 2x2 contingency cells of O*ln(O/E), with
    0*ln(0) = 0.  Determinism: the four cells and marginals are exact
    BIGINTs; the four ln terms are combined in one fixed-order closed-form
    expression (no accumulation across rows), rounded at 6 — the same
    cross-engine argument as q_pmi_edges.  Plan: identical to
    q_collocation_scores (one pair groupBy, broadcast marginals)."""
    doc_cui = doc_cui_cached(spark, sf_dir)
    n_docs = doc_cui.select("url").distinct().count()
    marg = doc_cui.groupBy("CUI").agg(F.count(F.lit(1)).alias("n_c"))
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("src"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("dst"))
    pairs = (
        a.join(b, "u")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_docs)
    )
    N = F.lit(float(n_docs))
    o11 = F.col("n_ab").cast("double")
    o12 = (F.col("n_a") - F.col("n_ab")).cast("double")
    o21 = (F.col("n_b") - F.col("n_ab")).cast("double")
    o22 = N - F.col("n_a") - F.col("n_b") + F.col("n_ab")
    e11 = F.col("n_a") * F.col("n_b") / N
    e12 = F.col("n_a") * (N - F.col("n_b")) / N
    e21 = (N - F.col("n_a")) * F.col("n_b") / N
    e22 = (N - F.col("n_a")) * (N - F.col("n_b")) / N

    def term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    llr = F.lit(2.0) * (
        term(o11, e11) + term(o12, e12) + term(o21, e21) + term(o22, e22)
    )
    return (
        pairs.join(
            F.broadcast(
                marg.select(F.col("CUI").alias("src"), F.col("n_c").alias("n_a"))
            ),
            "src",
        )
        .join(
            F.broadcast(
                marg.select(F.col("CUI").alias("dst"), F.col("n_c").alias("n_b"))
            ),
            "dst",
        )
        .select("src", "dst", "n_ab", F.round(llr, 6).alias("llr"))
    )


def sql_llr_scores(min_docs: int = PR_MIN_DOCS) -> str:
    def term(o, e):
        return f"CASE WHEN {o} > 0 THEN ({o})::DOUBLE * ln(({o})::DOUBLE / ({e})) ELSE 0.0 END"

    o11, o12, o21, o22 = (
        "n_ab",
        "n_a - n_ab",
        "n_b - n_ab",
        "N - n_a - n_b + n_ab",
    )
    e11 = "n_a * n_b / N"
    e12 = "n_a * (N - n_b) / N"
    e21 = "(N - n_a) * n_b / N"
    e22 = "(N - n_a) * (N - n_b) / N"
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
nn AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM doc_cui),
marg AS (SELECT cui, COUNT(*) AS n_c FROM doc_cui GROUP BY cui),
pairs AS (
  SELECT a.cui AS src, b.cui AS dst, COUNT(*) AS n_ab
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY a.cui, b.cui HAVING COUNT(*) >= {min_docs}
),
j AS (
  SELECT p.src, p.dst, p.n_ab, ma.n_c AS n_a, mb.n_c AS n_b, nn.n AS N
  FROM pairs p JOIN marg ma ON p.src = ma.cui
               JOIN marg mb ON p.dst = mb.cui
               CROSS JOIN nn
)
SELECT src, dst, n_ab,
       round(2.0 * ({term(o11, e11)} + {term(o12, e12)}
                    + {term(o21, e21)} + {term(o22, e22)}), 6) AS llr
FROM j
"""


# ---------------------------------------------------------------------------
# Rule mining (AMIE-style) + predicate-cardinality audit over the typed KG.
# ---------------------------------------------------------------------------

RULE_MIN_SUPPORT = 2      # min (x, y) pairs satisfying body AND head
CHAIN_FANOUT_CAP = 10_000 # exclude join entities z with din*dout above this

_SQL_OCC_CTES = """
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM read_docs),
alias_toks AS (
  SELECT alias, label, string_split(alias, ' ') AS ts,
         len(string_split(alias, ' ')) AS n
  FROM (SELECT DISTINCT alias, label FROM aliases)
),
pos AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM toks
),
occ AS (
  SELECT p.doc_id, p.i - 1 AS start_idx, p.i - 2 + a.n AS end_idx,
         a.alias AS mention, a.label
  FROM pos p
  JOIN alias_toks a
    ON p.ws[p.i] = a.ts[1] AND list_slice(p.ws, p.i, p.i + a.n - 1) = a.ts
)"""


def _sql_facts_ctes(max_gap: int = MAX_GAP) -> str:
    """WITH-body producing ``facts(subj_cui, pred, obj_cui)`` — the
    distinct typed triple set of sql_relations, shared by the rule-mining
    and cardinality-audit oracles."""
    cases = "\n         ".join(
        f"WHEN a.label = '{l1}' AND b.label = '{l2}' THEN '{p}'"
        for (l1, l2), p in PRED_BY_PAIR.items()
    )
    return f"""{sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
best_links AS (SELECT mention, cui FROM links WHERE rk = 1),
{_SQL_OCC_CTES.lstrip()},
facts AS (
  SELECT DISTINCT s.cui AS subj_cui,
         CASE {cases} END AS pred,
         o.cui AS obj_cui
  FROM occ a
  JOIN occ b ON a.doc_id = b.doc_id
            AND b.start_idx - a.end_idx BETWEEN 1 AND {max_gap + 1}
  JOIN best_links s ON a.mention = s.mention
  JOIN best_links o ON b.mention = o.mention
  WHERE s.cui <> o.cui
)"""


def q_amie_rules(
    spark: SparkSession,
    sf_dir: str,
    min_support: int = RULE_MIN_SUPPORT,
    fanout_cap: int = CHAIN_FANOUT_CAP,
) -> DataFrame:
    """(rule_type, head_pred, body_pred_1, body_pred_2, support, n_body,
    n_head, conf_ppm, hc_ppm): AMIE-style horn-rule mining over the typed
    triple set — the KG-construction step that turns an extracted graph
    into inference rules (and a quality audit: a high-confidence
    ``INPUT_TO(y,x) <= OPERATES_ON(x,y)`` validates the extractor's
    predicate typing).  Two rule shapes:

    - inverse:  head(x,y) <= body(y,x) — one equi-join of the facts table
      with itself on the flipped (subj, obj) pair.
    - chain:    head(x,y) <= b1(x,z) AND b2(z,y) — the 2-hop body pairs
      joined back against head facts.

    Confidence = support / #distinct body pairs (AMIE std-confidence);
    head coverage = support / |head predicate| — both emitted as exact
    integer ppm (no floats).

    Scale shape (10^12 triples): every join is an equi-join on entity
    ids; the chain body's only blow-up risk is a hub entity z joining
    din*dout pairs, so z's with fan-out above ``fanout_cap`` are dropped
    from the chain join (AMIE+'s functionality cap — the salting analog
    for multiplicative skew), keeping per-key work bounded; body pairs
    are de-duplicated BEFORE the head join so confidence counts pairs,
    not derivations.  Predicate-level aggregates are 4x4-sized — the
    final groupBy is map-side-combined to nothing."""
    from sparkmedkg import webkg

    facts = webkg._track(
        q_relations(spark, sf_dir).select("subj_cui", "pred", "obj_cui")
    )
    psize = facts.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))

    # --- inverse rules ---------------------------------------------------
    h = facts.select(
        F.col("pred").alias("head_pred"),
        F.col("subj_cui").alias("hx"),
        F.col("obj_cui").alias("hy"),
    )
    b = facts.select(
        F.col("pred").alias("body_pred_1"),
        F.col("subj_cui").alias("bx"),
        F.col("obj_cui").alias("by"),
    )
    inv = (
        h.join(b, (F.col("hx") == F.col("by")) & (F.col("hy") == F.col("bx")))
        .groupBy("head_pred", "body_pred_1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .join(
            F.broadcast(psize.select(F.col("pred").alias("body_pred_1"),
                                     F.col("n").alias("n_body"))),
            "body_pred_1",
        )
        .select(
            F.lit("inverse").alias("rule_type"),
            "head_pred",
            "body_pred_1",
            F.lit("").alias("body_pred_2"),
            "support",
            F.col("n_body").cast("bigint").alias("n_body"),
        )
    )

    # --- chain rules ------------------------------------------------------
    din = facts.groupBy(F.col("obj_cui").alias("z")).agg(
        F.count(F.lit(1)).alias("din")
    )
    dout = facts.groupBy(F.col("subj_cui").alias("z")).agg(
        F.count(F.lit(1)).alias("dout")
    )
    hot = (
        din.join(dout, "z")
        .where(F.col("din") * F.col("dout") > fanout_cap)
        .select("z")
    )
    q1 = facts.select(
        F.col("pred").alias("body_pred_1"),
        F.col("subj_cui").alias("x"),
        F.col("obj_cui").alias("z"),
    ).join(F.broadcast(hot), "z", "left_anti")
    r1 = facts.select(
        F.col("pred").alias("body_pred_2"),
        F.col("subj_cui").alias("z"),
        F.col("obj_cui").alias("y"),
    )
    body = (
        q1.join(r1, "z")
        .where(F.col("x") != F.col("y"))
        .select("body_pred_1", "body_pred_2", "x", "y")
        .distinct()
    )
    # second tracked persist (not _track: that would release `facts`)
    body = body.persist()
    webkg._CACHED.append(body)
    n_body = body.groupBy("body_pred_1", "body_pred_2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_body")
    )
    heads = facts.select(
        F.col("pred").alias("head_pred"),
        F.col("subj_cui").alias("x"),
        F.col("obj_cui").alias("y"),
    )
    chain = (
        body.join(heads, ["x", "y"])
        .groupBy("head_pred", "body_pred_1", "body_pred_2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .join(F.broadcast(n_body), ["body_pred_1", "body_pred_2"])
        .select(
            F.lit("chain").alias("rule_type"),
            "head_pred",
            "body_pred_1",
            F.col("body_pred_2"),
            "support",
            "n_body",
        )
    )

    out = inv.unionByName(chain).where(F.col("support") >= min_support)
    return (
        out.join(
            F.broadcast(psize.select(F.col("pred").alias("head_pred"),
                                     F.col("n").alias("n_head"))),
            "head_pred",
        )
        .select(
            "rule_type",
            "head_pred",
            "body_pred_1",
            "body_pred_2",
            "support",
            "n_body",
            F.col("n_head").cast("bigint").alias("n_head"),
            F.expr("support * 1000000 div n_body").cast("bigint")
            .alias("conf_ppm"),
            F.expr("support * 1000000 div n_head").cast("bigint")
            .alias("hc_ppm"),
        )
    )


def sql_amie_rules(
    min_support: int = RULE_MIN_SUPPORT,
    fanout_cap: int = CHAIN_FANOUT_CAP,
    max_gap: int = MAX_GAP,
) -> str:
    return f"""
WITH {_sql_facts_ctes(max_gap)},
psize AS (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n FROM facts GROUP BY pred),
inv AS (
  SELECT 'inverse' AS rule_type, h.pred AS head_pred,
         b.pred AS body_pred_1, '' AS body_pred_2,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM facts h
  JOIN facts b ON h.subj_cui = b.obj_cui AND h.obj_cui = b.subj_cui
  GROUP BY 1, 2, 3, 4
),
inv2 AS (
  SELECT i.*, p.n AS n_body
  FROM inv i JOIN psize p ON p.pred = i.body_pred_1
),
hot AS (
  SELECT a.z FROM
    (SELECT obj_cui AS z, COUNT(*) AS din FROM facts GROUP BY 1) a
  JOIN (SELECT subj_cui AS z, COUNT(*) AS dout FROM facts GROUP BY 1) b
    ON a.z = b.z
  WHERE a.din * b.dout > {fanout_cap}
),
body AS (
  SELECT DISTINCT q.pred AS body_pred_1, r.pred AS body_pred_2,
         q.subj_cui AS x, r.obj_cui AS y
  FROM facts q
  JOIN facts r ON q.obj_cui = r.subj_cui
  WHERE q.subj_cui <> r.obj_cui
    AND NOT EXISTS (SELECT 1 FROM hot WHERE hot.z = q.obj_cui)
),
nbody AS (
  SELECT body_pred_1, body_pred_2, CAST(COUNT(*) AS BIGINT) AS n_body
  FROM body GROUP BY 1, 2
),
chain AS (
  SELECT 'chain' AS rule_type, f.pred AS head_pred,
         b.body_pred_1, b.body_pred_2,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM body b JOIN facts f ON f.subj_cui = b.x AND f.obj_cui = b.y
  GROUP BY 1, 2, 3, 4
),
chain2 AS (
  SELECT c.*, nb.n_body
  FROM chain c
  JOIN nbody nb ON nb.body_pred_1 = c.body_pred_1
               AND nb.body_pred_2 = c.body_pred_2
),
unioned AS (
  SELECT * FROM inv2 UNION ALL SELECT * FROM chain2
)
SELECT u.rule_type, u.head_pred, u.body_pred_1, u.body_pred_2,
       u.support, u.n_body, ph.n AS n_head,
       CAST(u.support * 1000000 // u.n_body AS BIGINT) AS conf_ppm,
       CAST(u.support * 1000000 // ph.n AS BIGINT) AS hc_ppm
FROM unioned u JOIN psize ph ON ph.pred = u.head_pred
WHERE u.support >= {min_support}
"""


def q_functional_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pred, n_facts, n_subj, n_obj, fun_ppm, inv_fun_ppm, n_multi_subj):
    predicate-cardinality audit over the typed triple set — AMIE's
    functionality fun(p) = #distinct subjects / #facts (1.0 ppm-exact for
    a truly functional predicate) and its inverse, plus the count of
    subjects violating one-to-one-ness (n_multi_subj: subjects asserting
    >1 object).  The first KG-QA report a curator reads: a predicate
    modeled as functional with a low fun_ppm means the extractor (or the
    source) is emitting conflicting objects.

    Plan: one distinct triple scan, two map-side-combinable aggregations
    keyed on (pred, subj) then pred — output is predicate-vocabulary
    sized (4 rows here), exact integers only."""
    facts = q_relations(spark, sf_dir).select("subj_cui", "pred", "obj_cui")
    per_subj = facts.groupBy("pred", "subj_cui").agg(
        F.count(F.lit(1)).alias("n_obj_of_subj")
    )
    by_subj = per_subj.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subj"),
        F.sum(F.when(F.col("n_obj_of_subj") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_multi_subj"),
    )
    tot = facts.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_facts"),
        F.countDistinct("obj_cui").cast("bigint").alias("n_obj"),
    )
    return (
        tot.join(by_subj, "pred")
        .select(
            "pred",
            "n_facts",
            "n_subj",
            "n_obj",
            F.expr("n_subj * 1000000 div n_facts").cast("bigint")
            .alias("fun_ppm"),
            F.expr("n_obj * 1000000 div n_facts").cast("bigint")
            .alias("inv_fun_ppm"),
            "n_multi_subj",
        )
    )


def sql_functional_audit(max_gap: int = MAX_GAP) -> str:
    return f"""
WITH {_sql_facts_ctes(max_gap)},
per_subj AS (
  SELECT pred, subj_cui, COUNT(*) AS n_obj_of_subj
  FROM facts GROUP BY 1, 2
),
by_subj AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_subj,
         CAST(SUM(CASE WHEN n_obj_of_subj > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi_subj
  FROM per_subj GROUP BY pred
),
tot AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_facts,
         CAST(COUNT(DISTINCT obj_cui) AS BIGINT) AS n_obj
  FROM facts GROUP BY pred
)
SELECT t.pred, t.n_facts, s.n_subj, t.n_obj,
       CAST(s.n_subj * 1000000 // t.n_facts AS BIGINT) AS fun_ppm,
       CAST(t.n_obj * 1000000 // t.n_facts AS BIGINT) AS inv_fun_ppm,
       s.n_multi_subj
FROM tot t JOIN by_subj s ON s.pred = t.pred
"""


# ---------------------------------------------------------------------------
# Noisy-or triple confidence from per-document link evidence.
# ---------------------------------------------------------------------------

EVIDENCE_PRIOR = 0.9  # reliability of one co-occurrence as relation evidence


def q_triple_confidence(
    spark: SparkSession, sf_dir: str, min_docs: int = 2
) -> DataFrame:
    """(subj_cui, obj_cui, n_docs, conf6): distant-supervision triple
    confidence — each document where two linked CUIs co-occur contributes
    evidence p_doc = prior * s_subj * s_obj (the linker's top-1 scores,
    discounted by the EVIDENCE_PRIOR reliability), combined across
    documents by noisy-or: conf = 1 - prod(1 - p_doc).

    Engine-portable float discipline: per-doc evidence is quantized once
    (round to 1e-6), mapped to integer micro-nats l = floor(-ln(1-p)*1e9
    + .5), and SUMMED as exact integers — integer addition is
    order-independent, so the grouped aggregation cannot drift between
    Spark's partial-agg order and DuckDB's; the single exp() happens
    per output row on the exact sum.  Plan: the per-doc pair fan-out is
    the bounded co-occurrence self-join (same shape as q_cooccurrence);
    everything after is map-side-combinable integer aggregation."""
    from sparkmedkg import ner, webkg
    from sparkmedkg.webkg import alias_bc, aliases_df, concepts_df, docs_df

    d = docs_df(spark, sf_dir).where(F.col("lang") == "en")
    mentions = webkg._track(ner.detect_mentions(d, alias_bc(spark), mode="all"))
    bl = link.link_mentions(
        mentions, aliases_df(spark), concepts_df(spark), top_k=1
    ).select(F.col("source").alias("mention"), "CUI", "kb_score")
    doc_cui = (
        mentions.select("url", "mention")
        .distinct()
        .join(F.broadcast(bl), "mention")
        .groupBy("url", "CUI")
        .agg(F.max("kb_score").alias("s"))
    )
    a = doc_cui.select(
        F.col("url").alias("u"), F.col("CUI").alias("subj_cui"),
        F.col("s").alias("sa"),
    )
    b = doc_cui.select(
        F.col("url").alias("u"), F.col("CUI").alias("obj_cui"),
        F.col("s").alias("sb"),
    )
    p6 = F.round(F.lit(EVIDENCE_PRIOR) * F.col("sa") * F.col("sb"), 6)
    lmicro = F.floor(-F.log(F.lit(1.0) - p6) * 1e9 + F.lit(0.5)).cast("bigint")
    return (
        a.join(b, "u")
        .where(F.col("subj_cui") < F.col("obj_cui"))
        .select("subj_cui", "obj_cui", lmicro.alias("l"))
        .groupBy("subj_cui", "obj_cui")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("l").alias("lsum"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            "subj_cui",
            "obj_cui",
            "n_docs",
            F.round(
                F.lit(1.0) - F.exp(-F.col("lsum").cast("double") / 1e9), 6
            ).alias("conf6"),
        )
    )


def sql_triple_confidence(min_docs: int = 2) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
best AS (SELECT mention, cui, kb_score FROM links WHERE rk = 1),
mentions2 AS (
  SELECT DISTINCT m.doc_id, m.mention FROM mentions m
),
doc_cui AS (
  SELECT m.doc_id, b.cui, MAX(b.kb_score) AS s
  FROM mentions2 m JOIN best b ON b.mention = m.mention
  GROUP BY 1, 2
),
ev AS (
  SELECT a.cui AS subj_cui, b.cui AS obj_cui,
         CAST(floor(-ln(1.0 - round({EVIDENCE_PRIOR} * a.s * b.s, 6)) * 1e9
                    + 0.5) AS BIGINT) AS l
  FROM doc_cui a JOIN doc_cui b
    ON a.doc_id = b.doc_id AND a.cui < b.cui
)
SELECT subj_cui, obj_cui, CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(1.0 - exp(-(CAST(SUM(l) AS BIGINT)::DOUBLE) / 1e9), 6) AS conf6
FROM ev GROUP BY 1, 2
HAVING COUNT(*) >= {min_docs}
"""


# ---------------------------------------------------------------------------
# Weak-supervision label model over candidate triple pairs.
# ---------------------------------------------------------------------------

LLR_CRIT_95 = 3.841459  # chi-square 0.95 critical value, 1 dof


def q_weak_supervision_vote(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(subj_cui, obj_cui, n_ab, lf_support, lf_pmi, lf_llr, votes, label):
    Snorkel-style weak supervision over candidate relation pairs — three
    independent labeling functions vote on every co-occurring concept
    pair, and the label model (unweighted majority here; learned weights
    swap in without changing the plan) decides which candidate triples
    enter KG training data:

    - lf_support: seen in >= 2 documents (repetition = not an accident);
    - lf_pmi:     pointwise mutual information > 0, tested EXACTLY as the
      integer cross-product N * n_ab > n_a * n_b (no logs, no floats);
    - lf_llr:     Dunning G^2 significant at 95% (same closed-form
      per-row expression as q_llr_scores, whose cross-engine float parity
      is already oracle-proven).

    Plan: one candidate-pair groupBy (the bounded co-occurrence
    self-join) + two broadcast marginal joins — identical shuffle shape
    to q_llr_scores; the vote itself is a map-only projection."""
    doc_cui = doc_cui_cached(spark, sf_dir)
    n_docs = doc_cui.select("url").distinct().count()
    marg = doc_cui.groupBy("CUI").agg(F.count(F.lit(1)).alias("n_c"))
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("subj_cui"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("obj_cui"))
    pairs = (
        a.join(b, "u")
        .where(F.col("subj_cui") < F.col("obj_cui"))
        .groupBy("subj_cui", "obj_cui")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    N = F.lit(float(n_docs))
    o11 = F.col("n_ab").cast("double")
    o12 = (F.col("n_a") - F.col("n_ab")).cast("double")
    o21 = (F.col("n_b") - F.col("n_ab")).cast("double")
    o22 = N - F.col("n_a") - F.col("n_b") + F.col("n_ab")
    e11 = F.col("n_a") * F.col("n_b") / N
    e12 = F.col("n_a") * (N - F.col("n_b")) / N
    e21 = (N - F.col("n_a")) * F.col("n_b") / N
    e22 = (N - F.col("n_a")) * (N - F.col("n_b")) / N

    def term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    llr6 = F.round(
        F.lit(2.0)
        * (term(o11, e11) + term(o12, e12) + term(o21, e21) + term(o22, e22)),
        6,
    )
    lf_support = F.col("n_ab") >= 2
    lf_pmi = (F.lit(n_docs).cast("bigint") * F.col("n_ab")) > (
        F.col("n_a").cast("bigint") * F.col("n_b").cast("bigint")
    )
    lf_llr = llr6 >= F.lit(LLR_CRIT_95)
    votes = (
        lf_support.cast("int") + lf_pmi.cast("int") + lf_llr.cast("int")
    ).cast("bigint")
    return (
        pairs.join(
            F.broadcast(
                marg.select(F.col("CUI").alias("subj_cui"),
                            F.col("n_c").alias("n_a"))
            ),
            "subj_cui",
        )
        .join(
            F.broadcast(
                marg.select(F.col("CUI").alias("obj_cui"),
                            F.col("n_c").alias("n_b"))
            ),
            "obj_cui",
        )
        .select(
            "subj_cui",
            "obj_cui",
            "n_ab",
            lf_support.alias("lf_support"),
            lf_pmi.alias("lf_pmi"),
            lf_llr.alias("lf_llr"),
            votes.alias("votes"),
            (votes >= 2).alias("label"),
        )
    )


def sql_weak_supervision_vote() -> str:
    def term(o, e):
        return (
            f"CASE WHEN {o} > 0 THEN ({o})::DOUBLE * ln(({o})::DOUBLE / ({e}))"
            " ELSE 0.0 END"
        )

    o11, o12, o21, o22 = (
        "n_ab",
        "n_a - n_ab",
        "n_b - n_ab",
        "N - n_a - n_b + n_ab",
    )
    e11 = "n_a::DOUBLE * n_b / N"
    e12 = "n_a::DOUBLE * (N - n_b) / N"
    e21 = "(N - n_a)::DOUBLE * n_b / N"
    e22 = "(N - n_a)::DOUBLE * (N - n_b) / N"
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM doc_cui),
marg AS (SELECT cui, COUNT(*) AS n_c FROM doc_cui GROUP BY cui),
pairs AS (
  SELECT a.cui AS subj_cui, b.cui AS obj_cui,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY 1, 2
),
j AS (
  SELECT p.subj_cui, p.obj_cui, p.n_ab,
         ma.n_c AS n_a, mb.n_c AS n_b, nn.n::DOUBLE AS N,
         CAST(nn.n AS BIGINT) AS n_int
  FROM pairs p
  JOIN marg ma ON p.subj_cui = ma.cui
  JOIN marg mb ON p.obj_cui = mb.cui
  CROSS JOIN nn
),
v AS (
  SELECT subj_cui, obj_cui, n_ab,
         n_ab >= 2 AS lf_support,
         n_int * n_ab > CAST(n_a AS BIGINT) * CAST(n_b AS BIGINT) AS lf_pmi,
         round(2.0 * ({term(o11, e11)} + {term(o12, e12)}
                      + {term(o21, e21)} + {term(o22, e22)}), 6)
           >= {LLR_CRIT_95} AS lf_llr
  FROM j
)
SELECT subj_cui, obj_cui, n_ab, lf_support, lf_pmi, lf_llr,
       CAST(lf_support::INT + lf_pmi::INT + lf_llr::INT AS BIGINT) AS votes,
       (lf_support::INT + lf_pmi::INT + lf_llr::INT) >= 2 AS label
FROM v
"""


def q_domain_range_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pred, subj_semtype, obj_semtype, n_facts, conforms): domain/range
    conformance of extracted triples against the predicate schema —
    every predicate was typed from the SURFACE-FORM label pair
    (PRED_BY_PAIR), but the linked CUIs carry their own KB semantic
    types; a row where the linked types disagree with the predicate's
    declared (domain, range) is extraction noise (an ambiguous alias
    linked across types) that a curator quarantines before load.  The
    OWL-ish domain/range audit next to q_functional_audit's cardinality
    check.

    Plan: facts joined to the broadcast concept table twice (subj/obj
    semtype lookup), then one schema-sized rollup — conformance is a
    map-only comparison against the PRED_BY_PAIR literal."""
    from sparkmedkg.webkg import concepts_df

    facts = q_relations(spark, sf_dir).select("subj_cui", "pred", "obj_cui")
    sem = concepts_df(spark).select("CUI", "semtype")
    withsem = facts.join(
        F.broadcast(sem.select(F.col("CUI").alias("subj_cui"),
                               F.col("semtype").alias("subj_semtype"))),
        "subj_cui",
    ).join(
        F.broadcast(sem.select(F.col("CUI").alias("obj_cui"),
                               F.col("semtype").alias("obj_semtype"))),
        "obj_cui",
    )
    conforms = F.lit(False)
    for (l1, l2), p in PRED_BY_PAIR.items():
        conforms = F.when(
            (F.col("pred") == p)
            & (F.col("subj_semtype") == l1)
            & (F.col("obj_semtype") == l2),
            F.lit(True),
        ).otherwise(conforms)
    return (
        withsem.groupBy("pred", "subj_semtype", "obj_semtype")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_facts"))
        .withColumn(
            "conforms",
            conforms,
        )
    )


def sql_domain_range_audit(max_gap: int = MAX_GAP) -> str:
    cases = " OR ".join(
        f"(pred = '{p}' AND subj_semtype = '{l1}' AND obj_semtype = '{l2}')"
        for (l1, l2), p in PRED_BY_PAIR.items()
    )
    from sparkmedkg.webkg import WEB_CONCEPTS

    concept_vals = ", ".join(
        f"('{c[0]}', '{c[3]}')" for c in sorted(WEB_CONCEPTS)
    )
    return f"""
WITH {_sql_facts_ctes(max_gap)},
sem(cui, semtype) AS (SELECT * FROM (VALUES {concept_vals})),
withsem AS (
  SELECT f.pred, ss.semtype AS subj_semtype, so.semtype AS obj_semtype
  FROM facts f
  JOIN sem ss ON ss.cui = f.subj_cui
  JOIN sem so ON so.cui = f.obj_cui
)
SELECT pred, subj_semtype, obj_semtype,
       CAST(COUNT(*) AS BIGINT) AS n_facts,
       ({cases}) AS conforms
FROM withsem
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Truth discovery: Sums-style source-reliability / fact-belief iteration.
# ---------------------------------------------------------------------------

TRUST_ITERS = 2  # fixed mutual-reinforcement rounds (unrolled in the oracle)


def _doc_facts(
    spark: SparkSession, sf_dir: str, max_gap: int = MAX_GAP
) -> DataFrame:
    """(doc_id, subj_cui, pred, obj_cui) — the DISTINCT per-document typed
    triple set (same extraction as q_relations, provenance kept)."""
    from sparkmedkg import webkg

    occ = occ_cached(spark, sf_dir)
    subj = occ.select(
        "doc_id",
        F.col("mention").alias("m1"),
        F.col("label").alias("l1"),
        F.explode(
            F.sequence(F.col("end_idx") + 1, F.col("end_idx") + 1 + max_gap)
        ).alias("tgt"),
    )
    obj = occ.select(
        F.col("doc_id").alias("o_doc"),
        F.col("start_idx").alias("b_start"),
        F.col("mention").alias("m2"),
        F.col("label").alias("l2"),
    )
    pairs = subj.join(
        obj,
        (subj["doc_id"] == obj["o_doc"]) & (subj["tgt"] == obj["b_start"]),
    )
    pred = F.lit(None).cast("string")
    for (l1, l2), p in PRED_BY_PAIR.items():
        pred = F.when(
            (F.col("l1") == l1) & (F.col("l2") == l2), F.lit(p)
        ).otherwise(pred)
    bl = _best_links(spark, occ)
    s = bl.select(F.col("mention").alias("m1"), F.col("CUI").alias("subj_cui"))
    o = bl.select(F.col("mention").alias("m2"), F.col("CUI").alias("obj_cui"))
    return (
        pairs.withColumn("pred", pred)
        .join(F.broadcast(s), "m1")
        .join(F.broadcast(o), "m2")
        .where(F.col("subj_cui") != F.col("obj_cui"))
        .select("doc_id", "subj_cui", "pred", "obj_cui")
        .distinct()
    )


def _claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, subj_cui, pred, obj_cui) — the DISTINCT source->fact claim
    bipartite edge set (a source claiming a fact in many docs counts once)."""
    from sparkmedkg import webkg

    src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    return _kg_cached(
        spark, "claims", (sf_dir,),
        lambda: _doc_facts(spark, sf_dir)
        .join(src, "doc_id")
        .select("source", "subj_cui", "pred", "obj_cui")
        .distinct(),
    )


FACT = ["subj_cui", "pred", "obj_cui"]


def _sums_chain(spark: SparkSession, sf_dir: str):
    """Two unrolled Sums iterations (Kleinberg hubs/authorities on the
    source-claims-fact bipartite graph, TruthFinder's simplest ancestor)
    in EXACT integer arithmetic: belief starts at 1 per fact, trust(s) =
    sum of beliefs of s's claims, belief(f) = sum of trusts of f's
    sources.  Integer sums are order-independent, so the grouped
    aggregations cannot drift between engines; normalization is integer
    ppm against the max.  Returns (claims, t2, b2)."""
    c = _claims(spark, sf_dir)
    # iter 1: b0 = 1  =>  t1(s) = n_claims(s)
    t1 = c.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("t1"))
    b1 = (
        c.join(F.broadcast(t1), "source")
        .groupBy(*FACT)
        .agg(F.sum("t1").alias("b1"))
    )
    # iter 2
    t2 = (
        c.join(b1, FACT)
        .groupBy("source")
        .agg(F.sum("b1").alias("t2"))
    )
    b2 = (
        c.join(F.broadcast(t2), "source")
        .groupBy(*FACT)
        .agg(
            F.sum("t2").alias("b2"),
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        )
    )
    return c, t2, b2


def q_truth_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj_cui, pred, obj_cui, n_sources, belief, belief_ppm): fact
    belief after TRUST_ITERS unrolled Sums iterations over the
    source-claims-fact bipartite graph — the truth-discovery step that
    ranks extracted triples by the collective reliability of the sources
    asserting them (a fact claimed by many well-connected sources beats
    one claimed by a single thin source).  belief_ppm normalizes by the
    max belief as exact integer ppm.

    Scale shape: claims is the sparse bipartite edge set; each iteration
    is one map-side-combinable integer groupBy per side plus an equi-join
    (the per-source aggregate is tiny -> broadcast back).  No floats, no
    driver loops, fixed iteration count."""
    _, _, b2 = _sums_chain(spark, sf_dir)
    mx = b2.agg(F.max("b2").alias("mx"))
    return b2.crossJoin(F.broadcast(mx)).select(
        *FACT,
        "n_sources",
        F.col("b2").alias("belief"),
        F.expr("b2 * 1000000 div mx").cast("bigint").alias("belief_ppm"),
    )


def q_source_trust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_claims, trust, trust_ppm): per-source reliability after
    the same unrolled Sums iterations as q_truth_discovery — the
    provenance-weighting table a KG loader uses to discount facts from
    low-trust hosts.  Same exact-integer discipline."""
    c, t2, _ = _sums_chain(spark, sf_dir)
    n = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_claims")
    )
    j = n.join(t2, "source")
    mx = j.agg(F.max("t2").alias("mx"))
    return j.crossJoin(F.broadcast(mx)).select(
        "source",
        "n_claims",
        F.col("t2").alias("trust"),
        F.expr("t2 * 1000000 div mx").cast("bigint").alias("trust_ppm"),
    )


def _sql_claims_ctes(max_gap: int = MAX_GAP) -> str:
    cases = "\n         ".join(
        f"WHEN a.label = '{l1}' AND b.label = '{l2}' THEN '{p}'"
        for (l1, l2), p in PRED_BY_PAIR.items()
    )
    return f"""{sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
best_links AS (SELECT mention, cui FROM links WHERE rk = 1),
{_SQL_OCC_CTES.lstrip()},
doc_facts AS (
  SELECT DISTINCT a.doc_id, s.cui AS subj_cui,
         CASE {cases} END AS pred,
         o.cui AS obj_cui
  FROM occ a
  JOIN occ b ON a.doc_id = b.doc_id
            AND b.start_idx - a.end_idx BETWEEN 1 AND {max_gap + 1}
  JOIN best_links s ON a.mention = s.mention
  JOIN best_links o ON b.mention = o.mention
  WHERE s.cui <> o.cui
),
claims AS (
  SELECT DISTINCT d.source, f.subj_cui, f.pred, f.obj_cui
  FROM doc_facts f JOIN documents d ON d.doc_id = f.doc_id
),
t1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t1 FROM claims GROUP BY 1),
b1 AS (
  SELECT c.subj_cui, c.pred, c.obj_cui, SUM(t1.t1) AS b1
  FROM claims c JOIN t1 ON c.source = t1.source
  GROUP BY 1, 2, 3
),
t2 AS (
  SELECT c.source, SUM(b1.b1) AS t2
  FROM claims c
  JOIN b1 ON c.subj_cui = b1.subj_cui AND c.pred = b1.pred
         AND c.obj_cui = b1.obj_cui
  GROUP BY 1
),
b2 AS (
  SELECT c.subj_cui, c.pred, c.obj_cui,
         CAST(SUM(t2.t2) AS BIGINT) AS b2,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM claims c JOIN t2 ON c.source = t2.source
  GROUP BY 1, 2, 3
)"""


def sql_truth_discovery(max_gap: int = MAX_GAP) -> str:
    return f"""
WITH {_sql_claims_ctes(max_gap)},
mx AS (SELECT MAX(b2) AS mx FROM b2)
SELECT subj_cui, pred, obj_cui, n_sources, b2 AS belief,
       CAST(b2 * 1000000 // mx.mx AS BIGINT) AS belief_ppm
FROM b2 CROSS JOIN mx
"""


def sql_source_trust(max_gap: int = MAX_GAP) -> str:
    return f"""
WITH {_sql_claims_ctes(max_gap)},
n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_claims
      FROM claims GROUP BY 1),
j AS (SELECT n.source, n.n_claims, CAST(t2.t2 AS BIGINT) AS trust
      FROM n JOIN t2 ON n.source = t2.source),
mx AS (SELECT MAX(trust) AS mx FROM j)
SELECT source, n_claims, trust,
       CAST(trust * 1000000 // mx.mx AS BIGINT) AS trust_ppm
FROM j CROSS JOIN mx
"""


# ---------------------------------------------------------------------------
# Functional-slot conflict resolution (argmax-support object per subject).
# ---------------------------------------------------------------------------

def q_conflict_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj_cui, pred, kept_obj, n_objects, kept_docs, total_docs,
    kept_share_ppm): for every (subject, predicate) slot asserted with
    MORE THAN ONE object, the resolution a curator loads — keep the
    object with the strongest support (n_docs desc, then n_occ desc,
    then obj_cui asc as the deterministic tiebreak), report how
    contested the slot was.  The action half of q_functional_audit:
    where the audit says a predicate leaks multi-objects, this picks the
    winner per slot.

    Plan: one window ranked by support within the (subj, pred) slot —
    slot groups are bounded by the object vocabulary, so the window
    partition key is never skewed; the slot rollup is map-side
    combinable."""
    from pyspark.sql import Window as W

    rel = q_relations(spark, sf_dir)
    w = W.partitionBy("subj_cui", "pred").orderBy(
        F.desc("n_docs"), F.desc("n_occ"), F.asc("obj_cui")
    )
    ranked = rel.withColumn("rk", F.row_number().over(w))
    slot = rel.groupBy("subj_cui", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_objects"),
        F.sum("n_docs").cast("bigint").alias("total_docs"),
    )
    return (
        ranked.where(F.col("rk") == 1)
        .join(slot, ["subj_cui", "pred"])
        .where(F.col("n_objects") >= 2)
        .select(
            "subj_cui",
            "pred",
            F.col("obj_cui").alias("kept_obj"),
            "n_objects",
            F.col("n_docs").cast("bigint").alias("kept_docs"),
            "total_docs",
            F.expr("CAST(n_docs AS BIGINT) * 1000000 div total_docs")
            .cast("bigint")
            .alias("kept_share_ppm"),
        )
    )


def sql_conflict_resolution(max_gap: int = MAX_GAP) -> str:
    return f"""
WITH rel AS ({sql_relations(max_gap)}),
ranked AS (
  SELECT subj_cui, pred, obj_cui, n_docs, n_occ,
         ROW_NUMBER() OVER (
           PARTITION BY subj_cui, pred
           ORDER BY n_docs DESC, n_occ DESC, obj_cui ASC
         ) AS rk
  FROM rel
),
slot AS (
  SELECT subj_cui, pred, CAST(COUNT(*) AS BIGINT) AS n_objects,
         CAST(SUM(n_docs) AS BIGINT) AS total_docs
  FROM rel GROUP BY 1, 2
)
SELECT r.subj_cui, r.pred, r.obj_cui AS kept_obj, s.n_objects,
       CAST(r.n_docs AS BIGINT) AS kept_docs, s.total_docs,
       CAST(CAST(r.n_docs AS BIGINT) * 1000000 // s.total_docs AS BIGINT)
         AS kept_share_ppm
FROM ranked r
JOIN slot s ON r.subj_cui = s.subj_cui AND r.pred = s.pred
WHERE r.rk = 1 AND s.n_objects >= 2
"""


# ---------------------------------------------------------------------------
# Per-document entity salience (position + frequency signal).
# ---------------------------------------------------------------------------

def q_entity_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, CUI, tf, first_idx, n_toks, early_ppm, salience_ppm):
    per-document entity salience — the signal an entity-centric indexer
    stores so "documents ABOUT hash join" outranks "documents that
    mention hash join once in a footer".  Two classic features, fused in
    exact integer arithmetic:

    - early_ppm = (n_toks - first_idx) * 1e6 div n_toks — how early the
      FIRST mention lands (title/lede mentions score near 1e6);
    - salience_ppm = early_ppm * tf div (tf + 1) — earliness damped by
      the saturating frequency ratio tf/(tf+1), so a second mention
      matters a lot and the twentieth barely moves it.

    Plan: the occurrence scan (posexplode + broadcast lexicon join, one
    codegen stage) feeds ONE (doc, CUI) groupBy; doc lengths ride the
    same corpus scan and join back on doc_id.  No windows, no floats."""
    from sparkmedkg import webkg

    occ = occ_cached(spark, sf_dir)
    bl = best_links_cached(spark, sf_dir)
    lens = _read_docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("bigint").alias("n_toks"),
    )
    per = (
        occ.join(F.broadcast(bl), "mention")
        .groupBy("doc_id", "CUI")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.min("start_idx").cast("bigint").alias("first_idx"),
        )
    )
    return (
        per.join(lens, "doc_id")
        .select(
            "doc_id",
            "CUI",
            "tf",
            "first_idx",
            "n_toks",
            F.expr("(n_toks - first_idx) * 1000000 div n_toks")
            .cast("bigint")
            .alias("early_ppm"),
            F.expr(
                "((n_toks - first_idx) * 1000000 div n_toks) * tf"
                " div (tf + 1)"
            )
            .cast("bigint")
            .alias("salience_ppm"),
        )
    )


def sql_entity_salience() -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
best_links AS (SELECT mention, cui FROM links WHERE rk = 1),
{_SQL_OCC_CTES.lstrip()},
lens AS (
  SELECT doc_id,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks
  FROM read_docs
),
per AS (
  SELECT o.doc_id, b.cui, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(MIN(o.start_idx) AS BIGINT) AS first_idx
  FROM occ o JOIN best_links b ON b.mention = o.mention
  GROUP BY 1, 2
)
SELECT p.doc_id, p.cui AS CUI, p.tf, p.first_idx, l.n_toks,
       CAST((l.n_toks - p.first_idx) * 1000000 // l.n_toks AS BIGINT)
         AS early_ppm,
       CAST(((l.n_toks - p.first_idx) * 1000000 // l.n_toks) * p.tf
            // (p.tf + 1) AS BIGINT) AS salience_ppm
FROM per p JOIN lens l ON p.doc_id = l.doc_id
"""


# ---------------------------------------------------------------------------
# Predicate surface-pattern mining (lexicalized relation induction).
# ---------------------------------------------------------------------------

PATTERN_TOPK = 3


def q_context_patterns(
    spark: SparkSession,
    sf_dir: str,
    max_gap: int = MAX_GAP,
    topk: int = PATTERN_TOPK,
) -> DataFrame:
    """(l1, l2, pattern, n_occ, rk): the top-``topk`` intervening token
    sequences between subject and object occurrences, per (subject
    label, object label) pair — Hearst-style lexicalized pattern
    induction: where PRED_BY_PAIR types the predicate from the schema,
    this mines WHAT THE TEXT SAYS between the arguments ('' = adjacent),
    the evidence a curator reads before naming a new predicate.

    Plan: the bounded (doc, position) pair join (same shape as
    q_relations) re-joins the token arrays by doc_id to slice the gap
    span JVM-side; the rollup groups by the 16-ish (label-pair, pattern)
    key and the top-k window runs over that aggregate, never the
    occurrence stream."""
    from pyspark.sql import Window as W

    occ = occ_cached(spark, sf_dir)
    subj = occ.select(
        "doc_id",
        F.col("end_idx").alias("a_end"),
        F.col("label").alias("l1"),
        F.explode(
            F.sequence(F.col("end_idx") + 1, F.col("end_idx") + 1 + max_gap)
        ).alias("tgt"),
    )
    obj = occ.select(
        F.col("doc_id").alias("o_doc"),
        F.col("start_idx").alias("b_start"),
        F.col("label").alias("l2"),
    )
    words = _read_docs(spark, sf_dir).select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    pairs = (
        subj.join(
            obj,
            (subj["doc_id"] == obj["o_doc"])
            & (subj["tgt"] == obj["b_start"]),
        )
        .join(words, "doc_id")
        .select(
            "l1",
            "l2",
            F.array_join(
                F.slice(
                    F.col("ws"),
                    F.col("a_end") + 2,
                    F.greatest(
                        F.col("b_start") - F.col("a_end") - 1, F.lit(0)
                    ),
                ),
                " ",
            ).alias("pattern"),
        )
    )
    counts = pairs.groupBy("l1", "l2", "pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    w = W.partitionBy("l1", "l2").orderBy(
        F.desc("n_occ"), F.asc("pattern")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= topk)
    )


def sql_context_patterns(
    max_gap: int = MAX_GAP, topk: int = PATTERN_TOPK
) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_SQL_OCC_CTES.lstrip()},
pairs AS (
  SELECT a.label AS l1, b.label AS l2,
         -- COALESCE: an empty slice stringifies to NULL in DuckDB,
         -- '' in Spark's array_join
         COALESCE(array_to_string(
           list_slice(t.ws, a.end_idx + 2, b.start_idx), ' '), '')
           AS pattern
  FROM occ a
  JOIN occ b ON a.doc_id = b.doc_id
            AND b.start_idx - a.end_idx BETWEEN 1 AND {max_gap + 1}
  JOIN toks t ON t.doc_id = a.doc_id
),
counts AS (
  SELECT l1, l2, pattern, CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM pairs GROUP BY 1, 2, 3
)
SELECT l1, l2, pattern, n_occ, rk FROM (
  SELECT l1, l2, pattern, n_occ,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY l1, l2 ORDER BY n_occ DESC, pattern ASC
         ) AS BIGINT) AS rk
  FROM counts
) WHERE rk <= {topk}
"""


# ---------------------------------------------------------------------------
# Extraction-sensitivity ablation: fact overlap across gap settings.
# ---------------------------------------------------------------------------

def q_gap_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_facts_g1, n_facts_g2, n_shared, jaccard_ppm, growth_ppm): how
    sensitive the extracted fact set is to the co-occurrence window —
    the distinct typed triples at max_gap=1 vs the default max_gap=2.
    A small Jaccard says the window is load-bearing (facts are
    window-artifacts); growth_ppm = extra facts per million when the
    window widens.  The ablation a KG builder publishes with the
    extraction config.

    Plan: two runs of the bounded extraction chain (the narrower one
    strictly cheaper), one (3-col) distinct join for the intersection,
    1-row rollup."""
    g1 = q_relations(spark, sf_dir, max_gap=1).select(*FACT).distinct()
    g2 = q_relations(spark, sf_dir, max_gap=MAX_GAP).select(*FACT).distinct()
    shared = g1.join(g2, FACT)
    return (
        g1.agg(F.count(F.lit(1)).cast("bigint").alias("n_facts_g1"))
        .crossJoin(
            F.broadcast(
                g2.agg(F.count(F.lit(1)).cast("bigint").alias("n_facts_g2"))
            )
        )
        .crossJoin(
            F.broadcast(
                shared.agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
            )
        )
        .select(
            "n_facts_g1",
            "n_facts_g2",
            "n_shared",
            F.expr(
                "n_shared * 1000000"
                " div (n_facts_g1 + n_facts_g2 - n_shared)"
            )
            .cast("bigint")
            .alias("jaccard_ppm"),
            F.expr(
                "(n_facts_g2 - n_shared) * 1000000"
                " div greatest(n_facts_g1, 1)"
            )
            .cast("bigint")
            .alias("growth_ppm"),
        )
    )


def sql_gap_ablation() -> str:
    return f"""
WITH g1 AS (
  SELECT DISTINCT subj_cui, pred, obj_cui FROM ({sql_relations(1)}) x
),
g2 AS (
  SELECT DISTINCT subj_cui, pred, obj_cui FROM ({sql_relations(MAX_GAP)}) y
),
sh AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM g1 JOIN g2 USING (subj_cui, pred, obj_cui)
),
c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_facts_g1 FROM g1),
c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_facts_g2 FROM g2)
SELECT c1.n_facts_g1, c2.n_facts_g2, sh.n_shared,
       CAST(sh.n_shared * 1000000
            // (c1.n_facts_g1 + c2.n_facts_g2 - sh.n_shared) AS BIGINT)
         AS jaccard_ppm,
       CAST((c2.n_facts_g2 - sh.n_shared) * 1000000
            // GREATEST(c1.n_facts_g1, 1) AS BIGINT) AS growth_ppm
FROM c1 CROSS JOIN c2 CROSS JOIN sh
"""


# ---------------------------------------------------------------------------
# Forward-chaining rule application (KG completion from mined rules).
# ---------------------------------------------------------------------------

RULE_CONF_MIN_PPM = 500_000  # apply only rules with std-confidence >= 0.5


def q_rule_inference(
    spark: SparkSession,
    sf_dir: str,
    min_conf_ppm: int = RULE_CONF_MIN_PPM,
    fanout_cap: int = CHAIN_FANOUT_CAP,
) -> DataFrame:
    """(rule_type, head_pred, body_pred_1, body_pred_2, subj_cui,
    obj_cui, conf_ppm): ONE forward-chaining step of the mined AMIE
    rules — every NEW fact (not already extracted from text) that a
    confident rule derives, tagged with the rule that produced it and
    its confidence.  This is the KG-completion payoff of rule mining:
    inverse rules materialize the missing direction of asymmetric
    extractions; chain rules bridge 2-hop compositions.  One fact can
    appear once per deriving rule (it's a provenance table — the loader
    aggregates confidence, e.g. by noisy-or, before merging).

    Scale shape: rules are a broadcast-sized table joined on the
    predicate column; the chain body reuses the SAME hot-mid cap
    (din*dout > fanout_cap) as the miner, so inference can never blow up
    on a hub the miner refused to count; the new-fact check is one
    anti-join against the fact table."""
    facts = q_relations(spark, sf_dir).select(*FACT).distinct()
    rules = q_amie_rules(spark, sf_dir, fanout_cap=fanout_cap).where(
        F.col("conf_ppm") >= min_conf_ppm
    )
    inv_rules = rules.where(F.col("rule_type") == "inverse").select(
        "head_pred", "body_pred_1", "conf_ppm"
    )
    inv = (
        facts.join(
            F.broadcast(inv_rules),
            facts["pred"] == inv_rules["body_pred_1"],
        )
        .select(
            F.lit("inverse").alias("rule_type"),
            "head_pred",
            "body_pred_1",
            F.lit("").alias("body_pred_2"),
            F.col("obj_cui").alias("s"),
            F.col("subj_cui").alias("o"),
            "conf_ppm",
        )
    )
    ch_rules = rules.where(F.col("rule_type") == "chain").select(
        "head_pred", "body_pred_1", "body_pred_2", "conf_ppm"
    )
    din = facts.groupBy(F.col("obj_cui").alias("z")).agg(
        F.count(F.lit(1)).alias("din")
    )
    dout = facts.groupBy(F.col("subj_cui").alias("z")).agg(
        F.count(F.lit(1)).alias("dout")
    )
    hot = (
        din.join(dout, "z")
        .where(F.col("din") * F.col("dout") > fanout_cap)
        .select("z")
    )
    b1 = facts.select(
        F.col("pred").alias("p1"),
        F.col("subj_cui").alias("x"),
        F.col("obj_cui").alias("z"),
    ).join(F.broadcast(hot), "z", "left_anti")
    b2 = facts.select(
        F.col("pred").alias("p2"),
        F.col("subj_cui").alias("z"),
        F.col("obj_cui").alias("y"),
    )
    chain = (
        b1.join(b2, "z")
        .where(F.col("x") != F.col("y"))
        .join(
            F.broadcast(ch_rules),
            (F.col("p1") == F.col("body_pred_1"))
            & (F.col("p2") == F.col("body_pred_2")),
        )
        .select(
            F.lit("chain").alias("rule_type"),
            "head_pred",
            "body_pred_1",
            "body_pred_2",
            F.col("x").alias("s"),
            F.col("y").alias("o"),
            "conf_ppm",
        )
        .distinct()
    )
    cand = inv.unionByName(chain)
    existing = facts.select(
        F.col("pred").alias("head_pred"),
        F.col("subj_cui").alias("s"),
        F.col("obj_cui").alias("o"),
    )
    return (
        cand.join(existing, ["head_pred", "s", "o"], "left_anti")
        .where(F.col("s") != F.col("o"))
        .select(
            "rule_type",
            "head_pred",
            "body_pred_1",
            "body_pred_2",
            F.col("s").alias("subj_cui"),
            F.col("o").alias("obj_cui"),
            "conf_ppm",
        )
        .distinct()
    )


def sql_rule_inference(
    min_conf_ppm: int = RULE_CONF_MIN_PPM,
    fanout_cap: int = CHAIN_FANOUT_CAP,
    max_gap: int = MAX_GAP,
) -> str:
    return f"""
WITH {_sql_facts_ctes(max_gap)},
rules AS MATERIALIZED (
  SELECT * FROM ({sql_amie_rules()}) r WHERE r.conf_ppm >= {min_conf_ppm}
),
f AS MATERIALIZED (SELECT subj_cui, pred, obj_cui FROM facts),
inv AS (
  SELECT 'inverse' AS rule_type, r.head_pred, r.body_pred_1,
         '' AS body_pred_2, f.obj_cui AS s, f.subj_cui AS o, r.conf_ppm
  FROM f JOIN rules r
    ON r.rule_type = 'inverse' AND f.pred = r.body_pred_1
),
din AS (SELECT obj_cui AS z, COUNT(*) AS din FROM f GROUP BY 1),
dout AS (SELECT subj_cui AS z, COUNT(*) AS dout FROM f GROUP BY 1),
hot AS (
  SELECT din.z FROM din JOIN dout ON din.z = dout.z
  WHERE din.din * dout.dout > {fanout_cap}
),
b1 AS (
  SELECT pred AS p1, subj_cui AS x, obj_cui AS z FROM f
  WHERE obj_cui NOT IN (SELECT z FROM hot)
),
chain AS (
  SELECT DISTINCT 'chain' AS rule_type, r.head_pred, r.body_pred_1,
         r.body_pred_2, b1.x AS s, b2.obj_cui AS o, r.conf_ppm
  FROM b1
  JOIN f b2 ON b1.z = b2.subj_cui AND b1.x <> b2.obj_cui
  JOIN rules r ON r.rule_type = 'chain'
             AND b1.p1 = r.body_pred_1 AND b2.pred = r.body_pred_2
),
cand AS (SELECT * FROM inv UNION ALL SELECT * FROM chain)
SELECT DISTINCT c.rule_type, c.head_pred, c.body_pred_1, c.body_pred_2,
       c.s AS subj_cui, c.o AS obj_cui, c.conf_ppm
FROM cand c
WHERE c.s <> c.o
  AND NOT EXISTS (
    SELECT 1 FROM f WHERE f.pred = c.head_pred
      AND f.subj_cui = c.s AND f.obj_cui = c.o
  )
"""


# ---------------------------------------------------------------------------
# PathSim: metapath-normalized similarity (Sun et al., VLDB 2011).
# ---------------------------------------------------------------------------

PATHSIM_PPM = 1_000_000


def q_pathsim(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(cui_a, cui_b, n_shared_docs, pathsim_ppm): PathSim similarity over
    the symmetric Entity-Document-Entity metapath — s(i, j) = 2 * M_ij /
    (M_ii + M_jj), where M_ij counts documents mentioning both entities
    and M_ii the documents mentioning i at all.  Unlike the raw
    co-occurrence count (kg_cooccurrence), PathSim normalizes away hub
    visibility: two mid-frequency entities that always appear together
    outrank a rare entity glued to a hub — the heterogeneous-graph
    similarity used for typed top-k entity retrieval.  Exact integer ppm.

    Plan: the (url, CUI) incidence builds once (shared _doc_cui lineage,
    persisted); the commuting-matrix entries come from the SAME
    support-thresholded pair join as the edge builder (never all-pairs —
    candidates are bounded by per-doc entity counts); the |V|-row
    diagonal broadcasts onto the pair aggregate."""
    dc = doc_cui_cached(spark, sf_dir)
    a = dc.select(F.col("url").alias("u"), F.col("CUI").alias("cui_a"))
    b = dc.select(F.col("url").alias("u"), F.col("CUI").alias("cui_b"))
    pair = (
        a.join(b, "u")
        .where(F.col("cui_a") < F.col("cui_b"))
        .groupBy("cui_a", "cui_b")
        .agg(F.count(F.lit(1)).alias("n_shared_docs"))
        .where(F.col("n_shared_docs") >= min_docs)
    )
    diag = dc.groupBy("CUI").agg(F.count(F.lit(1)).alias("n"))
    return (
        pair.join(
            F.broadcast(
                diag.select(F.col("CUI").alias("cui_a"), F.col("n").alias("na"))
            ),
            "cui_a",
        )
        .join(
            F.broadcast(
                diag.select(F.col("CUI").alias("cui_b"), F.col("n").alias("nb"))
            ),
            "cui_b",
        )
        .select(
            "cui_a",
            "cui_b",
            "n_shared_docs",
            F.expr(f"div(2 * n_shared_docs * {PATHSIM_PPM}, na + nb)")
            .cast("bigint")
            .alias("pathsim_ppm"),
        )
    )


def sql_pathsim(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{_links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
pair AS (
  SELECT a.cui AS cui_a, b.cui AS cui_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_docs
  FROM doc_cui a JOIN doc_cui b
    ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_docs}
),
diag AS (SELECT cui, CAST(COUNT(*) AS BIGINT) AS n FROM doc_cui GROUP BY cui)
SELECT cui_a, cui_b, n_shared_docs,
       CAST(2 * n_shared_docs * {PATHSIM_PPM} // (da.n + db.n)
            AS BIGINT) AS pathsim_ppm
FROM pair JOIN diag da ON da.cui = pair.cui_a
          JOIN diag db ON db.cui = pair.cui_b
"""
