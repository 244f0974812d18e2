"""Ontology hierarchy operators: IS_A transitive closure + category rollup.

Medical KGs lean on concept hierarchies (UMLS/SNOMED IS_A DAGs) for
subsumption queries — "count every mention of ANY anticonvulsant" — which
the reference app answers only concept-by-concept.  These operators give
the engine the bulk form:

- ``ontology_closure``: all (concept, ancestor, min_depth) pairs of the
  IS_A DAG, by semi-naive iteration (each round extends only the newest
  frontier of paths, never re-deriving old ones).  Real ontology
  hierarchies are small relative to the corpus (UMLS MRHIER is ~GB against
  a 100 TB corpus), so every per-round join broadcasts the edge set; the
  loop depth is the DAG height (~15 for SNOMED), not |V|.
- ``category_rollup``: corpus mention counts aggregated up the hierarchy —
  one broadcast join of the (tiny) closure against the (huge) mention
  stream, then a map-side-combinable count.  The corpus is touched once;
  no shuffle keyed on anything wider than the ancestor id.

The web-lexicon DAG below (shape mirror of the medical one, see
webkg.WEB_CONCEPTS) includes a diamond — ``hash join -> join operator ->
{physical operator, binary operator} -> relational concept`` — so the
min-depth dedup across alternative paths is actually exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import webkg

# (child, parent) IS_A edges over the web lexicon, plus category concepts
# W0100+ that exist only in the hierarchy (not in the alias index).
WEB_HIERARCHY: list[tuple[str, str]] = [
    ("W0001", "W0100"),  # hash join        IS_A join operator
    ("W0002", "W0100"),  # sort merge join  IS_A join operator
    ("W0100", "W0101"),  # join operator    IS_A physical operator
    ("W0100", "W0106"),  # join operator    IS_A binary operator   (diamond)
    ("W0106", "W0102"),  # binary operator  IS_A relational concept
    ("W0003", "W0101"),  # table scan       IS_A physical operator
    ("W0004", "W0101"),
    ("W0005", "W0101"),
    ("W0006", "W0101"),
    ("W0007", "W0101"),
    ("W0101", "W0102"),  # physical operator IS_A relational concept
    ("W0008", "W0102"),  # query            IS_A relational concept
    ("W0010", "W0103"),  # table            IS_A data structure
    ("W0011", "W0103"),
    ("W0012", "W0103"),
    ("W0013", "W0103"),
    ("W0014", "W0103"),
    ("W0015", "W0103"),
    ("W0016", "W0103"),
    ("W0017", "W0103"),
    ("W0018", "W0103"),
    ("W0103", "W0102"),  # data structure   IS_A relational concept
]


def _edges_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(WEB_HIERARCHY, "cui string, ancestor string")


#: Session-scoped literal ontology tables.  The hierarchy is KB-sized
#: engine metadata (UMLS MRHIER is ~GB — still driver-sized), so its
#: derived tables (closure, layering, path counts) are computed ONCE on
#: the driver and enter every plan as broadcast literals — zero Spark
#: jobs, zero iterative isEmpty probes.  Corpus-scale tables never flow
#: through these functions; the distributed semi-naive shape is kept (and
#: tested equal) in ``closure_distributed`` for hierarchies too big to
#: hold driver-side.
_ONTO_CACHE: dict[tuple, DataFrame] = {}


def _onto_cached(spark: SparkSession, tag: str, builder) -> DataFrame:
    key = (spark.sparkContext.applicationId, tag)
    hit = _ONTO_CACHE.get(key)
    if hit is None:
        hit = builder()
        if len(_ONTO_CACHE) >= 16:
            _ONTO_CACHE.clear()
        _ONTO_CACHE[key] = hit
    return hit


def closure_rows() -> list[tuple[str, str, int]]:
    """Driver-side BFS transitive closure of WEB_HIERARCHY with shortest
    derivation depth — the literal behind ``ontology_closure``."""
    from collections import defaultdict, deque

    parents = defaultdict(list)
    for c, p in WEB_HIERARCHY:
        parents[c].append(p)
    out = []
    for start in sorted({c for c, _ in WEB_HIERARCHY}):
        depth = {start: 0}
        dq = deque([start])
        while dq:
            u = dq.popleft()
            for p in parents.get(u, ()):
                if p not in depth:
                    depth[p] = depth[u] + 1
                    dq.append(p)
        out.extend(
            (start, anc, d) for anc, d in sorted(depth.items()) if d > 0
        )
    return out


def ontology_closure(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """(cui, ancestor, min_depth): transitive closure of the IS_A DAG.

    The ontology is engine metadata, not data — so the closure is a
    driver-side BFS over the edge list, memoized per session and handed
    to Catalyst as a literal (broadcastable) DataFrame: every consumer
    (rollup, coverage, LCA, Wu-Palmer, Resnik/Lin, reduction, cycle
    audit) composes it with ZERO extra jobs.  ``closure_distributed``
    keeps the semi-naive join loop for hierarchies beyond driver memory,
    and the tests pin both paths row-identical.  ``sf_dir`` is unused
    (engine-constant data) but kept for the queries() convention."""
    return _onto_cached(
        spark,
        "closure",
        lambda: spark.createDataFrame(
            closure_rows(), "cui string, ancestor string, min_depth int"
        ),
    )


def closure_distributed(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """The distributed semi-naive closure (the shape you run when the
    hierarchy itself is data-scale): the frontier (paths discovered last
    round) joins the broadcast edge set; fixpoint when a round adds
    nothing.  Distinct per round keeps diamond fan-out from exploding
    path counts; per-round localCheckpoint keeps round k from re-running
    rounds 1..k-1 under the isEmpty probe; the final groupBy takes the
    shortest derivation."""
    edges = _edges_df(spark)
    step = F.broadcast(
        edges.select(
            F.col("cui").alias("_from"), F.col("ancestor").alias("_to")
        )
    )
    paths = edges.withColumn("d", F.lit(1))
    frontier = paths
    for _ in range(32):  # bound = DAG height; real ontologies ~15
        nxt = (
            frontier.join(step, frontier["ancestor"] == step["_from"])
            .select("cui", F.col("_to").alias("ancestor"), (F.col("d") + 1).alias("d"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        paths = paths.unionByName(nxt)
        frontier = nxt
    return paths.groupBy("cui", "ancestor").agg(F.min("d").alias("min_depth"))


def _sql_hier_cte() -> str:
    vals = ", ".join(f"('{c}', '{p}')" for c, p in sorted(WEB_HIERARCHY))
    return f"hier(cui, ancestor) AS (SELECT * FROM (VALUES {vals}))"


def sql_ontology_closure() -> str:
    return f"""
WITH RECURSIVE {_sql_hier_cte()},
reach(cui, ancestor, d) AS (
  SELECT cui, ancestor, 1 FROM hier
  UNION ALL
  SELECT r.cui, h.ancestor, r.d + 1
  FROM reach r JOIN hier h ON h.cui = r.ancestor
)
SELECT cui, ancestor, MIN(d) AS min_depth
FROM reach GROUP BY cui, ancestor
"""


def _mentions_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """webkg.q_mentions, checkpointed once per session+sf_dir (the
    relations._KG_CACHE materialized-view strategy): category_rollup,
    coverage_report and resnik_lin all start from the same corpus-sized
    NER pass, and a suite of ontology queries should pay it once."""
    from sparkmedkg.relations import _kg_cached

    return _kg_cached(
        spark, "webm", (sf_dir,), lambda: webkg.q_mentions(spark, sf_dir)
    )


def category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ancestor, n_docs, n_mentions): corpus mention volume per ontology
    category, counting a mention toward EVERY ancestor on its IS_A chain
    (subsumption semantics — a 'hash join' mention is also a 'join
    operator', 'physical operator', ... mention).  Ambiguous aliases count
    toward each of their concepts, mirroring the linker's candidate
    semantics.

    Plan: the corpus-sized mention stream is joined once against the
    broadcast (alias -> concept -> ancestor) expansion, then a single
    partial/final count-distinct aggregation on the ancestor id."""
    mentions = _mentions_cached(spark, sf_dir)  # (doc_id, mention, label)
    alias_cui = F.broadcast(
        spark.createDataFrame(
            sorted(set(webkg.WEB_ALIASES)), "alias string, cui string"
        )
    )
    closure = F.broadcast(ontology_closure(spark))
    return (
        mentions.join(alias_cui, mentions["mention"] == alias_cui["alias"])
        .join(closure, "cui")
        .groupBy("ancestor")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
    )


def sql_category_rollup() -> str:
    alias_vals = ", ".join(
        f"('{a}', '{c}')" for a, c in sorted(set(webkg.WEB_ALIASES))
    )
    return f"""
WITH RECURSIVE {webkg.sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
mentions AS (
  SELECT DISTINCT d.doc_id, a.alias AS mention, a.label
  FROM {webkg._MENTION_FROM}
),
alias_cui(alias, cui) AS (SELECT * FROM (VALUES {alias_vals})),
{_sql_hier_cte()},
reach(cui, ancestor, d) AS (
  SELECT cui, ancestor, 1 FROM hier
  UNION ALL
  SELECT r.cui, h.ancestor, r.d + 1
  FROM reach r JOIN hier h ON h.cui = r.ancestor
),
closure AS (SELECT DISTINCT cui, ancestor FROM reach)
SELECT c.ancestor,
       COUNT(DISTINCT m.doc_id) AS n_docs,
       COUNT(*) AS n_mentions
FROM mentions m
JOIN alias_cui ac ON ac.alias = m.mention
JOIN closure c ON c.cui = ac.cui
GROUP BY c.ancestor
"""


# ---------------------------------------------------------------------------
# Lowest common ancestor per concept pair (subsumption similarity).
# ---------------------------------------------------------------------------

def lca_pairs(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """(a, b, lca, da, db): for each unordered pair of child concepts in
    the IS_A DAG, the lowest common ancestor — the common self-or-ancestor
    minimizing combined depth da + db, ties broken by ancestor id.
    Depths count IS_A hops (0 = the concept itself), so (da, db) feed
    Wu-Palmer-style subsumption similarity directly.  Pairs with no
    common ancestor are absent.

    Scale: everything here is ontology-sized (closure, pair self-join,
    per-pair argmin window) — a broadcastable universe at UMLS scale
    (~4M concepts), never touching the corpus.  sf_dir is unused
    (engine-constant data) but kept for the queries() convention."""
    from pyspark.sql import Window

    closure = ontology_closure(spark)
    members = (
        _edges_df(spark).select("cui")
        .unionByName(_edges_df(spark).select(F.col("ancestor").alias("cui")))
        .distinct()
    )
    selfrows = members.select(
        "cui", F.col("cui").alias("ancestor"), F.lit(0).alias("min_depth")
    )
    anc = closure.unionByName(selfrows)
    leaves = _edges_df(spark).select("cui").distinct()
    # explicit broadcast: the theta-only (a < b) pair join must plan as
    # BroadcastNestedLoopJoin over the ontology-sized leaf set, never a
    # CartesianProduct (tools/plan_sweep.py gates this)
    pairs = leaves.select(F.col("cui").alias("a")).join(
        F.broadcast(leaves.select(F.col("cui").alias("b"))),
        F.col("a") < F.col("b"),
    )
    j = pairs.join(
        anc.select(F.col("cui").alias("a"), "ancestor",
                   F.col("min_depth").alias("da")),
        "a",
    ).join(
        anc.select(F.col("cui").alias("b"), "ancestor",
                   F.col("min_depth").alias("db")),
        ["b", "ancestor"],
    )
    w = Window.partitionBy("a", "b").orderBy(
        (F.col("da") + F.col("db")).asc(), F.col("ancestor")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("a", "b", F.col("ancestor").alias("lca"), "da", "db")
    )


def sql_lca_pairs() -> str:
    return f"""
WITH RECURSIVE {_sql_hier_cte()},
reach(cui, ancestor, d) AS (
  SELECT cui, ancestor, 1 FROM hier
  UNION ALL
  SELECT r.cui, h.ancestor, r.d + 1
  FROM reach r JOIN hier h ON h.cui = r.ancestor
),
closure AS (SELECT cui, ancestor, MIN(d) AS d FROM reach GROUP BY cui, ancestor),
members AS (
  SELECT DISTINCT cui FROM (SELECT cui FROM hier UNION ALL SELECT ancestor FROM hier)
),
anc AS (
  SELECT cui, ancestor, d FROM closure
  UNION ALL SELECT cui, cui, 0 FROM members
),
leaves AS (SELECT DISTINCT cui FROM hier),
pairs AS (
  SELECT x.cui AS a, y.cui AS b FROM leaves x JOIN leaves y ON x.cui < y.cui
),
j AS (
  SELECT p.a, p.b, ca.ancestor, ca.d AS da, cb.d AS db
  FROM pairs p
  JOIN anc ca ON ca.cui = p.a
  JOIN anc cb ON cb.cui = p.b AND cb.ancestor = ca.ancestor
),
r AS (
  SELECT a, b, ancestor, da, db,
         ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY da + db, ancestor) AS rk
  FROM j
)
SELECT a, b, ancestor AS lca, da, db FROM r WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Transitive reduction (Hasse diagram recovery from a flattened closure).
# ---------------------------------------------------------------------------

def ontology_reduction(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """(cui, ancestor): the transitive REDUCTION of the IS_A reachability
    relation — the minimal covering-pair set whose closure reproduces
    ``ontology_closure`` exactly.  This is the inverse ingestion problem:
    distributions like UMLS MRHIER ship FLATTENED ancestor tables, and a
    KG builder must recover the Hasse diagram before storing edges (else
    every concept links to every ancestor and path semantics are lost).
    A closure pair (c, a) is covering iff no midpoint m exists with
    c ~> m ~> a.

    Plan: the closure is ontology-sized (tiny next to the corpus), so the
    midpoint self-join runs broadcast x broadcast and the anti-join
    eliminates derivable pairs — zero corpus-scale shuffles; at UMLS scale
    (~10^7 closure rows) the self-join keys on the mid column with the
    usual partial-agg dedup."""
    closure = ontology_closure(spark, sf_dir).select("cui", "ancestor")
    mid = (
        closure.select(F.col("cui"), F.col("ancestor").alias("m"))
        .join(
            F.broadcast(
                closure.select(F.col("cui").alias("m"), F.col("ancestor"))
            ),
            "m",
        )
        .select("cui", "ancestor")
        .distinct()
    )
    # ontology-sized both sides: broadcast the derivable-pair set into the
    # anti-join rather than letting the unknown-stats aggregate fall to SMJ
    return closure.join(F.broadcast(mid), ["cui", "ancestor"], "left_anti")


def sql_ontology_reduction() -> str:
    return f"""
WITH RECURSIVE {_sql_hier_cte()},
reach(cui, ancestor) AS (
  SELECT cui, ancestor FROM hier
  UNION
  SELECT r.cui, h.ancestor
  FROM reach r JOIN hier h ON h.cui = r.ancestor
),
mid AS (
  SELECT DISTINCT a.cui, b.ancestor
  FROM reach a JOIN reach b ON b.cui = a.ancestor
)
SELECT cui, ancestor FROM reach
EXCEPT
SELECT cui, ancestor FROM mid
"""


# ---------------------------------------------------------------------------
# KG coverage report: observed vs possible concepts per ontology category.
# ---------------------------------------------------------------------------

def coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ancestor, n_concepts, n_observed, coverage): for every ontology
    category, how many of its descendant concepts the corpus KG actually
    observed (mentioned anywhere) vs how many the ontology defines — the
    completeness audit a KG curator reads to find blind spots ('we ingest
    join-operator pages but zero data-structure pages') and the drift
    check between ontology releases and crawl scope.

    Plan: the denominator is pure ontology data (broadcast closure
    rollup); the numerator joins the DISTINCT observed concept set (a
    lexicon-sized table after the mention distinct) against the same
    broadcast closure — the corpus is scanned once by the mention pass,
    everything downstream is ontology-sized."""
    mentions = _mentions_cached(spark, sf_dir)
    alias_cui = F.broadcast(
        spark.createDataFrame(
            sorted(set(webkg.WEB_ALIASES)), "alias string, cui string"
        )
    )
    closure = F.broadcast(ontology_closure(spark).select("cui", "ancestor"))
    possible = closure.groupBy("ancestor").agg(
        F.countDistinct("cui").alias("n_concepts")
    )
    observed_cuis = (
        mentions.join(alias_cui, mentions["mention"] == alias_cui["alias"])
        .select("cui")
        .distinct()
    )
    observed = (
        closure.join(observed_cuis, "cui")
        .groupBy("ancestor")
        .agg(F.countDistinct("cui").alias("n_observed"))
    )
    return (
        possible.join(observed, "ancestor", "left")
        .select(
            "ancestor",
            "n_concepts",
            F.coalesce(F.col("n_observed"), F.lit(0).cast("bigint")).alias(
                "n_observed"
            ),
            F.round(
                F.coalesce(F.col("n_observed"), F.lit(0)).cast("double")
                / F.col("n_concepts"),
                6,
            ).alias("coverage"),
        )
    )


def sql_coverage_report() -> str:
    alias_vals = ", ".join(
        f"('{a}', '{c}')" for a, c in sorted(set(webkg.WEB_ALIASES))
    )
    return f"""
WITH RECURSIVE {webkg.sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
mentions AS (
  SELECT DISTINCT d.doc_id, a.alias AS mention, a.label
  FROM {webkg._MENTION_FROM}
),
alias_cui(alias, cui) AS (SELECT * FROM (VALUES {alias_vals})),
{_sql_hier_cte()},
reach(cui, ancestor, d) AS (
  SELECT cui, ancestor, 1 FROM hier
  UNION ALL
  SELECT r.cui, h.ancestor, r.d + 1
  FROM reach r JOIN hier h ON h.cui = r.ancestor
),
closure AS (SELECT DISTINCT cui, ancestor FROM reach),
possible AS (
  SELECT ancestor, COUNT(DISTINCT cui) AS n_concepts
  FROM closure GROUP BY ancestor
),
observed_cuis AS (
  SELECT DISTINCT ac.cui
  FROM mentions m JOIN alias_cui ac ON ac.alias = m.mention
),
observed AS (
  SELECT c.ancestor, COUNT(DISTINCT c.cui) AS n_observed
  FROM closure c JOIN observed_cuis o ON o.cui = c.cui
  GROUP BY c.ancestor
)
SELECT p.ancestor, p.n_concepts, COALESCE(o.n_observed, 0) AS n_observed,
       round(COALESCE(o.n_observed, 0)::DOUBLE / p.n_concepts, 6)
         AS coverage
FROM possible p LEFT JOIN observed o ON p.ancestor = o.ancestor
"""


# ---------------------------------------------------------------------------
# Topological layering (longest-path layers = Kahn peel order).
# ---------------------------------------------------------------------------

def topo_layers(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """(node, layer): longest-path layering of the IS_A DAG — layer 0 is
    every leaf concept (no incoming IS_A edge), and layer(n) = 1 + the
    longest chain of descendants below n.  Sorting by layer gives a valid
    topological order (every edge goes strictly upward), which is what a
    bulk ontology loader needs to materialize parents after children, and
    what a cycle check falls out of for free (a node never peeled has a
    cycle under it — impossible here by construction, asserted in tests).

    Like ``ontology_closure``, this is engine metadata: the longest-path
    DP runs driver-side over the edge list (memoized per session) and
    lands in the plan as a literal DataFrame — no iterative frontier
    jobs for a KB-sized hierarchy.  A data-scale hierarchy would reuse
    the ``closure_distributed`` frontier shape with a MAX fold.
    ``sf_dir`` unused (engine-constant data), kept for the queries()
    convention."""

    def build() -> DataFrame:
        from collections import defaultdict
        from functools import lru_cache

        children = defaultdict(list)
        for c, p in WEB_HIERARCHY:
            children[p].append(c)

        @lru_cache(maxsize=None)
        def longest_ending_at(n: str) -> int:
            # M(n) = longest edge-path ending at n (0 when no child)
            return max(
                (longest_ending_at(c) + 1 for c in children.get(n, ())),
                default=0,
            )

        nodes = sorted(
            {c for e in WEB_HIERARCHY for c in e}
        )
        rows = [(n, longest_ending_at(n)) for n in nodes]
        return spark.createDataFrame(rows, "node string, layer bigint")

    return _onto_cached(spark, "topo", build)


def sql_topo_layers() -> str:
    return f"""
WITH RECURSIVE {_sql_hier_cte()},
reach(cui, ancestor, d) AS (
  SELECT cui, ancestor, 1 FROM hier
  UNION ALL
  SELECT r.cui, h.ancestor, r.d + 1
  FROM reach r JOIN hier h ON h.cui = r.ancestor
),
nodes AS (SELECT cui AS node FROM hier UNION SELECT ancestor FROM hier),
inner_layers AS (
  SELECT ancestor AS node, CAST(MAX(d) AS BIGINT) AS layer
  FROM reach GROUP BY ancestor
)
SELECT node, layer FROM inner_layers
UNION ALL
SELECT n.node, CAST(0 AS BIGINT) AS layer
FROM nodes n LEFT JOIN inner_layers i ON i.node = n.node
WHERE i.node IS NULL
"""


# ---------------------------------------------------------------------------
# Wu-Palmer subsumption similarity per concept pair.
# ---------------------------------------------------------------------------

def wu_palmer(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """(a, b, lca, d_lca, wp_ppm): Wu-Palmer similarity for every leaf
    concept pair — sim = 2*N3 / (N1 + N2 + 2*N3), with N1/N2 the IS_A
    hops from each concept up to the LCA (lca_pairs' da/db) and N3 the
    LCA's own depth below the root (its max min-hop distance to any root
    — the deepest-root convention keeps multi-root DAGs deterministic).
    The ontology-similarity number (UMLS::Similarity's wup) that
    concept-level dedup and retrieval expansion threshold on.

    Kept EXACT: hops are integers, so the similarity is a rational —
    emitted in ppm by integer division, no float anywhere.  Plan:
    composes the already-gated lca_pairs output with one broadcast
    root-depth lookup; everything is ontology-sized."""
    closure = ontology_closure(spark)
    children = _edges_df(spark).select("cui").distinct()
    roots = (
        _edges_df(spark)
        .select(F.col("ancestor").alias("cui"))
        .distinct()
        .join(children, "cui", "left_anti")
    )
    d3 = (
        closure.join(
            roots.select(F.col("cui").alias("ancestor")), "ancestor"
        )
        .groupBy("cui")
        .agg(F.max("min_depth").cast("bigint").alias("d_lca"))
    )
    lp = lca_pairs(spark, sf_dir)
    return (
        lp.join(
            F.broadcast(d3.select(F.col("cui").alias("lca"), "d_lca")),
            "lca",
            "left",
        )
        .na.fill({"d_lca": 0})  # the LCA is itself a root
        .select(
            "a",
            "b",
            "lca",
            "d_lca",
            F.expr("2 * d_lca * 1000000 div (da + db + 2 * d_lca)")
            .cast("bigint")
            .alias("wp_ppm"),
        )
    )


def sql_wu_palmer() -> str:
    return f"""
WITH RECURSIVE {_sql_hier_cte()},
reach(cui, ancestor, d) AS (
  SELECT cui, ancestor, 1 FROM hier
  UNION ALL
  SELECT r.cui, h.ancestor, r.d + 1
  FROM reach r JOIN hier h ON h.cui = r.ancestor
),
closure AS (SELECT cui, ancestor, MIN(d) AS d FROM reach GROUP BY cui, ancestor),
members AS (
  SELECT DISTINCT cui FROM (SELECT cui FROM hier UNION ALL SELECT ancestor FROM hier)
),
anc AS (
  SELECT cui, ancestor, d FROM closure
  UNION ALL SELECT cui, cui, 0 FROM members
),
leaves AS (SELECT DISTINCT cui FROM hier),
pairs AS (
  SELECT x.cui AS a, y.cui AS b FROM leaves x JOIN leaves y ON x.cui < y.cui
),
j AS (
  SELECT p.a, p.b, ca.ancestor, ca.d AS da, cb.d AS db
  FROM pairs p
  JOIN anc ca ON ca.cui = p.a
  JOIN anc cb ON cb.cui = p.b AND cb.ancestor = ca.ancestor
),
r AS (
  SELECT a, b, ancestor, da, db,
         ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY da + db, ancestor) AS rk
  FROM j
),
lca AS (SELECT a, b, ancestor AS lca, da, db FROM r WHERE rk = 1),
roots AS (
  SELECT DISTINCT ancestor AS cui FROM hier
  WHERE ancestor NOT IN (SELECT cui FROM hier)
),
d3 AS (
  SELECT c.cui, CAST(MAX(c.d) AS BIGINT) AS d_lca
  FROM closure c JOIN roots ro ON ro.cui = c.ancestor
  GROUP BY c.cui
)
SELECT l.a, l.b, l.lca,
       CAST(COALESCE(d3.d_lca, 0) AS BIGINT) AS d_lca,
       CAST(2 * COALESCE(d3.d_lca, 0) * 1000000
            // (l.da + l.db + 2 * COALESCE(d3.d_lca, 0)) AS BIGINT)
         AS wp_ppm
FROM lca l LEFT JOIN d3 ON d3.cui = l.lca
"""


# ---------------------------------------------------------------------------
# Distinct IS_A path counts up to the roots.
# ---------------------------------------------------------------------------

PATHS_MAX_DEPTH = 12


def path_counts(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """(cui, root, n_paths): how many DISTINCT edge-paths lead from each
    concept up to each reachable root of the IS_A DAG.  Where the closure
    answers "is a reachable from b", the path count measures ontology
    multi-inheritance mass — concepts with many derivation paths are the
    diamond hot spots that make naive closure materialization explode, so
    this is the audit you run BEFORE sizing a closure job.

    Length-stratified dynamic program, all BIGINT: L1 = the edge set with
    multiplicity 1; L(k) extends L(k-1) by one broadcast edge join and
    compacts with a (cui, anc) grouped SUM, so diamond fan-out costs one
    integer add, never an enumerated path.  As with the closure, the
    hierarchy is engine metadata, so the DP runs driver-side (memoized
    per session, ``PATHS_MAX_DEPTH`` bounding path length exactly like
    the distributed rounds would) and enters the plan as a literal;
    the ``closure_distributed`` frontier shape with a SUM fold is the
    data-scale variant.  Roots = ancestors that are never a child."""

    def build() -> DataFrame:
        from collections import defaultdict

        children = {c for c, _ in WEB_HIERARCHY}
        roots = sorted(
            {p for _, p in WEB_HIERARCHY if p not in children}
        )
        # level[k][(cui, anc)] = #paths of length k; accumulate root hits
        level = defaultdict(int)
        for c, p in WEB_HIERARCHY:
            level[(c, p)] += 1
        step = defaultdict(list)
        for c, p in WEB_HIERARCHY:
            step[c].append(p)
        total = defaultdict(int)
        for _ in range(PATHS_MAX_DEPTH):
            for (c, a), n in level.items():
                if a in roots:
                    total[(c, a)] += n
            nxt = defaultdict(int)
            for (c, a), n in level.items():
                for p in step.get(a, ()):
                    nxt[(c, p)] += n
            if not nxt:
                break
            level = nxt
        rows = sorted((c, r, n) for (c, r), n in total.items())
        return spark.createDataFrame(
            rows, "cui string, root string, n_paths bigint"
        )

    return _onto_cached(spark, "paths", build)


def sql_path_counts() -> str:
    return f"""
WITH RECURSIVE {_sql_hier_cte()},
walk(cui, anc) AS (
  SELECT cui, ancestor FROM hier
  UNION ALL
  SELECT w.cui, h.ancestor FROM walk w JOIN hier h ON h.cui = w.anc
),
roots AS (
  SELECT DISTINCT ancestor AS anc FROM hier
  WHERE ancestor NOT IN (SELECT cui FROM hier)
)
SELECT w.cui, w.anc AS root, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM walk w JOIN roots r ON r.anc = w.anc
GROUP BY w.cui, w.anc
"""


# ---------------------------------------------------------------------------
# Information-content similarity (Resnik / Lin) over the IS_A DAG.
# ---------------------------------------------------------------------------

def resnik_lin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, lca, resnik6, lin6): corpus-IC ontology similarity for every
    leaf concept pair — the UMLS::Similarity res/lin measures that
    complement the purely structural Wu-Palmer score.  IC(c) =
    -ln p(c) with p(c) the Laplace-smoothed share of corpus mention-CUI
    incidences at c OR ANY DESCENDANT (subsumption counts, so an
    abstract category is common and carries little information);
    Resnik(a,b) = IC(lca), Lin(a,b) = 2*IC(lca) / (IC(a) + IC(b)).

    Float discipline: both engines aggregate exact integer counts first
    and apply the identical -ln((cnt + 1.0) / (total + nC)) literal once
    per concept row — no float is ever summed across rows, so partial-agg
    order cannot drift the result.

    Plan: the corpus is touched once (the same mention->concept incidence
    scan as category_rollup, rolled up the broadcast closure); everything
    downstream is ontology-sized and broadcast-joined."""
    mentions = _mentions_cached(spark, sf_dir)
    alias_cui = F.broadcast(
        spark.createDataFrame(
            sorted(set(webkg.WEB_ALIASES)), "alias string, cui string"
        )
    )
    inc = mentions.join(
        alias_cui, mentions["mention"] == alias_cui["alias"]
    ).select("cui")

    edges = _edges_df(spark)
    members = (
        edges.select("cui")
        .unionByName(edges.select(F.col("ancestor").alias("cui")))
        .distinct()
    )
    n_concepts = len(
        {c for e in WEB_HIERARCHY for c in e}
    )  # engine-constant: same literal lands in the SQL twin
    anc = (
        ontology_closure(spark)
        .select("cui", "ancestor")
        .unionByName(members.select("cui", F.col("cui").alias("ancestor")))
    )
    cnt = (
        inc.join(F.broadcast(anc), "cui")
        .groupBy("ancestor")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total_df = F.broadcast(inc.groupBy().agg(F.count(F.lit(1)).alias("total")))
    ic = (
        members.join(cnt.select(F.col("ancestor").alias("cui"), "cnt"),
                     "cui", "left")
        .na.fill({"cnt": 0})
        .crossJoin(total_df)
        .select(
            "cui",
            (
                -F.log(
                    (F.col("cnt") + F.lit(1.0))
                    / (F.col("total") + F.lit(float(n_concepts)))
                )
            ).alias("ic"),
        )
    )
    lp = lca_pairs(spark, sf_dir)
    ica = ic.select(F.col("cui").alias("a"), F.col("ic").alias("ic_a"))
    icb = ic.select(F.col("cui").alias("b"), F.col("ic").alias("ic_b"))
    icl = ic.select(F.col("cui").alias("lca"), F.col("ic").alias("ic_l"))
    return (
        lp.join(F.broadcast(ica), "a")
        .join(F.broadcast(icb), "b")
        .join(F.broadcast(icl), "lca")
        .select(
            "a",
            "b",
            "lca",
            F.round("ic_l", 6).alias("resnik6"),
            F.round(
                F.lit(2.0) * F.col("ic_l") / (F.col("ic_a") + F.col("ic_b")), 6
            ).alias("lin6"),
        )
    )


def sql_resnik_lin() -> str:
    alias_vals = ", ".join(
        f"('{a}', '{c}')" for a, c in sorted(set(webkg.WEB_ALIASES))
    )
    n_concepts = len({c for e in WEB_HIERARCHY for c in e})
    return f"""
WITH RECURSIVE {webkg.sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
mentions AS (
  SELECT DISTINCT d.doc_id, a.alias AS mention, a.label
  FROM {webkg._MENTION_FROM}
),
alias_cui(alias, cui) AS (SELECT * FROM (VALUES {alias_vals})),
{_sql_hier_cte()},
reach(cui, ancestor, d) AS (
  SELECT cui, ancestor, 1 FROM hier
  UNION ALL
  SELECT r.cui, h.ancestor, r.d + 1
  FROM reach r JOIN hier h ON h.cui = r.ancestor
),
members AS (
  SELECT DISTINCT cui
  FROM (SELECT cui FROM hier UNION ALL SELECT ancestor FROM hier)
),
anc AS (
  SELECT DISTINCT cui, ancestor FROM reach
  UNION ALL SELECT cui, cui FROM members
),
inc AS (
  SELECT ac.cui
  FROM mentions m JOIN alias_cui ac ON ac.alias = m.mention
),
tot AS (SELECT COUNT(*) AS total FROM inc),
cnt AS (
  SELECT a.ancestor AS cui, COUNT(*) AS cnt
  FROM inc i JOIN anc a ON a.cui = i.cui
  GROUP BY a.ancestor
),
ic AS (
  SELECT m.cui,
         -ln((COALESCE(c.cnt, 0) + 1.0)
             / ((SELECT total FROM tot) + {float(n_concepts)})) AS ic
  FROM members m LEFT JOIN cnt c ON c.cui = m.cui
),
closure2 AS (SELECT cui, ancestor, MIN(d) AS d FROM reach GROUP BY cui, ancestor),
anc_d AS (
  SELECT cui, ancestor, d FROM closure2
  UNION ALL SELECT cui, cui, 0 FROM members
),
leaves AS (SELECT DISTINCT cui FROM hier),
pairs AS (
  SELECT x.cui AS a, y.cui AS b FROM leaves x JOIN leaves y ON x.cui < y.cui
),
j AS (
  SELECT p.a, p.b, ca.ancestor, ca.d AS da, cb.d AS db
  FROM pairs p
  JOIN anc_d ca ON ca.cui = p.a
  JOIN anc_d cb ON cb.cui = p.b AND cb.ancestor = ca.ancestor
),
r AS (
  SELECT a, b, ancestor, da, db,
         ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY da + db, ancestor) AS rk
  FROM j
),
lp AS (SELECT a, b, ancestor AS lca FROM r WHERE rk = 1)
SELECT lp.a, lp.b, lp.lca,
       round(il.ic, 6) AS resnik6,
       round(2.0 * il.ic / (ia.ic + ib.ic), 6) AS lin6
FROM lp
JOIN ic ia ON ia.cui = lp.a
JOIN ic ib ON ib.cui = lp.b
JOIN ic il ON il.cui = lp.lca
"""


# ---------------------------------------------------------------------------
# Ontology DAG integrity: cycle audit over the IS_A closure.
# ---------------------------------------------------------------------------

def cycle_check(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """(n_nodes, n_edges, n_closure_pairs, n_self_reach, is_dag): the
    ontology-integrity audit a KG loader runs before trusting IS_A
    subsumption — a hierarchy with a cycle makes every closure-based
    rollup wrong (category counts double, depths diverge), so the gate
    is: no concept may be its own ancestor.  n_self_reach counts closure
    rows with concept = ancestor; is_dag iff zero.

    Plan: composes the already-gated semi-naive closure; the audit
    itself is one row-count aggregate per side over the (tiny, broadcast
    -scale) hierarchy tables."""
    edges = _edges_df(spark)
    clo = ontology_closure(spark, sf_dir)
    nodes = (
        edges.select(F.col("cui").alias("n"))
        .unionByName(edges.select(F.col("ancestor").alias("n")))
        .distinct()
    )
    return (
        nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .crossJoin(
            F.broadcast(
                edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
            )
        )
        .crossJoin(
            F.broadcast(
                clo.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_closure_pairs"),
                    F.sum(
                        (F.col("cui") == F.col("ancestor")).cast("int")
                    )
                    .cast("bigint")
                    .alias("n_self_reach"),
                )
            )
        )
        .select(
            "n_nodes",
            "n_edges",
            "n_closure_pairs",
            "n_self_reach",
            (F.col("n_self_reach") == 0).alias("is_dag"),
        )
    )


def sql_cycle_check() -> str:
    return f"""
WITH clo AS ({sql_ontology_closure()}),
{_sql_hier_cte().lstrip()},
nodes AS (
  SELECT cui AS n FROM hier UNION SELECT ancestor FROM hier
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_closure_pairs,
         CAST(SUM(CASE WHEN cui = ancestor THEN 1 ELSE 0 END)
              AS BIGINT) AS n_self_reach
  FROM clo
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hier) AS n_edges,
       a.n_closure_pairs, a.n_self_reach,
       a.n_self_reach = 0 AS is_dag
FROM a
"""
