"""Graph analytics over the co-occurrence KG: BFS reach, label-propagation
communities, degree distribution, neighbor-set Jaccard (link prediction).

These extend the graph-query surface past the reference's fixed
`/intersection` endpoint (/root/reference/pymedgraph/graph/neo4jconnector.py:267-316
— its only graph analytic) with the algorithms a production KG service
runs next: reachability, community detection, degree profiling, and
structural-similarity link prediction.  All four run over the SAME
symmetric co-occurrence edge set as relations.q_pagerank (shared Spark
builder ``relations._cooccur_edges`` and shared oracle CTE
``relations.sql_cooccur_edges_cte``), so the whole graph-analytics family
is provably computed on one graph.

Scale notes (10^9-node graph on 1000 executors):
- **BFS** is frontier-based: each iteration joins only the NEW frontier
  (nodes first reached last round) against edges — work per round is
  O(frontier out-degree), not O(|V|); visited-set membership is a
  broadcast-able left_anti when frontiers are small and a shuffled
  anti-join otherwise (Catalyst picks via AQE from actual sizes).
- **LPA** is one shuffle per iteration: groupBy(dst, label) with map-side
  partial counts, then the per-node argmax is an aggregate-then-window on
  the already-shuffled (dst) key — no extra exchange (window partitions by
  the groupBy prefix).  Deterministic: ties broken by smallest label, so
  the result is reproducible across partitionings and retries.
- **degree distribution** is two partial-agg passes (deg, then histogram) —
  map-side combinable, no join.
- **neighbor-Jaccard** enumerates wedges through shared neighbors — the
  same bounded pattern as trainprep.kg_triangles; a hot hub u contributes
  deg(u)^2 wedges, which AQE skew-split spreads; at web scale cap or
  sample hubs above a degree threshold (log what was dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window

from sparkmedkg import exactq
from pyspark.sql import functions as F

from sparkmedkg import relations, webkg
from sparkmedkg.relations import PR_MIN_DOCS, sql_cooccur_edges_cte

BFS_MAX_HOPS = 3
LPA_ITERS = 2
NJ_TAU = 0.25


def _edges(spark: SparkSession, sf_dir: str, min_docs: int) -> DataFrame:
    """Symmetric (src, dst) co-occurrence edges — served from
    relations._EDGE_CACHE (materialized once per session), so a suite of
    graph queries pays the NER scan once instead of per algorithm."""
    return relations._cooccur_edges(spark, sf_dir, min_docs)


# ---------------------------------------------------------------------------
# Degree distribution (log2-bucketed histogram).
# ---------------------------------------------------------------------------

def q_degree_dist(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(bucket, n_nodes, min_deg, max_deg): nodes histogrammed by
    floor(log2(degree)).  The degree profile that sizes every downstream
    graph job (skew planning, hub caps)."""
    deg = (
        _edges(spark, sf_dir, min_docs)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return deg.groupBy(
        F.floor(F.log2("deg")).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("deg").alias("min_deg"),
        F.max("deg").alias("max_deg"),
    )


def sql_degree_dist(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)
SELECT CAST(floor(log2(deg)) AS INT) AS bucket,
       COUNT(*) AS n_nodes, MIN(deg) AS min_deg, MAX(deg) AS max_deg
FROM deg GROUP BY 1
"""


# ---------------------------------------------------------------------------
# BFS reach: min-hop distance from a deterministic seed.
# ---------------------------------------------------------------------------

def q_bfs_reach(
    spark: SparkSession,
    sf_dir: str,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, dist) for every node within ``max_hops`` of the seed (the
    minimum CUI — deterministic without configuration).  Frontier-based:
    iteration k joins only the nodes first reached at k-1 against edges,
    then anti-joins the visited set — the textbook distributed BFS whose
    per-round cost tracks the frontier, not the graph."""
    edges = _edges(spark, sf_dir, min_docs)
    seed = edges.select(F.min("src").alias("CUI")).withColumn(
        "dist", F.lit(0)
    )
    visited = seed.localCheckpoint(eager=True)
    frontier = visited
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["CUI"] == edges["src"])
            .select(F.col("dst").alias("CUI"))
            .distinct()
            .join(visited.select("CUI"), "CUI", "left_anti")
            .withColumn("dist", F.lit(k))
        )
        # eager per round: the frontier feeds both next round's join and the
        # visited union; lineage stays O(1) deep across hops.
        frontier = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    return visited


def sql_bfs_reach(
    max_hops: int = BFS_MAX_HOPS, min_docs: int = PR_MIN_DOCS
) -> str:
    # unrolled min-distance iteration: r_k = min-dist closure after k hops.
    steps = []
    for k in range(1, max_hops + 1):
        steps.append(
            f"""r{k} AS (
  SELECT cui, MIN(dist) AS dist FROM (
    SELECT cui, dist FROM r{k - 1}
    UNION ALL
    SELECT e.dst AS cui, p.dist + 1 AS dist
    FROM r{k - 1} p JOIN edges e ON e.src = p.cui
  ) GROUP BY cui
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
r0 AS (SELECT (SELECT MIN(src) FROM edges) AS cui, 0 AS dist),
{unrolled}
SELECT cui AS CUI, dist FROM r{max_hops}
"""


# ---------------------------------------------------------------------------
# Label propagation (synchronous, fixed iterations, deterministic ties).
# ---------------------------------------------------------------------------

def q_label_propagation(
    spark: SparkSession,
    sf_dir: str,
    iters: int = LPA_ITERS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, label): community label after ``iters`` synchronous rounds of
    label propagation.  Init label = own CUI; each round every node adopts
    its neighbors' most frequent label, ties broken by smallest label —
    fully deterministic, so Spark and the unrolled-CTE oracle agree
    bit-for-bit (asynchronous/randomized LPA variants are not
    reproducible across partitionings and can't be oracle-gated)."""
    edges = _edges(spark, sf_dir, min_docs)
    labels = edges.select(F.col("src").alias("CUI")).distinct().withColumn(
        "label", F.col("CUI")
    )
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(iters):
        labels = (
            edges.join(labels, edges["src"] == labels["CUI"])
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("dst").alias("CUI"), "label")
        )
    return labels


def _sql_lpa_steps(iters: int = LPA_ITERS) -> str:
    """The unrolled l0..l{iters} LPA CTE chain over ``edges`` — shared by
    sql_label_propagation, sql_modularity-style consumers, and
    sql_conductance so the community assignment can never drift between
    oracles."""
    steps = ["l0 AS (SELECT DISTINCT src AS cui, src AS label FROM edges)"]
    for k in range(1, iters + 1):
        steps.append(
            f"""l{k} AS (
  SELECT dst AS cui, label FROM (
    SELECT e.dst, p.label,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, p.label ASC) AS rn
    FROM edges e JOIN l{k - 1} p ON e.src = p.cui
    GROUP BY e.dst, p.label
  ) WHERE rn = 1
)"""
        )
    return ",\n".join(steps)


def sql_label_propagation(
    iters: int = LPA_ITERS, min_docs: int = PR_MIN_DOCS
) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
{_sql_lpa_steps(iters)}
SELECT cui AS CUI, label FROM l{iters}
"""


# ---------------------------------------------------------------------------
# Neighbor-set Jaccard (structural similarity / link prediction).
# ---------------------------------------------------------------------------

def q_neighbor_jaccard(
    spark: SparkSession,
    sf_dir: str,
    tau: float = NJ_TAU,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(a, b, jaccard) for node pairs whose neighbor sets overlap with
    Jaccard >= tau, a < b — the classic link-prediction feature.  Wedge
    enumeration through each shared neighbor (one equi-join on the
    neighbor key), counts combined map-side, sizes from the degree table —
    never a node-pair cross join."""
    edges = _edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    x = edges.select(F.col("dst").alias("u"), F.col("src").alias("a"))
    y = edges.select(F.col("dst").alias("u"), F.col("src").alias("b"))
    common = (
        x.join(y, "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            deg.select(F.col("src").alias("a"), F.col("deg").alias("da")), "a"
        )
        .join(deg.select(F.col("src").alias("b"), F.col("deg").alias("db")), "b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("da") + F.col("db") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def sql_neighbor_jaccard(
    tau: float = NJ_TAU, min_docs: int = PR_MIN_DOCS
) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
common AS (
  SELECT x.src AS a, y.src AS b, COUNT(*) AS n_common
  FROM edges x JOIN edges y ON x.dst = y.dst AND x.src < y.src
  GROUP BY x.src, y.src
)
SELECT a, b,
       round(n_common::DOUBLE / (da.deg + db.deg - n_common)::DOUBLE, 6)
         AS jaccard
FROM common
JOIN deg da ON da.src = a
JOIN deg db ON db.src = b
WHERE n_common::DOUBLE / (da.deg + db.deg - n_common)::DOUBLE >= {tau}
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling to fixpoint).
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 8


def q_kcore(
    spark: SparkSession,
    sf_dir: str,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, core_deg): nodes of the k-core of the co-occurrence graph
    (the maximal induced subgraph where every node keeps degree >= k),
    with their degree inside the core.

    Iterative peeling: each round drops nodes whose degree within the
    surviving induced subgraph fell below k.  Per round: two semi-join
    filters of the edge set against the (monotonically shrinking) alive
    set, one map-side-combinable degree count — the shuffles are keyed on
    node ids and the work tracks the surviving subgraph, so late rounds
    on a 100 TB-derived graph touch only the dense remainder.  The alive
    set is localCheckpoint'd eagerly per round (O(1) lineage) and the
    loop exits early at fixpoint: the set only shrinks, so an unchanged
    count IS set equality, and extra rounds would be no-ops — making the
    early exit result-identical to the oracle's fixed ``rounds`` unroll."""
    return kcore_from_edges(_edges(spark, sf_dir, min_docs), k, rounds)


def kcore_from_edges(
    edges: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """Peeling loop over any symmetric (src, dst) edge DataFrame."""

    def survivors(alive: DataFrame) -> DataFrame:
        return (
            edges.join(
                alive.select(F.col("CUI").alias("src")), "src", "left_semi"
            )
            .join(alive.select(F.col("CUI").alias("dst")), "dst", "left_semi")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("core_deg"))
            .where(F.col("core_deg") >= k)
        )

    alive = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .where(F.col("core_deg") >= k)
        .select(F.col("src").alias("CUI"), "core_deg")
        .localCheckpoint(eager=True)
    )
    n_alive = alive.count()
    for _ in range(rounds - 1):
        nxt = survivors(alive).select(
            F.col("src").alias("CUI"), "core_deg"
        ).localCheckpoint(eager=True)
        n_nxt = nxt.count()
        stable = n_nxt == n_alive
        alive, n_alive = nxt, n_nxt
        if stable:
            break
    return alive


def sql_kcore(
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    # Each round references the previous one TWICE (src + dst semi-join);
    # without MATERIALIZED DuckDB inlines CTEs, so the unroll re-expands
    # the full edges pipeline 2^rounds times and never finishes.
    steps = []
    for i in range(1, rounds):
        steps.append(
            f"""a{i} AS MATERIALIZED (
  SELECT e.src AS cui, COUNT(*) AS core_deg
  FROM edges e
  JOIN a{i - 1} s ON s.cui = e.src
  JOIN a{i - 1} t ON t.cui = e.dst
  GROUP BY e.src HAVING COUNT(*) >= {k}
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
a0 AS MATERIALIZED (
  SELECT src AS cui, COUNT(*) AS core_deg FROM edges
  GROUP BY src HAVING COUNT(*) >= {k}
),
{unrolled}
SELECT cui AS CUI, core_deg FROM a{rounds - 1}
"""


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (fixed-round Bellman-Ford).
# ---------------------------------------------------------------------------

SSSP_ROUNDS = 4
SSSP_COST_NUM = 1_000_000


def q_weighted_sssp(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = SSSP_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, dist): shortest weighted distance from the lexicographically
    smallest node after ``rounds`` Bellman-Ford relaxations.  Edge cost is
    the INTEGER association cost 1_000_000 // n_docs (stronger
    co-occurrence == cheaper hop), so every distance is exact integer
    arithmetic — engine-portable with no float-sum ordering concerns.

    Plan per round: one equi-join of the current distance table (|reached|
    rows) against edges on src + one min-groupBy — the same
    frontier-bounded shape as BFS but carrying min-cost instead of
    min-hops.  Distances are localCheckpoint'd per round so lineage stays
    O(1) at deep round counts."""
    from sparkmedkg import relations as _r

    doc_cui = _r.doc_cui_cached(spark, sf_dir)
    a = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("x"))
    b = doc_cui.select(F.col("url").alias("u"), F.col("CUI").alias("y"))
    und = (
        a.join(b, "u")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    cost = F.expr(f"div({SSSP_COST_NUM}, n_docs)").alias("cost")
    edges = (
        und.select(F.col("x").alias("src"), F.col("y").alias("dst"), cost)
        .unionByName(
            und.select(F.col("y").alias("src"), F.col("x").alias("dst"), cost)
        )
        .persist()
    )
    src0 = edges.agg(F.min("src")).first()[0]

    dist = spark.createDataFrame(
        [(src0, 0)], "CUI string, dist long"
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            dist.join(edges, dist["CUI"] == edges["src"])
            .select(
                F.col("dst").alias("CUI"),
                (F.col("dist") + F.col("cost")).alias("dist"),
            )
            .unionByName(dist)
            .groupBy("CUI")
            .agg(F.min("dist").alias("dist"))
        )
        dist = relaxed.localCheckpoint(eager=True)
    edges.unpersist()
    return dist


def sql_weighted_sssp(
    rounds: int = SSSP_ROUNDS, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for t in range(1, rounds + 1):
        steps.append(
            f"""d{t} AS MATERIALIZED (
  SELECT cui, MIN(dist) AS dist FROM (
    SELECT e.dst AS cui, p.dist + e.cost AS dist
    FROM d{t - 1} p JOIN wedges e ON e.src = p.cui
    UNION ALL SELECT cui, dist FROM d{t - 1}
  ) GROUP BY cui
)"""
        )
    unrolled = ",\n".join(steps)
    # the shared cooccur CTE ends with the unweighted `edges` CTE; it is
    # simply left unreferenced here and the weighted variant built beside it
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
wund AS (
  SELECT a.cui AS x, b.cui AS y, COUNT(*) AS n_docs
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY a.cui, b.cui
  HAVING COUNT(*) >= {min_docs}
),
wedges AS MATERIALIZED (
  SELECT x AS src, y AS dst, {SSSP_COST_NUM} // n_docs AS cost FROM wund
  UNION ALL SELECT y, x, {SSSP_COST_NUM} // n_docs FROM wund
),
d0 AS (SELECT (SELECT MIN(src) FROM wedges) AS cui, CAST(0 AS BIGINT) AS dist),
{unrolled}
SELECT cui AS CUI, dist FROM d{rounds}
"""


# ---------------------------------------------------------------------------
# Local clustering coefficient.
# ---------------------------------------------------------------------------

def q_clustering_coeff(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(CUI, deg, lcc): local clustering coefficient
    2*triangles / (deg*(deg-1)) for every node with degree >= 2.

    Composition of two already-bounded stages: trainprep.kg_triangles'
    degree-oriented triangle enumeration (wedge fan-out bounded by
    arboricity, hub-skew-proof) and the one-shuffle degree count — the
    final join is per-node (|V| rows), trivially broadcastable relative to
    the edge set.  Nodes in no triangle get lcc = 0 via the left join."""
    from sparkmedkg import trainprep

    edges = _edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    tri = trainprep.kg_triangles(spark, sf_dir, min_docs)
    return (
        deg.where(F.col("deg") >= 2)
        .join(tri.withColumnRenamed("CUI", "src"), "src", "left")
        .select(
            F.col("src").alias("CUI"),
            "deg",
            F.round(
                2.0
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
                6,
            ).alias("lcc"),
        )
    )


def sql_clustering_coeff(min_docs: int = PR_MIN_DOCS) -> str:
    from sparkmedkg.trainprep import sql_tri_cte

    return f"""
WITH {sql_tri_cte(min_docs)},
tcnt AS (
  SELECT cui, COUNT(*) AS n_triangles
  FROM (SELECT u AS cui FROM tris UNION ALL SELECT v FROM tris
        UNION ALL SELECT w FROM tris)
  GROUP BY cui
)
SELECT d.src AS CUI, d.deg,
       round(2.0 * COALESCE(t.n_triangles, 0)::DOUBLE
             / (d.deg * (d.deg - 1))::DOUBLE, 6) AS lcc
FROM deg d LEFT JOIN tcnt t ON t.cui = d.src
WHERE d.deg >= 2
"""


# ---------------------------------------------------------------------------
# Deterministic random walks (DeepWalk/node2vec sampling pass).
# ---------------------------------------------------------------------------

WALK_LEN = 3


def _walk_choice(walk_col, step: int, cur_col) -> Column:
    """Deterministic 60-bit md5 draw for (walk, step, cur) — the engine-
    portable hash idiom (identical in DuckDB as CAST('0x' || substring(
    md5(...), 1, 15) AS BIGINT)); mod deg happens at the join site."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(walk_col, F.lit(f"|{step}|"), cur_col)
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")


def q_random_walks(
    spark: SparkSession,
    sf_dir: str,
    walk_len: int = WALK_LEN,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(walk, step, node): one fixed-length uniform random walk per start
    node over the co-occurrence KG — the sampling pass that turns a graph
    into a skip-gram training corpus (DeepWalk; node2vec with p=q=1).
    Draws are md5(walk|step|cur) mod degree, so the walk corpus is fully
    deterministic: reproducible across partitionings, retries, and engines
    (the DuckDB oracle replays the identical walks).

    Scale shape: edges get a per-src (rank, degree) once — two window
    functions over ONE partitionBy(src) shuffle, persisted and reused by
    every step.  Each step is then a single equi-join of the |V|-row walk
    frontier against the ranked edges on cur = src, with the rank-match
    predicate (rk = draw mod deg) evaluated join-side — per-step shuffle
    traffic is O(|V|) state rows, never the O(sum deg) full fan-out, and
    lineage is truncated per hop exactly like q_bfs_reach.  At 10^9 nodes
    x walk_len steps this is the standard embarrassingly-iterative shape:
    walk_len co-partitioned joins, nothing quadratic anywhere."""
    edges = _edges(spark, sf_dir, min_docs)
    w = Window.partitionBy("src").orderBy("dst")
    ranked = webkg._track(
        edges.select(
            "src",
            "dst",
            (F.row_number().over(w) - 1).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"),
        )
    )
    state = (
        edges.select(F.col("src").alias("walk"))
        .distinct()
        .select("walk", F.col("walk").alias("node"), F.lit(0).alias("step"))
        .localCheckpoint(eager=True)
    )
    out = state
    for t in range(1, walk_len + 1):
        nxt = (
            state.join(
                ranked,
                (state["node"] == ranked["src"])
                & (
                    ranked["rk"]
                    == _walk_choice(state["walk"], t, state["node"])
                    % ranked["deg"]
                ),
            )
            .select("walk", F.col("dst").alias("node"), F.lit(t).alias("step"))
            .localCheckpoint(eager=True)
        )
        state = nxt
        out = out.unionByName(state)
    return out.select("walk", "step", "node")


def sql_random_walks(
    walk_len: int = WALK_LEN, min_docs: int = PR_MIN_DOCS
) -> str:
    def draw(prev: str, t: int) -> str:
        return (
            f"CAST('0x' || substring(md5({prev}.walk || '|{t}|' || "
            f"{prev}.node), 1, 15) AS BIGINT)"
        )

    steps = []
    for t in range(1, walk_len + 1):
        steps.append(
            f"""w{t} AS (
  SELECT p.walk, r.dst AS node, {t} AS step
  FROM w{t - 1} p JOIN redges r
    ON r.src = p.node AND r.rk = {draw("p", t)} % r.deg
)"""
        )
    unrolled = ",\n".join(steps)
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM w{t}" for t in range(walk_len + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
redges AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM edges
),
w0 AS (SELECT DISTINCT src AS walk, src AS node, 0 AS step FROM edges),
{unrolled}
SELECT walk, step, node FROM ({union})
"""


SG_WINDOW = 2


def q_walk_skipgrams(
    spark: SparkSession,
    sf_dir: str,
    window: int = SG_WINDOW,
    walk_len: int = WALK_LEN,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(center, context, n): skip-gram co-occurrence counts over the
    random-walk corpus — the (input, output) pair table a word2vec-style
    node-embedding trainer consumes, completing the DeepWalk prep chain
    (q_random_walks samples the corpus, this windows it into pairs).

    Scale shape: the window pairing is the bounded offset-explode
    equi-join of q_relations (each position fans to <= 2*window join
    probes on the (walk, step) key — never a per-walk cross join), and
    the count is one map-side-combinable shuffle of (center, context)
    partials.  Walk positions are O(|V| * walk_len) rows, so the whole
    pass is linear in the graph."""
    walks = q_random_walks(spark, sf_dir, walk_len, min_docs)
    a = walks.select(
        "walk",
        F.col("node").alias("center"),
        F.explode(
            F.filter(
                F.sequence(
                    F.col("step") - window, F.col("step") + window
                ),
                lambda j: j != F.col("step"),
            )
        ).alias("j"),
    )
    b = walks.select(
        F.col("walk").alias("w2"),
        F.col("step").alias("j2"),
        F.col("node").alias("context"),
    )
    return (
        a.join(b, (a["walk"] == b["w2"]) & (a["j"] == b["j2"]))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_walk_skipgrams(
    window: int = SG_WINDOW,
    walk_len: int = WALK_LEN,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    return f"""
WITH walks AS ({sql_random_walks(walk_len, min_docs)})
SELECT a.node AS center, b.node AS context, COUNT(*) AS n
FROM walks a
JOIN walks b
  ON a.walk = b.walk
 AND abs(a.step - b.step) BETWEEN 1 AND {window}
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# k-truss edge peel: edges supported by enough triangles, twice-peeled.
# ---------------------------------------------------------------------------

TRUSS_SUPPORT = 2
TRUSS_MIN_DOCS = 2


def _edge_support(tris: DataFrame) -> DataFrame:
    """(src, dst, support): canonical (least, greatest) edge keys of each
    triangle instance, counted.  Map-side-combinable single shuffle."""
    e = (
        tris.select(
            F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
        )
        .unionByName(
            tris.select(
                F.least("u", "w").alias("src"), F.greatest("u", "w").alias("dst")
            )
        )
        .unionByName(
            tris.select(
                F.least("v", "w").alias("src"), F.greatest("v", "w").alias("dst")
            )
        )
    )
    return e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("support"))


def q_truss_edges(
    spark: SparkSession,
    sf_dir: str,
    t: int = TRUSS_SUPPORT,
    min_docs: int = TRUSS_MIN_DOCS,
) -> DataFrame:
    """(src, dst, support): co-occurrence edges surviving two rounds of
    (t+2)-truss peeling — keep edges in >= t triangles, drop triangles
    that lost an edge, recount, keep >= t again.  The fixed-round
    formulation of the iterate-to-fixpoint truss decomposition; the dense
    cores it keeps are the reliably-connected KG neighborhoods.

    Scale: triangle enumeration is the degree-oriented arboricity-bounded
    plan (trainprep.tris_df); each peel round is one map-side-combinable
    count shuffle plus three broadcast-able semi-joins against the
    surviving-edge set (sparse — AQE picks broadcast when it fits).  Rounds
    are fixed (2), so the lineage stays shallow; a fixpoint run would
    localCheckpoint per round like q_kcore."""
    from sparkmedkg import trainprep

    tris = trainprep.tris_df(spark, sf_dir, min_docs).persist()
    tris.count()  # materialize once: support count + 3 semi-joins reuse it
    surv1 = _edge_support(tris).where(F.col("support") >= t).select("src", "dst")

    def _semi(df: DataFrame, a: str, b: str) -> DataFrame:
        pair = df.withColumn("_s", F.least(a, b)).withColumn("_d", F.greatest(a, b))
        return (
            pair.join(
                surv1.withColumnRenamed("src", "_s").withColumnRenamed("dst", "_d"),
                ["_s", "_d"],
                "left_semi",
            )
            .drop("_s", "_d")
        )

    tris2 = _semi(_semi(_semi(tris, "u", "v"), "u", "w"), "v", "w")
    out = (
        _edge_support(tris2)
        .where(F.col("support") >= t)
        .select("src", "dst", F.col("support").cast("bigint").alias("support"))
        .localCheckpoint(eager=True)
    )
    tris.unpersist()
    return out


def sql_truss_edges(
    t: int = TRUSS_SUPPORT, min_docs: int = TRUSS_MIN_DOCS
) -> str:
    from sparkmedkg.trainprep import sql_tri_cte

    def _sup(src_cte: str) -> str:
        return f"""
  SELECT src, dst, COUNT(*) AS support FROM (
    SELECT least(u, v) AS src, greatest(u, v) AS dst FROM {src_cte}
    UNION ALL SELECT least(u, w), greatest(u, w) FROM {src_cte}
    UNION ALL SELECT least(v, w), greatest(v, w) FROM {src_cte}
  ) GROUP BY src, dst HAVING COUNT(*) >= {t}"""

    # tris / surv1 / tris_m are MATERIALIZED: the triangle CTE embeds the
    # whole NER->link->edge pipeline, and the 3-edge membership check
    # references it from three EXISTS predicates — without materialization
    # DuckDB re-expands the full pipeline per reference (observed: minutes
    # at sf0.001 vs sub-second materialized).
    return f"""
WITH {sql_tri_cte(min_docs)},
tris_m AS MATERIALIZED (SELECT u, v, w FROM tris),
surv1 AS MATERIALIZED ({_sup('tris_m')}
),
tris2 AS (
  SELECT tr.u, tr.v, tr.w FROM tris_m tr
  WHERE EXISTS (SELECT 1 FROM surv1 e
                WHERE e.src = least(tr.u, tr.v) AND e.dst = greatest(tr.u, tr.v))
    AND EXISTS (SELECT 1 FROM surv1 e
                WHERE e.src = least(tr.u, tr.w) AND e.dst = greatest(tr.u, tr.w))
    AND EXISTS (SELECT 1 FROM surv1 e
                WHERE e.src = least(tr.v, tr.w) AND e.dst = greatest(tr.v, tr.w))
),
tris2_m AS MATERIALIZED (SELECT u, v, w FROM tris2),
sup2 AS ({_sup('tris2_m')}
)
SELECT src, dst, CAST(support AS BIGINT) AS support FROM sup2
"""


# ---------------------------------------------------------------------------
# Degree assortativity coefficient.
# ---------------------------------------------------------------------------

def q_assortativity(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(n_edges, assortativity): Pearson correlation of endpoint degrees
    over the symmetric edge list — the one-number summary of whether hubs
    attach to hubs (assortative, > 0) or to leaves (disassortative, < 0);
    the signal that decides whether hot-key salting targets hub-hub edges.
    Both degree joins broadcast (node-sized table); the five moment sums
    accumulate in exact BIGINT in a single partial-agg pass, so the only
    float ops are the final division and sqrts — deterministic cross-
    engine, no order-dependent double summation.  (At 10^12-edge scale
    the BIGINT products approach int64 range; the production variant
    recenters degrees first or sums in DECIMAL(38,0) — same plan.)"""
    edges = _edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    dx = deg.select(F.col("src"), F.col("deg").alias("deg_x"))
    dy = deg.select(
        F.col("src").alias("dst"), F.col("deg").alias("deg_y")
    )
    m = (
        edges.join(F.broadcast(dx), "src")
        .join(F.broadcast(dy), "dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("deg_x").alias("sx"),
            F.sum("deg_y").alias("sy"),
            F.sum(F.col("deg_x") * F.col("deg_x")).alias("sxx"),
            F.sum(F.col("deg_y") * F.col("deg_y")).alias("syy"),
            F.sum(F.col("deg_x") * F.col("deg_y")).alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        F.col("n").alias("n_edges"),
        F.round(num.cast("double") / den, 6).alias("assortativity"),
    )


def sql_assortativity(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx.deg) AS BIGINT) AS sx,
         CAST(SUM(dy.deg) AS BIGINT) AS sy,
         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx,
         CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS syy,
         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy
  FROM e
  JOIN deg dx ON dx.src = e.src
  JOIN deg dy ON dy.src = e.dst
)
SELECT n AS n_edges,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
         AS assortativity
FROM m
"""


# ---------------------------------------------------------------------------
# Landmark closeness centrality.
# ---------------------------------------------------------------------------

CLOSENESS_LANDMARKS = 4


def q_closeness(
    spark: SparkSession,
    sf_dir: str,
    n_landmarks: int = CLOSENESS_LANDMARKS,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, n_lm, sum_dist, closeness): landmark-estimated closeness
    centrality — multi-source BFS from the ``n_landmarks`` smallest node
    ids (deterministic without configuration), then per node the count of
    landmarks reaching it within ``max_hops`` and closeness =
    n_lm / sum_dist over those landmarks (self-distances excluded).  The
    standard exact-closeness replacement when all-pairs BFS is off the
    table: cost is n_landmarks BFS frontiers run as ONE keyed frontier
    (lm, node), so the per-round join is a single equi-join whatever the
    landmark count.  The landmark pick sorts only the distinct-node table
    (node-sized, far below the corpus); each round joins the frontier —
    not the closure — against the persisted edge set, with eager
    localCheckpoints keeping lineage O(1) deep."""
    edges = _edges(spark, sf_dir, min_docs)
    # distributed top-n (sort+limit = TakeOrderedAndProject), no
    # single-task ranking window over the node table
    landmarks = (
        edges.select("src")
        .distinct()
        .orderBy("src")
        .limit(n_landmarks)
        .select(F.col("src").alias("lm"))
    )
    visited = landmarks.select(
        "lm", F.col("lm").alias("CUI"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = visited
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["CUI"] == edges["src"])
            .select("lm", F.col("dst").alias("CUI"))
            .distinct()
            .join(visited.select("lm", "CUI"), ["lm", "CUI"], "left_anti")
            .withColumn("dist", F.lit(k))
        )
        frontier = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    reach = visited.where(F.col("dist") > 0)
    return reach.groupBy("CUI").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lm"),
        F.sum("dist").cast("bigint").alias("sum_dist"),
    ).select(
        "CUI",
        "n_lm",
        "sum_dist",
        F.round(
            F.col("n_lm").cast("double") / F.col("sum_dist").cast("double"), 6
        ).alias("closeness"),
    )


def sql_closeness(
    n_landmarks: int = CLOSENESS_LANDMARKS,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    steps = []
    for k in range(1, max_hops + 1):
        steps.append(
            f"""r{k} AS MATERIALIZED (
  SELECT lm, cui, MIN(dist) AS dist FROM (
    SELECT lm, cui, dist FROM r{k - 1}
    UNION ALL
    SELECT p.lm, e.dst AS cui, p.dist + 1 AS dist
    FROM r{k - 1} p JOIN e ON e.src = p.cui
  ) GROUP BY lm, cui
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
lms AS (SELECT src AS lm FROM (SELECT DISTINCT src FROM e
                               ORDER BY src LIMIT {n_landmarks})),
r0 AS (SELECT lm, lm AS cui, 0 AS dist FROM lms),
{unrolled}
SELECT cui AS CUI,
       CAST(COUNT(*) AS BIGINT) AS n_lm,
       CAST(SUM(dist) AS BIGINT) AS sum_dist,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(dist) AS DOUBLE), 6)
         AS closeness
FROM r{max_hops}
WHERE dist > 0
GROUP BY cui
"""


# ---------------------------------------------------------------------------
# Community modularity (scoring the label-propagation partition).
# ---------------------------------------------------------------------------

def q_modularity(
    spark: SparkSession,
    sf_dir: str,
    iters: int = LPA_ITERS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(n_comms, m_edges, modularity): Newman modularity of the
    label-propagation partition over the symmetric edge list —
    Q = sum_c (e_c/m - (deg_c/m)^2) with m the directed edge count,
    e_c the within-community directed edges and deg_c the community's
    degree mass.  The quality number a community detector reports next
    to its labels.  Computed as one exact BIGINT numerator
    sum_c (e_c*m - deg_c^2) over the community-sized aggregate, divided
    once by m^2 — no per-community float accumulation.  The label table
    is localCheckpointed so its LPA loop runs once across the three
    consumers (src join, dst join, degree join).  (deg_c^2 wants
    DECIMAL(38,0) past ~10^9 directed edges; same plan.)"""
    edges = _edges(spark, sf_dir, min_docs)
    labels = q_label_propagation(spark, sf_dir, iters, min_docs).localCheckpoint(
        eager=True
    )
    la = labels.select(F.col("CUI").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("CUI").alias("dst"), F.col("label").alias("lb"))
    e_c = (
        edges.join(F.broadcast(la), "src")
        .join(F.broadcast(lb), "dst")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    deg_c = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .join(F.broadcast(la), "src")
        .groupBy(F.col("la").alias("label"))
        .agg(F.sum("deg").cast("bigint").alias("deg_c"))
    )
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    comm = deg_c.join(e_c, "label", "left").na.fill({"e_c": 0})
    return (
        comm.crossJoin(F.broadcast(m))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_comms"),
            F.first("m").alias("m_edges"),
            F.sum(
                F.col("e_c") * F.col("m") - F.col("deg_c") * F.col("deg_c")
            ).alias("num"),
        )
        .select(
            "n_comms",
            "m_edges",
            F.round(
                F.col("num").cast("double")
                / (F.col("m_edges") * F.col("m_edges")).cast("double"),
                6,
            ).alias("modularity"),
        )
    )


def sql_modularity(
    iters: int = LPA_ITERS, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""l{k} AS MATERIALIZED (
  SELECT dst AS cui, label FROM (
    SELECT e.dst, p.label,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, p.label ASC) AS rn
    FROM e JOIN l{k - 1} p ON e.src = p.cui
    GROUP BY e.dst, p.label
  ) WHERE rn = 1
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
l0 AS (SELECT DISTINCT src AS cui, src AS label FROM e),
{unrolled},
lab AS MATERIALIZED (SELECT cui, label FROM l{iters}),
e_c AS (
  SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e_c
  FROM e
  JOIN lab la ON la.cui = e.src
  JOIN lab lb ON lb.cui = e.dst
  WHERE la.label = lb.label
  GROUP BY la.label
),
deg_c AS (
  SELECT la.label, CAST(SUM(d.deg) AS BIGINT) AS deg_c
  FROM (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src) d
  JOIN lab la ON la.cui = d.src
  GROUP BY la.label
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
comm AS (
  SELECT deg_c.label, COALESCE(e_c.e_c, 0) AS e_c, deg_c.deg_c
  FROM deg_c LEFT JOIN e_c ON e_c.label = deg_c.label
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_comms,
       CAST(m.m AS BIGINT) AS m_edges,
       round(CAST(SUM(e_c * m.m - deg_c * deg_c) AS DOUBLE)
             / CAST(m.m * m.m AS DOUBLE), 6) AS modularity
FROM comm CROSS JOIN m
GROUP BY m.m
"""


# ---------------------------------------------------------------------------
# Katz centrality (truncated, exact integer path counts).
# ---------------------------------------------------------------------------

KATZ_LEVELS = 3
KATZ_INV_ALPHA = 8  # attenuation alpha = 1/8 per hop


def q_katz(
    spark: SparkSession,
    sf_dir: str,
    levels: int = KATZ_LEVELS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, katz_num, katz): truncated Katz centrality
    sum_{k=1..levels} alpha^k * paths_k(v) with alpha = 1/KATZ_INV_ALPHA.

    paths_k(v) (walks of length k ending at v) is an exact BIGINT at every
    level — each level is ONE groupBy(dst) SUM of the previous level's
    counts pushed across edges, so partial/final aggregation order cannot
    change it (the float-Katz order-dependence trap never appears).  The
    attenuated total is assembled over the common denominator
    KATZ_INV_ALPHA^levels as an integer numerator (katz_num) and only
    converted to double at the end — engine-identical by construction.

    Scale: `levels` shuffles on dst (the natural key), each map-side
    combinable; the final union-aggregate reuses the same key.  Walk
    counts grow like (avg_degree)^k — BIGINT holds k=3 beyond any web
    graph's degree, and the numerator stays < 2^53 so the double is exact."""
    edges = _edges(spark, sf_dir, min_docs)
    per_level = []
    p = edges.groupBy(F.col("dst").alias("CUI")).agg(
        F.count(F.lit(1)).alias("p")
    )
    per_level.append(p)
    for _ in range(levels - 1):
        p = (
            edges.join(p, edges["src"] == p["CUI"])
            .groupBy(edges["dst"].alias("CUI"))
            .agg(F.sum("p").alias("p"))
        )
        per_level.append(p)
    weighted = None
    for k, pk in enumerate(per_level, start=1):
        w = pk.select(
            "CUI",
            (F.col("p") * (KATZ_INV_ALPHA ** (levels - k))).alias("w"),
        )
        weighted = w if weighted is None else weighted.unionByName(w)
    denom = float(KATZ_INV_ALPHA**levels)
    return weighted.groupBy("CUI").agg(
        F.sum("w").alias("katz_num"),
        F.round(F.sum("w").cast("double") / denom, 6).alias("katz"),
    )


def sql_katz(
    levels: int = KATZ_LEVELS, min_docs: int = PR_MIN_DOCS
) -> str:
    lvl = ["p1 AS (SELECT dst AS cui, CAST(COUNT(*) AS BIGINT) AS p"
           " FROM e GROUP BY dst)"]
    for k in range(2, levels + 1):
        lvl.append(
            f"""p{k} AS (
  SELECT e.dst AS cui, CAST(SUM(p.p) AS BIGINT) AS p
  FROM e JOIN p{k - 1} p ON p.cui = e.src GROUP BY e.dst
)"""
        )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT cui, p * {KATZ_INV_ALPHA ** (levels - k)} AS w FROM p{k}"
        for k in range(1, levels + 1)
    )
    denom = KATZ_INV_ALPHA**levels
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
{",".join(lvl)},
u AS (
  {unions}
)
SELECT cui AS CUI, CAST(SUM(w) AS BIGINT) AS katz_num,
       round(CAST(SUM(w) AS DOUBLE) / {denom}, 6) AS katz
FROM u GROUP BY cui
"""


# ---------------------------------------------------------------------------
# Luby's maximal independent set (deterministic md5 priorities).
# ---------------------------------------------------------------------------

MIS_ROUNDS = 4


def q_luby_mis(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = MIS_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, mis_round): the maximal independent set chosen by Luby's
    algorithm with md5-derived 60-bit priorities — each round, every
    still-undecided node whose priority is strictly below ALL undecided
    neighbors' joins the MIS, then it and its neighbors leave the game.
    Deterministic: priorities are content hashes (the webgraph._h60
    bridge), identical in both engines; a rare 60-bit tie just defers both
    nodes to a later round.

    Scale: the textbook O(log n)-round distributed MIS.  Per round: one
    groupBy(dst) MIN over the surviving edge set (map-side combinable) +
    two anti-joins to shrink the vertex set; surviving-edge filtering is
    two semi-joins against the shrinking vertex set, so per-round cost
    tracks the UNDECIDED subgraph, not the input.  localCheckpoint keeps
    lineage O(1) across rounds (the BFS/k-core idiom)."""
    from sparkmedkg.webgraph import _h60

    edges = _edges(spark, sf_dir, min_docs)
    undecided = (
        edges.select(F.col("src").alias("CUI"))
        .distinct()
        .withColumn("h", _h60(F.col("CUI")))
        .localCheckpoint(eager=True)
    )
    mis = None
    for r in range(1, rounds + 1):
        live = (
            edges.join(
                undecided.select(F.col("CUI").alias("src")), "src", "left_semi"
            ).join(
                undecided.select(F.col("CUI").alias("dst")), "dst", "left_semi"
            )
        )
        nbr_min = (
            live.join(
                undecided.select(
                    F.col("CUI").alias("src"), F.col("h").alias("h_src")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("CUI"))
            .agg(F.min("h_src").alias("nbr_min"))
        )
        winners = (
            undecided.join(nbr_min, "CUI", "left")
            .where(F.col("nbr_min").isNull() | (F.col("h") < F.col("nbr_min")))
            .select("CUI")
            .withColumn("mis_round", F.lit(r))
            .localCheckpoint(eager=True)
        )
        mis = winners if mis is None else mis.unionByName(winners)
        killed = (
            edges.join(
                winners.select(F.col("CUI").alias("src")), "src", "left_semi"
            )
            .select(F.col("dst").alias("CUI"))
            .distinct()
        )
        undecided = (
            undecided.join(winners.select("CUI"), "CUI", "left_anti")
            .join(killed, "CUI", "left_anti")
            .localCheckpoint(eager=True)
        )
        if undecided.isEmpty():
            break
    return mis


def sql_luby_mis(
    rounds: int = MIS_ROUNDS, min_docs: int = PR_MIN_DOCS
) -> str:
    from sparkmedkg.webgraph import _sql_h60

    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""live{r} AS (
  SELECT e.src, e.dst FROM e
  WHERE e.src IN (SELECT cui FROM u{r - 1})
    AND e.dst IN (SELECT cui FROM u{r - 1})
),
nbrmin{r} AS (
  SELECT l.dst AS cui, MIN(u.h) AS nbr_min
  FROM live{r} l JOIN u{r - 1} u ON u.cui = l.src
  GROUP BY l.dst
),
win{r} AS MATERIALIZED (
  SELECT u.cui, u.h FROM u{r - 1} u
  LEFT JOIN nbrmin{r} n ON n.cui = u.cui
  WHERE n.nbr_min IS NULL OR u.h < n.nbr_min
),
u{r} AS MATERIALIZED (
  SELECT u.cui, u.h FROM u{r - 1} u
  WHERE u.cui NOT IN (SELECT cui FROM win{r})
    AND u.cui NOT IN (
      SELECT e.dst FROM e WHERE e.src IN (SELECT cui FROM win{r}))
)"""
        )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT cui, {r} AS mis_round FROM win{r}"
        for r in range(1, rounds + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
u0 AS MATERIALIZED (
  SELECT DISTINCT src AS cui, {_sql_h60("src")} AS h FROM e
),
{",".join(steps)}
SELECT cui AS CUI, mis_round FROM (
  {unions}
)
"""


# ---------------------------------------------------------------------------
# SimRank (2 iterations, ppm fixed-point, wedge-bounded pair space).
# ---------------------------------------------------------------------------

SIMRANK_C_PPM = 800_000  # decay C = 0.8 in parts-per-million
PPM = 1_000_000


def q_simrank(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(a, b, c_common, s1_ppm, s2_ppm): SimRank similarity after 1 and 2
    iterations for every unordered node pair sharing >=1 neighbor (the
    wedge-adjacent candidate set — the standard sparse truncation; pairs
    with no common neighbor have s1 = 0 and are the classic prune).

    All scores are parts-per-million BIGINTs: with s0 = identity,
    s1(a,b) = C*|I(a) ^ I(b)| / (|I(a)||I(b)|) and
    s2(a,b) = C * sum_{i in I(a), j in I(b)} s1_full(i,j) / (|I(a)||I(b)|)
    — every division is a positive-integer floor-div, so both engines
    produce bit-identical scores (the ppm discipline from
    relations.q_pmi_edges).

    Scale: candidate generation is the degree-bounded wedge join (same
    shape as q_neighbor_jaccard); the s2 pass expands each s1 pair (i,j)
    through its endpoints' adjacency — cost sum deg(i)*deg(j) over s1
    pairs, the documented hub-cap point at web scale."""
    edges = _edges(spark, sf_dir, min_docs)
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e1 = edges.select(F.col("dst").alias("a"), F.col("src").alias("i"))
    e2 = edges.select(F.col("dst").alias("b"), F.col("src").alias("j"))
    cand = (
        e1.join(e2, (F.col("i") == F.col("j")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_common"))
        .join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .withColumn(
            "s1_ppm",
            F.expr(f"CAST({SIMRANK_C_PPM} * c_common AS BIGINT)"
                   " div (da * db)"),
        )
        .localCheckpoint(eager=True)
    )
    s1sym = cand.select("a", "b", "s1_ppm").unionByName(
        cand.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "s1_ppm"
        )
    ).select(F.col("a").alias("i"), F.col("b").alias("j"), "s1_ppm")
    off = (
        edges.select(F.col("dst").alias("a"), F.col("src").alias("i"))
        .join(s1sym, "i")
        .join(
            edges.select(F.col("dst").alias("b"), F.col("src").alias("j")),
            "j",
        )
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("s1_ppm").alias("off_sum"))
    )
    return (
        cand.join(off, ["a", "b"], "left")
        .select(
            "a",
            "b",
            "c_common",
            "s1_ppm",
            F.expr(
                f"CAST({SIMRANK_C_PPM} * "
                f"(coalesce(off_sum, CAST(0 AS BIGINT))"
                f" + CAST({PPM} AS BIGINT) * c_common) AS BIGINT)"
                f" div (CAST({PPM} AS BIGINT) * da * db)"
            ).alias("s2_ppm"),
        )
    )


def sql_simrank(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg
                     FROM e GROUP BY src),
cand AS MATERIALIZED (
  SELECT w.a, w.b, w.c_common, da.deg AS da, db.deg AS db,
         CAST({SIMRANK_C_PPM} * w.c_common AS BIGINT)
           // (da.deg * db.deg) AS s1_ppm
  FROM (
    SELECT e1.dst AS a, e2.dst AS b, CAST(COUNT(*) AS BIGINT) AS c_common
    FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
    GROUP BY e1.dst, e2.dst
  ) w
  JOIN deg da ON da.v = w.a
  JOIN deg db ON db.v = w.b
),
s1sym AS MATERIALIZED (
  SELECT a AS i, b AS j, s1_ppm FROM cand
  UNION ALL
  SELECT b AS i, a AS j, s1_ppm FROM cand
),
off AS (
  SELECT ea.dst AS a, eb.dst AS b, CAST(SUM(s.s1_ppm) AS BIGINT) AS off_sum
  FROM e ea
  JOIN s1sym s ON s.i = ea.src
  JOIN e eb ON eb.src = s.j
  WHERE ea.dst < eb.dst
  GROUP BY ea.dst, eb.dst
)
SELECT c.a, c.b, c.c_common, c.s1_ppm,
       CAST({SIMRANK_C_PPM} *
            (COALESCE(o.off_sum, 0) + CAST({PPM} AS BIGINT) * c.c_common)
            AS BIGINT)
         // (CAST({PPM} AS BIGINT) * c.da * c.db) AS s2_ppm
FROM cand c LEFT JOIN off o ON o.a = c.a AND o.b = c.b
"""


# ---------------------------------------------------------------------------
# Landmark betweenness centrality (Brandes dependency, ppm fixed-point).
# ---------------------------------------------------------------------------

BTW_LANDMARKS = 4
BTW_HOPS = 3


def q_betweenness(
    spark: SparkSession,
    sf_dir: str,
    n_landmarks: int = BTW_LANDMARKS,
    max_hops: int = BTW_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, bc_ppm): landmark-estimated betweenness centrality — Brandes'
    algorithm from the ``n_landmarks`` smallest node ids, truncated at
    ``max_hops`` BFS levels (the standard sampling estimator when
    all-sources Brandes is off the table).  Forward sweep: keyed
    multi-source BFS carrying EXACT BIGINT shortest-path counts
    sigma(lm, v) (the same one-equi-join-per-round frontier as
    q_closeness).  Backward sweep, unrolled deepest-level-first:
    delta(v) = sum over DAG successors w (edges with depth(w) =
    depth(v)+1) of floor(sigma(v) * (PPM + delta(w)) / sigma(w)) — every
    term a positive-integer floor-div of exact BIGINTs, so both engines
    produce bit-identical ppm scores (sigma(v) <= sigma(w) on DAG edges
    bounds each term by PPM + delta(w); at web scale sigma within 3 hops
    is degree^2-bounded, far inside BIGINT).

    Scale: each forward round joins the frontier (not the closure)
    against the persisted edge set; each backward level is one
    (lm, node) equi-join + grouped sum over level-(k+1) rows only.
    Landmarks are a constant, so total cost is O(hops) bounded joins."""
    edges = _edges(spark, sf_dir, min_docs)
    # distributed top-n (sort+limit = TakeOrderedAndProject), no
    # single-task ranking window over the node table
    landmarks = (
        edges.select("src")
        .distinct()
        .orderBy("src")
        .limit(n_landmarks)
        .select(F.col("src").alias("lm"))
    )
    lvl = {
        0: landmarks.select(
            "lm", F.col("lm").alias("CUI"),
            F.lit(1).cast("bigint").alias("sig"),
        ).localCheckpoint(eager=True)
    }
    visited = lvl[0].select("lm", "CUI").localCheckpoint(eager=True)
    for k in range(1, max_hops + 1):
        cand = (
            lvl[k - 1].join(edges, lvl[k - 1]["CUI"] == edges["src"])
            .groupBy("lm", F.col("dst").alias("CUI"))
            .agg(F.sum("sig").alias("sig"))
        )
        lvl[k] = cand.join(
            visited, ["lm", "CUI"], "left_anti"
        ).localCheckpoint(eager=True)
        visited = visited.unionByName(
            lvl[k].select("lm", "CUI")
        ).localCheckpoint(eager=True)
    delta = lvl[max_hops].select(
        "lm", "CUI", "sig", F.lit(0).cast("bigint").alias("delta")
    )
    deltas = [delta]
    for k in range(max_hops - 1, 0, -1):
        child = delta.select(
            F.col("lm").alias("c_lm"), F.col("CUI").alias("c_cui"),
            F.col("sig").alias("c_sig"), F.col("delta").alias("c_delta"),
        )
        terms = (
            lvl[k].join(edges, lvl[k]["CUI"] == edges["src"])
            .join(
                child,
                (F.col("c_lm") == F.col("lm"))
                & (F.col("c_cui") == F.col("dst")),
            )
            .groupBy("lm", "CUI")
            .agg(
                F.sum(
                    F.expr(f"(sig * (CAST({PPM} AS BIGINT) + c_delta))"
                           " div c_sig")
                ).alias("dsum")
            )
        )
        delta = (
            lvl[k].join(terms, ["lm", "CUI"], "left")
            .select(
                "lm", "CUI", "sig",
                F.coalesce(F.col("dsum"), F.lit(0).cast("bigint"))
                .alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        deltas.append(delta)
    all_delta = deltas[0]
    for d in deltas[1:]:
        all_delta = all_delta.unionByName(d)
    return (
        all_delta.groupBy("CUI")
        .agg(F.sum("delta").alias("bc_ppm"))
        .where(F.col("bc_ppm") > 0)
    )


def sql_betweenness(
    n_landmarks: int = BTW_LANDMARKS,
    max_hops: int = BTW_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    fwd = []
    for k in range(1, max_hops + 1):
        fwd.append(
            f"""l{k} AS MATERIALIZED (
  SELECT x.lm, x.cui, x.sig FROM (
    SELECT p.lm, e.dst AS cui, CAST(SUM(p.sig) AS BIGINT) AS sig
    FROM l{k - 1} p JOIN e ON e.src = p.cui
    GROUP BY p.lm, e.dst
  ) x
  WHERE NOT EXISTS (SELECT 1 FROM v{k - 1} s
                    WHERE s.lm = x.lm AND s.cui = x.cui)
),
v{k} AS MATERIALIZED (
  SELECT lm, cui FROM v{k - 1} UNION ALL SELECT lm, cui FROM l{k}
)"""
        )
    bwd = [
        f"d{max_hops} AS MATERIALIZED (SELECT lm, cui, sig,"
        f" CAST(0 AS BIGINT) AS delta FROM l{max_hops})"
    ]
    for k in range(max_hops - 1, 0, -1):
        bwd.append(
            f"""d{k} AS MATERIALIZED (
  SELECT p.lm, p.cui, p.sig, COALESCE(t.dsum, 0) AS delta
  FROM l{k} p
  LEFT JOIN (
    SELECT p2.lm, p2.cui,
           CAST(SUM((p2.sig * ({PPM} + c.delta)) // c.sig) AS BIGINT)
             AS dsum
    FROM l{k} p2
    JOIN e ON e.src = p2.cui
    JOIN d{k + 1} c ON c.lm = p2.lm AND c.cui = e.dst
    GROUP BY p2.lm, p2.cui
  ) t ON t.lm = p.lm AND t.cui = p.cui
)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT cui, delta FROM d{k}" for k in range(1, max_hops + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
l0 AS MATERIALIZED (
  SELECT lm, lm AS cui, CAST(1 AS BIGINT) AS sig FROM (
    SELECT src AS lm, row_number() OVER (ORDER BY src) AS rk
    FROM (SELECT DISTINCT src FROM e)
  ) WHERE rk <= {n_landmarks}
),
v0 AS MATERIALIZED (SELECT lm, cui FROM l0),
{",".join(fwd)},
{",".join(bwd)}
SELECT cui AS CUI, CAST(SUM(delta) AS BIGINT) AS bc_ppm
FROM ({unions})
GROUP BY cui
HAVING SUM(delta) > 0
"""


# ---------------------------------------------------------------------------
# Strongly connected components over a deterministic orientation of the
# co-occurrence backbone.
# ---------------------------------------------------------------------------

SCC_MAX_ROUNDS = 32       # outer peel rounds (>= #SCC layers actually needed)
SCC_MAX_PROP = 64         # inner min-label propagation bound (>= diameter)


def _h60(col) -> Column:
    """First 60 bits of md5 as a non-negative bigint — the shared
    Spark<->DuckDB hash bridge (same as webgraph._h60 / dedup._mh_params;
    duplicated here to keep webgraph -> graphalgo imports acyclic)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _scc_directed_edges(
    spark: SparkSession, sf_dir: str, min_docs: int
) -> DataFrame:
    """Directed (src, dst) edges: each canonical co-occurrence pair x<y
    keeps direction x->y iff h60(x>y) % 3 != 0 and y->x iff h60(y>x) % 3
    != 0 (independent coin flips, both engines use the md5 bridge), so
    ~4/9 of pairs are bidirectional — a directed graph with genuine
    non-trivial SCCs derived purely from the corpus."""
    pairs = (
        _edges(spark, sf_dir, min_docs)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("x"), F.col("dst").alias("y"))
    )
    fwd = pairs.where(
        _h60(F.concat(F.col("x"), F.lit(">"), F.col("y"))) % 3 != 0
    ).select(F.col("x").alias("src"), F.col("y").alias("dst"))
    bwd = pairs.where(
        _h60(F.concat(F.col("y"), F.lit(">"), F.col("x"))) % 3 != 0
    ).select(F.col("y").alias("src"), F.col("x").alias("dst"))
    return fwd.unionByName(bwd).localCheckpoint(eager=True)


def _min_reach_labels(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(cui, lbl): lbl = MIN id over {ancestors of cui along ``edges``}
    UNION {cui} — synchronous min-label propagation run to convergence
    (change-count detection, lineage truncated per sweep).  Per sweep the
    only shuffle is one groupBy(dst) with map-side partial min; sweeps =
    graph diameter, the textbook frontier bound."""
    lbl = nodes.select("cui", F.col("cui").alias("lbl")).localCheckpoint(
        eager=True
    )
    for _ in range(SCC_MAX_PROP):
        cand = (
            edges.select(F.col("src").alias("j"), F.col("dst").alias("cui"))
            .join(
                lbl.select(F.col("cui").alias("j"), F.col("lbl").alias("src_lbl")),
                "j",
            )
            .groupBy("cui")
            .agg(F.min("src_lbl").alias("in_lbl"))
        )
        nxt = (
            lbl.join(cand, "cui", "left")
            .select(
                "cui",
                F.col("lbl").alias("old_lbl"),
                F.least(
                    F.col("lbl"), F.coalesce(F.col("in_lbl"), F.col("lbl"))
                ).alias("new_lbl"),
            )
            .localCheckpoint(eager=True)
        )
        converged = nxt.where(F.col("new_lbl") != F.col("old_lbl")).isEmpty()
        lbl = nxt.select("cui", F.col("new_lbl").alias("lbl")).localCheckpoint(
            eager=True
        )
        if converged:
            break
    return lbl


def q_scc(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(cui, scc_id): strongly connected components of the directed
    co-occurrence orientation (``_scc_directed_edges``), scc_id = the
    minimum member id.  The classic distributed label-peel: per round,
    (1) TRIM nodes with no in- or no out-edges in the live subgraph
    (singleton SCCs, peeled en masse — the step that makes real web
    graphs converge in a handful of rounds), (2) compute forward and
    backward min-reach labels; nodes where fwd == bwd == L are exactly
    SCC(L) for every L that is its component's min-reachable witness —
    at least the live minimum's SCC peels every round, so the loop
    terminates.  All per-round work is frontier joins + partial-agg
    shuffles over the LIVE subgraph only; at web scale the trim step
    removes the long singleton tail first, exactly like FW-BW-Trim
    (Slota et al.), leaving the small cyclic core for the label rounds.

    Extends the reference's single fixed /intersection graph query
    (neo4jconnector.py:267-316) with the component structure a KG
    curation service reports."""
    dedges = _scc_directed_edges(spark, sf_dir, min_docs)
    nodes = (
        dedges.select(F.col("src").alias("cui"))
        .unionByName(dedges.select(F.col("dst").alias("cui")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done: DataFrame | None = None
    edges = dedges
    for _ in range(SCC_MAX_ROUNDS):
        if nodes.isEmpty():
            break
        # trim: no out-edges or no in-edges among live nodes -> singleton
        has_out = nodes.join(
            edges.select(F.col("src").alias("cui")).distinct(), "cui", "left_semi"
        )
        has_in = nodes.join(
            edges.select(F.col("dst").alias("cui")).distinct(), "cui", "left_semi"
        )
        core = has_out.join(has_in, "cui", "left_semi").localCheckpoint(eager=True)
        trimmed = nodes.join(core, "cui", "left_anti").select(
            "cui", F.col("cui").alias("scc_id")
        )
        done = trimmed if done is None else done.unionByName(trimmed)
        if core.isEmpty():
            nodes = core
            break
        live_edges = (
            edges.join(core.select(F.col("cui").alias("src")), "src", "left_semi")
            .join(core.select(F.col("cui").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        fwd = _min_reach_labels(core, live_edges).select(
            "cui", F.col("lbl").alias("flbl")
        )
        rev = live_edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        bwd = _min_reach_labels(core, rev).select(
            F.col("cui").alias("cui_b"), F.col("lbl").alias("blbl")
        )
        peel = (
            fwd.join(bwd, F.col("cui") == F.col("cui_b"))
            .where(F.col("flbl") == F.col("blbl"))
            .select("cui", F.col("flbl").alias("scc_id"))
            .localCheckpoint(eager=True)
        )
        done = done.unionByName(peel).localCheckpoint(eager=True)
        nodes = core.join(peel.select("cui"), "cui", "left_anti").localCheckpoint(
            eager=True
        )
        edges = (
            live_edges.join(
                nodes.select(F.col("cui").alias("src")), "src", "left_semi"
            )
            .join(nodes.select(F.col("cui").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    assert nodes.isEmpty(), "SCC peel did not converge within SCC_MAX_ROUNDS"
    if done is None:  # degenerate empty graph
        return dedges.select(
            F.col("src").alias("cui"), F.col("src").alias("scc_id")
        ).limit(0)
    return done


def _sql_scc_ctes(min_docs: int = PR_MIN_DOCS) -> str:
    """The directed-orientation + transitive-closure + SCC-label CTE
    chain (ends with ``scc(cui, scc_id)``) shared by sql_scc and
    sql_feedback_edges — one copy of the closure math, never two."""
    h = "CAST('0x' || substring(md5({e}), 1, 15) AS BIGINT)"
    hf = h.format(e="x || '>' || y")
    hb = h.format(e="y || '>' || x")
    return f"""{sql_cooccur_edges_cte(min_docs)},
pairs AS (SELECT x, y FROM und),
dedges AS (
  SELECT x AS src, y AS dst FROM pairs WHERE {hf} % 3 <> 0
  UNION ALL
  SELECT y AS src, x AS dst FROM pairs WHERE {hb} % 3 <> 0
),
vs AS (SELECT src AS v FROM dedges UNION SELECT dst FROM dedges),
reach(a, b) AS (
  SELECT src, dst FROM dedges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN dedges e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
),
scc AS (
  SELECT vs.v AS cui,
         LEAST(vs.v, COALESCE(MIN(m.u), vs.v)) AS scc_id
  FROM vs LEFT JOIN mutual m ON m.v = vs.v
  GROUP BY vs.v
)"""


def sql_scc(min_docs: int = PR_MIN_DOCS) -> str:
    """Exact SCC via recursive transitive closure (tractable at oracle
    scale): scc_id(v) = MIN({v} U {u : v ~> u AND u ~> v})."""
    return f"""
WITH RECURSIVE {_sql_scc_ctes(min_docs)}
SELECT cui, scc_id FROM scc
"""


def q_feedback_edges(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(src, dst, scc_id, scc_size): the cycle-closing edges of the
    directed co-occurrence orientation — exactly the edges whose
    endpoints share a strongly connected component.  An edge inside an
    SCC lies on at least one directed cycle; every cross-SCC edge lies
    on none, so this set is the exact "which edges create feedback
    loops" audit an ontology/KG curation pass runs before forcing a DAG
    (the full minimum feedback-arc set is NP-hard; the SCC membership
    test is the exact superset every FAS heuristic starts from).

    Composes the already-gated q_scc labels with two hash-joins back to
    the edge list; scc_size (component member count) ranks which cores
    to untangle first.

    Plan: SCC labels via the trim+label peel (see q_scc — live-subgraph
    frontier work only); the label table is node-sized, far smaller than
    the edge set, so both endpoint joins broadcast at web scale; the
    size lookup aggregates the node-sized label table."""
    dedges = _scc_directed_edges(spark, sf_dir, min_docs)
    scc = q_scc(spark, sf_dir, min_docs).localCheckpoint(eager=True)
    sizes = scc.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("scc_size")
    )
    return (
        dedges.join(
            scc.select(F.col("cui").alias("src"), F.col("scc_id").alias("s_id")),
            "src",
        )
        .join(
            scc.select(F.col("cui").alias("dst"), F.col("scc_id").alias("d_id")),
            "dst",
        )
        .where(F.col("s_id") == F.col("d_id"))
        .select("src", "dst", F.col("s_id").alias("scc_id"))
        .join(sizes, "scc_id")
        .select("src", "dst", "scc_id", "scc_size")
    )


def sql_feedback_edges(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH RECURSIVE {_sql_scc_ctes(min_docs)},
sizes AS (
  SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS scc_size
  FROM scc GROUP BY scc_id
)
SELECT e.src, e.dst, s1.scc_id, z.scc_size
FROM dedges e
JOIN scc s1 ON s1.cui = e.src
JOIN scc s2 ON s2.cui = e.dst AND s2.scc_id = s1.scc_id
JOIN sizes z ON z.scc_id = s1.scc_id
"""


# ---------------------------------------------------------------------------
# Neighborhood function (distance distribution).
# ---------------------------------------------------------------------------

NF_MAX_D = 3


def q_neighborhood_func(
    spark: SparkSession,
    sf_dir: str,
    max_d: int = NF_MAX_D,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(d, n_pairs): number of ordered node pairs at shortest-path distance
    exactly d, d = 1..max_d — the neighborhood function N(d) behind
    effective-diameter and average-distance reports.  Layered all-source
    BFS: layer d is (layer d-1 join edges) minus everything already
    reached, so each pair is counted at its true minimum distance.

    Scale note: exact pair sets grow toward O(n * ball(d)); at web scale
    the published answer is HyperBall (Boldi & Vigna) — one HLL register
    array per node, unioned along edges per round, which this repo's
    register-level HLL primitives (webgraph.hll_distinct / hll_union)
    already implement; the exact layered form here is the oracle-checkable
    contract at validation scale, and the counts-only output (max_d rows)
    is what either implementation emits."""
    edges = _edges(spark, sf_dir, min_docs).select("src", "dst").distinct()
    edges = edges.localCheckpoint(eager=True)
    cur = edges
    reached = edges
    counts = [(1, cur.count())]
    for d in range(2, max_d + 1):
        step = (
            cur.select(F.col("src"), F.col("dst").alias("mid"))
            .join(
                edges.select(F.col("src").alias("mid"), F.col("dst")), "mid"
            )
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .join(reached, ["src", "dst"], "left_anti")
            .localCheckpoint(eager=True)
        )
        counts.append((d, step.count()))
        reached = reached.unionByName(step).localCheckpoint(eager=True)
        cur = step
    return spark.createDataFrame(counts, "d int, n_pairs long")


def sql_neighborhood_func(
    max_d: int = NF_MAX_D, min_docs: int = PR_MIN_DOCS
) -> str:
    layers = ["p1 AS (SELECT DISTINCT src, dst FROM edges)"]
    for d in range(2, max_d + 1):
        prior = " UNION ALL ".join(
            f"SELECT src, dst FROM p{k}" for k in range(1, d)
        )
        layers.append(
            f"""p{d} AS (
  SELECT DISTINCT a.src, e.dst
  FROM p{d - 1} a JOIN edges e ON e.src = a.dst
  WHERE a.src <> e.dst
  EXCEPT
  SELECT src, dst FROM ({prior})
)"""
        )
    unions = "\nUNION ALL ".join(
        f"SELECT {d} AS d, COUNT(*) AS n_pairs FROM p{d}"
        for d in range(1, max_d + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
{",".join(layers)}
{unions}
"""


# ---------------------------------------------------------------------------
# Single-source shortest-path TREE (dist + parent) — Cypher shortestPath
# parity for the Neo4j-replacement story.
# ---------------------------------------------------------------------------

def q_shortest_path_tree(
    spark: SparkSession,
    sf_dir: str,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(cui, dist, parent): BFS tree from the deterministic seed (minimum
    CUI) with parent pointers — parent(v) = the MINIMUM-id neighbor of v at
    dist-1, so the tree (and thus every reconstructed path) is unique and
    engine-stable.  This is the bulk form of Cypher's shortestPath(): the
    reference's Neo4j store answers one (a, b) pair per call
    (neo4jconnector.py), while one pass here yields the whole tree and any
    path is a parent-chain walk over |path| lookups.

    Plan: the frontier iteration is q_bfs_reach's (per-round cost tracks
    the frontier); the parent assignment is ONE extra edge join against the
    final visited table with a min() partial agg — no per-round overhead."""
    edges = _edges(spark, sf_dir, min_docs)
    visited = q_bfs_reach(spark, sf_dir, max_hops=max_hops, min_docs=min_docs)
    prev = visited.select(
        F.col("CUI").alias("src"), F.col("dist").alias("pd")
    )
    parents = (
        visited.where(F.col("dist") > 0)
        .join(edges, visited["CUI"] == edges["dst"])
        .join(prev, "src")
        .where(F.col("pd") == F.col("dist") - 1)
        .groupBy("CUI", "dist")
        .agg(F.min("src").alias("parent"))
    )
    root = visited.where(F.col("dist") == 0).select(
        "CUI", "dist", F.lit(None).cast("string").alias("parent")
    )
    return root.unionByName(
        parents.select("CUI", "dist", "parent")
    ).select(F.col("CUI").alias("cui"), "dist", "parent")


def sql_shortest_path_tree(
    max_hops: int = BFS_MAX_HOPS, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for k in range(1, max_hops + 1):
        steps.append(
            f"""r{k} AS (
  SELECT cui, MIN(dist) AS dist FROM (
    SELECT cui, dist FROM r{k - 1}
    UNION ALL
    SELECT e.dst AS cui, p.dist + 1 AS dist
    FROM r{k - 1} p JOIN e ON e.src = p.cui
  ) GROUP BY cui
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT src, dst FROM edges),
r0 AS (SELECT (SELECT MIN(src) FROM e) AS cui, 0 AS dist),
{unrolled},
vis AS MATERIALIZED (SELECT cui, dist FROM r{max_hops})
SELECT v.cui, v.dist, NULL AS parent FROM vis v WHERE v.dist = 0
UNION ALL
SELECT v.cui, v.dist, MIN(e.src) AS parent
FROM vis v
JOIN e ON e.dst = v.cui
JOIN vis p ON p.cui = e.src AND p.dist = v.dist - 1
WHERE v.dist > 0
GROUP BY v.cui, v.dist
"""


# ---------------------------------------------------------------------------
# Rich-club coefficient (hub interconnection density).
# ---------------------------------------------------------------------------

RC_MAX_K = 4


def q_rich_club(
    spark: SparkSession,
    sf_dir: str,
    max_k: int = RC_MAX_K,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(k, n_nodes, n_edges, phi): rich-club coefficient for k = 1..max_k —
    among nodes of degree > k, the fraction of possible edges actually
    present (phi = E_k / (N_k choose 2)).  High phi at high k means hubs
    wire to each other (the web's rich-club ordering); the structural
    summary used to sanity-check synthetic graphs against real crawls.

    Plan: one degree aggregate; the per-k membership tests are an
    explode over the k grid joined against the (node-pair-sized) canonical
    edge list with both endpoint degrees attached — two broadcast-able
    joins and one (k) rollup; nothing corpus-scale moves."""
    edges = _edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ks = spark.range(1, max_k + 1).select(F.col("id").cast("int").alias("k"))
    nodes_k = (
        ks.join(deg.select("deg"))
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    pairs = (
        edges.where(F.col("src") < F.col("dst"))
        .join(deg.select(F.col("src"), F.col("deg").alias("da")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("db")),
            "dst",
        )
    )
    edges_k = (
        ks.join(pairs.select("da", "db"))
        .where((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        nodes_k.join(edges_k, "k", "left")
        .select(
            "k",
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0).cast("bigint")).alias(
                "n_edges"
            ),
            F.round(
                F.coalesce(F.col("n_edges"), F.lit(0)).cast("double")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2.0),
                6,
            ).alias("phi"),
        )
        .where(F.col("n_nodes") >= 2)
    )


def sql_rich_club(
    max_k: int = RC_MAX_K, min_docs: int = PR_MIN_DOCS
) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
ks AS (SELECT unnest(generate_series(1, {max_k})) AS k),
nodes_k AS (
  SELECT k, COUNT(*) AS n_nodes
  FROM ks JOIN deg ON deg.deg > ks.k
  GROUP BY k
),
pairs AS (
  SELECT e.src, e.dst, da.deg AS da, db.deg AS db
  FROM edges e JOIN deg da ON da.src = e.src
               JOIN deg db ON db.src = e.dst
  WHERE e.src < e.dst
),
edges_k AS (
  SELECT k, COUNT(*) AS n_edges
  FROM ks JOIN pairs ON pairs.da > ks.k AND pairs.db > ks.k
  GROUP BY k
)
SELECT n.k, n.n_nodes, COALESCE(e.n_edges, 0) AS n_edges,
       round(COALESCE(e.n_edges, 0)::DOUBLE
             / (n.n_nodes * (n.n_nodes - 1) / 2.0), 6) AS phi
FROM nodes_k n LEFT JOIN edges_k e ON n.k = e.k
WHERE n.n_nodes >= 2
"""


# ---------------------------------------------------------------------------
# HyperBall (Boldi & Vigna): HLL-register neighborhood-function estimation.
# ---------------------------------------------------------------------------

HB_P = 6                     # 2^6 = 64 registers per node
HB_M = 1 << HB_P
_HB_ALPHA = f"0.7213 / (1.0 + 1.079 / {HB_M})"


def _hb_rho(h):
    """HLL rank of the 60-bit hash's upper bits — the exact integer
    bit-length construction of webgraph.hll_distinct (bit-identical across
    engines; duplicated to keep webgraph -> graphalgo imports acyclic)."""
    rem = F.shiftright(h, HB_P)
    bitlen = F.length(F.conv(rem.cast("string"), 10, 2))
    return F.when(rem == 0, F.lit(61 - HB_P)).otherwise(
        F.lit(60 - HB_P) - bitlen + 1
    )


def q_hyperball(
    spark: SparkSession,
    sf_dir: str,
    max_d: int = NF_MAX_D,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(d, n_nodes, est_total): HyperBall — per-node HLL register arrays
    unioned along edges per round, so after round d each node's sketch
    estimates |ball(v, d)|; est_total is the summed estimate (the sketched
    neighborhood function N^(d) that kg_neighborhood_func computes
    exactly).  THIS is the web-scale path the exact operator's docstring
    promises: state is |V| x 64 register ROWS, each round is one edge join
    + one (node, register) partial-agg MAX — mergeable, skew-free, and
    at 10^9 nodes the whole iteration is two shuffles per round against
    the exact operator's O(n * ball) pair materialization.

    Determinism: registers are exact integers; each node's estimate is a
    fixed closed form over its own 64 registers rounded to centi-units
    BEFORE the cross-node sum, which is therefore an exact BIGINT sum."""
    edges = _edges(spark, sf_dir, min_docs)
    nodes = edges.select(F.col("src").alias("cui")).distinct()
    h = _h60(F.col("cui"))
    regs = nodes.select(
        "cui", (h % HB_M).alias("reg"), _hb_rho(h).alias("mx")
    ).localCheckpoint(eager=True)

    def _estimate(r: DataFrame, d: int) -> DataFrame:
        per_node = r.groupBy("cui").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_regs"),
        )
        v = F.lit(HB_M) - F.col("n_regs")
        s = F.col("s_present") + v.cast("double")
        raw = F.expr(_HB_ALPHA) * F.lit(float(HB_M * HB_M)) / s
        est = F.when(
            (raw <= 2.5 * HB_M) & (v > 0),
            F.lit(float(HB_M)) * F.log(F.lit(float(HB_M)) / v.cast("double")),
        ).otherwise(raw)
        cents = F.round(est * 100).cast("bigint")
        return per_node.select(cents.alias("c")).agg(
            F.lit(d).alias("d"),
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(F.sum("c") / 100.0, 2).alias("est_total"),
        )

    out = None
    for d in range(1, max_d + 1):
        grown = (
            edges.select(F.col("src").alias("j"), F.col("dst").alias("cui"))
            .join(
                regs.select(
                    F.col("cui").alias("j"), F.col("reg"), F.col("mx")
                ),
                "j",
            )
            .select("cui", "reg", "mx")
            .unionByName(regs)
            .groupBy("cui", "reg")
            .agg(F.max("mx").alias("mx"))
            .localCheckpoint(eager=True)
        )
        regs = grown
        row = _estimate(regs, d)
        out = row if out is None else out.unionByName(row)
    return out


def sql_hyperball(
    max_d: int = NF_MAX_D, min_docs: int = PR_MIN_DOCS
) -> str:
    h = "CAST('0x' || substring(md5(cui), 1, 15) AS BIGINT)"
    rho = (
        f"CASE WHEN {h} // {HB_M} = 0 THEN {61 - HB_P} "
        f"ELSE {60 - HB_P} - length(to_base({h} // {HB_M}, 2)) + 1 END"
    )
    steps = []
    for d in range(1, max_d + 1):
        steps.append(
            f"""r{d} AS MATERIALIZED (
  SELECT cui, reg, MAX(mx) AS mx FROM (
    SELECT e.dst AS cui, p.reg, p.mx
    FROM e JOIN r{d - 1} p ON e.src = p.cui
    UNION ALL
    SELECT cui, reg, mx FROM r{d - 1}
  ) GROUP BY cui, reg
)"""
        )
    ests = []
    for d in range(1, max_d + 1):
        ests.append(
            f"""SELECT {d} AS d, COUNT(*) AS n_nodes,
       round(SUM(c) / 100.0, 2) AS est_total
FROM (
  SELECT cui,
         CAST(round(CASE WHEN {_HB_ALPHA} * {HB_M * HB_M}
                              / (SUM(power(2.0, -mx)) + ({HB_M} - COUNT(*)))
                          <= 2.5 * {HB_M}
                      AND {HB_M} - COUNT(*) > 0
                     THEN {HB_M} * ln({HB_M}::DOUBLE / ({HB_M} - COUNT(*)))
                     ELSE {_HB_ALPHA} * {HB_M * HB_M}
                          / (SUM(power(2.0, -mx)) + ({HB_M} - COUNT(*)))
                END * 100) AS BIGINT) AS c
  FROM r{d} GROUP BY cui
)"""
        )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT src, dst FROM edges),
r0 AS (
  SELECT cui, {h} % {HB_M} AS reg, {rho} AS mx
  FROM (SELECT DISTINCT src AS cui FROM e)
),
{",".join(steps)}
{" UNION ALL ".join(ests)}
"""


# ---------------------------------------------------------------------------
# Bow-tie decomposition of the directed graph (Broder et al. 2000).
# ---------------------------------------------------------------------------

def _reach_from(seed: DataFrame, edges: DataFrame) -> DataFrame:
    """(cui): all nodes reachable FROM the seed set along ``edges``
    (seed included) — frontier BFS to fixpoint, lineage truncated per
    hop."""
    visited = seed.select("cui").distinct().localCheckpoint(eager=True)
    frontier = visited
    for _ in range(SCC_MAX_PROP):
        nxt = (
            frontier.select(F.col("cui").alias("src"))
            .join(edges, "src")
            .select(F.col("dst").alias("cui"))
            .distinct()
            .join(visited, "cui", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def q_bowtie(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(component, n_nodes): the Broder bow-tie decomposition of the
    directed co-occurrence orientation — CORE (the largest SCC, ties to
    the smallest id), IN (reaches the core), OUT (reached from the core),
    OTHER (tendrils/disconnected).  The macro-structure report crawl
    planners read: IN is where new-seed discovery pays off, OUT is where
    crawling deepens without feeding back.

    Plan: reuses q_scc (label peel) for the core, then TWO frontier BFS
    fixpoints (forward along edges, forward along reversed edges = who
    reaches the core); membership tests are anti/semi-joins on the node
    set — everything is node-pair-sized."""
    dedges = _scc_directed_edges(spark, sf_dir, min_docs)
    scc = q_scc(spark, sf_dir, min_docs=min_docs).localCheckpoint(eager=True)
    top = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("scc_id"))
        .limit(1)
        .collect()
    )
    core_id = top[0]["scc_id"]
    core = scc.where(F.col("scc_id") == core_id).select("cui")
    rev = dedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    from_core = _reach_from(core, dedges)
    to_core = _reach_from(core, rev)
    nodes = scc.select("cui")
    in_set = to_core.join(core, "cui", "left_anti")
    out_set = from_core.join(core, "cui", "left_anti")
    other = (
        nodes.join(to_core, "cui", "left_anti")
        .join(from_core, "cui", "left_anti")
    )
    parts = [
        ("core", core),
        ("in", in_set),
        ("out", out_set),
        ("other", other),
    ]
    out = None
    for name, df in parts:
        row = df.agg(
            F.lit(name).alias("component"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def sql_bowtie(min_docs: int = PR_MIN_DOCS) -> str:
    h = "CAST('0x' || substring(md5({e}), 1, 15) AS BIGINT)"
    hf = h.format(e="x || '>' || y")
    hb = h.format(e="y || '>' || x")
    return f"""
WITH RECURSIVE {sql_cooccur_edges_cte(min_docs)},
pairs AS (SELECT x, y FROM und),
dedges AS (
  SELECT x AS src, y AS dst FROM pairs WHERE {hf} % 3 <> 0
  UNION ALL
  SELECT y AS src, x AS dst FROM pairs WHERE {hb} % 3 <> 0
),
vs AS (SELECT src AS v FROM dedges UNION SELECT dst FROM dedges),
reach(a, b) AS (
  SELECT src, dst FROM dedges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN dedges e ON e.src = r.b
),
rc AS MATERIALIZED (SELECT a, b FROM reach),
mutual AS (
  SELECT r1.a AS v, r1.b AS u
  FROM rc r1 JOIN rc r2 ON r2.a = r1.b AND r2.b = r1.a
),
scc AS MATERIALIZED (
  SELECT vs.v, LEAST(vs.v, COALESCE(MIN(m.u), vs.v)) AS scc_id
  FROM vs LEFT JOIN mutual m ON m.v = vs.v
  GROUP BY vs.v
),
core AS MATERIALIZED (
  SELECT v FROM scc
  WHERE scc_id = (SELECT scc_id FROM (
    SELECT scc_id, COUNT(*) AS c FROM scc GROUP BY scc_id
    ORDER BY c DESC, scc_id LIMIT 1))
),
from_core AS (
  -- outer DISTINCT: DuckDB 1.0 skips UNION dedup when a branch reads a
  -- recursive CTE inside a WITH RECURSIVE block
  SELECT DISTINCT v FROM (
    SELECT v FROM core
    UNION ALL SELECT r.b FROM rc r JOIN core c ON r.a = c.v
  )
),
to_core AS (
  SELECT DISTINCT v FROM (
    SELECT v FROM core
    UNION ALL SELECT r.a FROM rc r JOIN core c ON r.b = c.v
  )
),
comp AS (
  SELECT s.v,
         CASE WHEN c.v IS NOT NULL THEN 'core'
              WHEN t.v IS NOT NULL THEN 'in'
              WHEN f.v IS NOT NULL THEN 'out'
              ELSE 'other' END AS component
  FROM scc s
  LEFT JOIN core c ON s.v = c.v
  LEFT JOIN to_core t ON s.v = t.v
  LEFT JOIN from_core f ON s.v = f.v
),
grid(component) AS (VALUES ('core'), ('in'), ('out'), ('other'))
SELECT g.component, COUNT(comp.v) AS n_nodes
FROM grid g LEFT JOIN comp ON comp.component = g.component
GROUP BY g.component
"""


# ---------------------------------------------------------------------------
# Community conductance (cut quality per LPA community).
# ---------------------------------------------------------------------------

# Conductance is scored at the FIRST LPA round: at convergence the fixture
# collapses to one community, where phi is degenerate (no cut) by
# definition — round 1 is where cut quality is informative.
CONDUCT_ITERS = 1


def q_conductance(
    spark: SparkSession,
    sf_dir: str,
    iters: int = CONDUCT_ITERS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(label, n_nodes, vol, cut, conductance): per-community cut quality
    phi(S) = cut(S) / min(vol(S), vol(V) - vol(S)) over the LPA
    communities — the standard audit of whether detected communities are
    real (low phi) or artifacts of the labeler (phi near 1).  ``vol`` is
    the sum of member degrees, ``cut`` the number of edge endpoints
    leaving the community (edges are symmetric, so both are directed-row
    counts).

    Plan: labels come from the same fixed-iteration deterministic LPA as
    q_label_propagation; scoring is the edge set joined to labels on BOTH
    endpoints (two broadcast-joinable label frames) then ONE map-side
    combinable groupBy on the src label; total volume is a 1-row
    broadcast.  No per-community loop — all communities score in one
    pass."""
    edges = _edges(spark, sf_dir, min_docs)
    labels = q_label_propagation(spark, sf_dir, iters, min_docs)
    la = labels.select(F.col("CUI").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("CUI").alias("dst"), F.col("label").alias("lb"))
    per = (
        edges.join(la, "src")
        .join(lb, "dst")
        .groupBy(F.col("la").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("vol"),
            F.sum(
                F.when(F.col("la") != F.col("lb"), 1).otherwise(0)
            ).alias("cut"),
        )
    )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))
    total = per.agg(F.sum("vol").alias("tv"))
    return (
        per.join(sizes, "label")
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            "n_nodes",
            "vol",
            "cut",
            F.when(
                F.least(F.col("vol"), F.col("tv") - F.col("vol")) > 0,
                F.round(
                    F.col("cut").cast("double")
                    / F.least(F.col("vol"), F.col("tv") - F.col("vol"))
                    .cast("double"),
                    6,
                ),
            ).alias("conductance"),
        )
    )


def sql_conductance(
    iters: int = CONDUCT_ITERS, min_docs: int = PR_MIN_DOCS
) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
{_sql_lpa_steps(iters)},
lab AS (SELECT cui, label FROM l{iters}),
per AS (
  SELECT la.label, COUNT(*) AS vol,
         CAST(SUM(CASE WHEN la.label <> lb.label THEN 1 ELSE 0 END)
              AS BIGINT) AS cut
  FROM edges e JOIN lab la ON e.src = la.cui
               JOIN lab lb ON e.dst = lb.cui
  GROUP BY la.label
),
sizes AS (SELECT label, COUNT(*) AS n_nodes FROM lab GROUP BY label),
tv AS (SELECT CAST(SUM(vol) AS BIGINT) AS tv FROM per)
SELECT p.label, s.n_nodes, p.vol, p.cut,
       CASE WHEN least(p.vol, (SELECT tv FROM tv) - p.vol) > 0
            THEN round(p.cut::DOUBLE
                       / least(p.vol, (SELECT tv FROM tv) - p.vol)::DOUBLE, 6)
       END AS conductance
FROM per p JOIN sizes s ON p.label = s.label
"""


# ---------------------------------------------------------------------------
# node2vec biased second-order walks (Grover & Leskovec 2016).
# ---------------------------------------------------------------------------

N2V_LEN = 3
# return/in-out bias in integer milli-weights: 1/p, 1, 1/q with p=2, q=0.5
N2V_W_RETURN = 500    # x == prev        (1/p, p = 2: discourage backtrack)
N2V_W_COMMON = 1000   # x adjacent prev  (BFS-ish stay-local weight)
N2V_W_OUT = 2000      # else             (1/q, q = 0.5: encourage outward)


def q_node2vec_walks(
    spark: SparkSession,
    sf_dir: str,
    walk_len: int = N2V_LEN,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(walk, step, node): one fixed-length node2vec walk per start node —
    the second-order biased variant of q_random_walks, where the next-hop
    distribution depends on the PREVIOUS node: weight 1/p to return to it,
    1 to move to a mutual neighbor, 1/q to explore outward.  Weights are
    exact integer milli-units and the draw is the md5 hash of
    (walk, step, prev>cur) against the candidate set's integer cumulative
    weights, so the walk corpus is bit-reproducible across engines,
    partitionings, and retries.

    Scale shape: the first-order rank-match trick (O(|V|) state rows per
    step) can't apply — the bias needs every candidate's (prev, next)
    adjacency — so each step pays the honest node2vec cost: one frontier
    join on cur = src (fan-out = deg), one LEFT join probing prev-next
    adjacency, one per-walk prefix-sum window to place the draw.  Per-step
    traffic is O(sum deg over frontier) — linear in edges, never
    quadratic — and lineage is truncated per hop."""
    edges = _edges(spark, sf_dir, min_docs)
    state = (
        edges.select(F.col("src").alias("walk"))
        .distinct()
        .select(
            "walk",
            F.col("walk").alias("prev"),
            F.col("walk").alias("node"),
        )
        .localCheckpoint(eager=True)
    )
    out = state.select("walk", F.lit(0).alias("step"), "node")
    adj = edges.select(
        F.col("src").alias("a_src"), F.col("dst").alias("a_dst"),
        F.lit(1).alias("is_adj"),
    )
    for t in range(1, walk_len + 1):
        cand = (
            state.join(edges, state["node"] == edges["src"])
            .select("walk", "prev", "node", F.col("dst").alias("x"))
            .join(
                adj,
                (F.col("prev") == F.col("a_src"))
                & (F.col("x") == F.col("a_dst")),
                "left",
            )
            .select(
                "walk",
                "prev",
                "node",
                "x",
                F.when(F.col("x") == F.col("prev"), N2V_W_RETURN)
                .when(F.col("is_adj").isNotNull(), N2V_W_COMMON)
                .otherwise(N2V_W_OUT)
                .cast("bigint")
                .alias("wt"),
            )
        )
        w_all = Window.partitionBy("walk")
        w_pre = (
            Window.partitionBy("walk")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        scored = cand.select(
            "walk",
            "prev",
            "node",
            "x",
            "wt",
            F.coalesce(F.sum("wt").over(w_pre), F.lit(0)).alias("cum"),
            F.sum("wt").over(w_all).alias("s"),
            _walk_choice(
                F.col("walk"),
                t,
                F.concat(F.col("prev"), F.lit(">"), F.col("node")),
            ).alias("dr"),
        )
        r = F.col("dr") % F.col("s")
        state = (
            scored.where((F.col("cum") <= r) & (r < F.col("cum") + F.col("wt")))
            .select(
                "walk", F.col("node").alias("prev"), F.col("x").alias("node")
            )
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            state.select("walk", F.lit(t).alias("step"), "node")
        )
    return out


def sql_node2vec_walks(
    walk_len: int = N2V_LEN, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for t in range(1, walk_len + 1):
        draw = (
            f"CAST('0x' || substring(md5(walk || '|{t}|' || prev || '>' || "
            "node), 1, 15) AS BIGINT)"
        )
        steps.append(
            f"""c{t} AS (
  SELECT p.walk, p.prev, p.node, e.dst AS x,
         CAST(CASE WHEN e.dst = p.prev THEN {N2V_W_RETURN}
              WHEN a.src IS NOT NULL THEN {N2V_W_COMMON}
              ELSE {N2V_W_OUT} END AS BIGINT) AS wt
  FROM w{t - 1} p
  JOIN edges e ON e.src = p.node
  LEFT JOIN edges a ON a.src = p.prev AND a.dst = e.dst
),
s{t} AS (
  SELECT walk, prev, node, x, wt,
         COALESCE(SUM(wt) OVER (PARTITION BY walk ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum,
         SUM(wt) OVER (PARTITION BY walk) AS s,
         {draw} AS dr
  FROM c{t}
),
w{t} AS (
  SELECT walk, node AS prev, x AS node
  FROM s{t}
  WHERE cum <= dr % s AND dr % s < cum + wt
)"""
        )
    unrolled = ",\n".join(steps)
    union = "\nUNION ALL\n".join(
        f"SELECT walk, {t} AS step, node FROM w{t}"
        for t in range(walk_len + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
w0 AS (SELECT DISTINCT src AS walk, src AS prev, src AS node FROM edges),
{unrolled}
SELECT walk, step, node FROM ({union})
"""


# ---------------------------------------------------------------------------
# Harmonic centrality (landmark-estimated, exact integer arithmetic).
# ---------------------------------------------------------------------------

def _lcm_weights(max_hops: int) -> dict[int, int]:
    import math

    l = math.lcm(*range(1, max_hops + 1))
    return {d: l // d for d in range(1, max_hops + 1)}


def q_harmonic(
    spark: SparkSession,
    sf_dir: str,
    n_landmarks: int = CLOSENESS_LANDMARKS,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, n_lm, harmonic): landmark-estimated harmonic centrality —
    sum over reaching landmarks of 1/dist.  Harmonic (Boldi & Vigna 2014)
    is the centrality of choice on disconnected web-scale graphs because
    unreachable pairs contribute 0 instead of breaking the mean, so no
    giant-component gating is needed.

    Same ONE-keyed-frontier multi-source BFS as q_closeness (per-round
    cost independent of landmark count).  The 1/d accumulation is kept
    EXACT: each distance d contributes the integer LCM(1..max_hops)/d, so
    the shuffle sums BIGINTs (order-independent across engines and
    partitionings) and the single float division happens once per output
    row — no cross-engine double-accumulation drift possible."""
    lcm_w = _lcm_weights(max_hops)
    lcm = lcm_w[1]
    edges = _edges(spark, sf_dir, min_docs)
    # distributed top-n (sort+limit = TakeOrderedAndProject), no
    # single-task ranking window over the node table
    landmarks = (
        edges.select("src")
        .distinct()
        .orderBy("src")
        .limit(n_landmarks)
        .select(F.col("src").alias("lm"))
    )
    visited = landmarks.select(
        "lm", F.col("lm").alias("CUI"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = visited
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["CUI"] == edges["src"])
            .select("lm", F.col("dst").alias("CUI"))
            .distinct()
            .join(visited.select("lm", "CUI"), ["lm", "CUI"], "left_anti")
            .withColumn("dist", F.lit(k))
        )
        frontier = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    wt = F.col("dist")
    expr = None
    for d, v in lcm_w.items():
        expr = (
            F.when(wt == d, F.lit(v)) if expr is None
            else expr.when(wt == d, F.lit(v))
        )
    reach = visited.where(F.col("dist") > 0)
    return reach.groupBy("CUI").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lm"),
        F.sum(expr.cast("bigint")).alias("h_lcm"),
    ).select(
        "CUI",
        "n_lm",
        F.round(F.col("h_lcm").cast("double") / F.lit(float(lcm)), 6).alias(
            "harmonic"
        ),
    )


def sql_harmonic(
    n_landmarks: int = CLOSENESS_LANDMARKS,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    lcm_w = _lcm_weights(max_hops)
    lcm = lcm_w[1]
    case = " ".join(f"WHEN {d} THEN {v}" for d, v in lcm_w.items())
    steps = []
    for k in range(1, max_hops + 1):
        steps.append(
            f"""r{k} AS MATERIALIZED (
  SELECT lm, cui, MIN(dist) AS dist FROM (
    SELECT lm, cui, dist FROM r{k - 1}
    UNION ALL
    SELECT p.lm, e.dst AS cui, p.dist + 1 AS dist
    FROM r{k - 1} p JOIN e ON e.src = p.cui
  ) GROUP BY lm, cui
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
lms AS (SELECT src AS lm FROM (SELECT DISTINCT src FROM e
                               ORDER BY src LIMIT {n_landmarks})),
r0 AS (SELECT lm, lm AS cui, 0 AS dist FROM lms),
{unrolled}
SELECT cui AS CUI,
       CAST(COUNT(*) AS BIGINT) AS n_lm,
       round(CAST(SUM(CAST(CASE dist {case} END AS BIGINT)) AS DOUBLE)
             / {float(lcm)}, 6) AS harmonic
FROM r{max_hops}
WHERE dist > 0
GROUP BY cui
"""


# ---------------------------------------------------------------------------
# Densest subgraph (Charikar peel, Bahmani et al. 2012 parallel variant).
# ---------------------------------------------------------------------------

DSG_ROUNDS = 6
DSG_EPS_NUM, DSG_EPS_DEN = 3, 1  # peel threshold deg <= 3*density (eps=1/2)


def q_densest_subgraph(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = DSG_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, best_round, n_nodes, n_edges): the members of the densest
    peel round — Bahmani/Kumar/Vassilvitskii's MapReduce 2(1+eps)
    approximation of Charikar's densest subgraph.  Each round removes
    EVERY node whose induced degree <= 3 * density (eps = 1/2), instead
    of one minimum-degree node at a time, so the peel finishes in
    O(log n) synchronous rounds; the answer is the round whose surviving
    induced subgraph had maximum density.  The community-core extractor
    for hot spam clusters and topic nuclei.

    Per round: two semi-joins of the edge set against the shrinking
    alive set + one map-side degree count (the k-core shape), plus two
    COUNT aggregates for (v, e) — driver-side scalars, never row data.
    The peel predicate deg * v <= 3 * e is exact BIGINT cross-
    multiplication (no density float enters the filter); the final
    argmax over <= rounds+1 (e, v) pairs divides identically in both
    engines."""
    edges = _edges(spark, sf_dir, min_docs).persist()
    alive = (
        edges.select(F.col("src").alias("cui"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    snaps = []  # (round, v, e, alive_df)
    for r in range(rounds + 1):
        sub = (
            edges.join(alive.select(F.col("cui").alias("src")), "src", "left_semi")
            .join(alive.select(F.col("cui").alias("dst")), "dst", "left_semi")
        )
        deg = sub.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        v = alive.count()
        e = sub.count()
        if v == 0:
            break
        snaps.append((r, v, e, alive))
        if r == rounds:
            break
        alive = (
            deg.where(
                F.col("deg").cast("bigint") * F.lit(v)
                > F.lit(DSG_EPS_NUM) * F.lit(e)
            )
            .select(F.col("src").alias("cui"))
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    best = max(snaps, key=lambda s: (s[2] / s[1], -s[0]))
    r, v, e, alive = best
    return alive.select(
        "CUI",
        F.lit(r).cast("bigint").alias("best_round"),
        F.lit(v).cast("bigint").alias("n_nodes"),
        F.lit(e).cast("bigint").alias("n_edges"),
    )


def sql_densest_subgraph(
    rounds: int = DSG_ROUNDS, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""a{r} AS MATERIALIZED (
  SELECT e.src AS cui
  FROM edges e
  JOIN a{r - 1} s ON s.cui = e.src
  JOIN a{r - 1} t ON t.cui = e.dst
  GROUP BY e.src
  HAVING COUNT(*) * (SELECT COUNT(*) FROM a{r - 1})
         > {DSG_EPS_NUM} * (SELECT COUNT(*) FROM edges e2
                            JOIN a{r - 1} x ON x.cui = e2.src
                            JOIN a{r - 1} y ON y.cui = e2.dst)
)"""
        )
    unrolled = ",\n".join(steps)
    stats = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, (SELECT COUNT(*) FROM a{r}) AS v, "
        f"(SELECT COUNT(*) FROM edges e JOIN a{r} s ON s.cui = e.src "
        f"JOIN a{r} t ON t.cui = e.dst) AS e"
        for r in range(rounds + 1)
    )
    members = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, cui FROM a{r}" for r in range(rounds + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
a0 AS MATERIALIZED (SELECT DISTINCT src AS cui FROM edges),
{unrolled},
stats AS ({stats}),
best AS (
  SELECT r, v, e FROM stats WHERE v > 0
  ORDER BY CAST(e AS DOUBLE) / v DESC, r ASC LIMIT 1
),
members AS ({members})
SELECT m.cui AS CUI, CAST(b.r AS BIGINT) AS best_round,
       CAST(b.v AS BIGINT) AS n_nodes, CAST(b.e AS BIGINT) AS n_edges
FROM members m JOIN best b ON m.r = b.r
"""


# ---------------------------------------------------------------------------
# Greedy maximal matching (synchronous handshake rounds).
# ---------------------------------------------------------------------------

MATCH_ROUNDS = 3


def q_maximal_matching(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = MATCH_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(a, b, round): a maximal-matching prefix of the co-occurrence
    graph by synchronous handshake rounds — every live node points at
    its minimum-id live neighbor, mutually-pointing pairs marry, married
    nodes leave.  The deterministic distributed primitive under
    coarsening (pair-and-collapse multilevel partitioners) and
    conflict-free task assignment; ``rounds`` synchronous passes match a
    constant fraction of remaining degree-bounded structure per pass.

    Per round: one min() groupBy over the live edge set + one self-join
    of the (node-sized) proposal table + two semi-join shrinks of the
    edge set.  No randomness: min-id proposals make every round a pure
    function of the edge set, so the unrolled SQL twin is exact."""
    edges = _edges(spark, sf_dir, min_docs)
    live = edges.localCheckpoint(eager=True)
    out = None
    for r in range(1, rounds + 1):
        prop = live.groupBy("src").agg(F.min("dst").alias("pick"))
        p2 = prop.select(
            F.col("src").alias("o_src"), F.col("pick").alias("o_pick")
        )
        matched = (
            prop.join(
                p2,
                (F.col("pick") == F.col("o_src"))
                & (F.col("o_pick") == F.col("src"))
                & (F.col("src") < F.col("o_src")),
            )
            .select(
                F.col("src").alias("a"),
                F.col("o_src").alias("b"),
                F.lit(r).cast("bigint").alias("round"),
            )
            .localCheckpoint(eager=True)
        )
        out = matched if out is None else out.unionByName(matched)
        gone = matched.select(F.col("a").alias("n")).union(
            matched.select("b")
        )
        live = (
            live.join(gone.select(F.col("n").alias("src")), "src", "left_anti")
            .join(gone.select(F.col("n").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        if live.isEmpty():
            break
    return out


def sql_maximal_matching(
    rounds: int = MATCH_ROUNDS, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""p{r} AS MATERIALIZED (
  SELECT src, MIN(dst) AS pick FROM e{r - 1} GROUP BY src
),
m{r} AS MATERIALIZED (
  SELECT x.src AS a, y.src AS b, CAST({r} AS BIGINT) AS round
  FROM p{r} x JOIN p{r} y
    ON x.pick = y.src AND y.pick = x.src AND x.src < y.src
),
g{r} AS (SELECT a AS n FROM m{r} UNION SELECT b FROM m{r}),
e{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r - 1} e
  WHERE e.src NOT IN (SELECT n FROM g{r})
    AND e.dst NOT IN (SELECT n FROM g{r})
)"""
        )
    unrolled = ",\n".join(steps)
    union = "\nUNION ALL\n".join(
        f"SELECT a, b, round FROM m{r}" for r in range(1, rounds + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e0 AS MATERIALIZED (SELECT src, dst FROM edges),
{unrolled}
SELECT a, b, round FROM ({union})
"""


# ---------------------------------------------------------------------------
# Eccentricity lower bounds (landmark BFS maxima) + radius/diameter estimate.
# ---------------------------------------------------------------------------

def q_eccentricity(
    spark: SparkSession,
    sf_dir: str,
    n_landmarks: int = CLOSENESS_LANDMARKS,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, n_lm, ecc_lb): per-node eccentricity LOWER BOUND — the max
    over landmark BFS distances (any witnessed distance bounds the true
    eccentricity from below; the standard landmark/pivot scheme, e.g.
    Takes & Kosters' exact-diameter pruning seeds).  max(ecc_lb) bounds
    the diameter from below, min bounds nothing (radius needs upper
    bounds) — the asymmetry every landmark user must know, stated here
    so downstream reads don't misuse the column.

    Identical one-keyed-frontier multi-source BFS as q_closeness
    (per-round cost independent of landmark count); the rollup is a
    MAX — order-independent, no float at all."""
    edges = _edges(spark, sf_dir, min_docs)
    # distributed top-n (sort+limit = TakeOrderedAndProject), no
    # single-task ranking window over the node table
    landmarks = (
        edges.select("src")
        .distinct()
        .orderBy("src")
        .limit(n_landmarks)
        .select(F.col("src").alias("lm"))
    )
    visited = landmarks.select(
        "lm", F.col("lm").alias("CUI"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = visited
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["CUI"] == edges["src"])
            .select("lm", F.col("dst").alias("CUI"))
            .distinct()
            .join(visited.select("lm", "CUI"), ["lm", "CUI"], "left_anti")
            .withColumn("dist", F.lit(k))
        )
        frontier = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    return (
        visited.where(F.col("dist") > 0)
        .groupBy("CUI")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lm"),
            F.max("dist").cast("bigint").alias("ecc_lb"),
        )
    )


def sql_eccentricity(
    n_landmarks: int = CLOSENESS_LANDMARKS,
    max_hops: int = BFS_MAX_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> str:
    steps = []
    for k in range(1, max_hops + 1):
        steps.append(
            f"""r{k} AS MATERIALIZED (
  SELECT lm, cui, MIN(dist) AS dist FROM (
    SELECT lm, cui, dist FROM r{k - 1}
    UNION ALL
    SELECT p.lm, e.dst AS cui, p.dist + 1 AS dist
    FROM r{k - 1} p JOIN e ON e.src = p.cui
  ) GROUP BY lm, cui
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
lms AS (SELECT src AS lm FROM (SELECT DISTINCT src FROM e
                               ORDER BY src LIMIT {n_landmarks})),
r0 AS (SELECT lm, lm AS cui, 0 AS dist FROM lms),
{unrolled}
SELECT cui AS CUI,
       CAST(COUNT(*) AS BIGINT) AS n_lm,
       CAST(MAX(dist) AS BIGINT) AS ecc_lb
FROM r{max_hops}
WHERE dist > 0
GROUP BY cui
"""


LOUVAIN_LPA_ITERS = 1  # move gains are informative on an UNconverged
#                        partition (at LPA_ITERS=2 the sf0.001 graph is one
#                        community and there is nothing to move)


def q_louvain_gain(
    spark: SparkSession,
    sf_dir: str,
    iters: int = LOUVAIN_LPA_ITERS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, comm, k, best_comm, gain_scaled, move): one Louvain
    move-phase scan on top of the label-propagation partition — for
    every node, the best neighboring community to move to and the
    modularity gain of that move.  ``move`` marks nodes whose best move
    strictly improves modularity (what a Louvain pass would actually
    execute); a partition where no node wants to move is move-phase
    stable.  Gain is the standard Louvain delta for moving i from
    community A to B, kept EXACT by scaling with 2m^2 (m = directed
    edge count):  gain_scaled = m*(d_iB - d_iA') - k_i*(tot_B - tot_A
    + k_i), with d_iC the edges from i into C (excluding i), tot_C the
    community degree mass, k_i the node degree.  Ties break to the
    smallest community label.  (Past ~10^9 directed edges the m*d term
    wants DECIMAL(38,0) — the q_modularity note applies.)

    Scale: the community sizes (tot_C) are ONE map-side-combinable
    aggregate; d_iC is one equi-join of the edge list against the
    broadcast label table plus a grouped count; the per-node argmax is
    a window over each node's own neighboring communities (fan-out
    bounded by the node's degree).  Nodes whose neighbors are all in
    their own community emit no candidate and are absent (nothing to
    move to)."""
    edges = _edges(spark, sf_dir, min_docs)
    labels = q_label_propagation(
        spark, sf_dir, iters, min_docs
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    la = labels.select(F.col("CUI").alias("src"), F.col("label").alias("a"))
    lb = labels.select(F.col("CUI").alias("dst"), F.col("label").alias("c"))
    tot = (
        deg.join(F.broadcast(la), "src")
        .groupBy("a")
        .agg(F.sum("k").alias("tot"))
    )
    d_ic = (
        edges.join(F.broadcast(lb), "dst")
        .groupBy("src", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    m_row = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    base = (
        d_ic.join(F.broadcast(la), "src")
        .join(F.broadcast(deg), "src")
    )
    d_own = base.where(F.col("c") == F.col("a")).select(
        "src", F.col("d").alias("d_a")
    )
    cand = (
        base.where(F.col("c") != F.col("a"))
        .join(d_own, "src", "left")
        .na.fill({"d_a": 0})
        .join(
            F.broadcast(tot.select(F.col("a"), F.col("tot").alias("tot_a"))),
            "a",
        )
        .join(
            F.broadcast(
                tot.select(F.col("a").alias("c"), F.col("tot").alias("tot_c"))
            ),
            "c",
        )
        .join(F.broadcast(m_row))
    )
    gain = F.col("m") * (F.col("d") - F.col("d_a")) - F.col("k") * (
        F.col("tot_c") - F.col("tot_a") + F.col("k")
    )
    w = Window.partitionBy("src").orderBy(
        F.desc("gain_scaled"), F.asc("c")
    )
    return (
        cand.select(
            "src", "a", "k", "c", gain.alias("gain_scaled")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("src").alias("CUI"),
            F.col("a").alias("comm"),
            "k",
            F.col("c").alias("best_comm"),
            "gain_scaled",
            (F.col("gain_scaled") > 0).alias("move"),
        )
    )


def sql_louvain_gain(
    iters: int = LOUVAIN_LPA_ITERS, min_docs: int = PR_MIN_DOCS
) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
{_sql_lpa_steps(iters)},
lab AS MATERIALIZED (SELECT cui, label FROM l{iters}),
lg_deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS k FROM edges GROUP BY src),
lg_tot AS (
  SELECT la.label AS a, SUM(d.k) AS tot
  FROM lg_deg d JOIN lab la ON la.cui = d.src GROUP BY la.label
),
lg_dic AS (
  SELECT e.src, lb.label AS c, CAST(COUNT(*) AS BIGINT) AS d
  FROM edges e JOIN lab lb ON lb.cui = e.dst
  GROUP BY e.src, lb.label
),
lg_m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
lg_base AS (
  SELECT d_ic.src, la.label AS a, deg.k, d_ic.c, d_ic.d
  FROM lg_dic d_ic
  JOIN lab la ON la.cui = d_ic.src
  JOIN lg_deg deg ON deg.src = d_ic.src
),
lg_cand AS (
  SELECT b.src, b.a, b.k, b.c, b.d,
         COALESCE(o.d, 0) AS d_a, ta.tot AS tot_a, tc.tot AS tot_c
  FROM lg_base b
  LEFT JOIN (SELECT src, d FROM lg_base WHERE c = a) o ON o.src = b.src
  JOIN lg_tot ta ON ta.a = b.a
  JOIN lg_tot tc ON tc.a = b.c
  WHERE b.c <> b.a
),
lg_scored AS (
  SELECT src, a, k, c,
         CAST(m.m * (d - d_a) - k * (tot_c - tot_a + k) AS BIGINT)
           AS gain_scaled,
         row_number() OVER (
           PARTITION BY src
           ORDER BY m.m * (d - d_a) - k * (tot_c - tot_a + k) DESC, c ASC
         ) AS rn
  FROM lg_cand, lg_m m
)
SELECT src AS CUI, a AS comm, k, c AS best_comm, gain_scaled,
       gain_scaled > 0 AS move
FROM lg_scored WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Weisfeiler-Lehman color refinement (1-WL / canonical node signatures).
# ---------------------------------------------------------------------------

WL_ROUNDS = 2


def q_wl_colors(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = WL_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, wl_color): per-node color after ``rounds`` of 1-WL refinement
    — color_{k+1}(v) = md5(color_k(v) || '|' || sorted multiset of neighbor
    colors).  Initial color is the degree.  Nodes with the same final
    color are 1-WL-indistinguishable: the standard structural-role
    signature (graph-isomorphism screening, GNN expressivity baseline,
    role-based node dedup over a KG).

    Determinism: the neighbor multiset is sorted before hashing, so the
    color is independent of partitioning/arrival order; md5 matches
    bit-for-bit across engines.  Scale: each round is ONE edge join + ONE
    groupBy(src) collect of neighbor colors (fan-in bounded by degree;
    a 10^7-degree hub's collected list is the same hub-cap problem as
    neighbor-Jaccard — cap or hash-chunk hubs past a threshold and log
    what was truncated).  Rounds are few and fixed (1-WL stabilizes in
    <= diameter rounds; 2 suffices for role signatures)."""
    edges = _edges(spark, sf_dir, min_docs)
    colors = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .select("src", F.col("deg").cast("string").alias("color"))
    )
    for _ in range(rounds):
        nbr = (
            edges.join(
                colors.select(
                    F.col("src").alias("dst"), F.col("color").alias("ncolor")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(
                F.array_join(
                    F.array_sort(F.collect_list("ncolor")), ","
                ).alias("nbrs")
            )
        )
        colors = colors.join(nbr, "src").select(
            "src",
            F.md5(F.concat(F.col("color"), F.lit("|"), F.col("nbrs"))).alias(
                "color"
            ),
        )
    return colors.select(F.col("src").alias("CUI"), F.col("color").alias("wl_color"))


def sql_wl_colors(rounds: int = WL_ROUNDS, min_docs: int = PR_MIN_DOCS) -> str:
    steps = []
    for k in range(1, rounds + 1):
        steps.append(
            f"""wl_n{k} AS (
  SELECT e.src, string_agg(c.color, ',' ORDER BY c.color) AS nbrs
  FROM edges e JOIN wl_c{k - 1} c ON c.src = e.dst
  GROUP BY e.src
),
wl_c{k} AS (
  SELECT c.src, md5(c.color || '|' || n.nbrs) AS color
  FROM wl_c{k - 1} c JOIN wl_n{k} n ON n.src = c.src
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
wl_c0 AS (
  SELECT src, CAST(CAST(COUNT(*) AS BIGINT) AS VARCHAR) AS color
  FROM edges GROUP BY src
),
{unrolled}
SELECT src AS CUI, color AS wl_color FROM wl_c{rounds}
"""


# ---------------------------------------------------------------------------
# Two-star connected components (Kiveris et al., "Connected Components in
# MapReduce and Beyond" — alternating large-star / small-star).
# ---------------------------------------------------------------------------

TWOSTAR_MAX_ROUNDS = 12


def q_cc_twostar(
    spark: SparkSession,
    sf_dir: str,
    max_rounds: int = TWOSTAR_MAX_ROUNDS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, component): connected components by alternating large-star /
    small-star rounds (Kiveris et al. 2014) — the O(log^2 n)-round CC
    algorithm whose round count tracks log(component size), NOT graph
    diameter, unlike min-label propagation (kg_canonical_cc_distributed's
    loop): on a 10^9-node path-shaped web graph label propagation needs
    ~diameter rounds while two-star needs ~30.  Component id is the
    component's minimum node id, so the output is bit-identical to the
    min-reach oracle.

    Each round is groupBy(v) -> min + one fan-out join; edges only ever
    SHRINK toward stars (total edge count is non-increasing), so late
    rounds are nearly free.  Convergence is checked with one tiny
    symmetric-difference action per round pair (the paper's termination:
    small-star produces no change); lineage is truncated every round via
    localCheckpoint."""
    edges = _edges(spark, sf_dir, min_docs)
    # canonical unordered pairs (a < b), distinct by construction of `und`.
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        sym = pairs.select(
            F.col("a").alias("v"), F.col("b").alias("u")
        ).unionByName(pairs.select(F.col("b").alias("v"), F.col("a").alias("u")))
        # large-star(v): every neighbor u > v links to m = min(N(v) + {v}).
        mins = sym.groupBy("v").agg(F.min("u").alias("mn"))
        mins = mins.select("v", F.least(F.col("v"), F.col("mn")).alias("m"))
        pairs = (
            sym.join(mins, "v")
            .where(F.col("u") > F.col("v"))
            .select(F.col("m").alias("a"), F.col("u").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star(v): v and its smaller neighbors all link to the min
        # of the smaller neighborhood.
        sym = pairs.select(
            F.col("a").alias("v"), F.col("b").alias("u")
        ).unionByName(pairs.select(F.col("b").alias("v"), F.col("a").alias("u")))
        smaller = sym.where(F.col("u") < F.col("v"))
        mins = smaller.groupBy("v").agg(F.min("u").alias("m"))
        nxt = (
            smaller.join(mins, "v")
            .where(F.col("u") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("u").alias("b"))
            .unionByName(mins.select(F.col("m").alias("a"), F.col("v").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        done = nxt.exceptAll(pairs).isEmpty() and pairs.exceptAll(nxt).isEmpty()
        pairs = nxt
        if done:
            break
    # converged: every pair is (component_min, node).
    return (
        pairs.select(F.col("b").alias("CUI"), F.col("a").alias("component"))
        .unionByName(
            pairs.select(F.col("a").alias("CUI"), F.col("a").alias("component"))
        )
        .distinct()
    )


def sql_cc_twostar(min_docs: int = PR_MIN_DOCS) -> str:
    # The oracle is the exact fixpoint the algorithm converges to:
    # component = min reachable node id (recursive min-reach CTE, the
    # same shape as kgoracle.sql_canonical_cc).
    return f"""
WITH RECURSIVE {sql_cooccur_edges_cte(min_docs)},
verts AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS CUI, MIN(r) AS component FROM reach GROUP BY id
"""


# ---------------------------------------------------------------------------
# Per-node butterfly counts over the bipartite doc-CUI incidence graph.
# ---------------------------------------------------------------------------


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(CUI, bf): butterflies (2x2 bicliques) through each concept in the
    bipartite document-CUI incidence graph — bf(u) = sum over concepts v
    sharing >= 2 documents with u of C(codeg(u, v), 2).  The bipartite
    analogue of the triangle count: the butterfly density drives bipartite
    clustering coefficients and detects template/boilerplate concept
    blocks (many docs x many concepts all pairwise co-incident).

    Plan: co-degree pairs ride the SAME doc-keyed self-join as the
    co-occurrence edge builder (one shuffle on doc id, hot docs are the
    usual skew point — AQE splits them); C(cd, 2) is row-local integer
    math; the per-node rollup is one map-side-combinable SUM.  All-BIGINT,
    hash-stable."""
    dc = relations.doc_cui_cached(spark, sf_dir)
    a = dc.select(F.col("url").alias("u"), F.col("CUI").alias("x"))
    b = dc.select(F.col("url").alias("u"), F.col("CUI").alias("y"))
    codeg = (
        a.join(b, "u")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cd"))
        .where(F.col("cd") >= 2)
    )
    prs = codeg.select(
        "x", "y", F.expr("cd * (cd - 1) div 2").alias("bf")
    )
    return (
        prs.select(F.col("x").alias("CUI"), "bf")
        .unionByName(prs.select(F.col("y").alias("CUI"), "bf"))
        .groupBy("CUI")
        .agg(F.sum("bf").cast("bigint").alias("bf"))
    )


def sql_butterflies() -> str:
    return f"""
WITH {relations.sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{relations._links_cte().lstrip()},
doc_cui AS (
  SELECT DISTINCT m.doc_id, l.cui
  FROM mentions m JOIN links l ON l.mention = m.mention
),
codeg AS (
  SELECT a.cui AS x, b.cui AS y, CAST(COUNT(*) AS BIGINT) AS cd
  FROM doc_cui a JOIN doc_cui b ON a.doc_id = b.doc_id AND a.cui < b.cui
  GROUP BY a.cui, b.cui
  HAVING COUNT(*) >= 2
),
prs AS (SELECT x, y, cd * (cd - 1) // 2 AS bf FROM codeg)
SELECT cui AS CUI, CAST(SUM(bf) AS BIGINT) AS bf
FROM (SELECT x AS cui, bf FROM prs UNION ALL SELECT y, bf FROM prs)
GROUP BY cui
"""


# ---------------------------------------------------------------------------
# Per-edge triangle support + local-bridge flag.
# ---------------------------------------------------------------------------

def q_bridge_edges(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(x, y, support, is_bridge): triangle support of every undirected
    co-occurrence edge (x < y) — the number of common neighbors of its
    endpoints — and the local-bridge flag (support = 0).  Support is the
    quantity k-truss peels on and Granovetter's weak-tie strength proxy;
    a zero-support edge is a local bridge (removing it lengthens every
    x-y path to >= 3 hops), marking inter-community connectors that
    triangle-dense rankings structurally ignore.  The synthetic
    co-occurrence graph is triangle-dense (no bridges at any threshold —
    measured, not assumed), so the support COLUMN is the gated signal and
    the flag is the production seam for sparse real-world graphs.

    Composition: support comes from the SAME degree-oriented triangle
    enumeration that gates kg_triangles (wedge fan-out bounded by
    arboricity — hub-skew-proof); a triangle (u,v,w) supports its three
    normalized edges; edges outside any triangle pick up support 0 via
    the left join.  Everything is edge-keyed equi-joins over sparse sets
    — no all-pairs anywhere."""
    from sparkmedkg import trainprep

    und = (
        _edges(spark, sf_dir, min_docs)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("x"), F.col("dst").alias("y"))
    )
    tris = trainprep.tris_df(spark, sf_dir, min_docs)

    def norm(a, b):
        return [
            F.least(F.col(a), F.col(b)).alias("x"),
            F.greatest(F.col(a), F.col(b)).alias("y"),
        ]

    support = (
        tris.select(*norm("u", "v"))
        .unionByName(tris.select(*norm("u", "w")))
        .unionByName(tris.select(*norm("v", "w")))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return und.join(support, ["x", "y"], "left").select(
        "x",
        "y",
        F.coalesce(F.col("support"), F.lit(0)).cast("bigint").alias("support"),
        (F.coalesce(F.col("support"), F.lit(0)) == 0).alias("is_bridge"),
    )


def sql_bridge_edges(min_docs: int = PR_MIN_DOCS) -> str:
    from sparkmedkg.trainprep import sql_tri_cte

    return f"""
WITH {sql_tri_cte(min_docs)},
supp AS (
  SELECT x, y, COUNT(*) AS support FROM (
    SELECT least(u, v) AS x, greatest(u, v) AS y FROM tris
    UNION ALL SELECT least(u, w), greatest(u, w) FROM tris
    UNION ALL SELECT least(v, w), greatest(v, w) FROM tris
  ) GROUP BY x, y
)
SELECT und.x, und.y,
       CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
       COALESCE(s.support, 0) = 0 AS is_bridge
FROM und LEFT JOIN supp s ON s.x = und.x AND s.y = und.y
"""


# ---------------------------------------------------------------------------
# # Ego-network density (integer-exact ppm).
# ---------------------------------------------------------------------------

def q_ego_density(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(CUI, deg, ego_edges, ego_density_ppm): density of each node's
    1-hop ego network — the (deg+1)-node subgraph of the node plus its
    neighbors.  Its edge count is exactly deg spokes + the node's triangle
    count (each triangle through the node is one neighbor-neighbor edge),
    so the whole statistic composes two already-gated primitives (degree,
    kg_triangles) with a per-node broadcast-scale join.  The standard
    structural-hole / brokerage signal: low ego density = the node brokers
    between otherwise-disconnected neighbors.

    Kept EXACT: density = 2*(deg + tri) / ((deg+1)*deg) is a rational of
    BIGINTs, emitted in ppm by integer division — no float anywhere."""
    from sparkmedkg import trainprep

    deg = (
        _edges(spark, sf_dir, min_docs)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = trainprep.kg_triangles(spark, sf_dir, min_docs)
    ego = (
        F.col("deg") + F.coalesce(F.col("n_triangles"), F.lit(0))
    ).cast("bigint")
    return (
        deg.join(tri.withColumnRenamed("CUI", "src"), "src", "left")
        .select(
            F.col("src").alias("CUI"),
            "deg",
            ego.alias("ego_edges"),
            F.expr(
                "2 * (deg + coalesce(n_triangles, 0)) * 1000000"
                " div ((deg + 1) * deg)"
            )
            .cast("bigint")
            .alias("ego_density_ppm"),
        )
    )


def sql_ego_density(min_docs: int = PR_MIN_DOCS) -> str:
    from sparkmedkg.trainprep import sql_tri_cte

    return f"""
WITH {sql_tri_cte(min_docs)},
tcnt AS (
  SELECT cui, COUNT(*) AS n_triangles
  FROM (SELECT u AS cui FROM tris UNION ALL SELECT v FROM tris
        UNION ALL SELECT w FROM tris)
  GROUP BY cui
)
SELECT d.src AS CUI, d.deg,
       CAST(d.deg + COALESCE(t.n_triangles, 0) AS BIGINT) AS ego_edges,
       CAST(2 * (d.deg + COALESCE(t.n_triangles, 0)) * 1000000
            // ((d.deg + 1) * d.deg) AS BIGINT) AS ego_density_ppm
FROM deg d LEFT JOIN tcnt t ON t.cui = d.src
"""


# ---------------------------------------------------------------------------
# One-row graph summary: transitivity + Freeman degree centralization.
# ---------------------------------------------------------------------------

def q_graph_summary(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(n_nodes, n_edges, max_deg, n_triangles, n_wedges,
    transitivity_ppm, centralization_ppm): the one-row global-structure
    scorecard — global transitivity 3*triangles/wedges (how much of the
    graph's wedge mass closes; the whole-graph complement of the per-node
    clustering coefficient) and Freeman degree centralization
    sum(dmax - deg) / ((n-1)*(n-2)) (star = 1, regular = 0 — is the graph
    hub-dominated?).  The two numbers that decide skew strategy (salting,
    hub caps) BEFORE launching the per-node jobs.

    Everything composes gated primitives: degree (one shuffle), the
    degree-oriented triangle enumeration (arboricity-bounded), and
    wedge mass as the row-local sum deg*(deg-1)/2.  All counts BIGINT;
    both ratios are exact rationals emitted in ppm by integer division."""
    from sparkmedkg import trainprep

    deg = (
        _edges(spark, sf_dir, min_docs)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri_total = trainprep.tris_df(spark, sf_dir, min_docs).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (F.sum("deg") / 2).cast("bigint").alias("n_edges"),
        F.max("deg").cast("bigint").alias("max_deg"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("bigint").alias("n_wedges"),
        F.sum("deg").cast("bigint").alias("deg_sum"),
    )
    return stats.crossJoin(F.broadcast(tri_total)).select(
        "n_nodes",
        "n_edges",
        "max_deg",
        "n_triangles",
        "n_wedges",
        F.expr("3 * n_triangles * 1000000 div n_wedges")
        .cast("bigint")
        .alias("transitivity_ppm"),
        F.expr(
            "(n_nodes * max_deg - deg_sum) * 1000000"
            " div ((n_nodes - 1) * (n_nodes - 2))"
        )
        .cast("bigint")
        .alias("centralization_ppm"),
    )


def sql_graph_summary(min_docs: int = PR_MIN_DOCS) -> str:
    from sparkmedkg.trainprep import sql_tri_cte

    return f"""
WITH {sql_tri_cte(min_docs)},
tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tris),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(deg) / 2 AS BIGINT) AS n_edges,
         CAST(MAX(deg) AS BIGINT) AS max_deg,
         CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
         CAST(SUM(deg) AS BIGINT) AS deg_sum
  FROM deg
)
SELECT n_nodes, n_edges, max_deg, n_triangles, n_wedges,
       CAST(3 * n_triangles * 1000000 // n_wedges AS BIGINT)
         AS transitivity_ppm,
       CAST((n_nodes * max_deg - deg_sum) * 1000000
            // ((n_nodes - 1) * (n_nodes - 2)) AS BIGINT)
         AS centralization_ppm
FROM st CROSS JOIN tt
"""


# ---------------------------------------------------------------------------
# Hub-skew report (salting planner).
# ---------------------------------------------------------------------------

SKEW_TOP = 10


def q_skew_report(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(rank, CUI, deg, pct_ppm, cum_ppm): the top-``SKEW_TOP`` hub
    entities with their share of all edge endpoints and the running
    cumulative share — the skew report that decides WHICH keys get salted
    before the big joins (the north-star 'hot CUIs like common drugs'
    case).  If the top 10 hold >30% of endpoint mass, co-occurrence joins
    need salting; if not, plain hash partitioning holds.

    Exact ppm integers; the ranked window runs over the TakeOrdered
    top-10 only (never the node table), with a total (deg desc, CUI)
    tie-break so rank and cumulative are engine-deterministic."""
    deg = (
        _edges(spark, sf_dir, min_docs)
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    tot = deg.agg(F.sum("deg").cast("bigint").alias("all_deg"))
    top = (
        deg.orderBy(F.desc("deg"), F.asc("src"))
        .limit(SKEW_TOP)
        .crossJoin(F.broadcast(tot))
    )
    # bounded: <= SKEW_TOP rows survive the limit above
    w = exactq.bounded_window("src", F.desc("deg"), F.asc("src"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.col("src").alias("CUI"),
        "deg",
        F.expr("deg * 1000000 div all_deg").cast("bigint").alias("pct_ppm"),
        (
            F.sum(F.expr("deg * 1000000 div all_deg")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
        )
        .cast("bigint")
        .alias("cum_ppm"),
    )


def sql_skew_report(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
tot AS (SELECT CAST(SUM(deg) AS BIGINT) AS all_deg FROM deg),
top AS (
  SELECT src, deg FROM deg ORDER BY deg DESC, src LIMIT {SKEW_TOP}
)
SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
       src AS CUI, deg,
       CAST(deg * 1000000 // all_deg AS BIGINT) AS pct_ppm,
       CAST(SUM(deg * 1000000 // all_deg)
            OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ppm
FROM top CROSS JOIN tot
WINDOW w AS (ORDER BY deg DESC, src)
"""


# ---------------------------------------------------------------------------
# Full coreness decomposition (H-index iteration).
# ---------------------------------------------------------------------------

CORENESS_ITERS = 6


def q_coreness(
    spark: SparkSession,
    sf_dir: str,
    iters: int = CORENESS_ITERS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, coreness): the full k-core decomposition via H-index
    iteration (Lu et al. 2016 / Montresor et al.'s distributed coreness):
    start every node at its degree, then repeatedly replace each node's
    value with the H-INDEX of its neighbors' values (the largest h such
    that >= h neighbors hold >= h).  The sequence is monotone
    non-increasing and converges to coreness exactly — giving EVERY
    node's core number in one job, where the q_kcore peel answers only
    "is the node in the k-core" for one k.

    Each round is one edge join + one per-node window over that node's
    OWN neighbor list (fan-out = degree, partitioned by node — never
    global), with localCheckpoint lineage truncation like the PageRank
    loop.  ``iters`` is fixed for the oracle's unrolled CTEs; convergence
    on the fixture is reached well inside it (monotonicity makes extra
    rounds no-ops, so over-provisioning is safe, not wrong)."""
    edges = _edges(spark, sf_dir, min_docs).persist()
    vals = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("val")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        vals = _coreness_round(edges, vals).localCheckpoint(eager=True)
    edges.unpersist()
    return vals.select(F.col("src").alias("CUI"), F.col("val").alias("coreness"))


def _coreness_round(edges: DataFrame, vals: DataFrame) -> DataFrame:
    """One H-index round (exposed so the plan-check tool can assert the
    per-round physical plan — the public loop localCheckpoints each round,
    which truncates the lineage .explain() would otherwise show)."""
    w = Window.partitionBy("dst").orderBy(F.desc("nval"), F.asc("src"))
    return (
        edges.join(
            vals.select(F.col("src").alias("_n"), F.col("val").alias("nval")),
            edges["src"] == F.col("_n"),
        )
        .select("dst", "src", "nval")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("nval") >= F.col("rk"))
        .groupBy(F.col("dst").alias("src"))
        .agg(F.max("rk").cast("bigint").alias("val"))
    )


def sql_coreness(
    iters: int = CORENESS_ITERS, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for t in range(1, iters + 1):
        steps.append(
            f"""v{t} AS MATERIALIZED (
  SELECT dst AS src, CAST(MAX(rk) AS BIGINT) AS val
  FROM (
    SELECT e.dst, p.val AS nval,
           ROW_NUMBER() OVER (PARTITION BY e.dst
                              ORDER BY p.val DESC, e.src) AS rk
    FROM edges e JOIN v{t - 1} p ON p.src = e.src
  ) WHERE nval >= rk
  GROUP BY dst
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
v0 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS val FROM edges GROUP BY src),
{unrolled}
SELECT src AS CUI, val AS coreness FROM v{iters}
"""


# ---------------------------------------------------------------------------
# Spectral bisection (Fiedler power iteration, integer-exact).
# ---------------------------------------------------------------------------

SPEC_Q = 1 << 20
SPEC_ITERS = 4


def q_spectral_bisection(
    spark: SparkSession,
    sf_dir: str,
    iters: int = SPEC_ITERS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(CUI, v, side): spectral bisection of the co-occurrence graph —
    power iteration toward the Fiedler direction on the shifted Laplacian
    (dmax*I - L), whose dominant eigenvector (after deflating the known
    trivial all-ones eigenvector) is the algebraic-connectivity cut
    every multilevel partitioner (METIS-family) coarsens toward.  The
    sign of v is the 2-way partition; |v| is distance from the cut.

    The pca_power exactness contract, applied to a graph operator: start
    vector is a deterministic md5 +/-1 (guaranteed mass on the Fiedler
    component, unlike all-ones which IS the trivial eigenvector); each
    round is (dmax - deg)*v + sum of neighbor v (one edge join + grouped
    BIGINT sum), ones-deflation by subtracting the sign-split integer
    mean, then max-renormalization to SPEC_Q with sign-split floor
    division.  Every intermediate is BIGINT; the oracle unrolls the same
    rounds.  Fixed ``iters`` is a fidelity knob, not a correctness one —
    the gate checks the arithmetic, and more rounds sharpen the cut."""
    edges = _edges(spark, sf_dir, min_docs).persist()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).persist()
    row = deg.agg(
        F.count(F.lit(1)).alias("n"), F.max("deg").alias("dmax")
    ).first()
    n, dmax = int(row["n"]), int(row["dmax"])
    v = deg.select(
        F.col("src").alias("vi"),
        (
            (
                F.conv(F.substring(F.md5("src"), 1, 15), 16, 10).cast("bigint")
                % 2
            )
            * 2
            - 1
        ).cast("bigint")
        * F.lit(SPEC_Q).cast("bigint"),
    ).toDF("vi", "v").localCheckpoint(eager=True)
    for _ in range(iters):
        nb = (
            edges.join(v, edges["dst"] == v["vi"])
            .groupBy(edges["src"].alias("vi"))
            .agg(F.sum("v").cast("bigint").alias("nb"))
        )
        u = (
            deg.join(v, deg["src"] == v["vi"])
            .join(nb, v["vi"] == nb["vi"], "left")
            .select(
                deg["src"].alias("vi"),
                (
                    (F.lit(dmax).cast("bigint") - F.col("deg")) * F.col("v")
                    + F.coalesce(nb["nb"], F.lit(0))
                ).alias("u"),
            )
        )
        su = u.agg(F.sum("u").cast("bigint").alias("su"))
        uc = u.crossJoin(F.broadcast(su)).select(
            "vi",
            F.expr(
                f"u - (CASE WHEN su < 0 THEN -(abs(su) div {n}) "
                f"ELSE abs(su) div {n} END)"
            ).alias("u"),
        )
        m = uc.agg(
            F.greatest(F.max(F.abs(F.col("u"))), F.lit(1).cast("bigint")).alias("m")
        )
        v = (
            uc.crossJoin(F.broadcast(m))
            .select(
                "vi",
                (
                    F.signum(F.col("u")).cast("bigint")
                    * F.floor(F.abs(F.col("u")) * SPEC_Q / F.col("m")).cast(
                        "bigint"
                    )
                ).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    deg.unpersist()
    return v.select(
        F.col("vi").alias("CUI"), "v", (F.col("v") >= 0).alias("side")
    )


def sql_spectral_bisection(
    iters: int = SPEC_ITERS, min_docs: int = PR_MIN_DOCS
) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""nb{k} AS (
  SELECT e.src AS vi, CAST(SUM(v.v) AS BIGINT) AS nb
  FROM edges e JOIN v{k - 1} v ON v.vi = e.dst
  GROUP BY e.src
),
u{k} AS (
  SELECT d.src AS vi,
         CAST(((SELECT dmax FROM dm) - d.deg) * v.v
              + COALESCE(nb.nb, 0) AS BIGINT) AS u
  FROM deg d JOIN v{k - 1} v ON v.vi = d.src
  LEFT JOIN nb{k} nb ON nb.vi = d.src
),
su{k} AS (SELECT CAST(SUM(u) AS BIGINT) AS su FROM u{k}),
uc{k} AS (
  SELECT vi,
         CAST(u - (CASE WHEN su < 0
                        THEN -(ABS(su) // (SELECT n FROM nn))
                        ELSE ABS(su) // (SELECT n FROM nn) END)
              AS BIGINT) AS u
  FROM u{k}, su{k}
),
m{k} AS (SELECT GREATEST(MAX(ABS(u)), 1) AS m FROM uc{k}),
v{k} AS MATERIALIZED (
  SELECT vi,
         CAST(CASE WHEN u < 0 THEN -1 WHEN u > 0 THEN 1 ELSE 0 END
              * FLOOR(ABS(u) * {SPEC_Q} / m) AS BIGINT) AS v
  FROM uc{k}, m{k}
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM deg),
dm AS (SELECT MAX(deg) AS dmax FROM deg),
v0 AS MATERIALIZED (
  SELECT src AS vi,
         CAST(((CAST('0x' || substring(md5(src), 1, 15) AS BIGINT) % 2)
               * 2 - 1) * {SPEC_Q} AS BIGINT) AS v
  FROM deg
),
{unrolled}
SELECT vi AS CUI, v, v >= 0 AS side FROM v{iters}
"""


# ---------------------------------------------------------------------------
# Local-community sweep cut over PPR (Andersen-Chung-Lang).
# ---------------------------------------------------------------------------

def q_ppr_sweep_cut(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(rank, CUI, vol, cut, conductance_ppm, is_best): the
    Andersen-Chung-Lang sweep over the personalized-PageRank vector —
    nodes sorted by ppr/deg, and for every prefix S_k the cut size,
    volume, and conductance; the minimum-conductance prefix IS the
    seed's local community, with a quality guarantee tied to the PPR
    approximation.  This is how "find the community around THIS drug"
    ships without running global community detection.

    Exactness: ppr is the gated round(6) vector, deg is BIGINT, so the
    sweep order (ppr/deg desc, CUI) is identical in both engines; cut
    sizes come from the +1/-1 interval-delta trick (an edge crosses
    prefix k iff min_rank <= k < max_rank), so cut/vol/conductance are
    all exact integers.  Plan: every window runs over the NODE-sized
    ranked table (the graph's node count, not the corpus); edges join
    the rank map twice then reduce to two delta rows each."""
    from sparkmedkg import relations

    ppr = relations.q_ppr(spark, sf_dir, min_docs=min_docs)
    deg = (
        _edges(spark, sf_dir, min_docs)
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    scored = ppr.join(deg.withColumnRenamed("src", "CUI"), "CUI")
    # bounded: node table (UMLS CUI universe, ~4M ceiling — never scales
    # with the corpus)
    w = exactq.bounded_window(
        "CUI", F.desc(F.col("ppr") / F.col("deg").cast("double")),
        F.asc("CUI")
    )
    ranked = scored.select(
        "CUI", "deg", F.row_number().over(w).cast("bigint").alias("rank")
    ).localCheckpoint(eager=True)
    und = (
        _edges(spark, sf_dir, min_docs)
        .where(F.col("src") < F.col("dst"))
        .join(
            ranked.select(F.col("CUI").alias("src"), F.col("rank").alias("ra")),
            "src",
        )
        .join(
            ranked.select(F.col("CUI").alias("dst"), F.col("rank").alias("rb")),
            "dst",
        )
        .select(
            F.least("ra", "rb").alias("rmin"),
            F.greatest("ra", "rb").alias("rmax"),
        )
    )
    deltas = (
        und.select(F.col("rmin").alias("k"), F.lit(1).alias("d"))
        .unionByName(und.select(F.col("rmax").alias("k"), F.lit(-1).alias("d")))
        .groupBy("k")
        .agg(F.sum("d").cast("bigint").alias("delta"))
    )
    # bounded: node table (see ranked above)
    wk = exactq.bounded_window("rank", "rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total_vol = ranked.agg(F.sum("deg").cast("bigint").alias("tv"))
    pref = (
        ranked.join(deltas, ranked["rank"] == deltas["k"], "left")
        .crossJoin(F.broadcast(total_vol))
        .select(
            "rank",
            "CUI",
            F.sum("deg").over(wk).cast("bigint").alias("vol"),
            F.sum(F.coalesce(F.col("delta"), F.lit(0)))
            .over(wk)
            .cast("bigint")
            .alias("cut"),
            "tv",
        )
        .where(F.col("vol") < F.col("tv"))  # drop the full-set prefix
    )
    cond = F.expr("cut * 1000000 div least(vol, tv - vol)").cast("bigint")
    out = pref.select(
        "rank", "CUI", "vol", "cut", cond.alias("conductance_ppm")
    )
    best = out.agg(F.min("conductance_ppm").alias("best"))
    return out.crossJoin(F.broadcast(best)).select(
        "rank",
        "CUI",
        "vol",
        "cut",
        "conductance_ppm",
        (F.col("conductance_ppm") == F.col("best")).alias("is_best"),
    )


def sql_ppr_sweep_cut(min_docs: int = PR_MIN_DOCS) -> str:
    from sparkmedkg import relations

    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
ppr AS MATERIALIZED ({relations.sql_ppr(min_docs=min_docs)}),
deg2 AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
swranked AS MATERIALIZED (
  SELECT p.CUI, d.deg,
         CAST(ROW_NUMBER() OVER (ORDER BY p.ppr / d.deg::DOUBLE DESC, p.CUI)
              AS BIGINT) AS rank
  FROM ppr p JOIN deg2 d ON d.src = p.CUI
),
swund AS MATERIALIZED (
  SELECT least(ra.rank, rb.rank) AS rmin,
         greatest(ra.rank, rb.rank) AS rmax
  FROM edges e
  JOIN swranked ra ON ra.CUI = e.src
  JOIN swranked rb ON rb.CUI = e.dst
  WHERE e.src < e.dst
),
deltas AS MATERIALIZED (
  SELECT k, CAST(SUM(d) AS BIGINT) AS delta FROM (
    SELECT rmin AS k, 1 AS d FROM swund
    UNION ALL SELECT rmax, -1 FROM swund
  ) GROUP BY k
),
tv AS (SELECT CAST(SUM(deg) AS BIGINT) AS tv FROM swranked),
pref AS (
  SELECT r.rank, r.CUI,
         CAST(SUM(r.deg) OVER wk AS BIGINT) AS vol,
         CAST(SUM(COALESCE(dl.delta, 0)) OVER wk AS BIGINT) AS cut,
         t.tv
  FROM swranked r LEFT JOIN deltas dl ON dl.k = r.rank
  CROSS JOIN tv t
  WINDOW wk AS (ORDER BY r.rank ROWS UNBOUNDED PRECEDING)
),
cond AS (
  SELECT rank, CUI, vol, cut,
         CAST(cut * 1000000 // least(vol, tv - vol) AS BIGINT)
           AS conductance_ppm
  FROM pref WHERE vol < tv
)
SELECT rank, CUI, vol, cut, conductance_ppm,
       conductance_ppm = (SELECT MIN(conductance_ppm) FROM cond) AS is_best
FROM cond
"""


# ---------------------------------------------------------------------------
# Double-sweep diameter bound (pseudo-peripheral BFS pair).
# ---------------------------------------------------------------------------

SWEEP_HOPS = 6  # per-sweep hop cap (>= graph diameter on this edge set)


def _sweep(visited0: DataFrame, edges: DataFrame, max_hops: int) -> DataFrame:
    """Frontier BFS closure from a 1-row (CUI, dist=0) seed — the same
    per-round shape as q_bfs_reach (frontier join + visited anti-join,
    eager localCheckpoint lineage cuts)."""
    visited = visited0.localCheckpoint(eager=True)
    frontier = visited
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["CUI"] == edges["src"])
            .select(F.col("dst").alias("CUI"))
            .distinct()
            .join(visited.select("CUI"), "CUI", "left_anti")
            .withColumn("dist", F.lit(k))
        )
        frontier = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    return visited


def q_double_sweep(
    spark: SparkSession,
    sf_dir: str,
    max_hops: int = SWEEP_HOPS,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(seed, far_node, ecc_seed, diameter_lb, n_reached): the
    double-sweep diameter lower bound — BFS from a deterministic seed
    (min CUI), hop to the farthest node found (ties to min CUI), BFS
    again from there; the second eccentricity is the classic
    near-tight diameter estimate (exact on trees) that sizes iteration
    counts for every fixed-hop graph job here without an all-pairs
    sweep.  Both sweeps are hop-capped at ``max_hops`` (set above this
    edge set's diameter; the cap keeps the oracle unrollable and the
    job bounded on adversarial graphs).

    Plan: two frontier BFS closures (per-round cost tracks the
    frontier), one k-row TakeOrdered between them, and a 1-row final
    aggregate — the driver only ever sees the pivot row."""
    edges = _edges(spark, sf_dir, min_docs)
    seed_id = edges.select(F.min("src").alias("CUI"))
    v1 = _sweep(seed_id.withColumn("dist", F.lit(0)), edges, max_hops)
    far = (
        v1.orderBy(F.desc("dist"), F.asc("CUI")).limit(1).collect()[0]
    )
    v2 = _sweep(
        spark.createDataFrame([(far["CUI"], 0)], "CUI string, dist int"),
        edges,
        max_hops,
    )
    return (
        v2.agg(
            F.max("dist").cast("bigint").alias("diameter_lb"),
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        )
        .crossJoin(F.broadcast(seed_id.select(F.col("CUI").alias("seed"))))
        .select(
            "seed",
            F.lit(far["CUI"]).alias("far_node"),
            F.lit(int(far["dist"])).cast("bigint").alias("ecc_seed"),
            "diameter_lb",
            "n_reached",
        )
    )


def sql_double_sweep(
    max_hops: int = SWEEP_HOPS, min_docs: int = PR_MIN_DOCS
) -> str:
    # MATERIALIZED on every step: each r{k} references r{k-1} twice, so
    # default CTE inlining expands 2^max_hops copies of the whole NER
    # chain (DuckDB runs out of file handles re-opening the parquet).
    def unroll(prefix: str, seed_cte: str) -> str:
        steps = [f"{prefix}0 AS MATERIALIZED ({seed_cte})"]
        for k in range(1, max_hops + 1):
            steps.append(
                f"""{prefix}{k} AS MATERIALIZED (
  SELECT cui, MIN(dist) AS dist FROM (
    SELECT cui, dist FROM {prefix}{k - 1}
    UNION ALL
    SELECT e.dst AS cui, p.dist + 1 AS dist
    FROM {prefix}{k - 1} p JOIN ed e ON e.src = p.cui
  ) GROUP BY cui
)"""
            )
        return ",\n".join(steps)
    r = unroll(
        "r", "SELECT (SELECT MIN(src) FROM ed) AS cui, 0 AS dist"
    )
    far = f"""far AS MATERIALIZED (
  SELECT cui FROM r{max_hops} ORDER BY dist DESC, cui ASC LIMIT 1
)"""
    s = unroll("s", "SELECT cui, 0 AS dist FROM far")
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
ed AS MATERIALIZED (SELECT src, dst FROM edges),
{r},
{far},
{s}
SELECT (SELECT MIN(src) FROM ed) AS seed,
       (SELECT cui FROM far) AS far_node,
       (SELECT CAST(MAX(dist) AS BIGINT) FROM r{max_hops}
        WHERE cui = (SELECT cui FROM far)) AS ecc_seed,
       CAST((SELECT MAX(dist) FROM s{max_hops}) AS BIGINT) AS diameter_lb,
       CAST((SELECT COUNT(*) FROM s{max_hops}) AS BIGINT) AS n_reached
"""


# ---------------------------------------------------------------------------
# GraphSAGE-style one-layer neighbor aggregation.
# ---------------------------------------------------------------------------

def q_sage_agg(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(CUI, deg, nbr_deg_sum, nbr_deg_max, nbr_deg_mean_milli): one
    GraphSAGE aggregation layer over the co-occurrence KG with the node's
    degree as the input feature — h1(v) = concat(own feature, pooled
    neighbor features) with mean AND max pooling, the message-passing
    primitive every GNN stack (SAGE/GCN/GIN) builds on.  The mean rides
    exact integer milli floor-division, so the layer is bit-identical
    cross-engine (a float GNN would train on these exact shapes).

    Scale: degrees are one partial-agg shuffle over edges; the
    neighbor-feature fetch is ONE self-equi-join of edges against the
    |V|-row degree table (broadcast-able for dimension-sized graphs, AQE
    picks otherwise); pooling re-uses the edge shuffle key.  Deeper
    layers iterate the same join — cost O(layers * |E|), the standard
    distributed GNN aggregation schedule, with hub skew handled by the
    same AQE skew-split as the wedge ops."""
    edges = _edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nbr = edges.join(
        deg.select(F.col("src").alias("dst"), F.col("deg").alias("ndeg")),
        "dst",
    )
    agg = nbr.groupBy("src").agg(
        F.sum("ndeg").alias("nbr_deg_sum"),
        F.max("ndeg").alias("nbr_deg_max"),
        F.count(F.lit(1)).alias("n_nbr"),
    )
    return deg.join(agg, "src").select(
        F.col("src").alias("CUI"),
        "deg",
        "nbr_deg_sum",
        "nbr_deg_max",
        F.expr("div(nbr_deg_sum * 1000, n_nbr)")
        .cast("bigint")
        .alias("nbr_deg_mean_milli"),
    )


def sql_sage_agg(min_docs: int = PR_MIN_DOCS) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nbr AS (
  SELECT e.src, d.deg AS ndeg
  FROM edges e JOIN deg d ON d.src = e.dst
),
agg AS (
  SELECT src, SUM(ndeg) AS s, MAX(ndeg) AS m, COUNT(*) AS n
  FROM nbr GROUP BY src
)
SELECT d.src AS CUI, CAST(d.deg AS BIGINT) AS deg,
       CAST(a.s AS BIGINT) AS nbr_deg_sum,
       CAST(a.m AS BIGINT) AS nbr_deg_max,
       CAST(a.s * 1000 // a.n AS BIGINT) AS nbr_deg_mean_milli
FROM deg d JOIN agg a ON a.src = d.src
"""


# ---------------------------------------------------------------------------
# Borda rank fusion: consensus centrality over exact-integer rankings.
# ---------------------------------------------------------------------------

def q_rank_fusion(
    spark: SparkSession, sf_dir: str, min_docs: int = PR_MIN_DOCS
) -> DataFrame:
    """(CUI, r_deg, r_katz, r_tri, borda, consensus_rank): Borda-count
    consensus over three exact-integer centrality rankings of the
    co-occurrence KG — degree, truncated-Katz walk mass (katz_num) and
    triangle participation.  Each ranking awards n - rank points; the
    consensus orders by total points.  Rank aggregation is the standard
    way to stabilize "most important entities" against any single
    centrality's bias (degree loves hubs, Katz loves dense neighborhoods,
    triangles love cliques) — the graph-side sibling of the retrieval
    stack's reciprocal-rank fusion (corpus_hybrid_rrf), and (unlike RRF's
    1/(k+rank) floats) exact BIGINT end to end.

    Determinism: every ranking is a row_number over the total order
    (score desc, CUI) — no ties left to the engine.

    Scale: all three inputs are |V|-row node aggregates off the
    session-cached edge set (Katz's walk counts and the wedge-join
    triangles are each audited in their own queries); the ranking
    windows run on the |V|-row node table — node-sized, the same
    allowance as every other per-node centrality here, with
    repartitionByRange + zone-offset ranking as the 10^9-node variant."""
    from sparkmedkg import trainprep

    edges = _edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("CUI"), "deg"
    )
    kz = q_katz(spark, sf_dir, min_docs=min_docs).select("CUI", "katz_num")
    tri = trainprep.kg_triangles(spark, sf_dir, min_docs).select(
        "CUI", "n_triangles"
    )
    base = (
        deg.join(kz, "CUI", "left")
        .join(tri, "CUI", "left")
        .na.fill({"katz_num": 0, "n_triangles": 0})
    )
    n1 = F.broadcast(base.agg(F.count(F.lit(1)).alias("n")))
    # bounded: node table (UMLS CUI universe — ontology-capped)
    r_deg = F.row_number().over(
        exactq.bounded_window("CUI", F.desc("deg"), F.asc("CUI"))
    )
    r_katz = F.row_number().over(
        exactq.bounded_window("CUI", F.desc("katz_num"), F.asc("CUI"))
    )
    r_tri = F.row_number().over(
        exactq.bounded_window("CUI", F.desc("n_triangles"), F.asc("CUI"))
    )
    ranked = base.crossJoin(n1).select(
        "CUI",
        r_deg.cast("bigint").alias("r_deg"),
        r_katz.cast("bigint").alias("r_katz"),
        r_tri.cast("bigint").alias("r_tri"),
        F.col("n"),
    )
    borda = (3 * F.col("n") - F.col("r_deg") - F.col("r_katz") - F.col("r_tri"))
    return ranked.select(
        "CUI",
        "r_deg",
        "r_katz",
        "r_tri",
        borda.cast("bigint").alias("borda"),
        F.row_number()
        .over(exactq.bounded_window("CUI", F.desc(borda), F.asc("CUI")))
        .cast("bigint")
        .alias("consensus_rank"),
    )


def sql_rank_fusion(min_docs: int = PR_MIN_DOCS) -> str:
    # One NER -> link -> edge chain, MATERIALIZED once, feeds all three
    # rankings (naively nesting the standalone katz/triangle oracles
    # re-derives that chain per ranking — measured 60s vs 4s at sf0.001).
    lvl = ["p1 AS (SELECT dst AS cui, CAST(COUNT(*) AS BIGINT) AS p"
           " FROM e GROUP BY dst)"]
    for k in range(2, KATZ_LEVELS + 1):
        lvl.append(
            f"""p{k} AS (
  SELECT e.dst AS cui, CAST(SUM(p.p) AS BIGINT) AS p
  FROM e JOIN p{k - 1} p ON p.cui = e.src GROUP BY e.dst
)"""
        )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT cui, p * {KATZ_INV_ALPHA ** (KATZ_LEVELS - k)} AS w FROM p{k}"
        for k in range(1, KATZ_LEVELS + 1)
    )
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
dg AS MATERIALIZED (
  SELECT src AS CUI, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
),
{",".join(lvl)},
u AS (
  {unions}
),
kz AS (SELECT cui AS CUI, CAST(SUM(w) AS BIGINT) AS katz_num
       FROM u GROUP BY cui),
oriented AS MATERIALIZED (
  SELECT s.src, s.dst
  FROM e s JOIN dg d1 ON s.src = d1.CUI JOIN dg d2 ON s.dst = d2.CUI
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
),
tri AS (
  SELECT cui AS CUI, COUNT(*) AS n_triangles
  FROM (SELECT u AS cui FROM tris UNION ALL SELECT v FROM tris
        UNION ALL SELECT w FROM tris)
  GROUP BY cui
),
base AS (
  SELECT d.CUI, d.deg,
         COALESCE(k.katz_num, 0) AS katz_num,
         COALESCE(t.n_triangles, 0) AS n_triangles
  FROM dg d
  LEFT JOIN kz k ON k.CUI = d.CUI
  LEFT JOIN tri t ON t.CUI = d.CUI
),
r AS (
  SELECT CUI,
         CAST(ROW_NUMBER() OVER (ORDER BY deg DESC, CUI) AS BIGINT) AS r_deg,
         CAST(ROW_NUMBER() OVER (ORDER BY katz_num DESC, CUI) AS BIGINT)
           AS r_katz,
         CAST(ROW_NUMBER() OVER (ORDER BY n_triangles DESC, CUI) AS BIGINT)
           AS r_tri,
         COUNT(*) OVER () AS n
  FROM base
)
SELECT CUI, r_deg, r_katz, r_tri,
       CAST(3 * n - r_deg - r_katz - r_tri AS BIGINT) AS borda,
       CAST(ROW_NUMBER() OVER (ORDER BY 3 * n - r_deg - r_katz - r_tri DESC,
                               CUI) AS BIGINT) AS consensus_rank
FROM r
"""
