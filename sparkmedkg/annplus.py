"""Composed / graph-based ANN operators over ``embeddings``.

Three index shapes a 10^12-vector similarity service layers on top of the
simsearch primitives:

- ``ivfpq_topk``: the faiss-style scale path — an IVF coarse quantizer
  prunes the corpus to a few probed cells, PQ asymmetric distance ranks
  the survivors from 4 codes/vector, and only a small shortlist is
  reranked exactly.  Composes simsearch's sample-trained PQ codebooks
  with a literal-folded coarse argmin; the two stages share one scan.
- ``graph_topk``: greedy beam search over the mutual-kNN graph (the
  HNSW/NSG ground-layer navigation step) — a fixed number of hops from a
  fixed entry point, each hop expanding the beam's out-neighbors and
  keeping the best ``GANN_BEAM`` by exact integer inner product.
- ``knn_outliers``: the kNN-distance outlier audit (the standard
  distance-based OOD screen a curation pipeline runs before training) —
  vectors whose neighborhoods are least similar to them, i.e. lowest
  mean kNN inner product.

Reference parity note: the reference app (pymedgraph) has no vector
layer; these extend the engine's ANN family (SURVEY §2 similarity-search
lane) re-using simsearch's exact-integer determinism contract: every
ranking key is a BIGINT (quantized-vector dots / squared distances), so
the DuckDB oracles match bit-for-bit and partial-aggregation order can
never perturb a decision boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .simsearch import (
    DIM,
    KNN_QK,
    PQ_M,
    _cells,
    _dist2,
    _pq_adc_cols,
    _pq_train,
    _qvec,
    _sql_knn_cte,
    _sql_pq_codebook_ctes,
    knn_graph,
)

IVFPQ_CELLS = 8     # coarse cells (centroids = the first 8 vectors'
                    # quantized forms, the _cells/ivf convention)
IVFPQ_PROBE = 3     # cells probed per query
IVFPQ_SHORT = 80    # ADC shortlist before exact rerank
IVFPQ_TOPK = 10

GANN_ENTRY = 1      # fixed entry vertex (a cell centroid, always present)
GANN_BEAM = 8       # beam width
GANN_STEPS = 3      # expansion hops
GANN_K = 5          # results returned from the final beam

OUT_N = 20          # outliers reported


def _emb_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _qvec().alias("q")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse-cell probe + ADC shortlist + exact rerank.
# ---------------------------------------------------------------------------

def ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = IVFPQ_TOPK,
) -> DataFrame:
    """(vec_id, cell, adc_dist2, dist2): top-k nearest neighbours
    (squared L2 over integer-quantized vectors) found IVF-PQ style: every
    vector is assigned to its nearest of {IVFPQ_CELLS} coarse centroids,
    the query probes its {IVFPQ_PROBE} closest cells, candidates inside
    the probed cells are ranked by PQ asymmetric distance (simsearch's
    sample-trained per-subspace codebooks), and the {IVFPQ_SHORT}-row
    shortlist is reranked exactly.

    This is the faiss IVFADC composition: at 10^12 vectors the inverted
    lists turn the scan into |probed cells| / |cells| of the corpus, the
    PQ codes shrink the per-row work to {PQ_M} table lookups, and the
    exact vectors are touched for the shortlist only.  Approximation
    contract (same as ivf_topk/knn_graph): neighbours outside the probed
    cells are not candidates; the oracle replicates the identical cell
    assignment + probe choice, so the gate checks the algorithm and the
    metric_* scorecards quantify recall.

    Determinism: coarse assignment is an expression-level integer-L2
    argmin over centroid literals (ties to the lowest cell id — the
    kmeans convention); the probe choice compares exact driver-side
    integers; ADC and rerank are the shared exact-integer PQ columns.

    Plan: cell assignment folds into the scan projection (zero shuffle);
    the probed-cell filter is a literal IN over that projection, so at
    scale it prunes partitions when the table is laid out by cell;
    codebook training touches only the md5-bucket sample; shortlist is
    one TakeOrdered over the probed rows."""
    emb = _emb_q(spark, sf_dir).persist()
    coarse = [
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in emb.where(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= IVFPQ_CELLS)
        )
        .orderBy("vec_id")
        .collect()
    ]
    qq = [
        int(v)
        for v in emb.where(F.col("vec_id") == query_id).collect()[0]["q"]
    ]

    def d2py(a: list[int], b: list[int]) -> int:
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probed = [
        cid
        for cid, _ in sorted(coarse, key=lambda t: (d2py(qq, t[1]), t[0]))[
            :IVFPQ_PROBE
        ]
    ]
    dists = F.array(*[_dist2(F.col("q"), c) for _, c in coarse])
    labels = F.array(*[F.lit(int(cid)) for cid, _ in coarse])
    cell = F.element_at(
        labels, F.array_position(dists, F.array_min(dists)).cast("int")
    ).cast("bigint")
    cand = emb.withColumn("cell", cell).where(
        F.col("cell").isin([int(c) for c in probed])
        & (F.col("vec_id") != query_id)
    )
    books = [_pq_train(emb, b) for b in range(PQ_M)]
    adc_cols = _pq_adc_cols(books, qq)
    scored = cand.select(
        "vec_id", "q", "cell", sum(adc_cols).alias("adc_dist2")
    )
    short = scored.orderBy(F.asc("adc_dist2"), F.asc("vec_id")).limit(
        IVFPQ_SHORT
    )
    exact = sum(
        (F.element_at("q", i + 1) - F.lit(qq[i])) ** 2 for i in range(DIM)
    ).cast("bigint")
    out = (
        short.withColumn("dist2", exact)
        .orderBy(F.asc("dist2"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cell", "adc_dist2", "dist2")
        .localCheckpoint(eager=True)
    )
    emb.unpersist()
    return out


def sql_ivfpq_topk(
    query_id: int = 0,
    k: int = IVFPQ_TOPK,
) -> str:
    q = (
        "[CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "for e in embedding]"
    )
    cdist = (
        "list_aggregate([(v.q[i] - c.cq[i]) * (v.q[i] - c.cq[i]) "
        f"for i in generate_series(1, {DIM})], 'sum')"
    )
    qdist = (
        "list_aggregate([(qv.q[i] - c.cq[i]) * (qv.q[i] - c.cq[i]) "
        f"for i in generate_series(1, {DIM})], 'sum')"
    )
    all_blocks, adc_sum = _sql_pq_codebook_ctes(query_id, cand_alias="s")
    return f"""
WITH vq AS (SELECT vec_id, {q} AS q FROM embeddings),
coarse AS (
  SELECT vec_id AS cid, q AS cq FROM vq
  WHERE vec_id BETWEEN 1 AND {IVFPQ_CELLS}
),
acell AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid, {cdist} AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {cdist}, c.cid) AS rn
    FROM vq v CROSS JOIN coarse c)
  WHERE rn = 1
),
probed AS (
  SELECT cid FROM (
    SELECT c.cid, {qdist} AS d
    FROM coarse c
    CROSS JOIN (SELECT q FROM vq WHERE vec_id = {query_id}) qv
    ORDER BY d, c.cid LIMIT {IVFPQ_PROBE})
),
{all_blocks},
cand AS (
  SELECT v.vec_id, v.q, a.cid AS cell
  FROM vq v JOIN acell a USING (vec_id) JOIN probed p ON p.cid = a.cid
  WHERE v.vec_id <> {query_id}
),
scored AS (
  -- CAST: DuckDB sums of integers widen to HUGEINT; Spark emits BIGINT.
  SELECT s.vec_id, s.q, s.cell, CAST({adc_sum} AS BIGINT) AS adc_dist2
  FROM cand s
),
short AS (
  SELECT * FROM scored ORDER BY adc_dist2, vec_id LIMIT {IVFPQ_SHORT}
),
qfull AS (SELECT q FROM vq WHERE vec_id = {query_id})
SELECT s.vec_id, s.cell, s.adc_dist2,
       CAST(list_aggregate([(s.q[i] - qf.q[i]) * (s.q[i] - qf.q[i])
                            for i in generate_series(1, {DIM})], 'sum')
            AS BIGINT) AS dist2
FROM short s CROSS JOIN qfull qf
ORDER BY dist2, s.vec_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Graph-ANN: greedy beam search over the mutual-kNN graph.
# ---------------------------------------------------------------------------

def graph_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
) -> DataFrame:
    """(rnk, vec_id, dot_q, cos): the top-{GANN_K} of a {GANN_STEPS}-hop
    greedy beam search for query ``query_id`` over the kNN graph — start
    at entry vertex {GANN_ENTRY}, at each hop add the beam's kNN
    out-neighbours to the candidate pool and keep the best {GANN_BEAM}
    by inner product with the query.  This is the navigation step of
    every graph-based ANN index (HNSW / NSG ground layer): the index IS
    the kNN edge set (already oracle-gated as emb_knn_graph) and a query
    touches O(beam * k * hops) vertices instead of the corpus.

    Determinism: similarities are integer dots of the unit-quantized
    vectors (KNN_QK scale, exact BIGINT), every beam cut breaks ties on
    vec_id, and the DuckDB oracle unrolls the identical hops.

    Plan: the per-hop candidate pull is a pushed-down point filter on the
    edge table's src column (at scale: one partition-pruned index probe
    per beam vertex — the random-access pattern a graph index is FOR,
    never a corpus scan); each hop moves <= beam*(k+1) rows through a
    TakeOrdered; the returned plan re-derives scores from the base scan
    via a {GANN_K}-id pushed-down lookup, self-contained (the mmr_topk
    convention)."""
    cells = _cells(spark, sf_dir).select("vec_id", "q").persist()
    edges = (
        knn_graph(spark, sf_dir).select("src", "dst").persist()
    )
    q0 = [
        int(v)
        for v in cells.where(F.col("vec_id") == query_id).collect()[0]["q"]
    ]
    q0_lit = F.array(*[F.lit(int(v)) for v in q0])

    def dot(col) -> F.Column:
        return F.aggregate(
            F.zip_with(col, q0_lit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    beam = [int(GANN_ENTRY)]
    scores: dict[int, int] = {}
    for _ in range(GANN_STEPS):
        nbrs = edges.where(F.col("src").isin(beam)).select(
            F.col("dst").alias("vec_id")
        )
        pool = (
            cells.where(F.col("vec_id").isin(beam))
            .select("vec_id")
            .union(nbrs)
            .distinct()
            .where(F.col("vec_id") != query_id)
        )
        rows = (
            cells.join(pool, "vec_id")
            .select("vec_id", dot(F.col("q")).alias("dq"))
            .orderBy(F.desc("dq"), F.asc("vec_id"))
            .limit(GANN_BEAM)
            .collect()
        )
        beam = [int(r["vec_id"]) for r in rows]
        scores = {int(r["vec_id"]): int(r["dq"]) for r in rows}
    final = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:GANN_K]
    rnk = F.lit(None).cast("int")
    for i, (vid, _) in enumerate(final):
        rnk = F.when(F.col("vec_id") == vid, F.lit(i + 1)).otherwise(rnk)
    out = cells.where(
        F.col("vec_id").isin([vid for vid, _ in final])
    ).select(
        rnk.alias("rnk"),
        "vec_id",
        dot(F.col("q")).alias("dot_q"),
        F.round(
            dot(F.col("q")).cast("double") / F.lit(float(KNN_QK * KNN_QK)), 6
        ).alias("cos"),
    ).localCheckpoint(eager=True)
    cells.unpersist()
    edges.unpersist()
    return out


def sql_graph_topk(query_id: int = 0) -> str:
    dot = (
        "list_aggregate([a.q[i] * q0.q[i] "
        f"for i in generate_series(1, {DIM})], 'sum')"
    )
    steps = []
    prev = "b0"
    for s in range(1, GANN_STEPS + 1):
        steps.append(
            f"""c{s} AS (
  SELECT DISTINCT vec_id FROM (
    SELECT vec_id FROM {prev}
    UNION ALL
    SELECT k.dst AS vec_id FROM knn k JOIN {prev} b ON k.src = b.vec_id)
  WHERE vec_id <> {query_id}
),
s{s} AS (
  SELECT a.vec_id, CAST({dot} AS BIGINT) AS dq
  FROM assigned a JOIN c{s} USING (vec_id) CROSS JOIN q0
),
b{s} AS (SELECT vec_id, dq FROM s{s} ORDER BY dq DESC, vec_id
         LIMIT {GANN_BEAM})"""
        )
        prev = f"b{s}"
    unrolled = ",\n".join(steps)
    return f"""
WITH {_sql_knn_cte()},
q0 AS (SELECT q FROM assigned WHERE vec_id = {query_id}),
b0 AS (SELECT CAST({GANN_ENTRY} AS BIGINT) AS vec_id),
{unrolled}
SELECT CAST(row_number() OVER (ORDER BY dq DESC, vec_id) AS INT) AS rnk,
       vec_id, dq AS dot_q,
       round(CAST(dq AS DOUBLE) / {KNN_QK * KNN_QK}, 6) AS cos
FROM (SELECT * FROM b{GANN_STEPS} ORDER BY dq DESC, vec_id LIMIT {GANN_K})
"""


# ---------------------------------------------------------------------------
# kNN-distance outlier audit.
# ---------------------------------------------------------------------------

def knn_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, n_nbrs, sum_dot, mean_dot_micro): the {OUT_N} vectors
    whose kNN neighbourhoods are LEAST similar to them — lowest mean
    inner product over their kNN edges — the distance-based
    out-of-distribution screen (Ramaswamy et al.'s kNN outlier rule on
    cosine space) a curation pipeline runs to surface mislabeled or
    garbage embeddings before training.

    Determinism: sum_dot is an exact BIGINT sum of quantized dots;
    mean_dot_micro is truncate-toward-zero integer division (sign-split
    in the oracle to match Spark's ``div``); final order is
    (mean_dot_micro, vec_id).

    Plan: one partial-aggregated groupBy over the kNN edge set (k rows
    per vector, never the corpus pairs) + a TakeOrdered of {OUT_N}."""
    knn = knn_graph(spark, sf_dir)
    return (
        knn.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("dot_q").alias("sum_dot"),
        )
        .select(
            F.col("src").alias("vec_id"),
            "n_nbrs",
            "sum_dot",
            F.expr("(1000000 * sum_dot) div n_nbrs").alias(
                "mean_dot_micro"
            ),
        )
        .orderBy(F.asc("mean_dot_micro"), F.asc("vec_id"))
        .limit(OUT_N)
    )


def sql_knn_outliers() -> str:
    return f"""
WITH {_sql_knn_cte()},
agg AS (
  SELECT src AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
         CAST(SUM(dot_q) AS BIGINT) AS sum_dot
  FROM knn GROUP BY src
)
SELECT vec_id, n_nbrs, sum_dot,
       -- sign-split floor division == Spark's truncate-toward-zero div
       CAST(CASE WHEN sum_dot >= 0
                 THEN (1000000 * sum_dot) // n_nbrs
                 ELSE -((-1000000 * sum_dot) // n_nbrs) END
            AS BIGINT) AS mean_dot_micro
FROM agg
ORDER BY mean_dot_micro, vec_id LIMIT {OUT_N}
"""
