"""Similarity search over an embedding column (array<float>).

Two paths over ``embeddings(vec_id, embedding, label)``:

- ``cosine_topk``: brute-force cosine top-k against a query vector — the
  exactness baseline. One scan, one TakeOrderedAndProject; no shuffle of the
  vectors themselves.
- ``lsh_topk``: random-hyperplane LSH — sign-bit bucket per vector against a
  fixed, seeded hyperplane set; candidates = the query's bucket only, then
  exact rerank. At 10^12 rows the bucket column is a partition key: the
  probe touches one partition instead of the full corpus.

All arithmetic folds vectors left-to-right in index order so the DuckDB
oracle reproduces results bit-for-bit (double-precision determinism).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window

from sparkmedkg import exactq
from pyspark.sql import functions as F

N_PLANES = 4
DIM = 64
_SEED = 7


def hyperplanes(n: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, shared with the oracle."""
    rng = random.Random(_SEED)
    return [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n)]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(c) -> Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def _plane_lit(plane: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in plane])


def bucket_col(v, planes: list[list[float]]) -> Column:
    """Sign-bit string, one char per hyperplane."""
    bits = [
        F.when(_dot(v, _plane_lit(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def cosine_topk(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force top-k neighbors of ``query_id`` by cosine."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    return (
        emb.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", _dot("v", "qv") / (_norm("v") * _norm("qv")))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )


def lsh_topk(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Bucketed ANN: rerank only vectors in the query's hyperplane bucket."""
    planes = hyperplanes()
    emb = _emb(spark, sf_dir).withColumn("bucket", bucket_col(F.col("v"), planes))
    q = emb.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        emb.where(F.col("vec_id") != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .withColumn("cos", _dot("v", "qv") / (_norm("v") * _norm("qv")))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )


N_CELLS = 8
N_PROBE = 2


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF-style ANN: coarse quantizer + probe-limited exact rerank.

    Centroids are the embeddings of vec_ids 1..n_cells — a deterministic
    data sample standing in for k-means centroids (the assignment/probe plan
    is identical; training the quantizer is offline either way). Every
    vector is assigned to its max-cosine centroid via an EXPRESSION-LEVEL
    argmax over the K centroid literals (array_max of (sim, -cid) structs) —
    a pure projection inside whole-stage codegen, zero shuffle; the query
    probes its n_probe nearest cells and reranks exactly inside them only.
    At 10^12 rows ``cid`` is the partition key, so a probe touches
    n_probe/n_cells of the corpus instead of all of it — the IVF counterpart
    of lsh_topk's sign-bit buckets.
    """
    emb = _emb(spark, sf_dir)
    # K quantizer rows to the driver (K is tiny and fixed; a trained
    # quantizer would arrive as literals the same way)
    cent_rows = (
        emb.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= n_cells))
        .orderBy("vec_id")
        .collect()
    )
    cents_local = [(r["vec_id"], [float(x) for x in r["v"]]) for r in cent_rows]
    cents = spark.createDataFrame(
        cents_local, "cid bigint, cv array<double>"
    )

    # argmax_k cos(v, c_k), tie-break lowest cid: max of (sim, -cid) structs.
    sim_structs = F.array(
        *[
            F.struct(
                (_dot("v", _plane_lit(cv)) / (_norm("v") * _norm(_plane_lit(cv))))
                .alias("sim"),
                F.lit(-cid).alias("negcid"),
            )
            for cid, cv in cents_local
        ]
    )
    best = F.array_max(sim_structs)
    assigned = emb.select("vec_id", "v", (-best["negcid"]).alias("cid"))

    q = emb.where(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    qsim = _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("qsim", qsim)
        .orderBy(F.desc("qsim"), F.asc("cid"))
        .limit(n_probe)
        .select("cid")
    )

    return (
        assigned.join(F.broadcast(probe), "cid")
        .where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", _dot("v", "qv") / (_norm("v") * _norm("qv")))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )


def ivf_shortlist(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """(vec_id, prank, cos): the probe-RANKED IVF candidate set — every
    vector in the query's ``n_probe`` nearest cells, tagged with its
    cell's probe rank and its exact query cosine.  One corpus assignment
    scan serves EVERY probe level <= n_probe: filtering prank <= p and
    taking top-k by (cos desc, vec_id) reproduces ``ivf_topk(n_probe=p)``
    exactly (same argmax assignment, same probe ordering, same rerank
    tie-breaks) — metrics.ann_ivf_curve uses this to draw the whole
    latency/recall curve from a single pass instead of one scan per
    level.  The probe-rank window runs on the |n_cells|-row quantizer
    table only."""
    emb = _emb(spark, sf_dir)
    cent_rows = (
        emb.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= n_cells))
        .orderBy("vec_id")
        .collect()
    )
    cents_local = [(r["vec_id"], [float(x) for x in r["v"]]) for r in cent_rows]
    cents = spark.createDataFrame(
        cents_local, "cid bigint, cv array<double>"
    )
    sim_structs = F.array(
        *[
            F.struct(
                (_dot("v", _plane_lit(cv)) / (_norm("v") * _norm(_plane_lit(cv))))
                .alias("sim"),
                F.lit(-cid).alias("negcid"),
            )
            for cid, cv in cents_local
        ]
    )
    best = F.array_max(sim_structs)
    assigned = emb.select("vec_id", "v", (-best["negcid"]).alias("cid"))

    q = emb.where(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    qsim = _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    # bounded: quantizer-sized (one row per IVF centroid)
    w = exactq.bounded_window("cid", F.desc("qsim"), F.asc("cid"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("qsim", qsim)
        .withColumn("prank", F.row_number().over(w))
        .where(F.col("prank") <= n_probe)
        .select("cid", "prank")
    )
    return (
        assigned.join(F.broadcast(probe), "cid")
        .where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", _dot("v", "qv") / (_norm("v") * _norm("qv")))
        .select("vec_id", "prank", "cos")
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB).
# ---------------------------------------------------------------------------

_SQL_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, e) -> acc + e)"
)
_SQL_NORM = (
    "sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform({a}, "
    "e -> e::DOUBLE * e::DOUBLE)), (acc, e) -> acc + e))"
)


def sql_cosine_topk(query_id: int = 0, k: int = 10) -> str:
    dot = _SQL_DOT.format(a="e.v", b="q.qv")
    cos = f"({dot}) / ({_SQL_NORM.format(a='e.v')} * {_SQL_NORM.format(a='q.qv')})"
    return f"""
WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id})
SELECT vec_id, round({cos}, 6) AS cos
FROM e, q
WHERE e.vec_id <> {query_id}
ORDER BY {cos} DESC, vec_id ASC
LIMIT {k}
"""


def _sql_plane(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def sql_ivf_topk(
    query_id: int = 0,
    k: int = 10,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> str:
    sim_ec = (
        f"({_SQL_DOT.format(a='e.v', b='c.cv')}) / "
        f"({_SQL_NORM.format(a='e.v')} * {_SQL_NORM.format(a='c.cv')})"
    )
    sim_qc = (
        f"({_SQL_DOT.format(a='q.qv', b='c.cv')}) / "
        f"({_SQL_NORM.format(a='q.qv')} * {_SQL_NORM.format(a='c.cv')})"
    )
    cos = (
        f"({_SQL_DOT.format(a='a.v', b='q.qv')}) / "
        f"({_SQL_NORM.format(a='a.v')} * {_SQL_NORM.format(a='q.qv')})"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {n_cells}),
sims AS (
  SELECT e.vec_id, e.v, c.cid, {sim_ec} AS sim,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {sim_ec} DESC, c.cid ASC) AS rk
  FROM e, c
),
assigned AS (SELECT vec_id, v, cid FROM sims WHERE rk = 1),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id}),
qprobe AS (
  SELECT cid FROM (
    SELECT c.cid, row_number() OVER (ORDER BY {sim_qc} DESC, c.cid ASC) AS rk
    FROM c, q
  ) WHERE rk <= {n_probe}
)
SELECT a.vec_id, round({cos}, 6) AS cos
FROM assigned a JOIN qprobe USING (cid), q
WHERE a.vec_id <> {query_id}
ORDER BY {cos} DESC, a.vec_id ASC
LIMIT {k}
"""


def sql_lsh_topk(query_id: int = 0, k: int = 10) -> str:
    planes = hyperplanes()
    bits = " || ".join(
        "(CASE WHEN "
        + _SQL_DOT.format(a="{v}", b=_sql_plane(p))
        + " >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    dot = _SQL_DOT.format(a="e.v", b="q.qv")
    cos = f"({dot}) / ({_SQL_NORM.format(a='e.v')} * {_SQL_NORM.format(a='q.qv')})"
    return f"""
WITH raw AS (SELECT vec_id, embedding AS v FROM embeddings),
e AS (SELECT vec_id, v, {bits.format(v='v')} AS bucket FROM raw),
q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = {query_id})
SELECT e.vec_id, round({cos}, 6) AS cos
FROM e JOIN q ON e.bucket = q.qbucket
WHERE e.vec_id <> {query_id}
ORDER BY {cos} DESC, e.vec_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Batch ANN: top-k for a SET of query vectors in one plan (two-stage top-k).
# ---------------------------------------------------------------------------

N_BATCH_QUERIES = 4
TOPK_SALT = 8


def batch_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = N_BATCH_QUERIES,
    k: int = 10,
    n_salt: int = TOPK_SALT,
) -> DataFrame:
    """(query_id, rank, vec_id, cos): exact cosine top-k neighbors for each
    of the query vectors (vec_ids 1..n_queries) in ONE plan.

    The single-query formulation (cosine_topk) is a global
    TakeOrderedAndProject; per-query top-k needs a partitioned rank, and a
    plain ``Window.partitionBy(query_id)`` would shuffle the ENTIRE scored
    corpus into n_queries partitions — the classic few-hot-keys skew. This
    runs the TWO-STAGE top-k instead: stage 1 ranks within
    (query_id, salt) — n_queries x n_salt evenly-sized groups — keeping at
    most k rows per group; stage 2 re-ranks the surviving
    n_salt * k candidates per query. The second shuffle moves O(q * salt * k)
    rows regardless of corpus size, so the plan survives 10^12 vectors.
    Queries are a broadcast (q tiny); scoring is a map-side projection.
    """
    emb = _emb(spark, sf_dir)
    q = emb.where(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= n_queries)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _dot("v", "qv") / (_norm("v") * _norm("qv")))
        .select("query_id", "vec_id", "cos")
    )
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.xxhash64("vec_id"), F.lit(TOPK_SALT))
    ).orderBy(F.desc("cos"), F.asc("vec_id"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


def sql_batch_topk(n_queries: int = N_BATCH_QUERIES, k: int = 10) -> str:
    cos = (
        f"({_SQL_DOT.format(a='e.v', b='q.qv')}) / "
        f"({_SQL_NORM.format(a='e.v')} * {_SQL_NORM.format(a='q.qv')})"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e
      WHERE vec_id BETWEEN 1 AND {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id, {cos} AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, round(cos, 6) AS cos
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Int8 scalar quantization: 4x memory compression for the vector index.
# ---------------------------------------------------------------------------

def int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, mn, mx, q_checksum, mse_e9): per-vector min-max scalar
    quantization to 8-bit codes (q_i = floor((x_i - mn)/scale + 0.5),
    scale = (mx - mn)/255) with the reconstruction MSE (nano-units).

    Map-only — quantizing 10^12 vectors is a pure projection with no
    shuffle, and the int8 codes are 4x smaller than float32 (the standard
    first compression step before IVF/PQ indexing). ``q_checksum`` (sum of
    the integer codes) pins the exact code values across engines, not just
    the aggregate error; the explicit floor(x + 0.5) rounding is
    reproduced verbatim in the oracle (engine round() half-away-from-zero
    vs half-even differences can't creep in)."""
    emb = _emb(spark, sf_dir)
    mn, mx = F.array_min("v"), F.array_max("v")
    out = emb.select("vec_id", "v", mn.alias("mn"), mx.alias("mx")).withColumn(
        "scale", (F.col("mx") - F.col("mn")) / F.lit(255.0)
    )
    code = lambda x: F.when(  # noqa: E731
        F.col("scale") == 0.0, F.lit(0.0)
    ).otherwise(F.floor((x - F.col("mn")) / F.col("scale") + F.lit(0.5)))
    dq = lambda x: F.col("mn") + code(x) * F.col("scale")  # noqa: E731
    # NB: rounding happens in a SECOND select — `round(mn).alias("mn")` in
    # the same list would shadow the input column via lateral column alias
    # resolution, silently feeding the ROUNDED mn into code()/dq().
    return out.select(
        "vec_id",
        "mn",
        "mx",
        F.aggregate(
            "v", F.lit(0.0), lambda acc, x: acc + code(x)
        ).cast("long").alias("q_checksum"),
        # mse in nano-units via floor: decimal round() at a half-way
        # boundary differs between engines (HALF_UP on the exact binary
        # expansion vs C rint); floor of the bit-identical double doesn't.
        F.floor(
            F.aggregate(
                "v", F.lit(0.0), lambda acc, x: acc + (x - dq(x)) * (x - dq(x))
            )
            / F.size("v")
            * F.lit(1e9)
        ).cast("long").alias("mse_e9"),
    ).select(
        "vec_id",
        F.round("mn", 6).alias("mn"),
        F.round("mx", 6).alias("mx"),
        "q_checksum",
        "mse_e9",
    )


def sql_int8_quant() -> str:
    code = "floor((x::DOUBLE - mn) / scale + 0.5)"
    dq = f"(mn + {code} * scale)"
    return f"""
WITH e AS (
  SELECT vec_id, embedding AS v,
         list_min(embedding)::DOUBLE AS mn,
         list_max(embedding)::DOUBLE AS mx
  FROM embeddings
),
s AS (SELECT *, (mx - mn) / 255.0 AS scale FROM e)
SELECT vec_id, round(mn, 6) AS mn, round(mx, 6) AS mx,
       CAST(list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
                                          ELSE {code} END)),
            (acc, e) -> acc + e) AS BIGINT) AS q_checksum,
       CAST(floor(list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(v, x -> CASE WHEN scale = 0
                 THEN (x::DOUBLE - mn) * (x::DOUBLE - mn)
                 ELSE (x::DOUBLE - {dq}) * (x::DOUBLE - {dq}) END)),
             (acc, e) -> acc + e) / len(v) * 1e9) AS BIGINT) AS mse_e9
FROM s
"""


# ---------------------------------------------------------------------------
# Quantized ANN: int8 candidate generation + exact rerank.
# ---------------------------------------------------------------------------

SHORTLIST_FACTOR = 4


def quantized_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    shortlist_factor: int = SHORTLIST_FACTOR,
) -> DataFrame:
    """(vec_id, cos, approx_cos): exact top-k by cosine, found by scoring
    the int8-DEQUANTIZED vectors first (the compressed index a 100 TB
    vector store actually scans — 4x less I/O), shortlisting the top
    k * shortlist_factor approximate hits, then reranking only the
    shortlist with full-precision vectors.

    The same (mn, scale, floor(x+0.5)) quantizer as ``int8_quant``; both
    phases are deterministic expression arithmetic, so the DuckDB oracle
    reproduces candidate set AND final ranking bit-for-bit.  Plan shape:
    one corpus scan + TakeOrderedAndProject for the shortlist (no
    shuffle), then the rerank touches shortlist rows only."""
    emb = _emb(spark, sf_dir)
    mn, mx = F.array_min("v"), F.array_max("v")
    w = emb.select(
        "vec_id", "v", mn.alias("mn"), ((mx - mn) / F.lit(255.0)).alias("scale")
    )
    dq = F.transform(
        "v",
        lambda x: F.when(F.col("scale") == 0.0, F.col("mn")).otherwise(
            F.col("mn")
            + F.floor((x - F.col("mn")) / F.col("scale") + F.lit(0.5))
            * F.col("scale")
        ),
    )
    q = emb.where(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    shortlist = (
        w.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("dq", dq)
        .withColumn(
            "approx_cos", _dot("dq", "qv") / (_norm("dq") * _norm("qv"))
        )
        .orderBy(F.desc("approx_cos"), F.asc("vec_id"))
        .limit(k * shortlist_factor)
    )
    return (
        shortlist.withColumn("cos", _dot("v", "qv") / (_norm("v") * _norm("qv")))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select(
            "vec_id",
            F.round("cos", 6).alias("cos"),
            F.round("approx_cos", 6).alias("approx_cos"),
        )
    )


def sql_quantized_topk(
    query_id: int = 0, k: int = 10, shortlist_factor: int = SHORTLIST_FACTOR
) -> str:
    dq_elem = (
        "CASE WHEN scale = 0 THEN mn "
        "ELSE mn + floor((x::DOUBLE - mn) / scale + 0.5) * scale END"
    )
    approx = (
        f"({_SQL_DOT.format(a='w.dq', b='q.qv')}) / "
        f"({_SQL_NORM.format(a='w.dq')} * {_SQL_NORM.format(a='q.qv')})"
    )
    exact = (
        f"({_SQL_DOT.format(a='s.v', b='q.qv')}) / "
        f"({_SQL_NORM.format(a='s.v')} * {_SQL_NORM.format(a='q.qv')})"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding AS v,
                  list_min(embedding)::DOUBLE AS mn,
                  (list_max(embedding)::DOUBLE - list_min(embedding)::DOUBLE)
                    / 255.0 AS scale
           FROM embeddings),
w AS (SELECT vec_id, v,
             list_transform(v, x -> {dq_elem}) AS dq
      FROM e),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id}),
shortlist AS (
  SELECT w.vec_id, w.v, {approx} AS approx_cos
  FROM w, q
  WHERE w.vec_id <> {query_id}
  ORDER BY approx_cos DESC, w.vec_id ASC
  LIMIT {k * shortlist_factor}
)
SELECT s.vec_id, round({exact}, 6) AS cos, round(s.approx_cos, 6) AS approx_cos
FROM shortlist s, q
ORDER BY {exact} DESC, s.vec_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Fixed-iteration distributed k-means (Lloyd's) over the embedding column.
# ---------------------------------------------------------------------------

KM_K = 4
KM_ITERS = 2
KM_SCALE = 1000

# Codebook/centroid TRAINING runs on a deterministic md5-bucket sample
# (the trainprep.stratified_sample idiom): at 10^12 vectors the
# fixed-iteration Lloyd's passes would otherwise each scan the full
# corpus (kmeans: 2 passes, PQ: 4 subspaces x 2 iters = 8 passes).  With
# the sample, training touches TRAIN_BP/TRAIN_MOD of the data and only
# the single final ASSIGNMENT pass reads every row.  20% keeps the
# sf0.001 sample (~100 of 500 vectors) statistically meaningful while
# proving the bound; production would drop this to a few bp.
TRAIN_MOD = 10_000
TRAIN_BP = 2_000


def _train_bucket() -> Column:
    # identical in DuckDB: CAST('0x' || substring(md5(vec_id::VARCHAR),
    # 1, 15) AS BIGINT) % TRAIN_MOD — exact 60-bit integer both sides.
    return (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % TRAIN_MOD
    )


_SQL_TRAIN_PRED = (
    "CAST('0x' || substring(md5(vec_id::VARCHAR), 1, 15) AS BIGINT) "
    f"% {TRAIN_MOD} < {TRAIN_BP}"
)


def _qvec():
    """Quantize the float vector to integers: floor(x*SCALE + 0.5) per dim.
    Every downstream operation (distance sums, centroid means) is then
    EXACT integer arithmetic — associative, so partial aggregation order
    cannot perturb results, and bit-identical across engines."""
    return F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * KM_SCALE + F.lit(0.5)).cast("long"),
    )


def _dist2(qcol, cent: list[int]) -> Column:
    c = F.array(*[F.lit(int(v)) for v in cent])
    return F.aggregate(
        F.zip_with(qcol, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _tdiv(s: int, n: int) -> int:
    # truncate-toward-zero division, matching DuckDB's integer `//`
    return s // n if s >= 0 else -((-s) // n)


def kmeans(
    spark: SparkSession,
    sf_dir: str,
    k: int = KM_K,
    iters: int = KM_ITERS,
    use_cache: bool = True,
) -> DataFrame:
    """(vec_id, cluster, dist2): Lloyd's k-means after ``iters`` synchronous
    iterations over integer-quantized embeddings. Init = the k lowest
    vec_ids of the training sample; ties in assignment break to the lowest
    cluster id; centroid update is per-dim floor(sum/count) — all exact
    integer arithmetic, so the unrolled DuckDB oracle matches bit-for-bit.

    Training runs on the deterministic md5-bucket sample (``_train_bucket``
    < TRAIN_BP), so the ``iters`` update passes scan only the sample; the
    FULL corpus is read exactly once, by the final assignment pass.  Plan
    per iteration: assignment is a map-only pass (k centroid literal
    arrays folded into the projection — the same shuffle-free argmin that
    fixed ann_ivf_topk); the update is ONE partial-aggregated shuffle of
    64 per-dim integer sums + a k-row driver collect to rebuild the
    literals. Nothing else moves: at 10^12 vectors training cost is
    sample-bounded and the corpus pays one scan.

    The n-row assignment is session-memoized (``_SS_CACHE``) — the ARI
    scorecard and the cluster queries share it; ``use_cache=False``
    builds the full declarative plan."""
    if use_cache:
        return _ss_cached(
            spark, "km", (sf_dir, k, iters),
            lambda: kmeans(spark, sf_dir, k, iters, use_cache=False),
        )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _qvec().alias("q")
    )
    train = emb.where(_train_bucket() < TRAIN_BP).persist()
    # (label, centroid) pairs: labels survive even if a cluster empties
    # mid-iteration (matching the oracle, which keeps original cl labels).
    cents = [
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in train.orderBy("vec_id").limit(k).collect()
    ]

    def assign(df, cents):
        dists = F.array(*[_dist2(F.col("q"), c) for _, c in cents])
        labels = F.array(*[F.lit(lbl) for lbl, _ in cents])
        pos = F.array_position(dists, F.array_min(dists)).cast("int")
        return df.select(
            "vec_id",
            "q",
            F.element_at(labels, pos).cast("int").alias("cluster"),
            F.array_min(dists).alias("dist2"),
        )

    for _ in range(iters):
        a = assign(train, cents)
        rows = (
            a.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("q")[d]).alias(f"s{d}") for d in range(DIM)],
            )
            .orderBy("cluster")
            .collect()
        )
        cents = [
            (
                int(r["cluster"]),
                [_tdiv(int(r[f"s{d}"]), int(r["n"])) for d in range(DIM)],
            )
            for r in rows
        ]
    train.unpersist()
    return assign(emb, cents).select("vec_id", "cluster", "dist2")


def sql_kmeans(k: int = KM_K, iters: int = KM_ITERS) -> str:
    q = (
        "[CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "for e in embedding]"
    )
    dist = (
        "list_aggregate([(v.q[i] - c.q[i]) * (v.q[i] - c.q[i]) "
        "for i in generate_series(1, 64)], 'sum')"
    )
    steps = []
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        steps.append(
            f"""a{it} AS (
  SELECT vec_id, q, cl AS cluster, d AS dist2 FROM (
    SELECT v.vec_id, v.q, c.cl, {dist} AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cl) AS rn
    FROM vs v CROSS JOIN {prev} c)
  WHERE rn = 1
),
cs{it} AS (
  SELECT cluster, i, SUM(q[i]) AS s
  FROM a{it}, generate_series(1, 64) t(i) GROUP BY cluster, i
),
cn{it} AS (SELECT cluster, COUNT(*) AS n FROM a{it} GROUP BY cluster),
c{it} AS (
  SELECT cs.cluster AS cl, list(cs.s // cn.n ORDER BY cs.i) AS q
  FROM cs{it} cs JOIN cn{it} cn USING (cluster)
  GROUP BY cs.cluster
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH vq AS (SELECT vec_id, {q} AS q FROM embeddings),
vs AS (SELECT * FROM vq WHERE {_SQL_TRAIN_PRED}),
c0 AS (SELECT vec_id AS cl, q FROM vs ORDER BY vec_id LIMIT {k}),
{unrolled}
SELECT v.vec_id,
       CAST(c.cl AS INTEGER) AS cluster,
       CAST({dist.replace("c.q", "c.q")} AS BIGINT) AS dist2
FROM vq v CROSS JOIN c{iters} c
QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY {dist}, c.cl) = 1
"""


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: per-subspace codebooks + ADC shortlist.
# ---------------------------------------------------------------------------

PQ_M = 4            # subspaces
PQ_SUB = DIM // PQ_M
PQ_K = 16           # centroids per subspace (codebook size); 16 keeps
                    # ADC shortlist recall >= 0.6 now that codebooks are
                    # trained on the md5-bucket sample rather than the
                    # full corpus (finer cells > more Lloyd iterations,
                    # measured at sf0.001: k=16 -> 8/10 true neighbours
                    # in the 100-row shortlist vs 4/10 at k=8)
PQ_ITERS = 2
PQ_SHORT = 100      # ADC shortlist size before exact rerank
PQ_TOPK = 10


def _pq_train(emb, b: int, k: int = PQ_K, iters: int = PQ_ITERS):
    """Fixed-iteration integer Lloyd's on subspace ``b`` (same exact-math
    contract as ``kmeans``); returns [(label, centroid_list)].

    Trains on the deterministic md5-bucket sample (``_train_bucket`` <
    TRAIN_BP) so the PQ_M * iters training passes never scan the full
    corpus — only the downstream encode/ADC pass does."""
    lo = b * PQ_SUB + 1
    sub = emb.where(_train_bucket() < TRAIN_BP).select(
        "vec_id", F.slice("q", lo, PQ_SUB).alias("qb")
    )
    cents = [
        (int(r["vec_id"]), [int(v) for v in r["qb"]])
        for r in sub.orderBy("vec_id").limit(k).collect()
    ]

    def d2(col, c):
        return sum(
            (F.element_at(col, i + 1) - F.lit(c[i])) ** 2
            for i in range(PQ_SUB)
        ).cast("bigint")

    for _ in range(iters):
        dists = F.array(*[d2(F.col("qb"), c) for _, c in cents])
        labels = F.array(*[F.lit(lbl) for lbl, _ in cents])
        pos = F.array_position(dists, F.array_min(dists)).cast("int")
        a = sub.select(
            "qb", F.element_at(labels, pos).cast("int").alias("cluster")
        )
        rows = (
            a.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("qb")[d]).alias(f"s{d}") for d in range(PQ_SUB)],
            )
            .orderBy("cluster")
            .collect()
        )
        cents = [
            (
                int(r["cluster"]),
                [_tdiv(int(r[f"s{d}"]), int(r["n"])) for d in range(PQ_SUB)],
            )
            for r in rows
        ]
    return cents


def _sub_d2_py(vec: list[int], b: int, c: list[int]) -> int:
    """Exact-integer squared L2 between subspace ``b`` of a full quantized
    vector and a subspace centroid — the driver-side ADC table entry."""
    lo = b * PQ_SUB
    return sum((vec[lo + i] - c[i]) ** 2 for i in range(PQ_SUB))


def _pq_adc_cols(books, qq: list[int]) -> list:
    """Per-subspace ADC lookup columns for query vector ``qq``: each
    column encodes a row's subspace code (expression-level argmin over
    the codebook literals — zero shuffle) and maps it through the
    query's precomputed ADC table as a literal CASE chain.  Shared by
    ``pq_topk`` and ``annplus.ivfpq_topk`` so the two PQ paths can never
    drift."""
    # ADC lookup tables: dist2(query subvector, centroid) per (block, label)
    adc = [
        {lbl: _sub_d2_py(qq, b, c) for lbl, c in books[b]}
        for b in range(PQ_M)
    ]
    adc_cols = []
    for b in range(PQ_M):
        lo = b * PQ_SUB + 1
        qb = F.slice("q", lo, PQ_SUB)
        d2s = F.array(
            *[
                sum(
                    (F.element_at(qb, i + 1) - F.lit(c[i])) ** 2
                    for i in range(PQ_SUB)
                ).cast("bigint")
                for _, c in books[b]
            ]
        )
        labels = F.array(*[F.lit(lbl) for lbl, _ in books[b]])
        code = F.element_at(
            labels, F.array_position(d2s, F.array_min(d2s)).cast("int")
        )
        # code -> ADC table entry, as a literal CASE chain (PQ_K entries)
        expr = None
        for lbl, _ in books[b]:
            branch = F.when(code == lbl, F.lit(adc[b][lbl]))
            expr = branch if expr is None else expr.when(
                code == lbl, F.lit(adc[b][lbl])
            )
        adc_cols.append(expr.cast("bigint"))
    return adc_cols


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = PQ_TOPK,
    shortlist: int = PQ_SHORT,
) -> DataFrame:
    """(vec_id, adc_dist2, dist2): exact top-k nearest neighbours (squared
    L2 over the integer-quantized vectors) found PQ-style — per-subspace
    codebooks (fixed-iteration integer Lloyd's), each vector encoded as
    PQ_M codes, candidates shortlisted by asymmetric distance (sum of
    per-subspace query->centroid distances, a table lookup instead of a
    64-dim computation), and only the shortlist reranked exactly.

    This is the memory shape a 10^12-vector index needs: 4 codes/vector
    instead of 64 floats (the codebooks are k*M tiny literals), scan cost
    is per-code lookups, and the exact vectors are touched for
    ``shortlist`` rows only.  All arithmetic is integer, so the DuckDB
    oracle (unrolled per-subspace kmeans + the same ADC join) matches
    bit-for-bit."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _qvec().alias("q")
    ).persist()
    books = [_pq_train(emb, b) for b in range(PQ_M)]
    qrow = emb.where(F.col("vec_id") == query_id).collect()[0]
    qq = [int(v) for v in qrow["q"]]

    cand = emb.where(F.col("vec_id") != query_id)
    adc_cols = _pq_adc_cols(books, qq)
    scored = cand.select(
        "vec_id", "q", sum(adc_cols).alias("adc_dist2")
    )
    short = (
        scored.orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(shortlist)
    )
    exact = sum(
        (F.element_at("q", i + 1) - F.lit(qq[i])) ** 2 for i in range(DIM)
    ).cast("bigint")
    out = (
        short.withColumn("dist2", exact)
        .orderBy(F.asc("dist2"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "adc_dist2", "dist2")
        .localCheckpoint(eager=True)
    )
    emb.unpersist()
    return out


def _sql_pq_codebook_ctes(
    query_id: int = 0,
    iters: int = PQ_ITERS,
    cand_alias: str = "s",
) -> tuple[str, str]:
    """(codebook CTE chain, ADC-sum expression): the per-subspace
    sample-trained Lloyd's codebook CTEs (train + encode + the query's
    ADC tables) and the correlated ADC-sum scalar referencing
    ``cand_alias``.vec_id — factored out of sql_pq_topk so
    annplus.sql_ivfpq_topk rides the identical oracle text (a candidate
    CTE swap, never a second copy of the codebook math).  Assumes a
    ``vq(vec_id, q)`` CTE is in scope."""
    dist = (
        f"list_aggregate([(v.qb[i] - c.qb[i]) * (v.qb[i] - c.qb[i]) "
        f"for i in generate_series(1, {PQ_SUB})], 'sum')"
    )
    blocks = []
    for b in range(PQ_M):
        lo = b * PQ_SUB + 1
        steps = []
        for it in range(1, iters + 1):
            prev = f"b{b}c{it - 1}"
            steps.append(
                f"""b{b}a{it} AS (
  SELECT vec_id, qb, cl AS cluster FROM (
    SELECT v.vec_id, v.qb, c.cl, {dist} AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cl) AS rn
    FROM b{b}vs v CROSS JOIN {prev} c)
  WHERE rn = 1
),
b{b}cs{it} AS (
  SELECT cluster, i, SUM(qb[i]) AS s
  FROM b{b}a{it}, generate_series(1, {PQ_SUB}) t(i) GROUP BY cluster, i
),
b{b}cn{it} AS (SELECT cluster, COUNT(*) AS n FROM b{b}a{it} GROUP BY cluster),
b{b}c{it} AS (
  SELECT cs.cluster AS cl, list(cs.s // cn.n ORDER BY cs.i) AS qb
  FROM b{b}cs{it} cs JOIN b{b}cn{it} cn USING (cluster)
  GROUP BY cs.cluster
)"""
            )
        blocks.append(
            f"""b{b}vq AS (
  SELECT vec_id, list_slice(q, {lo}, {lo + PQ_SUB - 1}) AS qb FROM vq
),
b{b}vs AS (SELECT * FROM b{b}vq WHERE {_SQL_TRAIN_PRED}),
b{b}c0 AS (SELECT vec_id AS cl, qb FROM b{b}vs ORDER BY vec_id LIMIT {PQ_K}),
"""
            + ",\n".join(steps)
            + f""",
b{b}enc AS (
  SELECT vec_id, cl FROM (
    SELECT v.vec_id, c.cl, {dist} AS d,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cl) AS rn
    FROM b{b}vq v CROSS JOIN b{b}c{iters} c)
  WHERE rn = 1
),
b{b}adc AS (
  SELECT c.cl,
         list_aggregate([(qv.qb[i] - c.qb[i]) * (qv.qb[i] - c.qb[i])
                         for i in generate_series(1, {PQ_SUB})], 'sum') AS d
  FROM b{b}c{iters} c
  CROSS JOIN (SELECT qb FROM b{b}vq WHERE vec_id = {query_id}) qv
)"""
        )
    all_blocks = ",\n".join(blocks)
    adc_sum = " + ".join(
        f"(SELECT a.d FROM b{b}enc e JOIN b{b}adc a USING (cl) "
        f"WHERE e.vec_id = {cand_alias}.vec_id)"
        for b in range(PQ_M)
    )
    return all_blocks, adc_sum


def sql_pq_topk(
    query_id: int = 0,
    k: int = PQ_TOPK,
    shortlist: int = PQ_SHORT,
    iters: int = PQ_ITERS,
) -> str:
    q = (
        "[CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "for e in embedding]"
    )
    all_blocks, adc_sum = _sql_pq_codebook_ctes(query_id, iters)
    return f"""
WITH vq AS (SELECT vec_id, {q} AS q FROM embeddings),
{all_blocks},
scored AS (
  -- CAST: DuckDB sums of integers widen to HUGEINT; Spark emits BIGINT.
  SELECT s.vec_id, s.q, CAST({adc_sum} AS BIGINT) AS adc_dist2
  FROM vq s WHERE s.vec_id <> {query_id}
),
short AS (
  SELECT * FROM scored ORDER BY adc_dist2, vec_id LIMIT {shortlist}
),
qfull AS (SELECT q FROM vq WHERE vec_id = {query_id})
SELECT s.vec_id, s.adc_dist2,
       CAST(list_aggregate([(s.q[i] - qf.q[i]) * (s.q[i] - qf.q[i])
                            for i in generate_series(1, {DIM})], 'sum')
            AS BIGINT) AS dist2
FROM short s CROSS JOIN qfull qf
ORDER BY dist2, s.vec_id LIMIT {k}
"""

# ---------------------------------------------------------------------------
# Nearest-class-mean (Rocchio) classifier: train + score, all DataFrame ops.
# ---------------------------------------------------------------------------


def centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, predicted, n): confusion matrix of a nearest-class-mean
    classifier over the embedding table — the simplest trained model a
    curation pipeline runs at corpus scale (e.g. topic/quality routing of
    crawl shards by embedding), with the train/score split, centroid fit,
    and scoring all expressed as DataFrame ops.

    Replaces the reference's per-document python model loop
    (/root/reference/pymedgraph/dataprocessing/nerpipe.py batching) with a
    two-pass distributed fit/score: TRAIN = the deterministic md5-bucket
    sample (``_train_bucket`` < TRAIN_BP, the same sampler as kmeans/PQ);
    the class means are ONE partial-aggregated shuffle of 64 per-dim
    integer sums (quantized by ``_qvec`` so summation order can't perturb
    them) + an n_labels-row driver collect; scoring the held-out rows is a
    map-only projection with the class-mean literals folded in (the
    shuffle-free argmin of kmeans/IVF), then the confusion matrix is one
    tiny grouped count.  At 10^12 rows: training cost is sample-bounded,
    the corpus pays one scan, nothing shuffles but (label, predicted)
    partial counts.  All arithmetic is exact integers -> bit-identical to
    the DuckDB oracle, ties to the lowest class id."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", _qvec().alias("q")
    )
    train = emb.where(_train_bucket() < TRAIN_BP)
    rows = (
        train.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("q")[d]).alias(f"s{d}") for d in range(DIM)],
        )
        .orderBy("label")
        .collect()
    )
    cents = [
        (int(r["label"]), [_tdiv(int(r[f"s{d}"]), int(r["n"])) for d in range(DIM)])
        for r in rows
    ]
    dists = F.array(*[_dist2(F.col("q"), c) for _, c in cents])
    labels = F.array(*[F.lit(lbl) for lbl, _ in cents])
    pos = F.array_position(dists, F.array_min(dists)).cast("int")
    test = emb.where(_train_bucket() >= TRAIN_BP)
    return (
        test.select(
            "label", F.element_at(labels, pos).cast("int").alias("predicted")
        )
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_centroid_classify() -> str:
    q = (
        "[CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "for e in embedding]"
    )
    dist = (
        "list_aggregate([(v.q[i] - c.q[i]) * (v.q[i] - c.q[i]) "
        "for i in generate_series(1, 64)], 'sum')"
    )
    return f"""
WITH vq AS (SELECT vec_id, label, {q} AS q FROM embeddings),
tr AS (SELECT * FROM vq WHERE {_SQL_TRAIN_PRED}),
cs AS (
  SELECT label AS cl, i, SUM(q[i]) AS s
  FROM tr, generate_series(1, 64) t(i) GROUP BY 1, 2
),
cn AS (SELECT label AS cl, COUNT(*) AS n FROM tr GROUP BY 1),
cents AS (
  SELECT cs.cl, list(cs.s // cn.n ORDER BY cs.i) AS q
  FROM cs JOIN cn USING (cl) GROUP BY cs.cl
),
te AS (SELECT * FROM vq WHERE NOT ({_SQL_TRAIN_PRED})),
pred AS (
  SELECT v.label, c.cl AS predicted FROM te v CROSS JOIN cents c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY {dist}, c.cl) = 1
)
SELECT label, CAST(predicted AS INTEGER) AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Matryoshka truncation: recall of dim-truncated cosine vs full-dim.
# ---------------------------------------------------------------------------

MRL_DIM = 32


def matryoshka_recall(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    dims: int = MRL_DIM,
) -> DataFrame:
    """(k, dims, n_hits, recall): recall@k of cosine search over the first
    ``dims`` embedding components against the full-dimension answer — the
    evaluation behind Matryoshka-style dimension truncation (serve a
    prefix of the vector, keep most of the answer quality at a fraction
    of the memory/bandwidth).  Both searches are the brute-force
    TakeOrdered plan; truncation is F.slice in the projection, so the
    scan reads the same column and the truncated path moves half the
    bytes through the fold.  (These synthetic embeddings have no
    MRL-trained prefix structure, so recall here exercises the harness,
    not a quality claim.)"""
    full_ids = cosine_topk(spark, sf_dir, query_id=query_id, k=k).select("vec_id")
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.slice("v", 1, dims).alias("v")
    )
    q = emb.where(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    trunc_ids = (
        emb.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", _dot("v", "qv") / (_norm("v") * _norm("qv")))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )
    hits = trunc_ids.join(full_ids, "vec_id")
    return hits.agg(F.count(F.lit(1)).alias("n_hits")).select(
        F.lit(k).alias("k"),
        F.lit(dims).alias("dims"),
        "n_hits",
        F.round(F.col("n_hits").cast("double") / k, 6).alias("recall"),
    )


def sql_matryoshka_recall(
    query_id: int = 0, k: int = 10, dims: int = MRL_DIM
) -> str:
    dot = _SQL_DOT.format(a="e.v", b="q.qv")
    cos = f"({dot}) / ({_SQL_NORM.format(a='e.v')} * {_SQL_NORM.format(a='q.qv')})"
    return f"""
WITH full_ids AS (SELECT vec_id FROM ({sql_cosine_topk(query_id, k)}) f),
e AS (SELECT vec_id, list_slice(embedding, 1, {dims}) AS v FROM embeddings),
q AS (SELECT list_slice(embedding, 1, {dims}) AS qv
      FROM embeddings WHERE vec_id = {query_id}),
trunc_ids AS (
  SELECT vec_id FROM e, q
  WHERE e.vec_id <> {query_id}
  ORDER BY {cos} DESC, vec_id ASC
  LIMIT {k}
),
hits AS (SELECT * FROM trunc_ids INTERSECT SELECT * FROM full_ids)
SELECT {k} AS k, {dims} AS dims,
       (SELECT COUNT(*) FROM hits) AS n_hits,
       round((SELECT COUNT(*) FROM hits)::DOUBLE / {k}, 6) AS recall
"""


# ---------------------------------------------------------------------------
# kNN-graph construction (IVF-cell-blocked, mutual-edge flag).
# ---------------------------------------------------------------------------

KNN_K = 5
KNN_QK = 1 << 15  # per-element quantization of the unit vector


#: Session-scoped materialized embedding substrates — the relations._KG_CACHE
#: strategy: the kNN edge set and the k-means assignment are each consumed
#: by several queries (beam-search ANN, outlier scoring, agreement/recall
#: scorecards), and all are post-aggregation (k*n edges / n assignment
#: rows), so checkpointing once per (session, sf_dir, params) trades a few
#: MB of executor storage for not replaying the per-cell pair scoring or
#: the Lloyd iterations per query.  Keyed by applicationId; cleared at 8.
_SS_CACHE: dict[tuple, DataFrame] = {}


def _ss_cached(spark: SparkSession, tag: str, extra: tuple, builder):
    key = (spark.sparkContext.applicationId, tag) + extra
    hit = _SS_CACHE.get(key)
    if hit is not None:
        return hit
    out = builder().localCheckpoint(eager=True)
    if len(_SS_CACHE) >= 8:
        _SS_CACHE.clear()
    _SS_CACHE[key] = out
    return out


def _cells(spark: SparkSession, sf_dir: str, n_cells: int = N_CELLS) -> DataFrame:
    """(vec_id, q, cid): every vector quantized to a unit-int64 vector and
    assigned to its max-cosine IVF cell — the shared substrate of
    knn_graph, margin_pairs, and semdedup.

    Normalize + quantize happen in the scan projection (JVM expressions,
    so the integers are bit-identical to the oracle's): uq = round(v/|v| *
    2^15) per element.  Cell assignment is the same zero-shuffle
    expression-level argmax over broadcast centroid literals as ivf_topk.
    Exact integers mean every downstream rank/threshold decision is
    bit-identical across Spark / DuckDB / numpy — no float
    accumulation-order hazard at decision boundaries."""
    emb = _emb(spark, sf_dir)
    cent_rows = (
        emb.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= n_cells))
        .orderBy("vec_id")
        .collect()
    )
    cents_local = [(r["vec_id"], [float(x) for x in r["v"]]) for r in cent_rows]
    sim_structs = F.array(
        *[
            F.struct(
                (_dot("v", _plane_lit(cv)) / (_norm("v") * _norm(_plane_lit(cv))))
                .alias("sim"),
                F.lit(-cid).alias("negcid"),
            )
            for cid, cv in cents_local
        ]
    )
    best = F.array_max(sim_structs)
    unit_q = F.expr(
        f"transform(v, x -> CAST(round(CAST(x AS DOUBLE) / n * {KNN_QK})"
        " AS BIGINT))"
    )
    return (
        emb.select("vec_id", "v", (-best["negcid"]).alias("cid"))
        .withColumn("n", _norm("v"))
        .select("vec_id", unit_q.alias("q"), "cid")
    )


def knn_graph(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    n_cells: int = N_CELLS,
    use_cache: bool = True,
) -> DataFrame:
    """(src, dst, cos, rk, mutual): the k-nearest-neighbor graph over the
    embedding corpus, restricted to each vector's IVF cell — the standard
    first step of graph-based ANN index builds (HNSW/NSG ground layers),
    dedup clustering, and label propagation over similarity edges.
    ``mutual`` marks edges whose reverse is also a kNN edge (the
    mutual-kNN filter that prunes hub-induced false neighbors).

    Scale: every vector is assigned to its max-cosine cell by the same
    zero-shuffle expression argmax as ivf_topk; pair scoring runs
    per-cell inside ONE applyInPandas (cells partition the corpus, so
    the work is |cell|^2 per cell, never corpus^2 — at 10^12 rows you
    bound cell size by splitting hot cells, the IVF list-length cap);
    the mutual flag is a self-equi-join of the k*n-row kNN edge set.

    Approximation contract (same as ivf_topk): neighbors outside the
    source's own cell are not candidates; the oracle replicates the exact
    same cell assignment, so the gate checks the algorithm, and
    metrics.ann_recall-style scorecards quantify the recall loss.

    The k*n-row edge set is session-memoized (``_SS_CACHE``) — beam
    search, outlier scoring and the recall scorecards all consume it;
    ``use_cache=False`` builds the full declarative plan (what
    tools/explain_report.py audits)."""
    if use_cache:
        return _ss_cached(
            spark, "knn", (sf_dir, k, n_cells),
            lambda: knn_graph(spark, sf_dir, k, n_cells, use_cache=False),
        )
    cells = _cells(spark, sf_dir, n_cells)
    kk = int(k)

    def _cell_knn(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype="int64"),
                    "dst": pd.Series(dtype="int64"),
                    "dot_q": pd.Series(dtype="int64"),
                    "rk": pd.Series(dtype="int32"),
                }
            )
        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        s = q @ q.T  # exact: 64 * (2^15)^2 = 2^36 per entry, no overflow
        out_src, out_dst, out_dot, out_rk = [], [], [], []
        for r in range(len(ids)):
            # deterministic (-dot, id) order; lexsort keys are reversed
            order = np.lexsort((ids, -s[r]))
            order = order[ids[order] != ids[r]][:kk]
            for rk_, i in enumerate(order, start=1):
                out_src.append(ids[r])
                out_dst.append(ids[i])
                out_dot.append(s[r, i])
                out_rk.append(rk_)
        return pd.DataFrame(
            {
                "src": np.array(out_src, dtype=np.int64),
                "dst": np.array(out_dst, dtype=np.int64),
                "dot_q": np.array(out_dot, dtype=np.int64),
                "rk": np.array(out_rk, dtype=np.int32),
            }
        )

    knn = cells.groupBy("cid").applyInPandas(
        _cell_knn, "src bigint, dst bigint, dot_q bigint, rk int"
    )
    rev = knn.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("m"),
    )
    return knn.join(rev, ["src", "dst"], "left").select(
        "src",
        "dst",
        "dot_q",
        F.round(F.col("dot_q").cast("double") / F.lit(float(KNN_QK * KNN_QK)), 6)
        .alias("cos"),
        "rk",
        F.col("m").isNotNull().alias("mutual"),
    )


_SQL_DOT_AB = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, len(a.q)), "
    "i -> a.q[i] * b.q[i])), (acc, e) -> acc + e)"
)


def _sql_cells_cte(n_cells: int = N_CELLS) -> str:
    """The shared DuckDB CTE chain producing the ``assigned`` relation
    (vec_id, q, cid): every vector quantized to a unit-int64 vector and
    assigned to its max-cosine IVF cell — the cell structure knn_graph,
    margin_pairs, and semdedup all ride, factored once so the oracles
    can never drift apart."""
    sim_ec = (
        f"({_SQL_DOT.format(a='e.v', b='c.cv')}) / "
        f"({_SQL_NORM.format(a='e.v')} * {_SQL_NORM.format(a='c.cv')})"
    )
    unit_q = (
        "list_transform(v, x -> CAST(round(x::DOUBLE / "
        + _SQL_NORM.format(a="v")
        + f" * {KNN_QK}) AS BIGINT))"
    )
    return f"""e AS (SELECT vec_id, embedding AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {n_cells}),
sims AS (
  SELECT e.vec_id, e.v, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {sim_ec} DESC, c.cid ASC) AS rk
  FROM e, c
),
assigned AS MATERIALIZED (
  SELECT vec_id, {unit_q} AS q, cid FROM sims WHERE rk = 1)"""


def _sql_knn_cte(k: int = KNN_K, n_cells: int = N_CELLS) -> str:
    """_sql_cells_cte plus the ``knn`` edge relation (src, dst, dot_q,
    rk) — used by sql_knn_graph and sql_margin_pairs."""
    dot_ab = _SQL_DOT_AB
    return f"""{_sql_cells_cte(n_cells)},
knn AS MATERIALIZED (
  SELECT src, dst, dot_q, rk FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           CAST({dot_ab} AS BIGINT) AS dot_q,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY CAST({dot_ab} AS BIGINT) DESC,
                                       b.vec_id ASC) AS rk
    FROM assigned a JOIN assigned b USING (cid)
    WHERE a.vec_id <> b.vec_id
  ) WHERE rk <= {k}
)"""


def sql_knn_graph(k: int = KNN_K, n_cells: int = N_CELLS) -> str:
    return f"""
WITH {_sql_knn_cte(k, n_cells)}
SELECT t.src, t.dst, t.dot_q,
       round(CAST(t.dot_q AS DOUBLE) / {KNN_QK * KNN_QK}, 6) AS cos,
       CAST(t.rk AS INT) AS rk,
       (r.src IS NOT NULL) AS mutual
FROM knn t LEFT JOIN knn r ON r.src = t.dst AND r.dst = t.src
"""


# ---------------------------------------------------------------------------
# Margin-based neighbor mining (Artetxe & Schwenk 2019 ratio criterion).
# ---------------------------------------------------------------------------

MARGIN_TAU_MILLI = 1050  # accept iff margin >= 1.050 (ratio criterion)


def margin_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    n_cells: int = N_CELLS,
    tau_milli: int = MARGIN_TAU_MILLI,
) -> DataFrame:
    """(a, b, cos, margin, accept): the margin (ratio) criterion used to
    mine aligned pairs from embedding spaces — LASER-style bitext mining,
    cross-lingual document alignment, semantic near-dup promotion.  Raw
    cosine over-accepts in dense hubs; the margin rescales each pair's
    similarity by the mean similarity of the two endpoints' own kNN
    neighborhoods:  margin(x,y) = cos(x,y) / ((avgk(x) + avgk(y)) / 2),
    accept iff margin >= tau.  Only mutual-kNN pairs are candidates (the
    standard forward+backward intersection).

    Scale: rides entirely on the kNN graph (cell-blocked, |cell|^2
    bounded — see knn_graph); the neighborhood averages are ONE map-side
    combinable groupBy over the k*n edge set and the pair scoring a
    self-equi-join of that same edge set.  All decision arithmetic is
    exact int64 on the quantized dots (accept compares
    2000*dot*ca*cb >= tau_milli*(sa*cb + sb*ca)), so the accept set is
    bit-identical across engines; the reported margin is one double
    division, rounded.  Pairs whose denominator is <= 0 (a neighborhood
    with net-negative similarity — can't happen for mutual-kNN pairs in
    practice, but guard anyway) are dropped."""
    knn = knn_graph(spark, sf_dir, k=k, n_cells=n_cells).persist()
    stats = knn.groupBy("src").agg(
        F.sum("dot_q").alias("s"), F.count(F.lit(1)).alias("c")
    )
    mut = (
        knn.where(F.col("mutual") & (F.col("src") < F.col("dst")))
        .select("src", "dst", "dot_q")
    )
    sa = stats.select(
        F.col("src").alias("a"), F.col("s").alias("s_a"),
        F.col("c").alias("c_a"),
    )
    sb = stats.select(
        F.col("src").alias("b"), F.col("s").alias("s_b"),
        F.col("c").alias("c_b"),
    )
    denom = F.col("s_a") * F.col("c_b") + F.col("s_b") * F.col("c_a")
    num = F.lit(2) * F.col("dot_q") * F.col("c_a") * F.col("c_b")
    out = (
        mut.select(F.col("src").alias("a"), F.col("dst").alias("b"), "dot_q")
        .join(sa, "a")
        .join(sb, "b")
        .where(denom > 0)
        .select(
            "a",
            "b",
            F.round(
                F.col("dot_q").cast("double") / F.lit(float(KNN_QK * KNN_QK)),
                6,
            ).alias("cos"),
            F.round(num.cast("double") / denom.cast("double"), 6)
            .alias("margin"),
            (num * 1000 >= F.lit(int(tau_milli)) * denom).alias("accept"),
        )
        .localCheckpoint(eager=True)
    )
    knn.unpersist()
    return out


def sql_margin_pairs(
    k: int = KNN_K,
    n_cells: int = N_CELLS,
    tau_milli: int = MARGIN_TAU_MILLI,
) -> str:
    return f"""
WITH {_sql_knn_cte(k, n_cells)},
stats AS (SELECT src, SUM(dot_q) AS s, COUNT(*) AS c FROM knn GROUP BY src),
mut AS (
  SELECT t.src, t.dst, t.dot_q
  FROM knn t JOIN knn r ON r.src = t.dst AND r.dst = t.src
  WHERE t.src < t.dst
)
SELECT m.src AS a, m.dst AS b,
       round(CAST(m.dot_q AS DOUBLE) / {KNN_QK * KNN_QK}, 6) AS cos,
       round(CAST(2 * m.dot_q * sa.c * sb.c AS DOUBLE)
             / CAST(sa.s * sb.c + sb.s * sa.c AS DOUBLE), 6) AS margin,
       (2000 * m.dot_q * sa.c * sb.c
          >= {int(tau_milli)} * (sa.s * sb.c + sb.s * sa.c)) AS accept
FROM mut m
JOIN stats sa ON sa.src = m.src
JOIN stats sb ON sb.src = m.dst
WHERE sa.s * sb.c + sb.s * sa.c > 0
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication via cluster-blocked cosine (Abbas et
# al. 2023, "SemDeDup: Data-efficient learning at web-scale through
# semantic deduplication").
# ---------------------------------------------------------------------------

# Fixture calibration: the synthetic embeddings are near-isotropic, so
# real-corpus thresholds (0.95+) select nothing; 0.38 sits at ~p95 of the
# within-cell cosine distribution and exercises both keep and drop at
# every SF.  The threshold is exact (integer micro-units), not a float.
SEMDEDUP_TAU_MICRO = 380_000


def semdedup(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = N_CELLS,
    tau_micro: int = SEMDEDUP_TAU_MICRO,
) -> DataFrame:
    """(vec_id, cid, n_dups, dup_of, keep): SemDeDup — drop items whose
    embedding is within cosine tau of an already-kept item in the SAME
    cluster.  ``n_dups`` counts all same-cell neighbors above tau,
    ``dup_of`` is the smallest smaller-id such neighbor (the kept
    representative this row is a duplicate of; NULL means this row is
    kept).  The keep rule (survive iff no smaller-id near neighbor) is
    the deterministic variant of the paper's random-representative rule.

    Scale: identical blocking contract to knn_graph — vectors are
    assigned to IVF cells by a zero-shuffle expression argmax, pair
    scoring is an exact int64 numpy matmul per cell inside ONE
    applyInPandas (|cell|^2 per cell, never corpus^2; hot cells get
    split at real scale).  Cross-cell near-dups are by construction not
    candidates — the paper's own approximation, quantified by the recall
    scorecards in metrics.py.  The accept decision compares
    1e6*dot_q >= tau_micro*QK^2 in exact int64, so keep/drop is
    bit-identical across engines."""
    cells = _cells(spark, sf_dir, n_cells)
    tau = int(tau_micro)
    qk2 = KNN_QK * KNN_QK

    def _cell_dedup(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        cid = pdf["cid"].to_numpy().astype(np.int64)
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "vec_id": ids,
                    "cid": cid,
                    "n_dups": np.zeros(len(ids), dtype=np.int64),
                    "dup_of": pd.array([None] * len(ids), dtype="Int64"),
                    "keep": np.ones(len(ids), dtype=bool),
                }
            )
        q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        s = q @ q.T  # exact: 64 * (2^15)^2 = 2^36 per entry
        near = (1_000_000 * s) >= (tau * qk2)
        np.fill_diagonal(near, False)
        n_dups = near.sum(axis=1).astype(np.int64)
        smaller = near & (ids[None, :] < ids[:, None])
        big = np.int64(np.iinfo(np.int64).max)
        cand = np.where(smaller, ids[None, :], big)
        dup_min = cand.min(axis=1)
        dup_of = pd.array(
            [None if d == big else int(d) for d in dup_min], dtype="Int64"
        )
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cid": cid,
                "n_dups": n_dups,
                "dup_of": dup_of,
                "keep": dup_min == big,
            }
        )

    return (
        cells.withColumn("cid", F.col("cid").cast("bigint"))
        .groupBy("cid")
        .applyInPandas(
            _cell_dedup,
            "vec_id bigint, cid bigint, n_dups bigint, dup_of bigint,"
            " keep boolean",
        )
    )


def sql_semdedup(
    n_cells: int = N_CELLS, tau_micro: int = SEMDEDUP_TAU_MICRO
) -> str:
    return f"""
WITH {_sql_cells_cte(n_cells)},
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM assigned a JOIN assigned b USING (cid)
  WHERE a.vec_id <> b.vec_id
    AND 1000000 * ({_SQL_DOT_AB})
        >= CAST({int(tau_micro)} AS BIGINT) * {KNN_QK * KNN_QK}
),
agg AS (
  SELECT va AS vec_id, COUNT(*) AS n_dups,
         MIN(CASE WHEN vb < va THEN vb END) AS dup_of
  FROM pairs GROUP BY va
)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
       COALESCE(g.n_dups, 0) AS n_dups, g.dup_of,
       (g.dup_of IS NULL) AS keep
FROM assigned a LEFT JOIN agg g USING (vec_id)
"""


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random-projection ANN (sketch shortlist + rerank).
# ---------------------------------------------------------------------------

JL_DIM = 16         # projected dimensionality
JL_SHORTLIST = 100  # candidates kept from the sketch space


def jl_signs(proj_dim: int = JL_DIM, dim: int = DIM) -> list[list[float]]:
    """Deterministic Rademacher (+/-1) projection rows, shared with the
    oracle — the dense JL variant; Achlioptas sparsification is the same
    expression with zeros mixed in."""
    rng = random.Random(_SEED + 1)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(proj_dim)
    ]


def jl_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    shortlist: int = JL_SHORTLIST,
) -> DataFrame:
    """(vec_id, cos): ANN top-k via Johnson-Lindenstrauss random
    projection — every vector is sketched to JL_DIM dims by +/-1 row
    sums (distance-preserving within (1+/-eps) w.h.p., the JL lemma), the
    ``shortlist`` nearest sketches by projected cosine are shortlisted,
    and ONLY those rows pay the exact 64-dim rerank.  The third shortlist
    geometry next to hyperplane-LSH (buckets) and IVF (cells): no
    partition boundaries, so recall degrades smoothly instead of cliffing
    at a cell edge.

    Scale: the sketch is JL_DIM row-local fused dot products riding the
    scan (8 doubles stored vs 64), the shortlist is one TakeOrdered of
    sketch-width rows, and the rerank touches ``shortlist`` vectors.  All
    folds run in index order — bit-identical in DuckDB."""
    signs = jl_signs()
    emb = _emb(spark, sf_dir)
    proj = F.array(*[_dot(F.col("v"), _plane_lit(s)) for s in signs])
    emb_p = emb.select("vec_id", "v", proj.alias("p"))
    q = emb_p.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("p").alias("qp")
    )
    short = (
        emb_p.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "pcos", _dot("p", "qp") / (_norm(F.col("p")) * _norm(F.col("qp")))
        )
        .orderBy(F.desc("pcos"), F.asc("vec_id"))
        .limit(shortlist)
    )
    return (
        short.withColumn(
            "cos", _dot("v", "qv") / (_norm(F.col("v")) * _norm(F.col("qv")))
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )


def sql_jl_topk(
    query_id: int = 0, k: int = 10, shortlist: int = JL_SHORTLIST
) -> str:
    signs = jl_signs()
    proj = "[" + ", ".join(
        _SQL_DOT.format(a="e.v", b=_sql_plane(s)) for s in signs
    ) + "]"
    pcos = (
        f"({_SQL_DOT.format(a='s.p', b='q.qp')}) / "
        f"({_SQL_NORM.format(a='s.p')} * {_SQL_NORM.format(a='q.qp')})"
    )
    cos = (
        f"({_SQL_DOT.format(a='s.v', b='s.qv')}) / "
        f"({_SQL_NORM.format(a='s.v')} * {_SQL_NORM.format(a='s.qv')})"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
ep AS (SELECT vec_id, v, {proj.replace('e.v', 'v')} AS p FROM e),
q AS (SELECT v AS qv, p AS qp FROM ep WHERE vec_id = {query_id}),
short AS (
  SELECT s.vec_id, s.v, q.qv
  FROM ep s, q
  WHERE s.vec_id <> {query_id}
  ORDER BY {pcos.replace('s.p', 's.p').replace('q.qp', 'q.qp')} DESC,
           s.vec_id ASC
  LIMIT {shortlist}
)
SELECT vec_id, round({cos}, 6) AS cos
FROM short s
ORDER BY {cos} DESC, vec_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Label-noise audit: kNN label agreement (Confident-Learning-style signal).
# ---------------------------------------------------------------------------

AGREE_PPM = 1_000_000   # agreement reported in exact integer ppm
AGREE_SUSPECT = 500_000  # suspect iff < half the neighbors share the label


def label_agreement(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    n_cells: int = N_CELLS,
    suspect_ppm: int = AGREE_SUSPECT,
) -> DataFrame:
    """(vec_id, label, k_eff, n_same, agree_ppm, suspect): per-vector
    label-noise audit — the fraction of a vector's k nearest neighbors
    (cell-blocked kNN graph) that carry the SAME label.  Low agreement
    flags likely mislabeled examples (the kNN-agreement signal behind
    Confident Learning / deep-kNN label cleaning); curation pipelines
    drop or re-queue the suspects before training.

    Scale: rides the existing kNN edge set (cell-blocked, |cell|^2
    bounded — see knn_graph); labels join in via two broadcast-size
    lookups keyed on vec_id, and the audit is ONE map-side-combinable
    groupBy over the k*n edge rows.  agree_ppm is exact integer
    arithmetic (n_same * 10^6 DIV k_eff), so the suspect flag is
    bit-identical across engines."""
    labels = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("label").cast("bigint").alias("label")
    )
    knn = knn_graph(spark, sf_dir, k=k, n_cells=n_cells)
    edges = (
        knn.join(
            labels.select(
                F.col("vec_id").alias("src"), F.col("label").alias("l_src")
            ),
            "src",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("dst"), F.col("label").alias("l_dst")
            ),
            "dst",
        )
    )
    agg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("k_eff"),
        F.sum(
            (F.col("l_src") == F.col("l_dst")).cast("bigint")
        ).alias("n_same"),
    )
    # `div` keeps the arithmetic in 64-bit integers — matching the
    # oracle's exact `//`, never a floor over a double quotient.
    ppm = F.expr(f"n_same * {AGREE_PPM} div k_eff").cast("bigint")
    return (
        agg.join(labels.withColumnRenamed("vec_id", "src"), "src")
        .select(
            F.col("src").alias("vec_id"),
            "label",
            "k_eff",
            "n_same",
            ppm.alias("agree_ppm"),
        )
        .withColumn("suspect", F.col("agree_ppm") < suspect_ppm)
    )


def sql_label_agreement(
    k: int = KNN_K,
    n_cells: int = N_CELLS,
    suspect_ppm: int = AGREE_SUSPECT,
) -> str:
    return f"""
WITH {_sql_knn_cte(k, n_cells)},
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
agg AS (
  SELECT t.src,
         COUNT(*) AS k_eff,
         SUM(CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END) AS n_same
  FROM knn t
  JOIN lab ls ON ls.vec_id = t.src
  JOIN lab ld ON ld.vec_id = t.dst
  GROUP BY t.src
)
SELECT a.src AS vec_id, l.label,
       CAST(a.k_eff AS BIGINT) AS k_eff,
       CAST(a.n_same AS BIGINT) AS n_same,
       CAST(a.n_same * {AGREE_PPM} // a.k_eff AS BIGINT) AS agree_ppm,
       a.n_same * {AGREE_PPM} // a.k_eff < {suspect_ppm} AS suspect
FROM agg a JOIN lab l ON l.vec_id = a.src
"""


# ---------------------------------------------------------------------------
# Residual (two-stage) quantization distortion report.
# ---------------------------------------------------------------------------

RQ_Q1 = 16       # stage-1 coarse grid: q1 = round(x * 16)
RQ_SCALE = 4096  # fine fixed-point reference grid (multiple of RQ_Q1)
RQ_B = 64        # stage-2 residual codes clamp to [-B, B]


def residual_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, c1_checksum, d1, d2, clipped): two-stage residual
    quantization audit — stage 1 snaps each coordinate to a coarse grid
    (q1 = round(x*Q1)), stage 2 encodes the residual against a 16x finer
    reference grid with codes clamped to [-B, B].  ``d1`` is the squared
    error (in fine-grid units) after stage 1 alone, ``d2`` after both
    stages — the additive-quantizer refinement ladder (RQ/LSQ family)
    behind modern vector-index compression; ``clipped`` counts saturated
    residual codes (the knob telling you B is too small for the data).

    All arithmetic is exact int64 on the fixed-point grids (the fine
    grid is an integer multiple of the coarse one, so the residual is an
    exact integer difference — no float subtraction), making every
    column bit-identical across engines.  Map-only: no shuffle, a pure
    projection over 10^12 vectors."""
    emb = _emb(spark, sf_dir)
    s = RQ_SCALE // RQ_Q1
    f = lambda x: F.floor(x * F.lit(float(RQ_SCALE)) + F.lit(0.5)).cast("long")  # noqa: E731
    q1 = lambda x: F.floor(x * F.lit(float(RQ_Q1)) + F.lit(0.5)).cast("long")  # noqa: E731
    r = lambda x: f(x) - q1(x) * F.lit(s)  # noqa: E731
    q2 = lambda x: F.greatest(F.least(r(x), F.lit(RQ_B)), F.lit(-RQ_B))  # noqa: E731
    z = F.lit(0).cast("long")
    return emb.select(
        "vec_id",
        F.aggregate("v", z, lambda a, x: a + q1(x)).alias("c1_checksum"),
        F.aggregate("v", z, lambda a, x: a + r(x) * r(x)).alias("d1"),
        F.aggregate(
            "v", z, lambda a, x: a + (r(x) - q2(x)) * (r(x) - q2(x))
        ).alias("d2"),
        F.aggregate(
            "v",
            z,
            lambda a, x: a
            + F.when(F.abs(r(x)) > RQ_B, F.lit(1)).otherwise(F.lit(0)),
        ).alias("clipped"),
    )


def sql_residual_quant() -> str:
    s = RQ_SCALE // RQ_Q1
    f = f"CAST(floor(x::DOUBLE * {RQ_SCALE} + 0.5) AS BIGINT)"
    q1 = f"CAST(floor(x::DOUBLE * {RQ_Q1} + 0.5) AS BIGINT)"
    r = f"({f} - {q1} * {s})"
    q2 = f"greatest(least({r}, {RQ_B}), -{RQ_B})"
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(embedding, x -> {term})), (acc, e) -> acc + e)"
    )
    return f"""
SELECT vec_id,
       CAST({fold.format(term=q1)} AS BIGINT) AS c1_checksum,
       CAST({fold.format(term=f"{r} * {r}")} AS BIGINT) AS d1,
       CAST({fold.format(term=f"({r} - {q2}) * ({r} - {q2})")} AS BIGINT)
         AS d2,
       CAST({fold.format(term=f"CASE WHEN abs({r}) > {RQ_B} THEN 1 ELSE 0 END")}
         AS BIGINT) AS clipped
FROM embeddings
"""


# ---------------------------------------------------------------------------
# Cosine range search (epsilon-NN / radius query).
# ---------------------------------------------------------------------------

RANGE_TAU = 0.35


def range_search(
    spark: SparkSession, sf_dir: str, query_id: int = 0, tau: float = RANGE_TAU
) -> DataFrame:
    """(vec_id, cos): EVERY vector within cosine >= tau of the query —
    the radius/epsilon-NN variant of cosine_topk for recall-bound
    retrieval (dedup sweeps, eval-set contamination scans) where "the k
    nearest" is the wrong contract because the caller needs ALL matches.

    Filter on the RAW cosine, round only the output column (the
    mirror_hosts parity rule: rounding before the threshold admits
    values in [tau - 5e-7, tau) in one engine only).  Plan: one fused
    map-only projection against the broadcast query row — rides the
    scan; at 10^12 rows the same predicate pushes inside the IVF/LSH
    cell-probe paths (bucket first, range-filter inside cells)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    cos = _dot("v", "qv") / (_norm("v") * _norm("qv"))
    return (
        emb.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .where(cos >= tau)
        .select("vec_id", F.round(cos, 6).alias("cos"))
    )


def sql_range_search(query_id: int = 0, tau: float = RANGE_TAU) -> str:
    dot = _SQL_DOT.format(a="e.v", b="q.qv")
    cos = f"({dot}) / ({_SQL_NORM.format(a='e.v')} * {_SQL_NORM.format(a='q.qv')})"
    return f"""
WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id})
SELECT vec_id, round({cos}, 6) AS cos
FROM e, q
WHERE e.vec_id <> {query_id} AND {cos} >= {tau}
"""


# ---------------------------------------------------------------------------
# Embedding anisotropy audit (mean-direction mass).
# ---------------------------------------------------------------------------

ANISO_SCALE = 1_000_000


def anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_vecs, dim, anisotropy): ||mean unit vector||^2 — the expected
    cosine between two random vectors in the limit, i.e. Ethayarajh's
    anisotropy/embedding-collapse audit.  Isotropic spaces score ~0; a
    collapsed encoder (all vectors share a dominant direction) scores
    toward 1, and retrieval/cosine-threshold ops silently degrade long
    before training metrics notice — this is the ONE-SCALAR health check
    you run per embedding snapshot.

    Determinism at 10^12 vectors: per-dim sums of DOUBLES are
    partition-order-dependent, so each unit component is quantized first
    (floor(u*1e6 + 0.5), the int8_quant explicit-floor convention) and
    the per-dim sums are exact BIGINTs; squares are summed in DECIMAL(38)
    (S_d^2 overflows int64 at ~3k vecs), and the single double division
    happens once at emit.  Plan: one posexplode + 64-row groupBy (map-side
    combinable), the 64-row result folds to one row — no driver loop, no
    second corpus pass."""
    emb = _emb(spark, sf_dir)
    nrm = _norm(F.col("v"))
    unit_q = F.transform(
        "v", lambda x: F.floor(x / nrm * ANISO_SCALE + F.lit(0.5)).cast("bigint")
    )
    per_dim = (
        emb.select(F.posexplode(unit_q).alias("pos", "q"))
        .groupBy("pos")
        .agg(F.sum("q").cast("decimal(38,0)").alias("s"))
    )
    n = emb.count()
    return per_dim.agg(
        F.lit(n).cast("bigint").alias("n_vecs"),
        F.count(F.lit(1)).cast("bigint").alias("dim"),
        F.round(
            F.sum(F.col("s") * F.col("s")).cast("double")
            / F.lit(float(n) * n * ANISO_SCALE * ANISO_SCALE),
            6,
        ).alias("anisotropy"),
    )


def sql_anisotropy() -> str:
    nrm = _SQL_NORM.format(a="embedding")
    return f"""
WITH unit AS (
  SELECT list_transform(generate_series(1, len(embedding)), i ->
           CAST(floor(embedding[i]::DOUBLE / ({nrm}) * {ANISO_SCALE} + 0.5)
                AS BIGINT)) AS q
  FROM embeddings
),
per_dim AS (
  SELECT pos, SUM(qv) AS s
  FROM (SELECT unnest(q) AS qv, generate_subscripts(q, 1) AS pos FROM unit)
  GROUP BY pos
),
n AS (SELECT COUNT(*) AS n_vecs FROM embeddings)
SELECT CAST(n.n_vecs AS BIGINT) AS n_vecs,
       CAST(COUNT(*) AS BIGINT) AS dim,
       round(SUM(s * s)::DOUBLE
             / (n.n_vecs::DOUBLE * n.n_vecs * {ANISO_SCALE}.0 * {ANISO_SCALE}.0), 6)
         AS anisotropy
FROM per_dim CROSS JOIN n
GROUP BY n.n_vecs
"""


# ---------------------------------------------------------------------------
# Random-pair cosine histogram (similarity-distribution audit).
# ---------------------------------------------------------------------------

PAIR_OFFSET = 17


def pair_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, n_pairs): histogram (width 0.1) of the cosine between the
    deterministic pseudo-random pairs (vec_id, vec_id + PAIR_OFFSET) —
    the pairwise-similarity DISTRIBUTION audit that the single-scalar
    anisotropy summarizes away.  A healthy space is a tight bell away
    from 1.0; bimodality flags duplicated clusters, mass near 1.0 flags
    collapse.  Offset pairing replaces "sample random pairs" with an
    equi-join — map-shuffle bounded, no crossJoin, reproducible across
    engines and runs (the md5-free determinism trick: the id space is
    already uniformly shuffled with respect to content).

    Binning floors the ROUNDED cosine (round-then-floor, both engines),
    so bin boundaries can't flip on 1-ulp differences."""
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("ida"), F.col("v").alias("va"))
    b = emb.select(
        (F.col("vec_id") - PAIR_OFFSET).alias("ida"), F.col("v").alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        a.join(b, "ida")
        .select(F.floor(F.round(cos, 6) * 10).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


def sql_pair_cosine_hist() -> str:
    dot = _SQL_DOT.format(a="a.embedding", b="b.embedding")
    na = _SQL_NORM.format(a="a.embedding")
    nb = _SQL_NORM.format(a="b.embedding")
    return f"""
SELECT CAST(floor(round(({dot}) / ({na} * {nb}), 6) * 10) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM embeddings a JOIN embeddings b
  ON b.vec_id = a.vec_id + {PAIR_OFFSET}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Embedding norm profile (pre-index health stats).
# ---------------------------------------------------------------------------

def norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_vecs, n_zero, min_norm_e6, max_norm_e6, avg_norm_e6,
    p50_norm_e6): distribution of vector L2 norms in exact micro-units —
    the pre-index health check (zero vectors crash cosine; a wide norm
    spread means dot-product and cosine rankings diverge and
    inner-product indexes need the norm-augmentation trick).

    Norms are quantized per row (floor(norm*1e6 + 0.5), the int8_quant
    floor convention) so min/max/avg are exact BIGINT (avg by integer
    division) and the median is the exact interpolated percentile of
    integers — no order-dependent double accumulation anywhere.
    Map-only projection + one 1-row aggregate."""
    from sparkmedkg import exactq

    emb = _emb(spark, sf_dir)
    qn = F.floor(_norm(F.col("v")) * 1_000_000 + F.lit(0.5)).cast("bigint")
    per = emb.select(qn.alias("qn"))
    # median via exactq (den=2): half-integers are exact doubles, so the
    # emitted p50 is bit-identical cross-engine by construction
    med = exactq.quantile_cuts_scaled(per, "qn", [1], 2).select(
        (F.element_at("cuts_scaled", 1) / 2.0).alias("p50_norm_e6")
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.when(F.col("qn") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.min("qn").alias("min_norm_e6"),
        F.max("qn").alias("max_norm_e6"),
        F.expr("sum(qn) div count(1)").cast("bigint").alias("avg_norm_e6"),
    ).crossJoin(F.broadcast(med))


def sql_norm_profile() -> str:
    from sparkmedkg import exactq

    nrm = _SQL_NORM.format(a="embedding")
    return f"""
WITH per AS (
  SELECT CAST(floor(({nrm}) * 1000000 + 0.5) AS BIGINT) AS qn
  FROM embeddings
),
{exactq.sql_cuts_cte("per", "qn", [1], 2, prefix="nq")}
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(COALESCE(SUM(CASE WHEN qn = 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_zero,
       MIN(qn) AS min_norm_e6,
       MAX(qn) AS max_norm_e6,
       CAST(SUM(qn) // COUNT(*) AS BIGINT) AS avg_norm_e6,
       (SELECT cuts_scaled[1] / 2.0 FROM nq_cuts) AS p50_norm_e6
FROM per
"""


# ---------------------------------------------------------------------------
# Intrinsic dimension (angular TwoNN estimator).
# ---------------------------------------------------------------------------

def intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_used, sum_ln_mu_e6, id_est): the Facco-Laio TwoNN intrinsic-
    dimension estimate over ANGULAR distances (d = 1 - cos): with mu =
    d2/d1 the ratio of each point's 2nd- to 1st-nearest-neighbor
    distance, ID = n / sum(ln mu).  Embeddings advertising 64 dims often
    live on a ~10-dim manifold; ID is what actually governs ANN recall
    curves and quantization loss, so this is the diagnostic you read
    BEFORE choosing n_cells / PQ bits.

    Composes the gated IVF-cell kNN graph (rk 1 and 2 per vector, cell-
    blocked — never corpus^2); vectors whose d1 = 0 (exact duplicates) or
    with fewer than 2 in-cell neighbors are excluded, as in the paper's
    treatment of ties.  Determinism: each ln(mu) is quantized row-locally
    (floor(x*1e6 + 0.5)) so the sum is an exact BIGINT; one division at
    emit."""
    kg = knn_graph(spark, sf_dir)
    two = (
        kg.where(F.col("rk") <= 2)
        .groupBy("src")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("cos"))).alias("cos1"),
            F.max(F.when(F.col("rk") == 2, F.col("cos"))).alias("cos2"),
        )
        .where(F.col("cos2").isNotNull())
        .where(F.col("cos1") < 1.0)
    )
    mu = (F.lit(1.0) - F.col("cos2")) / (F.lit(1.0) - F.col("cos1"))
    q = F.floor(F.log(mu) * 1_000_000 + F.lit(0.5)).cast("bigint")
    return two.select(q.alias("q")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum("q").cast("bigint").alias("sum_ln_mu_e6"),
        F.round(
            F.count(F.lit(1)).cast("double")
            / (F.sum("q").cast("double") / 1_000_000.0),
            6,
        ).alias("id_est"),
    )


def sql_intrinsic_dim() -> str:
    return f"""
WITH kg AS ({sql_knn_graph()}),
two AS (
  SELECT src,
         MAX(CASE WHEN rk = 1 THEN cos END) AS cos1,
         MAX(CASE WHEN rk = 2 THEN cos END) AS cos2
  FROM kg WHERE rk <= 2
  GROUP BY src
),
q AS (
  SELECT CAST(floor(ln((1.0 - cos2) / (1.0 - cos1)) * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM two WHERE cos2 IS NOT NULL AND cos1 < 1.0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
       CAST(SUM(q) AS BIGINT) AS sum_ln_mu_e6,
       round(COUNT(*)::DOUBLE / (SUM(q)::DOUBLE / 1000000.0), 6) AS id_est
FROM q
"""


# ---------------------------------------------------------------------------
# k-center greedy seeds (Gonzalez) — coreset / diverse-init selection.
# ---------------------------------------------------------------------------

KC_K = 4


def kcenter_seeds(
    spark: SparkSession, sf_dir: str, k: int = KC_K
) -> DataFrame:
    """(seed_rank, vec_id, dist2): Gonzalez's greedy k-center over the
    integer-quantized embeddings — the classic 2-approximation coreset /
    diverse-initialization selector (pick the point FARTHEST from the
    already-chosen set, repeat).  Seed 1 is the min vec_id (deterministic
    without configuration); dist2 is the squared L2 distance from each
    chosen seed to the set chosen before it (0 for seed 1).

    Exactness: the same KM_SCALE integer quantization as kmeans — every
    distance is an exact BIGINT, argmax ties break to the lowest vec_id,
    so the unrolled oracle matches bit-for-bit.

    Scale shape: each of the k-1 rounds is ONE map-only distance
    projection over the corpus (the chosen seeds fold in as literal
    arrays — no join, no shuffle) followed by a TakeOrdered(1); the
    driver holds only k 64-int arrays.  k is a small constant, so total
    work is k corpus scans off the persisted quantized table."""
    vq = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", _qvec().alias("q"))
        .persist()
    )
    first = vq.orderBy("vec_id").limit(1).collect()[0]
    seeds = [(1, int(first["vec_id"]), 0, list(first["q"]))]
    for rank in range(2, k + 1):
        dmin = None
        for _, _, _, sq in seeds:
            d = _dist2(F.col("q"), sq)
            dmin = d if dmin is None else F.least(dmin, d)
        far = (
            vq.select("vec_id", "q", dmin.alias("d"))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        seeds.append((rank, int(far["vec_id"]), int(far["d"]), list(far["q"])))
    vq.unpersist()
    return spark.createDataFrame(
        [(r, v, d) for r, v, d, _ in seeds],
        "seed_rank bigint, vec_id bigint, dist2 bigint",
    )


def sql_kcenter_seeds(k: int = KC_K) -> str:
    q = (
        "[CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "for e in embedding]"
    )

    def dist(a, b):
        return (
            f"list_aggregate([({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) "
            "for i in generate_series(1, 64)], 'sum')"
        )

    ctes = [
        f"vq AS (SELECT vec_id, {q} AS q FROM embeddings)",
        "s1 AS (SELECT vec_id, q FROM vq ORDER BY vec_id LIMIT 1)",
    ]
    selects = ["SELECT 1 AS seed_rank, vec_id, CAST(0 AS BIGINT) AS dist2 FROM s1"]
    for rank in range(2, k + 1):
        prior = ", ".join(f"s{i}" for i in range(1, rank))
        dmin = f"LEAST({', '.join(dist('v.q', f's{i}.q') for i in range(1, rank))})"
        ctes.append(
            f"""s{rank} AS (
  SELECT v.vec_id, v.q, CAST({dmin} AS BIGINT) AS d
  FROM vq v, {prior}
  ORDER BY {dmin} DESC, v.vec_id ASC LIMIT 1
)"""
        )
        selects.append(
            f"SELECT {rank} AS seed_rank, vec_id, d AS dist2 FROM s{rank}"
        )
    return (
        "\nWITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects) + "\n"
    )
