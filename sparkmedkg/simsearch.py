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

from pyspark.sql import Column, DataFrame, SparkSession
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
