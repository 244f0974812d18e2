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
