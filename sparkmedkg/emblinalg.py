"""Distributed linear algebra over the embeddings table: gram matrix +
power iteration for the dominant principal direction.

The classic "tall-skinny" decomposition split: the O(n) work (the d x d
gram matrix G = sum_rows q q^T) is one distributed aggregation over the
corpus; the O(d^2)-sized iteration (power method on G) then runs over a
4096-row DataFrame — the corpus is scanned exactly once no matter how
many iterations run.

Cross-engine determinism: embeddings are quantized to integers
(round(x * QUANT)), so the gram sums, the mat-vec products, and the
max-renormalization are ALL exact BIGINT arithmetic — no float
accumulation order anywhere (the same integer-quantization discipline as
simsearch's int8 path and textstats' ppm counters).  The only floats are
final display columns derived from exact integers.

Scale notes (10^9+ vectors, d = 64):
- The gram explode emits d^2 = 4096 (i, j, qi*qj) terms per row, but
  map-side partial aggregation collapses every task to <= 4096 rows
  before the shuffle — the exchange moves O(tasks * d^2), not O(n * d^2).
  If scan-side CPU ever dominates at extreme n, the drop-in replacement
  is a blocked matmul in mapInPandas (numpy q_block.T @ q_block per Arrow
  batch) feeding the same (i, j, g) aggregate — the plan shape and
  everything downstream are unchanged.
- Overflow is bounded by construction: after the deterministic
  shift-normalization of G (divide by 2^shift so max|g| < 2^GRAM_BITS),
  a mat-vec term is < 2^(GRAM_BITS + 11) and the d-term sum is
  < 2^(GRAM_BITS + 17) — far inside BIGINT at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUANT = 1024          # embedding quantization scale (2^10)
PCA_ITERS = 2         # unrolled power-iteration steps
GRAM_BITS = 20        # post-shift bound: max|g| < 2^GRAM_BITS


def _gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, g): exact integer gram matrix of the quantized embeddings,
    0-based indices, g = sum_rows round(x_i*Q)*round(x_j*Q)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.expr(
        f"transform(embedding, x -> CAST(round(x * {QUANT}) AS BIGINT))"
    ).alias("q")
    e1 = emb.select(q).select(
        "q", F.posexplode("q").alias("i", "qi")
    )
    e2 = e1.select("i", "qi", F.posexplode("q").alias("j", "qj"))
    return e2.groupBy("i", "j").agg(
        F.sum(F.col("qi") * F.col("qj")).alias("g")
    )


def pca_power(
    spark: SparkSession, sf_dir: str, iters: int = PCA_ITERS
) -> DataFrame:
    """(i, v): the dominant principal direction of the embedding corpus
    after ``iters`` power-iteration steps from the all-ones vector,
    QUANT-scaled integer components (v in [-QUANT, QUANT], exact).

    Per step: u = G_hat . v as one (j-key join + i-grouped BIGINT sum)
    over the 4096-row gram, then max-renormalize back to QUANT scale with
    sign-split truncating division (floor-div of the non-negative
    magnitude — identical semantics in Spark and DuckDB, dodging their
    different negative-division conventions)."""
    g = _gram(spark, sf_dir)
    # deterministic shift-normalization: g_hat = sign(g)*(|g| div 2^shift)
    # with shift chosen so max|g_hat| < 2^GRAM_BITS.  floor(log2(double))
    # of a BIGINT is engine-identical (IEEE conversion + exact log2 range).
    gmax = g.agg(F.max(F.abs(F.col("g"))).alias("gmax"))
    shift_pow = F.pow(
        F.lit(2.0),
        F.greatest(
            F.lit(0.0),
            F.floor(F.log2(F.col("gmax").cast("double")))
            - F.lit(GRAM_BITS - 1),
        ),
    ).cast("bigint")
    g = (
        g.join(F.broadcast(gmax))
        .select(
            "i",
            "j",
            (
                F.signum(F.col("g")).cast("bigint")
                * F.floor(F.abs(F.col("g")) / shift_pow).cast("bigint")
            ).alias("g"),
        )
        .localCheckpoint(eager=True)
    )
    v = g.select(F.col("i").alias("vi")).distinct().select(
        "vi", F.lit(QUANT).cast("bigint").alias("v")
    )
    for _ in range(iters):
        u = (
            g.join(v, g["j"] == v["vi"])
            .groupBy(g["i"].alias("ui"))
            .agg(F.sum(F.col("g") * F.col("v")).alias("u"))
        )
        umax = u.agg(
            F.greatest(F.max(F.abs(F.col("u"))), F.lit(1).cast("bigint")
                       ).alias("umax")
        )
        v = (
            u.join(F.broadcast(umax))
            .select(
                F.col("ui").alias("vi"),
                (
                    F.signum(F.col("u")).cast("bigint")
                    * F.floor(
                        F.abs(F.col("u")) * QUANT / F.col("umax")
                    ).cast("bigint")
                ).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return v.select(F.col("vi").alias("i"), "v")


def sql_pca_power(iters: int = PCA_ITERS) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""u{k} AS (
  SELECT g.i AS vi, CAST(SUM(g.g * v.v) AS BIGINT) AS u
  FROM ghat g JOIN v{k - 1} v ON v.vi = g.j
  GROUP BY g.i
),
umax{k} AS (
  SELECT GREATEST(MAX(ABS(u)), 1) AS umax FROM u{k}
),
v{k} AS MATERIALIZED (
  SELECT vi,
         CAST(CASE WHEN u < 0 THEN -1 WHEN u > 0 THEN 1 ELSE 0 END
              * FLOOR(ABS(u) * {QUANT} / umax) AS BIGINT) AS v
  FROM u{k}, umax{k}
)"""
        )
    return f"""
WITH q AS (
  SELECT list_transform(embedding,
                        x -> CAST(round(x * {QUANT}) AS BIGINT)) AS q
  FROM embeddings
),
expl AS (
  SELECT generate_subscripts(q, 1) - 1 AS i, unnest(q) AS qi, q FROM q
),
gram AS MATERIALIZED (
  SELECT e.i, r.j, CAST(SUM(e.qi * e.q[r.j + 1]) AS BIGINT) AS g
  FROM expl e, (SELECT unnest(range(len((SELECT q FROM q LIMIT 1)))) AS j) r
  GROUP BY e.i, r.j
),
gmax AS (SELECT MAX(ABS(g)) AS gmax FROM gram),
shift AS (
  SELECT CAST(pow(2.0, GREATEST(0.0,
              FLOOR(log2(CAST(gmax AS DOUBLE))) - {GRAM_BITS - 1}))
         AS BIGINT) AS s
  FROM gmax
),
ghat AS MATERIALIZED (
  SELECT i, j,
         CAST(CASE WHEN g < 0 THEN -1 WHEN g > 0 THEN 1 ELSE 0 END
              * FLOOR(ABS(g) / s) AS BIGINT) AS g
  FROM gram, shift
),
v0 AS (SELECT DISTINCT i AS vi, CAST({QUANT} AS BIGINT) AS v FROM ghat),
{",".join(steps)}
SELECT vi AS i, v FROM v{iters}
"""
