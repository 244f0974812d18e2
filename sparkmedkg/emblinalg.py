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

from sparkmedkg import exactq

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


# ---------------------------------------------------------------------------
# Dimension-correlation matrix (one-pass moments, exact integer sums).
# ---------------------------------------------------------------------------

CORR_TOP_K = 20


def dim_corr_top(
    spark: SparkSession, sf_dir: str, k: int = CORR_TOP_K
) -> DataFrame:
    """(i, j, corr): the k most-correlated embedding-dimension pairs
    (i < j, Pearson, 6dp) — the feature-redundancy report a training
    pipeline runs before deciding whether dimensions can be truncated
    (cheap complement to the Matryoshka recall probe).

    All moments (n, per-dim sums, cross sums) are exact BIGINT
    aggregates, so both engines see bit-identical integers; corr is then
    ONE double expression over those exact integers (no accumulation
    order), identical in Spark and DuckDB.  Scale: same single-scan
    d^2-bounded shuffle as the gram (module docstring); everything after
    the scan is d^2 = 4096 rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    q = F.expr(
        f"transform(embedding, x -> CAST(round(x * {QUANT}) AS BIGINT))"
    ).alias("q")
    sums = (
        emb.select(q)
        .select(F.posexplode("q").alias("i", "qi"))
        .groupBy("i")
        .agg(F.sum("qi").alias("s"), F.sum(F.col("qi") * F.col("qi")).alias("ss"))
    )
    g = _gram(spark, sf_dir).where(F.col("i") < F.col("j"))
    si = sums.select(F.col("i").alias("gi"), F.col("s").alias("si"),
                     F.col("ss").alias("sii"))
    sj = sums.select(F.col("i").alias("gj"), F.col("s").alias("sj"),
                     F.col("ss").alias("sjj"))
    vi = (F.col("n") * F.col("sii") - F.col("si") * F.col("si")).cast("double")
    vj = (F.col("n") * F.col("sjj") - F.col("sj") * F.col("sj")).cast("double")
    num = (F.col("n") * F.col("g") - F.col("si") * F.col("sj")).cast("double")
    return (
        g.join(F.broadcast(si), F.col("i") == F.col("gi"))
        .join(F.broadcast(sj), F.col("j") == F.col("gj"))
        .join(F.broadcast(n))
        .where((vi > 0) & (vj > 0))
        .select("i", "j",
                F.round(num / F.sqrt(vi * vj), 6).alias("corr"))
        .orderBy(F.abs(F.col("corr")).desc(), "i", "j")
        .limit(k)
    )


def sql_dim_corr_top(k: int = CORR_TOP_K) -> str:
    return f"""
WITH q AS (
  SELECT list_transform(embedding,
                        x -> CAST(round(x * {QUANT}) AS BIGINT)) AS q
  FROM embeddings
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
expl AS (
  SELECT generate_subscripts(q, 1) - 1 AS i, unnest(q) AS qi, q FROM q
),
sums AS MATERIALIZED (
  SELECT i, CAST(SUM(qi) AS BIGINT) AS s,
         CAST(SUM(qi * qi) AS BIGINT) AS ss
  FROM expl GROUP BY i
),
gram AS (
  SELECT e.i, r.j, CAST(SUM(e.qi * e.q[r.j + 1]) AS BIGINT) AS g
  FROM expl e, (SELECT unnest(range(len((SELECT q FROM q LIMIT 1)))) AS j) r
  WHERE e.i < r.j
  GROUP BY e.i, r.j
)
SELECT gram.i, gram.j,
       round(CAST(n.n * gram.g - si.s * sj.s AS DOUBLE)
             / sqrt(CAST(n.n * si.ss - si.s * si.s AS DOUBLE)
                    * CAST(n.n * sj.ss - sj.s * sj.s AS DOUBLE)), 6) AS corr
FROM gram
JOIN sums si ON si.i = gram.i
JOIN sums sj ON sj.i = gram.j
CROSS JOIN n
WHERE n.n * si.ss - si.s * si.s > 0
  AND n.n * sj.ss - sj.s * sj.s > 0
ORDER BY abs(round(CAST(n.n * gram.g - si.s * sj.s AS DOUBLE)
             / sqrt(CAST(n.n * si.ss - si.s * si.s AS DOUBLE)
                    * CAST(n.n * sj.ss - sj.s * sj.s AS DOUBLE)), 6)) DESC,
         gram.i, gram.j
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Linear probe: integer gradient descent on the normal equations.
# ---------------------------------------------------------------------------

PROBE_ITERS = 2       # unrolled GD steps
PROBE_W = 1 << 20     # fixed-point scale of the weight vector


def linear_probe(
    spark: SparkSession, sf_dir: str, iters: int = PROBE_ITERS
) -> DataFrame:
    """(i, w): weights of a least-squares linear probe label ~ X after
    ``iters`` full-batch gradient-descent steps from w = 0, PROBE_W-scaled
    fixed-point integers — the standard "is this signal linearly
    decodable from the embeddings" diagnostic, run the tall-skinny way:
    the corpus is scanned ONCE (gram G = X^T X and moment b = X^T y are
    one distributed aggregate each); every GD step then touches only the
    4096-row G and two 64-row vectors.

    The step size is 1/R with R = max row-sum of |G_hat| (Gershgorin
    bound on the top eigenvalue), so the iteration is non-divergent by
    construction; every multiply/divide is exact BIGINT with sign-split
    truncating division — bit-identical across engines, same discipline
    as pca_power."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.expr(
        f"transform(embedding, x -> CAST(round(x * {QUANT}) AS BIGINT))"
    ).alias("q")
    g = _gram(spark, sf_dir)
    b = (
        emb.select(q, F.col("label").cast("bigint").alias("y"))
        .select(F.posexplode("q").alias("i", "qi"), "y")
        .groupBy("i")
        .agg(F.sum(F.col("qi") * F.col("y")).alias("b"))
    )
    gmax = g.agg(F.max(F.abs(F.col("g"))).alias("gmax"))
    shift_pow = F.pow(
        F.lit(2.0),
        F.greatest(
            F.lit(0.0),
            F.floor(F.log2(F.col("gmax").cast("double")))
            - F.lit(GRAM_BITS - 1),
        ),
    ).cast("bigint")
    tdiv = lambda x, d: (  # noqa: E731 — sign-split truncating division
        F.signum(x).cast("bigint")
        * F.floor(F.abs(x) / d).cast("bigint")
    )
    g = (
        g.join(F.broadcast(gmax))
        .select("i", "j", tdiv(F.col("g"), shift_pow).alias("g"))
        .localCheckpoint(eager=True)
    )
    b = (
        b.join(F.broadcast(gmax))
        .select(F.col("i").alias("bi"), tdiv(F.col("b"), shift_pow).alias("b"))
        .localCheckpoint(eager=True)
    )
    r_row = g.groupBy("i").agg(
        F.sum(F.abs(F.col("g"))).alias("rs")
    ).agg(F.greatest(F.max("rs"), F.lit(1).cast("bigint")).alias("r"))
    w = b.select(F.col("bi").alias("wi"), F.lit(0).cast("bigint").alias("w"))
    for _ in range(iters):
        gw = (
            g.join(w, g["j"] == w["wi"])
            .groupBy(g["i"].alias("gi"))
            .agg(F.sum(F.col("g") * F.col("w")).alias("gw"))
        )
        resid = (
            b.join(gw, F.col("bi") == F.col("gi"))
            .select(
                "bi",
                (F.col("b") * F.lit(PROBE_W).cast("bigint")
                 - F.col("gw")).alias("res"),
            )
        )
        w = (
            w.join(resid, F.col("wi") == F.col("bi"))
            .join(F.broadcast(r_row))
            .select(
                "wi",
                (F.col("w") + tdiv(F.col("res"), F.col("r"))).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return w.select(F.col("wi").alias("i"), "w")


def sql_linear_probe(iters: int = PROBE_ITERS) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""gw{k} AS (
  SELECT g.i AS gi, CAST(SUM(g.g * w.w) AS BIGINT) AS gw
  FROM ghat g JOIN w{k - 1} w ON w.wi = g.j
  GROUP BY g.i
),
w{k} AS MATERIALIZED (
  SELECT w.wi,
         CAST(w.w + CASE WHEN b.b * {PROBE_W} - gw.gw < 0 THEN -1
                         WHEN b.b * {PROBE_W} - gw.gw > 0 THEN 1
                         ELSE 0 END
                    * FLOOR(ABS(b.b * {PROBE_W} - gw.gw) / r.r)
              AS BIGINT) AS w
  FROM w{k - 1} w
  JOIN bhat b ON b.bi = w.wi
  JOIN gw{k} gw ON gw.gi = w.wi
  CROSS JOIN rbound r
)"""
        )
    return f"""
WITH q AS (
  SELECT list_transform(embedding,
                        x -> CAST(round(x * {QUANT}) AS BIGINT)) AS q,
         CAST(label AS BIGINT) AS y
  FROM embeddings
),
expl AS (
  SELECT generate_subscripts(q, 1) - 1 AS i, unnest(q) AS qi, q, y FROM q
),
gram AS MATERIALIZED (
  SELECT e.i, r.j, CAST(SUM(e.qi * e.q[r.j + 1]) AS BIGINT) AS g
  FROM expl e, (SELECT unnest(range(len((SELECT q FROM q LIMIT 1)))) AS j) r
  GROUP BY e.i, r.j
),
braw AS (
  SELECT i, CAST(SUM(qi * y) AS BIGINT) AS b FROM expl GROUP BY i
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
bhat AS MATERIALIZED (
  SELECT i AS bi,
         CAST(CASE WHEN b < 0 THEN -1 WHEN b > 0 THEN 1 ELSE 0 END
              * FLOOR(ABS(b) / s) AS BIGINT) AS b
  FROM braw, shift
),
rbound AS (
  SELECT CAST(GREATEST(MAX(rs), 1) AS BIGINT) AS r
  FROM (SELECT i, SUM(ABS(g)) AS rs FROM ghat GROUP BY i)
),
w0 AS (SELECT bi AS wi, CAST(0 AS BIGINT) AS w FROM bhat),
{",".join(steps)}
SELECT wi AS i, w FROM w{iters}
"""


# ---------------------------------------------------------------------------
# Embedding-distribution drift between two cohorts (centroid shift).
# ---------------------------------------------------------------------------

def centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_a, n_b, cosine, top_dim, top_drift): drift check between two
    embedding cohorts (vec_id parity standing in for old-batch vs
    new-batch) — the cosine between cohort centroids plus the single most
    drifted dimension.  The canary a feature store runs when the upstream
    encoder is re-deployed: cosine ~1 means distributionally stable,
    and the top-drift dimension localizes a regression.

    All per-dimension sums are exact BIGINT aggregates over quantized
    elements (the dim_corr_top idiom); the centroid cosine is ONE double
    expression over those integers, and the drift argmax compares the
    cross-multiplied integers sa*n_b - sb*n_a so ties and ordering are
    exact.  Scale: one scan, one d-bounded shuffle; everything after is
    64 rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.expr(
        f"transform(embedding, x -> CAST(round(x * {QUANT}) AS BIGINT))"
    ).alias("q")
    grp = (F.col("vec_id") % 2).alias("grp")
    ex = emb.select(grp, q).select(
        "grp", F.posexplode("q").alias("dim", "qv")
    )
    sums = ex.groupBy("grp", "dim").agg(F.sum("qv").alias("s"))
    counts = emb.groupBy((F.col("vec_id") % 2).alias("grp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = sums.where(F.col("grp") == 0).select("dim", F.col("s").alias("sa"))
    b = sums.where(F.col("grp") == 1).select("dim", F.col("s").alias("sb"))
    na = counts.where(F.col("grp") == 0).select(F.col("n").alias("n_a"))
    nb = counts.where(F.col("grp") == 1).select(F.col("n").alias("n_b"))
    j = (
        a.join(b, "dim")
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    # integer cross-multiplied drift: |sa/n_a - sb/n_b| ~ |sa*n_b - sb*n_a|
    drift = F.abs(F.col("sa") * F.col("n_b") - F.col("sb") * F.col("n_a"))
    # single-BIGINT argmax key: drift * 64 + (63 - dim) — exact integer
    # ordering with deterministic smallest-dim tie-break (DuckDB's max_by
    # takes scalar keys only, so both engines use the same encoding)
    key_sql = "abs(sa * n_b - sb * n_a) * 64 + (63 - dim)"
    agg = j.agg(
        F.min("n_a").alias("n_a"),
        F.min("n_b").alias("n_b"),
        F.sum(F.col("sa") * F.col("sb")).alias("dot"),
        F.sum(F.col("sa") * F.col("sa")).alias("aa"),
        F.sum(F.col("sb") * F.col("sb")).alias("bb"),
        F.expr(f"max_by(dim, {key_sql})").alias("top_dim"),
        F.max(drift).alias("top_drift"),
    )
    cos = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("aa").cast("double"))
            * F.sqrt(F.col("bb").cast("double"))
        ),
        6,
    )
    return agg.select(
        "n_a", "n_b", cos.alias("cosine"), "top_dim", "top_drift"
    )


def sql_centroid_drift() -> str:
    return f"""
WITH q AS (
  SELECT vec_id % 2 AS grp,
         unnest(list_transform(embedding,
                               x -> CAST(round(x * {QUANT}) AS BIGINT)))
           AS qv,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
),
sums AS (SELECT grp, dim, CAST(SUM(qv) AS BIGINT) AS s
         FROM q GROUP BY grp, dim),
counts AS (SELECT vec_id % 2 AS grp, COUNT(*) AS n
           FROM embeddings GROUP BY vec_id % 2),
j AS (
  SELECT a.dim, a.s AS sa, b.s AS sb,
         (SELECT n FROM counts WHERE grp = 0) AS n_a,
         (SELECT n FROM counts WHERE grp = 1) AS n_b
  FROM sums a JOIN sums b ON a.dim = b.dim AND a.grp = 0 AND b.grp = 1
)
SELECT MIN(n_a) AS n_a, MIN(n_b) AS n_b,
       round(CAST(SUM(sa * sb) AS DOUBLE)
             / (sqrt(CAST(SUM(sa * sa) AS DOUBLE))
                * sqrt(CAST(SUM(sb * sb) AS DOUBLE))), 6) AS cosine,
       CAST(max_by(dim, abs(sa * n_b - sb * n_a) * 64 + (63 - dim))
            AS INTEGER) AS top_dim,
       CAST(MAX(abs(sa * n_b - sb * n_a)) AS BIGINT) AS top_drift
FROM j
"""


# ---------------------------------------------------------------------------
# Probe calibration (reliability diagram over score deciles).
# ---------------------------------------------------------------------------

CAL_PPM = 1_000_000


def probe_calibration(
    spark: SparkSession, sf_dir: str, iters: int = PROBE_ITERS
) -> DataFrame:
    """(decile, n, n_pos, pos_rate_ppm, avg_score): the reliability
    diagram of the linear probe as a binary detector of label==1 —
    corpus vectors bucketed by exact probe-score decile, each bucket's
    empirical positive rate next to its average score.  Monotone buckets
    = the probe's scores are usable as a ranking signal; a flat diagram
    means the 'linearly decodable' claim doesn't survive calibration.
    The standard ML-ops check before any score threshold ships.

    Composes linear_probe's exact-integer weights: per-vector score is
    ONE fused BIGINT dot (posexplode + broadcast 64-row weight join,
    partial-agg keyed on vec_id); decile cutpoints are one aggregate row
    broadcast back (quality_deciles' no-global-sort pattern — ntile
    would collapse the corpus into one window partition); the positive
    rate is integer-exact PPM."""
    w = linear_probe(spark, sf_dir, iters)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.expr(
        f"transform(embedding, x -> CAST(round(x * {QUANT}) AS BIGINT))"
    )
    scored = (
        emb.select("vec_id", "label", F.posexplode(q).alias("i", "qi"))
        .join(F.broadcast(w), "i")
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("qi") * F.col("w")).cast("bigint").alias("s"))
    )
    # integer-exact decile cuts over the BIGINT scores (exactq) — the
    # previous double-cast percentile was a cross-engine ulp seam
    cuts = exactq.quantile_cuts_scaled(
        scored, "s", list(range(1, 10)), 10
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "s", "label", exactq.bucket_expr("s", 10).alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            F.avg(F.col("s").cast("double")).alias("_avg"),
        )
        .select(
            "decile",
            "n",
            "n_pos",
            F.expr(f"(n_pos * {CAL_PPM}) div n").cast("bigint")
            .alias("pos_rate_ppm"),
            F.round("_avg", 3).alias("avg_score"),
        )
    )


def sql_probe_calibration(iters: int = PROBE_ITERS) -> str:
    return f"""
WITH w AS ({sql_linear_probe(iters)}),
scored AS (
  SELECT e.vec_id, e.label,
         CAST(SUM(CAST(round(e.embedding[w.i + 1] * {QUANT}) AS BIGINT)
                  * w.w) AS BIGINT) AS s
  FROM embeddings e, w
  GROUP BY e.vec_id, e.label
),
{exactq.sql_cuts_cte("scored", "s", list(range(1, 10)), 10)},
dec AS (
  SELECT s, label,
         1 + len(list_filter(cuts_scaled, c -> 10 * s > c)) AS decile
  FROM scored CROSS JOIN qc_cuts
)
SELECT decile, COUNT(*) AS n,
       CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
            * {CAL_PPM} // COUNT(*) AS BIGINT) AS pos_rate_ppm,
       round(AVG(s::DOUBLE), 3) AS avg_score
FROM dec GROUP BY decile
"""
