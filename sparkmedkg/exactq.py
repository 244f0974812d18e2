"""Exact integer-arithmetic quantiles over integral columns.

Why this exists: Spark ``percentile`` and DuckDB ``quantile_cont`` share the
same (n-1)*p linear-interpolation *definition*, but each engine folds the
``lo + frac*(hi-lo)`` float expression in its own order — a last-ulp
difference is enough to flip a boundary row's bucket when the cut feeds a
filter or a group assignment (the events_zonemap_prune hazard from the
round-3 advice, generalized).  Over an INTEGER domain the interpolated cut
is itself rational with a tiny denominator (``den`` = the probability
grid's denominator), so the whole computation can stay in bigints:

    h    = (n-1) * num / den          (num/den = the probability)
    k    = floor(h);  rem = (n-1)*num mod den
    cut  = x[k] + (rem/den) * (x[k+1] - x[k])
    cut_scaled = den*x[k] + rem*(x[k+1] - x[k])        -- exact bigint

and "value v sits above the cut" is exactly ``den*v > cut_scaled`` — the
SAME bucket assignment quantile_cont would produce under exact arithmetic,
decided by integer comparison in both engines.

Order statistics x[k] come from the VALUE HISTOGRAM (groupBy(col).count +
a cumulative count over the distinct values), never a global sort of the
corpus.  The cumulative count is a TWO-PHASE partial cumsum
(:func:`cumsum_by_value`): range-bucket the distinct values by integer
arithmetic over the broadcast min/max, cumsum within each bucket under a
partitioned window, then add per-bucket prefix offsets from a triangular
join over the <=64 bucket totals — no unpartitioned window anywhere, so
high-cardinality value domains (per-user monetary sums, probe scores)
stay partition-parallel instead of funneling through one task.  For
unbounded-cardinality columns quantizing to a coarser tick first still
shrinks the histogram shuffle, but is no longer required for the op to
scale.

The Spark helper returns a one-row DataFrame ``(cuts_scaled array<bigint>,
den bigint, n bigint)`` ordered by probability; ``sql_cuts_cte`` emits the
equivalent DuckDB CTE chain.  Both share the closed-form above, so the
scaled cuts are bit-identical across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket count for the two-phase cumulative sum.  64 buckets keeps the
#: per-bucket window comfortably parallel at local[32] and the bucket-
#: offset join trivially broadcastable; on a 1000-executor cluster the
#: histogram shuffle (groupBy v) dominates and the bucket count only
#: needs to exceed the executor count to avoid stragglers — raise via
#: the ``buckets`` argument if a caller ever feeds a histogram wide
#: enough to care.
CUM_BUCKETS = 64


def cumsum_by_value(
    hist: DataFrame,
    value_col: str = "v",
    cnt_col: str = "cnt",
    buckets: int = CUM_BUCKETS,
) -> DataFrame:
    """``hist(value, cnt) -> hist + cum`` where ``cum`` = running total of
    ``cnt`` in ascending ``value`` order — WITHOUT an unpartitioned
    window (VERDICT r4 task 2).

    Two-phase partial cumsum: (1) range-bucket the distinct values with
    order-preserving integer arithmetic over the broadcast min/max —
    ``b = (v - lo) div W`` with ``W = (hi - lo) div buckets + 1`` (no
    multiplication, so no bigint overflow at any domain width); (2)
    cumsum INSIDE each bucket under a PARTITIONED window; (3) add each
    bucket's prefix offset, computed by a triangular self-join over the
    <= ``buckets`` bucket totals (itself window-free).  No stage funnels
    more than |distinct values| / buckets rows through one task, so the
    op survives high-cardinality value domains that the old
    single-partition cumulative window serialized."""
    v, cnt = F.col(value_col), F.col(cnt_col)
    rng = hist.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    b = hist.crossJoin(F.broadcast(rng)).withColumn(
        "_b",
        F.expr(
            f"cast(div({value_col} - _lo,"
            f" div(_hi - _lo, {int(buckets)}) + 1) as int)"
        ),
    )
    w_in = Window.partitionBy("_b").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_in = b.withColumn("_cum_in", F.sum(cnt).over(w_in))
    btot = b.groupBy("_b").agg(F.sum(cnt).alias("_bt"))
    off = (
        btot.alias("a")
        .join(btot.alias("x"), F.col("x._b") < F.col("a._b"), "left")
        .groupBy(F.col("a._b").alias("_b"))
        .agg(F.coalesce(F.sum("x._bt"), F.lit(0)).cast("bigint").alias("_off"))
    )
    return (
        cum_in.join(F.broadcast(off), "_b")
        .select(
            value_col,
            cnt_col,
            (F.col("_cum_in") + F.col("_off")).alias("cum"),
        )
    )


def const_key(anchor) -> Column:
    """An always-0 partition key Catalyst CANNOT constant-fold:
    ``pmod(xxhash64(anchor), 1)``.  A foldable key (``F.lit(0)``) is
    optimized out of the partition spec, which reproduces the very
    unpartitioned-window execution the key exists to mark; hashing a
    real data column keeps the spec non-empty at a cost of one hash per
    row.  Null-safe: ``xxhash64(NULL)`` is the (non-null) seed, so every
    row—including nulls—lands in partition 0."""
    c = anchor if isinstance(anchor, Column) else F.col(anchor)
    return F.pmod(F.xxhash64(c), F.lit(1))


def bounded_window(anchor, *order_cols):
    """Single-partition ordered window with an EXPLICIT constant
    partition key — for inputs PROVABLY bounded by a constant, parameter
    or dimension (top-k outputs, decile/bucket tables, quantizer
    centroids, shard counts, count-of-count domains).  ``anchor`` is any
    data column of the input (fed to :func:`const_key`).  Execution is
    identical to an unpartitioned window (all rows in one partition),
    but the key states the intent: the single partition is a deliberate
    bounded design, so Spark's "No Partition Defined for Window" WARN
    stays reserved for genuine scale hazards instead of drowning them in
    known-bounded noise.  Every caller must state the bound in a
    call-site comment; unbounded inputs belong in
    :func:`cumsum_by_value` / :func:`global_row_number`.  With no
    ``order_cols`` this is the whole-frame (unordered) variant."""
    w = Window.partitionBy(const_key(anchor))
    return w.orderBy(*order_cols) if order_cols else w


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out: str = "rn",
    nparts: int = CUM_BUCKETS,
) -> DataFrame:
    """``df`` + a global 1-based ``row_number`` under ``order_cols``
    (which must be a TOTAL order — callers tie-break to a unique key)
    without funneling the input through one task.

    The scalable zipWithIndex idiom: range-repartition on the ordering,
    number within each range partition under a PARTITIONED window, then
    add per-partition prefix offsets via a triangular join over the
    <= ``nparts`` partition counts.  Partition boundaries never affect
    the result: the ordering is total, so every row's rank equals the
    number of rows preceding it under ANY boundary placement.  The
    numbering branch and the count branch share the single
    repartitionByRange exchange (Spark's ReuseExchange dedups the
    identical subtree), so both see one consistent partition
    assignment."""
    part = df.repartitionByRange(nparts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    numbered = part.withColumn("_rn_in", F.row_number().over(w_in))
    pcnt = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pc"))
    off = (
        pcnt.alias("a")
        .join(pcnt.alias("x"), F.col("x._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.coalesce(F.sum("x._pc"), F.lit(0)).cast("bigint").alias("_off")
        )
    )
    return (
        numbered.join(F.broadcast(off), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_rn_in")).cast("bigint"))
        .drop("_pid", "_rn_in", "_off")
    )


def quantile_cuts_scaled(
    df: DataFrame, col: str, nums: list[int], den: int
) -> DataFrame:
    """One-row DF: ``cuts_scaled`` = exact quantile_cont cuts at probs
    ``nums[i]/den`` over integral column ``col``, scaled by ``den``.

    The cumulative count over the value histogram is the two-phase
    :func:`cumsum_by_value` — partition-parallel even when |distinct
    values| approaches the corpus size, so the quantize-first fallback
    the round-3/4 docstrings prescribed for high-cardinality columns is
    no longer load-bearing (it remains a fine way to shrink the
    histogram shuffle)."""
    hist = df.groupBy(F.col(col).cast("bigint").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = cumsum_by_value(hist)
    tot = hist.agg(F.sum("cnt").alias("n"))
    nums_arr = F.array(*[F.lit(int(x)) for x in nums])
    # per prob: k = div((n-1)*num, den), rem = (n-1)*num mod den,
    # lo = x[k] = min v with cum >= k+1, hi = x[k+1] (falls back to lo at
    # the top edge), cut_scaled = den*lo + rem*(hi-lo)
    probs = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "v",
            "cum",
            "n",
            F.explode(nums_arr).alias("num"),
        )
        .withColumn("k", F.expr(f"div((n - 1) * num, {den})"))
        .withColumn("rem", F.expr(f"(n - 1) * num % {den}"))
    )
    per = probs.groupBy("num", "k", "rem", "n").agg(
        F.min(F.when(F.col("cum") >= F.col("k") + 1, F.col("v"))).alias(
            "lo"
        ),
        F.min(F.when(F.col("cum") >= F.col("k") + 2, F.col("v"))).alias(
            "hi_raw"
        ),
    )
    cut = per.select(
        "num",
        "n",
        (
            F.lit(den) * F.col("lo")
            + F.col("rem")
            * (F.coalesce(F.col("hi_raw"), F.col("lo")) - F.col("lo"))
        )
        .cast("bigint")
        .alias("cut_scaled"),
    )
    return cut.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("num", "cut_scaled"))
        ).alias("_ncs"),
        F.max("n").cast("bigint").alias("n"),
    ).select(
        F.transform(F.col("_ncs"), lambda s: s["cut_scaled"]).alias(
            "cuts_scaled"
        ),
        F.lit(int(den)).cast("bigint").alias("den"),
        "n",
    )


def bucket_expr(
    value_col: Column | str, den: int, reverse: bool = False
) -> Column:
    """Bucket assignment against a joined ``cuts_scaled`` column:
    1 + #{cuts strictly below den*value} (or strictly above when
    ``reverse`` — bucket 1 = largest values).  All-bigint comparisons."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    scaled = v.cast("bigint") * F.lit(int(den))
    if reverse:
        pred = lambda c: scaled < c  # noqa: E731
    else:
        pred = lambda c: scaled > c  # noqa: E731
    return F.lit(1) + F.aggregate(
        F.col("cuts_scaled"),
        F.lit(0),
        lambda acc, c: acc + F.when(pred(c), 1).otherwise(0),
    )


def sql_cuts_cte(
    src: str, col: str, nums: list[int], den: int, prefix: str = "qc"
) -> str:
    """DuckDB CTE chain computing the same scaled cuts from CTE ``src``.

    Exposes ``{prefix}_cuts(cuts_scaled)`` — a one-row LIST(BIGINT) in
    probability order.  Bucket tests compare ``{den}*v`` against the
    elements, mirroring :func:`bucket_expr`."""
    nums_sql = ", ".join(str(int(x)) for x in nums)
    return f"""{prefix}_hist AS (
  SELECT CAST({col} AS BIGINT) AS v, COUNT(*) AS cnt FROM {src} GROUP BY 1
),
{prefix}_cum AS (
  SELECT v, cnt,
         SUM(cnt) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM {prefix}_hist
),
{prefix}_tot AS (SELECT SUM(cnt) AS n FROM {prefix}_hist),
{prefix}_per AS (
  SELECT g.num,
         MIN(CASE WHEN c.cum >= ((t.n - 1) * g.num) // {den} + 1
                  THEN c.v END) AS lo,
         MIN(CASE WHEN c.cum >= ((t.n - 1) * g.num) // {den} + 2
                  THEN c.v END) AS hi_raw,
         MAX((t.n - 1) * g.num % {den}) AS rem
  FROM {prefix}_cum c
  CROSS JOIN {prefix}_tot t
  CROSS JOIN LATERAL UNNEST([{nums_sql}]) AS g(num)
  GROUP BY g.num
),
{prefix}_cuts AS (
  SELECT list(
           CAST({den} * lo + rem * (COALESCE(hi_raw, lo) - lo) AS BIGINT)
           ORDER BY num
         ) AS cuts_scaled
  FROM {prefix}_per
)"""


def grouped_quantile_cuts_scaled(
    df: DataFrame, key: str, col: str, nums: list[int], den: int
) -> DataFrame:
    """Per-group variant: ``(key, cuts_scaled array<bigint>, n bigint)``.

    Same closed form as :func:`quantile_cuts_scaled`, with the histogram
    keyed by ``key`` and the cumulative window PARTITIONED by it — each
    group's window spans only its own distinct values, so the op is
    partition-parallel across groups."""
    hist = df.groupBy(
        F.col(key).alias("_k"), F.col(col).cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("_k").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum))
    tot = hist.groupBy("_k").agg(F.sum("cnt").alias("n"))
    nums_arr = F.array(*[F.lit(int(x)) for x in nums])
    probs = (
        cum.join(tot, "_k")
        .select("_k", "v", "cum", "n", F.explode(nums_arr).alias("num"))
        .withColumn("k", F.expr(f"div((n - 1) * num, {den})"))
        .withColumn("rem", F.expr(f"(n - 1) * num % {den}"))
    )
    per = probs.groupBy("_k", "num", "k", "rem", "n").agg(
        F.min(F.when(F.col("cum") >= F.col("k") + 1, F.col("v"))).alias(
            "lo"
        ),
        F.min(F.when(F.col("cum") >= F.col("k") + 2, F.col("v"))).alias(
            "hi_raw"
        ),
    )
    cut = per.select(
        "_k",
        "num",
        "n",
        (
            F.lit(den) * F.col("lo")
            + F.col("rem")
            * (F.coalesce(F.col("hi_raw"), F.col("lo")) - F.col("lo"))
        )
        .cast("bigint")
        .alias("cut_scaled"),
    )
    return (
        cut.groupBy("_k")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("num", "cut_scaled"))
            ).alias("_ncs"),
            F.max("n").cast("bigint").alias("n"),
        )
        .select(
            F.col("_k").alias(key),
            F.transform(F.col("_ncs"), lambda s: s["cut_scaled"]).alias(
                "cuts_scaled"
            ),
            "n",
        )
    )


def sql_grouped_cuts_cte(
    src: str, key: str, col: str, nums: list[int], den: int,
    prefix: str = "gqc",
) -> str:
    """DuckDB CTE chain for :func:`grouped_quantile_cuts_scaled` —
    exposes ``{prefix}_cuts({key}, cuts_scaled, n)``."""
    nums_sql = ", ".join(str(int(x)) for x in nums)
    return f"""{prefix}_hist AS (
  SELECT {key} AS _k, CAST({col} AS BIGINT) AS v, COUNT(*) AS cnt
  FROM {src} GROUP BY 1, 2
),
{prefix}_cum AS (
  SELECT _k, v, cnt,
         SUM(cnt) OVER (PARTITION BY _k ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM {prefix}_hist
),
{prefix}_tot AS (SELECT _k, SUM(cnt) AS n FROM {prefix}_hist GROUP BY 1),
{prefix}_per AS (
  SELECT c._k, g.num, MAX(t.n) AS n,
         MIN(CASE WHEN c.cum >= ((t.n - 1) * g.num) // {den} + 1
                  THEN c.v END) AS lo,
         MIN(CASE WHEN c.cum >= ((t.n - 1) * g.num) // {den} + 2
                  THEN c.v END) AS hi_raw,
         MAX((t.n - 1) * g.num % {den}) AS rem
  FROM {prefix}_cum c
  JOIN {prefix}_tot t ON t._k = c._k
  CROSS JOIN LATERAL UNNEST([{nums_sql}]) AS g(num)
  GROUP BY c._k, g.num
),
{prefix}_cuts AS (
  SELECT _k AS {key},
         list(
           CAST({den} * lo + rem * (COALESCE(hi_raw, lo) - lo) AS BIGINT)
           ORDER BY num
         ) AS cuts_scaled,
         MAX(n) AS n
  FROM {prefix}_per
  GROUP BY _k
)"""
