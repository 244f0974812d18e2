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
one cumulative window over the distinct values), never a global sort of
the corpus.  The window is |distinct values|-sized: genuinely bounded for
counts / cents / micro-unit scores, but value-count-sized for
high-cardinality measures (per-user monetary sums, probe scores) — the
SAME driver-side bound Spark's exact ``percentile`` aggregate already
imposes via its sorted buffer, so no call site regresses; at unbounded
cardinality quantize the column to a coarser tick first or swap to
``approx_percentile`` (t-digest), accepting its approximation in both
engines.

The Spark helper returns a one-row DataFrame ``(cuts_scaled array<bigint>,
den bigint, n bigint)`` ordered by probability; ``sql_cuts_cte`` emits the
equivalent DuckDB CTE chain.  Both share the closed-form above, so the
scaled cuts are bit-identical across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantile_cuts_scaled(
    df: DataFrame, col: str, nums: list[int], den: int
) -> DataFrame:
    """One-row DF: ``cuts_scaled`` = exact quantile_cont cuts at probs
    ``nums[i]/den`` over integral column ``col``, scaled by ``den``.

    The cumulative window runs over the value histogram (|distinct
    values| rows) — bounded by the value domain, not the corpus."""
    hist = df.groupBy(F.col(col).cast("bigint").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum))
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
