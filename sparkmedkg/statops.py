"""Statistical audit operators over the ``events`` stream.

Benford first-digit conformance, the Pettitt rank change-point test and
series autocorrelation — the distribution-shift / data-quality monitors a
metrics platform runs per series.  Reference parity note: the reference
app (pymedgraph) has no time-series layer; these extend the engine the
same way the CUSUM / seasonality family in relops.py does, following the
repo-wide exact-integer determinism contract (CUSUM at relops.py:3121).

Every statistic is accumulated in exact BIGINT arithmetic (values are
integerized per-row BEFORE any aggregate; means enter as integer
cross-multiplication), so partial-aggregation order cannot perturb
results and the DuckDB oracles match bit-for-bit.  The only doubles are
final display ratios derived from exact integers < 2^53 and rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

V_SCALE = 1_000          # event values integerized to millis
HOUR_US = 3_600_000_000  # epoch-us per hour — integer bucketing, tz-proof
ACF_LAGS = 5

# round(1e6 * log10(1 + 1/d)) precomputed as shared literals: neither
# engine ever evaluates a log, so Benford expectations are constants.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# Benford first-digit conformance audit.
# ---------------------------------------------------------------------------

def events_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, digit, n_obs, freq_ppm, benford_ppm, excess_ppm):
    first-significant-digit distribution of positive event values per
    series vs the Benford expectation — the standard fabricated-data /
    feed-corruption screen for financial-style streams.

    Determinism: values integerize to cents per-row; the first digit is
    read off the BIGINT's decimal string (identical in both engines);
    observed frequency is exact integer floor-division to ppm; the
    Benford column is a shared precomputed literal (no engine log call).

    Plan: one (event_type, digit) partial-aggregated shuffle; the
    per-type total rides a window over the <= 9-rows-per-type aggregate
    (never the raw log).  Map-side combinable end to end."""
    cents = F.round(F.col("value") * 100).cast("bigint")
    obs = (
        _ev(spark, sf_dir)
        .select("event_type", cents.alias("cents"))
        .where(F.col("cents") > 0)
        .select(
            "event_type",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit"),
        )
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    w = Window.partitionBy("event_type")
    ben = F.create_map(
        *[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]
    )
    return obs.select(
        "event_type",
        "digit",
        "n_obs",
        F.expr("div(1000000 * n_obs, sum(n_obs) over "
               "(partition by event_type))").alias("freq_ppm"),
        ben[F.col("digit")].cast("bigint").alias("benford_ppm"),
        (
            F.expr("div(1000000 * n_obs, sum(n_obs) over "
                   "(partition by event_type))")
            - ben[F.col("digit")].cast("bigint")
        ).alias("excess_ppm"),
    )


def sql_events_benford() -> str:
    ben = " ".join(f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items())
    return f"""
WITH obs AS (
  SELECT event_type,
         CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         COUNT(*) AS n_obs
  FROM (SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events)
  WHERE cents > 0
  GROUP BY 1, 2
)
SELECT event_type, digit, n_obs,
       CAST((1000000 * n_obs) // SUM(n_obs) OVER (PARTITION BY event_type)
            AS BIGINT) AS freq_ppm,
       CAST(CASE digit {ben} END AS BIGINT) AS benford_ppm,
       CAST((1000000 * n_obs) // SUM(n_obs) OVER (PARTITION BY event_type)
            AS BIGINT)
         - CAST(CASE digit {ben} END AS BIGINT) AS excess_ppm
FROM obs
"""


# ---------------------------------------------------------------------------
# Pettitt rank change-point test.
# ---------------------------------------------------------------------------

def events_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, k_stat, at_ts_us, n_events): the Pettitt change-point
    statistic per series — K = max_t |U_t| with U_t = sum_{i<=t} 2*r_i -
    t*(n+1) over average ranks r_i of the time-ordered values, locating
    the most likely single shift in distribution.  Rank-based, so (unlike
    CUSUM) it is robust to heavy tails and needs no mean estimate.

    Determinism: with doubled average ranks R2_i = 2*min_rank + ties - 1
    (always integral), U_t = sum_{i<=t} R2_i - t*(n+1) is exact BIGINT
    throughout; the scan order (ts_us, event_id) is total; the peak
    locator is an integer argmax resolved by a max-join.

    Plan: two window sorts per series partition (one by value for ranks,
    one by time for the prefix sum) — the same per-type-sort budget as
    events_cusum; the peak join touches |types| rows."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * V_SCALE).cast("bigint").alias("v"),
    )
    wv = Window.partitionBy("event_type").orderBy("v")
    wt = Window.partitionBy("event_type", "v")
    ranked = ev.select(
        "event_type",
        "event_id",
        "ts_us",
        (2 * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - 1).alias("r2"),
    )
    ws = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    n = F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    scan = ranked.select(
        "event_type",
        "ts_us",
        n.alias("n"),
        (
            F.sum("r2").over(ws.rowsBetween(Window.unboundedPreceding, 0))
            - F.row_number().over(ws) * (n + 1)
        ).alias("u"),
        F.row_number().over(ws).alias("t"),
    ).where(F.col("t") < F.col("n"))
    agg = scan.groupBy("event_type").agg(
        F.max(F.abs(F.col("u"))).alias("k_stat"), F.min("n").alias("n_events")
    )
    peak = (
        scan.join(agg.select("event_type", "k_stat"), "event_type")
        .where(F.abs(F.col("u")) == F.col("k_stat"))
        .groupBy("event_type")
        .agg(F.min("ts_us").alias("at_ts_us"))
    )
    return agg.join(peak, "event_type").select(
        "event_type", "k_stat", "at_ts_us", "n_events"
    )


def sql_events_pettitt() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * {V_SCALE}) AS BIGINT) AS v
  FROM events
),
ranked AS (
  SELECT event_type, event_id, ts_us,
         2 * rank() OVER (PARTITION BY event_type ORDER BY v)
           + COUNT(*) OVER (PARTITION BY event_type, v) - 1 AS r2
  FROM ev
),
scan AS (
  SELECT event_type, ts_us,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(r2) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING)
           - row_number() OVER (PARTITION BY event_type
                                ORDER BY ts_us, event_id)
             * (COUNT(*) OVER (PARTITION BY event_type) + 1) AS u,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts_us, event_id) AS t
  FROM ranked
  QUALIFY t < n
),
agg AS (
  SELECT event_type, CAST(MAX(abs(u)) AS BIGINT) AS k_stat,
         CAST(MIN(n) AS BIGINT) AS n_events
  FROM scan GROUP BY event_type
)
SELECT a.event_type, a.k_stat, MIN(s.ts_us) AS at_ts_us, a.n_events
FROM agg a JOIN scan s
  ON s.event_type = a.event_type AND abs(s.u) = a.k_stat
GROUP BY a.event_type, a.k_stat, a.n_events
"""


# ---------------------------------------------------------------------------
# Mann-Kendall monotonic-trend test.
# ---------------------------------------------------------------------------

def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_hours, s_stat, var18, z): the Mann-Kendall trend
    test per series over the DENSIFIED hourly count series — S =
    sum_{i<j} sign(c_j - c_i), the non-parametric monotonic-trend screen
    (is this stream's volume drifting up or down?) with the standard
    tie-corrected variance 18*Var(S) = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)
    and the continuity-corrected normal score z.

    Determinism: S and var18 are exact BIGINT (signs and tie counts are
    integers); z divides exact integers through IEEE sqrt — identical
    doubles in both engines — and rounds to 6dp; null when var18 = 0
    (degenerate constant series).

    Plan: the raw log collapses to (type, hour) in ONE partial-aggregated
    shuffle; the pairwise sign sum is a self-join of the HOURLY aggregate
    (O(H^2) per type where H is the wall-clock bucket count — bounded by
    the time span, independent of row volume; a year is 8.8k buckets /
    38M sign pairs per type); tie correction is a second tiny groupBy of
    the same aggregate."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts as timestamp)), {HOUR_US})")
        .alias("hr"),
    )
    counts = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("c")
    )
    spine = (
        counts.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hr"),
        )
    )
    series = spine.join(counts, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    ).persist()
    a, b = series.alias("a"), series.alias("b")
    sgn = (
        F.when(F.col("b.c") > F.col("a.c"), F.lit(1))
        .when(F.col("b.c") < F.col("a.c"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.hr") < F.col("b.hr")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.sum(sgn).alias("s_stat"))
    )
    ties = (
        series.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum("t").alias("n_hours"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie18"),
        )
    )
    n = F.col("n_hours")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie18")).cast("bigint")
    zraw = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    ) / F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    out = (
        s.join(ties, "event_type")
        .withColumn("var18", var18)
        .select(
            "event_type",
            "n_hours",
            "s_stat",
            "var18",
            F.when(F.col("var18") > 0, F.round(zraw, 6)).alias("z"),
        )
        .localCheckpoint(eager=True)
    )
    series.unpersist()
    return out


def sql_events_mann_kendall() -> str:
    v18 = "t.n_hours * (t.n_hours - 1) * (2 * t.n_hours + 5) - t.tie18"
    return f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT b.event_type, g.hr
  FROM bounds b, LATERAL UNNEST(generate_series(b.lo, b.hi)) AS g(hr)
),
series AS (
  SELECT s.event_type, s.hr, COALESCE(c.c, 0) AS c
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c.hr = s.hr
),
s AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM series a JOIN series b
    ON a.event_type = b.event_type AND a.hr < b.hr
  GROUP BY a.event_type
),
ties AS (
  SELECT event_type, CAST(SUM(t) AS BIGINT) AS n_hours,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
  FROM (SELECT event_type, c, COUNT(*) AS t FROM series GROUP BY 1, 2)
  GROUP BY event_type
)
SELECT s.event_type, t.n_hours, s.s_stat,
       CAST({v18} AS BIGINT) AS var18,
       CASE WHEN {v18} > 0
            THEN round((CASE WHEN s.s_stat > 0
                             THEN CAST(s.s_stat - 1 AS DOUBLE)
                             WHEN s.s_stat < 0
                             THEN CAST(s.s_stat + 1 AS DOUBLE)
                             ELSE 0.0 END)
                       / sqrt(CAST({v18} AS DOUBLE) / 18.0), 6)
            ELSE NULL END AS z
FROM s JOIN ties t USING (event_type)
"""


# ---------------------------------------------------------------------------
# Hourly-series autocorrelation function.
# ---------------------------------------------------------------------------

def events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, lag, acf, n_hours): lag-1..{ACF_LAGS} autocorrelation
    of the DENSIFIED hourly event-count series per type (zero-count hours
    are materialized from an integer hour spine, so the lag really is
    wall-clock hours, not "k observed buckets back").  The standard
    periodicity / burst-memory probe behind seasonality detection.

    Determinism: counts are integers; deviations enter as the n-scaled
    integer form dev_t = n*c_t - S (no float mean); numerator and
    denominator are exact BIGINT sums, and the final ratio divides two
    exact integers < 2^53 as doubles, rounded to 6dp — bit-identical
    across engines.  (At populations where dev^2 sums approach 2^53 the
    ratio form switches to doubles; the hourly aggregate keeps magnitudes
    ~1e13 at sf1.)

    Plan: the raw log collapses to (type, hour) in ONE partial-aggregated
    shuffle; the spine (sequence(min,max) per type) and every window
    after that operate on the tiny hourly aggregate, never the log."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts as timestamp)), {HOUR_US})")
        .alias("hr"),
    )
    counts = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("c")
    )
    spine = (
        counts.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hr"),
        )
    )
    series = spine.join(counts, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w = Window.partitionBy("event_type")
    dev = series.select(
        "event_type",
        "hr",
        (F.count(F.lit(1)).over(w) * F.col("c") - F.sum("c").over(w))
        .alias("dev"),
        F.count(F.lit(1)).over(w).alias("n_hours"),
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    lagged = dev.select(
        "event_type",
        "n_hours",
        "dev",
        *[F.lead("dev", k).over(wo).alias(f"d{k}") for k in range(1, ACF_LAGS + 1)],
    )
    agg = lagged.groupBy("event_type", "n_hours").agg(
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
        *[
            F.sum(F.col("dev") * F.col(f"d{k}")).alias(f"num{k}")
            for k in range(1, ACF_LAGS + 1)
        ],
    )
    lags = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.round(
                    F.col(f"num{k}").cast("double")
                    / F.col("den").cast("double"),
                    6,
                ).alias("acf"),
            )
            for k in range(1, ACF_LAGS + 1)
        ]
    )
    return agg.select(
        "event_type", F.explode(lags).alias("x"), "n_hours"
    ).select("event_type", F.col("x.lag").alias("lag"),
             F.col("x.acf").alias("acf"), "n_hours")


def sql_events_acf() -> str:
    nums = ",\n         ".join(
        f"SUM(dev * lead(dev, {k}) OVER "
        f"(PARTITION BY event_type ORDER BY hr)) AS num{k}"
        for k in range(1, ACF_LAGS + 1)
    )
    # window-in-aggregate isn't SQL; build leads first, then aggregate
    leads = ", ".join(
        f"lead(dev, {k}) OVER (PARTITION BY event_type ORDER BY hr) AS d{k}"
        for k in range(1, ACF_LAGS + 1)
    )
    numaggs = ", ".join(
        f"SUM(dev * d{k}) AS num{k}" for k in range(1, ACF_LAGS + 1)
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT event_type, {k} AS lag, "
        f"round(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf, "
        "n_hours FROM agg"
        for k in range(1, ACF_LAGS + 1)
    )
    _ = nums
    return f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT b.event_type, t.hr
  FROM bounds b, LATERAL UNNEST(generate_series(b.lo, b.hi)) AS t(hr)
),
series AS (
  SELECT s.event_type, s.hr, COALESCE(c.c, 0) AS c
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c.hr = s.hr
),
dev AS (
  SELECT event_type, hr,
         COUNT(*) OVER (PARTITION BY event_type) * c
           - SUM(c) OVER (PARTITION BY event_type) AS dev,
         COUNT(*) OVER (PARTITION BY event_type) AS n_hours
  FROM series
),
lagged AS (
  SELECT event_type, n_hours, dev, {leads} FROM dev
),
agg AS (
  SELECT event_type, n_hours, SUM(dev * dev) AS den, {numaggs}
  FROM lagged GROUP BY event_type, n_hours
)
{unions}
"""
