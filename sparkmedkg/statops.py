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

from sparkmedkg import exactq
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

def _hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hr, c): the DENSIFIED hourly count series per type —
    zero-count hours materialized from an integer hour spine, so
    trend/ACF lags really are wall-clock hours.  Shared by the ACF,
    Mann-Kendall and Theil-Sen operators; plan = the raw log collapses to
    (type, hour) in ONE partial-aggregated shuffle, and the spine
    explode works on the |types|-row bounds aggregate."""
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
    return spine.join(counts, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )


_SQL_HOURLY = f"""counts AS (
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
)"""


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
    series = _hourly_series(spark, sf_dir).persist()
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
WITH {_SQL_HOURLY},
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


# ---------------------------------------------------------------------------
# Theil-Sen robust slope (Sen's slope estimator).
# ---------------------------------------------------------------------------

def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_hours, n_pairs, sen_lo_micro, sen_hi_micro,
    sen_micro): Sen's slope per series over the densified hourly count
    series — the median of all pairwise slopes (c_j - c_i)/(hr_j -
    hr_i), the robust trend-magnitude companion to the Mann-Kendall
    direction test (the standard MK + Sen pairing in every
    environmental/ops trend report).  Slopes are integerized to
    micro-counts-per-hour FIRST (truncate-toward-zero division), so the
    median is an exact integer order statistic; sen_lo/hi are the two
    central order statistics and sen_micro their integer midpoint.

    Determinism: every ranked value is BIGINT; row_number ties share the
    same value so rank choice cannot change the output; division
    truncation is matched by a sign-split in the oracle.

    Plan: same O(H^2)-per-type pair join as events_mann_kendall (H =
    wall-clock buckets, independent of row volume); the median sort
    ranks only the pair table, partitioned per type."""
    series = _hourly_series(spark, sf_dir).persist()
    a, b = series.alias("a"), series.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.hr") < F.col("b.hr")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.lit(1_000_000) * (F.col("b.c") - F.col("a.c"))).alias("num"),
        (F.col("b.hr") - F.col("a.hr")).alias("den"),
    )
    slopes = pairs.select(
        "event_type", F.expr("div(num, den)").alias("slope_micro")
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    wt = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope_micro",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("m"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.min("m").alias("n_pairs"),
        F.min(
            F.when(F.col("rn") == F.expr("div(m + 1, 2)"), F.col("slope_micro"))
        ).alias("sen_lo_micro"),
        F.min(
            F.when(F.col("rn") == F.expr("div(m, 2) + 1"), F.col("slope_micro"))
        ).alias("sen_hi_micro"),
    )
    nh = series.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours")
    )
    out = (
        agg.join(nh, "event_type")
        .select(
            "event_type",
            "n_hours",
            "n_pairs",
            "sen_lo_micro",
            "sen_hi_micro",
            F.expr("div(sen_lo_micro + sen_hi_micro, 2)").alias("sen_micro"),
        )
        .localCheckpoint(eager=True)
    )
    series.unpersist()
    return out


def sql_events_theil_sen() -> str:
    # Spark's div truncates toward zero; DuckDB's // floors -> sign-split.
    tdiv = (
        "CASE WHEN {x} >= 0 THEN ({x}) // ({y}) "
        "ELSE -((-({x})) // ({y})) END"
    )
    slope = tdiv.format(x="1000000 * (b.c - a.c)", y="b.hr - a.hr")
    mid = tdiv.format(x="sen_lo_micro + sen_hi_micro", y="2")
    return f"""
WITH {_SQL_HOURLY},
slopes AS (
  SELECT a.event_type, CAST({slope} AS BIGINT) AS slope_micro
  FROM series a JOIN series b
    ON a.event_type = b.event_type AND a.hr < b.hr
),
ranked AS (
  SELECT event_type, slope_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope_micro) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM slopes
),
agg AS (
  SELECT event_type, CAST(MIN(m) AS BIGINT) AS n_pairs,
         MIN(CASE WHEN rn = (m + 1) // 2 THEN slope_micro END)
           AS sen_lo_micro,
         MIN(CASE WHEN rn = m // 2 + 1 THEN slope_micro END)
           AS sen_hi_micro
  FROM ranked GROUP BY event_type
),
nh AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM series GROUP BY event_type
)
SELECT a.event_type, n.n_hours, a.n_pairs, a.sen_lo_micro,
       a.sen_hi_micro, CAST({mid} AS BIGINT) AS sen_micro
FROM agg a JOIN nh n USING (event_type)
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U (first half vs second half of each series).
# ---------------------------------------------------------------------------

def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_a, n_b, u2_a, tie_t, z): the Mann-Whitney /
    Wilcoxon rank-sum test per series between the FIRST HALF and SECOND
    HALF of the time-ordered events (the standard "did the value
    distribution shift?" two-sample screen, the rank-robust sibling of
    the Pettitt change-point).  Group A = the first n div 2 events by
    (ts, event_id), B = the rest; u2_a = 2*U_A = R2_A - n_a*(n_a+1)
    with R2 the doubled pooled average ranks (always integral, the
    Pettitt convention); tie_t = sum_t (t^3 - t) over pooled value tie
    groups; z applies the continuity correction against the
    tie-corrected variance Var(U) = n_a*n_b/12 * ((n+1) -
    tie_t/(n*(n-1))).

    Determinism: u2_a and tie_t are exact BIGINT; z combines them in an
    IDENTICALLY-SHAPED double expression in both engines (products stay
    < 2^53 after the pre-division), rounded to 6dp; null when the
    variance degenerates (all values tied).

    Plan: two per-type window sorts (one by value for pooled ranks, one
    by time for the half split) — the events_pettitt budget; everything
    after is a per-type aggregate."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * V_SCALE).cast("bigint").alias("v"),
    )
    wv = Window.partitionBy("event_type").orderBy("v")
    wt = Window.partitionBy("event_type", "v")
    wo = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v",
        (2 * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - 1).alias("r2"),
        F.row_number().over(wo).alias("idx"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    half = ranked.select(
        "event_type",
        "v",
        "r2",
        "n",
        (F.col("idx") <= F.expr("div(n, 2)")).alias("in_a"),
    )
    base = half.groupBy("event_type").agg(
        F.min("n").alias("n"),
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("in_a"), F.col("r2"))).alias("r2_a"),
    )
    ties = (
        half.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tie_t")
        )
    )
    na, nn = F.col("n_a"), F.col("n")
    nb = (nn - na).alias("n_b")
    u2 = (F.col("r2_a") - na * (na + 1)).cast("bigint")
    j = base.join(ties, "event_type").select(
        "event_type",
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint"),
        u2.alias("u2_a"),
        F.col("tie_t").cast("bigint").alias("tie_t"),
        nn.alias("n"),
    )
    nab = (F.col("n_a") * F.col("n_b")).cast("double")
    var = (nab / F.lit(12.0)) * (
        (F.col("n") + 1).cast("double")
        - F.col("tie_t").cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    diff = F.col("u2_a").cast("double") - nab
    cc = (
        F.when(F.col("u2_a") > F.col("n_a") * F.col("n_b"), F.lit(1.0))
        .when(F.col("u2_a") < F.col("n_a") * F.col("n_b"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    z = (diff - cc) / (F.lit(2.0) * F.sqrt(var))
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        "u2_a",
        "tie_t",
        F.when(var > 0, F.round(z, 6)).alias("z"),
    )


def sql_events_mann_whitney() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * {V_SCALE}) AS BIGINT) AS v
  FROM events
),
ranked AS (
  SELECT event_type, v,
         2 * rank() OVER (PARTITION BY event_type ORDER BY v)
           + COUNT(*) OVER (PARTITION BY event_type, v) - 1 AS r2,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts_us, event_id) AS idx,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
half AS (
  SELECT event_type, v, r2, n, idx <= n // 2 AS in_a FROM ranked
),
base AS (
  SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN in_a THEN r2 END) AS BIGINT) AS r2_a
  FROM half GROUP BY event_type
),
ties AS (
  SELECT event_type, CAST(SUM(t * t * t - t) AS BIGINT) AS tie_t
  FROM (SELECT event_type, v, COUNT(*) AS t FROM half GROUP BY 1, 2)
  GROUP BY event_type
),
j AS (
  SELECT b.event_type, b.n_a, b.n - b.n_a AS n_b,
         b.r2_a - b.n_a * (b.n_a + 1) AS u2_a, t.tie_t, b.n
  FROM base b JOIN ties t USING (event_type)
)
SELECT event_type, n_a, n_b, CAST(u2_a AS BIGINT) AS u2_a, tie_t,
       CASE WHEN CAST(n_a * n_b AS DOUBLE) / 12.0
                 * (CAST(n + 1 AS DOUBLE)
                    - CAST(tie_t AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE)) > 0
            THEN round((CAST(u2_a AS DOUBLE) - CAST(n_a * n_b AS DOUBLE)
                        - CASE WHEN u2_a > n_a * n_b THEN 1.0
                               WHEN u2_a < n_a * n_b THEN -1.0
                               ELSE 0.0 END)
                       / (2.0 * sqrt(CAST(n_a * n_b AS DOUBLE) / 12.0
                          * (CAST(n + 1 AS DOUBLE)
                             - CAST(tie_t AS DOUBLE)
                               / CAST(n * (n - 1) AS DOUBLE)))), 6)
            ELSE NULL END AS z
FROM j
"""


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov distance vs the pooled corpus distribution.
# ---------------------------------------------------------------------------

def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_t, n_all, d_num, d_ppm, kn): the two-sample
    Kolmogorov-Smirnov distance between each series' value distribution
    and the POOLED all-types distribution — D = max_x |F_type(x) -
    F_all(x)|, the distribution-drift screen that catches shape changes
    rank tests miss.  Kept exact: D's numerator is the integer
    max |cum_t * n_all - cum_all * n_t| over the distinct-value spine,
    d_ppm its integer-division ppm form, and kn = sqrt(n_t*n_all /
    (n_t+n_all)) * D the asymptotic test scale (double from exact
    integers, rounded).

    Plan: values collapse to per-(type, v) counts in one shuffle; the
    distinct-value spine cumulates via exactq's two-phase partial cumsum
    and the per-type sums ride type-partitioned windows over that
    AGGREGATE (vocab-of-values-sized, not row-sized); the per-type ECDF
    grid is |types| x |spine| — types is the small fixed dimension."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * V_SCALE).cast("bigint").alias("v"),
    )
    tv = ev.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    allv = tv.groupBy("v").agg(F.sum("c").alias("c_all"))
    types = tv.groupBy("event_type").agg(F.sum("c").alias("n_t"))
    grid = types.crossJoin(allv.select("v"))
    joined = grid.join(tv, ["event_type", "v"], "left").select(
        "event_type",
        "n_t",
        "v",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = joined.withColumn("cum_t", F.sum("c").over(wcum))
    # the pooled ECDF spine cumulates by two-phase partial cumsum (value
    # domain can be wide); the grand total is a 1-row broadcast
    spine = (
        exactq.cumsum_by_value(allv, "v", "c_all")
        .withColumnRenamed("cum", "cum_all")
        .crossJoin(F.broadcast(allv.agg(F.sum("c_all").alias("n_all"))))
        .select("v", "cum_all", "n_all")
    )
    scored = cum.join(spine, "v").select(
        "event_type",
        "n_t",
        "n_all",
        F.abs(
            F.col("cum_t") * F.col("n_all") - F.col("cum_all") * F.col("n_t")
        ).alias("gap"),
    )
    agg = scored.groupBy("event_type").agg(
        F.min("n_t").cast("bigint").alias("n_t"),
        F.min("n_all").cast("bigint").alias("n_all"),
        F.max("gap").cast("bigint").alias("d_num"),
    )
    d = F.col("d_num").cast("double") / (
        F.col("n_t") * F.col("n_all")
    ).cast("double")
    kn = F.sqrt(
        (F.col("n_t") * F.col("n_all")).cast("double")
        / (F.col("n_t") + F.col("n_all")).cast("double")
    ) * d
    return agg.select(
        "event_type",
        "n_t",
        "n_all",
        "d_num",
        F.expr("div(1000000 * d_num, n_t * n_all)").alias("d_ppm"),
        F.round(kn, 6).alias("kn"),
    )


def sql_events_ks_test() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * {V_SCALE}) AS BIGINT) AS v
  FROM events
),
tv AS (
  SELECT event_type, v, COUNT(*) AS c FROM ev GROUP BY 1, 2
),
allv AS (SELECT v, SUM(c) AS c_all FROM tv GROUP BY v),
types AS (SELECT event_type, SUM(c) AS n_t FROM tv GROUP BY event_type),
grid AS (SELECT t.event_type, t.n_t, a.v FROM types t CROSS JOIN allv a),
joined AS (
  SELECT g.event_type, g.n_t, g.v, COALESCE(tv.c, 0) AS c
  FROM grid g LEFT JOIN tv ON tv.event_type = g.event_type AND tv.v = g.v
),
cum AS (
  SELECT event_type, n_t, v,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum_t
  FROM joined
),
spine AS (
  SELECT v,
         SUM(c_all) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_all,
         SUM(c_all) OVER () AS n_all
  FROM allv
),
agg AS (
  SELECT c.event_type, CAST(MIN(c.n_t) AS BIGINT) AS n_t,
         CAST(MIN(s.n_all) AS BIGINT) AS n_all,
         CAST(MAX(abs(c.cum_t * s.n_all - s.cum_all * c.n_t)) AS BIGINT)
           AS d_num
  FROM cum c JOIN spine s USING (v)
  GROUP BY c.event_type
)
SELECT event_type, n_t, n_all, d_num,
       CAST((1000000 * d_num) // (n_t * n_all) AS BIGINT) AS d_ppm,
       round(sqrt(CAST(n_t * n_all AS DOUBLE)
                  / CAST(n_t + n_all AS DOUBLE))
             * (CAST(d_num AS DOUBLE) / CAST(n_t * n_all AS DOUBLE)), 6)
         AS kn
FROM agg
"""


# ---------------------------------------------------------------------------
# Fano factor (index of dispersion) per hourly series.
# ---------------------------------------------------------------------------

def events_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_hours, sum_c, sum_c2, fano_micro, overdispersed):
    the index of dispersion F = Var(c)/Mean(c) of the densified hourly
    count series per type — F = 1 for a Poisson arrival process, F > 1
    for bursty/clustered traffic, F < 1 for regular (rate-limited)
    traffic.  The one-number companion to events_acf: ACF says WHERE the
    memory is, Fano says HOW FAR from Poisson the stream sits.

    Determinism: with n = hours, S = sum c, Q = sum c^2, the population
    variance-to-mean ratio is exactly (n*Q - S^2)/(n*S) — emitted in
    micro units by one truncating integer division (nonnegative, so
    floor == trunc in both engines).

    Plan: rides the shared hourly aggregate (_hourly_series — one
    partial-agg shuffle over the log); the moments are a |types|-row
    groupBy."""
    series = _hourly_series(spark, sf_dir)
    agg = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    return agg.select(
        "event_type",
        "n_hours",
        "sum_c",
        "sum_c2",
        F.expr(
            "div(1000000 * (n_hours * sum_c2 - sum_c * sum_c),"
            " n_hours * sum_c)"
        ).alias("fano_micro"),
        (
            F.expr(
                "div(1000000 * (n_hours * sum_c2 - sum_c * sum_c),"
                " n_hours * sum_c)"
            )
            > 1_000_000
        ).alias("overdispersed"),
    )


def sql_events_fano() -> str:
    fano = (
        "(1000000 * (n_hours * sum_c2 - sum_c * sum_c))"
        " // (n_hours * sum_c)"
    )
    return f"""
WITH {_SQL_HOURLY},
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(c) AS BIGINT) AS sum_c,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2
  FROM series GROUP BY event_type
)
SELECT event_type, n_hours, sum_c, sum_c2,
       CAST({fano} AS BIGINT) AS fano_micro,
       CAST({fano} AS BIGINT) > 1000000 AS overdispersed
FROM agg
"""


# ---------------------------------------------------------------------------
# MAD-based robust outlier audit.
# ---------------------------------------------------------------------------

MAD_Z_MILLI = 3_500  # Iglewicz-Hoaglin flag threshold |M_i| > 3.5


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, med_v, mad_v, n_outliers, outlier_ppm): the
    median / median-absolute-deviation robust outlier audit per series
    — the modified z-score M_i = 0.6745 * (v_i - med) / MAD with the
    Iglewicz-Hoaglin 3.5 flag, the screen that survives the very
    outliers a mean/stddev z-score (events_zscore) lets distort its own
    baseline.

    Determinism: med and MAD are LOWER-median order statistics (exact
    integer picks at rank (n+1) div 2 of the millis values and the
    absolute deviations); the flag test cross-multiplies integers
    (6745 * |v - med| > 35000 * MAD — 0.6745 and 3.5 at the same 1e4
    scale), so no float ever enters a decision.

    Plan: two window sorts per series partition (values, then absolute
    deviations) — the events_pettitt budget — then one per-type
    aggregate."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * V_SCALE).cast("bigint").alias("v"),
    )
    wv = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r1 = ev.select(
        "event_type",
        "v",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r1.where(F.col("rn") == F.expr("div(n + 1, 2)"))
        .select("event_type", F.col("v").alias("med_v"))
    )
    dev = r1.join(med, "event_type").select(
        "event_type",
        "v",
        "n",
        "med_v",
        F.abs(F.col("v") - F.col("med_v")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d", "v")
    r2 = dev.select(
        "event_type", "n", "med_v", "d",
        F.row_number().over(wd).alias("rn"),
    )
    mad = (
        r2.where(F.col("rn") == F.expr("div(n + 1, 2)"))
        .select("event_type", F.col("d").alias("mad_v"))
    )
    flagged = dev.join(mad, "event_type").select(
        "event_type",
        "n",
        "med_v",
        "mad_v",
        (
            F.lit(6_745) * F.col("d")
            > F.lit(10 * MAD_Z_MILLI) * F.col("mad_v")
        ).alias("out"),
    )
    return flagged.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n"),
        F.min("med_v").cast("bigint").alias("med_v"),
        F.min("mad_v").cast("bigint").alias("mad_v"),
        F.sum(F.when(F.col("out"), 1).otherwise(0)).cast("bigint")
        .alias("n_outliers"),
        F.expr(
            "div(1000000 * sum(case when out then 1 else 0 end), min(n))"
        ).alias("outlier_ppm"),
    )


def sql_events_mad_outliers() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(round(value * {V_SCALE}) AS BIGINT) AS v
  FROM events
),
r1 AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
med AS (
  SELECT event_type, v AS med_v FROM r1 WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT r.event_type, r.v, r.n, m.med_v, abs(r.v - m.med_v) AS d
  FROM r1 r JOIN med m USING (event_type)
),
r2 AS (
  SELECT event_type, n, d,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY d, v) AS rn
  FROM dev
),
mad AS (
  SELECT event_type, d AS mad_v FROM r2 WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       CAST(MIN(d.n) AS BIGINT) AS n,
       CAST(MIN(d.med_v) AS BIGINT) AS med_v,
       CAST(MIN(ma.mad_v) AS BIGINT) AS mad_v,
       CAST(SUM(CASE WHEN 6745 * d.d > {10 * MAD_Z_MILLI} * ma.mad_v
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST((1000000 * SUM(CASE WHEN 6745 * d.d
                                     > {10 * MAD_Z_MILLI} * ma.mad_v
                                THEN 1 ELSE 0 END)) // MIN(d.n)
            AS BIGINT) AS outlier_ppm
FROM dev d JOIN mad ma USING (event_type)
GROUP BY d.event_type
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test for sequence randomness.
# ---------------------------------------------------------------------------

def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_above, n_below, runs, z): the Wald-Wolfowitz runs
    test per series — dichotomize the time-ordered values at the lower
    median (above vs not-above), count runs of equal signs, and score
    against the randomness expectation E[R] = 1 + 2*n1*n2/n, Var[R] =
    2*n1*n2*(2*n1*n2 - n) / (n^2*(n-1)).  Too FEW runs = trending /
    sticky state; too MANY = oscillation — the sequence-randomness
    screen that complements the value-distribution tests (KS,
    Mann-Whitney) with ORDER information.

    Determinism: the median is the exact order statistic, signs and the
    run count are integers (a lag-compare prefix sum), and z combines
    exact integers in an identically-shaped double expression in both
    engines, rounded to 6dp; null when variance degenerates (one-sided
    series).

    Plan: one value sort for the median, one time sort for the lag
    compare — per-type window budget; everything after is a per-type
    aggregate."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * V_SCALE).cast("bigint").alias("v"),
    )
    wv = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r1 = ev.select(
        "event_type",
        "event_id",
        "ts_us",
        "v",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r1.where(F.col("rn") == F.expr("div(n + 1, 2)"))
        .select("event_type", F.col("v").alias("med_v"))
    )
    wo = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    signed = r1.join(med, "event_type").select(
        "event_type",
        "ts_us",
        "event_id",
        (F.col("v") > F.col("med_v")).cast("int").alias("s"),
    )
    lagged = signed.select(
        "event_type",
        "s",
        F.lag("s").over(wo).alias("prev"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.sum("s").cast("bigint").alias("n_above"),
        F.sum(F.lit(1) - F.col("s")).cast("bigint").alias("n_below"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).cast("bigint").alias("runs"),
    )
    n1, n2 = F.col("n_above"), F.col("n_below")
    n = n1 + n2
    two = (2 * n1 * n2).cast("double")
    mu = F.lit(1.0) + two / n.cast("double")
    var = (
        two
        * ((2 * n1 * n2) - n).cast("double")
        / n.cast("double")
        / (n * (n - 1)).cast("double")
    )
    z = (F.col("runs").cast("double") - mu) / F.sqrt(var)
    return agg.select(
        "event_type",
        "n_above",
        "n_below",
        "runs",
        F.when(var > 0, F.round(z, 6)).alias("z"),
    )


def sql_events_runs_test() -> str:
    var = (
        "CAST(2 * n_above * n_below AS DOUBLE)"
        " * CAST(2 * n_above * n_below - (n_above + n_below) AS DOUBLE)"
        " / CAST(n_above + n_below AS DOUBLE)"
        " / CAST((n_above + n_below) * (n_above + n_below - 1) AS DOUBLE)"
    )
    mu = (
        "1.0 + CAST(2 * n_above * n_below AS DOUBLE)"
        " / CAST(n_above + n_below AS DOUBLE)"
    )
    return f"""
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * {V_SCALE}) AS BIGINT) AS v
  FROM events
),
r1 AS (
  SELECT event_type, event_id, ts_us, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
med AS (
  SELECT event_type, v AS med_v FROM r1 WHERE rn = (n + 1) // 2
),
signed AS (
  SELECT r.event_type, r.ts_us, r.event_id,
         CAST(r.v > m.med_v AS INT) AS s
  FROM r1 r JOIN med m USING (event_type)
),
lagged AS (
  SELECT event_type, s,
         lag(s) OVER (PARTITION BY event_type
                      ORDER BY ts_us, event_id) AS prev
  FROM signed
),
agg AS (
  SELECT event_type,
         CAST(SUM(s) AS BIGINT) AS n_above,
         CAST(SUM(1 - s) AS BIGINT) AS n_below,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM lagged GROUP BY event_type
)
SELECT event_type, n_above, n_below, runs,
       CASE WHEN {var} > 0
            THEN round((CAST(runs AS DOUBLE) - ({mu})) / sqrt({var}), 6)
            END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# SAX motif discovery over the densified hourly series.
# ---------------------------------------------------------------------------

SAX_ALPHA = 4   # alphabet size (quartile symbols)
SAX_WORD = 3    # motif word length (hours)


def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, word, n_occ): repeated SAX words per series — each
    hour of the DENSIFIED hourly count series is symbolized to a quartile
    symbol 1..SAX_ALPHA (rank-based SAX: NTILE over (count, hour), which is
    the integer-exact stand-in for Gaussian-breakpoint SAX and needs no
    float mean/stddev), consecutive symbols form sliding words of
    ``SAX_WORD`` hours, and a word occurring >= 2 times inside one series
    is a motif — the classic time-series motif-discovery primitive
    (recurring daily/weekly shapes, periodicity fingerprints).

    Determinism: NTILE over a TOTAL order (c, hr) is identical in Spark
    and DuckDB (standard leading-groups-one-larger semantics); words are
    digit strings; counts are exact.

    Scale: the raw stream collapses to the (type, hour) partial-agg
    shuffle first; both windows then run per-series on the aggregated
    table (|types| * |hours| rows), and the motif count is map-side
    combinable.  Hot series cost O(hours log hours) in their partition —
    at 10^6 series x 10^4 hours this is embarrassingly parallel."""
    series = _hourly_series(spark, sf_dir)
    w_rank = Window.partitionBy("event_type").orderBy("c", "hr")
    sym = series.select(
        "event_type", "hr", F.ntile(SAX_ALPHA).over(w_rank).alias("sym")
    )
    w_t = Window.partitionBy("event_type").orderBy("hr")
    # the lead list is generated from SAX_WORD so changing the word length
    # cannot desync the word from the completeness guard (or the oracle)
    lead_cols = [F.col("sym")] + [
        F.lead("sym", i).over(w_t) for i in range(1, SAX_WORD)
    ]
    words = sym.select(
        "event_type",
        F.concat_ws("", *lead_cols).alias("word"),
        F.lead("sym", SAX_WORD - 1).over(w_t).alias("s_last"),
    ).where(F.col("s_last").isNotNull())
    return (
        words.groupBy("event_type", "word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= 2)
    )


def sql_events_sax_motifs() -> str:
    return f"""
WITH {_SQL_HOURLY},
sym AS (
  SELECT event_type, hr,
         NTILE({SAX_ALPHA}) OVER (PARTITION BY event_type
                                  ORDER BY c, hr) AS sym
  FROM series
),
words AS (
  SELECT event_type,
         {" || ".join(
             ["CAST(sym AS VARCHAR)"]
             + [
                 f"CAST(LEAD(sym, {i}) OVER w AS VARCHAR)"
                 for i in range(1, SAX_WORD)
             ]
         )} AS word,
         LEAD(sym, {SAX_WORD - 1}) OVER w AS s_last
  FROM sym
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
)
SELECT event_type, word, CAST(COUNT(*) AS BIGINT) AS n_occ
FROM words WHERE s_last IS NOT NULL
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# STL-style trend/seasonal/residual decomposition (moving-average trend).
# ---------------------------------------------------------------------------

STL_HALF = 12               # centered trend window: 12 hours each side
STL_W = 2 * STL_HALF + 1    # full window width (25 hours)
STL_OFF = 1_000_000_000     # positive offset so floor-division of possibly
#                             negative milli sums is identical cross-engine
#                             (floor == trunc once the dividend is positive)


def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hr, c, trend_milli, seasonal_milli, resid_milli):
    classical seasonal-trend decomposition of each DENSIFIED hourly count
    series — trend = centered 25-hour moving average, seasonal = the
    per-hour-of-day mean of the DETRENDED series, residual = the rest.
    events_seasonality profiles raw hour-of-day means; decomposing the
    trend out FIRST is what separates "traffic is growing" from "3pm is
    always busy" and leaves a residual a monitor can threshold.  Rows are
    emitted only where the full trend window exists (the standard STL
    edge-trim).  All milli-quantized exact integers.

    Scale: the stream collapses to the (type, hour) partial agg first;
    the trend is a per-series rows-frame window on the aggregated table;
    the seasonal profile is a 24-rows-per-type aggregate broadcast back.
    Nothing beyond the hourly aggregate ever shuffles twice."""
    series = _hourly_series(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-STL_HALF, STL_HALF)
    )
    t = series.select(
        "event_type",
        "hr",
        "c",
        F.when(
            F.count(F.lit(1)).over(w) == STL_W,
            F.expr(f"div(sum(c) over (partition by event_type order by hr "
                   f"rows between {STL_HALF} preceding and {STL_HALF} "
                   f"following) * 1000, {STL_W})"),
        ).alias("trend_milli"),
    ).where(F.col("trend_milli").isNotNull())
    t = t.withColumn("detr_milli", F.col("c") * 1000 - F.col("trend_milli"))
    t = t.withColumn("hod", F.col("hr") % 24)
    seas = t.groupBy("event_type", "hod").agg(
        F.sum("detr_milli").alias("s"), F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        "hod",
        (F.expr(f"div(s + n * {STL_OFF}, n)") - STL_OFF)
        .cast("bigint")
        .alias("seasonal_milli"),
    )
    return (
        t.join(F.broadcast(seas), ["event_type", "hod"])
        .select(
            "event_type",
            "hr",
            "c",
            F.col("trend_milli").cast("bigint").alias("trend_milli"),
            "seasonal_milli",
            (F.col("detr_milli") - F.col("seasonal_milli"))
            .cast("bigint")
            .alias("resid_milli"),
        )
    )


def sql_events_stl_decompose() -> str:
    return f"""
WITH {_SQL_HOURLY},
tr AS (
  SELECT event_type, hr, c,
         CASE WHEN COUNT(*) OVER w = {STL_W}
              THEN SUM(c) OVER w * 1000 // {STL_W}
         END AS trend_milli
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN {STL_HALF} PRECEDING AND {STL_HALF} FOLLOWING)
),
det AS (
  SELECT event_type, hr, c, trend_milli,
         c * 1000 - trend_milli AS detr_milli, hr % 24 AS hod
  FROM tr WHERE trend_milli IS NOT NULL
),
seas AS (
  SELECT event_type, hod,
         CAST((SUM(detr_milli) + COUNT(*) * {STL_OFF}) // COUNT(*)
              - {STL_OFF} AS BIGINT) AS seasonal_milli
  FROM det GROUP BY 1, 2
)
SELECT d.event_type, d.hr, d.c,
       CAST(d.trend_milli AS BIGINT) AS trend_milli,
       s.seasonal_milli,
       CAST(d.detr_milli - s.seasonal_milli AS BIGINT) AS resid_milli
FROM det d JOIN seas s
  ON s.event_type = d.event_type AND s.hod = d.hod
"""
