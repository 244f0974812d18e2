"""Relational operator showcase over the events + TPC-H-ish tables.

These gate the generic operator inventory (SURVEY.md §2.4-2.5) on the
driver's testdata with exact DuckDB oracles:

- windowed sessionization + running aggregates over ``events`` (the
  batch-side equivalents of the Structured Streaming stateful operators)
- ranked per-group top-k (A2 pattern on a generic table)
- multi-way broadcast-dim joins, semi/anti joins (J2/J5 patterns)
- high-cardinality aggregation with DECIMAL-stable sums (order-independent
  across engines, unlike raw double sums)

Scale notes: aggregation sums are cast to DECIMAL so partial/final
aggregation order cannot change results; dim joins are broadcast; the
sessionize window partitions by user_id (the natural shuffle key — skew
bounded by per-user event counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkmedkg import exactq

SESSION_GAP_SEC = 1800


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Events: sessionize / running sum / per-user top-k.
# ---------------------------------------------------------------------------

def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): one row per session
    with event count and bounds. lag + conditional cumsum windows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # epoch seconds of the (timezone-naive) event timestamp; differences are
    # timezone-invariant, matching DuckDB's epoch()
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_SEC), 1).otherwise(0)
    sess = ev.withColumn(
        "session_idx",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # session bounds as epoch MICROSECOND longs, not timestamps: the values
    # are engine-identical either way, but timestamp_ntz vs TIMESTAMP
    # serialize differently through the driver's value-hash canonicalizer —
    # a 64-bit integer hashes identically everywhere.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("session_start_us"),
        F.max(us).alias("session_end_us"),
    )


def sql_events_sessionize() -> str:
    return f"""
WITH marked AS (
  SELECT user_id, event_id, ts,
         -- whole-second diffs (epoch_us // 1e6), mirroring Spark's long
         -- cast: raw-double epoch() diffs can straddle the gap threshold
         -- on fractional-second timestamps (the lateness-audit bug class)
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) // 1000000
                   - epoch_us(lag(ts) OVER w) // 1000000 > {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       MIN(epoch_us(ts)) AS session_start_us,
       MAX(epoch_us(ts)) AS session_end_us
FROM sess GROUP BY user_id, session_idx
"""


def events_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total of ``value``; DECIMAL accumulation so the
    result is independent of evaluation strategy in either engine."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "v", F.col("value").cast("decimal(18,6)")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).cast("double").alias("running_value"),
    )


def sql_events_running_sum() -> str:
    return """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
FROM events
"""


def events_topk_per_user(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """A2 pattern: top-k events per user by value (deterministic tiebreak)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("user_id", "event_id", "event_type", F.round("value", 6).alias("value"))
    )


def sql_events_topk_per_user(k: int = 3) -> str:
    return f"""
SELECT user_id, event_id, event_type, round(value, 6) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id ASC) AS rk
  FROM events
) WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# TPC-H patterns.
# ---------------------------------------------------------------------------

def tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped DECIMAL-stable sums + derived averages."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc_price = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6)
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def sql_tpch_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def tpch_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join with broadcast dims: revenue per region name."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("r_name")
    )


def sql_tpch_revenue_by_region() -> str:
    return """
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def tpch_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join counts per market segment: customers with vs
    without orders (J2 / referential-integrity patterns)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    with_orders = (
        cust.join(orders, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    without = (
        cust.join(orders, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("c_mktsegment")
    )


def sql_tpch_semi_anti() -> str:
    return """
WITH w AS (
  SELECT c_mktsegment, COUNT(*) AS n_with_orders
  FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
  GROUP BY c_mktsegment
),
wo AS (
  SELECT c_mktsegment, COUNT(*) AS n_without_orders
  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  GROUP BY c_mktsegment
)
SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       COALESCE(n_with_orders, 0) AS n_with_orders,
       COALESCE(n_without_orders, 0) AS n_without_orders
FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# As-of join: each click matched to the user's most recent prior view.
# ---------------------------------------------------------------------------

def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, click_id, click_ts_us, view_id, view_ts_us): every click
    event joined to the same user's latest view event with view.ts <=
    click.ts (NULL-matched when no prior view exists).

    Spark has no ASOF JOIN operator; the idiomatic distributed formulation
    is the union-merge: tag both event streams, sort each user's merged
    timeline once, and carry the last-seen view forward with
    ``last(ignorenulls=True)``.  ONE shuffle on user_id and one window
    pass — a range-join formulation would plan as a broadcast-nested-loop
    or an O(n_clicks * n_views) per-user expansion.  The side tag orders a
    view before a click at the identical timestamp, giving inclusive
    (<=) as-of semantics — exactly DuckDB's ASOF JOIN, which is the
    oracle (a genuinely independent implementation).  Timestamps are
    emitted as epoch-microsecond longs (hash-stable across engines)."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        us.alias("ts_us"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("view_id"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        us.alias("ts_us"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("view_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "view_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = views.unionByName(clicks).select(
        "user_id",
        "side",
        F.col("click_id"),
        F.col("ts_us"),
        F.last("view_id", ignorenulls=True).over(w).alias("m_view_id"),
        F.last(
            F.when(F.col("side") == 0, F.col("ts_us")), ignorenulls=True
        ).over(w).alias("m_view_ts_us"),
    )
    return merged.where(F.col("side") == 1).select(
        "user_id",
        F.col("click_id"),
        F.col("ts_us").alias("click_ts_us"),
        F.col("m_view_id").alias("view_id"),
        F.col("m_view_ts_us").alias("view_ts_us"),
    )


def sql_events_asof_join() -> str:
    return """
SELECT c.user_id,
       c.event_id AS click_id,
       epoch_us(c.ts) AS click_ts_us,
       v.event_id AS view_id,
       epoch_us(v.ts) AS view_ts_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


# ---------------------------------------------------------------------------
# Tumbling-window aggregation (the batch twin of streaming.windowed_counts).
# ---------------------------------------------------------------------------

def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_start_us, event_type, n_events, sum_value): 1-hour tumbling
    windows via the built-in ``F.window`` bucketing expression — row-local,
    so the only shuffle is the groupBy itself (map-side combined).
    DECIMAL-stable value sums; window start as epoch micros."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sql_events_tumbling_counts() -> str:
    return """
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Semi-structured JSON property extraction + aggregation.
# ---------------------------------------------------------------------------

def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, n_with_k, min_k, max_k, sum_k): extract the integer
    ``k`` property from the JSON ``props`` column and aggregate per type.
    ``get_json_object`` is a JVM-side expression (inside whole-stage
    codegen) — the standard pattern for the semi-structured sidecar
    columns every crawl schema carries; no Python, one shuffle."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("k").alias("n_with_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
    )


def sql_events_json_props() -> str:
    return """
SELECT event_type,
       COUNT(*) AS n,
       COUNT(k) AS n_with_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Rollup + pivot (multi-level aggregation surfaces).
# ---------------------------------------------------------------------------

def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, gid, n_events, sum_value): ROLLUP over
    (event_type, day) — per-type-per-day, per-type, and grand-total rows in
    ONE pass (Spark expands grouping sets inside a single shuffle instead
    of unioning three aggregations).  ``gid`` is the standard grouping-bit
    encoding (first column = most significant bit), identical in DuckDB's
    GROUPING(); DECIMAL-stable sums."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
    )
    return (
        ev.rollup("event_type", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select("event_type", "day", "gid", "n_events", "sum_value")
    )


def sql_events_rollup() -> str:
    return """
SELECT event_type,
       day,
       GROUPING(event_type, day) AS gid,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, value,
             strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day
      FROM events)
GROUP BY ROLLUP (event_type, day)
"""


PIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, click, view, purchase, signup, error): per-user event
    counts pivoted to columns.  The value list is FIXED (PIVOT_TYPES) —
    an unpinned pivot runs an extra distinct-collect job over 10^12 rows
    and makes the output schema data-dependent; pinning keeps it one
    shuffle with a static schema."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, PIVOT_TYPES)
    )


def sql_events_pivot() -> str:
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS {t}"
        for t in PIVOT_TYPES
    )
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Exact percentiles, sliding range windows, CDC compaction.
# ---------------------------------------------------------------------------

def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, p50, p90, p99): exact per-type value percentiles
    (quantile_cont's (p*(n-1)) linear interpolation, computed through
    exactq's all-integer closed form over the cent domain, so the emitted
    doubles are one division of identical bigints in both engines — no
    engine-side float-fold seam).  The per-type value histogram is
    group-count x price-domain sized; at unbounded cardinality switch to
    ``approx_percentile`` (t-digest, mergeable).

    CENT-DOMAIN CONTRACT (shared with events_winsorize and
    events_robust_zscore): ``round(value * 100)`` is LOSSLESS only while
    ``events.value`` carries at most 2 decimal places — true for the
    driver fixtures and guarded by
    tests/test_dtype_parity.py::test_events_value_is_cent_aligned.  A
    source with sub-cent precision must scale the quantization factor
    (den) accordingly or accept cent rounding; the result would silently
    change otherwise."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cuts = exactq.grouped_quantile_cuts_scaled(
        ev, "event_type", "cents", [50, 90, 99], 100
    )
    # cut_scaled units: cents * den(=100) -> dollars * 10000
    return cuts.select(
        "event_type",
        F.col("n").alias("n"),
        *[
            F.round(
                F.element_at(F.col("cuts_scaled"), i) / 10_000.0, 6
            ).alias(name)
            for i, name in [(1, "p50"), (2, "p90"), (3, "p99")]
        ],
    )


def sql_events_percentiles() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
{exactq.sql_grouped_cuts_cte("ev", "event_type", "cents", [50, 90, 99], 100)}
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round(cuts_scaled[1] / 10000.0, 6) AS p50,
       round(cuts_scaled[2] / 10000.0, 6) AS p90,
       round(cuts_scaled[3] / 10000.0, 6) AS p99
FROM gqc_cuts
"""


SLIDE_SEC = 3600


def events_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, w_cnt, w_sum): per-user sliding 1-hour RANGE
    window (trailing, inclusive) — event count and DECIMAL-stable value
    sum over every event in the preceding hour.  The range frame rides the
    per-user time sort (one shuffle on user_id, skew bounded by per-user
    event counts); DECIMAL accumulation keeps the sum order-independent so
    Spark and DuckDB agree bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    secs = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-SLIDE_SEC, 0)
    )
    dec = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("w_cnt"),
        F.sum(dec).over(w).cast("double").alias("w_sum"),
    )


def sql_events_sliding_sum() -> str:
    return f"""
SELECT event_id, user_id,
       COUNT(*) OVER w AS w_cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS w_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN {SLIDE_SEC} PRECEDING AND CURRENT ROW)
"""


def events_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_type, event_id, value): the most recent event per
    (user_id, event_type) — CDC/upsert log compaction: replaying a change
    log into current state is exactly this ranked-window keep-latest.
    Ties on ts break by highest event_id (the log sequence number).  One
    shuffle on the compaction key; at 10^12 rows AQE handles hot keys and
    the window never materializes more than a partition."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round("value", 6).alias("value"))
    )


def sql_events_latest_per_key() -> str:
    return """
SELECT user_id, event_type, event_id, round(value, 6) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Interval (range) join: bucketed band join, never per-user quadratic.
# ---------------------------------------------------------------------------

RANGE_WIN_SEC = 600


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, error_id, error_ts_us, click_id, click_ts_us, gap_us):
    every error event paired with each click by the same user strictly
    before it and at most RANGE_WIN_SEC earlier — the classic interval
    join ("what did the user do in the 10 minutes before the error?").

    Spark plans a raw ``t1.ts BETWEEN t2.ts - W AND t2.ts`` predicate as a
    broadcast-nested-loop (or per-user cross) join, so instead both sides
    are keyed on (user_id, time_bucket) with bucket width == the window:
    a qualifying click can only sit in the error's own or the previous
    bucket, so the error side probes exactly two buckets (a 2-element
    explode of the small side of the pair count) and the exact range
    predicate filters after the equi-join.  Per-row fan-out is bounded by
    per-(user, bucket) density — a hot user's history never cross-joins
    with itself across the full retention window.  The DuckDB oracle is
    the plain inequality join (an independent formulation)."""
    win_us = RANGE_WIN_SEC * 1_000_000
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        us.alias("click_ts_us"),
        F.floor(us / win_us).alias("bucket"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        us.alias("error_ts_us"),
        F.explode(
            F.array(F.floor(us / win_us), F.floor(us / win_us) - 1)
        ).alias("bucket"),
    )
    return (
        errors.join(clicks, ["user_id", "bucket"])
        .where(
            (F.col("click_ts_us") < F.col("error_ts_us"))
            & (F.col("click_ts_us") >= F.col("error_ts_us") - win_us)
        )
        .select(
            "user_id",
            "error_id",
            "error_ts_us",
            "click_id",
            "click_ts_us",
            (F.col("error_ts_us") - F.col("click_ts_us")).alias("gap_us"),
        )
    )


def sql_events_range_join() -> str:
    win_us = RANGE_WIN_SEC * 1_000_000
    return f"""
SELECT e.user_id,
       e.event_id AS error_id,
       epoch_us(e.ts) AS error_ts_us,
       c.event_id AS click_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND epoch_us(c.ts) < epoch_us(e.ts)
 AND epoch_us(c.ts) >= epoch_us(e.ts) - {win_us}
"""


# ---------------------------------------------------------------------------
# SCD2 (slowly-changing-dimension type 2) interval build from a change log.
# ---------------------------------------------------------------------------

def events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_type, valid_from_us, valid_to_us): the event stream
    replayed into type-2 dimension history — one validity interval per run
    of consecutive identical event_type values per user, the current
    interval open-ended (NULL valid_to_us).  The classic warehouse pattern
    for crawl/label state over time.

    Gaps-and-islands entirely inside ONE per-user window shuffle: lag marks
    run starts, the runs-only lead supplies the next start.  Interval
    bounds are epoch-microsecond longs (engine-identical hashing, same
    rationale as events_sessionize).  At 10^12 change rows this is a
    single hash exchange on user_id + two in-partition sorted passes."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    starts = ev.withColumn(
        "is_start",
        (prev.isNull() | (prev != F.col("event_type"))).cast("int"),
    ).where(F.col("is_start") == 1)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return starts.select(
        "user_id",
        "event_type",
        us.alias("valid_from_us"),
        F.lead(us).over(w2).alias("valid_to_us"),
    )


def sql_events_scd2() -> str:
    return """
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to_us
FROM marked WHERE is_start = 1
"""


# ---------------------------------------------------------------------------
# Key-skew report: the diagnostic that sizes salting / AQE decisions.
# ---------------------------------------------------------------------------

SKEW_TOPK = 20


def events_key_skew(
    spark: SparkSession, sf_dir: str, topk: int = SKEW_TOPK
) -> DataFrame:
    """(rank, user_id, n_events, pct_of_total, hot_over_median): the
    ``topk`` hottest shuffle keys with their share of total rows and their
    ratio over the median key — the report that decides whether a join
    needs salting (canon.salted_counts) or AQE skew splitting.

    One partial-aggregated count shuffle; the global total and median are
    1-row broadcasts over the (small) per-key count table; the top-k is a
    real TakeOrderedAndProject (sort+limit, distributed partial top-k per
    partition) so the USERS-sized count table never funnels through one
    window task — only the <= topk surviving rows get ranked (bounded
    window: topk rows)."""
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    stats = per_key.agg(
        F.sum("n_events").alias("total"),
        F.median("n_events").alias("med"),
    )
    top = per_key.orderBy(F.col("n_events").desc(), F.col("user_id")).limit(
        topk
    )
    w = exactq.bounded_window(
        "user_id", F.col("n_events").desc(), F.col("user_id")
    )
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "user_id",
            "n_events",
            F.round(
                F.col("n_events").cast("double") / F.col("total") * 100.0, 6
            ).alias("pct_of_total"),
            F.round(
                F.col("n_events").cast("double") / F.col("med"), 6
            ).alias("hot_over_median"),
        )
    )


def sql_events_key_skew(topk: int = SKEW_TOPK) -> str:
    return f"""
WITH per_key AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
),
stats AS (
  SELECT SUM(n_events) AS total, MEDIAN(n_events) AS med FROM per_key
)
SELECT rank, user_id, n_events,
       round(n_events::DOUBLE / total * 100.0, 6) AS pct_of_total,
       round(n_events::DOUBLE / med, 6) AS hot_over_median
FROM (
  SELECT p.*, s.total, s.med,
         ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS rank
  FROM per_key p CROSS JOIN stats s
) WHERE rank <= {topk}
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: segment-filtered 3-table join, grouped revenue, top-k.
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOPK = 10


def tpch_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top unshipped orders by potential revenue for one market
    segment.  Both date filters land in PushedFilters at the parquet
    scans; the customer dim is broadcast; the revenue agg shuffles on
    l_orderkey only for surviving rows; the final top-k is
    TakeOrderedAndProject (no global sort)."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF)
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF)
    )
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    rev = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", us.alias("o_orderdate_us"), "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(Q3_TOPK)
    )


def sql_tpch_top_unshipped() -> str:
    return f"""
SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT {Q3_TOPK}
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: outer-join count distribution.
# ---------------------------------------------------------------------------

def tpch_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer INCLUDING zero-order
    customers (the left outer join + count(non-null) pattern an inner join
    silently gets wrong).  Two map-side-combinable aggregations; the join
    shuffles on custkey once — at 10^12 orders the customer side buckets
    or broadcasts and the count rides the same exchange."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def sql_tpch_order_count_dist() -> str:
    return """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Funnel analysis: ordered view -> click -> purchase conversion per user.
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, n_users): how many users reached each funnel stage IN ORDER
    — a user counts for 'click' only with a click strictly after their
    first view, and for 'purchase' only with a purchase strictly after
    that click.  The product-analytics staple.

    Plan: conditional min-aggregations per user compute the earliest
    qualifying timestamp per stage in ONE groupBy(user_id) shuffle (no
    joins, no window): t1 = min(ts | view), t2 = min(ts | click AND ts >
    t1) needs t1 first, so stages chain as nested aggregates over the same
    grouped rows via min(CASE...) on a second compact pass over the
    per-user event list (collected struct array, row-local fold) — the
    per-user event list is bounded by per-user activity, not the corpus."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("us", "event_type"))
        ).alias("evs")
    )
    t1 = F.aggregate(
        "evs",
        F.lit(None).cast("long"),
        lambda acc, e: F.when(
            acc.isNull() & (e["event_type"] == FUNNEL_STEPS[0]), e["us"]
        ).otherwise(acc),
    )
    stage = per_user.select("user_id", t1.alias("t1"), F.col("evs"))
    t2 = F.aggregate(
        "evs",
        F.lit(None).cast("long"),
        lambda acc, e: F.when(
            acc.isNull()
            & (e["event_type"] == FUNNEL_STEPS[1])
            & F.col("t1").isNotNull()
            & (e["us"] > F.col("t1")),
            e["us"],
        ).otherwise(acc),
    )
    stage = stage.select("user_id", "t1", t2.alias("t2"), "evs")
    t3 = F.aggregate(
        "evs",
        F.lit(None).cast("long"),
        lambda acc, e: F.when(
            acc.isNull()
            & (e["event_type"] == FUNNEL_STEPS[2])
            & F.col("t2").isNotNull()
            & (e["us"] > F.col("t2")),
            e["us"],
        ).otherwise(acc),
    )
    stage = stage.select("user_id", "t1", "t2", t3.alias("t3"))
    return stage.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    ).selectExpr(
        f"stack(3, '{FUNNEL_STEPS[0]}', n1, '{FUNNEL_STEPS[1]}', n2, "
        f"'{FUNNEL_STEPS[2]}', n3) AS (stage, n_users)"
    )


def sql_events_funnel() -> str:
    v, c, p = FUNNEL_STEPS
    return f"""
WITH t1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = '{v}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = '{c}' AND epoch_us(e.ts) > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = '{p}' AND epoch_us(e.ts) > t2.t2
  GROUP BY e.user_id
)
SELECT '{v}' AS stage, (SELECT COUNT(*) FROM t1) AS n_users
UNION ALL SELECT '{c}', (SELECT COUNT(*) FROM t2)
UNION ALL SELECT '{p}', (SELECT COUNT(*) FROM t3)
"""


# ---------------------------------------------------------------------------
# CUBE aggregation (full grouping-sets lattice).
# ---------------------------------------------------------------------------

def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, dow, gid, n_events, sum_value): CUBE over
    (event_type, day-of-week) — all four grouping sets in ONE shuffle
    (Spark expands the lattice inside a single aggregate, not a union of
    four scans).  Completes the OLAP trio with events_rollup and
    events_pivot; gid is the standard grouping-bit encoding."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "dow", F.dayofweek(F.col("ts").cast("timestamp"))
    )
    return (
        ev.cube("event_type", "dow")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select("event_type", "dow", "gid", "n_events", "sum_value")
    )


def sql_events_cube() -> str:
    return """
SELECT event_type, dow,
       GROUPING(event_type, dow) AS gid,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, value, dayofweek(ts) + 1 AS dow FROM events)
GROUP BY CUBE (event_type, dow)
"""


# ---------------------------------------------------------------------------
# Retention cohorts (cohort week x activity-week offset).
# ---------------------------------------------------------------------------

def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_wk, week_offset, n_users): classic retention triangle —
    users grouped by first-activity week, counted in each later week they
    were active.  Week index is epoch-days // 7 (a pure integer, so the
    bucketing is engine- and timezone-identical; calendar week functions
    differ between engines).

    Plan: distinct (user, wk) rides one shuffle; the per-user cohort min
    is a second partial agg on the SAME user key; the final (cohort,
    offset) count is map-side combinable.  No windows, no joins against
    the raw event log."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         / F.lit(7 * 86_400_000_000)).cast("long").alias("wk"),
    ).distinct()
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ev.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def sql_events_retention() -> str:
    wk = f"epoch_us(ts) // {7 * 86_400_000_000}"
    return f"""
WITH uw AS (SELECT DISTINCT user_id, {wk} AS wk FROM events),
cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id)
SELECT c.cohort_wk, u.wk - c.cohort_wk AS week_offset,
       COUNT(DISTINCT u.user_id) AS n_users
FROM uw u JOIN cohort c ON u.user_id = c.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional-aggregate promo revenue share.
# ---------------------------------------------------------------------------

def tpch_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(promo_revenue_pct, promo_rev, total_rev): the share of lineitem
    revenue from PROMO-type parts — the conditional-aggregate-over-a-join
    shape (CASE inside SUM, not a second scan).  The part dim broadcasts;
    one exchange total for the global aggregate; DECIMAL-stable sums with
    the ratio computed from the rounded doubles identically in both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(promo).cast("double").alias("promo_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6
        ).alias("promo_revenue_pct"),
        "promo_rev",
        "total_rev",
    )


def sql_tpch_promo_revenue() -> str:
    return """
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1.0 - l_discount)
                            AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_rev,
    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
         AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT round(100.0 * promo_rev / total_rev, 6) AS promo_revenue_pct,
       promo_rev, total_rev
FROM agg
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING-gated large orders.
# ---------------------------------------------------------------------------

Q18_QTY = 150


def tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, o_totalprice, sum_qty): orders whose total lineitem
    quantity exceeds the HAVING threshold, hydrated with the order row —
    the aggregate-then-semi-join pattern (the heavy lineitem agg runs
    once; the orders join touches only qualifying keys)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty")
        )
        .where(F.col("sum_qty") > Q18_QTY)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .select("o_orderkey", "o_totalprice", "sum_qty")
    )


def sql_tpch_large_orders() -> str:
    return f"""
SELECT o_orderkey, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > {Q18_QTY}
) q ON o_orderkey = q.l_orderkey
"""


# ---------------------------------------------------------------------------
# Windowed z-score anomaly detection.
# ---------------------------------------------------------------------------

ZSCORE_MIN_N = 5
ZSCORE_TAU = 3.0


def events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, value, z): events whose value deviates more
    than ZSCORE_TAU population standard deviations from that user's OWN
    prior history (expanding frame up to the previous row — the causal
    formulation a live monitor uses; including the current row would
    dilute its own anomaly).  Users need ZSCORE_MIN_N prior events before
    scoring.  One per-user sort shuffle; mean/stddev ride the same window
    frame."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    n = F.count("value").over(w)
    z = (F.col("value") - mu) / sd
    return (
        ev.select("event_id", "user_id", "value", n.alias("n_prior"), z.alias("zr"))
        .where((F.col("n_prior") >= ZSCORE_MIN_N) & (F.abs("zr") > ZSCORE_TAU))
        .select("event_id", "user_id", F.round("value", 6).alias("value"),
                F.round("zr", 4).alias("z"))
    )


def sql_events_zscore() -> str:
    return f"""
SELECT event_id, user_id, round(value, 6) AS value, round(z, 4) AS z
FROM (
  SELECT event_id, user_id, value,
         COUNT(value) OVER w AS n_prior,
         (value - AVG(value) OVER w) / stddev_pop(value) OVER w AS z
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
WHERE n_prior >= {ZSCORE_MIN_N} AND abs(z) > {ZSCORE_TAU}
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier per nation (two-level revenue rollup).
# ---------------------------------------------------------------------------

def tpch_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, nation_revenue, top_supplier, top_supplier_rev): per-nation
    lineitem revenue with each nation's highest-revenue supplier — the
    Q15 two-level rollup (fine agg on (nation, supplier), then the
    per-nation total and argmax ride the SAME shuffled key prefix, no
    second corpus pass).  Supplier and nation dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    fine = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "s_suppkey", "s_name")
        .agg(F.sum(rev).cast("double").alias("srev"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("srev").desc(), F.col("s_suppkey")
    )
    return (
        fine.withColumn("rk", F.row_number().over(w))
        .groupBy("n_name")
        .agg(
            F.round(F.sum("srev"), 6).alias("nation_revenue"),
            F.max(F.when(F.col("rk") == 1, F.col("s_name"))).alias(
                "top_supplier"
            ),
            F.round(
                F.max(F.when(F.col("rk") == 1, F.col("srev"))), 6
            ).alias("top_supplier_rev"),
        )
    )


def sql_tpch_supplier_revenue() -> str:
    return """
WITH fine AS (
  SELECT n_name, s_suppkey, s_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS srev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey, s_name
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
                               ORDER BY srev DESC, s_suppkey) AS rk
  FROM fine
)
SELECT n_name,
       round(SUM(srev), 6) AS nation_revenue,
       MAX(CASE WHEN rk = 1 THEN s_name END) AS top_supplier,
       round(MAX(CASE WHEN rk = 1 THEN srev END), 6) AS top_supplier_rev
FROM ranked GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch (the 10^12-row percentile path).
# ---------------------------------------------------------------------------

QSK_BIN = 4.0  # bin width in value units


def events_quantile_sketch(
    spark: SparkSession, sf_dir: str, bin_w: float = QSK_BIN
) -> DataFrame:
    """(event_type, n, p50_est, p90_est, p99_est, max_err): per-type
    quantile estimates from a fixed-width histogram sketch — the mergeable
    counterpart of ``events_percentiles``'s exact per-group sorted buffer.
    At 10^12 rows an exact percentile cannot hold the group in memory; a
    histogram of B counters per group is one map-side-combinable shuffle,
    mergeable across partitions/days/retries, with error bounded a priori
    by the bin width (reported as ``max_err``).

    Estimate rule (deterministic both engines): the quantile-q estimate is
    the LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q*n); the true value lies within [est, est + bin_w).  The
    cumulative scan is a per-type window over <= B rows riding the
    groupBy(type, bin) shuffle."""
    ev = _t(spark, sf_dir, "events")
    binned = (
        ev.select(
            "event_type",
            F.floor(F.col("value") / bin_w).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = binned.select(
        "event_type",
        "bin",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.partitionBy("event_type").orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )

    def est(q: float):
        hit = F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bin")
        )
        return (F.min(hit) * bin_w).alias(f"p{int(q * 100)}_est")

    return (
        cum.groupBy("event_type")
        .agg(F.max("n").alias("n"), est(0.5), est(0.9), est(0.99))
        .select(
            "event_type",
            "n",
            "p50_est",
            "p90_est",
            "p99_est",
            F.lit(bin_w).alias("max_err"),
        )
    )


def sql_events_quantile_sketch(bin_w: float = QSK_BIN) -> str:
    def est(q: float) -> str:
        return (
            f"MIN(CASE WHEN cum >= ceil({q} * n) THEN bin END) * {bin_w} "
            f"AS p{int(q * 100)}_est"
        )

    return f"""
WITH b AS (
  SELECT event_type, CAST(floor(value / {bin_w}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
cumt AS (
  SELECT event_type, bin,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM b
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       {est(0.5)}, {est(0.9)}, {est(0.99)},
       {bin_w} AS max_err
FROM cumt GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Z-order clustering key (multi-dimensional data layout).
# ---------------------------------------------------------------------------

Z_BITS = 8


def events_zorder_key(
    spark: SparkSession, sf_dir: str, bits: int = Z_BITS
) -> DataFrame:
    """(event_id, user_bucket, time_bucket, zkey): the interleaved-bit
    Z-order key over (user_id, event hour) — the clustering key a 100 TB
    events table is range-partitioned and sorted by so that BOTH per-user
    and per-time-range predicates prune files (the Delta/Iceberg
    OPTIMIZE ZORDER layout, computed here as a pure projection).  A table
    laid out by zkey serves user-scoped scans and time-window scans from
    O(hit) files each; laying out by either column alone makes the other
    predicate a full scan.

    Map-only exact integer bit arithmetic (unrolled shifts — no UDF, no
    shuffle); at write time you'd ``repartitionByRange(zkey)`` and sort
    within partitions, which adds the one range exchange any clustered
    write pays."""
    ev = _t(spark, sf_dir, "events")
    xb = (F.col("user_id") % (1 << bits)).cast("long")
    hours = (F.col("ts").cast("timestamp").cast("long") / 3600).cast("long")
    yb = (hours % (1 << bits)).cast("long")
    z = None
    for i in range(bits):
        xbit = F.shiftright(xb, i).bitwiseAND(F.lit(1)) * (1 << (2 * i))
        ybit = F.shiftright(yb, i).bitwiseAND(F.lit(1)) * (1 << (2 * i + 1))
        z = xbit + ybit if z is None else z + xbit + ybit
    return ev.select(
        "event_id",
        xb.alias("user_bucket"),
        yb.alias("time_bucket"),
        z.cast("long").alias("zkey"),
    )


def sql_events_zorder_key(bits: int = Z_BITS) -> str:
    xb = f"(user_id % {1 << bits})"
    yb = f"((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % {1 << bits})"
    terms = []
    for i in range(bits):
        terms.append(f"(({xb} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({yb} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    z = " + ".join(terms)
    return f"""
SELECT event_id,
       CAST({xb} AS BIGINT) AS user_bucket,
       CAST({yb} AS BIGINT) AS time_bucket,
       CAST({z} AS BIGINT) AS zkey
FROM events
"""


# ---------------------------------------------------------------------------
# Bloom-filter join pruning (runtime-filter pattern, built explicitly).
# ---------------------------------------------------------------------------

BLOOM_WORDS = 128   # 32 usable bits per word -> 4096-bit filter
BLOOM_K = 2         # hash functions
BLOOM_NATION = 3    # the dim predicate: suppliers of this nation


def _bloom_cells(key_col, k: int = BLOOM_K):
    """(word, mask) pairs for a key — k md5-derived bit positions in a
    WORDS x 32-bit bitset (32 bits keeps every mask positive in a signed
    BIGINT, identical in DuckDB).  Engine-portable: the same md5 idiom as
    the count-min sketch."""
    def bitpos(j: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{j}|"), key_col.cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % (BLOOM_WORDS * 32)
        )

    return [
        (
            (bitpos(j) / 32).cast("long"),
            # dynamic shift: 2^b as an exact double (b <= 31), cast back
            F.pow(F.lit(2.0), bitpos(j) % 32).cast("long"),
        )
        for j in range(k)
    ]


def bloom_prune_suppliers(
    spark: SparkSession, sf_dir: str, nation: int = BLOOM_NATION
) -> DataFrame:
    """(l_suppkey, in_bloom, in_dim): per probe key, whether the Bloom
    filter built from nation-``nation`` suppliers admits it vs whether it
    truly qualifies — the runtime-filter pattern (Spark's AQE
    InSubqueryExec / Iceberg bloom pushdown) built explicitly so its
    behaviour is testable: NO false negatives ever, false positives shrink
    the scan instead of gating correctness (the real join downstream still
    decides).

    Scale shape: the filter build is one partial-agg shuffle of <= WORDS
    bit_or rows over the (small) dim side; the W-row bitset broadcasts to
    the probe scan, where membership is a map-side bitwise AND — the fact
    table is never shuffled to discover that 97% of it joins nothing.
    Exact integer/bit arithmetic -> bit-identical oracle."""
    sup = _t(spark, sf_dir, "supplier").where(
        F.col("s_nationkey") == nation
    )

    def cells_col(key_col):
        # both hash cells in ONE projection (single scan of each side)
        return F.explode(
            F.array(
                *[
                    F.struct(w.alias("word"), m.alias("mask"))
                    for w, m in _bloom_cells(key_col)
                ]
            )
        ).alias("c")

    sketch = (
        sup.select(cells_col(F.col("s_suppkey")))
        .select("c.word", "c.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )

    probes = (
        _t(spark, sf_dir, "lineitem").select("l_suppkey").distinct()
    )
    hit = (
        probes.select("l_suppkey", cells_col(F.col("l_suppkey")))
        .select(
            "l_suppkey",
            F.col("c.word").alias("word"),
            F.col("c.mask").alias("mask"),
        )
        .join(F.broadcast(sketch), "word", "left")
        .select(
            "l_suppkey",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                != 0
            ).alias("h"),
        )
    )
    in_bloom = hit.groupBy("l_suppkey").agg(
        F.min(F.col("h").cast("int")).cast("boolean").alias("in_bloom")
    )
    truth = sup.select(F.col("s_suppkey").alias("l_suppkey")).distinct()
    return (
        in_bloom.join(
            truth.withColumn("in_dim", F.lit(True)), "l_suppkey", "left"
        )
        .select(
            "l_suppkey",
            "in_bloom",
            F.coalesce("in_dim", F.lit(False)).alias("in_dim"),
        )
    )


def sql_bloom_prune_suppliers(nation: int = BLOOM_NATION) -> str:
    def bitpos(j: int, key: str) -> str:
        return (
            f"(CAST('0x' || substring(md5('{j}|' || CAST({key} AS VARCHAR)),"
            f" 1, 15) AS BIGINT) % {BLOOM_WORDS * 32})"
        )

    def cell(j: int, key: str) -> str:
        return (
            f"SELECT {bitpos(j, key)} // 32 AS word, "
            f"(CAST(1 AS BIGINT) << CAST({bitpos(j, key)} % 32 AS INTEGER))"
            f" AS mask"
        )

    dim_cells = " UNION ALL ".join(
        f"{cell(j, 's_suppkey')} FROM dim" for j in range(BLOOM_K)
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT l_suppkey, w.word, w.mask FROM probes, "
        f"LATERAL ({cell(j, 'l_suppkey')}) w"
        for j in range(BLOOM_K)
    )
    return f"""
WITH dim AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = {nation}),
sketch AS (
  SELECT word, bit_or(mask) AS bits FROM ({dim_cells}) GROUP BY word
),
probes AS (SELECT DISTINCT l_suppkey FROM lineitem),
pc AS ({probe_cells}),
hits AS (
  SELECT l_suppkey,
         (COALESCE(s.bits, 0) & pc.mask) <> 0 AS h
  FROM pc LEFT JOIN sketch s USING (word)
),
ib AS (
  SELECT l_suppkey, CAST(MIN(CAST(h AS INTEGER)) AS BOOLEAN) AS in_bloom
  FROM hits GROUP BY 1
)
SELECT ib.l_suppkey, ib.in_bloom,
       (d.s_suppkey IS NOT NULL) AS in_dim
FROM ib LEFT JOIN dim d ON ib.l_suppkey = d.s_suppkey
"""


# ---------------------------------------------------------------------------
# Marketing attribution: first/last-touch click per purchase.
# ---------------------------------------------------------------------------

ATTR_SEC = 86_400  # attribution lookback (24h)


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, first_click_id, last_click_id, n_clicks): for
    every purchase, the first- and last-touch click in the preceding
    ATTR_SEC window (strictly earlier), plus the window's click count —
    first/last-touch attribution in ONE per-user window pass.

    Plan shape: no purchase x click self-join (the naive formulation —
    quadratic per user); instead every event rides one partitionBy(user)
    RANGE window ordered by event time, with the click extrema computed as
    conditional min/max over the time-bounded frame.  One exchange total;
    per-user skew is bounded by per-user event counts like
    events_sliding_sum.  Determinism: extrema are taken over a
    zero-padded (timestamp, event_id) string encoding, so same-instant
    clicks tie-break identically in both engines."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    enc = F.when(
        F.col("event_type") == "click",
        F.concat(
            F.lpad(F.col("us").cast("string"), 20, "0"),
            F.lit("|"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ATTR_SEC * 1_000_000, -1)
    )
    base = ev.select(
        "event_id", "user_id", "event_type", us.alias("us")
    ).withColumn("click_enc", enc)
    dec = lambda c: F.substring(c, 22, 12).cast("long")  # noqa: E731
    return (
        base.select(
            "event_id",
            "user_id",
            "event_type",
            F.min("click_enc").over(w).alias("fc"),
            F.max("click_enc").over(w).alias("lc"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .over(w)
            .alias("n_clicks"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            dec(F.col("fc")).alias("first_click_id"),
            dec(F.col("lc")).alias("last_click_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        )
    )


def sql_events_attribution() -> str:
    return f"""
WITH base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type = 'click' THEN
           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0')
         END AS click_enc
  FROM events
),
win AS (
  SELECT event_id, user_id, event_type,
         MIN(click_enc) OVER w AS fc,
         MAX(click_enc) OVER w AS lc,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
           AS n_clicks
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {ATTR_SEC * 1_000_000} PRECEDING
                 AND 1 PRECEDING)
)
SELECT event_id, user_id,
       CAST(substring(fc, 22, 12) AS BIGINT) AS first_click_id,
       CAST(substring(lc, 22, 12) AS BIGINT) AS last_click_id,
       CAST(COALESCE(n_clicks, 0) AS BIGINT) AS n_clicks
FROM win WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: cheapest supplier per part (correlated-min join-back).
# ---------------------------------------------------------------------------

MINCOST_REGION = "EUROPE"
MINCOST_PTYPE = "STANDARD"


def tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_partkey, p_name, s_name, min_price): for each STANDARD-type part,
    the supplier(s) whose EUROPE-region lineitem hit the minimum extended
    price — the Q2 correlated-subquery shape, decorrelated as
    groupBy-min + join-back (Catalyst's own strategy for scalar-agg
    correlation).  MIN over doubles is exact (no accumulation), so the
    join-back equality and the oracle hash are both safe.

    Scale: supplier⋈nation⋈region and part are broadcast dims; the fact
    table is scanned once, and the min aggregate + join-back reuse the
    same l_partkey hash partitioning (one exchange, two consumers)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    eur = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == MINCOST_REGION)
        .select("s_suppkey", "s_name")
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == MINCOST_PTYPE)
        .select("p_partkey", "p_name")
    )
    li_eur = li.join(
        F.broadcast(eur), li["l_suppkey"] == F.col("s_suppkey")
    ).join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"))
    pmin = li_eur.groupBy("p_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li_eur.join(
            pmin.withColumnRenamed("p_partkey", "pk"),
            (li_eur["p_partkey"] == F.col("pk"))
            & (li_eur["l_extendedprice"] == F.col("min_price")),
        )
        .select("p_partkey", "p_name", "s_name", "min_price")
        .distinct()
    )


def sql_tpch_min_cost_supplier() -> str:
    return f"""
WITH eur AS (
  SELECT s_suppkey, s_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MINCOST_REGION}'
),
li_eur AS (
  SELECT p.p_partkey, p.p_name, e.s_name, l.l_extendedprice
  FROM lineitem l
  JOIN eur e ON l.l_suppkey = e.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = '{MINCOST_PTYPE}'
),
pmin AS (
  SELECT p_partkey, MIN(l_extendedprice) AS min_price
  FROM li_eur GROUP BY p_partkey
)
SELECT DISTINCT li.p_partkey, li.p_name, li.s_name, pm.min_price
FROM li_eur li
JOIN pmin pm ON li.p_partkey = pm.p_partkey
            AND li.l_extendedprice = pm.min_price
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who alone held up multi-supplier orders.
# ---------------------------------------------------------------------------

WAIT_LATE_DAYS = 90
WAIT_TOPK = 10


def tpch_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_name, numwait): suppliers who were the ONLY late shipper
    (l_shipdate > o_orderdate + 90 days) in orders that involved at least
    two suppliers — the Q21 exists/not-exists shape, folded into a single
    per-order aggregate (n_suppliers, n_late_suppliers, the lone late
    suppkey) instead of two correlated subqueries.

    Scale: one shuffle join lineitem⋈orders on the order key feeds a
    groupBy on the SAME key (exchange reused); the two COUNT(DISTINCT)s
    expand in one aggregate pass; the final per-supplier count joins a
    broadcast supplier dim and TakeOrdered's the top-k."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {WAIT_LATE_DAYS} DAYS"
    )
    per_order = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(
            F.broadcast(supp), per_order["late_supp"] == supp["s_suppkey"]
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(WAIT_TOPK)
    )


def sql_tpch_waiting_orders() -> str:
    return f"""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate
                                  + INTERVAL {WAIT_LATE_DAYS} DAY
                             THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN l_shipdate > o_orderdate
                       + INTERVAL {WAIT_LATE_DAYS} DAY
                  THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {WAIT_TOPK}
"""


# ---------------------------------------------------------------------------
# Markov transition model over per-user event sequences.
# ---------------------------------------------------------------------------

MKV_PPM = 1_000_000


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, event_type, n, p_ppm): first-order Markov transition
    counts over each user's time-ordered event stream, with the row
    probability integer-quantized to parts-per-million (n * 1e6 div
    row_total) so the result is exact cross-engine — the transition
    matrix behind next-event prediction and funnel simulation.

    Scale: one per-user window (lag) on the event shuffle and one
    map-side-combinable pair count touch the full stream; the normalizer
    window then exchanges only the aggregated |types|^2 count table —
    negligible next to the stream shuffles.  Ties at equal timestamps
    break by event_id."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNotNull()
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.expr(f"n * {MKV_PPM} div sum(n) over (partition by prev_type)")
        .cast("bigint")
        .alias("p_ppm"),
    )


def sql_events_markov_transitions() -> str:
    return f"""
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type
  FROM events
),
counts AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       CAST(n * {MKV_PPM} // SUM(n) OVER (PARTITION BY prev_type)
            AS BIGINT) AS p_ppm
FROM counts
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: revenue lost to small-quantity orders.
# ---------------------------------------------------------------------------

Q17_BRANDS = ("Brand#1", "Brand#2")


def tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, n_small, avg_yearly): for each tracked brand, the yearly
    average revenue of lineitems whose quantity is below 20% of that
    part's average order quantity — the Q17 correlated-AVG shape,
    decorrelated as a per-part aggregate + join-back.  The 20% threshold
    compares in integer micros (5 * qty_u * cnt < sum_qty_u), so the
    predicate is exact and engine-identical; only the final reporting
    average goes through (deterministic) decimal-then-double math.

    Scale: part dim broadcast; the per-part aggregate and the join-back
    reuse the same l_partkey partitioning — one fact-table exchange."""
    qty_u = F.round(F.col("l_quantity") * 1_000_000).cast("bigint")
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_extendedprice", qty_u.alias("qty_u"))
        .join(
            F.broadcast(
                _t(spark, sf_dir, "part")
                .where(F.col("p_brand").isin(list(Q17_BRANDS)))
                .select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    stats = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty_u").alias("sum_qty_u"), F.count(F.lit(1)).alias("cnt")
    )
    small = li.join(stats, li["l_partkey"] == stats["pk"]).where(
        F.lit(5) * F.col("qty_u") * F.col("cnt") < F.col("sum_qty_u")
    )
    return small.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_small"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            / 7.0,
            4,
        ).alias("avg_yearly"),
    )


def sql_tpch_small_qty_revenue() -> str:
    brands = ", ".join(f"'{b}'" for b in Q17_BRANDS)
    return f"""
WITH li AS (
  SELECT l.l_partkey, l.l_extendedprice, p.p_brand,
         CAST(round(l.l_quantity * 1000000) AS BIGINT) AS qty_u
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand IN ({brands})
),
stats AS (
  SELECT l_partkey AS pk, CAST(SUM(qty_u) AS BIGINT) AS sum_qty_u,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM li GROUP BY l_partkey
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_small,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0, 4) AS avg_yearly
FROM li JOIN stats ON li.l_partkey = stats.pk
WHERE 5 * qty_u * cnt < sum_qty_u
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between nation pairs.
# ---------------------------------------------------------------------------

Q7_NATIONS = ("NATION_1", "NATION_2", "NATION_3", "NATION_4")
Q7_YEARS = (1996, 1997)


def tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(supp_nation, cust_nation, l_year, revenue): cross-border revenue
    between tracked nation pairs over a two-year window — the Q7 shape.
    Two independent dimension chains (supplier->nation, orders->customer->
    nation) hang off the fact table; all four dims broadcast, so the only
    exchanges are the two fact-side equi-joins' and the final
    (supp, cust, year)-group shuffle.  The nation filter is applied INSIDE
    each broadcast dim (before the join), so ineligible lineitems are
    dropped at the join, never aggregated.  Revenue sums in DECIMAL
    (exact, order-independent) and reports as double."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(list(Q7_YEARS))
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name").isin(list(Q7_NATIONS)))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        _t(spark, sf_dir, "customer")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name").isin(list(Q7_NATIONS)))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders_c = _t(spark, sf_dir, "orders").join(
        F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey")
    )
    rev = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_c, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def sql_tpch_volume_shipping() -> str:
    nations = ", ".join(f"'{n}'" for n in Q7_NATIONS)
    years = ", ".join(str(y) for y in Q7_YEARS)
    return f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE year(l_shipdate) IN ({years})
  AND sn.n_name IN ({nations}) AND cn.n_name IN ({nations})
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: above-average-balance customers with no orders.
# ---------------------------------------------------------------------------

Q22_PRIORITY = "1-URGENT"


def tpch_above_avg_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, n_custs, total_acctbal): per nation, the count and balance
    mass of customers whose account balance exceeds the positive-balance
    global mean AND who have never placed an urgent-priority order — the
    Q22 shape (scalar subquery + anti join over a filtered order subset).
    The global mean is one broadcast row; the threshold compares in
    integer micros (bal_u * cnt > sum_u), so the cut is exact and
    engine-identical with no double-average drift.  The priority filter
    pushes into the orders scan and the anti join shuffles only the
    surviving o_custkey column; the nation dim broadcasts."""
    bal_u = F.round(F.col("c_acctbal") * 1_000_000).cast("bigint")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", bal_u.alias("bal_u")
    )
    stats = cust.where(F.col("bal_u") > 0).agg(
        F.sum("bal_u").alias("sum_u"), F.count(F.lit(1)).alias("cnt")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == Q22_PRIORITY)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    rich = (
        cust.crossJoin(F.broadcast(stats))
        .where(F.col("bal_u") * F.col("cnt") > F.col("sum_u"))
        .join(orders, "c_custkey", "left_anti")
    )
    return (
        rich.join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


def sql_tpch_above_avg_no_orders() -> str:
    return f"""
WITH cust AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(round(c_acctbal * 1000000) AS BIGINT) AS bal_u
  FROM customer
),
stats AS (
  SELECT CAST(SUM(bal_u) AS BIGINT) AS sum_u, COUNT(*) AS cnt
  FROM cust WHERE bal_u > 0
),
rich AS (
  SELECT c.* FROM cust c, stats s
  WHERE c.bal_u * s.cnt > s.sum_u
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '{Q22_PRIORITY}')
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
FROM rich JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region.
# ---------------------------------------------------------------------------

Q8_TARGET_NATION = "NATION_1"
Q8_REGION = "ASIA"


def tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_year, total_rev, target_rev, mkt_share): per order year, the
    revenue share supplied by Q8_TARGET_NATION among all lineitems sold
    to customers in Q8_REGION — the Q8 conditional-aggregate-ratio shape.
    Supplier nation rides a broadcast dim into a CASE inside the same
    grouped aggregate (one pass, no second join-back); both revenue sums
    are DECIMAL (exact, order-independent), so the final share is one
    deterministic double division."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    cust_r = (
        _t(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders_r = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(cust_r), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    rev = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_r, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.sum(rev).alias("tot"),
            F.sum(
                F.when(F.col("supp_nation") == Q8_TARGET_NATION, rev).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            ).alias("tgt"),
        )
        .select(
            "o_year",
            F.col("tot").cast("double").alias("total_rev"),
            F.col("tgt").cast("double").alias("target_rev"),
            F.round(
                F.col("tgt").cast("double") / F.col("tot").cast("double"), 6
            ).alias("mkt_share"),
        )
    )


def sql_tpch_market_share() -> str:
    return f"""
WITH cust_r AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q8_REGION}'
),
base AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)) AS rev,
         n_name AS supp_nation
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN cust_r ON o_custkey = c_custkey
)
SELECT CAST(o_year AS INT) AS o_year,
       CAST(SUM(rev) AS DOUBLE) AS total_rev,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_TARGET_NATION}' THEN rev
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         AS target_rev,
       round(CAST(SUM(CASE WHEN supp_nation = '{Q8_TARGET_NATION}' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
FROM base
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue by customer.
# ---------------------------------------------------------------------------

Q10_TOPK = 20


def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, c_name, n_name, lost_revenue): the top customers by
    revenue on RETURNED lineitems — the Q10 shape (fact filter ->
    customer rollup -> top-k).  The returnflag predicate pushes into the
    lineitem scan; the orders join hydrates only returned lineitems; the
    customer/nation dims broadcast onto the aggregated per-customer rows.
    Top-k is TakeOrdered (revenue desc, custkey asc — deterministic),
    DECIMAL revenue sums reported as double."""
    rev = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", rev.alias("rev"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("lost"))
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("lost").cast("double").alias("lost_revenue"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(Q10_TOPK)
    )


def sql_tpch_returned_items() -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
           AS lost
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name, CAST(lost AS DOUBLE) AS lost_revenue
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT {Q10_TOPK}
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive predicate revenue.
# ---------------------------------------------------------------------------

Q19_CLAUSES = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#13", 1, 15, 0.0, 25.0),
    ("Brand#19", 5, 30, 10.0, 40.0),
)


def tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_items, revenue): revenue from lineitems matching EITHER of two
    brand/size/quantity clause conjunctions — the Q19 OR-of-ANDs shape.
    The part-side conjuncts (brand, size) evaluate inside the broadcast
    dim BEFORE the join, so only possibly-qualifying parts ship; the
    mixed part+lineitem disjunction evaluates as one JVM boolean
    expression post-join (Catalyst additionally pushes the derived
    brand-IN superset into both scans).  DECIMAL revenue sum; quantity
    bounds compare in integer micros (exact)."""
    part_pred = None
    for b, slo, shi, _, _ in Q19_CLAUSES:
        c = (F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
        part_pred = c if part_pred is None else (part_pred | c)
    part = (
        _t(spark, sf_dir, "part")
        .where(part_pred)
        .select("p_partkey", "p_brand", "p_size")
    )
    qty_u = F.round(F.col("l_quantity") * 1_000_000).cast("bigint")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        qty_u.alias("qty_u"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
        .alias("rev"),
    )
    full = None
    for b, slo, shi, qlo, qhi in Q19_CLAUSES:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("qty_u").between(int(qlo * 1e6), int(qhi * 1e6))
        )
        full = c if full is None else (full | c)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(full)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


def sql_tpch_disjunctive_revenue() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND CAST(round(l_quantity * 1000000) AS BIGINT)"
        f" BETWEEN {int(qlo * 1e6)} AND {int(qhi * 1e6)})"
        for b, slo, shi, qlo, qhi in Q19_CLAUSES
    )
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {ors}
"""


# ---------------------------------------------------------------------------
# Winsorization (percentile-capped outlier cleaning).
# ---------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.01, 0.99


def events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, n_capped_lo, n_capped_hi, sum_winsorized): per-type
    value winsorization at the exact [p01, p99] — the standard outlier
    clamp a metrics pipeline applies before averaging.  The per-type cut
    points are one grouped exact-percentile aggregate (group-count-sized)
    broadcast back over the events; the clamp is a row-local
    least/greatest, and the winsorized sum accumulates in DECIMAL
    (order-independent).  At unbounded type cardinality swap in
    approx_percentile; plan unchanged."""
    # all-integer lane (exactq): values -> cents, p01/p99 cuts in units of
    # cents*100 (den=100 -> dollars*10000).  Cap flags and the clamp are
    # exact bigint comparisons; the winsorized sum accumulates in scaled
    # bigints (order-independent) and divides once for display.
    lo_num = round(WINSOR_LO * 100)
    hi_num = round(WINSOR_HI * 100)
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cuts = exactq.grouped_quantile_cuts_scaled(
        ev, "event_type", "cents", [lo_num, hi_num], 100
    ).select(
        "event_type",
        F.element_at("cuts_scaled", 1).alias("lo_s"),
        F.element_at("cuts_scaled", 2).alias("hi_s"),
    )
    v_s = F.lit(100) * F.col("cents")
    w_s = F.least(F.greatest(v_s, F.col("lo_s")), F.col("hi_s"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .select(
            "event_type",
            (v_s < F.col("lo_s")).cast("int").alias("c_lo"),
            (v_s > F.col("hi_s")).cast("int").alias("c_hi"),
            w_s.alias("wv_s"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c_lo").cast("bigint").alias("n_capped_lo"),
            F.sum("c_hi").cast("bigint").alias("n_capped_hi"),
            # decimal(38,0) accumulator: sum of dollars*1e4 units clears
            # int64 around 10^12 rows (DuckDB side is HUGEINT already)
            F.round(
                F.sum(F.col("wv_s").cast("decimal(38,0)")).cast("double")
                / 10_000.0,
                4,
            ).alias("sum_winsorized"),
        )
    )


def sql_events_winsorize() -> str:
    lo_num = round(WINSOR_LO * 100)
    hi_num = round(WINSOR_HI * 100)
    return f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
{exactq.sql_grouped_cuts_cte("ev", "event_type", "cents",
                             [lo_num, hi_num], 100, prefix="wq")},
cuts AS (
  SELECT event_type, cuts_scaled[1] AS lo_s, cuts_scaled[2] AS hi_s
  FROM wq_cuts
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN 100 * e.cents < c.lo_s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_capped_lo,
       CAST(SUM(CASE WHEN 100 * e.cents > c.hi_s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_capped_hi,
       round(SUM(least(greatest(100 * e.cents, c.lo_s), c.hi_s))
             / 10000.0, 4)
         AS sum_winsorized
FROM ev e JOIN cuts c USING (event_type)
GROUP BY e.event_type
"""


# ---------------------------------------------------------------------------
# Robust (median/MAD) anomaly detection.
# ---------------------------------------------------------------------------

MAD_K = 3.0


def events_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, median, mad, n_anomalies): per-type robust outlier
    count — |value - median| > K * MAD (median absolute deviation).
    Unlike the mean/stddev z-score (events_zscore), one extreme value
    cannot drag the threshold, so it survives heavy-tailed telemetry.
    Two grouped exact-percentile passes (median, then MAD over the
    residuals), each group-count-sized and broadcast back; the flag is a
    row-local comparison of identically-computed doubles."""
    # all-integer lane (exactq): values -> cents; the median of ints is a
    # half-integer -> med_scaled in HALF-CENTS (den=2); residuals are then
    # exact half-cent bigints; the MAD median lands in QUARTER-CENTS.
    # The anomaly flag |v-med| > K*mad becomes 2*r_hc > K*mad_scaled —
    # exact bigint both engines (K integral).
    k_int = int(MAD_K)
    assert k_int == MAD_K, "MAD_K must stay integral for the exact lane"
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    med = exactq.grouped_quantile_cuts_scaled(
        ev, "event_type", "cents", [1], 2
    ).select(
        "event_type",
        F.element_at("cuts_scaled", 1).alias("med_scaled"),
    )
    resid = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_scaled",
        F.abs(F.lit(2) * F.col("cents") - F.col("med_scaled")).alias(
            "r_hc"
        ),
    )
    mad = exactq.grouped_quantile_cuts_scaled(
        resid, "event_type", "r_hc", [1], 2
    ).select(
        "event_type",
        F.element_at("cuts_scaled", 1).alias("mad_scaled"),
    )
    return (
        resid.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.first("med_scaled") / 200.0, 6).alias("median"),
            F.round(F.first("mad_scaled") / 400.0, 6).alias("mad"),
            F.sum(
                (
                    F.lit(2) * F.col("r_hc")
                    > F.lit(k_int) * F.col("mad_scaled")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


def sql_events_robust_zscore() -> str:
    k_int = int(MAD_K)
    return f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
{exactq.sql_grouped_cuts_cte("ev", "event_type", "cents", [1], 2,
                             prefix="mq")},
med AS (
  SELECT event_type, cuts_scaled[1] AS med_scaled FROM mq_cuts
),
resid AS (
  SELECT e.event_type, m.med_scaled,
         abs(2 * e.cents - m.med_scaled) AS r_hc
  FROM ev e JOIN med m USING (event_type)
),
{exactq.sql_grouped_cuts_cte("resid", "event_type", "r_hc", [1], 2,
                             prefix="dq")},
mad AS (
  SELECT event_type, cuts_scaled[1] AS mad_scaled FROM dq_cuts
)
SELECT r.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(ANY_VALUE(r.med_scaled) / 200.0, 6) AS median,
       round(ANY_VALUE(d.mad_scaled) / 400.0, 6) AS mad,
       CAST(SUM(CASE WHEN 2 * r.r_hc > {k_int} * d.mad_scaled
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies
FROM resid r JOIN mad d USING (event_type)
GROUP BY r.event_type
"""

# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority checking (EXISTS semi-join).
# ---------------------------------------------------------------------------

Q4_YEAR = 1996
Q4_LATE_DAYS = 30


def tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, order_count): orders placed in Q4_YEAR that had at
    least one lineitem shipped more than Q4_LATE_DAYS after the order date
    (the testdata has no l_commitdate/l_receiptdate, so ship-lateness vs
    o_orderdate stands in for the reference predicate) — the Q4
    EXISTS-correlated-subquery shape, decorrelated as a LEFT SEMI join.

    Scale: the year filter is a min/max-prunable pushed predicate on the
    orders scan; the semi join is an equi-join on l_orderkey with the
    lateness conjunct evaluated as a join residual, so lineitem rows are
    never materialized past the first match per order.  The final
    aggregate groups 5 priority values — map-side partial agg collapses it
    before the shuffle."""
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == Q4_YEAR)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def sql_tpch_order_priority() -> str:
    return f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE year(o_orderdate) = {Q4_YEAR}
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue (single-scan pushed-predicate agg).
# ---------------------------------------------------------------------------

Q6_YEAR = 1997
Q6_DISC_LO = 0.03
Q6_DISC_HI = 0.05
Q6_QTY_LT = 24.0


def tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (revenue, n_items): what revenue would appear if the tracked
    discount band were dropped — the Q6 shape.  The whole query is one
    parquet scan: every predicate (shipdate year, discount band, quantity
    cap) is a pushed filter visible under PushedFilters, the projection
    reads 4 columns, and the global aggregate is a map-side partial sum
    into a single-row final — no join, one exchange of ~32 partial rows.
    The revenue product sums in DECIMAL (order-independent)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == Q6_YEAR)
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY_LT)
    )
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(
        "decimal(18,6)"
    )
    return li.agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def sql_tpch_forecast_revenue() -> str:
    return f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE year(l_shipdate) = {Q6_YEAR}
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_LT}
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: late-shipment priority split by return flag.
# ---------------------------------------------------------------------------

Q12_YEARS = (1996, 1997)
Q12_LATE_DAYS = 60
Q12_HIGH = ("1-URGENT", "2-HIGH")


def tpch_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, high_line_count, low_line_count): among lineitems
    shipped more than Q12_LATE_DAYS after their order date in the tracked
    years, how many belonged to high-priority orders vs the rest — the Q12
    conditional-count shape with l_returnflag standing in for the absent
    l_shipmode column.

    Scale: one fact-side equi-join on the orderkey (orders projected to
    3 columns), lateness as a join residual, then CASE-sum conditional
    aggregation over 3 groups — partial aggregation collapses the shuffle
    to 3 rows per task."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(list(Q12_YEARS))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(list(Q12_HIGH))
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate")
                + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def sql_tpch_shipmode_priority() -> str:
    years = ", ".join(str(y) for y in Q12_YEARS)
    high = ", ".join(f"'{p}'" for p in Q12_HIGH)
    return f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ({high}) THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ({high}) THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
  AND year(l_shipdate) IN ({years})
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: important parts vs a global-total scalar threshold.
# ---------------------------------------------------------------------------

Q11_AVG_MULT = 1.2


def tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, part_value): parts whose total lineitem extended price
    exceeds Q11_AVG_MULT x the AVERAGE per-part total — the Q11
    scalar-subquery-threshold shape (the testdata has no partsupp, so
    lineitem revenue stands in for supplycost*availqty; the reference's
    fixed global fraction is replaced by an average-relative threshold so
    the selectivity is scale-invariant as the part count grows).

    Scale: one scan feeds one partkey-grouped DECIMAL sum; the global
    total is a second aggregate REUSING the per-part aggregate (k rows,
    not the fact table) folded to a 1-row DataFrame and broadcast — the
    classic decorrelation of Q11's scalar subquery.  No per-row driver
    work; the threshold comparison is a broadcast nested loop over 1 row."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("val")
    )
    # exact DECIMAL sum / exact count -> a deterministic double average
    # (a double-accumulated avg would be partial-order-dependent and could
    # flip boundary rows between engines)
    total = per_part.agg(
        (F.sum("val").cast("double") / F.count(F.lit(1))).alias("avg_value")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.col("val").cast("double")
            > F.lit(Q11_AVG_MULT) * F.col("avg_value")
        )
        .select(
            "l_partkey",
            F.round(F.col("val").cast("double"), 6).alias("part_value"),
        )
    )


def sql_tpch_important_parts() -> str:
    return f"""
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, round(CAST(val AS DOUBLE), 6) AS part_value
FROM per_part,
     (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) AS avg_value FROM per_part)
WHERE CAST(val AS DOUBLE) > {Q11_AVG_MULT} * avg_value
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by nation and year.
# ---------------------------------------------------------------------------

Q9_PTYPE = "PROMO"
Q9_COST_FRAC = 0.6  # supplycost stand-in: 0.6 * p_retailprice


def tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, o_year, profit): per-nation-per-year profit on one part
    type — the Q9 shape.  profit = extendedprice*(1-discount)
    - Q9_COST_FRAC*retailprice*quantity (the testdata has no partsupp, so
    supplycost is a deterministic function of the part's retail price).

    Scale: part (type-filtered) and supplier⋈nation broadcast; the fact
    table joins orders on the orderkey for the year — one fact-side
    shuffle join + the final small group.  Both profit terms sum in
    DECIMAL, so partial-aggregation order cannot move the result."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == Q9_PTYPE)
        .select("p_partkey", "p_retailprice")
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(Q9_COST_FRAC) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


def sql_tpch_product_profit() -> str:
    return f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     - {Q9_COST_FRAC} * p_retailprice * l_quantity
                AS DECIMAL(18,6))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type = '{Q9_PTYPE}'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier-relationship counts per part attribute.
# ---------------------------------------------------------------------------

Q16_EXCL_BRAND = "Brand#1"
Q16_MIN_ACCTBAL = 1000.0  # "complaints" stand-in: exclude low-balance supps


def tpch_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt): DISTINCT suppliers that
    ever shipped each part profile, excluding one brand and the
    "complained-about" suppliers — the Q16 shape (the observed
    lineitem (part, supp) pairs stand in for partsupp; the s_acctbal
    floor stands in for the LIKE '%Complaints%' exclusion).

    Scale: the distinct (partkey, suppkey) projection collapses the fact
    table BEFORE the dims attach (one pre-aggregating exchange); the
    excluded-supplier set is a broadcast anti-join; count(DISTINCT) then
    runs per small group.  No row ever carries more than 4 columns."""
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < Q16_MIN_ACCTBAL)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") != Q16_EXCL_BRAND)
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def sql_tpch_parts_supplier() -> str:
    return f"""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_MIN_ACCTBAL})
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: potential part promotion (nested semi-join chain).
# ---------------------------------------------------------------------------

Q20_PTYPE = "PROMO"
Q20_YEAR = 1997
Q20_QTY = 60.0


def tpch_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_name, nation): suppliers who shipped more than Q20_QTY units of
    at least one Q20_PTYPE part during Q20_YEAR — the Q20 nested-subquery
    shape (part-filter inside a quantity-threshold aggregate inside a
    supplier semi-join).

    Scale: the type-filtered part list broadcasts into the fact scan
    (year filter pushed); the (suppkey, partkey) aggregate is the only
    fact-sized shuffle; the HAVING threshold reduces it to a short
    supplier id list that semi-joins (broadcast) against supplier."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == Q20_PTYPE)
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate") == Q20_YEAR
    )
    qualified = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"))
        .where(F.col("qty").cast("double") > Q20_QTY)
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(qualified, "s_suppkey", "left_semi")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", F.col("n_name").alias("nation"))
    )


def sql_tpch_potential_promotion() -> str:
    return f"""
SELECT s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q20_PTYPE}' AND year(l_shipdate) = {Q20_YEAR}
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > {Q20_QTY})
"""


# ---------------------------------------------------------------------------
# Exponentially-decayed trending score (half-life counters).
# ---------------------------------------------------------------------------

DECAY_HALF_LIFE_SEC = 3600   # one-hour half-life

# integer PPM weights for the fractional eighth-half-life steps: the j-th
# entry is round(1e6 * 0.5**(j/8)) computed ONCE here, so both engines use
# the identical literal table and the whole operator is integer arithmetic
# (pow() ULP differences between JVM and DuckDB can flip a rounded weight,
# which an earlier float formulation actually hit).
DECAY_LUT_PPM = [round(1_000_000 * 0.5 ** (j / 8)) for j in range(8)]


def events_decay_topk(
    spark: SparkSession, sf_dir: str, half_life: int = DECAY_HALF_LIFE_SEC
) -> DataFrame:
    """(event_type, n_events, decayed_ppm): trending score per event type —
    each event contributes ~0.5^(age / half_life) in integer PPM, aged
    against the corpus-max timestamp, so recent activity dominates and
    stale volume fades.  The leaderboard rule behind 'trending now' panels
    and decayed frequency caps in feature stores.

    Determinism: age is quantized to eighth-half-life steps; the weight is
    DECAY_LUT_PPM[step % 8] >> (step / 8) — table lookup + integer shift,
    NO runtime pow() — so the aggregate is an exact BIGINT sum, immune to
    both float-addition ordering and libm ULP skew across engines.

    Plan: the reference timestamp is a 1-row broadcast; weighting is
    map-only expression work riding the scan; ONE event_type partial-agg
    shuffle.  At 10^12 events nothing else moves."""
    ev = _t(spark, sf_dir, "events")
    # epoch MICROSECOND longs (the events_scd2 convention): ts carries
    # sub-second precision, and second-truncated ages would disagree with
    # the oracle's epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    tmax = ev.agg(F.max(us).alias("tm"))
    age = F.col("tm") - us
    hl_us = half_life * 1_000_000
    step = (((age * 8) - (age * 8) % F.lit(hl_us)) / F.lit(hl_us)).cast(
        "bigint"
    )
    lut = ", ".join(f"{v}L" for v in DECAY_LUT_PPM)
    w_ppm = F.when(F.col("step") >= 8 * 21, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            f"shiftright(element_at(array({lut}), "
            "cast(step % 8 as int) + 1), cast(step div 8 as int))"
        )
    ).cast("bigint")
    return (
        ev.crossJoin(F.broadcast(tmax))
        .select("event_type", step.alias("step"))
        .select("event_type", w_ppm.alias("w"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("w").alias("decayed_ppm"),
        )
    )


def sql_events_decay_topk(half_life: int = DECAY_HALF_LIFE_SEC) -> str:
    lut = ", ".join(str(v) for v in DECAY_LUT_PPM)
    return f"""
WITH tm AS (SELECT MAX(epoch_us(ts)) AS tm FROM events),
st AS (
  SELECT event_type,
         CAST(((tm - epoch_us(ts)) * 8) // {half_life * 1_000_000} AS BIGINT)
           AS step
  FROM events CROSS JOIN tm
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN step >= 8 * 21 THEN 0
                     ELSE ([{lut}])[CAST(step % 8 AS INTEGER) + 1]
                          >> CAST(step // 8 AS INTEGER) END) AS BIGINT)
         AS decayed_ppm
FROM st
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Item-item collaborative co-occurrence similarity (events -> CF model).
# ---------------------------------------------------------------------------

ITEM_SIM_MIN_CO = 3   # emit pairs co-visited by >= this many users


def events_item_similarity(
    spark: SparkSession, sf_dir: str, min_co: int = ITEM_SIM_MIN_CO
) -> DataFrame:
    """(item_a, item_b, n_co, cosine): item-item collaborative similarity —
    for every item pair, how many distinct users touched both, normalized
    by sqrt(n_a * n_b) (the Amazon item-to-item CF formulation).  Items are
    the integer ``props.k`` payload of the event stream.

    Plan: distinct (user, item) once, then the pair candidates come from a
    per-user self-join — the classic skew point: a power user with u items
    contributes u^2 pairs, so at web scale the hot-user tail is capped or
    salted (the same wedge-cap contract as kg_triangles; AQE skew-split
    handles moderate skew here).  Co-counts and per-item counts are
    map-side-combinable aggregates; the final cosine is one exact-integer
    division rounded at emit."""
    ui = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    cnt = ui.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = ui.select(F.col("user_id").alias("u"), F.col("item").alias("item_a"))
    b = ui.select(F.col("user_id").alias("u"), F.col("item").alias("item_b"))
    co = (
        a.join(b, "u")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= min_co)
    )
    return (
        co.join(
            cnt.select(F.col("item").alias("item_a"), F.col("n").alias("na")),
            "item_a",
        )
        .join(
            cnt.select(F.col("item").alias("item_b"), F.col("n").alias("nb")),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_co",
            F.round(
                F.col("n_co")
                / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("cosine"),
        )
    )


def sql_events_item_similarity(min_co: int = ITEM_SIM_MIN_CO) -> str:
    return f"""
WITH ui AS (
  SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
),
cnt AS (SELECT item, COUNT(*) AS n FROM ui GROUP BY item),
co AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_co
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {min_co}
)
SELECT co.item_a, co.item_b, co.n_co,
       round(co.n_co / sqrt(ca.n::DOUBLE * cb.n), 6) AS cosine
FROM co JOIN cnt ca ON co.item_a = ca.item
        JOIN cnt cb ON co.item_b = cb.item
"""


# ---------------------------------------------------------------------------
# Two-proportion A/B test (conversion-rate z-score).
# ---------------------------------------------------------------------------

AB_CONV_EVENT = "purchase"
AB_CONV_MIN = 14   # conversions per user to count (median-split: every
                   # synthetic user purchases, so >=1 would be degenerate)


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_a, n_b, conv_a, conv_b, rate_a, rate_b, z_score): the two-
    proportion z-test an experimentation platform computes per metric —
    users split into deterministic arms (user_id parity standing in for
    the assignment hash), conversion = did the user ever fire the target
    event, z = (p_b - p_a) / sqrt(p_pool (1-p_pool) (1/n_a + 1/n_b)).

    Determinism: the four inputs are exact BIGINT counts; the z formula is
    one fixed left-to-right double expression over them, so both engines
    agree bit-for-bit before the final round.

    Plan: ONE user-key partial-agg shuffle (per-user conversion flag),
    then a 1-row conditional aggregate — at 10^12 events nothing else
    moves; the final row is driver-sized by construction."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == AB_CONV_EVENT, 1).otherwise(0)
            )
            >= AB_CONV_MIN,
            1,
        )
        .otherwise(0)
        .alias("conv")
    )
    stats = per_user.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("user_id") % 2 == 0, F.col("conv")).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when(F.col("user_id") % 2 == 1, F.col("conv")).otherwise(0)
        ).alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    z = F.when(se > 0, F.round((pb - pa) / se, 6))
    return stats.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        z.alias("z_score"),
    )


def sql_events_ab_test() -> str:
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = '{AB_CONV_EVENT}'
                            THEN 1 ELSE 0 END) >= {AB_CONV_MIN}
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
s AS (
  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM per_user
)
SELECT n_a, n_b, conv_a, conv_b,
       round(conv_a::DOUBLE / n_a, 6) AS rate_a,
       round(conv_b::DOUBLE / n_b, 6) AS rate_b,
       CASE WHEN sqrt((conv_a + conv_b)::DOUBLE / (n_a + n_b)
                      * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)) > 0
            THEN round((conv_b::DOUBLE / n_b - conv_a::DOUBLE / n_a)
                 / sqrt((conv_a + conv_b)::DOUBLE / (n_a + n_b)
                        * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6)
            END AS z_score
FROM s
"""


# ---------------------------------------------------------------------------
# CUSUM change-point detection over the event value stream.
# ---------------------------------------------------------------------------

CUSUM_SCALE = 1_000   # values integerized to millis (keeps the n-scaled
                      # prefix sums far inside int64 even at 100x corpus)


def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, max_cusum_milli, at_ts_us, n_events): one-sided CUSUM
    change-point statistic per event type — the running sum of deviations
    from the series mean, floored at zero (S_i = max(0, S_{i-1} + x_i -
    mean)); its maximum and WHERE it peaks localize an upward level shift.
    The standard sequential drift monitor a metrics platform runs per
    series.

    Determinism: values are integerized to millis BEFORE any accumulation
    (per-row round), the mean enters as exact integer cross-multiplication
    (the scan tracks n*S so everything stays integral), and the scan order
    (ts_us, event_id) is total — every partial sum is an exact BIGINT in
    both engines; the peak locator is an exact integer argmax resolved by
    a max-join (no float, no min_by-on-list portability trap).

    Plan: one per-type mean aggregate broadcast back, then the floored
    recursion via the prefix-sum identity S_i = P_i - min(0, P_0..P_i) —
    two stacked window sums over ONE per-series sort (partitioned by
    event_type, never a global sort); the peak join touches |types| rows."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * CUSUM_SCALE).cast("bigint").alias("v"),
    )
    stats = ev.groupBy("event_type").agg(
        F.sum("v").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    j = ev.join(F.broadcast(stats), "event_type")
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    dev = F.col("v") * F.col("n") - F.col("tot")
    scan1 = j.select(
        "event_type",
        "event_id",
        "ts_us",
        "n",
        F.sum(dev).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
    )
    run_min = F.min(F.least(F.col("p"), F.lit(0).cast("bigint"))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    scan2 = scan1.select(
        "event_type", "ts_us", "n", (F.col("p") - run_min).alias("s")
    )
    agg = scan2.groupBy("event_type").agg(
        F.max("s").alias("max_s"), F.min("n").alias("n_events")
    )
    peak = (
        scan2.join(
            agg.select(F.col("event_type"), F.col("max_s")),
            ["event_type"],
        )
        .where(F.col("s") == F.col("max_s"))
        .groupBy("event_type")
        .agg(F.min("ts_us").alias("at_ts_us"))
    )
    return agg.join(peak, "event_type").select(
        "event_type",
        F.expr("div(max_s, n_events)").alias("max_cusum_milli"),
        "at_ts_us",
        "n_events",
    )


def sql_events_cusum() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * {CUSUM_SCALE}) AS BIGINT) AS v
  FROM events
),
stats AS (SELECT event_type, CAST(SUM(v) AS BIGINT) AS tot,
                 COUNT(*) AS n FROM ev GROUP BY event_type),
j AS (SELECT e.*, s.tot, s.n FROM ev e JOIN stats s USING (event_type)),
scan1 AS (
  SELECT event_type, event_id, ts_us, n,
         CAST(SUM(v * n - tot) OVER (
           PARTITION BY event_type ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
  FROM j
),
scan2 AS (
  SELECT event_type, ts_us, n,
         p - MIN(LEAST(p, 0)) OVER (
           PARTITION BY event_type ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM scan1
),
agg AS (SELECT event_type, MAX(s) AS max_s, MIN(n) AS n_events
        FROM scan2 GROUP BY event_type),
peak AS (
  SELECT s2.event_type, MIN(s2.ts_us) AS at_ts_us
  FROM scan2 s2 JOIN agg a
    ON s2.event_type = a.event_type AND s2.s = a.max_s
  GROUP BY s2.event_type
)
SELECT a.event_type, a.max_s // a.n_events AS max_cusum_milli,
       p.at_ts_us, a.n_events
FROM agg a JOIN peak p ON a.event_type = p.event_type
"""


# ---------------------------------------------------------------------------
# EWMA smoothing (bounded-memory, exact decimal arithmetic).
# ---------------------------------------------------------------------------

EWMA_LAGS = 4  # window depth; alpha = 1/2 -> integer weights 8,4,2,1


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, ewma): exponentially-weighted moving average of
    ``value`` over each user's last EWMA_LAGS events (alpha = 1/2,
    truncated tail renormalized over the weights actually present — the
    standard adjusted/bias-corrected EWMA start-up).  The smoothing signal
    an anomaly detector compares raw values against.

    Recursive EWMA is not window-expressible; the bounded form is, as
    EWMA_LAGS-1 lag() columns riding ONE per-user time sort (a single
    shuffle on user_id, no self-join).  Arithmetic is exact: integer
    weights 2^k over DECIMAL(18,6) values, one double division at the end,
    so Spark and DuckDB agree bit-for-bit with no float-accumulation
    order hazard."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(18,6)")
    lags = [dec] + [F.lag(dec, k).over(w) for k in range(1, EWMA_LAGS)]
    wts = [2 ** (EWMA_LAGS - 1 - k) for k in range(EWMA_LAGS)]
    num = None
    den = None
    for col, wt in zip(lags, wts):
        t = F.when(col.isNotNull(), col * wt).otherwise(F.lit(0))
        d = F.when(col.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    return ev.select(
        "event_id",
        "user_id",
        F.round(num.cast("double") / den.cast("double"), 6).alias("ewma"),
    )


def sql_events_ewma() -> str:
    wts = [2 ** (EWMA_LAGS - 1 - k) for k in range(EWMA_LAGS)]
    cols = ["CAST(value AS DECIMAL(18,6))"] + [
        f"LAG(CAST(value AS DECIMAL(18,6)), {k}) OVER w"
        for k in range(1, EWMA_LAGS)
    ]
    num = " + ".join(
        f"CASE WHEN {c} IS NOT NULL THEN {c} * {w} ELSE 0 END"
        for c, w in zip(cols, wts)
    )
    den = " + ".join(
        f"CASE WHEN {c} IS NOT NULL THEN {w} ELSE 0 END"
        for c, w in zip(cols, wts)
    )
    return f"""
SELECT event_id, user_id,
       round(CAST(({num}) AS DOUBLE) / CAST(({den}) AS DOUBLE), 6) AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# Tumbling-window approximate distinct users (HLL registers per window).
# ---------------------------------------------------------------------------

def events_window_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_start_us, n_exact, hll_est): per 1-hour tumbling window the
    exact distinct-user count next to a from-scratch HyperLogLog estimate
    — the streaming-dashboard cardinality shape (unique visitors per
    window) where the exact countDistinct is the audit column and the
    register sketch is what production keeps at scale.

    Reuses webgraph's engine-portable register algebra (60-bit md5 hash,
    m=64, integer bit-length rank, small-range correction).  The register
    maxima are a plain groupBy((window, reg)).max — partial-agg mergeable,
    at most windows*64 rows across the exchange, and the float register
    sum is exact (powers of two) in any order.  A watermarked streaming
    twin is the same plan with ``F.window`` on the event-time column."""
    from sparkmedkg.webgraph import HLL_M, HLL_P, _HLL_ALPHA_EXPR, _h60

    ev = _t(spark, sf_dir, "events")
    win = F.window(F.col("ts").cast("timestamp"), "1 hour")
    hashes = ev.select(
        F.unix_micros(win["start"]).alias("window_start_us"),
        _h60(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    rem = F.shiftright(F.col("h"), HLL_P)
    bitlen = F.length(F.conv(rem.cast("string"), 10, 2))
    rho = F.when(rem == 0, F.lit(61 - HLL_P)).otherwise(
        F.lit(60 - HLL_P) - bitlen + 1
    )
    regs = (
        hashes.select(
            "window_start_us", (F.col("h") % HLL_M).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("window_start_us", "reg")
        .agg(F.max("rho").alias("mx"))
    )
    per_w = regs.groupBy("window_start_us").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    v = F.lit(HLL_M) - F.col("n_regs")
    s = F.col("s_present") + v.cast("double")
    raw = F.expr(_HLL_ALPHA_EXPR) * F.lit(float(HLL_M * HLL_M)) / s
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    exact = hashes.groupBy("window_start_us").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return exact.join(per_w, "window_start_us").select(
        "window_start_us", "n_exact", F.round(est, 2).alias("hll_est")
    )


def sql_events_window_hll() -> str:
    from sparkmedkg.webgraph import HLL_M, HLL_P, _HLL_ALPHA_EXPR, _sql_h60

    return f"""
WITH hashes AS (
  SELECT DISTINCT
         epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
         {_sql_h60("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
rr AS (
  SELECT window_start_us, h % {HLL_M} AS reg,
         CASE WHEN h // {HLL_M} = 0 THEN {61 - HLL_P}
              ELSE {60 - HLL_P} - length(to_base(h // {HLL_M}, 2)) + 1
         END AS rho
  FROM hashes
),
regs AS (SELECT window_start_us, reg, MAX(rho) AS mx
         FROM rr GROUP BY window_start_us, reg),
per_w AS (
  SELECT window_start_us, SUM(power(2.0, -mx)) AS s_present,
         COUNT(*) AS n_regs
  FROM regs GROUP BY window_start_us
),
est AS (
  SELECT window_start_us,
         CASE WHEN ({_HLL_ALPHA_EXPR}) * {float(HLL_M * HLL_M)!r}
                   / (s_present + ({HLL_M} - n_regs)) <= 2.5 * {HLL_M}
                AND ({HLL_M} - n_regs) > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                     / ({HLL_M} - n_regs))
              ELSE ({_HLL_ALPHA_EXPR}) * {float(HLL_M * HLL_M)!r}
                   / (s_present + ({HLL_M} - n_regs))
         END AS est
  FROM per_w
),
exact AS (SELECT window_start_us, COUNT(*) AS n_exact
          FROM hashes GROUP BY window_start_us)
SELECT e.window_start_us, e.n_exact, round(s.est, 2) AS hll_est
FROM exact e JOIN est s ON e.window_start_us = s.window_start_us
"""


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifier equivalence classes.
# ---------------------------------------------------------------------------

KANON_K = 5


def events_k_anonymity(
    spark: SparkSession, sf_dir: str, k: int = KANON_K
) -> DataFrame:
    """(event_type, hour, class_size, at_risk): the k-anonymity audit a
    privacy review runs before releasing an event log — users are
    grouped by the quasi-identifier pair (event_type, hour-of-day), and
    any equivalence class with fewer than ``k`` distinct users is a
    re-identification risk (someone holding the QI pair can narrow the
    subject to < k candidates).  Release gates drop or generalize the
    flagged classes.

    One distinct on (QI, user) then one map-side-combinable count —
    class_size is DISTINCT users, not rows, so repeat visits don't
    launder risk.  At 10^12 rows both shuffles key on the low-cardinality
    QI columns; skew is bounded by the hour fan-out (24)."""
    ev = _t(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour"),
        "user_id",
    ).distinct()
    return (
        qi.groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "event_type",
            "hour",
            "class_size",
            (F.col("class_size") < k).alias("at_risk"),
        )
    )


def sql_events_k_anonymity(k: int = KANON_K) -> str:
    return f"""
WITH qi AS (
  SELECT DISTINCT event_type, CAST(hour(ts) AS BIGINT) AS hour, user_id
  FROM events
)
SELECT event_type, hour, COUNT(*) AS class_size,
       COUNT(*) < {k} AS at_risk
FROM qi GROUP BY event_type, hour
"""


LDIV_L = 8   # release gate: every QI class needs >= L distinct sensitive values


def events_l_diversity(
    spark: SparkSession, sf_dir: str, l_min: int = LDIV_L
) -> DataFrame:
    """(event_type, hour, class_size, n_sensitive, at_risk): the
    l-diversity audit that complements events_k_anonymity — a QI class
    can pass k-anonymity (many users) yet still leak if they all share
    ONE sensitive value (homogeneity attack: knowing someone is in the
    class reveals their attribute).  Classes are the same QI pair
    (event_type, hour-of-day); the sensitive attribute is the ``k``
    payload prop; ``at_risk`` flags classes with fewer than ``l_min``
    distinct sensitive values.

    Scale: json_extract is a JVM expression in the scan projection, the
    distinct runs on (QI, sensitive) — never materializing per-user rows
    — and both shuffles key on the 24-hour-bounded QI columns;
    class_size counts distinct USERS (re-identification denominator)
    via one exact count_distinct in the same aggregate."""
    ev = _t(spark, sf_dir, "events")
    cls = ev.select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour"),
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("sens"),
    )
    return (
        cls.groupBy("event_type", "hour")
        .agg(
            F.countDistinct("user_id").alias("class_size"),
            F.countDistinct("sens").alias("n_sensitive"),
        )
        .withColumn("at_risk", F.col("n_sensitive") < l_min)
    )


def sql_events_l_diversity(l_min: int = LDIV_L) -> str:
    return f"""
WITH cls AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour, user_id,
         CAST(json_extract_string(props, '$.k') AS INT) AS sens
  FROM events
)
SELECT event_type, hour,
       COUNT(DISTINCT user_id) AS class_size,
       COUNT(DISTINCT sens) AS n_sensitive,
       COUNT(DISTINCT sens) < {l_min} AS at_risk
FROM cls GROUP BY event_type, hour
"""


SEASON_HOT_NUM = 2   # hot iff count > (NUM/DEN) * the hour-of-day mean
SEASON_HOT_DEN = 1


def events_seasonality(
    spark: SparkSession,
    sf_dir: str,
    hot_num: int = SEASON_HOT_NUM,
    hot_den: int = SEASON_HOT_DEN,
) -> DataFrame:
    """(day, hour, n, hour_total, n_days, hot): hour-of-day seasonality
    decomposition of the event stream — each (day, hour) cell's count
    against the seasonal baseline (the mean count of that hour-of-day
    across all observed days), flagging cells more than ``hot_num/
    hot_den``x their seasonal mean.  Plain z-scores (events_zscore)
    treat 3am and 3pm as the same population; deseasonalizing first is
    what makes a traffic-spike monitor usable.

    Scale: two map-side-combinable aggregations — (day, hour) cells,
    then the 24-row hour profile, joined back by broadcast.  The hot
    decision is exact integer arithmetic (n * n_days * den > num *
    hour_total), never a float mean, so the flag is bit-identical
    across engines."""
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour"),
        )
        .groupBy("day", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    prof = cells.groupBy("hour").agg(
        F.sum("n").alias("hour_total"), F.count(F.lit(1)).alias("n_days")
    )
    return (
        cells.join(F.broadcast(prof), "hour")
        .select(
            F.col("day").cast("string").alias("day"),
            "hour",
            "n",
            "hour_total",
            "n_days",
            (
                F.col("n") * F.col("n_days") * F.lit(hot_den)
                > F.lit(hot_num) * F.col("hour_total")
            ).alias("hot"),
        )
    )


def sql_events_seasonality(
    hot_num: int = SEASON_HOT_NUM, hot_den: int = SEASON_HOT_DEN
) -> str:
    return f"""
WITH cells AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(hour(ts) AS BIGINT) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
prof AS (
  SELECT hour, SUM(n) AS hour_total, COUNT(*) AS n_days
  FROM cells GROUP BY hour
)
SELECT c.day, c.hour, CAST(c.n AS BIGINT) AS n,
       CAST(p.hour_total AS BIGINT) AS hour_total,
       CAST(p.n_days AS BIGINT) AS n_days,
       c.n * p.n_days * {hot_den} > {hot_num} * p.hour_total AS hot
FROM cells c JOIN prof p USING (hour)
"""


LATE_DELAY_S = 600   # max simulated delivery delay (md5-hash seconds)
LATE_WIN_S = 300     # arrival-window width for the coarse watermark
LATE_BUCKET_S = 60   # lateness histogram granularity (seconds)


def events_lateness_audit(
    spark: SparkSession,
    sf_dir: str,
    delay_s: int = LATE_DELAY_S,
    win_s: int = LATE_WIN_S,
    bucket_s: int = LATE_BUCKET_S,
) -> DataFrame:
    """(bucket_min, n): histogram of event-time lateness against a
    coarse-grained watermark — the audit that sizes a streaming job's
    ``withWatermark`` delay before deployment.  The log is replayed
    under a deterministic per-event delivery delay (md5(event_id) %
    ``delay_s`` seconds — the source log is perfectly ordered, so the
    replay injects the out-of-orderness a real multi-source ingest
    exhibits); the watermark at any arrival window is the max event
    time delivered in all PRIOR windows of ``win_s`` seconds, and an
    event's lateness is how far its own timestamp trails that
    watermark.  The histogram's tail tells you the watermark delay
    that bounds your drop rate.

    Scale: the textbook formulation (running max over a GLOBAL arrival
    order) is a single-partition window — unusable.  This uses the
    coarse watermark real engines use: one map-side max per arrival
    window, a cumulative max over the small window-index table (size =
    time span / win_s, calendar-shaped — NOT event-shaped), and a
    broadcast join back.  All arithmetic is exact integer epoch
    seconds."""
    # NB: cast("timestamp").cast("long"), NOT unix_timestamp() — the
    # latter converts through the SESSION timezone, so events across a
    # DST boundary land in different arrival windows than DuckDB's
    # timezone-naive epoch() (bit the sf0.01 selfcheck: 2 events moved
    # buckets).  The cast chain is the repo-wide tz-naive idiom.
    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").cast("long").alias("sec"),
        (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint") % delay_s
        ).alias("delay"),
    )
    arr = ev.select(
        "sec",
        F.expr(f"(sec + delay) div {win_s}").alias("w"),
    )
    wmax = arr.groupBy("w").agg(F.max("sec").alias("mx"))
    # bounded: one row per time window (wall-clock horizon / win_s),
    # never corpus-sized
    cum = wmax.select(
        "w",
        F.max("mx")
        .over(
            exactq.bounded_window("w", "w").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("wm"),
    )
    late = (
        arr.join(F.broadcast(cum), "w")
        .where(F.col("wm").isNotNull())
        .select(
            F.greatest(F.col("wm") - F.col("sec"), F.lit(0)).alias("late_s")
        )
    )
    return late.groupBy(
        F.expr(f"late_s div {bucket_s}").alias("bucket_min")
    ).agg(F.count(F.lit(1)).alias("n"))


def sql_events_lateness_audit(
    delay_s: int = LATE_DELAY_S,
    win_s: int = LATE_WIN_S,
    bucket_s: int = LATE_BUCKET_S,
) -> str:
    return f"""
WITH ev AS (
  -- epoch_us // 1e6 (floor), NOT epoch(ts)::BIGINT: epoch() returns a
  -- DOUBLE and the BIGINT cast ROUNDS half-up, while Spark's long cast
  -- floors — fractional-second events straddle arrival windows
  SELECT epoch_us(ts) // 1000000 AS sec,
         CAST('0x' || substring(md5(event_id::VARCHAR), 1, 15) AS BIGINT)
           % {delay_s} AS delay
  FROM events
),
arr AS (SELECT sec, (sec + delay) // {win_s} AS w FROM ev),
wmax AS (SELECT w, MAX(sec) AS mx FROM arr GROUP BY w),
cum AS (
  SELECT w, MAX(mx) OVER (ORDER BY w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm
  FROM wmax
),
late AS (
  SELECT greatest(c.wm - a.sec, 0) AS late_s
  FROM arr a JOIN cum c USING (w)
  WHERE c.wm IS NOT NULL
)
SELECT late_s // {bucket_s} AS bucket_min, COUNT(*) AS n
FROM late GROUP BY 1
"""


HOLT_T = 14   # forecast horizon window: last T daily observations


def events_holt_forecast(
    spark: SparkSession, sf_dir: str, t_max: int = HOLT_T
) -> DataFrame:
    """(event_type, n_days_used, level, trend, forecast): Holt double
    exponential smoothing (alpha = beta = 1/2) over each event type's
    daily counts, forecasting the next day — level tracks the smoothed
    rate, trend the smoothed day-over-day drift.  The capacity-planning
    companion to events_ewma (which has no trend term and lags ramps).

    alpha = beta = 1/2 makes every smoothing step exact dyadic
    arithmetic, so the whole recurrence folds in scaled int64: carrying
    P_t = 4^t * level_t and Q_t = 4^t * trend_t gives the integer
    recurrence P_t = 2*s*y_t + 2P + 2Q, Q_t = (P_t - 4P + 4Q)/2 (always
    divisible), s_t = 4*s.  The final divisions by the power-of-two
    scale are exact in doubles, so level/trend/forecast are
    bit-identical across engines.  The fold is bounded to the LAST
    ``t_max`` days (14 -> scale 2^26; the int64 headroom note of
    q_modularity applies if you raise it past ~25 with huge daily
    counts).

    Scale: one (type, day) map-side-combinable count, then a per-type
    fold over <= t_max values — the per-key state is O(1) and the daily
    table is calendar-sized, orders of magnitude below the event
    stream."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.to_date(F.col("ts").cast("timestamp"))
            .cast("string")
            .alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "n"))
        ).alias("series")
    )
    vals = F.transform(F.col("series"), lambda s: s["n"])
    nall = F.size(vals)
    tail = F.when(
        nall > t_max, F.slice(vals, nall - F.lit(t_max - 1), t_max)
    ).otherwise(vals)
    init = F.struct(
        F.lit(0).cast("long").alias("p"),
        F.lit(0).cast("long").alias("q"),
        F.lit(0).cast("long").alias("s"),
    )

    def step(acc, y):
        seeded = F.struct(
            y.cast("long").alias("p"),
            F.lit(0).cast("long").alias("q"),
            F.lit(1).cast("long").alias("s"),
        )
        # division-free form: q_new = (p_new - 4p + 4q)/2 = s*y - p + 3q
        p_new = F.lit(2) * acc["s"] * y + F.lit(2) * acc["p"] + F.lit(2) * acc["q"]
        q_new = acc["s"] * y - acc["p"] + F.lit(3) * acc["q"]
        nxt = F.struct(
            p_new.cast("long").alias("p"),
            q_new.cast("long").alias("q"),
            (acc["s"] * F.lit(4)).alias("s"),
        )
        return F.when(acc["s"] == 0, seeded).otherwise(nxt)

    st = F.aggregate(tail, init, step)
    scale = st["s"].cast("double")
    return per.select(
        "event_type",
        F.size(tail).cast("bigint").alias("n_days_used"),
        F.round(st["p"].cast("double") / scale, 6).alias("level"),
        F.round(st["q"].cast("double") / scale, 6).alias("trend"),
        F.round(
            (st["p"] + st["q"]).cast("double") / scale, 6
        ).alias("forecast"),
    )


def sql_events_holt_forecast(t_max: int = HOLT_T) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
per AS (
  SELECT event_type,
         list(n ORDER BY day) AS vals
  FROM daily GROUP BY event_type
),
tails AS (
  SELECT event_type,
         CASE WHEN len(vals) > {t_max}
              THEN list_slice(vals, len(vals) - {t_max - 1}, len(vals))
              ELSE vals END AS tail
  FROM per
),
folded AS (
  -- positional LIST accumulator [p, q, s]: struct_pack inside
  -- list_reduce lateral-binds freshly computed fields over same-named
  -- acc fields (acc.p in a later field sees the NEW p), silently
  -- corrupting the recurrence; list construction has no field names
  -- to clobber.  q recurrence in the division-free form s*y - p + 3q.
  SELECT event_type, CAST(len(tail) AS BIGINT) AS n_days_used,
         list_reduce(
           list_transform(tail, y -> [CAST(y AS BIGINT),
                                      CAST(0 AS BIGINT),
                                      CAST(1 AS BIGINT)]),
           (acc, e) -> [2 * acc[3] * e[1] + 2 * acc[1] + 2 * acc[2],
                        acc[3] * e[1] - acc[1] + 3 * acc[2],
                        acc[3] * 4]
         ) AS st
  FROM tails
)
SELECT event_type, n_days_used,
       round(st[1]::DOUBLE / st[3], 6) AS level,
       round(st[2]::DOUBLE / st[3], 6) AS trend,
       round((st[1] + st[2])::DOUBLE / st[3], 6) AS forecast
FROM folded
"""


# ---------------------------------------------------------------------------
# Bot-likelihood scoring from inter-arrival regularity.
# ---------------------------------------------------------------------------

BOT_MIN_GAPS = 5     # users with fewer gaps have no regularity signal
BOT_CV2_TAU = 0.25   # squared coefficient of variation below this = metronome


def events_bot_score(
    spark: SparkSession,
    sf_dir: str,
    min_gaps: int = BOT_MIN_GAPS,
    tau: float = BOT_CV2_TAU,
) -> DataFrame:
    """(user_id, n_gaps, mean_gap_s, cv2, bot): per-user inter-arrival
    regularity — the classic crawler/bot tell: scripted clients fire on a
    timer, so the squared coefficient of variation of their event gaps
    (var/mean^2; ~1.0 for a Poisson human, ~0 for a metronome) collapses.
    ``bot`` flags users with >= min_gaps gaps and cv2 < tau.

    Exactness: gaps are integer epoch seconds; sum(g) telescopes to the
    user's active span and sum(g^2) <= max_gap * sum(g), so the
    cv2 = (n*sum_g2 - sum_g^2) / sum_g^2 contingency terms stay inside
    BIGINT; the single int->double division at the end is IEEE-identical
    across engines (rounded at 6 for the output column).  Plan: one
    per-user sort shuffle carries the lag, then a map-side-combinable
    aggregate — the same single-exchange shape as sessionize."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = (secs - F.lag(secs).over(w)).alias("g")
    gaps = ev.select("user_id", gap).where(F.col("g").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("g").cast("bigint").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("sg2"),
    )
    cv2 = F.round(
        (
            (F.col("n_gaps") * F.col("sg2") - F.col("sg") * F.col("sg"))
            .cast("double")
            / (F.col("sg") * F.col("sg")).cast("double")
        ),
        6,
    )
    return (
        agg.where((F.col("n_gaps") >= min_gaps) & (F.col("sg") > 0))
        .select(
            "user_id",
            "n_gaps",
            F.expr("sg div n_gaps").cast("bigint").alias("mean_gap_s"),
            cv2.alias("cv2"),
        )
        .withColumn("bot", F.col("cv2") < tau)
    )


def sql_events_bot_score(
    min_gaps: int = BOT_MIN_GAPS, tau: float = BOT_CV2_TAU
) -> str:
    return f"""
WITH secs AS (
  -- whole seconds (epoch_us floor-div 1e6): DuckDB's epoch() keeps the
  -- fractional part as DOUBLE, Spark's long cast truncates — integerize
  -- identically on both sides before differencing.
  SELECT user_id, event_id, ts, epoch_us(ts) // 1000000 AS sec FROM events
),
gaps AS (
  SELECT user_id,
         sec - lag(sec) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM secs
),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(g) AS BIGINT) AS sg,
         CAST(SUM(g * g) AS BIGINT) AS sg2
  FROM gaps WHERE g IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_gaps,
       CAST(sg // n_gaps AS BIGINT) AS mean_gap_s,
       round((n_gaps * sg2 - sg * sg)::DOUBLE / (sg * sg)::DOUBLE, 6)
         AS cv2,
       round((n_gaps * sg2 - sg * sg)::DOUBLE / (sg * sg)::DOUBLE, 6) < {tau}
         AS bot
FROM agg
WHERE n_gaps >= {min_gaps} AND sg > 0
"""


# ---------------------------------------------------------------------------
# Pearson correlation matrix of daily event-type volumes.
# ---------------------------------------------------------------------------


def events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ta, tb, n_days, r): Pearson correlation between every pair of
    event types' DAILY counts over the full calendar (days with no events
    of a type count as 0 — correlations over the dense series, not the
    intersection of active days).  The ops-analytics staple: which
    activity streams move together (shared driver) vs inversely
    (cannibalization).

    Exactness: daily counts are BIGINT; all five Pearson moments
    (sum x, sum y, sum xy, sum x^2, sum y^2) stay BIGINT through the
    per-pair aggregate; r is formed by ONE double division with
    correctly-rounded IEEE sqrt on each exact variance term — identical
    across engines, rounded at 6.  Plan: the dense (type x day) matrix is
    types * days rows (tiny — built by a broadcast cross of the two
    dimension sets against the counted facts); the pair join keys on the
    day column of a types-sized table."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("t"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    types = daily.select("t").distinct()
    days = daily.select("d").distinct()
    dense = (
        types.crossJoin(days)
        .join(daily, ["t", "d"], "left")
        .select("t", "d", F.coalesce("c", F.lit(0)).cast("bigint").alias("c"))
    )
    a = dense.select(
        F.col("t").alias("ta"), "d", F.col("c").alias("x")
    )
    b = dense.select(
        F.col("t").alias("tb"), "d", F.col("c").alias("y")
    )
    m = (
        a.join(b, "d")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sy2"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")).cast("double")
    r = F.when(
        (dx > 0) & (dy > 0), F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)
    )
    return m.select("ta", "tb", F.col("n").alias("n_days"), r.alias("r"))


def sql_events_type_correlation() -> str:
    return """
WITH daily AS (
  SELECT event_type AS t, CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
types AS (SELECT DISTINCT t FROM daily),
days AS (SELECT DISTINCT d FROM daily),
dense AS (
  SELECT ty.t, dy.d, CAST(COALESCE(f.c, 0) AS BIGINT) AS c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN daily f ON f.t = ty.t AND f.d = dy.d
),
m AS (
  SELECT a.t AS ta, b.t AS tb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a.c) AS BIGINT) AS sx,
         CAST(SUM(b.c) AS BIGINT) AS sy,
         CAST(SUM(a.c * b.c) AS BIGINT) AS sxy,
         CAST(SUM(a.c * a.c) AS BIGINT) AS sx2,
         CAST(SUM(b.c * b.c) AS BIGINT) AS sy2
  FROM dense a JOIN dense b ON a.d = b.d AND a.t < b.t
  GROUP BY 1, 2
)
SELECT ta, tb, n AS n_days,
       CASE WHEN (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
            THEN round((n * sxy - sx * sy)::DOUBLE
                       / (sqrt((n * sx2 - sx * sx)::DOUBLE)
                          * sqrt((n * sy2 - sy * sy)::DOUBLE)), 6)
       END AS r
FROM m
"""


# ---------------------------------------------------------------------------
# Gini concentration of per-user activity.
# ---------------------------------------------------------------------------


def events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 row (n_users, total_events, gini): Gini coefficient of the
    per-user event-count distribution — the audience-concentration
    number (0 = perfectly even, ->1 = a few power users dominate) that
    decides whether per-user keys need salting and whether engagement
    metrics are hostage to a whale cohort.

    Exact rank formula G = 2*sum(i * x_i) / (n * sum(x)) - (n + 1) / n
    over counts sorted ascending: every term is BIGINT (ties don't
    matter — equal values commute in the rank sum); two double divisions
    at the end, rounded at 6.  Plan: per-user counts are one partial-agg
    shuffle; the rank is exactq.global_row_number — range-partitioned
    two-phase numbering, so the USERS-sized count table stays
    partition-parallel at 10^9 users."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    ranked = exactq.global_row_number(
        counts, ["x", "user_id"], out="i"
    ).select("x", "i")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("six"),
    )
    gini = F.round(
        F.lit(2.0) * F.col("six").cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
        - (F.col("n") + 1).cast("double") / F.col("n").cast("double"),
        6,
    )
    return agg.select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("total_events"),
        gini.alias("gini"),
    )


def sql_events_gini() -> str:
    return """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM counts
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(i * x) AS BIGINT) AS six
  FROM ranked
)
SELECT n AS n_users, sx AS total_events,
       round(2.0 * six::DOUBLE / (n * sx)::DOUBLE
             - (n + 1)::DOUBLE / n::DOUBLE, 6) AS gini
FROM agg
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve: signup -> first purchase.
# ---------------------------------------------------------------------------


def events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_risk, n_events, km_survival): Kaplan-Meier estimate of
    time-to-first-purchase for the signup cohort, with right-censoring at
    each non-converting user's last observed event — the
    censoring-correct conversion curve (a naive conversion rate
    UNDERCOUNTS because recent signups haven't had time to convert; KM is
    how growth teams read time-to-value).

    One row per day with >= 1 conversion: the at-risk count, events that
    day, and S(day) = prod over event days <= day of (1 - d/n).
    Exactness: durations are whole-day integers off whole-second epochs
    (the bot-score integerization); d and n are BIGINT; S is an ORDERED
    running sum of ln terms inside a window both engines evaluate in the
    same row order, rounded at 6 (the pagerank double argument).  Plan:
    three per-user aggregates (first signup, first qualifying purchase,
    last seen) ride one user-keyed shuffle each; the at-risk counts join
    the users-sized table against the BROADCAST event-day list (days are
    calendar-bounded)."""
    ev = _t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(sec).alias("t0"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", sec.alias("tp"))
        .join(su, "user_id")
        .where(F.col("tp") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("tp"))
    )
    last = ev.groupBy("user_id").agg(F.max(sec).alias("tl"))
    users = (
        su.join(pu, "user_id", "left")
        .join(last, "user_id")
        .select(
            "user_id",
            F.col("tp").isNotNull().alias("observed"),
            F.expr(
                "CASE WHEN tp IS NOT NULL THEN (tp - t0) div 86400 "
                "ELSE (tl - t0) div 86400 END"
            )
            .cast("bigint")
            .alias("t_days"),
        )
    )
    days = (
        users.where("observed")
        .groupBy(F.col("t_days").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    risk = (
        users.crossJoin(F.broadcast(days.select("day")))
        .where(F.col("t_days") >= F.col("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_risk"))
    )
    # bounded: one row per distinct event DAY (observation horizon),
    # never user- or corpus-sized
    w = exactq.bounded_window("day", "day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    term = F.lit(1.0) - F.col("n_events").cast("double") / F.col(
        "n_risk"
    ).cast("double")
    # On the last event day d == n, so the factor is 0 and S collapses to
    # 0 permanently; ln(0) is undefined (DuckDB errors, Spark nulls the
    # term and SUM would silently skip it), so guard the log and detect
    # the collapse with a running MIN over the same frame.
    km = F.when(F.min(term).over(w) <= 0.0, F.lit(0.0)).otherwise(
        F.round(
            F.exp(
                F.sum(
                    F.when(term > 0.0, F.log(term)).otherwise(F.lit(0.0))
                ).over(w)
            ),
            6,
        )
    )
    return days.join(risk, "day").select(
        "day", "n_risk", "n_events", km.alias("km_survival")
    )


def sql_events_survival() -> str:
    return """
WITH secs AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS sec FROM events
),
su AS (
  SELECT user_id, MIN(sec) AS t0 FROM secs
  WHERE event_type = 'signup' GROUP BY user_id
),
pu AS (
  SELECT s.user_id, MIN(s.sec) AS tp
  FROM secs s JOIN su ON su.user_id = s.user_id
  WHERE s.event_type = 'purchase' AND s.sec > su.t0
  GROUP BY s.user_id
),
last_seen AS (SELECT user_id, MAX(sec) AS tl FROM secs GROUP BY user_id),
users AS (
  SELECT su.user_id, pu.tp IS NOT NULL AS observed,
         CAST(CASE WHEN pu.tp IS NOT NULL THEN (pu.tp - su.t0) // 86400
                   ELSE (l.tl - su.t0) // 86400 END AS BIGINT) AS t_days
  FROM su LEFT JOIN pu ON pu.user_id = su.user_id
  JOIN last_seen l ON l.user_id = su.user_id
),
days AS (
  SELECT t_days AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM users WHERE observed GROUP BY t_days
),
risk AS (
  SELECT d.day, CAST(COUNT(*) AS BIGINT) AS n_risk
  FROM users u JOIN days d ON u.t_days >= d.day
  GROUP BY d.day
),
terms AS (
  SELECT d.day, r.n_risk, d.n_events,
         1.0 - d.n_events::DOUBLE / r.n_risk::DOUBLE AS term
  FROM days d JOIN risk r ON r.day = d.day
)
SELECT day, n_risk, n_events,
       CASE WHEN MIN(term) OVER w <= 0.0 THEN 0.0
            ELSE round(exp(SUM(CASE WHEN term > 0.0 THEN ln(term)
                                    ELSE 0.0 END) OVER w), 6)
       END AS km_survival
FROM terms
WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
"""


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartiles).
# ---------------------------------------------------------------------------

def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r_q, f_q, m_q, n_users, total_monetary_micros): users bucketed into
    the classic 4x4x4 RFM grid — recency (whole days since the user's last
    event, relative to the corpus max timestamp), frequency (event count),
    monetary (purchase value summed in integer MICRO-units).  The
    segmentation every lifecycle-marketing and churn model starts from.

    Determinism: all three per-user measures are BIGINT (days via
    whole-second epochs, micros via the engine-shared round-half-away cast
    — the int8_quant convention); quartile assignment reuses the
    quality_deciles pattern — three exact interpolated-percentile cut
    arrays in ONE 1-row broadcast (no ntile global sort), bucket = 1 +
    #{cuts strictly below}.  Plan: one user-keyed shuffle builds the
    measures, the cut row broadcasts back, the grid groupBy is 64 rows."""
    ev = _t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    micros = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 1000000.0, 0).cast("bigint"),
    ).otherwise(F.lit(0))
    per_user = ev.groupBy("user_id").agg(
        F.max(sec).alias("last_sec"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(micros).cast("bigint").alias("mon"),
    )
    now = per_user.agg(F.max("last_sec").alias("now_sec"))
    users = per_user.crossJoin(F.broadcast(now)).select(
        F.expr("(now_sec - last_sec) div 86400").cast("bigint").alias("rec"),
        "freq",
        "mon",
    )
    # integer-exact quartile cuts per measure (exactq, den=4) — all three
    # measures are bigint, so bucket membership is decided by exact
    # 4*v-vs-cut_scaled comparison in both engines
    # ONE melted histogram pass computes all three measures' quartile
    # cuts (grouped_quantile_cuts_scaled keyed by measure name) instead of
    # three separate cut jobs, then pivots to a 1-row broadcast
    melted = users.selectExpr(
        "stack(3, 'rec', rec, 'freq', freq, 'mon', mon) AS (m, v)"
    )
    cuts3 = exactq.grouped_quantile_cuts_scaled(melted, "m", "v", [1, 2, 3], 4)
    one = F.broadcast(
        cuts3.groupBy().agg(
            F.max(F.when(F.col("m") == "rec", F.col("cuts_scaled"))).alias("rc"),
            F.max(F.when(F.col("m") == "freq", F.col("cuts_scaled"))).alias("fc"),
            F.max(F.when(F.col("m") == "mon", F.col("cuts_scaled"))).alias("mc"),
        )
    )

    def bucket(v, c):
        return (
            F.lit(1)
            + F.aggregate(
                F.col(c),
                F.lit(0),
                lambda acc, cut: acc
                + F.when(
                    F.col(v).cast("bigint") * 4 > cut, 1
                ).otherwise(0),
            )
        ).cast("int")

    return (
        users.crossJoin(one)
        .select(
            bucket("rec", "rc").alias("r_q"),
            bucket("freq", "fc").alias("f_q"),
            bucket("mon", "mc").alias("m_q"),
            F.col("mon"),
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("mon").cast("bigint").alias("total_monetary_micros"),
        )
    )


def sql_events_rfm_segments() -> str:
    return f"""
WITH per_user AS (
  SELECT user_id,
         MAX(epoch_us(ts) // 1000000) AS last_sec,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 1000000.0, 0) AS BIGINT)
                   ELSE 0 END), 0) AS BIGINT) AS mon
  FROM events GROUP BY user_id
),
users AS (
  SELECT CAST(((SELECT MAX(last_sec) FROM per_user) - last_sec) // 86400
              AS BIGINT) AS rec,
         freq, mon
  FROM per_user
),
{exactq.sql_cuts_cte("users", "rec", [1, 2, 3], 4, prefix="rq")},
{exactq.sql_cuts_cte("users", "freq", [1, 2, 3], 4, prefix="fq")},
{exactq.sql_cuts_cte("users", "mon", [1, 2, 3], 4, prefix="mq")},
assigned AS (
  SELECT CAST(1 + len(list_filter(rq_cuts.cuts_scaled, c -> 4 * rec > c))
              AS INT) AS r_q,
         CAST(1 + len(list_filter(fq_cuts.cuts_scaled, c -> 4 * freq > c))
              AS INT) AS f_q,
         CAST(1 + len(list_filter(mq_cuts.cuts_scaled, c -> 4 * mon > c))
              AS INT) AS m_q,
         mon
  FROM users CROSS JOIN rq_cuts CROSS JOIN fq_cuts CROSS JOIN mq_cuts
)
SELECT r_q, f_q, m_q, COUNT(*) AS n_users,
       CAST(SUM(mon) AS BIGINT) AS total_monetary_micros
FROM assigned GROUP BY r_q, f_q, m_q
"""


# ---------------------------------------------------------------------------
# Peak session concurrency per day (sweep line, two-phase prefix sum).
# ---------------------------------------------------------------------------

def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_boundaries, peak_concurrent): the maximum number of
    simultaneously-open sessions observed on each day — the load number
    that sizes serving capacity, which per-day session COUNTS understate
    (a day of back-to-back sessions and a day of stacked ones count the
    same).  Sweep line over session boundaries: +1 at start, -1 just past
    end (closed intervals), global running sum, max per day.

    The global prefix sum is the pack_sequences two-phase shape: (1) one
    map-side-combinable per-day net/boundary aggregate, (2) a cumulative
    window over the DAYS table only (calendar-bounded — never the
    boundary stream), (3) broadcast the day offsets back and finish with
    a within-day window.  Tie order inside a day is total
    (t, delta, user_id, session_idx — ends before starts at the same
    microsecond), so both engines walk the sweep identically."""
    sess = events_sessionize(spark, sf_dir)
    bounds = sess.select(
        F.col("session_start_us").alias("t"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_idx",
    ).unionByName(
        sess.select(
            (F.col("session_end_us") + 1).alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_idx",
        )
    ).withColumn("day", F.expr("t div 86400000000").cast("bigint"))
    per_day = bounds.groupBy("day").agg(
        F.sum("delta").alias("net"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
    )
    # bounded: one row per distinct DAY (wall-clock horizon)
    day_off = per_day.select(
        "day",
        "n_boundaries",
        F.coalesce(
            F.sum("net").over(
                exactq.bounded_window("day", "day").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("day_off"),
    )
    w_in = (
        Window.partitionBy("day")
        .orderBy("t", "delta", "user_id", "session_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bounds.join(F.broadcast(day_off), "day")
        .select(
            "day",
            "n_boundaries",
            (F.col("day_off") + F.sum("delta").over(w_in)).alias("run"),
        )
        .groupBy("day", "n_boundaries")
        .agg(F.max("run").cast("bigint").alias("peak_concurrent"))
    )


def sql_events_peak_concurrency() -> str:
    # builds on sql_events_sessionize() VERBATIM so the session boundaries
    # provably match the gated sessionize oracle (no twin-drift)
    return f"""
WITH sess AS ({sql_events_sessionize()}),
bounds AS (
  SELECT session_start_us AS t, 1 AS delta, user_id, session_idx FROM sess
  UNION ALL
  SELECT session_end_us + 1, -1, user_id, session_idx FROM sess
),
runs AS (
  SELECT t // 86400000000 AS day,
         SUM(delta) OVER (ORDER BY t, delta, user_id, session_idx
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM bounds
),
nb AS (SELECT t // 86400000000 AS day, CAST(COUNT(*) AS BIGINT)
           AS n_boundaries FROM bounds GROUP BY 1)
SELECT r.day, nb.n_boundaries,
       CAST(MAX(r.run) AS BIGINT) AS peak_concurrent
FROM runs r JOIN nb ON nb.day = r.day
GROUP BY r.day, nb.n_boundaries
"""


# ---------------------------------------------------------------------------
# Stickiness (DAU/MAU) per month.
# ---------------------------------------------------------------------------

def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(month, mau, avg_dau_ppm, stickiness_ppm): per calendar month, the
    monthly-active-user count, the average daily-active count over the
    month's ACTIVE days, and stickiness = avg DAU / MAU — the
    engagement-frequency ratio (a 250k-DAU product with 1M MAU engages
    daily; the same DAU off 10M MAU is a monthly habit).  The growth
    metric every engagement dashboard leads with.

    Kept EXACT: avg DAU = sum of per-day distinct counts over the number
    of active days — a rational of BIGINTs; both it and the stickiness
    ratio are emitted in ppm by integer division (stickiness_ppm uses the
    unreduced fraction sum_dau*1e6 div (n_days*mau), so no intermediate
    rounding compounds).  Plan: two distinct-count shuffles keyed by
    (month[, day]) — both map-side partial; months are calendar-bounded."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM").alias("month"),
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        "user_id",
    )
    dau = (
        base.groupBy("month", "day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("dau"))
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("dau").cast("bigint").alias("sum_dau"),
        )
    )
    mau = base.groupBy("month").agg(
        F.count_distinct("user_id").cast("bigint").alias("mau")
    )
    return dau.join(mau, "month").select(
        "month",
        "mau",
        F.expr("sum_dau * 1000000 div n_days").cast("bigint").alias("avg_dau_ppm"),
        F.expr("sum_dau * 1000000 div (n_days * mau)")
        .cast("bigint")
        .alias("stickiness_ppm"),
    )


def sql_events_stickiness() -> str:
    return """
WITH base AS (
  SELECT strftime(ts, '%Y-%m') AS month, CAST(ts AS DATE) AS day, user_id
  FROM events
),
dau AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(d) AS BIGINT) AS sum_dau
  FROM (SELECT month, day, COUNT(DISTINCT user_id) AS d
        FROM base GROUP BY month, day)
  GROUP BY month
),
mau AS (
  SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM base GROUP BY month
)
SELECT d.month, m.mau,
       CAST(sum_dau * 1000000 // n_days AS BIGINT) AS avg_dau_ppm,
       CAST(sum_dau * 1000000 // (n_days * m.mau) AS BIGINT)
         AS stickiness_ppm
FROM dau d JOIN mau m ON m.month = d.month
"""


# ---------------------------------------------------------------------------
# Inter-event gap histogram (log2 latency buckets).
# ---------------------------------------------------------------------------

def events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_gaps, min_gap_sec, max_gap_sec): per-user consecutive
    inter-event gaps histogrammed by floor(log2(gap+1)) — the latency
    profile that picks the sessionization gap threshold (the valley
    between the within-session and between-session modes) instead of
    cargo-culting 30 minutes.  Complements events_bot_score (which
    collapses the same gaps to one regularity scalar per user).

    Gaps use the whole-second integerization shared with bot_score /
    sessionize; log2 of an exact BIGINT buckets identically in both
    engines.  One user-keyed window pass + a buckets-sized groupBy."""
    ev = _t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (sec - F.lag(sec).over(w)).alias("gap")
    return (
        ev.select(gap)
        .where(F.col("gap").isNotNull())
        .groupBy(
            F.floor(F.log2(F.col("gap") + 1)).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.min("gap").cast("bigint").alias("min_gap_sec"),
            F.max("gap").cast("bigint").alias("max_gap_sec"),
        )
    )


def sql_events_gap_histogram() -> str:
    return """
WITH gaps AS (
  SELECT epoch_us(ts) // 1000000
         - LAG(epoch_us(ts) // 1000000)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT CAST(floor(log2(gap + 1)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_gap_sec,
       CAST(MAX(gap) AS BIGINT) AS max_gap_sec
FROM gaps WHERE gap IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Per-user behavioral entropy over event types.
# ---------------------------------------------------------------------------

def events_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_events, n_types, entropy): Shannon entropy of each
    user's event-type distribution — the behavioral-diversity feature
    that separates single-purpose automation (entropy ~0 regardless of
    volume) from organic users, complementing events_bot_score's TIMING
    regularity with a WHAT-they-do axis.

    The per-user double sum folds over the type-sorted struct array
    (types are enum-sized, so the per-row array is tiny — the
    outlink_entropy convention), rounded at emit.  One user+type groupBy
    then a user groupBy: both map-side combinable."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = per.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.array_sort(F.collect_list(F.struct("event_type", "c"))).alias("d"),
    )
    tot = F.col("n_events").cast("double")
    ent = -F.aggregate(
        "d",
        F.lit(0.0),
        lambda acc, s: acc
        + (s["c"].cast("double") / tot) * F.log2(s["c"].cast("double") / tot),
    )
    return agg.select(
        "user_id", "n_events", "n_types", F.round(ent, 6).alias("entropy")
    )


def sql_events_session_entropy() -> str:
    return """
WITH per AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
),
agg AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         list_sort(list({'event_type': event_type, 'c': c})) AS d
  FROM per GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       round(-list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(d, s ->
           (s.c::DOUBLE / n_events) * log2(s.c::DOUBLE / n_events))),
         (acc, e) -> acc + e), 6) AS entropy
FROM agg
"""


# ---------------------------------------------------------------------------
# Lorenz / Pareto decile table of user activity.
# ---------------------------------------------------------------------------

def events_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_users, n_events, cum_events_ppm): users bucketed into
    activity deciles (decile 1 = heaviest) with each decile's event mass
    and the running cumulative share — the Lorenz/Pareto table behind
    "the top 10% of users produce Y% of traffic".  events_gini collapses
    this curve to one scalar; the decile table is what capacity and
    abuse teams actually act on.

    Decile cutpoints reuse the quality_deciles pattern (nine exact
    percentiles in ONE broadcast row — no ntile global sort); counts and
    the cumulative share are exact BIGINT/ppm, and the cumulative window
    runs over the 10-row decile table only."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # integer-exact decile cuts (exactq): counts are bigint, so the
    # interpolated cut is exact in tenths — no cross-engine float seam
    cuts = exactq.quantile_cuts_scaled(per, "c", list(range(1, 10)), 10)
    # decile 1 = heaviest users: 1 + #{cuts strictly ABOVE this count}
    per_dec = (
        per.crossJoin(F.broadcast(cuts))
        .select(
            exactq.bucket_expr("c", 10, reverse=True)
            .cast("int")
            .alias("decile"),
            "c",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("n_events"),
        )
    )
    tot = per_dec.agg(F.sum("n_events").cast("bigint").alias("all_events"))
    # bounded: 10 decile rows
    w = exactq.bounded_window("decile", "decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "n_events",
            F.sum(F.expr("n_events * 1000000 div all_events"))
            .over(w)
            .cast("bigint")
            .alias("cum_events_ppm"),
        )
    )


def sql_events_pareto_curve() -> str:
    return f"""
WITH per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
),
{exactq.sql_cuts_cte("per", "c", list(range(1, 10)), 10)},
assigned AS (
  SELECT CAST(1 + len(list_filter(cuts_scaled, cut -> 10 * c < cut))
              AS INT) AS decile, c
  FROM per CROSS JOIN qc_cuts
),
per_dec AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(c) AS BIGINT) AS n_events
  FROM assigned GROUP BY decile
),
tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS all_events FROM per_dec)
SELECT decile, n_users, n_events,
       CAST(SUM(n_events * 1000000 // all_events)
            OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_events_ppm
FROM per_dec CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Semi-structured props schema profiler.
# ---------------------------------------------------------------------------

def _props_rich():
    """Deterministic enriched JSON sidecar: the driver's props column is
    single-key, so optional keys are reconstructed from row identity (the
    trainprep._tier_col convention) to give the profiler a real mixed
    schema to discover — utm on every 3rd event, price on purchases,
    flag on every 7th."""
    base = F.get_json_object("props", "$.k")
    return F.concat(
        F.lit('{"k": '),
        base,
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.lit(', "utm": "src'),
                (F.col("event_id") % 5).cast("string"),
                F.lit('"'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("event_type") == "purchase",
            F.concat(
                F.lit(', "price": '),
                F.round(F.col("value"), 2).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("event_id") % 7 == 0, F.lit(', "flag": true')
        ).otherwise(F.lit("")),
        F.lit("}"),
    )


def events_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key, n_rows, presence_ppm, top_type, n_type_rows): generic schema
    discovery over a JSON sidecar column — which keys exist, how often,
    and each key's dominant value type (integer / double / bool /
    string, inferred by pattern — the portable subset engines agree on).
    The profiling pass every semi-structured ingest runs BEFORE writing
    extraction expressions like events_json_props' `$.k`; schema DRIFT
    in these sidecars is how upstream teams break downstream pipelines
    silently.

    Plan: json_object_keys + explode ride the scan (JVM expressions, no
    UDF); per-(key, type) counts are map-side combinable; the dominant
    type is a window over the keys-sized table.  Counts BIGINT, presence
    exact ppm."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", _props_rich().alias("pj")
    )
    n_rows = ev.count()
    # from_json to map<string,string> (explodes straight to key/val —
    # get_json_object needs a FOLDABLE path, so it can't consume the
    # discovered key column); numbers/bools coerce to their JSON text,
    # matching DuckDB's json_extract_string
    kv = ev.select(
        F.explode(F.from_json("pj", "map<string,string>")).alias("key", "val")
    )
    typed = kv.select(
        "key",
        F.when(F.col("val").rlike("^-?[0-9]+$"), "integer")
        .when(F.col("val").rlike("^-?[0-9]+\\.[0-9]+$"), "double")
        .when(F.col("val").isin("true", "false"), "bool")
        .otherwise("string")
        .alias("vtype"),
    )
    per_type = typed.groupBy("key", "vtype").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("key").orderBy(F.desc("c"), F.asc("vtype"))
    per_key = (
        per_type.withColumn("rk", F.row_number().over(w))
        .groupBy("key")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.max(F.when(F.col("rk") == 1, F.col("vtype"))).alias("top_type"),
            F.max(F.when(F.col("rk") == 1, F.col("c")))
            .cast("bigint")
            .alias("n_type_rows"),
        )
    )
    return per_key.select(
        "key",
        "n_rows",
        F.expr(f"n_rows * 1000000 div {n_rows}")
        .cast("bigint")
        .alias("presence_ppm"),
        "top_type",
        "n_type_rows",
    )


def sql_events_props_profile() -> str:
    pj = (
        "'{\"k\": ' || json_extract_string(props, '$.k')"
        " || CASE WHEN event_id % 3 = 0"
        " THEN ', \"utm\": \"src' || (event_id % 5) || '\"' ELSE '' END"
        " || CASE WHEN event_type = 'purchase'"
        " THEN ', \"price\": ' || CAST(round(value, 2) AS VARCHAR)"
        " ELSE '' END"
        " || CASE WHEN event_id % 7 = 0 THEN ', \"flag\": true'"
        " ELSE '' END || '}'"
    )
    return f"""
WITH ev AS (SELECT event_id, {pj} AS pj FROM events),
kv AS (
  SELECT pj, unnest(json_keys(pj)) AS key FROM ev
),
typed AS (
  SELECT key,
         CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN 'integer'
              WHEN regexp_matches(val, '^-?[0-9]+\\.[0-9]+$') THEN 'double'
              WHEN val IN ('true', 'false') THEN 'bool'
              ELSE 'string' END AS vtype
  FROM (SELECT key, json_extract_string(pj, '$.' || key) AS val FROM kv)
),
per_type AS (
  SELECT key, vtype, CAST(COUNT(*) AS BIGINT) AS c
  FROM typed GROUP BY key, vtype
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                               ORDER BY c DESC, vtype) AS rk
  FROM per_type
),
per_key AS (
  SELECT key, CAST(SUM(c) AS BIGINT) AS n_rows,
         MAX(CASE WHEN rk = 1 THEN vtype END) AS top_type,
         CAST(MAX(CASE WHEN rk = 1 THEN c END) AS BIGINT) AS n_type_rows
  FROM ranked GROUP BY key
)
SELECT key, n_rows,
       CAST(n_rows * 1000000 // (SELECT COUNT(*) FROM events) AS BIGINT)
         AS presence_ppm,
       top_type, n_type_rows
FROM per_key
"""


# ---------------------------------------------------------------------------
# t-closeness audit (EMD between class and global sensitive distributions).
# ---------------------------------------------------------------------------

TCLOSE_T_PPM = 200_000  # release gate: EMD(class, global) <= 0.2


def events_t_closeness(
    spark: SparkSession, sf_dir: str, t_ppm: int = TCLOSE_T_PPM
) -> DataFrame:
    """(event_type, hour, n_c, m_vals, emd_num, emd_ppm, at_risk): the
    t-closeness audit completing the k-anonymity / l-diversity release
    trio — a QI class can pass both and still leak if its sensitive
    DISTRIBUTION deviates from the table-wide one (skewness attack:
    "people in this class mostly have the rare value").  Classes are the
    same QI pair (event_type, hour-of-day) and the sensitive attribute
    the same ``k`` payload prop as events_l_diversity; the distance is
    the ordered-attribute Earth Mover's Distance of Li, Li &
    Venkatasubramanian 2007: EMD = (1/(m-1)) * sum_i |CumP_class(i) -
    CumP_global(i)| over the m global sensitive values.

    Determinism: cumulative probabilities compare as integer
    cross-products (|cum_c * n - cum_g * n_c|, never a float fraction);
    emd_ppm is one integer floor division at the end.

    Plan: the log collapses to (QI, sens) counts in one shuffle; the
    grid is |classes| x |global sensitive domain| — both bounded (24 *
    |types| classes, a payload-enum domain) — so every window after the
    first groupBy runs on tiny aggregates."""
    ev = _t(spark, sf_dir, "events")
    cls = ev.select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour"),
        F.get_json_object("props", "$.k").cast("int").alias("sens"),
    ).where(F.col("sens").isNotNull())
    cc = cls.groupBy("event_type", "hour", "sens").agg(
        F.count(F.lit(1)).alias("c")
    )
    gg = cls.groupBy("sens").agg(F.count(F.lit(1)).alias("g"))
    classes = cc.groupBy("event_type", "hour").agg(
        F.sum("c").alias("n_c")
    )
    grid = classes.crossJoin(F.broadcast(gg.select("sens")))
    joined = grid.join(cc, ["event_type", "hour", "sens"], "left").select(
        "event_type",
        "hour",
        "n_c",
        "sens",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )
    wc = (
        Window.partitionBy("event_type", "hour")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # bounded: one row per distinct sensitive value (attribute domain)
    wg = exactq.bounded_window("sens", "sens").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = exactq.bounded_window("sens").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gcum = gg.select(
        "sens",
        F.sum("g").over(wg).alias("cum_g"),
        F.sum("g").over(w_all).alias("n"),
        F.count(F.lit(1)).over(w_all).alias("m_vals"),
    )
    scored = (
        joined.withColumn("cum_c", F.sum("c").over(wc))
        .join(F.broadcast(gcum), "sens")
        .select(
            "event_type",
            "hour",
            "n_c",
            "m_vals",
            F.abs(
                F.col("cum_c") * F.col("n") - F.col("cum_g") * F.col("n_c")
            ).alias("gap"),
            "n",
        )
    )
    return scored.groupBy("event_type", "hour").agg(
        F.min("n_c").cast("bigint").alias("n_c"),
        F.min("m_vals").cast("bigint").alias("m_vals"),
        F.sum("gap").cast("bigint").alias("emd_num"),
        F.expr(
            "div(1000000 * sum(gap),"
            " greatest(min(m_vals) - 1, 1) * min(n_c) * min(n))"
        ).alias("emd_ppm"),
        (
            F.expr(
                "div(1000000 * sum(gap),"
                " greatest(min(m_vals) - 1, 1) * min(n_c) * min(n))"
            )
            > t_ppm
        ).alias("at_risk"),
    )


def sql_events_t_closeness(t_ppm: int = TCLOSE_T_PPM) -> str:
    return f"""
WITH cls AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         CAST(json_extract_string(props, '$.k') AS INT) AS sens
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
),
cc AS (
  SELECT event_type, hour, sens, COUNT(*) AS c
  FROM cls GROUP BY 1, 2, 3
),
gg AS (SELECT sens, COUNT(*) AS g FROM cls GROUP BY sens),
classes AS (
  SELECT event_type, hour, SUM(c) AS n_c FROM cc GROUP BY 1, 2
),
grid AS (
  SELECT cl.event_type, cl.hour, cl.n_c, g.sens
  FROM classes cl CROSS JOIN gg g
),
joined AS (
  SELECT g.event_type, g.hour, g.n_c, g.sens, COALESCE(cc.c, 0) AS c
  FROM grid g LEFT JOIN cc
    ON cc.event_type = g.event_type AND cc.hour = g.hour
   AND cc.sens = g.sens
),
gcum AS (
  SELECT sens,
         SUM(g) OVER (ORDER BY sens ROWS UNBOUNDED PRECEDING) AS cum_g,
         SUM(g) OVER () AS n,
         COUNT(*) OVER () AS m_vals
  FROM gg
),
scored AS (
  SELECT j.event_type, j.hour, j.n_c, gc.m_vals, gc.n,
         abs(SUM(j.c) OVER (PARTITION BY j.event_type, j.hour
                            ORDER BY j.sens ROWS UNBOUNDED PRECEDING)
               * gc.n
             - gc.cum_g * j.n_c) AS gap
  FROM joined j JOIN gcum gc ON gc.sens = j.sens
)
SELECT event_type, hour,
       CAST(MIN(n_c) AS BIGINT) AS n_c,
       CAST(MIN(m_vals) AS BIGINT) AS m_vals,
       CAST(SUM(gap) AS BIGINT) AS emd_num,
       CAST((1000000 * SUM(gap))
            // (GREATEST(MIN(m_vals) - 1, 1) * MIN(n_c) * MIN(n)) AS BIGINT)
         AS emd_ppm,
       CAST((1000000 * SUM(gap))
            // (GREATEST(MIN(m_vals) - 1, 1) * MIN(n_c) * MIN(n)) AS BIGINT)
         > {t_ppm} AS at_risk
FROM scored GROUP BY event_type, hour
"""


# ---------------------------------------------------------------------------
# Right-to-be-forgotten delete-amplification plan.
# ---------------------------------------------------------------------------

DEL_MOD = 11   # victim selector: md5-bucket(user) % DEL_MOD == 0 (~9%)
DAY_US = 86_400_000_000


def events_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, n_rows, n_del, del_ppm, touched): the
    delete-amplification plan for a right-to-be-forgotten batch — given
    a deterministic ~9% victim set of users (md5 bucket, standing in
    for the legal request list), report per storage partition
    (event_type x epoch-day, the layout the engine's compaction/z-order
    family assumes) how many rows live there, how many must be deleted,
    and whether the partition is touched at all.  touched-partitions /
    total-partitions IS the rewrite amplification: with copy-on-write
    parquet every touched partition is rewritten wholesale, so a small
    row delete can be a near-total data rewrite — this plan is the number a
    platform reads before choosing merge-on-read or deletion vectors.

    Determinism: the victim set is the md5-bucket idiom; everything
    else is exact counts and one ppm floor division.

    Plan: victim flag is a scan-projection expression (no join against
    a victim table — the request list would broadcast); ONE partial-agg
    groupBy on the partition key computes rows and deletes together."""
    ev = _t(spark, sf_dir, "events")
    victim = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("bigint")
        % DEL_MOD
        == 0
    )
    return (
        ev.select(
            "event_type",
            F.expr(
                f"div(unix_micros(cast(ts as timestamp)), {DAY_US})"
            ).alias("day"),
            victim.alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("v"), 1).otherwise(0)).cast("bigint")
            .alias("n_del"),
        )
        .select(
            "event_type",
            "day",
            "n_rows",
            "n_del",
            F.expr("div(1000000 * n_del, n_rows)").alias("del_ppm"),
            (F.col("n_del") > 0).alias("touched"),
        )
    )


def sql_events_delete_plan() -> str:
    victim = (
        "CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)"
        f" AS BIGINT) % {DEL_MOD} = 0"
    )
    return f"""
WITH agg AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
         COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN {victim} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_del
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, day, n_rows, n_del,
       CAST((1000000 * n_del) // n_rows AS BIGINT) AS del_ppm,
       n_del > 0 AS touched
FROM agg
"""


# ---------------------------------------------------------------------------
# Backfill-parity audit (incremental view maintenance check).
# ---------------------------------------------------------------------------

BF_SPLIT_PPM = 800_000  # base = first 80% of days; delta = the rest


def events_backfill_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, base_days, delta_days, merged_rows,
    recomputed_rows, merged_sum_cents, recomputed_sum_cents, parity):
    the backfill-parity audit every incremental pipeline runs after a
    catch-up — maintain the daily (type, day) rollup incrementally
    (base partition + delta partition, merged by re-aggregation) and
    prove it equals the from-scratch recompute, per type.  The split
    point is the {BF_SPLIT_PPM}-ppm quantile of the day range, standing
    in for "yesterday's watermark"; parity must be TRUE on every row —
    a FALSE here is how non-mergeable state (last-write-wins columns,
    floats summed in different orders) reveals itself before it
    corrupts a year of history.

    Determinism: sums are exact BIGINT cents; merge = SUM of partial
    SUMs, the associative path partial aggregation itself relies on.

    Plan: base and delta are partition-pruned scans of the same table
    (at scale: day-partitioned storage serves the delta from new files
    only); each side is one map-side-combinable groupBy; the parity
    join runs on the |types|-row aggregates."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts as timestamp)), {DAY_US})")
        .alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    bounds = ev.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    split = bounds.select(
        (
            F.col("lo")
            + F.expr(f"div({BF_SPLIT_PPM} * (hi - lo), 1000000)")
        ).alias("cut")
    )
    evc = ev.crossJoin(F.broadcast(split))

    def daily(df):
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("rows"), F.sum("cents").alias("sum_c")
        )

    base = daily(evc.where(F.col("day") <= F.col("cut")))
    delta = daily(evc.where(F.col("day") > F.col("cut")))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("rows").alias("rows"), F.sum("sum_c").alias("sum_c")
        )
    )
    recomputed = daily(evc)

    def per_type(df, pfx):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{pfx}_days"),
            F.sum("rows").cast("bigint").alias(f"{pfx}_rows"),
            F.sum("sum_c").cast("bigint").alias(f"{pfx}_sum_cents"),
        )
    m = per_type(merged, "merged")
    r = per_type(recomputed, "recomputed")
    sides = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("base_days")
    ).join(
        delta.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("delta_days")
        ),
        "event_type",
        "outer",
    ).select(
        "event_type",
        F.coalesce(F.col("base_days"), F.lit(0)).alias("base_days"),
        F.coalesce(F.col("delta_days"), F.lit(0)).alias("delta_days"),
    )
    return (
        m.join(r, "event_type")
        .join(sides, "event_type")
        .select(
            "event_type",
            F.col("recomputed_days").alias("n_days"),
            "base_days",
            "delta_days",
            F.col("merged_rows").alias("merged_rows"),
            F.col("recomputed_rows").alias("recomputed_rows"),
            "merged_sum_cents",
            "recomputed_sum_cents",
            (
                (F.col("merged_rows") == F.col("recomputed_rows"))
                & (
                    F.col("merged_sum_cents")
                    == F.col("recomputed_sum_cents")
                )
                & (F.col("merged_days") == F.col("recomputed_days"))
            ).alias("parity"),
        )
    )


def sql_events_backfill_parity() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
split AS (
  SELECT MIN(day) + ({BF_SPLIT_PPM} * (MAX(day) - MIN(day))) // 1000000
           AS cut
  FROM ev
),
base AS (
  SELECT event_type, day, COUNT(*) AS rows_, SUM(cents) AS sum_c
  FROM ev, split WHERE day <= cut GROUP BY 1, 2
),
delta AS (
  SELECT event_type, day, COUNT(*) AS rows_, SUM(cents) AS sum_c
  FROM ev, split WHERE day > cut GROUP BY 1, 2
),
merged AS (
  SELECT event_type, day, SUM(rows_) AS rows_, SUM(sum_c) AS sum_c
  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
  GROUP BY 1, 2
),
recomputed AS (
  SELECT event_type, day, COUNT(*) AS rows_, SUM(cents) AS sum_c
  FROM ev GROUP BY 1, 2
),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS merged_days,
         CAST(SUM(rows_) AS BIGINT) AS merged_rows,
         CAST(SUM(sum_c) AS BIGINT) AS merged_sum_cents
  FROM merged GROUP BY event_type
),
r AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS recomputed_days,
         CAST(SUM(rows_) AS BIGINT) AS recomputed_rows,
         CAST(SUM(sum_c) AS BIGINT) AS recomputed_sum_cents
  FROM recomputed GROUP BY event_type
),
sides AS (
  SELECT COALESCE(b.event_type, d.event_type) AS event_type,
         CAST(COALESCE(b.n, 0) AS BIGINT) AS base_days,
         CAST(COALESCE(d.n, 0) AS BIGINT) AS delta_days
  FROM (SELECT event_type, COUNT(*) AS n FROM base GROUP BY 1) b
  FULL OUTER JOIN
       (SELECT event_type, COUNT(*) AS n FROM delta GROUP BY 1) d
    ON d.event_type = b.event_type
)
SELECT m.event_type, r.recomputed_days AS n_days, s.base_days,
       s.delta_days, m.merged_rows, r.recomputed_rows,
       m.merged_sum_cents, r.recomputed_sum_cents,
       (m.merged_rows = r.recomputed_rows
        AND m.merged_sum_cents = r.recomputed_sum_cents
        AND m.merged_days = r.recomputed_days) AS parity
FROM m JOIN r USING (event_type) JOIN sides s USING (event_type)
"""


# ---------------------------------------------------------------------------
# Functional-dependency discovery (TANE-style single-attribute candidates).
# ---------------------------------------------------------------------------

FD_CANDIDATES = [
    ("event_id", "user_id"),    # key -> anything: must hold
    ("user_id", "event_type"),
    ("event_type", "user_id"),
    ("props", "event_type"),
]


def events_fd_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lhs, rhs, n_lhs, n_pairs, fd_holds, violation_ppm): single-
    attribute functional-dependency check over the events log — the
    TANE/data-profiling primitive: lhs -> rhs holds iff every lhs value
    maps to exactly one rhs value, i.e. COUNT(DISTINCT lhs) =
    COUNT(DISTINCT (lhs, rhs)).  The candidate list covers the key
    column (must hold — a failing row here means corrupt data) and the
    plausible-but-false pairs a schema-inference tool must reject;
    violation_ppm = (n_pairs - n_lhs) * 1e6 div n_lhs quantifies HOW
    false.

    Plan: one distinct-aggregate pair per candidate (Spark rewrites
    count-distinct into expand + two-phase aggregate — map-side
    combinable); candidates are a fixed constant, results union to a
    4-row table.  At 100 TB swap in approx_count_distinct per the
    module-wide sampling note."""
    ev = _t(spark, sf_dir, "events")
    outs = []
    for lhs, rhs in FD_CANDIDATES:
        outs.append(
            ev.agg(
                F.countDistinct(F.col(lhs)).cast("bigint").alias("n_lhs"),
                F.countDistinct(F.col(lhs), F.col(rhs))
                .cast("bigint")
                .alias("n_pairs"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_lhs",
                "n_pairs",
                (F.col("n_pairs") == F.col("n_lhs")).alias("fd_holds"),
                F.expr("(n_pairs - n_lhs) * 1000000 div n_lhs")
                .cast("bigint")
                .alias("violation_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sql_events_fd_candidates() -> str:
    parts = []
    for lhs, rhs in FD_CANDIDATES:
        parts.append(
            f"""SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
       CAST(COUNT(DISTINCT {lhs}) AS BIGINT) AS n_lhs,
       CAST(COUNT(DISTINCT ({lhs}, {rhs})) AS BIGINT) AS n_pairs,
       COUNT(DISTINCT ({lhs}, {rhs})) = COUNT(DISTINCT {lhs}) AS fd_holds,
       CAST((COUNT(DISTINCT ({lhs}, {rhs})) - COUNT(DISTINCT {lhs}))
            * 1000000 // COUNT(DISTINCT {lhs}) AS BIGINT) AS violation_ppm
FROM events"""
        )
    return "\n" + "\nUNION ALL\n".join(parts) + "\n"


# ---------------------------------------------------------------------------
# Per-column Shannon entropy profile (compressibility / key-quality).
# ---------------------------------------------------------------------------

ENTROPY_COLS = ["event_type", "user_id", "cents", "props"]


def events_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, n_rows, n_distinct, entropy_micro_nats, max_micro_nats,
    norm_ppm): exact Shannon entropy per profiled column — the
    data-profiler signal that ranks columns by information content
    (dictionary-encoding candidates near 0; key-quality candidates near
    ln(n_distinct)).  H = ln(N) - (sum over values of c*ln(c)) / N.

    Float discipline: the per-distinct-value term c*ln(c) is quantized
    ONCE to integer micro-nats and summed exactly; ln(N)/ln(n_distinct)
    are single-row computations — nothing float ever crosses a grouped
    aggregation.  Plan per column: one value-keyed partial-agg count,
    then a 1-row rollup; the four results union to a 4-row table."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "props",
    )
    outs = []
    for c in ENTROPY_COLS:
        cnt = ev.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        term = F.floor(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
            * 1e6 + F.lit(0.5)
        ).cast("bigint")
        agg = cnt.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum(term).alias("s"),
        )
        outs.append(
            agg.select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_distinct",
                F.expr(
                    "(CAST(floor(ln(CAST(n_rows AS DOUBLE)) * 1e6 + 0.5)"
                    " AS BIGINT) * n_rows - s) div n_rows"
                )
                .cast("bigint")
                .alias("entropy_micro_nats"),
                F.expr(
                    "CAST(floor(ln(CAST(n_distinct AS DOUBLE)) * 1e6 + 0.5)"
                    " AS BIGINT)"
                ).alias("max_micro_nats"),
                F.expr(
                    "((CAST(floor(ln(CAST(n_rows AS DOUBLE)) * 1e6 + 0.5)"
                    " AS BIGINT) * n_rows - s) div n_rows) * 1000000"
                    " div greatest(CAST(floor(ln(CAST(n_distinct AS DOUBLE))"
                    " * 1e6 + 0.5) AS BIGINT), 1)"
                )
                .cast("bigint")
                .alias("norm_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sql_events_column_entropy() -> str:
    parts = []
    for c in ENTROPY_COLS:
        expr = (
            "CAST(round(value * 100) AS BIGINT)" if c == "cents" else c
        )
        parts.append(
            f"""SELECT '{c}' AS col_name, n_rows, n_distinct,
       CAST((CAST(floor(ln(n_rows::DOUBLE) * 1e6 + 0.5) AS BIGINT)
             * n_rows - s) // n_rows AS BIGINT) AS entropy_micro_nats,
       CAST(floor(ln(n_distinct::DOUBLE) * 1e6 + 0.5) AS BIGINT)
         AS max_micro_nats,
       CAST(((CAST(floor(ln(n_rows::DOUBLE) * 1e6 + 0.5) AS BIGINT)
              * n_rows - s) // n_rows) * 1000000
            // GREATEST(CAST(floor(ln(n_distinct::DOUBLE) * 1e6 + 0.5)
                             AS BIGINT), 1) AS BIGINT) AS norm_ppm
FROM (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(CAST(floor(c::DOUBLE * ln(c::DOUBLE) * 1e6 + 0.5)
                       AS BIGINT)) AS BIGINT) AS s
  FROM (SELECT {expr} AS v, COUNT(*) AS c FROM events GROUP BY 1)
)"""
        )
    return "\n" + "\nUNION ALL\n".join(parts) + "\n"


# ---------------------------------------------------------------------------
# GROUPING SETS rollup (multi-granularity report in one pass).
# ---------------------------------------------------------------------------

def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hod, gid, n, sum_cents): the four report grains —
    (type, hour-of-day), (type), (hour-of-day), grand total — computed in
    ONE scan via GROUP BY GROUPING SETS, with GROUPING_ID disambiguating
    the all-NULL placeholder rows.  The multi-granularity dashboard shape
    that CUBE (events_cube) generalizes; spelled with explicit sets here
    because real reports want a chosen subset, not the full lattice.

    hod is the tz-proof integer hour-of-day (epoch-us div hour mod 24).
    Plan: Spark expands the input once per set and runs a single
    partial-aggregated shuffle — same cost profile as one groupBy, no
    self-union of four scans."""
    _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"div(unix_micros(cast(ts as timestamp)), {3_600_000_000})")
        .__mod__(24)
        .alias("hod"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
SELECT event_type, hod,
       CAST(grouping_id(event_type, hod) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM _gs_events
GROUP BY GROUPING SETS ((event_type, hod), (event_type), (hod), ())
"""
    )


def sql_events_grouping_sets() -> str:
    return """
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, hod,
       CAST(grouping_id(event_type, hod) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM e
GROUP BY GROUPING SETS ((event_type, hod), (event_type), (hod), ())
"""


# ---------------------------------------------------------------------------
# Sequential pattern support (PrefixSpan-style length-2 patterns).
# ---------------------------------------------------------------------------

SEQ_PPM = 1_000_000


def events_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type_a, type_b, n_users, support_ppm, lift_ppm): distinct-user
    support of the sequential pattern "some `type_a` event happens strictly
    before some `type_b` event" — the length-2 core of PrefixSpan-style
    sequential pattern mining, which (unlike the consecutive-transition
    Markov table, events_markov_transitions) counts ANY-gap ordered
    occurrence.  `lift_ppm` rates the pattern against independence:
    n_users * n_total * 1e6 div (n_users_with_a * n_users_with_b), exact
    integer.  A user supports a->b iff min_ts(a) < max_ts(b); a->a
    requires two occurrences at distinct timestamps.

    Scale: the raw stream collapses to one (user, type) partial-agg
    shuffle (<= |users|*|types| rows); the per-user self-join fans out at
    most |types|^2 per user on the already-aggregated table; the final
    pattern count is map-side combinable, and both marginal tables ride
    broadcast joins.  No window over the raw stream, no per-user
    sequence materialization — 10^12 events reduce before any join."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
    )
    per = ev.groupBy("user_id", "event_type").agg(
        F.min("ts_us").alias("min_ts"), F.max("ts_us").alias("max_ts")
    )
    tot = per.select(F.countDistinct("user_id").alias("n_total"))
    tu = per.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    a = per.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("min_ts").alias("a_min"),
    )
    b = per.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("max_ts").alias("b_max"),
    )
    counts = (
        a.join(b, "user_id")
        .where(F.col("a_min") < F.col("b_max"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(
                tu.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_type").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                tu.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_type").alias("n_b"),
                )
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_users",
            # widened to decimal(38,0) before the triple product: in int64
            # n_users * n_total * 1e6 overflows past ~3M distinct users —
            # Spark (non-ANSI) would wrap silently while DuckDB raises,
            # so the engines would diverge exactly at scale.
            F.expr(
                f"div(cast(n_users as decimal(38,0)) * {SEQ_PPM}, n_total)"
            )
            .cast("bigint")
            .alias("support_ppm"),
            F.expr(
                f"div(cast(n_users as decimal(38,0)) * n_total * {SEQ_PPM},"
                f" cast(n_a as decimal(38,0)) * n_b)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )


def sql_events_seq_patterns() -> str:
    return f"""
WITH per AS (
  SELECT user_id, event_type,
         MIN(epoch_us(ts)) AS min_ts, MAX(epoch_us(ts)) AS max_ts
  FROM events GROUP BY 1, 2
),
tot AS (SELECT COUNT(DISTINCT user_id) AS n_total FROM per),
tu AS (SELECT event_type, COUNT(*) AS n_type FROM per GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM per a JOIN per b ON a.user_id = b.user_id
  WHERE a.min_ts < b.max_ts
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_users,
       CAST(CAST(n_users AS HUGEINT) * {SEQ_PPM} // t.n_total
            AS BIGINT) AS support_ppm,
       CAST(CAST(n_users AS HUGEINT) * t.n_total * {SEQ_PPM}
            // (CAST(ta.n_type AS HUGEINT) * tb.n_type)
            AS BIGINT) AS lift_ppm
FROM pairs
CROSS JOIN tot t
JOIN tu ta ON ta.event_type = pairs.type_a
JOIN tu tb ON tb.event_type = pairs.type_b
"""


# ---------------------------------------------------------------------------
# Zone-map (min/max) data-skipping audit.
# ---------------------------------------------------------------------------

ZM_PROBE_CENTS = 7_000   # probe predicate: value >= $70 (~p75 of values)
ZM_ZONES = 32            # simulated file count for the clustered layout


def events_zonemap_prune(
    spark: SparkSession,
    sf_dir: str,
    probe_cents: int = ZM_PROBE_CENTS,
    zones: int = ZM_ZONES,
) -> DataFrame:
    """(zone, n_rows, min_cents, max_cents, pruned): the per-file zone
    map (min/max of the value column) of the VALUE-CLUSTERED layout —
    rows range-partitioned into ``zones`` files at exact percentile
    boundaries (what a repartitionByRange + sortWithinPartitions write
    produces) — and whether the standing probe predicate
    ``value >= $probe`` skips each file (max < probe).  This is the
    data-skipping payoff check for the layout family: events_zorder_key
    picks the clustering, corpus_compaction_plan sizes the files, and
    this audit measures the number a lakehouse publishes as "files
    skipped" — on a clustered layout a selective probe prunes a stable
    PREFIX of files at any scale, which is the whole argument for paying
    the clustered write.  Exact integer cents.

    Scale: ntile(zones) OVER (ORDER BY cents) would collapse the table
    into ONE window partition — so, exactly as text_quality_deciles, the
    zone boundaries come from one exact-percentile aggregate row
    broadcast back (zone = 1 + #cutpoints strictly below the row), and
    the zone map is then a map-side-combinable |zones|-row aggregate
    with the probe check a projection on it.  Two corpus passes, zero
    global sort — the same passes the clustered writer itself makes."""
    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    # Rank-based DISCRETE cut points, all-integer: cut_i = the smallest
    # cents value whose cumulative count reaches ceil(i*n/zones).  An
    # interpolated percentile (Spark percentile vs DuckDB quantile_cont)
    # is a float seam — a last-ulp difference between engines can flip a
    # boundary row's zone; discrete cuts are decided by exact bigint
    # comparison in both.  The cumulative window runs over the VALUE
    # HISTOGRAM (|distinct cents| rows), never the corpus; the running
    # count is exactq's two-phase partial cumsum, so even a very wide
    # price domain stays partition-parallel.
    hist = ev.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    cum = exactq.cumsum_by_value(hist, "cents", "cnt")
    tot = hist.agg(F.sum("cnt").alias("n"))
    cutrows = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "cents",
            "cnt",
            "cum",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(zones - 1))).alias("i"),
        )
        .withColumn("target", F.expr(f"div(i * n + {zones} - 1, {zones})"))
        .where(
            (F.col("target") > F.col("cum") - F.col("cnt"))
            & (F.col("target") <= F.col("cum"))
        )
    )
    cuts = cutrows.groupBy().agg(
        F.sort_array(F.collect_list("cents")).alias("cuts")
    )
    zone = F.lit(1) + F.aggregate(
        F.col("cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("cents") > c, 1).otherwise(0),
    )
    zm = (
        ev.crossJoin(F.broadcast(cuts))
        .select("cents", zone.cast("bigint").alias("zone"))
        .groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    return zm.select(
        "zone",
        "n_rows",
        "min_cents",
        "max_cents",
        (F.col("max_cents") < probe_cents).alias("pruned"),
    )


def sql_events_zonemap_prune(
    probe_cents: int = ZM_PROBE_CENTS, zones: int = ZM_ZONES
) -> str:
    return f"""
WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
hist AS (SELECT cents, COUNT(*) AS cnt FROM ev GROUP BY 1),
cum AS (
  SELECT cents, cnt,
         SUM(cnt) OVER (ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
),
tot AS (SELECT SUM(cnt) AS n FROM hist),
cutrows AS (
  SELECT c.cents
  FROM cum c CROSS JOIN tot t
  CROSS JOIN LATERAL UNNEST(generate_series(1, {zones - 1})) AS g(i)
  WHERE (g.i * t.n + {zones} - 1) // {zones} > c.cum - c.cnt
    AND (g.i * t.n + {zones} - 1) // {zones} <= c.cum
),
cuts AS (SELECT list(cents ORDER BY cents) AS cuts FROM cutrows),
zoned AS (
  SELECT ev.cents,
         CAST(1 + len(list_filter(cuts, c -> ev.cents > c)) AS BIGINT)
           AS zone
  FROM ev CROSS JOIN cuts
),
zm AS (
  SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(cents) AS min_cents, MAX(cents) AS max_cents
  FROM zoned GROUP BY 1
)
SELECT zone, n_rows, min_cents, max_cents,
       max_cents < {probe_cents} AS pruned
FROM zm
"""
