"""Shard-assignment planning operators over ``documents``.

How a 100 TB corpus is SPLIT across workers/stores is itself an operator
family: rendezvous (highest-random-weight) hashing gives coordination-free,
minimal-movement shard assignment, and the move-audit quantifies why —
growing mod-N sharding from N to N+1 reshuffles ~N/(N+1) of all keys while
rendezvous moves exactly the ~1/(N+1) that the new shard wins.  These are
the placement decisions every distributed store makes (Thaler & Ravishankar
HRW; consistent hashing literature); here they are corpus-auditable
queries.

Reference parity note: the reference app (pymedgraph) is single-node and
has no placement layer; this extends the engine's web-scale operations
family (SURVEY §2 training-pipeline lane) on the repo-wide 60-bit md5
determinism idiom, so both engines derive bit-identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARDS = 8          # baseline shard count
SHARDS_GROWN = 9    # the +1 resize the move-audit measures


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _h60(col: F.Column) -> F.Column:
    """The repo-wide 60-bit md5 hash (bit-identical in DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _hrw_shard(key: F.Column, n: int) -> F.Column:
    """Rendezvous winner for ``key`` among shards 1..n: argmax_s
    h60(key # s), ties to the LOWEST shard id (md5 ties are 2^-60
    events; the tiebreak exists so the contract is total)."""
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    _h60(F.concat(key, F.lit("#"), F.lit(s))).alias("h"),
                    F.lit(-s).alias("negs"),
                )
                for s in range(1, n + 1)
            ]
        )
    )
    return (-best["negs"]).cast("bigint")


def rendezvous_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, total_bytes, load_ppm, skew_ppm): the rendezvous
    (HRW) shard assignment of the corpus over {SHARDS} shards with the
    realized load per shard — doc count, text bytes, corpus share in
    ppm, and the deviation from the ideal 1/{SHARDS} share.  The
    placement audit run before committing a shard map: HRW balance
    error shrinks as 1/sqrt(keys-per-shard), and the skew column is
    the check.

    Determinism: the winner is an exact integer argmax over {SHARDS}
    md5 values per key, ties to the lowest shard; all loads are exact
    integers and ppm shares integer floor divisions.

    Plan: assignment folds into the scan projection (a {SHARDS}-way
    expression argmax, zero shuffle — the ivf_topk convention), then
    ONE {SHARDS}-row partial-agg groupBy; the corpus totals ride a
    window over that {SHARDS}-row aggregate."""
    key = F.col("doc_id").cast("string")
    loads = (
        _docs(spark, sf_dir)
        .select(
            _hrw_shard(key, SHARDS).alias("shard"),
            F.length(F.col("text")).cast("bigint").alias("nbytes"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nbytes").alias("total_bytes"),
        )
    )
    return loads.select(
        "shard",
        "n_docs",
        "total_bytes",
        F.expr(
            "div(1000000 * n_docs, sum(n_docs)"
            " over (partition by pmod(xxhash64(shard), 1)))"
        ).alias("load_ppm"),
        (
            F.expr("div(1000000 * n_docs, sum(n_docs)"
            " over (partition by pmod(xxhash64(shard), 1)))")
            - F.lit(1_000_000 // SHARDS)
        ).alias("skew_ppm"),
    ).orderBy("shard")


def sql_rendezvous_plan() -> str:
    h = (
        "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' || s),"
        " 1, 15) AS BIGINT)"
    )
    return f"""
WITH scored AS (
  SELECT d.doc_id, length(d.text) AS nbytes, g.s, {h} AS h,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY {h} DESC, g.s ASC) AS rn
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(1, {SHARDS})) AS s) g
),
loads AS (
  SELECT CAST(s AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nbytes) AS BIGINT) AS total_bytes
  FROM scored WHERE rn = 1 GROUP BY s
)
SELECT shard, n_docs, total_bytes,
       CAST((1000000 * n_docs) // SUM(n_docs) OVER () AS BIGINT)
         AS load_ppm,
       CAST((1000000 * n_docs) // SUM(n_docs) OVER () AS BIGINT)
         - {1_000_000 // SHARDS} AS skew_ppm
FROM loads ORDER BY shard
"""


def shard_move_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(strategy, n_keys, n_moved, moved_ppm): how many corpus keys
    change shard when the fleet grows {SHARDS} -> {SHARDS_GROWN}, under
    (a) 'mod' — shard = h(key) % N, the naive scheme, which remaps
    ~N/(N+1) of ALL keys (every key whose residue changes triggers a
    copy), and (b) 'hrw' — rendezvous, which moves exactly the keys the
    new shard wins, ~1/(N+1).  This pair of numbers is the whole
    argument for consistent placement at petabyte scale: the audit
    makes it a measured property of THIS corpus, not folklore.

    Determinism: both strategies are pure functions of the 60-bit md5
    integers; counts are exact.

    Plan: both assignments for both fleet sizes fold into one scan
    projection (expression-only); the result is a single 1-row
    aggregate exploded into the 2-row strategy table — no shuffle
    beyond the global agg."""
    key = F.col("doc_id").cast("string")
    h0 = _h60(key)
    per = _docs(spark, sf_dir).select(
        (h0 % SHARDS != h0 % SHARDS_GROWN).alias("mod_moved"),
        (
            _hrw_shard(key, SHARDS) != _hrw_shard(key, SHARDS_GROWN)
        ).alias("hrw_moved"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("mod_moved"), 1).otherwise(0)).alias("mod_m"),
        F.sum(F.when(F.col("hrw_moved"), 1).otherwise(0)).alias("hrw_m"),
    )
    pairs = F.array(
        F.struct(
            F.lit("mod").alias("strategy"), F.col("mod_m").alias("n_moved")
        ),
        F.struct(
            F.lit("hrw").alias("strategy"), F.col("hrw_m").alias("n_moved")
        ),
    )
    return agg.select(
        F.explode(pairs).alias("x"), "n_keys"
    ).select(
        F.col("x.strategy").alias("strategy"),
        "n_keys",
        F.col("x.n_moved").cast("bigint").alias("n_moved"),
        F.expr("div(1000000 * x.n_moved, n_keys)").alias("moved_ppm"),
    )


def sql_shard_move_audit() -> str:
    h0 = (
        "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)"
        " AS BIGINT)"
    )
    hs = (
        "CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '#' ||"
        " g.s), 1, 15) AS BIGINT)"
    )

    def hrw_cte(name: str, n: int) -> str:
        return f"""{name} AS (
  SELECT doc_id, s AS sh FROM (
    SELECT d.doc_id, g.s,
           row_number() OVER (PARTITION BY d.doc_id
                              ORDER BY {hs} DESC, g.s ASC) AS rn
    FROM documents d
    CROSS JOIN (SELECT unnest(generate_series(1, {n})) AS s) g)
  WHERE rn = 1
)"""

    return f"""
WITH {hrw_cte("hrw8", SHARDS)},
{hrw_cte("hrw9", SHARDS_GROWN)},
per AS (
  SELECT ({h0} % {SHARDS} <> {h0} % {SHARDS_GROWN}) AS mod_moved,
         (a.sh <> b.sh) AS hrw_moved
  FROM documents d
  JOIN hrw8 a USING (doc_id) JOIN hrw9 b USING (doc_id)
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT)
           AS mod_m,
         CAST(SUM(CASE WHEN hrw_moved THEN 1 ELSE 0 END) AS BIGINT)
           AS hrw_m
  FROM per
)
SELECT 'mod' AS strategy, n_keys, mod_m AS n_moved,
       CAST((1000000 * mod_m) // n_keys AS BIGINT) AS moved_ppm
FROM agg
UNION ALL
SELECT 'hrw' AS strategy, n_keys, hrw_m AS n_moved,
       CAST((1000000 * hrw_m) // n_keys AS BIGINT) AS moved_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# Consistent-hash ring placement (virtual nodes) — the third placement
# strategy next to rendezvous and mod-N.
# ---------------------------------------------------------------------------

RING_VNODES = 16  # virtual nodes per shard


def _ring(n: int = SHARDS, vnodes: int = RING_VNODES) -> list[tuple[int, int]]:
    """Sorted (hash, shard) ring positions — pure constants (60-bit md5 of
    'ring|shard|vnode'), identical in both engines by construction."""
    import hashlib

    pts = []
    for s in range(1, n + 1):
        for v in range(vnodes):
            h = int(
                hashlib.md5(f"ring|{s}|{v}".encode()).hexdigest()[:15], 16
            )
            pts.append((h, s))
    return sorted(pts)


def _ring_arcs(n: int = SHARDS, vnodes: int = RING_VNODES) -> dict[int, int]:
    """Exact ring arc owned per shard (sum of gaps to the previous point,
    wrapping) in 2^60 space — the EXPECTED load share of each shard."""
    ring = _ring(n, vnodes)
    space = 1 << 60
    arcs: dict[int, int] = {s: 0 for s in range(1, n + 1)}
    prev = ring[-1][0] - space  # wrap: first arc reaches back past 0
    for h, s in ring:
        arcs[s] += h - prev
        prev = h
    assert sum(arcs.values()) == space
    return arcs


def ring_plan(
    spark: SparkSession,
    sf_dir: str,
    n: int = SHARDS,
    vnodes: int = RING_VNODES,
) -> DataFrame:
    """(shard, n_vnodes, arc_ppm, n_docs, load_ppm, skew_vs_arc_ppm): the
    consistent-hash-ring assignment of the corpus over ``n`` shards with
    ``vnodes`` virtual nodes each — each key goes to the first ring point
    clockwise from its hash — audited against the EXACT expected share
    (the shard's owned ring arc): realized load_ppm minus arc_ppm is the
    sampling error, which vnodes exist to shrink.  Rendezvous
    (rendezvous_plan) needs no ring state but hashes keys n times;
    the ring hashes once and binary-searches constants — this pair is
    the placement trade every distributed store picks between.

    Determinism: ring points are md5 constants; assignment is an exact
    integer comparison against a literal sorted array (zero shuffle —
    folds into the scan projection); arcs are exact 2^60-space integers
    computed driver-side.

    Plan: one scan projection + one n-row groupBy; the corpus total
    rides a window over the n-row aggregate."""
    ring = _ring(n, vnodes)
    arcs = _ring_arcs(n, vnodes)
    arr = F.array(
        *[
            F.struct(
                F.lit(h).cast("bigint").alias("h"),
                F.lit(s).cast("bigint").alias("s"),
            )
            for h, s in ring
        ]
    )
    kh = _h60(F.col("doc_id").cast("string"))
    # try_element_at: the filtered array is EMPTY for keys hashing past
    # the last ring point (the wrap case) — element_at would throw
    nxt = F.try_element_at(F.filter(arr, lambda e: e["h"] >= kh), F.lit(1))
    shard = F.coalesce(nxt["s"], F.lit(ring[0][1]).cast("bigint"))
    loads = (
        _docs(spark, sf_dir)
        .select(shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    arc_rows = spark.createDataFrame(
        [
            (s, vnodes, (arcs[s] * 1_000_000) >> 60)
            for s in range(1, n + 1)
        ],
        "shard bigint, n_vnodes bigint, arc_ppm bigint",
    )
    return (
        arc_rows.join(loads, "shard", "left")
        .select(
            "shard",
            "n_vnodes",
            "arc_ppm",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
        )
        .withColumn(
            "load_ppm",
            F.expr("div(1000000 * n_docs, sum(n_docs)"
            " over (partition by pmod(xxhash64(shard), 1)))").cast(
                "bigint"
            ),
        )
        .withColumn(
            "skew_vs_arc_ppm", F.col("load_ppm") - F.col("arc_ppm")
        )
    )


def sql_ring_plan(n: int = SHARDS, vnodes: int = RING_VNODES) -> str:
    ring = _ring(n, vnodes)
    arcs = _ring_arcs(n, vnodes)
    ring_lit = ", ".join(f"{{'h': {h}, 's': {s}}}" for h, s in ring)
    arc_rows = ", ".join(
        f"({s}, {vnodes}, {(arcs[s] * 1_000_000) >> 60})"
        for s in range(1, n + 1)
    )
    kh = (
        "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)"
        " AS BIGINT)"
    )
    return f"""
WITH assigned AS (
  SELECT COALESCE(
           list_filter([{ring_lit}], e -> e.h >= {kh})[1].s,
           {ring[0][1]}) AS shard
  FROM documents
),
loads AS (
  SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM assigned GROUP BY shard
),
arcs(shard, n_vnodes, arc_ppm) AS (VALUES {arc_rows})
SELECT CAST(a.shard AS BIGINT) AS shard,
       CAST(a.n_vnodes AS BIGINT) AS n_vnodes,
       CAST(a.arc_ppm AS BIGINT) AS arc_ppm,
       CAST(COALESCE(l.n_docs, 0) AS BIGINT) AS n_docs,
       CAST((1000000 * COALESCE(l.n_docs, 0))
            // SUM(COALESCE(l.n_docs, 0)) OVER () AS BIGINT) AS load_ppm,
       CAST((1000000 * COALESCE(l.n_docs, 0))
            // SUM(COALESCE(l.n_docs, 0)) OVER () AS BIGINT)
         - CAST(a.arc_ppm AS BIGINT) AS skew_vs_arc_ppm
FROM arcs a LEFT JOIN loads l ON l.shard = a.shard
"""
