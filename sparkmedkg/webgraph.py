"""Web-graph construction + graph/sketch analytics for the crawl corpus.

The reference pipeline stops at per-document extraction (its only graph
analytic is the Neo4j `/intersection` endpoint,
/root/reference/pymedgraph/graph/neo4jconnector.py:267-316).  A
Common-Crawl-scale KG build also needs the *web graph itself*: anchor
extraction from raw html into host-level edges, hub/authority scoring over
those directed edges, and cardinality sketches for crawl accounting.  This
module adds that family, each operator DuckDB-oracle-gated:

- ``link_graph``        html anchors -> (src_host, dst_host, n_links) edges
- ``q_hits``            fixed-iteration HITS hubs/authorities on that graph
- ``kmv_distinct``      k-minimum-values distinct-count sketch vs exact
- ``q_adamic_adar``     common-neighbor link prediction on the KG
- ``containment_pairs`` asymmetric shingle containment (quote/subset dups)

The documents table has no html column, so ``link_graph`` synthesizes a
deterministic page body (every token becomes an anchor whose target host is
an md5-derived function of the token — same formula in the DuckDB oracle,
same md5-60-bit bridge as dedup.py's minhash) and then runs the REAL
extraction path: ``regexp_extract_all`` over the html string, entirely
JVM-side.  At 10^12 real pages the synthesis select is replaced by the
Iceberg scan of the html column; everything downstream is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkmedkg import graphalgo, relations
from sparkmedkg.relations import PR_MIN_DOCS, sql_cooccur_edges_cte

N_DST_HOSTS = 31        # synthetic anchor target-host universe
MAX_ANCHORS = 64        # per-page anchor cap (real crawls cap outlinks too)
N_SRC_HOSTS = 97        # crawl host universe (matches fixtures url scheme)
HITS_ITERS = 2
KMV_K = 64              # sketch size: k smallest 60-bit hashes
AA_TAU = 0.35           # Adamic-Adar emit threshold
CONT_TAU = 0.8          # containment emit threshold
CONT_MAX_DF = 64        # drop shingles appearing in more docs than this


def _h60(col):
    """First 60 bits of md5 as a non-negative bigint — the same
    Spark<->DuckDB hash bridge as dedup._mh_params (dedup.py:295-317)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _sql_h60(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Host-level link graph from html anchors.
# ---------------------------------------------------------------------------

def _page_html():
    """Deterministic html body: first MAX_ANCHORS tokens each become an
    <a href="https://h{md5(token)%N}.example/p">token</a> anchor."""
    toks = F.slice(F.split(F.col("text"), " +"), 1, MAX_ANCHORS)
    anchor = lambda t: F.concat(  # noqa: E731
        F.lit('<a href="https://h'),
        (_h60(t) % N_DST_HOSTS).cast("string"),
        F.lit('.example/p">'),
        t,
        F.lit("</a>"),
    )
    return F.concat(
        F.lit("<html><body>"),
        F.concat_ws("", F.transform(toks, anchor)),
        F.lit("</body></html>"),
    )


def _sql_page_html() -> str:
    toks = f"list_slice(regexp_split_to_array(text, ' +'), 1, {MAX_ANCHORS})"
    anchor = (
        "'<a href=\"https://h' || "
        f"({_sql_h60('t')} % {N_DST_HOSTS}) || "
        "'.example/p\">' || t || '</a>'"
    )
    return (
        "'<html><body>' || "
        f"array_to_string([{anchor} for t in {toks}], '') || "
        "'</body></html>'"
    )


_LG_CACHE: dict[tuple, DataFrame] = {}


def link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_host, dst_host, n_links): host-level web-graph edges extracted
    from page html.  The extraction is the production path — one
    ``regexp_extract_all`` over the html column (whole-stage codegen, rides
    the scan), explode, then a single map-side-combinable groupBy.  No UDF,
    no driver loop; at 10^12 pages the only shuffle is the (src,dst)
    aggregation, and the per-page anchor cap bounds explode fan-out.

    The aggregated edge list is host-pair-sized (graph-shaped, far below
    the page corpus), so it is materialized ONCE per session via
    ``_LG_CACHE`` — the relations._EDGE_CACHE pattern: eight link-graph
    consumers (HITS, SALSA, PageRank, TrustRank, co-citation, spam mass,
    link prediction, bow-tie) pay the html scan once instead of each."""
    from sparkmedkg.session import widen_scan

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _LG_CACHE.get(key)
    if hit is not None:
        return hit
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    html = _page_html().alias("html")
    src = F.concat(
        F.lit("site"), (F.col("doc_id") % N_SRC_HOSTS).cast("string"),
        F.lit(".example"),
    ).alias("src_host")
    hosts = F.regexp_extract_all(
        F.col("html"), F.lit('href="https://([^"/]+)'), 1
    )
    out = (
        docs.select(src, html)
        .select("src_host", F.explode(hosts).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .localCheckpoint(eager=True)
    )
    if len(_LG_CACHE) >= 8:
        _LG_CACHE.clear()
    _LG_CACHE[key] = out
    return out


def sql_link_graph() -> str:
    return f"""
WITH pages AS (
  SELECT 'site' || (doc_id % {N_SRC_HOSTS}) || '.example' AS src_host,
         {_sql_page_html()} AS html
  FROM documents
),
anchors AS (
  SELECT src_host, unnest(regexp_extract_all(html, 'href="https://([^"/]+)', 1))
           AS dst_host
  FROM pages
)
SELECT src_host, dst_host, COUNT(*) AS n_links
FROM anchors GROUP BY src_host, dst_host
"""


# ---------------------------------------------------------------------------
# HITS hubs/authorities (fixed synchronous iterations, L1-normalized).
# ---------------------------------------------------------------------------

def q_hits(
    spark: SparkSession, sf_dir: str, iters: int = HITS_ITERS
) -> DataFrame:
    """(host, hub, authority) after ``iters`` HITS rounds on the distinct
    directed host-graph edges.  Each round is two edge joins + two grouped
    sums (map-side combinable) and two scalar normalizations (1-row
    broadcast); edges persist once across rounds, same shape as
    relations.q_pagerank.  L1 normalization keeps the oracle's unrolled
    CTEs exact under round(6)."""
    edges = (
        link_graph(spark, sf_dir)
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select("dst"))
        .distinct()
        .persist()
    )
    nodes.count()
    scores = nodes.select(
        "host", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    )
    for i in range(iters):
        # h'(u) = sum_{u->v} a(v), then L1-normalize
        h = (
            edges.join(scores.select(F.col("host").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
        )
        hub = nodes.join(
            h.select(F.col("src").alias("host"), "s"), "host", "left"
        ).select("host", F.coalesce("s", F.lit(0.0)).alias("hub"))
        hub = hub.crossJoin(
            F.broadcast(hub.agg(F.sum("hub").alias("tot")))
        ).select("host", (F.col("hub") / F.col("tot")).alias("hub"))
        # a'(v) = sum_{u->v} h'(u), then L1-normalize
        a = (
            edges.join(hub.select(F.col("host").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        auth = nodes.join(
            a.select(F.col("dst").alias("host"), "s"), "host", "left"
        ).select("host", F.coalesce("s", F.lit(0.0)).alias("auth"))
        auth = auth.crossJoin(
            F.broadcast(auth.agg(F.sum("auth").alias("tot")))
        ).select("host", (F.col("auth") / F.col("tot")).alias("auth"))
        # truncate EVERY round (not just deep ones): each score vector is
        # consumed by its own normalizer subplan, the other side's
        # contribution join, and the next round — unchecked, the final
        # action re-derives the chain multiplicatively (measured 10.6s ->
        # ~3s at sf0.1 even with the link graph cached)
        scores = hub.join(auth, "host").localCheckpoint(eager=True)
    out = scores.select(
        "host", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("authority")
    ).localCheckpoint(eager=True)
    edges.unpersist()
    nodes.unpersist()
    return out


def sql_hits(iters: int = HITS_ITERS) -> str:
    steps = []
    prev = "s0"
    for k in range(1, iters + 1):
        steps.append(
            f"""h{k}_raw AS (
  SELECT n.host, COALESCE(x.s, 0) AS hub
  FROM nodes n LEFT JOIN (
    SELECT e.src AS host, SUM(p.auth) AS s
    FROM edges e JOIN {prev} p ON e.dst = p.host GROUP BY e.src
  ) x ON n.host = x.host
),
h{k} AS (SELECT host, hub / (SELECT SUM(hub) FROM h{k}_raw) AS hub
         FROM h{k}_raw),
a{k}_raw AS (
  SELECT n.host, COALESCE(x.s, 0) AS auth
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS host, SUM(p.hub) AS s
    FROM edges e JOIN h{k} p ON e.src = p.host GROUP BY e.dst
  ) x ON n.host = x.host
),
a{k} AS (SELECT host, auth / (SELECT SUM(auth) FROM a{k}_raw) AS auth
         FROM a{k}_raw),
s{k} AS (SELECT h.host, h.hub, a.auth
         FROM h{k} h JOIN a{k} a ON h.host = a.host)"""
        )
        prev = f"s{k}"
    unrolled = ",\n".join(steps)
    return f"""
WITH lg AS ({sql_link_graph()}),
edges AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM lg),
nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
s0 AS (SELECT host, 1.0 AS hub, 1.0 AS auth FROM nodes),
{unrolled}
SELECT host, round(hub, 6) AS hub, round(auth, 6) AS authority FROM s{iters}
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch.
# ---------------------------------------------------------------------------

def kmv_distinct(
    spark: SparkSession, sf_dir: str, k: int = KMV_K
) -> DataFrame:
    """(source, n_exact, kmv_est): per-source distinct-text cardinality,
    exact vs the KMV estimate (k-1) * 2^60 / h_k where h_k is the k-th
    smallest 60-bit text hash.  The rank<=k filter compiles to Spark's
    WindowGroupLimit: each map task keeps only its local k smallest before
    the shuffle, so the exchange carries O(parts * k) rows per group — the
    sketch property that makes KMV mergeable on 1000 executors.  Groups
    with fewer than k distinct values report the exact count."""
    from sparkmedkg.session import widen_scan

    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    hashes = docs.select("source", _h60(F.col("text")).alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("n_sk"))
    )
    exact = hashes.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(
        F.col("n_sk") < k, F.col("n_exact").cast("double")
    ).otherwise((k - 1) * F.lit(float(2**60)) / F.col("hk"))
    return (
        exact.join(sk, "source")
        .select("source", "n_exact", F.round(est, 2).alias("kmv_est"))
    )


def sql_kmv_distinct(k: int = KMV_K) -> str:
    return f"""
WITH hashes AS (
  SELECT DISTINCT source, {_sql_h60('text')} AS h FROM documents
),
ranked AS (
  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hashes
),
sk AS (
  SELECT source, MAX(h) AS hk, COUNT(*) AS n_sk
  FROM ranked WHERE rn <= {k} GROUP BY source
),
exact AS (SELECT source, COUNT(*) AS n_exact FROM hashes GROUP BY source)
SELECT e.source, e.n_exact,
       round(CASE WHEN s.n_sk < {k} THEN e.n_exact::DOUBLE
                  ELSE {k - 1} * {float(2**60)!r} / s.hk END, 2) AS kmv_est
FROM exact e JOIN sk s ON e.source = s.source
"""


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction on the co-occurrence KG.
# ---------------------------------------------------------------------------

def q_adamic_adar(
    spark: SparkSession,
    sf_dir: str,
    tau: float = AA_TAU,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(a, b, aa_score) for non-adjacent-or-adjacent node pairs with
    Adamic-Adar score sum(1/ln(deg(u))) over shared neighbors u >= tau.
    Same bounded wedge enumeration as graphalgo.q_neighbor_jaccard — one
    equi-join on the shared-neighbor key with the weight joined in before
    the grouped sum; never a node-pair cross join.  Degree-1 neighbors
    carry no information (1/ln(1) diverges) and are excluded, matching the
    standard formulation."""
    edges = graphalgo._edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    wt = deg.where(F.col("deg") > 1).select(
        F.col("src").alias("u"), (1.0 / F.log(F.col("deg"))).alias("w")
    )
    x = edges.select(F.col("dst").alias("u"), F.col("src").alias("a"))
    y = edges.select(F.col("dst").alias("u"), F.col("src").alias("b"))
    return (
        x.join(y, "u")
        .where(F.col("a") < F.col("b"))
        .join(wt, "u")
        .groupBy("a", "b")
        .agg(F.sum("w").alias("s"))
        .where(F.col("s") >= tau)
        .select("a", "b", F.round("s", 6).alias("aa_score"))
    )


def sql_adamic_adar(
    tau: float = AA_TAU, min_docs: int = PR_MIN_DOCS
) -> str:
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
wt AS (SELECT src AS u, 1.0 / ln(deg) AS w FROM deg WHERE deg > 1)
SELECT x.src AS a, y.src AS b, round(SUM(wt.w), 6) AS aa_score
FROM edges x
JOIN edges y ON x.dst = y.dst AND x.src < y.src
JOIN wt ON wt.u = x.dst
GROUP BY x.src, y.src
HAVING SUM(wt.w) >= {tau}
"""


# ---------------------------------------------------------------------------
# Asymmetric containment near-dup (quote / subset detection).
# ---------------------------------------------------------------------------

def containment_pairs(
    spark: SparkSession,
    sf_dir: str,
    tau: float = CONT_TAU,
    max_df: int = CONT_MAX_DF,
) -> DataFrame:
    """(src_id, dst_id, containment): ordered pairs where
    |S_src ∩ S_dst| / |S_src| >= tau over the informative shingle space —
    shingles appearing in more than ``max_df`` documents (boilerplate /
    stop-phrases) are removed from BOTH numerator and denominator, so the
    result is exact on the filtered space and the blocking self-join is
    bounded by max_df^2 candidates per shingle instead of exploding on hot
    keys.  Catches quotes and page-subset duplication that symmetric
    Jaccard (dedup.jaccard_pairs) misses when the containing doc is much
    larger.  The dropped-shingle count is observable via the shingle-DF
    table; the cap is part of the operator contract, not a silent
    truncation (the oracle applies the identical cap)."""
    from sparkmedkg import dedup

    # the shingling expression (split + sliding-window transform +
    # array_distinct) is the most expensive map stage here — persist its
    # exploded output once so the DF count, the anti-join, the sizes agg
    # and both join sides all read the cached 2-column table instead of
    # re-shingling the corpus three times
    sh = dedup.doc_shingles(spark, sf_dir).persist()
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("shingle")
    )
    kept = sh.join(F.broadcast(hot), "shingle", "left_anti").persist()
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = kept.select(F.col("doc_id").alias("a"), "shingle")
    b = kept.select(F.col("doc_id").alias("b"), "shingle")
    # enumerate each unordered candidate ONCE (a < b halves the blocking
    # join and the pair aggregation), then emit the two directed rows by
    # expression — n_common is shared, only the denominator differs
    common = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    both = (
        common.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")),
            "b",
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("src_id"),
                        F.col("b").alias("dst_id"),
                        (
                            F.col("n_common").cast("double")
                            / F.col("na").cast("double")
                        ).alias("c"),
                    ),
                    F.struct(
                        F.col("b").alias("src_id"),
                        F.col("a").alias("dst_id"),
                        (
                            F.col("n_common").cast("double")
                            / F.col("nb").cast("double")
                        ).alias("c"),
                    ),
                )
            ).alias("p")
        )
    )
    out = (
        both.where(F.col("p.c") >= tau)
        .select(
            "p.src_id",
            "p.dst_id",
            F.round("p.c", 6).alias("containment"),
        )
        .localCheckpoint(eager=True)
    )
    kept.unpersist()
    sh.unpersist()
    return out


def sql_containment_pairs(
    tau: float = CONT_TAU, max_df: int = CONT_MAX_DF
) -> str:
    from sparkmedkg.dedup import _sql_shingles

    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_sql_shingles()}) AS shingle FROM documents
),
hot AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {max_df}
),
kept AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS src_id, b.doc_id AS dst_id, COUNT(*) AS n_common
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.src_id, c.dst_id,
       round(c.n_common::DOUBLE / s.n_sh::DOUBLE, 6) AS containment
FROM common c JOIN sizes s ON s.doc_id = c.src_id
WHERE c.n_common::DOUBLE / s.n_sh::DOUBLE >= {tau}
"""


# ---------------------------------------------------------------------------
# Anchor-text aggregation: top referring terms per target host.
# ---------------------------------------------------------------------------

ANCHOR_TOPK = 5


def anchor_terms(
    spark: SparkSession, sf_dir: str, topk: int = ANCHOR_TOPK
) -> DataFrame:
    """(dst_host, term, n, rank): the ``topk`` most frequent anchor texts
    pointing at each host — the classic web-graph signal for naming /
    describing a target entity (what the web *calls* a page is often
    better evidence than the page itself).

    Parses the full anchor tags out of the html (list-transform +
    per-element regexp group extraction, all JVM expressions), explodes to
    (dst_host, term), then one map-side-combinable count and a per-host
    top-k window that rides the count shuffle's (dst_host) prefix.  Hot
    hosts fan into the count's partial aggregation, not the window."""
    from sparkmedkg.session import widen_scan

    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    tags = F.regexp_extract_all(
        F.col("html"), F.lit("(<a [^>]*>[^<]*</a>)"), 1
    )
    pairs = F.transform(
        tags,
        lambda a: F.struct(
            F.regexp_extract(a, 'href="https://([^"/]+)', 1).alias("dst_host"),
            F.regexp_extract(a, ">([^<]*)</a>", 1).alias("term"),
        ),
    )
    counts = (
        docs.select(_page_html().alias("html"))
        .select(F.explode(pairs).alias("p"))
        .select("p.dst_host", "p.term")
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n").desc(), F.col("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )


def sql_anchor_terms(topk: int = ANCHOR_TOPK) -> str:
    return f"""
WITH pages AS (SELECT {_sql_page_html()} AS html FROM documents),
tags AS (
  SELECT unnest(regexp_extract_all(html, '(<a [^>]*>[^<]*</a>)', 1)) AS tag
  FROM pages
),
pairs AS (
  SELECT regexp_extract(tag, 'href="https://([^"/]+)', 1) AS dst_host,
         regexp_extract(tag, '>([^<]*)</a>', 1) AS term
  FROM tags
),
counts AS (
  SELECT dst_host, term, COUNT(*) AS n FROM pairs GROUP BY dst_host, term
)
SELECT dst_host, term, n, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY dst_host
                               ORDER BY n DESC, term) AS rank
  FROM counts
) WHERE rank <= {topk}
"""


# ---------------------------------------------------------------------------
# HyperLogLog-style register sketch (deterministic, engine-portable).
# ---------------------------------------------------------------------------

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
# alpha_m for m=64, written as the same literal formula in both engines so
# the doubles match bit-for-bit
_HLL_ALPHA_EXPR = f"0.7213 / (1.0 + 1.079 / {HLL_M})"


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_exact, hll_est): per-source distinct-text cardinality,
    exact vs a from-scratch HyperLogLog estimate (m=64 registers over the
    60-bit md5 hash, standard small-range correction).

    Unlike the KMV top-k sketch (``kmv_distinct``), the register maxima
    are a PLAIN groupBy((source, register)).max — fully partial-agg
    mergeable with at most |groups| * 64 rows ever crossing the exchange,
    the exact shape a 1000-executor cardinality rollup wants.  Register
    rank uses integer bit-length via base-2 string conversion (Spark
    ``conv``, DuckDB ``to_base``) rather than float log2, so the sketch is
    bit-identical across engines."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashes = docs.select("source", _h60(F.col("text")).alias("h")).distinct()
    # shiftright keeps the arithmetic in 64-bit integers; double division
    # rounds above 2^53 and would disagree with the oracle's exact h // 64.
    rem = F.shiftright(F.col("h"), HLL_P)
    bitlen = F.length(F.conv(rem.cast("string"), 10, 2))
    rho = F.when(rem == 0, F.lit(61 - HLL_P)).otherwise(
        F.lit(60 - HLL_P) - bitlen + 1
    )
    regs = (
        hashes.select(
            "source", (F.col("h") % HLL_M).alias("reg"), rho.alias("rho")
        )
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("mx"))
    )
    per_src = regs.groupBy("source").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    v = F.lit(HLL_M) - F.col("n_regs")  # empty registers
    s = F.col("s_present") + v.cast("double")
    raw = F.expr(_HLL_ALPHA_EXPR) * F.lit(float(HLL_M * HLL_M)) / s
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    exact = hashes.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    return exact.join(per_src, "source").select(
        "source", "n_exact", F.round(est, 2).alias("hll_est")
    )


def sql_hll_distinct() -> str:
    return f"""
WITH hashes AS (
  SELECT DISTINCT source, {_sql_h60('text')} AS h FROM documents
),
rr AS (
  SELECT source, h % {HLL_M} AS reg,
         CASE WHEN h // {HLL_M} = 0 THEN {61 - HLL_P}
              ELSE {60 - HLL_P} - length(to_base(h // {HLL_M}, 2)) + 1
         END AS rho
  FROM hashes
),
regs AS (SELECT source, reg, MAX(rho) AS mx FROM rr GROUP BY source, reg),
per_src AS (
  SELECT source, SUM(power(2.0, -mx)) AS s_present, COUNT(*) AS n_regs
  FROM regs GROUP BY source
),
est AS (
  SELECT source,
         CASE WHEN ({_HLL_ALPHA_EXPR}) * {float(HLL_M * HLL_M)!r}
                   / (s_present + ({HLL_M} - n_regs)) <= 2.5 * {HLL_M}
                AND ({HLL_M} - n_regs) > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                     / ({HLL_M} - n_regs))
              ELSE ({_HLL_ALPHA_EXPR}) * {float(HLL_M * HLL_M)!r}
                   / (s_present + ({HLL_M} - n_regs))
         END AS est
  FROM per_src
),
exact AS (SELECT source, COUNT(*) AS n_exact FROM hashes GROUP BY source)
SELECT e.source, e.n_exact, round(s.est, 2) AS hll_est
FROM exact e JOIN est s ON e.source = s.source
"""


# ---------------------------------------------------------------------------
# Mirror-site detection: host-pair cosine over IDF-weighted anchor terms.
# ---------------------------------------------------------------------------

MIRROR_TAU = 0.9       # cosine threshold for mirror candidates
MIRROR_MAX_TERM_HOSTS = 32   # drop terms seen on more hosts than this


def mirror_hosts(
    spark: SparkSession,
    sf_dir: str,
    tau: float = MIRROR_TAU,
    max_term_hosts: int = MIRROR_MAX_TERM_HOSTS,
) -> DataFrame:
    """(host_a, host_b, cosine): source-host pairs whose outgoing
    anchor-term profiles are near-identical under IDF-weighted cosine —
    the host-level mirror/scraper-farm detector that runs BEFORE
    per-document dedup at crawl scale (dropping a mirrored host removes
    millions of docs in one decision).

    Profile: per (src_host, term) link counts weighted by
    ln(1 + N/df_term); terms appearing on more than ``max_term_hosts``
    hosts are dropped from BOTH the numerator join and the norms (exact
    on the informative-term space, and the pair join is bounded by
    max_term_hosts^2 candidates per term — the same capped-blocking
    contract as containment_pairs).  One equi-join on the term key;
    norms are a per-host aggregate joined back; never a host-pair cross
    join."""
    pages = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(
            F.lit("site"), (F.col("doc_id") % N_SRC_HOSTS).cast("string"),
            F.lit(".example"),
        ).alias("host"),
        F.explode(
            F.slice(F.split(F.col("text"), " +"), 1, MAX_ANCHORS)
        ).alias("term"),
    )
    tf = pages.groupBy("host", "term").agg(F.count(F.lit(1)).alias("c"))
    n_hosts = tf.select("host").distinct().count()
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        tf.join(
            F.broadcast(df_t.where(F.col("df") <= max_term_hosts)), "term"
        )
        .select(
            "host",
            "term",
            (
                F.col("c").cast("double")
                * F.log(F.lit(1.0) + F.lit(float(n_hosts)) / F.col("df"))
            ).alias("w"),
        )
        .persist()
    )
    norms = kept.groupBy("host").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = kept.select(F.col("host").alias("host_a"), "term", F.col("w").alias("wa"))
    b = kept.select(F.col("host").alias("host_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    out = (
        dots.join(norms.select(F.col("host").alias("host_a"), F.col("nrm").alias("na")), "host_a")
        .join(norms.select(F.col("host").alias("host_b"), F.col("nrm").alias("nb")), "host_b")
        # Filter on the RAW cosine (matching the SQL twin), THEN round for
        # output — rounding first would admit raw values in [tau-5e-7, tau).
        .where(F.col("dot") / (F.col("na") * F.col("nb")) >= tau)
        .select(
            "host_a",
            "host_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .localCheckpoint(eager=True)
    )
    kept.unpersist()
    return out


def sql_mirror_hosts(
    tau: float = MIRROR_TAU, max_term_hosts: int = MIRROR_MAX_TERM_HOSTS
) -> str:
    return f"""
WITH pages AS (
  SELECT 'site' || (doc_id % {N_SRC_HOSTS}) || '.example' AS host,
         unnest(list_slice(regexp_split_to_array(text, ' +'), 1,
                           {MAX_ANCHORS})) AS term
  FROM documents
),
tf AS (SELECT host, term, COUNT(*) AS c FROM pages GROUP BY host, term),
nh AS (SELECT COUNT(DISTINCT host)::DOUBLE AS n FROM tf),
df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
kept AS (
  SELECT tf.host, tf.term,
         tf.c::DOUBLE * ln(1.0 + (SELECT n FROM nh) / d.df) AS w
  FROM tf JOIN df_t d ON tf.term = d.term
  WHERE d.df <= {max_term_hosts}
),
norms AS (SELECT host, sqrt(SUM(w * w)) AS nrm FROM kept GROUP BY host),
dots AS (
  SELECT a.host AS host_a, b.host AS host_b, SUM(a.w * b.w) AS dot
  FROM kept a JOIN kept b ON a.term = b.term AND a.host < b.host
  GROUP BY a.host, b.host
)
SELECT d.host_a, d.host_b, round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN norms na ON na.host = d.host_a
JOIN norms nb ON nb.host = d.host_b
WHERE d.dot / (na.nrm * nb.nrm) >= {tau}
"""


def hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_sources, sum_exact, n_exact_global, hll_union_est): corpus-wide
    distinct-text cardinality obtained by MERGING the per-source HLL
    register tables (per-register max) — the property that makes HLL the
    scale sketch: shard/day/source sketches union in O(m) per group with
    NO rescan of the raw data, while exact per-source counts can only be
    summed (wrong under overlap — ``sum_exact`` vs ``n_exact_global``
    shows the gap this query exists to avoid).

    Plan: the merge is one groupBy(reg).max over |sources| * m register
    rows, then a 1-row estimate — at 10^6 shards that's the entire
    rollup cost.  Same bit-identical register arithmetic as
    ``hll_distinct``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashes = docs.select("source", _h60(F.col("text")).alias("h")).distinct()
    rem = F.shiftright(F.col("h"), HLL_P)
    bitlen = F.length(F.conv(rem.cast("string"), 10, 2))
    rho = F.when(rem == 0, F.lit(61 - HLL_P)).otherwise(
        F.lit(60 - HLL_P) - bitlen + 1
    )
    per_source_regs = (
        hashes.select(
            "source", (F.col("h") % HLL_M).alias("reg"), rho.alias("rho")
        )
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("mx"))
    )
    merged = per_source_regs.groupBy("reg").agg(F.max("mx").alias("mx"))
    agg = merged.agg(
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
    stats = hashes.agg(
        F.countDistinct("source").alias("n_sources"),
        F.count(F.lit(1)).alias("sum_exact"),
        F.countDistinct("h").alias("n_exact_global"),
    )
    return stats.crossJoin(
        F.broadcast(agg.select(F.round(est, 2).alias("hll_union_est")))
    )


def sql_hll_union() -> str:
    alpha_mm = f"({_HLL_ALPHA_EXPR}) * {float(HLL_M * HLL_M)!r}"
    return f"""
WITH hashes AS (
  SELECT DISTINCT source, {_sql_h60('text')} AS h FROM documents
),
rr AS (
  SELECT source, h % {HLL_M} AS reg,
         CASE WHEN h // {HLL_M} = 0 THEN {61 - HLL_P}
              ELSE {60 - HLL_P} - length(to_base(h // {HLL_M}, 2)) + 1
         END AS rho
  FROM hashes
),
per_src AS (SELECT source, reg, MAX(rho) AS mx FROM rr GROUP BY 1, 2),
merged AS (SELECT reg, MAX(mx) AS mx FROM per_src GROUP BY 1),
agg AS (
  SELECT SUM(power(2.0, -mx)) AS s_present, COUNT(*) AS n_regs FROM merged
),
est AS (
  SELECT CASE WHEN {alpha_mm} / (s_present + ({HLL_M} - n_regs))
                   <= 2.5 * {HLL_M}
                AND ({HLL_M} - n_regs) > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                     / ({HLL_M} - n_regs))
              ELSE {alpha_mm} / (s_present + ({HLL_M} - n_regs))
         END AS est
  FROM agg
),
stats AS (
  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(COUNT(*) AS BIGINT) AS sum_exact,
         CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact_global
  FROM hashes
)
SELECT n_sources, sum_exact, n_exact_global,
       round(est, 2) AS hll_union_est
FROM stats CROSS JOIN est
"""


# ---------------------------------------------------------------------------
# KMV set-intersection estimate between crawl sources.
# ---------------------------------------------------------------------------

KMVI_K = 64
KMVI_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_KMVI_C = float((KMVI_K - 1) * (1 << 60))  # (k-1) * 2^60, shared constant


def kmv_intersect(
    spark: SparkSession, sf_dir: str, k: int = KMVI_K
) -> DataFrame:
    """(src_a, src_b, n_exact, kmv_est): for each ordered source pair, the
    exact count of shared distinct text shingles next to its KMV-sketch
    estimate — the set-INTERSECTION counterpart of kmv_distinct, using the
    standard estimator: keep the k smallest hashes of the UNION, count how
    many of those belong to both sides (ints), and scale
    est = ints/k * union_est.  Pairs whose union carries fewer than k
    hashes report the exact intersection (sketch degenerates to the set).

    Scale: per-pair state is the k-row union sketch, so comparing S
    sources costs O(S^2 * k) rows after the window — never a re-scan of
    the corpus per pair; the same WindowGroupLimit map-side pruning as
    kmv_distinct keeps the exchange at O(parts * k) per pair.  Exact
    counts are computed here only as the estimator's scorecard."""
    import itertools

    from sparkmedkg import dedup
    from sparkmedkg.session import widen_scan

    docs = (
        widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        .where(F.col("source").isin(list(KMVI_SOURCES)))
        .select("source", "text")
    )
    hashes = (
        docs.select(
            "source", F.explode(dedup._shingles_col()).alias("s")
        )
        .select("source", _h60(F.col("s")).alias("h"))
        .distinct()
        .persist()
    )
    pair_rows = [
        (a, b) for a, b in itertools.combinations(KMVI_SOURCES, 2)
    ]
    pairs = spark.createDataFrame(pair_rows, "src_a string, src_b string")
    side_a = pairs.join(
        hashes, pairs["src_a"] == hashes["source"]
    ).select("src_a", "src_b", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    side_b = pairs.join(
        hashes, pairs["src_b"] == hashes["source"]
    ).select("src_a", "src_b", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    ph = (
        side_a.unionByName(side_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("ia").alias("in_a"), F.max("ib").alias("in_b"))
    )
    exact = ph.groupBy("src_a", "src_b").agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_exact")
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    sk = (
        ph.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("src_a", "src_b")
        .agg(
            F.max("h").alias("hk"),
            F.count(F.lit(1)).alias("n_sk"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("ints"),
        )
    )
    est = F.when(F.col("n_sk") < k, F.col("n_exact").cast("double")).otherwise(
        (F.col("ints") / F.lit(float(k)))
        * (F.lit(_KMVI_C) / F.col("hk"))
    )
    out = exact.join(sk, ["src_a", "src_b"]).select(
        "src_a", "src_b", "n_exact", F.round(est, 2).alias("kmv_est")
    )
    hashes.unpersist()
    return out


def sql_kmv_intersect(k: int = KMVI_K) -> str:
    import itertools

    from sparkmedkg.dedup import _sql_shingles

    vals = ", ".join(
        f"('{a}', '{b}')" for a, b in itertools.combinations(KMVI_SOURCES, 2)
    )
    srcs = ", ".join(f"'{s}'" for s in KMVI_SOURCES)
    return f"""
WITH hashes AS MATERIALIZED (
  SELECT DISTINCT source, {_sql_h60('s')} AS h
  FROM (
    SELECT source, unnest({_sql_shingles('text')}) AS s
    FROM documents WHERE source IN ({srcs})
  )
),
pairs AS (SELECT * FROM (VALUES {vals}) AS t(src_a, src_b)),
ph AS MATERIALIZED (
  SELECT src_a, src_b, h, MAX(ia) AS in_a, MAX(ib) AS in_b
  FROM (
    SELECT p.src_a, p.src_b, x.h, 1 AS ia, 0 AS ib
    FROM pairs p JOIN hashes x ON x.source = p.src_a
    UNION ALL
    SELECT p.src_a, p.src_b, x.h, 0, 1
    FROM pairs p JOIN hashes x ON x.source = p.src_b
  )
  GROUP BY src_a, src_b, h
),
exact AS (
  SELECT src_a, src_b, CAST(SUM(in_a * in_b) AS BIGINT) AS n_exact
  FROM ph GROUP BY src_a, src_b
),
ranked AS (
  SELECT src_a, src_b, h, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
  FROM ph
),
sk AS (
  SELECT src_a, src_b, MAX(h) AS hk, COUNT(*) AS n_sk,
         SUM(in_a * in_b) AS ints
  FROM ranked WHERE rn <= {k} GROUP BY src_a, src_b
)
SELECT e.src_a, e.src_b, e.n_exact,
       round(CASE WHEN s.n_sk < {k} THEN CAST(e.n_exact AS DOUBLE)
                  ELSE (s.ints / CAST({k} AS DOUBLE))
                       * ({_KMVI_C!r} / s.hk) END, 2) AS kmv_est
FROM exact e JOIN sk s USING (src_a, src_b)
"""


# ---------------------------------------------------------------------------
# Resource-allocation + preferential-attachment link prediction.
# ---------------------------------------------------------------------------

LP_MIN_COMMON = 2       # emit pairs sharing at least this many neighbors


def q_link_pred_scores(
    spark: SparkSession,
    sf_dir: str,
    min_common: int = LP_MIN_COMMON,
    min_docs: int = PR_MIN_DOCS,
) -> DataFrame:
    """(a, b, n_common, ra_score, pa_score): the other two classical
    common-neighbor link-prediction measures next to q_adamic_adar —
    resource allocation sum(1/deg(u)) over shared neighbors u, and
    preferential attachment deg(a)*deg(b) — for node pairs sharing at
    least ``min_common`` neighbors.  Same bounded wedge enumeration as
    Adamic-Adar (equi-join on the shared-neighbor key, never a node-pair
    cross join); the endpoint degrees join in AFTER the grouped wedge agg,
    so the two deg joins touch only the surviving pair set, with the
    node-sized degree table broadcast."""
    edges = graphalgo._edges(spark, sf_dir, min_docs)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    wt = deg.select(
        F.col("src").alias("u"), (1.0 / F.col("deg")).alias("w")
    )
    x = edges.select(F.col("dst").alias("u"), F.col("src").alias("a"))
    y = edges.select(F.col("dst").alias("u"), F.col("src").alias("b"))
    pairs = (
        x.join(y, "u")
        .where(F.col("a") < F.col("b"))
        .join(wt, "u")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("w").alias("ra"),
        )
        .where(F.col("n_common") >= min_common)
    )
    deg_a = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    deg_b = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(F.broadcast(deg_a), "a")
        .join(F.broadcast(deg_b), "b")
        .select(
            "a",
            "b",
            "n_common",
            F.round("ra", 6).alias("ra_score"),
            (F.col("deg_a") * F.col("deg_b")).alias("pa_score"),
        )
    )


def sql_link_pred_scores(
    min_common: int = LP_MIN_COMMON, min_docs: int = PR_MIN_DOCS
) -> str:
    # e is MATERIALIZED: edges embeds the whole NER chain and is referenced
    # four times here (x, y, and the two degree joins) — without it DuckDB
    # re-expands the chain per reference (the kg_truss_edges lesson).
    return f"""
WITH {sql_cooccur_edges_cte(min_docs)},
e AS MATERIALIZED (SELECT * FROM edges),
deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
),
pairs AS (
  SELECT x.src AS a, y.src AS b,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         SUM(1.0 / w.deg) AS ra
  FROM e x
  JOIN e y ON x.dst = y.dst AND x.src < y.src
  JOIN deg w ON w.src = x.dst
  GROUP BY x.src, y.src
  HAVING COUNT(*) >= {min_common}
)
SELECT p.a, p.b, p.n_common,
       round(p.ra, 6) AS ra_score,
       da.deg * db.deg AS pa_score
FROM pairs p
JOIN deg da ON da.src = p.a
JOIN deg db ON db.src = p.b
"""


# ---------------------------------------------------------------------------
# Redirect-chain resolution via pointer jumping (path doubling).
# ---------------------------------------------------------------------------

REDIRECT_ROOT_MOD = 5   # host-ids divisible by 5 are canonical roots
REDIRECT_DOUBLINGS = 3  # resolves chains up to 2^3 = 8 hops


def _redirect_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, parent, hops): the synthetic per-host redirect function —
    host-id h redirects to h-1 unless h % REDIRECT_ROOT_MOD == 0 OR h-1 is
    not a crawled host (either way h is a canonical root: parent = self,
    hops = 0 — the function is TOTAL over the observed host set, so no
    chain can dangle off the table).  Derived from the same
    doc_id % N_SRC_HOSTS universe as link_graph, so it is a pure function
    of the documents table (no external data)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hid = (F.col("doc_id") % N_SRC_HOSTS).alias("hid")
    hosts = docs.select(hid).distinct()
    host_str = lambda c: F.concat(  # noqa: E731
        F.lit("site"), c.cast("string"), F.lit(".example")
    )
    prev = hosts.select((F.col("hid") + 1).alias("hid")).withColumn(
        "has_prev", F.lit(True)
    )
    is_root = (
        ((F.col("hid") % REDIRECT_ROOT_MOD) == 0)
        | F.col("has_prev").isNull()
    )
    return hosts.join(prev, "hid", "left").select(
        host_str(F.col("hid")).alias("host"),
        host_str(
            F.when(is_root, F.col("hid")).otherwise(F.col("hid") - 1)
        ).alias("parent"),
        F.when(is_root, 0).otherwise(1).cast("bigint").alias("hops"),
    )


def redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, canonical_host, n_hops): every crawl host resolved to its
    canonical root through the redirect chain, by POINTER JUMPING — each
    round rewrites parent(v) <- parent(parent(v)) and adds the two hop
    counts, so chains of length L resolve in ceil(log2 L) self-joins
    instead of L sequential ones.

    Scale: this is THE pattern for chain-chasing at 10^9 hosts (alias
    chains, URL redirects, union-find grafting): O(log L) shuffles on the
    parent key, each a self-equi-join of the (host, parent) table; no
    driver iteration over rows, and already-resolved roots (parent = self)
    are fixed points that cost nothing extra.  hops is an exact BIGINT
    sum."""
    cur = _redirect_hosts(spark, sf_dir).localCheckpoint(eager=True)
    for _ in range(REDIRECT_DOUBLINGS):
        nxt = cur.alias("a").join(
            cur.select(
                F.col("host").alias("p_host"),
                F.col("parent").alias("p_parent"),
                F.col("hops").alias("p_hops"),
            ),
            F.col("a.parent") == F.col("p_host"),
        ).select(
            F.col("a.host").alias("host"),
            F.col("p_parent").alias("parent"),
            (F.col("a.hops") + F.col("p_hops")).alias("hops"),
        )
        cur = nxt.localCheckpoint(eager=True)
    return cur.select(
        "host",
        F.col("parent").alias("canonical_host"),
        F.col("hops").alias("n_hops"),
    )


def sql_redirect_resolve() -> str:
    steps = []
    for k in range(1, REDIRECT_DOUBLINGS + 1):
        steps.append(
            f"""r{k} AS MATERIALIZED (
  SELECT a.host, b.parent, a.hops + b.hops AS hops
  FROM r{k - 1} a JOIN r{k - 1} b ON a.parent = b.host
)"""
        )
    return f"""
WITH hids AS (
  SELECT DISTINCT doc_id % {N_SRC_HOSTS} AS hid FROM documents
),
r0 AS MATERIALIZED (
  SELECT 'site' || h.hid || '.example' AS host,
         'site' || (CASE WHEN h.hid % {REDIRECT_ROOT_MOD} = 0
                           OR p.hid IS NULL
                         THEN h.hid ELSE h.hid - 1 END)
                || '.example' AS parent,
         CAST(CASE WHEN h.hid % {REDIRECT_ROOT_MOD} = 0
                     OR p.hid IS NULL
                   THEN 0 ELSE 1 END AS BIGINT) AS hops
  FROM hids h LEFT JOIN hids p ON p.hid = h.hid - 1
),
{",".join(steps)}
SELECT host, parent AS canonical_host, hops AS n_hops
FROM r{REDIRECT_DOUBLINGS}
"""


# ---------------------------------------------------------------------------
# Web-anchor -> KG-entity bridge (anchor text named-entity evidence).
# ---------------------------------------------------------------------------

def anchor_entity_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dst_host, CUI, n_anchors): for each link-target host, which KG
    concepts the web's anchor text names, with evidence counts — the
    web-to-KG bridging signal (anchor text is the classic external
    description of a page; matching it against the entity lexicon yields
    'this host is about hash joins' edges for the construction pipeline).

    Scale: anchors are extracted in the scan projection (same JVM
    regexp lane as link_graph), the alias index is a broadcast dim
    (ner.py's broadcast-lexicon guard bounds it), and the only shuffle is
    the final (dst_host, CUI) count — map-side combinable."""
    from sparkmedkg import webkg
    from sparkmedkg.session import widen_scan

    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    tags = F.regexp_extract_all(
        F.col("html"), F.lit("(<a [^>]*>[^<]*</a>)"), 1
    )
    pairs = F.transform(
        tags,
        lambda a: F.struct(
            F.regexp_extract(a, 'href="https://([^"/]+)', 1).alias(
                "dst_host"
            ),
            F.regexp_extract(a, ">([^<]*)</a>", 1).alias("term"),
        ),
    )
    anchors = (
        docs.select(_page_html().alias("html"))
        .select(F.explode(pairs).alias("p"))
        .select("p.dst_host", F.lower(F.col("p.term")).alias("term"))
    )
    aliases = webkg.aliases_df(spark).select(
        F.col("alias").alias("term"), "CUI"
    )
    return (
        anchors.join(F.broadcast(aliases), "term")
        .groupBy("dst_host", "CUI")
        .agg(F.count(F.lit(1)).alias("n_anchors"))
    )


def sql_anchor_entity_links() -> str:
    from sparkmedkg import webkg

    return f"""
WITH {webkg.sql_aliases_cte()},
pages AS (SELECT {_sql_page_html()} AS html FROM documents),
tags AS (
  SELECT unnest(regexp_extract_all(html, '(<a [^>]*>[^<]*</a>)', 1)) AS tag
  FROM pages
),
anchors AS (
  SELECT regexp_extract(tag, 'href="https://([^"/]+)', 1) AS dst_host,
         lower(regexp_extract(tag, '>([^<]*)</a>', 1)) AS term
  FROM tags
)
SELECT an.dst_host, al.cui AS CUI, CAST(COUNT(*) AS BIGINT) AS n_anchors
FROM anchors an JOIN (SELECT DISTINCT alias, cui FROM aliases) al
  ON al.alias = an.term
GROUP BY an.dst_host, al.cui
"""


# ---------------------------------------------------------------------------
# TrustRank over the intra-site-namespace link graph (web-spam triage).
# ---------------------------------------------------------------------------

TRUST_ALPHA = 0.85
TRUST_ITERS = 2
TRUST_SEEDS = ("site0.example", "site1.example", "site2.example")


def _intra_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (src, dst) host edges where anchor targets live in the SAME
    site* namespace as sources (md5(token) % N_SRC_HOSTS), so the graph has
    cycles and real propagation depth — the deterministic synthesis twin of
    link_graph's cross-namespace anchors."""
    from sparkmedkg.session import widen_scan

    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    src = F.concat(
        F.lit("site"), (F.col("doc_id") % N_SRC_HOSTS).cast("string"),
        F.lit(".example"),
    )
    toks = F.slice(F.split(F.col("text"), " +"), 1, MAX_ANCHORS)
    dsts = F.transform(
        toks,
        lambda t: F.concat(
            F.lit("site"), (_h60(t) % N_SRC_HOSTS).cast("string"),
            F.lit(".example"),
        ),
    )
    return (
        docs.select(src.alias("src"), F.explode(dsts).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_trustrank(
    spark: SparkSession,
    sf_dir: str,
    iters: int = TRUST_ITERS,
    alpha: float = TRUST_ALPHA,
) -> DataFrame:
    """(host, trust): TrustRank (Gyongyi et al. 2004) — PageRank with
    restart mass pinned to a hand-vetted seed whitelist, so trust decays
    with link distance from the seeds and spam farms (unreachable from
    good hosts) score ~0.  The curation signal a crawl pipeline uses to
    downweight link-spam neighborhoods before corpus admission.

    Plan: identical iteration shape to relations.q_ppr — edges + out-degree
    persisted once, per round one rank join + grouped sum; the seed
    indicator is a literal isin() expression (the whitelist is by
    definition tiny).  t <- (1-alpha)*e_S + alpha * W^T t."""
    edges = _intra_edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    ed = edges.join(deg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select("dst"))
        .distinct()
        .persist()
    )
    nodes.count()
    e_s = F.when(
        F.col("host").isin(*TRUST_SEEDS), 1.0 / len(TRUST_SEEDS)
    ).otherwise(0.0)
    trust = nodes.select("host", e_s.alias("t"))
    for _ in range(iters):
        contrib = (
            ed.join(trust.select(F.col("host").alias("src"), "t"), "src")
            .select("dst", (F.col("t") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        trust = nodes.join(
            contrib.select(F.col("dst").alias("host"), "s"), "host", "left"
        ).select(
            "host",
            (
                F.lit(1.0 - alpha) * e_s
                + F.lit(alpha) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("t"),
        )
    out = trust.select("host", F.round("t", 6).alias("trust")).localCheckpoint(
        eager=True
    )
    for df in (edges, ed, nodes):
        df.unpersist()
    return out


def sql_trustrank(
    iters: int = TRUST_ITERS, alpha: float = TRUST_ALPHA
) -> str:
    seeds = ", ".join(f"'{s}'" for s in TRUST_SEEDS)

    def e_s(q: str) -> str:
        return (
            f"CASE WHEN {q}host IN ({seeds}) "
            f"THEN 1.0/{len(TRUST_SEEDS)} ELSE 0.0 END"
        )

    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""t{k} AS (
  SELECT n.host,
         (1 - {alpha}) * {e_s('n.')}
         + {alpha} * COALESCE(c.s, 0) AS t
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS host, SUM(p.t / dg.deg) AS s
    FROM edges e JOIN t{k - 1} p ON e.src = p.host
                 JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON n.host = c.host
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH pages AS (
  SELECT 'site' || (doc_id % {N_SRC_HOSTS}) || '.example' AS src,
         unnest(list_slice(regexp_split_to_array(text, ' +'), 1,
                           {MAX_ANCHORS})) AS tok
  FROM documents
),
edges AS (
  SELECT DISTINCT src,
         'site' || ({_sql_h60('tok')} % {N_SRC_HOSTS}) || '.example' AS dst
  FROM pages
  WHERE src <> 'site' || ({_sql_h60('tok')} % {N_SRC_HOSTS}) || '.example'
),
nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src),
t0 AS (SELECT host, {e_s('')} AS t FROM nodes),
{unrolled}
SELECT host, round(t, 6) AS trust FROM t{iters}
"""


# ---------------------------------------------------------------------------
# Host-graph PageRank with dangling-mass redistribution.
# ---------------------------------------------------------------------------

WPR_ITERS = 2
WPR_DAMPING = 0.85


def q_web_pagerank(
    spark: SparkSession,
    sf_dir: str,
    iters: int = WPR_ITERS,
    damping: float = WPR_DAMPING,
) -> DataFrame:
    """(host, pagerank): PageRank on the DIRECTED host link graph —
    unlike the co-occurrence variant (relations.q_pagerank, symmetric so
    no dangling nodes), the real web graph has sinks (the h*.example
    anchor targets have no out-links), so each iteration must collect the
    dangling mass and redistribute it uniformly or rank leaks to zero.
    That redistribution — one extra 1-row aggregate broadcast per
    iteration — is THE production PageRank mechanic this pair of
    operators exists to contrast.

    Plan: per iteration one rank/edge join + grouped sum (as q_pagerank)
    plus the dangling 1-row agg; mass is conserved each round (test
    asserts sum == 1)."""
    edges = (
        link_graph(spark, sf_dir)
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    ed = edges.join(deg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select("dst"))
        .distinct()
        .persist()
    )
    n = nodes.count()
    ranks = nodes.select("host", F.lit(1.0 / n).alias("pr"))
    has_out = edges.select("src").distinct()
    for _ in range(iters):
        dangling = (
            ranks.join(
                has_out.select(F.col("src").alias("host")), "host", "left_anti"
            )
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            ed.join(ranks.select(F.col("host").alias("src"), "pr"), "src")
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(
                contrib.select(F.col("dst").alias("host"), "s"), "host", "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
    out = ranks.select(
        "host", F.round("pr", 9).alias("pagerank")
    ).localCheckpoint(eager=True)
    for df in (edges, ed, nodes):
        df.unpersist()
    return out


def sql_web_pagerank(
    iters: int = WPR_ITERS, damping: float = WPR_DAMPING
) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""dm{k - 1} AS (
  SELECT COALESCE(SUM(p.pr), 0) AS dm
  FROM r{k - 1} p ANTI JOIN deg d ON p.host = d.src
),
r{k} AS (
  SELECT n.host,
         (1 - {damping}) / (SELECT n FROM nn)
         + {damping} * (COALESCE(c.s, 0)
                        + (SELECT dm FROM dm{k - 1}) / (SELECT n FROM nn))
           AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS host, SUM(p.pr / dg.deg) AS s
    FROM edges e JOIN r{k - 1} p ON e.src = p.host
                 JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON n.host = c.host
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH pages AS (
  SELECT 'site' || (doc_id % {N_SRC_HOSTS}) || '.example' AS src_host,
         {_sql_page_html()} AS html
  FROM documents
),
edges AS (
  SELECT DISTINCT src_host AS src,
         unnest(regexp_extract_all(html, 'href="https://([^"/]+)', 1)) AS dst
  FROM pages
),
nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src),
r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
{unrolled}
SELECT host, round(pr, 9) AS pagerank FROM r{iters}
"""


# ---------------------------------------------------------------------------
# Co-citation / bibliographic coupling on the host graph (Small 1973,
# Kessler 1963 — the classic "related hosts" signals HITS builds on).
# ---------------------------------------------------------------------------

COCITE_MAX_DEG = 128  # hub cap: an endpoint of degree d creates d^2 pairs


def q_cocitation(
    spark: SparkSession, sf_dir: str, max_deg: int = COCITE_MAX_DEG
) -> DataFrame:
    """(a, b, n_cocited, n_coupled): for every unordered host pair, how
    many common in-linkers cite both (co-citation) and how many common
    out-targets both link to (bibliographic coupling) — the two
    structural relatedness signals used for "related sites", mirror
    candidate seeding, and link-spam farm detection.

    Scale: both counts are a self-equi-join of the distinct edge set on
    the shared endpoint.  The quadratic hazard is hubs — one src with
    out-degree d contributes d^2 co-citation pairs — so both joins are
    capped at degree <= max_deg on the SHARED endpoint (the standard
    wedge cap, same as the degree-oriented triangle count): super-hub
    endpoints carry negligible relatedness information (they cite
    everything) and are excluded from pair generation, keeping fan-out
    per row <= max_deg.  Full-outer merge of the two sparse pair sets."""
    edges = (
        link_graph(spark, sf_dir)
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .distinct()
        .persist()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    e_oc = edges.join(
        outdeg.where(F.col("d") <= max_deg).select("src"), "src"
    )
    e_bc = edges.join(
        indeg.where(F.col("d") <= max_deg).select("dst"), "dst"
    )
    l, r = e_oc.alias("l"), e_oc.alias("r")
    cocite = (
        l.join(r, F.col("l.src") == F.col("r.src"))
        .where(F.col("l.dst") < F.col("r.dst"))
        .groupBy(
            F.col("l.dst").alias("a"), F.col("r.dst").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_cocited"))
    )
    lb, rb = e_bc.alias("l"), e_bc.alias("r")
    couple = (
        lb.join(rb, F.col("l.dst") == F.col("r.dst"))
        .where(F.col("l.src") < F.col("r.src"))
        .groupBy(
            F.col("l.src").alias("a"), F.col("r.src").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_coupled"))
    )
    out = (
        cocite.join(couple, ["a", "b"], "full_outer")
        .select(
            "a",
            "b",
            F.coalesce("n_cocited", F.lit(0)).alias("n_cocited"),
            F.coalesce("n_coupled", F.lit(0)).alias("n_coupled"),
        )
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    return out


def sql_cocitation(max_deg: int = COCITE_MAX_DEG) -> str:
    return f"""
WITH pages AS (
  SELECT 'site' || (doc_id % {N_SRC_HOSTS}) || '.example' AS src_host,
         {_sql_page_html()} AS html
  FROM documents
),
edges AS (
  SELECT DISTINCT src_host AS src,
         unnest(regexp_extract_all(html, 'href="https://([^"/]+)', 1)) AS dst
  FROM pages
),
e_oc AS (
  SELECT * FROM edges
  WHERE src IN (SELECT src FROM edges GROUP BY src
                HAVING COUNT(*) <= {max_deg})
),
e_bc AS (
  SELECT * FROM edges
  WHERE dst IN (SELECT dst FROM edges GROUP BY dst
                HAVING COUNT(*) <= {max_deg})
),
cocite AS (
  SELECT l.dst AS a, r.dst AS b, COUNT(*) AS n_cocited
  FROM e_oc l JOIN e_oc r ON l.src = r.src AND l.dst < r.dst
  GROUP BY l.dst, r.dst
),
couple AS (
  SELECT l.src AS a, r.src AS b, COUNT(*) AS n_coupled
  FROM e_bc l JOIN e_bc r ON l.dst = r.dst AND l.src < r.src
  GROUP BY l.src, r.src
)
SELECT COALESCE(c.a, p.a) AS a, COALESCE(c.b, p.b) AS b,
       COALESCE(c.n_cocited, 0) AS n_cocited,
       COALESCE(p.n_coupled, 0) AS n_coupled
FROM cocite c FULL OUTER JOIN couple p ON c.a = p.a AND c.b = p.b
"""


# ---------------------------------------------------------------------------
# Spam mass (Gyongyi, Berkhin, Garcia-Molina, Pedersen 2006, "Link spam
# detection based on mass estimation"): how much of a host's PageRank is
# NOT explainable by trusted-seed reachability.
# ---------------------------------------------------------------------------

SPAM_MASS_TAU6 = 500_000  # spammy iff round(spam_mass, 6) >= 0.5


def q_spam_mass(
    spark: SparkSession,
    sf_dir: str,
    iters: int = TRUST_ITERS,
    alpha: float = TRUST_ALPHA,
    tau6: int = SPAM_MASS_TAU6,
) -> DataFrame:
    """(host, pr, trust, spam_mass, spammy): relative spam mass — run
    PageRank (uniform restart) and TrustRank (seed restart) with the SAME
    damping and iteration count over the SAME graph, then
    spam_mass = (pr - trust) / pr.  Hosts whose rank comes mostly from
    outside the trusted core (spam farms boosting each other) score near
    1; hosts reachable from the seeds score near 0.  The admission signal
    crawl pipelines threshold before corpus ingestion.

    Plan: the two rank vectors ride ONE iteration loop — a single
    (host, t, p) frame, so each round is one edge join + one grouped sum
    computing both contributions (half the shuffles of running the two
    algorithms separately).  Same propagation convention as q_trustrank
    (no dangling redistribution — identical for both vectors, and spam
    mass is their DIFFERENCE).  The spammy flag thresholds the ROUNDED
    mass in both engines, so the boolean can't straddle an FP boundary."""
    edges = _intra_edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    ed = edges.join(deg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select("dst"))
        .distinct()
        .persist()
    )
    n = nodes.count()
    e_t = F.when(
        F.col("host").isin(*TRUST_SEEDS), 1.0 / len(TRUST_SEEDS)
    ).otherwise(0.0)
    e_p = F.lit(1.0 / n)
    ranks = nodes.select("host", e_t.alias("t"), e_p.alias("p"))
    for _ in range(iters):
        contrib = (
            ed.join(
                ranks.select(F.col("host").alias("src"), "t", "p"), "src"
            )
            .select(
                "dst",
                (F.col("t") / F.col("deg")).alias("ct"),
                (F.col("p") / F.col("deg")).alias("cp"),
            )
            .groupBy("dst")
            .agg(F.sum("ct").alias("st"), F.sum("cp").alias("sp"))
        )
        ranks = nodes.join(
            contrib.select(F.col("dst").alias("host"), "st", "sp"),
            "host",
            "left",
        ).select(
            "host",
            (
                F.lit(1.0 - alpha) * e_t
                + F.lit(alpha) * F.coalesce(F.col("st"), F.lit(0.0))
            ).alias("t"),
            (
                F.lit(1.0 - alpha) * e_p
                + F.lit(alpha) * F.coalesce(F.col("sp"), F.lit(0.0))
            ).alias("p"),
        )
    mass6 = F.round((F.col("p") - F.col("t")) / F.col("p"), 6)
    out = ranks.select(
        "host",
        F.round("p", 9).alias("pr"),
        F.round("t", 9).alias("trust"),
        mass6.alias("spam_mass"),
        (mass6 * 1_000_000 >= F.lit(float(tau6))).alias("spammy"),
    ).localCheckpoint(eager=True)
    for df in (edges, ed, nodes):
        df.unpersist()
    return out


def sql_spam_mass(
    iters: int = TRUST_ITERS,
    alpha: float = TRUST_ALPHA,
    tau6: int = SPAM_MASS_TAU6,
) -> str:
    seeds = ", ".join(f"'{s}'" for s in TRUST_SEEDS)

    def e_t(q: str) -> str:
        return (
            f"CASE WHEN {q}host IN ({seeds}) "
            f"THEN 1.0/{len(TRUST_SEEDS)} ELSE 0.0 END"
        )

    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""r{k} AS (
  SELECT n.host,
         (1 - {alpha}) * {e_t('n.')} + {alpha} * COALESCE(c.st, 0) AS t,
         (1 - {alpha}) / (SELECT n FROM nn)
           + {alpha} * COALESCE(c.sp, 0) AS p
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS host, SUM(p.t / dg.deg) AS st, SUM(p.p / dg.deg) AS sp
    FROM edges e JOIN r{k - 1} p ON e.src = p.host
                 JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) c ON n.host = c.host
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH pages AS (
  SELECT 'site' || (doc_id % {N_SRC_HOSTS}) || '.example' AS src,
         unnest(list_slice(regexp_split_to_array(text, ' +'), 1,
                           {MAX_ANCHORS})) AS tok
  FROM documents
),
edges AS (
  SELECT DISTINCT src,
         'site' || ({_sql_h60('tok')} % {N_SRC_HOSTS}) || '.example' AS dst
  FROM pages
  WHERE src <> 'site' || ({_sql_h60('tok')} % {N_SRC_HOSTS}) || '.example'
),
nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src),
r0 AS (SELECT host, {e_t('')} AS t, 1.0 / (SELECT n FROM nn) AS p
       FROM nodes),
{unrolled}
SELECT host, round(p, 9) AS pr, round(t, 9) AS trust,
       round((p - t) / p, 6) AS spam_mass,
       (round((p - t) / p, 6) * 1000000 >= {int(tau6)}) AS spammy
FROM r{iters}
"""


# ---------------------------------------------------------------------------
# SALSA (Lempel & Moran 2000) — degree-normalized HITS.
# ---------------------------------------------------------------------------

SALSA_ITERS = 2


def q_salsa(
    spark: SparkSession, sf_dir: str, iters: int = SALSA_ITERS
) -> DataFrame:
    """(host, hub, authority) after ``iters`` SALSA rounds on the distinct
    directed host-graph edges.  SALSA is HITS with the bipartite random
    walk normalized by degree — a'(v) = sum_{u->v} h(u)/outdeg(u),
    h'(u) = sum_{u->v} a(v)/indeg(v) — which converges to the in/out
    degree distribution per component and is far more resistant to the
    tightly-knit-community (TKC) overscoring that plagues raw HITS; it is
    the link-spam-aware ranker of the pair.  L1 normalization per round
    keeps the unrolled oracle CTEs exact under round(6).

    Plan shape is q_hits with the two degree tables joined INTO the
    persisted edge set once (so per-round cost is unchanged: one join +
    one grouped sum per side); degrees never recompute inside the loop."""
    raw = (
        link_graph(spark, sf_dir)
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .distinct()
    )
    outdeg = raw.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("odeg")
    )
    indeg = raw.groupBy("dst").agg(
        F.count(F.lit(1)).cast("double").alias("ideg")
    )
    edges = raw.join(outdeg, "src").join(indeg, "dst").persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select("dst"))
        .distinct()
        .persist()
    )
    nodes.count()
    scores = nodes.select(
        "host", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    )
    for _ in range(iters):
        h = (
            edges.join(scores.select(F.col("host").alias("dst"), "auth"), "dst")
            .select("src", (F.col("auth") / F.col("ideg")).alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("s"))
        )
        hub = nodes.join(
            h.select(F.col("src").alias("host"), "s"), "host", "left"
        ).select("host", F.coalesce("s", F.lit(0.0)).alias("hub"))
        hub = hub.crossJoin(
            F.broadcast(hub.agg(F.sum("hub").alias("tot")))
        ).select(
            "host", (F.col("hub") / F.col("tot")).alias("hub")
        ).localCheckpoint(eager=True)
        a = (
            edges.join(hub.select(F.col("host").alias("src"), "hub"), "src")
            .select("dst", (F.col("hub") / F.col("odeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        auth = nodes.join(
            a.select(F.col("dst").alias("host"), "s"), "host", "left"
        ).select("host", F.coalesce("s", F.lit(0.0)).alias("auth"))
        auth = auth.crossJoin(
            F.broadcast(auth.agg(F.sum("auth").alias("tot")))
        ).select("host", (F.col("auth") / F.col("tot")).alias("auth"))
        # each score vector is consumed 3x (its own normalizer subplan, the
        # next side's contribution join, the final output) — truncate per
        # round or the lineage re-derives the chain multiplicatively
        scores = hub.join(auth, "host").localCheckpoint(eager=True)
    out = scores.select(
        "host",
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("authority"),
    ).localCheckpoint(eager=True)
    edges.unpersist()
    nodes.unpersist()
    return out


def sql_salsa(iters: int = SALSA_ITERS) -> str:
    steps = []
    prev = "s0"
    for k in range(1, iters + 1):
        steps.append(
            f"""h{k}_raw AS (
  SELECT n.host, COALESCE(x.s, 0) AS hub
  FROM nodes n LEFT JOIN (
    SELECT e.src AS host, SUM(p.auth / e.ideg) AS s
    FROM edges e JOIN {prev} p ON e.dst = p.host GROUP BY e.src
  ) x ON n.host = x.host
),
h{k} AS (SELECT host, hub / (SELECT SUM(hub) FROM h{k}_raw) AS hub
         FROM h{k}_raw),
a{k}_raw AS (
  SELECT n.host, COALESCE(x.s, 0) AS auth
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS host, SUM(p.hub / e.odeg) AS s
    FROM edges e JOIN h{k} p ON e.src = p.host GROUP BY e.dst
  ) x ON n.host = x.host
),
a{k} AS (SELECT host, auth / (SELECT SUM(auth) FROM a{k}_raw) AS auth
         FROM a{k}_raw),
s{k} AS (SELECT h.host, h.hub, a.auth
         FROM h{k} h JOIN a{k} a ON h.host = a.host)"""
        )
        prev = f"s{k}"
    unrolled = ",\n".join(steps)
    return f"""
WITH lg AS ({sql_link_graph()}),
raw AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM lg),
od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM raw GROUP BY src),
id_ AS (SELECT dst, CAST(COUNT(*) AS DOUBLE) AS ideg FROM raw GROUP BY dst),
edges AS (SELECT r.src, r.dst, od.odeg, id_.ideg
          FROM raw r JOIN od ON od.src = r.src JOIN id_ ON id_.dst = r.dst),
nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
s0 AS (SELECT host, 1.0 AS hub, 1.0 AS auth FROM nodes),
{unrolled}
SELECT host, round(hub, 6) AS hub, round(auth, 6) AS authority FROM s{iters}
"""


def reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_edges, n_mutual_edges, n_mutual_dyads, n_asym_dyads,
    reciprocity): the dyad census of the directed host graph — how
    often does a link A->B come with the reverse B->A?  High
    reciprocity separates organic cross-linking communities from
    link-farm rings (which are near-fully reciprocal) and from
    broadcast-only hubs (near-zero); it parameterizes null models
    (directed configuration model) for the other graph scorecards.

    Runs on the UNIFIED-namespace host graph (pages assigned to the
    same h{N}.example universe their anchors target — reciprocity is
    identically zero on link_graph's bipartite crawl view, which keeps
    page hosts in a disjoint site{N} universe); self-loops excluded.

    Scale: the html anchor extraction is the same single
    regexp_extract_all scan as link_graph, aggregated straight to the
    DISTINCT host-level edge set (graph-shaped); the mutual test is one
    self-equi-join on the reversed key and the census one 1-row
    aggregate.  Counts are exact int64; only the final ratio is a
    rounded double."""
    from sparkmedkg.session import widen_scan

    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    src = F.concat(
        F.lit("h"), (F.col("doc_id") % N_DST_HOSTS).cast("string"),
        F.lit(".example"),
    ).alias("src_host")
    hosts = F.regexp_extract_all(
        _page_html(), F.lit('href="https://([^"/]+)'), 1
    )
    edges = (
        docs.select(src, F.explode(hosts).alias("dst_host"))
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )
    rev = edges.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
        F.lit(1).alias("m"),
    )
    marked = edges.join(rev, ["src_host", "dst_host"], "left").select(
        (F.col("m").isNotNull()).cast("bigint").alias("mutual")
    )
    return marked.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("mutual").alias("n_mutual_edges"),
        (F.sum("mutual") / F.lit(2)).cast("bigint").alias("n_mutual_dyads"),
        (F.count(F.lit(1)) - F.sum("mutual")).alias("n_asym_dyads"),
        F.round(
            F.sum("mutual").cast("double") / F.count(F.lit(1)), 6
        ).alias("reciprocity"),
    )


def sql_reciprocity() -> str:
    return f"""
WITH pages AS (
  SELECT 'h' || (doc_id % {N_DST_HOSTS}) || '.example' AS src_host,
         {_sql_page_html()} AS html
  FROM documents
),
anchors AS (
  SELECT src_host,
         unnest(regexp_extract_all(html, 'href="https://([^"/]+)', 1))
           AS dst_host
  FROM pages
),
e AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM anchors
  WHERE src_host <> dst_host
),
marked AS (
  SELECT CASE WHEN r.src_host IS NOT NULL THEN 1 ELSE 0 END AS mutual
  FROM e
  LEFT JOIN e r ON r.src_host = e.dst_host AND r.dst_host = e.src_host
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(mutual) AS BIGINT) AS n_mutual_edges,
       CAST(SUM(mutual) // 2 AS BIGINT) AS n_mutual_dyads,
       CAST(COUNT(*) - SUM(mutual) AS BIGINT) AS n_asym_dyads,
       round(SUM(mutual)::DOUBLE / COUNT(*), 6) AS reciprocity
FROM marked
"""


# ---------------------------------------------------------------------------
# Per-host outlink entropy (link-farm / focus detector).
# ---------------------------------------------------------------------------

def outlink_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_host, out_hosts, total_links, entropy): Shannon entropy of
    each host's outlink distribution over target hosts.  Spam farms and
    template boilerplate link uniformly into a wide target set (entropy
    near log2(out_hosts)); focused sites concentrate (low entropy) —
    entropy joins spam_mass / TrustRank as the third, purely LOCAL spam
    feature (no propagation rounds needed).

    Determinism: entropy sums doubles, so the per-host fold runs over the
    dst-host list SORTED inside the row (array_sort on the (dst, n)
    structs — out-degree is bounded by the target-host universe, so the
    per-row array is small by construction); one fixed-order fold, round
    at emit.  Plan: rides the session-cached link graph (_LG_CACHE); one
    host-keyed groupBy over edges — no corpus rescan."""
    lg = link_graph(spark, sf_dir)
    per_host = lg.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("bigint").alias("out_hosts"),
        F.sum("n_links").cast("bigint").alias("total_links"),
        F.array_sort(
            F.collect_list(F.struct("dst_host", "n_links"))
        ).alias("dist"),
    )
    tot = F.col("total_links").cast("double")
    ent = -F.aggregate(
        "dist",
        F.lit(0.0),
        lambda acc, s: acc
        + (s["n_links"].cast("double") / tot)
        * F.log2(s["n_links"].cast("double") / tot),
    )
    return per_host.select(
        "src_host",
        "out_hosts",
        "total_links",
        F.round(ent, 6).alias("entropy"),
    )


def sql_outlink_entropy() -> str:
    return f"""
WITH lg AS ({sql_link_graph()}),
per_host AS (
  SELECT src_host,
         CAST(COUNT(*) AS BIGINT) AS out_hosts,
         CAST(SUM(n_links) AS BIGINT) AS total_links,
         list_sort(list({{'dst_host': dst_host, 'n_links': n_links}})) AS dist
  FROM lg GROUP BY src_host
)
SELECT src_host, out_hosts, total_links,
       round(-list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(dist, s ->
           (s.n_links::DOUBLE / total_links)
           * log2(s.n_links::DOUBLE / total_links))),
         (acc, e) -> acc + e), 6) AS entropy
FROM per_host
"""
