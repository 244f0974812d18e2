"""Corpus curation operators: cluster topic labeling, diversified
selection and sampler drift audits.

The BERTopic-style c-TF-IDF topic table over the embedding k-means cells,
maximal-marginal-relevance (MMR) diversified top-k selection, and a KL
audit of the stratified sampler against the corpus domain mix — the
curation layer a training-data pipeline runs between dedup and packing.

Reference parity note: the reference app (pymedgraph) has no corpus
layer; these compose the engine's existing exact-integer primitives
(simsearch.kmeans's quantized Lloyd's, trainprep's md5-bucket sampler)
into the curation shapes, keeping the repo-wide determinism contract:
every ranking key is an exact BIGINT; the only doubles are final display
ratios (or a single ln() whose argument is an identical exact-int-derived
double in both engines, rounded through the same floor(x*1e6+0.5) gate
used by graphalgo's spectral scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .simsearch import KM_K, _qvec, kmeans, sql_kmeans
from .trainprep import sql_stratified_sample, stratified_sample

TOPIC_TOP = 5          # top terms kept per cluster
MMR_K = 5              # diversified picks
MMR_SHORT = 200        # relevance shortlist the MMR loop runs over
MMR_LAM_REL = 7        # lambda = 0.7 in tenths: score10 = 7*rel - 3*maxsim
MMR_LAM_DIV = 3
MMR_QUERY_ID = 0

_SQL_QUANT = (
    "[CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
    "for e in embedding]"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# c-TF-IDF topic terms per embedding cluster (BERTopic-style labeling).
# ---------------------------------------------------------------------------

def cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster, rnk, term, tf_ct, score): the top-{TOPIC_TOP} c-TF-IDF
    terms of each embedding k-means cell — class-based TF-IDF
    W(t,c) = tf(t,c) * ln(1 + A / f(t)) with A = total tokens / k — the
    BERTopic labeling step that turns opaque clusters into readable
    topics.  doc_id and vec_id share the id space (corpusops.py:2016).

    Determinism: tf, f and A's numerator are exact BIGINTs; the idf
    factor is computed once per term as floor(ln(1 + tot/(k*f)) * 1e6 +
    0.5) — the ln argument is the ratio of exact integers < 2^53, an
    identical double in both engines — so the ranking key score =
    tf * idf_micro is an exact BIGINT and ties break on the term string.

    Plan: cluster assignment is simsearch.kmeans (sample-trained, the
    full corpus pays ONE map-only argmin pass); the token explode ->
    (cluster, term) count is one partial-aggregated shuffle; f(t) and the
    corpus total ride a window / 1-row broadcast over the (k x types)
    aggregate, never the token stream; top-terms is a per-cluster window
    over the same aggregate."""
    km = kmeans(spark, sf_dir).select("vec_id", "cluster")
    toks = F.split(F.lower(F.col("text")), " +")
    tf = (
        _docs(spark, sf_dir)
        .join(km, F.col("doc_id") == F.col("vec_id"))
        .select("cluster", F.explode(toks).alias("term"))
        .groupBy("cluster", "term")
        .agg(F.count(F.lit(1)).alias("tf_ct"))
    )
    ft = F.sum("tf_ct").over(Window.partitionBy("term"))
    tot = tf.agg(F.sum("tf_ct").alias("tot"))
    scored = (
        tf.withColumn("ft", ft)
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "idf_micro",
            F.floor(
                F.log(
                    F.lit(1.0)
                    + F.col("tot").cast("double")
                    / (F.lit(KM_K) * F.col("ft")).cast("double")
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .withColumn("score", F.col("tf_ct") * F.col("idf_micro"))
    )
    wc = Window.partitionBy("cluster").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wc))
        .where(F.col("rnk") <= TOPIC_TOP)
        .select("cluster", "rnk", "term", "tf_ct", "score")
    )


def sql_cluster_topics() -> str:
    return f"""
WITH km AS (SELECT vec_id, cluster FROM ({sql_kmeans()})),
tf AS (
  SELECT cluster, term, COUNT(*) AS tf_ct
  FROM (
    SELECT k.cluster,
           unnest(regexp_split_to_array(lower(d.text), ' +')) AS term
    FROM documents d JOIN km k ON k.vec_id = d.doc_id)
  GROUP BY cluster, term
),
scored AS (
  SELECT cluster, term, tf_ct,
         tf_ct * CAST(floor(ln(1.0 + CAST((SELECT SUM(tf_ct) FROM tf)
                                          AS DOUBLE)
                                  / CAST({KM_K} * SUM(tf_ct)
                                             OVER (PARTITION BY term)
                                         AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) AS score
  FROM tf
)
SELECT cluster, rnk, term, tf_ct, score FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster
                               ORDER BY score DESC, term) AS rnk
  FROM scored)
WHERE rnk <= {TOPIC_TOP}
"""


# ---------------------------------------------------------------------------
# Maximal-marginal-relevance diversified top-k.
# ---------------------------------------------------------------------------

def mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, vec_id, rel, score10): {MMR_K} picks of greedy MMR over the
    top-{MMR_SHORT} relevance shortlist for query vec {MMR_QUERY_ID} —
    each step takes argmax of lambda*rel(d) - (1-lambda)*max_{{s in S}}
    sim(d,s), lambda=0.7, the standard diversified selection between
    retrieval and redundant context (and the diverse-sampling shape a
    curation pipeline uses to avoid near-duplicate exemplars).

    Determinism: rel and sim are inner products of the {_SQL_QUANT!r}
    integer-quantized vectors — exact BIGINTs — and lambda enters in
    tenths (score10 = {MMR_LAM_REL}*rel - {MMR_LAM_DIV}*max_sim), so every
    argmax is an integer comparison with vec_id tiebreaks; the unrolled
    DuckDB oracle matches bit-for-bit.

    Plan: ONE corpus pass computes rel map-only and TakeOrdered keeps the
    {MMR_SHORT}-row shortlist (persisted); each of the {MMR_K} greedy
    steps is an in-engine argmax over the shortlist with the selected
    vectors folded in as literals (the kmeans centroid pattern) — at
    10^12 vectors the corpus pays one scan and the loop touches
    {MMR_SHORT} rows."""
    emb = _emb(spark, sf_dir).select("vec_id", _qvec().alias("q"))
    qrow = emb.where(F.col("vec_id") == MMR_QUERY_ID).collect()[0]
    q0 = [int(v) for v in qrow["q"]]

    def dot(col, vec: list[int]) -> F.Column:
        lit = F.array(*[F.lit(int(v)) for v in vec])
        return F.aggregate(
            F.zip_with(col, lit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    cand = (
        emb.where(F.col("vec_id") != MMR_QUERY_ID)
        .withColumn("rel", dot(F.col("q"), q0))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_SHORT)
        .persist()
    )
    picked: list[tuple[int, list[int], int, int]] = []  # (id, q, rel, score10)
    for _ in range(MMR_K):
        if len(picked) > 1:
            ms = F.greatest(*[dot(F.col("q"), pq) for _, pq, _, _ in picked])
        elif picked:
            ms = dot(F.col("q"), picked[0][1])
        else:
            ms = F.lit(0).cast("long")
        step = (
            cand.where(
                ~F.col("vec_id").isin([pid for pid, _, _, _ in picked])
            )
            .withColumn(
                "score10", F.lit(MMR_LAM_REL) * F.col("rel") - F.lit(MMR_LAM_DIV) * ms
            )
            .orderBy(F.desc("score10"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        picked.append(
            (
                int(step["vec_id"]),
                [int(v) for v in step["q"]],
                int(step["rel"]),
                int(step["score10"]),
            )
        )
    cand.unpersist()
    rnk = F.lit(None).cast("int")
    sc = F.lit(None).cast("long")
    for i, (pid, _, _, s10) in enumerate(picked):
        rnk = F.when(F.col("vec_id") == pid, F.lit(i + 1)).otherwise(rnk)
        sc = F.when(F.col("vec_id") == pid, F.lit(s10)).otherwise(sc)
    # final table re-derives rel from the base scan (a 5-id pushed-down
    # point lookup), so the returned plan is self-contained — no cached
    # shortlist to leak, no driver-built DataFrame
    return (
        emb.where(F.col("vec_id").isin([pid for pid, _, _, _ in picked]))
        .select(
            rnk.alias("rnk"),
            "vec_id",
            dot(F.col("q"), q0).alias("rel"),
            sc.alias("score10"),
        )
    )


def sql_mmr_topk() -> str:
    def dot(a: str, b: str) -> str:
        return (
            f"list_aggregate([{a}[i] * {b}[i] "
            "for i in generate_series(1, 64)], 'sum')"
        )

    steps, prev = [], []
    for i in range(1, MMR_K + 1):
        if prev:
            # bind each 1-row step CTE via cross join (DuckDB rejects
            # subqueries inside list-comprehension lambdas)
            ms = "GREATEST(" + ", ".join(
                dot("c.q", f"p{j}.q") for j in prev
            ) + ")"
            joins = " ".join(f"CROSS JOIN s{j} p{j}" for j in prev)
            notin = " AND ".join(f"c.vec_id <> p{j}.vec_id" for j in prev)
            frm = f"FROM cand c {joins} WHERE {notin}"
        else:
            ms = "CAST(0 AS BIGINT)"
            frm = "FROM cand c"
        steps.append(
            f"""s{i} AS (
  SELECT c.vec_id, c.q, c.rel,
         CAST({MMR_LAM_REL} * c.rel - {MMR_LAM_DIV} * {ms} AS BIGINT)
           AS score10
  {frm}
  ORDER BY score10 DESC, c.vec_id LIMIT 1
)"""
        )
        prev.append(i)
    unrolled = ",\n".join(steps)
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rnk, vec_id, rel, score10 FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return f"""
WITH vq AS (SELECT vec_id, {_SQL_QUANT} AS q FROM embeddings),
q0 AS (SELECT q FROM vq WHERE vec_id = {MMR_QUERY_ID}),
cand AS (
  SELECT v.vec_id, v.q, CAST({dot("v.q", "q0.q")} AS BIGINT) AS rel
  FROM vq v, q0 WHERE v.vec_id <> {MMR_QUERY_ID}
  ORDER BY rel DESC, v.vec_id LIMIT {MMR_SHORT}
),
{unrolled}
{union}
"""


# ---------------------------------------------------------------------------
# Sampler drift audit: KL(sample || corpus) over the domain mix.
# ---------------------------------------------------------------------------

def sample_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_sample, n_corpus, p_ppm, q_ppm, kl_term): per-domain
    contribution to KL(sample || corpus) for the deterministic stratified
    sampler — the drift audit that catches a sampling config skewing the
    domain mix away from the corpus (sum the kl_term column for the full
    divergence; it is ~0 iff the sampler is domain-neutral).

    Determinism: counts are exact; p_ppm/q_ppm are integer floor
    divisions; kl_term = p * ln((cnt_s*n_c)/(n_s*cnt_c)) — the ln
    argument and p are ratios of exact integers < 2^53, identical doubles
    in both engines — rounded to 6dp.

    Plan: the sampler is a map-only predicate (trainprep.py:111); both
    count tables are partial-aggregated groupBys on the tiny source key;
    the totals ride 1-row broadcasts.  Nothing shuffles the corpus."""
    docs = _docs(spark, sf_dir)
    samp = stratified_sample(spark, sf_dir).select("doc_id")
    s_cnt = (
        docs.join(samp, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sample"))
    )
    c_cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_corpus"))
    s_tot = s_cnt.agg(F.sum("n_sample").alias("ns"))
    c_tot = c_cnt.agg(F.sum("n_corpus").alias("nc"))
    j = (
        s_cnt.join(c_cnt, "source")
        .crossJoin(F.broadcast(s_tot))
        .crossJoin(F.broadcast(c_tot))
    )
    p = F.col("n_sample").cast("double") / F.col("ns").cast("double")
    larg = (F.col("n_sample") * F.col("nc")).cast("double") / (
        F.col("ns") * F.col("n_corpus")
    ).cast("double")
    return j.select(
        "source",
        "n_sample",
        "n_corpus",
        F.expr("div(1000000 * n_sample, ns)").alias("p_ppm"),
        F.expr("div(1000000 * n_corpus, nc)").alias("q_ppm"),
        F.round(p * F.log(larg), 6).alias("kl_term"),
    )


def sql_sample_kl() -> str:
    return f"""
WITH samp AS (SELECT doc_id FROM ({sql_stratified_sample()})),
s_cnt AS (
  SELECT d.source, COUNT(*) AS n_sample
  FROM documents d JOIN samp s ON s.doc_id = d.doc_id
  GROUP BY d.source
),
c_cnt AS (SELECT source, COUNT(*) AS n_corpus FROM documents GROUP BY source),
tot AS (
  SELECT (SELECT SUM(n_sample) FROM s_cnt) AS ns,
         (SELECT SUM(n_corpus) FROM c_cnt) AS nc
)
SELECT s.source, s.n_sample, c.n_corpus,
       CAST((1000000 * s.n_sample) // t.ns AS BIGINT) AS p_ppm,
       CAST((1000000 * c.n_corpus) // t.nc AS BIGINT) AS q_ppm,
       round(CAST(s.n_sample AS DOUBLE) / CAST(t.ns AS DOUBLE)
             * ln(CAST(s.n_sample * t.nc AS DOUBLE)
                  / CAST(t.ns * c.n_corpus AS DOUBLE)), 6) AS kl_term
FROM s_cnt s JOIN c_cnt c USING (source) CROSS JOIN tot t
"""
