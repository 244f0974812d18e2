"""KG downstream-consumption operators: embedding-based link-prediction
scoring (TransE), predicate signature induction, and N-Triples export.

The reference pipeline stops at Neo4j upload (/root/reference/pymedgraph/
graph/neo4jconnector.py); a production KG build feeds three further
consumers, implemented here Spark-first:

- **TransE scoring / ranking** — the standard KG-embedding eval: each
  extracted positive triple is ranked against its deterministic
  tail-corruption negatives (relations.q_negative_triples) under a fixed
  embedding.  Embeddings are *derived deterministically from md5* (integer
  components in [0, EMB_MOD)), so the whole score is exact BIGINT
  arithmetic — bit-identical between Spark and the DuckDB oracle, no float
  drift, no training state to ship.  A trained-model run swaps the hash
  embedding for a broadcast lookup table; the plan shape (map-only score +
  one groupBy on the triple key) is unchanged.
- **Predicate signatures** — per-predicate top-k subject / object
  entities by occurrence mass: the domain/range induction a KG curator
  reviews before accepting a new relation type.
- **N-Triples export** — serialize canonical (subj, pred, obj) rows plus
  their n_docs provenance literal into RDF N-Triples lines: the
  interchange format downstream triple stores bulk-load.  Map-only.

Scale notes (10^12 docs → 10^9 triples on 1000 executors):
- TransE scoring is map-only per (pos, neg) row followed by one groupBy
  on the positive-triple key — partial-agg combinable, one shuffle.  The
  hash embedding recomputes the positive score per negative row (k-fold
  redundant md5); with a real embedding table you'd broadcast-join the
  vectors once instead — same plan, cheaper expression.
- Signatures: one groupBy (pred, side, cui) with map-side combine, then a
  per-(pred, side) window on the already-shuffled prefix — no extra
  exchange (window partitions by a prefix of the groupBy key).
- Export is embarrassingly parallel; lines are written partition-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkmedkg import relations
from sparkmedkg.relations import MAX_GAP, NEG_K

EMB_DIM = 8
EMB_MOD = 2001
SIG_TOPK = 5


# ---------------------------------------------------------------------------
# TransE link-prediction ranking.
# ---------------------------------------------------------------------------

def _emb_component(col: str, kind: str, i: int) -> Column:
    """i-th integer embedding component of an entity/relation id: the
    first 60 bits of md5(id|kind|i) reduced mod EMB_MOD (always >= 0, so
    `%` agrees between Spark and DuckDB)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col(col), F.lit(kind), F.lit(i))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % EMB_MOD
    )


def _transe_score2(subj: str, pred: str, obj: str) -> Column:
    """Exact squared-L2 TransE score ||h + r - t||^2 in BIGINT."""
    total = F.lit(0).cast("bigint")
    for i in range(EMB_DIM):
        d = (
            _emb_component(subj, "e", i)
            + _emb_component(pred, "r", i)
            - _emb_component(obj, "e", i)
        )
        total = total + d * d
    return total


def q_transe_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """Session-memoized via relations._KG_CACHE: the per-lane ranking
    table is triple-set-sized (post-aggregation), and the scorecard plus
    the standalone lane query both consume it — caching retires the 4x
    plan re-compilation of the md5-embedding expressions (VERDICT r4
    task 3; cold cost stays visible in BENCH.md's cold-lane table)."""
    return relations._kg_cached(
        spark, "kge_transe", (sf_dir, k, max_gap),
        lambda: _build_transe_rank(spark, sf_dir, k, max_gap),
    )


def _build_transe_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """(subj_cui, pred, obj_cui, pos_score2, n_neg, pos_rank): each
    positive triple's exact squared TransE score and its optimistic rank
    (1 + #negatives scoring strictly lower) among its k filtered
    tail-corruption negatives — the per-triple rows behind an MRR/Hits@k
    link-prediction report."""
    neg = relations.q_negative_triples(spark, sf_dir, k=k, max_gap=max_gap)
    scored = neg.select(
        "subj_cui",
        "pred",
        "obj_cui",
        _transe_score2("subj_cui", "pred", "obj_cui").alias("pos_score2"),
        _transe_score2("subj_cui", "pred", "neg_obj_cui").alias("neg_score2"),
    )
    return scored.groupBy("subj_cui", "pred", "obj_cui", "pos_score2").agg(
        F.count(F.lit(1)).alias("n_neg"),
        (
            F.lit(1)
            + F.sum(
                F.when(F.col("neg_score2") < F.col("pos_score2"), 1).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("pos_rank"),
    )


def _sql_emb(col: str, kind: str, i: str) -> str:
    return (
        f"(CAST('0x' || substring(md5({col} || '|{kind}|' || {i}), 1, 15)"
        f" AS BIGINT) % {EMB_MOD})"
    )


def _sql_score2(subj: str, pred: str, obj: str) -> str:
    terms = []
    for i in range(EMB_DIM):
        d = (
            f"({_sql_emb(subj, 'e', str(i))} + {_sql_emb(pred, 'r', str(i))}"
            f" - {_sql_emb(obj, 'e', str(i))})"
        )
        terms.append(f"{d} * {d}")
    return "(" + " + ".join(terms) + ")"


def sql_transe_rank(k: int = NEG_K, max_gap: int = MAX_GAP) -> str:
    return f"""
WITH neg AS ({relations.sql_negative_triples(k, max_gap)}),
scored AS (
  SELECT subj_cui, pred, obj_cui,
         {_sql_score2('subj_cui', 'pred', 'obj_cui')} AS pos_score2,
         {_sql_score2('subj_cui', 'pred', 'neg_obj_cui')} AS neg_score2
  FROM neg
)
SELECT subj_cui, pred, obj_cui,
       CAST(pos_score2 AS BIGINT) AS pos_score2,
       CAST(COUNT(*) AS BIGINT) AS n_neg,
       CAST(1 + SUM(CASE WHEN neg_score2 < pos_score2 THEN 1 ELSE 0 END)
            AS BIGINT) AS pos_rank
FROM scored
GROUP BY subj_cui, pred, obj_cui, pos_score2
"""


# ---------------------------------------------------------------------------
# Predicate signatures: per-pred dominant domain/range entities.
# ---------------------------------------------------------------------------

def q_pred_signature(
    spark: SparkSession,
    sf_dir: str,
    topk: int = SIG_TOPK,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """(pred, side, cui, occ_sum, rk): for each predicate, the top-k
    subject-side and object-side entities by total occurrence count —
    the induced domain/range signature a curator reviews.  Ties broken by
    cui ascending (deterministic)."""
    rel = relations.q_relations(spark, sf_dir, max_gap=max_gap)
    sides = rel.select(
        "pred", F.lit("subj").alias("side"), F.col("subj_cui").alias("cui"), "n_occ"
    ).unionByName(
        rel.select(
            "pred", F.lit("obj").alias("side"), F.col("obj_cui").alias("cui"), "n_occ"
        )
    )
    mass = sides.groupBy("pred", "side", "cui").agg(
        F.sum("n_occ").cast("bigint").alias("occ_sum")
    )
    w = Window.partitionBy("pred", "side").orderBy(
        F.col("occ_sum").desc(), F.col("cui")
    )
    return (
        mass.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= topk)
    )


def sql_pred_signature(topk: int = SIG_TOPK, max_gap: int = MAX_GAP) -> str:
    return f"""
WITH rel AS ({relations.sql_relations(max_gap)}),
sides AS (
  SELECT pred, 'subj' AS side, subj_cui AS cui, n_occ FROM rel
  UNION ALL
  SELECT pred, 'obj' AS side, obj_cui AS cui, n_occ FROM rel
),
mass AS (
  SELECT pred, side, cui, CAST(SUM(n_occ) AS BIGINT) AS occ_sum
  FROM sides GROUP BY pred, side, cui
),
ranked AS (
  SELECT pred, side, cui, occ_sum,
         CAST(ROW_NUMBER() OVER (PARTITION BY pred, side
                                 ORDER BY occ_sum DESC, cui) AS BIGINT) AS rk
  FROM mass
)
SELECT * FROM ranked WHERE rk <= {topk}
"""


# ---------------------------------------------------------------------------
# N-Triples export.
# ---------------------------------------------------------------------------

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def q_export_ntriples(
    spark: SparkSession, sf_dir: str, max_gap: int = MAX_GAP
) -> DataFrame:
    """(stmt_id, line, n_chars): each canonical triple serialized as an
    RDF N-Triples edge line plus a reified provenance literal line
    carrying its n_docs support.  CUI/pred ids are URI-safe by
    construction (alnum + '_'), so no percent-escaping is needed here; a
    general exporter would regexp_replace the reserved characters first.
    Map-only: lines serialize partition-local with no shuffle."""
    rel = relations.q_relations(spark, sf_dir, max_gap=max_gap)
    stmt = F.concat_ws("|", "subj_cui", "pred", "obj_cui")
    edge = rel.select(
        stmt.alias("stmt_id"),
        F.concat(
            F.lit("<urn:cui:"), F.col("subj_cui"),
            F.lit("> <urn:kg:"), F.col("pred"),
            F.lit("> <urn:cui:"), F.col("obj_cui"),
            F.lit("> ."),
        ).alias("line"),
    )
    prov = rel.select(
        stmt.alias("stmt_id"),
        F.concat(
            F.lit("<urn:stmt:"),
            F.concat_ws(":", "subj_cui", "pred", "obj_cui"),
            F.lit("> <urn:kg:n_docs> \""),
            F.col("n_docs").cast("string"),
            F.lit(f"\"^^<{XSD_INT}> ."),
        ).alias("line"),
    )
    out = edge.unionByName(prov)
    return out.select(
        "stmt_id", "line", F.length("line").cast("bigint").alias("n_chars")
    )


def sql_export_ntriples(max_gap: int = MAX_GAP) -> str:
    return f"""
WITH rel AS ({relations.sql_relations(max_gap)}),
lines AS (
  SELECT subj_cui || '|' || pred || '|' || obj_cui AS stmt_id,
         '<urn:cui:' || subj_cui || '> <urn:kg:' || pred
           || '> <urn:cui:' || obj_cui || '> .' AS line
  FROM rel
  UNION ALL
  SELECT subj_cui || '|' || pred || '|' || obj_cui AS stmt_id,
         '<urn:stmt:' || subj_cui || ':' || pred || ':' || obj_cui
           || '> <urn:kg:n_docs> "' || CAST(n_docs AS VARCHAR)
           || '"^^<{XSD_INT}> .' AS line
  FROM rel
)
SELECT stmt_id, line, CAST(length(line) AS BIGINT) AS n_chars FROM lines
"""


# ---------------------------------------------------------------------------
# DistMult link-prediction ranking (bilinear-diagonal twin of TransE).
# ---------------------------------------------------------------------------

def _distmult_score(subj: str, pred: str, obj: str) -> Column:
    """Exact bilinear-diagonal score sum_i h_i * r_i * t_i in BIGINT
    (components < EMB_MOD, so each term < 2001^3 ~ 8e9 and the 8-term sum
    stays far inside int64)."""
    total = F.lit(0).cast("bigint")
    for i in range(EMB_DIM):
        total = total + (
            _emb_component(subj, "e", i)
            * _emb_component(pred, "r", i)
            * _emb_component(obj, "e", i)
        )
    return total


def q_distmult_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """Session-memoized via relations._KG_CACHE: the per-lane ranking
    table is triple-set-sized (post-aggregation), and the scorecard plus
    the standalone lane query both consume it — caching retires the 4x
    plan re-compilation of the md5-embedding expressions (VERDICT r4
    task 3; cold cost stays visible in BENCH.md's cold-lane table)."""
    return relations._kg_cached(
        spark, "kge_distmult", (sf_dir, k, max_gap),
        lambda: _build_distmult_rank(spark, sf_dir, k, max_gap),
    )


def _build_distmult_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """(subj_cui, pred, obj_cui, pos_score, n_neg, pos_rank): DistMult
    twin of q_transe_rank — each positive triple's exact bilinear score
    and its optimistic rank (1 + #negatives scoring strictly HIGHER;
    DistMult is a similarity, so higher is better) among its k
    tail-corruption negatives.  Same plan as TransE: map-only scoring +
    one partial-agg-combinable groupBy on the triple key; a trained model
    swaps the hash embedding for a broadcast lookup with the plan
    unchanged."""
    neg = relations.q_negative_triples(spark, sf_dir, k=k, max_gap=max_gap)
    scored = neg.select(
        "subj_cui",
        "pred",
        "obj_cui",
        _distmult_score("subj_cui", "pred", "obj_cui").alias("pos_score"),
        _distmult_score("subj_cui", "pred", "neg_obj_cui").alias("neg_score"),
    )
    return scored.groupBy("subj_cui", "pred", "obj_cui", "pos_score").agg(
        F.count(F.lit(1)).alias("n_neg"),
        (
            F.lit(1)
            + F.sum(
                F.when(F.col("neg_score") > F.col("pos_score"), 1).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("pos_rank"),
    )


def _sql_distmult(subj: str, pred: str, obj: str) -> str:
    terms = [
        f"({_sql_emb(subj, 'e', str(i))} * {_sql_emb(pred, 'r', str(i))}"
        f" * {_sql_emb(obj, 'e', str(i))})"
        for i in range(EMB_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def sql_distmult_rank(k: int = NEG_K, max_gap: int = MAX_GAP) -> str:
    return f"""
WITH neg AS ({relations.sql_negative_triples(k, max_gap)}),
scored AS (
  SELECT subj_cui, pred, obj_cui,
         {_sql_distmult('subj_cui', 'pred', 'obj_cui')} AS pos_score,
         {_sql_distmult('subj_cui', 'pred', 'neg_obj_cui')} AS neg_score
  FROM neg
)
SELECT subj_cui, pred, obj_cui,
       CAST(pos_score AS BIGINT) AS pos_score,
       CAST(COUNT(*) AS BIGINT) AS n_neg,
       CAST(1 + SUM(CASE WHEN neg_score > pos_score THEN 1 ELSE 0 END)
            AS BIGINT) AS pos_rank
FROM scored
GROUP BY subj_cui, pred, obj_cui, pos_score
"""


# ---------------------------------------------------------------------------
# ComplEx link-prediction ranking (complex bilinear, integer lane).
# ---------------------------------------------------------------------------

def _complex_score(subj: str, pred: str, obj: str) -> Column:
    """Exact ComplEx score Re(<h, r, conj(t)>) in BIGINT: entities and
    relations carry integer (re, im) component pairs (kinds cr/ci and
    rr2/ri), and the standard four-term expansion

        sum_i  re_h*re_r*re_t + im_h*re_r*im_t
             + re_h*im_r*im_t - im_h*im_r*re_t

    is a sum of triple products of components < EMB_MOD — each term
    < 2001^3 ~ 8e9, the 4*EMB_DIM-term sum < 2.6e11, far inside int64."""
    total = F.lit(0).cast("bigint")
    for i in range(EMB_DIM):
        hr = _emb_component(subj, "cr", i)
        hi = _emb_component(subj, "ci", i)
        rr = _emb_component(pred, "rr2", i)
        ri = _emb_component(pred, "ri", i)
        tr = _emb_component(obj, "cr", i)
        ti = _emb_component(obj, "ci", i)
        total = total + (
            hr * rr * tr + hi * rr * ti + hr * ri * ti - hi * ri * tr
        )
    return total


def q_complex_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """Session-memoized via relations._KG_CACHE: the per-lane ranking
    table is triple-set-sized (post-aggregation), and the scorecard plus
    the standalone lane query both consume it — caching retires the 4x
    plan re-compilation of the md5-embedding expressions (VERDICT r4
    task 3; cold cost stays visible in BENCH.md's cold-lane table)."""
    return relations._kg_cached(
        spark, "kge_complex", (sf_dir, k, max_gap),
        lambda: _build_complex_rank(spark, sf_dir, k, max_gap),
    )


def _build_complex_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """(subj_cui, pred, obj_cui, pos_score, n_neg, pos_rank): ComplEx twin
    of q_distmult_rank — DistMult cannot model asymmetric relations
    (score(h,r,t) = score(t,r,h) by construction); ComplEx's imaginary
    parts break that tie, which is why it's the standard next rung on a
    KG-embedding eval ladder.  Higher is better, so rank counts strictly
    HIGHER-scoring negatives.  Same plan as TransE/DistMult: map-only
    scoring + one partial-agg-combinable groupBy on the triple key."""
    neg = relations.q_negative_triples(spark, sf_dir, k=k, max_gap=max_gap)
    scored = neg.select(
        "subj_cui",
        "pred",
        "obj_cui",
        _complex_score("subj_cui", "pred", "obj_cui").alias("pos_score"),
        _complex_score("subj_cui", "pred", "neg_obj_cui").alias(
            "neg_score"
        ),
    )
    return scored.groupBy("subj_cui", "pred", "obj_cui", "pos_score").agg(
        F.count(F.lit(1)).alias("n_neg"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("neg_score") > F.col("pos_score"), 1
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("pos_rank"),
    )


def _sql_complex(subj: str, pred: str, obj: str) -> str:
    terms = []
    for i in range(EMB_DIM):
        hr = _sql_emb(subj, "cr", str(i))
        hi = _sql_emb(subj, "ci", str(i))
        rr = _sql_emb(pred, "rr2", str(i))
        ri = _sql_emb(pred, "ri", str(i))
        tr = _sql_emb(obj, "cr", str(i))
        ti = _sql_emb(obj, "ci", str(i))
        terms.append(
            f"({hr} * {rr} * {tr} + {hi} * {rr} * {ti}"
            f" + {hr} * {ri} * {ti} - {hi} * {ri} * {tr})"
        )
    return "(" + " + ".join(terms) + ")"


def sql_complex_rank(k: int = NEG_K, max_gap: int = MAX_GAP) -> str:
    return f"""
WITH neg AS ({relations.sql_negative_triples(k, max_gap)}),
scored AS (
  SELECT subj_cui, pred, obj_cui,
         {_sql_complex('subj_cui', 'pred', 'obj_cui')} AS pos_score,
         {_sql_complex('subj_cui', 'pred', 'neg_obj_cui')} AS neg_score
  FROM neg
)
SELECT subj_cui, pred, obj_cui,
       CAST(pos_score AS BIGINT) AS pos_score,
       CAST(COUNT(*) AS BIGINT) AS n_neg,
       CAST(1 + SUM(CASE WHEN neg_score > pos_score THEN 1 ELSE 0 END)
            AS BIGINT) AS pos_rank
FROM scored
GROUP BY subj_cui, pred, obj_cui, pos_score
"""


# ---------------------------------------------------------------------------
# RotatE-analog link-prediction ranking (modular phase rotation).
# ---------------------------------------------------------------------------

def _rotate_score(subj: str, pred: str, obj: str) -> Column:
    """Exact modular-rotation distance: components are phases in
    Z_EMB_MOD, the relation ADDS its phase (RotatE's Hadamard rotation on
    the unit circle, discretized to EMB_MOD ticks), and the per-dimension
    penalty is the CIRCULAR distance min(d, M-d) where
    d = (h_i + r_i - t_i) mod M.  All bigint; lower is better."""
    total = F.lit(0).cast("bigint")
    for i in range(EMB_DIM):
        d = F.pmod(
            _emb_component(subj, "e", i)
            + _emb_component(pred, "ph", i)
            - _emb_component(obj, "e", i),
            F.lit(EMB_MOD),
        )
        total = total + F.least(d, F.lit(EMB_MOD) - d)
    return total


def q_rotate_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """Session-memoized via relations._KG_CACHE: the per-lane ranking
    table is triple-set-sized (post-aggregation), and the scorecard plus
    the standalone lane query both consume it — caching retires the 4x
    plan re-compilation of the md5-embedding expressions (VERDICT r4
    task 3; cold cost stays visible in BENCH.md's cold-lane table)."""
    return relations._kg_cached(
        spark, "kge_rotate", (sf_dir, k, max_gap),
        lambda: _build_rotate_rank(spark, sf_dir, k, max_gap),
    )


def _build_rotate_rank(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """(subj_cui, pred, obj_cui, pos_dist, n_neg, pos_rank): RotatE-analog
    twin of q_transe_rank — relations act as phase rotations, so
    composition (r1 then r2 = phases adding) and inversion (negated
    phase) are modeled exactly, the properties TransE's plain translation
    lacks on cyclic relation families.  Distance, so rank counts strictly
    LOWER-scoring negatives.  Entity phases reuse the shared 'e'
    embedding space (same entity table, one more relation lane) — with a
    trained model both become broadcast lookups, plan unchanged."""
    neg = relations.q_negative_triples(spark, sf_dir, k=k, max_gap=max_gap)
    scored = neg.select(
        "subj_cui",
        "pred",
        "obj_cui",
        _rotate_score("subj_cui", "pred", "obj_cui").alias("pos_dist"),
        _rotate_score("subj_cui", "pred", "neg_obj_cui").alias("neg_dist"),
    )
    return scored.groupBy("subj_cui", "pred", "obj_cui", "pos_dist").agg(
        F.count(F.lit(1)).alias("n_neg"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("neg_dist") < F.col("pos_dist"), 1
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("pos_rank"),
    )


def _sql_rotate(subj: str, pred: str, obj: str) -> str:
    terms = []
    for i in range(EMB_DIM):
        raw = (
            f"({_sql_emb(subj, 'e', str(i))} + {_sql_emb(pred, 'ph', str(i))}"
            f" - {_sql_emb(obj, 'e', str(i))})"
        )
        # DuckDB % keeps the dividend's sign; normalize to [0, M)
        d = f"((({raw} % {EMB_MOD}) + {EMB_MOD}) % {EMB_MOD})"
        terms.append(f"least({d}, {EMB_MOD} - {d})")
    return "(" + " + ".join(terms) + ")"


def sql_rotate_rank(k: int = NEG_K, max_gap: int = MAX_GAP) -> str:
    return f"""
WITH neg AS ({relations.sql_negative_triples(k, max_gap)}),
scored AS (
  SELECT subj_cui, pred, obj_cui,
         {_sql_rotate('subj_cui', 'pred', 'obj_cui')} AS pos_dist,
         {_sql_rotate('subj_cui', 'pred', 'neg_obj_cui')} AS neg_dist
  FROM neg
)
SELECT subj_cui, pred, obj_cui,
       CAST(pos_dist AS BIGINT) AS pos_dist,
       CAST(COUNT(*) AS BIGINT) AS n_neg,
       CAST(1 + SUM(CASE WHEN neg_dist < pos_dist THEN 1 ELSE 0 END)
            AS BIGINT) AS pos_rank
FROM scored
GROUP BY subj_cui, pred, obj_cui, pos_dist
"""


# ---------------------------------------------------------------------------
# KGE scorecard: MRR / Hits@k across all four scoring lanes.
# ---------------------------------------------------------------------------

MRR_PPM = 1_000_000


def q_kge_scorecard(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """(model, n_triples, mrr_ppm, hits1, hits3, hits10): the standard
    link-prediction eval table over ALL FOUR scoring lanes (TransE,
    DistMult, ComplEx, RotatE-analog) on the same positives/negatives —
    the model-selection artifact a KG team actually reads.  MRR is
    integer-exact: per-triple reciprocal rank as 1e6 div rank (floor),
    averaged by integer division — identical in both engines.

    Plan: each lane is the same map-only score + one groupBy; the union
    is 4x that, and the final aggregate is 4 rows.  Model tags ride a
    literal column, so the union stays partial-agg combinable."""
    lanes = [
        ("transe", q_transe_rank(spark, sf_dir, k, max_gap)),
        ("distmult", q_distmult_rank(spark, sf_dir, k, max_gap)),
        ("complex", q_complex_rank(spark, sf_dir, k, max_gap)),
        ("rotate", q_rotate_rank(spark, sf_dir, k, max_gap)),
    ]
    unioned = None
    for name, df in lanes:
        cur = df.select(
            F.lit(name).alias("model"), F.col("pos_rank").alias("rank")
        )
        unioned = cur if unioned is None else unioned.unionByName(cur)
    return (
        unioned.groupBy("model")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_triples"),
            F.expr(f"sum(div({MRR_PPM}, rank))").alias("_rr_sum"),
            F.sum(F.when(F.col("rank") <= 1, 1).otherwise(0))
            .cast("bigint")
            .alias("hits1"),
            F.sum(F.when(F.col("rank") <= 3, 1).otherwise(0))
            .cast("bigint")
            .alias("hits3"),
            F.sum(F.when(F.col("rank") <= 10, 1).otherwise(0))
            .cast("bigint")
            .alias("hits10"),
        )
        .select(
            "model",
            "n_triples",
            F.expr("div(_rr_sum, n_triples)")
            .cast("bigint")
            .alias("mrr_ppm"),
            "hits1",
            "hits3",
            "hits10",
        )
    )


def sql_kge_scorecard(k: int = NEG_K, max_gap: int = MAX_GAP) -> str:
    lanes = [
        ("transe", sql_transe_rank(k, max_gap)),
        ("distmult", sql_distmult_rank(k, max_gap)),
        ("complex", sql_complex_rank(k, max_gap)),
        ("rotate", sql_rotate_rank(k, max_gap)),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS model, pos_rank AS rank FROM ({sql})"
        for name, sql in lanes
    )
    return f"""
WITH ranks AS (
{unions}
)
SELECT model,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(SUM({MRR_PPM} // rank) // COUNT(*) AS BIGINT) AS mrr_ppm,
       CAST(SUM(CASE WHEN rank <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
       CAST(SUM(CASE WHEN rank <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
       CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits10
FROM ranks GROUP BY model
"""


# ---------------------------------------------------------------------------
# KG schema statistics (VoID-style dataset description).
# ---------------------------------------------------------------------------

def q_schema_stats(
    spark: SparkSession, sf_dir: str, max_gap: int = MAX_GAP
) -> DataFrame:
    """(pred, n_triples, n_subj, n_obj, occ_mass, avg_fanout_ppm): the
    per-predicate cardinality profile (VoID-style dataset description) a
    KG consumer reads before writing queries — triple count, distinct
    subject/object counts, total occurrence mass, and the mean
    objects-per-subject fan-out integer-quantized to ppm.  One groupBy
    over the canonical relations table (triple-set-sized, far below the
    corpus); distinct counts are exact per-pred aggregates."""
    rel = relations.q_relations(spark, sf_dir, max_gap=max_gap)
    return rel.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triples"),
        F.countDistinct("subj_cui").cast("bigint").alias("n_subj"),
        F.countDistinct("obj_cui").cast("bigint").alias("n_obj"),
        F.sum("n_occ").cast("bigint").alias("occ_mass"),
    ).select(
        "pred",
        "n_triples",
        "n_subj",
        "n_obj",
        "occ_mass",
        F.expr("n_triples * 1000000 div n_subj").cast("bigint").alias(
            "avg_fanout_ppm"
        ),
    )


def sql_schema_stats(max_gap: int = MAX_GAP) -> str:
    return f"""
WITH rel AS ({relations.sql_relations(max_gap)})
SELECT pred,
       CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT subj_cui) AS BIGINT) AS n_subj,
       CAST(COUNT(DISTINCT obj_cui) AS BIGINT) AS n_obj,
       CAST(SUM(n_occ) AS BIGINT) AS occ_mass,
       CAST(COUNT(*) * 1000000 // COUNT(DISTINCT subj_cui) AS BIGINT)
         AS avg_fanout_ppm
FROM rel
GROUP BY pred
"""


# ---------------------------------------------------------------------------
# Triple classification accuracy (per-predicate learned threshold).
# ---------------------------------------------------------------------------

def q_triple_classification(
    spark: SparkSession,
    sf_dir: str,
    k: int = NEG_K,
    max_gap: int = MAX_GAP,
) -> DataFrame:
    """(pred, n_pos, n_neg, thr_milli, tp, tn, acc_ppm): the standard
    triple-classification evaluation (Socher et al.'s protocol) over the
    deterministic hash-embedding TransE scores — per predicate, learn the
    midpoint threshold between the mean positive and mean negative
    score2, classify every scored triple (a triple is accepted iff
    score2 < threshold; LOWER is better in TransE), and report accuracy.
    The per-predicate row a KG-embedding training loop watches next to
    MRR (q_transe_rank).

    Exactness: score2 is already an exact integer; means are integer
    milli-units (sum * 1000 div n) and the midpoint threshold their
    integer average, so classification compares exact integers — no
    float drift.  Plan: the scored candidate set is the bounded
    negative-sampling join (already gated); everything after is two
    predicate-keyed partial aggregates and a broadcast threshold join —
    predicate cardinality is the 4-row schema."""
    neg = relations.q_negative_triples(spark, sf_dir, k=k, max_gap=max_gap)
    scored = neg.select(
        "pred",
        "subj_cui",
        "obj_cui",
        _transe_score2("subj_cui", "pred", "obj_cui").alias("pos_score2"),
        _transe_score2("subj_cui", "pred", "neg_obj_cui").alias("neg_score2"),
    )
    pos = scored.select("pred", "subj_cui", "obj_cui", "pos_score2").distinct()
    pstat = pos.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
        F.sum("pos_score2").cast("bigint").alias("ps"),
    )
    nstat = scored.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neg"),
        F.sum("neg_score2").cast("bigint").alias("ns"),
    )
    thr = (
        pstat.join(nstat, "pred")
        .select(
            "pred",
            "n_pos",
            "n_neg",
            F.expr("(ps * 1000 div n_pos + ns * 1000 div n_neg) div 2")
            .cast("bigint")
            .alias("thr_milli"),
        )
    )
    tp = (
        pos.join(F.broadcast(thr.select("pred", "thr_milli")), "pred")
        .where(F.expr("pos_score2 * 1000 < thr_milli"))
        .groupBy("pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tp"))
    )
    tn = (
        scored.join(F.broadcast(thr.select("pred", "thr_milli")), "pred")
        .where(F.expr("neg_score2 * 1000 >= thr_milli"))
        .groupBy("pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tn"))
    )
    return (
        thr.join(tp, "pred", "left")
        .join(tn, "pred", "left")
        .select(
            "pred",
            "n_pos",
            "n_neg",
            "thr_milli",
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce("tn", F.lit(0)).cast("bigint").alias("tn"),
            F.expr(
                "(coalesce(tp, 0) + coalesce(tn, 0)) * 1000000"
                " div (n_pos + n_neg)"
            )
            .cast("bigint")
            .alias("acc_ppm"),
        )
    )


def sql_triple_classification(k: int = NEG_K, max_gap: int = MAX_GAP) -> str:
    return f"""
WITH neg AS ({relations.sql_negative_triples(k, max_gap)}),
scored AS (
  SELECT pred, subj_cui, obj_cui,
         {_sql_score2('subj_cui', 'pred', 'obj_cui')} AS pos_score2,
         {_sql_score2('subj_cui', 'pred', 'neg_obj_cui')} AS neg_score2
  FROM neg
),
pos AS (SELECT DISTINCT pred, subj_cui, obj_cui, pos_score2 FROM scored),
pstat AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pos,
         CAST(SUM(pos_score2) AS BIGINT) AS ps
  FROM pos GROUP BY 1
),
nstat AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_neg,
         CAST(SUM(neg_score2) AS BIGINT) AS ns
  FROM scored GROUP BY 1
),
thr AS (
  SELECT p.pred, p.n_pos, n.n_neg,
         CAST((p.ps * 1000 // p.n_pos + n.ns * 1000 // n.n_neg) // 2
              AS BIGINT) AS thr_milli
  FROM pstat p JOIN nstat n ON p.pred = n.pred
),
tp AS (
  SELECT p.pred, CAST(COUNT(*) AS BIGINT) AS tp
  FROM pos p JOIN thr t ON p.pred = t.pred
  WHERE p.pos_score2 * 1000 < t.thr_milli GROUP BY 1
),
tn AS (
  SELECT s.pred, CAST(COUNT(*) AS BIGINT) AS tn
  FROM scored s JOIN thr t ON s.pred = t.pred
  WHERE s.neg_score2 * 1000 >= t.thr_milli GROUP BY 1
)
SELECT t.pred, t.n_pos, t.n_neg, t.thr_milli,
       CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
       CAST(COALESCE(tn.tn, 0) AS BIGINT) AS tn,
       CAST((COALESCE(tp.tp, 0) + COALESCE(tn.tn, 0)) * 1000000
            // (t.n_pos + t.n_neg) AS BIGINT) AS acc_ppm
FROM thr t
LEFT JOIN tp ON t.pred = tp.pred
LEFT JOIN tn ON t.pred = tn.pred
"""
