"""Entity linking: candidate generation + disambiguation scoring, JVM-side.

Reference semantics (entityrecognition.py:59-61, 87-116): each entity span
gets (CUI, score) candidates from a char-3-gram index over UMLS aliases; links
are deduped on (CUI, lower(source)); canonical name + definition come from a
CUI lookup.

Spark-first re-expression — **no Python in the hot path**:
- candidate generation = broadcast equi-join of distinct resolved mentions
  against the alias index (the trie already guarantees the mention *is* an
  alias, so candidates are exactly the CUIs sharing that surface form);
- disambiguation score = set-cosine over distinct char-3-grams of the
  resolved mention vs the CUI's canonical name, computed with built-in
  array functions inside whole-stage codegen (schemas.trigrams);
- per-mention top-k = ranked window (A2 pattern), default k=5 / threshold 0.7
  mirroring the public scispaCy linker defaults;
- canonical name/definition = broadcast hash join (N5), never a per-row dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkmedkg.schemas import trigrams


def cosine_score(a, b):
    """Set-cosine of char-3-gram sets: |A∩B| / sqrt(|A|·|B|)."""
    ga, gb = trigrams(a), trigrams(b)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    denom = F.sqrt(F.size(ga).cast("double") * F.size(gb).cast("double"))
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def link_mentions(
    mentions: DataFrame,
    aliases: DataFrame,
    concepts: DataFrame,
    threshold: float = 0.7,
    top_k: int = 5,
) -> DataFrame:
    """mentions(url, mention, resolved, node_label) ->
    links(source, CUI, kb_score, name, Definition, node_label='UMLS').

    ``source`` is the raw (lower-cased) mention text — the UmlsLinks edge key
    (entityrecognition.py:87-98) — while candidates and scores use the
    abbreviation-resolved form.
    """
    distinct_mentions = mentions.select("mention", "resolved").distinct()
    cands = distinct_mentions.join(
        F.broadcast(aliases.select("alias", "CUI").distinct()),
        distinct_mentions["resolved"] == F.col("alias"),
        "inner",
    )
    scored = cands.join(
        F.broadcast(concepts.select("CUI", "canonical_name", "definition")), "CUI"
    ).withColumn("kb_score", cosine_score(F.col("resolved"), F.col("canonical_name")))

    w = Window.partitionBy("mention").orderBy(
        F.desc("kb_score"), F.asc("CUI")
    )
    return (
        scored.where(F.col("kb_score") >= threshold)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("mention").alias("source"),
            "CUI",
            "kb_score",
            F.col("canonical_name").alias("name"),
            F.coalesce("definition", F.lit("")).alias("Definition"),
            F.lit("UMLS").alias("node_label"),
        )
        .dropDuplicates(["CUI", "source"])
    )
