"""Concept selection: top-N frequent entities x top-k CUIs each.

Reference semantics (medgen.py:136-163): take the 15 most-mentioned
DISEASE entities (value_counts, A1), then per entity the 4 best-scoring
links with kb_score > 0.85 (A2), union + distinct the CUIs (A3).

Spark-first: count-agg + deterministic top-k (count desc, text asc) and a
ranked window per entity (score desc, CUI asc) — replacing the reference's
per-entity Python loop with one shuffle each. The mentions input is already
per-doc deduped, so count == document frequency, matching the reference's
value_counts over the per-paper-deduped Entities table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_entities(mentions: DataFrame, n: int = 15, label: str = "DISEASE") -> DataFrame:
    """A1: top-n most-document-frequent entities of ``label``."""
    return (
        mentions.where(F.col("node_label") == label)
        .groupBy(F.col("mention").alias("text"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("text"))
        .limit(n)
    )


def top_cuis_per_entity(
    links: DataFrame,
    entities: DataFrame,
    cui_n: int = 4,
    min_score: float = 0.85,
) -> DataFrame:
    """A2 + J1: per selected entity, its ``cui_n`` best links above
    ``min_score`` (medgen.py:149,156-161). Entities side is tiny -> broadcast.
    """
    w = Window.partitionBy("source").orderBy(F.desc("kb_score"), F.asc("CUI"))
    return (
        links.join(
            F.broadcast(entities.select(F.col("text").alias("source"))), "source"
        )
        .where(F.col("kb_score") > min_score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cui_n)
        .select("source", "CUI", "kb_score")
    )


def selected_cuis(
    mentions: DataFrame,
    links: DataFrame,
    n: int = 15,
    cui_n: int = 4,
    min_score: float = 0.85,
) -> DataFrame:
    """A3: the distinct CUI set driving enrichment (medgen.py:163)."""
    ents = top_entities(mentions, n=n)
    return top_cuis_per_entity(links, ents, cui_n=cui_n, min_score=min_score) \
        .select("CUI").distinct()


def selected_cuis_semijoin(links: DataFrame, gene_cuis: DataFrame,
                           min_score: float = 0.85) -> DataFrame:
    """J2: the ``use_medgen_set`` path (medgen.py:148-150) — CUIs with
    kb_score above threshold semi-joined against the gene-bearing CUI set."""
    return (
        links.where(F.col("kb_score") > min_score)
        .select("CUI")
        .distinct()
        .join(F.broadcast(gene_cuis), "CUI", "left_semi")
    )
