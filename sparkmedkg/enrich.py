"""Enrichment joins: CUI -> genes / SNOMED / clinical features,
gene -> proteins, protein -> GO terms.

Each reference network fetch + XML/TSV parse becomes a broadcast join
against a pre-materialized lookup table; each pandas row-loop unnest becomes
``explode``/``inline``/``stack`` (SURVEY.md §2.5-2.6: J3, J4, E1-E4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIPROT_URL = "https://www.uniprot.org/uniprotkb/"
GO_COLS = {
    "go_molecular_function": "molecular function",
    "go_biological_process": "biological process",
    "go_cellular_component": "cellular component",
}


def genes_table(cuis: DataFrame, medgen: DataFrame) -> DataFrame:
    """E1 + J3 (medgen.py:165-178): (source=CUI, gene, node_label='Gene')."""
    return (
        cuis.join(F.broadcast(medgen.select("CUI", "genes")), "CUI")
        .select(
            F.col("CUI").alias("source"),
            F.explode("genes").alias("gene"),
        )
        .withColumn("node_label", F.lit("Gene"))
    )


def snomed_table(cuis: DataFrame, medgen: DataFrame) -> DataFrame:
    """E2 (medgen.py:180-194): one row per SNOMED concept via ``inline``."""
    return (
        cuis.join(F.broadcast(medgen.select("CUI", "snomed")), "CUI")
        .select(F.col("CUI").alias("source"), F.inline("snomed"))
        .withColumn("node_label", F.lit("SnomedConcept"))
    )


def clinical_features_table(cuis: DataFrame, medgen: DataFrame) -> DataFrame:
    """E3 (medgen.py:196-212): one row per clinical feature; missing
    subfields default to '' (parser.py:36-42)."""
    mg = medgen.select(F.col("CUI").alias("src_cui"), "clinical_features")
    return (
        cuis.join(F.broadcast(mg), cuis["CUI"] == mg["src_cui"])
        .select(F.col("src_cui").alias("source"), F.inline("clinical_features"))
        .withColumn("definition", F.coalesce("definition", F.lit("")))
        .withColumn("node_label", F.lit("ClinicalFeature"))
    )


def _containment_join(g: DataFrame, up) -> DataFrame:
    """Case-insensitive space-bounded substring theta-join of gene against
    the GeneNames synonym list (uniprotpipe.py:70-73)."""
    return g.join(
        up,
        F.contains(
            F.concat(F.lit(" "), F.lower(up["GeneNames"]), F.lit(" ")),
            F.concat(F.lit(" "), F.lower(g["gene"]), F.lit(" ")),
        ),
        "inner",
    )


def proteins_table(
    genes: DataFrame, uniprot: DataFrame, strict_reference: bool = False
) -> DataFrame:
    """J4 (uniprotpipe.py:65-99): gene -> protein rows.

    Exact path: gene == GenePrimary. Fallback for unmatched genes: the
    case-insensitive substring theta-join against the space-separated
    GeneNames synonyms (uniprotpipe.py:70-73) — a broadcast nested-loop
    join; the gene side is small by construction (<= 15 entities x 4 CUIs x
    genes-per-CUI, medgen.py:136).

    Default mode unions exact matches with containment matches for only the
    unmatched genes — same emitted rows on the fixture data, deterministic
    on any data. ``strict_reference=True`` reproduces the reference quirk
    verbatim: when ANY requested gene misses the primary-gene set, ALL
    genes are resolved through the containment path (uniprotpipe.py:70-75),
    which can fan a primary-matched gene out to extra synonym rows.
    """
    g = genes.select("gene").distinct()
    up = F.broadcast(uniprot)
    if strict_reference:
        all_primary_matched = g.join(
            up, g["gene"] == up["GenePrimary"], "left_anti"
        ).isEmpty()
        if all_primary_matched:
            both = g.join(up, g["gene"] == up["GenePrimary"], "inner")
        else:
            both = _containment_join(g, up)
    else:
        exact = g.join(up, g["gene"] == up["GenePrimary"], "inner")
        unmatched = g.join(up, g["gene"] == up["GenePrimary"], "left_anti")
        both = exact.unionByName(_containment_join(unmatched, up))
    return both.select(
        F.col("gene").alias("source"),
        "Entry",
        F.lit("Protein").alias("node_label"),
        # shorten protein name: everything before the first '(' (uniprotpipe.py:77)
        F.substring_index("ProteinNames", "(", 1).alias("name"),
        "ProteinNames",
        "GeneNames",
        "Organism",
        F.coalesce("Function", F.lit("")).alias("Function"),
        F.concat(F.lit(UNIPROT_URL), F.col("Entry")).alias("uniProtUrl"),
    )


def go_table(uniprot_matched: DataFrame) -> DataFrame:
    """E4 (uniprotpipe.py:101-146): unpivot the 3 GO columns, split on ';',
    regexp-extract 'name [GO:id]'; segments without '[GO:' are dropped
    (the reference's try/except skip path)."""
    stack_expr = "stack(3, {}) as (GoType, go_list)".format(
        ", ".join(f"'{gt}', `{c}`" for c, gt in GO_COLS.items())
    )
    seg = (
        uniprot_matched.selectExpr("Entry as source", stack_expr)
        .where(F.col("go_list").isNotNull() & (F.col("go_list") != ""))
        .select(
            "source",
            "GoType",
            F.explode(F.split("go_list", ";")).alias("seg"),
        )
    )
    name = F.trim(F.regexp_extract("seg", r"^(.*?)\s*\[GO:(\d+)\]\s*$", 1))
    goid = F.regexp_extract("seg", r"^(.*?)\s*\[GO:(\d+)\]\s*$", 2)
    return (
        seg.withColumn("name", name)
        .withColumn("GoID", F.concat(F.lit("GO:"), goid))
        .where(goid != "")
        .select("source", "name", "GoID", "GoType")
        .withColumn("node_label", F.lit("GO"))
    )
