"""S5: MedGen eSummaryResult XML parsing as a distributed operator.

The reference parses NCBI efetch/esummary XML responses on the driver with
ElementTree (parser.py:4-45: ``parse_medgen``) into per-summary dicts of
genes / SNOMED concepts / clinical features. Here the same semantics run as
an Arrow-batched ``mapInPandas`` stage over a DataFrame column of XML
payloads — one XML document per row (at crawl scale: one esummary response
per fetch partition), emitting one row per ``DocumentSummary`` in the
MEDGEN_SCHEMA shape that feeds ``enrich.*`` directly.

Reference parity (parser.py):
- root tag must be ``eSummaryResult`` else ``RuntimeError('Unexpected XML
  was passed.')`` (parser.py:19-20);
- uid from the DocumentSummary attribute (parser.py:24);
- cui = ConceptId text (parser.py:27);
- genes = ConceptMeta/AssociatedGenes/Gene texts (parser.py:28);
- snomed Name attrs SAUI/SCUI/SAB + text (parser.py:30-36);
- clinical features: CUI attr + SemanticType/Name/Definition child texts,
  missing child -> '' (parser.py:38-44).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARSED_SCHEMA = (
    "uid string, CUI string, genes array<string>, "
    "snomed array<struct<SAUI:string,snomed_text:string,SCUI:string,SAB:string>>, "
    "clinical_features array<struct<CUI:string,type:string,name:string,"
    "definition:string>>"
)


def parse_medgen_records(
    xml_records: str, snomed: bool = True, clinical_features: bool = True
) -> list[tuple]:
    """Parse one eSummaryResult XML string into per-summary rows
    (uid, cui, genes, snomed, clinical_features). Reference semantics
    including the unexpected-root RuntimeError (parser.py:4-45)."""
    root = ET.fromstring(xml_records)
    if not root.tag == "eSummaryResult":
        raise RuntimeError("Unexpected XML was passed.")
    rows = []
    for summary in root.findall("DocumentSummarySet/DocumentSummary"):
        uid = summary.attrib["uid"]
        cui = summary.find("ConceptId").text
        genes = [g.text for g in summary.findall("ConceptMeta/AssociatedGenes/Gene")]
        sn = (
            [
                (
                    sc.attrib["SAUI"],
                    sc.text,
                    sc.attrib["SCUI"],
                    sc.attrib["SAB"],
                )
                for sc in summary.findall("ConceptMeta/SNOMEDCT/Name")
            ]
            if snomed
            else []
        )
        cf = (
            [
                (
                    c.attrib["CUI"],
                    c.find("SemanticType").text
                    if c.find("SemanticType") is not None
                    else "",
                    c.find("Name").text if c.find("Name") is not None else "",
                    c.find("Definition").text
                    if c.find("Definition") is not None
                    else "",
                )
                for c in summary.findall(
                    "ConceptMeta/ClinicalFeatures/ClinicalFeature"
                )
            ]
            if clinical_features
            else []
        )
        rows.append((uid, cui, genes, sn, cf))
    return rows


def parse_medgen(
    xml_df: DataFrame,
    xml_col: str = "xml",
    snomed: bool = True,
    clinical_features: bool = True,
) -> DataFrame:
    """Distributed S5: (..., xml) -> one MEDGEN_SCHEMA-shaped row per
    DocumentSummary, via Arrow-batched mapInPandas (the XML payloads never
    touch the driver — at 10^9 fetch responses the parse scales with the
    scan)."""
    src = xml_df.select(F.col(xml_col).alias("xml"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for xml in pdf["xml"]:
                rows.extend(
                    parse_medgen_records(
                        xml, snomed=snomed, clinical_features=clinical_features
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["uid", "CUI", "genes", "snomed", "clinical_features"],
            )

    return src.mapInPandas(fn, PARSED_SCHEMA)


# ---------------------------------------------------------------------------
# Oracle-gated round-trip query: build esummary XML from the documents table
# JVM-side, parse it with the real operator, and flatten — the DuckDB oracle
# computes the same fields straight from the source columns, so any parse
# defect (wrong path, attr/text mixup, missing-child default) breaks the
# value hash.
# ---------------------------------------------------------------------------

def xml_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic eSummaryResult per document row (fields derived
    from doc_id/text, all [a-z0-9 ] so no XML escaping is needed)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w1 = F.element_at(F.split("text", " "), 1)
    w2 = F.element_at(F.split("text", " "), 2)
    w3 = F.element_at(F.split("text", " "), 3)
    d = F.col("doc_id")
    xml = F.concat(
        F.lit('<eSummaryResult><DocumentSummarySet><DocumentSummary uid="'),
        d,
        F.lit('"><ConceptId>CN'),
        d,
        F.lit("</ConceptId><ConceptMeta><AssociatedGenes><Gene>G"),
        d % 50,
        F.lit("</Gene><Gene>H"),
        d % 7,
        F.lit('</Gene></AssociatedGenes><SNOMEDCT><Name SAUI="SA'),
        d,
        F.lit('" SCUI="SC'),
        d,
        F.lit('" SAB="SNOMEDCT_US">'),
        w1,
        F.lit('</Name></SNOMEDCT><ClinicalFeatures><ClinicalFeature CUI="CF'),
        d,
        F.lit('"><SemanticType>Finding</SemanticType><Name>'),
        w2,
        F.lit("</Name><Definition>"),
        w3,
        F.lit("</Definition></ClinicalFeature></ClinicalFeatures>"),
        F.lit("</ConceptMeta></DocumentSummary></DocumentSummarySet>"),
        F.lit("</eSummaryResult>"),
    )
    return docs.select(xml.alias("xml"))


def q_medgen_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_medgen(xml_from_documents(spark, sf_dir))
    return parsed.select(
        F.col("uid").cast("bigint").alias("uid"),
        "CUI",
        F.array_join("genes", "|").alias("genes"),
        F.element_at("snomed", 1)["SAUI"].alias("SAUI"),
        F.element_at("snomed", 1)["snomed_text"].alias("snomed_text"),
        F.element_at("snomed", 1)["SCUI"].alias("SCUI"),
        F.element_at("snomed", 1)["SAB"].alias("SAB"),
        F.element_at("clinical_features", 1)["CUI"].alias("cf_cui"),
        F.element_at("clinical_features", 1)["type"].alias("cf_type"),
        F.element_at("clinical_features", 1)["name"].alias("cf_name"),
        F.element_at("clinical_features", 1)["definition"].alias("cf_definition"),
    )


def sql_medgen_xml() -> str:
    return """
SELECT doc_id AS uid,
       'CN' || doc_id AS CUI,
       'G' || (doc_id % 50) || '|' || 'H' || (doc_id % 7) AS genes,
       'SA' || doc_id AS SAUI,
       split_part(text, ' ', 1) AS snomed_text,
       'SC' || doc_id AS SCUI,
       'SNOMEDCT_US' AS SAB,
       'CF' || doc_id AS cf_cui,
       'Finding' AS cf_type,
       split_part(text, ' ', 2) AS cf_name,
       split_part(text, ' ', 3) AS cf_definition
FROM documents
"""
