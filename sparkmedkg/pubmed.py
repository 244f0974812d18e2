"""StandardPubMedPipe semantics on nested paper structs (P1-P5).

The reference parses efetch XML into nested dicts and builds the
``pubmedPaper`` NodeTable row-by-row (basepipe.py:216-251, parser.py:48-124).
Here the nested shape is a StructType column tree read straight off the
table, and every per-row Python step becomes a built-in column expression:

- P1 id build:      ``'pubmed' ~ id`` with a fallback scan over the id list
  for the pubmed-typed entry (parser.py:48-77) -> ``filter``+``element_at``.
- P2 abstract join: ``' '.join(sections)``, missing -> '' (parser.py:79-87)
  -> ``array_join``+``coalesce``. THE byte-identical-text invariant.
- P3 title:         nested access (parser.py:90-91).
- P4 MeSH terms:    ``DescriptorName.title()`` per heading, missing -> []
  (parser.py:94-111) -> ``transform`` + title-case expression.
- P5 keywords:      flatten list-of-lists + title-case (parser.py:114-124).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

ID_SEP = "~"  # parser.py:48

# Nested shape mirroring the efetch paper dict (parser.py walks this).
PAPER_SCHEMA = StructType(
    [
        StructField(
            "MedlineCitation",
            StructType(
                [
                    StructField("PMID", StringType()),
                    StructField(
                        "Article",
                        StructType(
                            [
                                StructField("ArticleTitle", StringType()),
                                StructField(
                                    "Abstract",
                                    StructType(
                                        [
                                            StructField(
                                                "AbstractText",
                                                ArrayType(StringType()),
                                            )
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                    StructField(
                        "MeshHeadingList",
                        ArrayType(
                            StructType(
                                [StructField("DescriptorName", StringType())]
                            )
                        ),
                    ),
                    StructField(
                        "KeywordList", ArrayType(ArrayType(StringType()))
                    ),
                ]
            ),
        ),
        StructField(
            "PubmedData",
            StructType(
                [
                    StructField(
                        "ArticleIdList",
                        ArrayType(
                            StructType(
                                [
                                    StructField("IdType", StringType()),
                                    StructField("Id", StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


def title_case(col: Column) -> Column:
    """Python ``str.title()`` for space-separated words (the reference's
    ``.title()``, parser.py:101,124): first letter upper, rest lower.
    Matches ``initcap`` for single-space-separated text but is explicit
    about the lower-casing of the tail."""
    return F.array_join(
        F.transform(
            F.split(col, " "),
            lambda w: F.concat(
                F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, 2147483647))
            ),
        ),
        " ",
    )


def pubmed_id(paper: Column) -> Column:
    """P1 (parser.py:48-77): ``'pubmed~' + PMID``; when PMID is missing,
    scan the ArticleIdList for the entry with IdType='pubmed'."""
    fallback = F.element_at(
        F.filter(
            paper["PubmedData"]["ArticleIdList"],
            lambda e: e["IdType"] == F.lit("pubmed"),
        ),
        1,
    )["Id"]
    pmid = F.coalesce(paper["MedlineCitation"]["PMID"], fallback)
    return F.concat_ws(ID_SEP, F.lit("pubmed"), pmid)


def abstract_text(paper: Column) -> Column:
    """P2 (parser.py:79-87): ' '-join of abstract sections; missing -> ''.
    This join IS the byte-identical extracted-text invariant."""
    return F.coalesce(
        F.array_join(
            paper["MedlineCitation"]["Article"]["Abstract"]["AbstractText"], " "
        ),
        F.lit(""),
    )


def mesh_terms(paper: Column) -> Column:
    """P4 (parser.py:94-111): DescriptorName.title() per heading; missing
    list -> []."""
    return F.coalesce(
        F.transform(
            paper["MedlineCitation"]["MeshHeadingList"],
            lambda h: title_case(h["DescriptorName"]),
        ),
        F.array().cast("array<string>"),
    )


def keywords(paper: Column) -> Column:
    """P5 (parser.py:114-124): flatten KeywordList-of-lists, title-case."""
    return F.coalesce(
        F.transform(
            F.flatten(paper["MedlineCitation"]["KeywordList"]),
            title_case,
        ),
        F.array().cast("array<string>"),
    )


# ---------------------------------------------------------------------------
# Oracle-gated query: synthesize nested paper structs from the documents
# table (PMID missing on doc_id%3 -> exercises the P1 ArticleIdList fallback;
# title/mesh/keywords missing on %5/%7/%11 -> exercise the '' / [] defaults),
# run the REAL P1-P5 extractors over the struct tree, and flatten. The
# DuckDB oracle computes the expected fields straight from the flat columns.
# ---------------------------------------------------------------------------

def nested_papers_from_documents(spark, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F  # local alias for clarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source", "lang"
    )
    d = F.col("doc_id")
    pmid = F.when(d % 3 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("PM"), d)
    )
    article_ids = F.array(
        F.struct(F.lit("doi").alias("IdType"), F.concat(F.lit("D"), d).alias("Id")),
        F.struct(
            F.lit("pubmed").alias("IdType"), F.concat(F.lit("PMF"), d).alias("Id")
        ),
    )
    title = F.when(d % 5 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("study of "), F.col("source"))
    )
    mesh = F.when(
        d % 7 == 0,
        F.lit(None).cast("array<struct<DescriptorName:string>>"),
    ).otherwise(
        F.array(
            F.struct(F.col("source").alias("DescriptorName")),
            F.struct(F.lit("web corpus").alias("DescriptorName")),
        )
    )
    kws = F.when(
        d % 11 == 0, F.lit(None).cast("array<array<string>>")
    ).otherwise(F.array(F.array(F.col("source")), F.array(F.col("lang"))))
    paper = F.struct(
        F.struct(
            pmid.alias("PMID"),
            F.struct(
                title.alias("ArticleTitle"),
                F.struct(F.split("text", " ").alias("AbstractText")).alias(
                    "Abstract"
                ),
            ).alias("Article"),
            mesh.alias("MeshHeadingList"),
            kws.alias("KeywordList"),
        ).alias("MedlineCitation"),
        F.struct(article_ids.alias("ArticleIdList")).alias("PubmedData"),
    )
    return docs.select("doc_id", paper.alias("paper"))


def q_pubmed_paper(spark, sf_dir: str) -> DataFrame:
    """P1+P2+P3+P4+P5 over the synthesized nested structs — abstract is the
    byte-identical-text invariant (split/ajoin round-trip of ``text``)."""
    papers = nested_papers_from_documents(spark, sf_dir)
    p = F.col("paper")
    return papers.select(
        "doc_id",
        pubmed_id(p).alias("pubmedID"),
        F.coalesce(p["MedlineCitation"]["Article"]["ArticleTitle"], F.lit("")).alias(
            "title"
        ),
        abstract_text(p).alias("abstract"),
        F.array_join(mesh_terms(p), "|").alias("mesh"),
        F.array_join(keywords(p), "|").alias("kws"),
    )


def sql_pubmed_paper() -> str:
    tc = (
        "array_to_string(list_transform(string_split({0}, ' '), "
        "w -> upper(substring(w, 1, 1)) || lower(substring(w, 2))), ' ')"
    )
    return f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'pubmed~PMF' || doc_id
            ELSE 'pubmed~PM' || doc_id END AS pubmedID,
       CASE WHEN doc_id % 5 = 0 THEN ''
            ELSE 'study of ' || source END AS title,
       text AS abstract,
       CASE WHEN doc_id % 7 = 0 THEN ''
            ELSE {tc.format('source')} || '|' || 'Web Corpus' END AS mesh,
       CASE WHEN doc_id % 11 = 0 THEN ''
            ELSE {tc.format('source')} || '|' || {tc.format('lang')} END AS kws
FROM documents
"""


def pubmed_paper_table(
    papers: DataFrame,
    search_term: str,
    paper_col: str = "paper",
    with_mesh: bool = True,
) -> DataFrame:
    """The pubmedPaper NodeTable (basepipe.py:216-251): one row per paper
    with ``source`` = the search term and node_label = 'Paper'."""
    p = F.col(paper_col)
    cols = [
        pubmed_id(p).alias("pubmedID"),
        F.coalesce(
            p["MedlineCitation"]["Article"]["ArticleTitle"], F.lit("")
        ).alias("title"),
        abstract_text(p).alias("abstract"),
    ]
    if with_mesh:
        cols.append(mesh_terms(p).alias("MeSH"))
    cols += [
        F.lit(search_term).alias("source"),
        F.lit("Paper").alias("node_label"),
    ]
    return papers.select(*cols)
