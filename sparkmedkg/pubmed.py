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
