"""P1-P5 nested-paper projections vs a Python oracle implementing the
reference's parser semantics (parser.py:48-124) directly."""

import pytest

from sparkmedkg import pubmed

PAPERS = [
    # full paper
    {
        "MedlineCitation": {
            "PMID": "100001",
            "Article": {
                "ArticleTitle": "Phenylketonuria in adults",
                "Abstract": {
                    "AbstractText": ["Background section.", "Methods part.", "Results!"]
                },
            },
            "MeshHeadingList": [
                {"DescriptorName": "phenylketonurias"},
                {"DescriptorName": "amino acid metabolism errors"},
            ],
            "KeywordList": [["inborn errors"], ["diet therapy", "phenylalanine"]],
        },
        "PubmedData": {"ArticleIdList": [{"IdType": "pubmed", "Id": "100001"}]},
    },
    # missing PMID -> fallback scan of ArticleIdList (parser.py:56-77)
    {
        "MedlineCitation": {
            "PMID": None,
            "Article": {
                "ArticleTitle": "DHPR deficiency",
                "Abstract": {"AbstractText": ["Single section."]},
            },
            "MeshHeadingList": None,
            "KeywordList": None,
        },
        "PubmedData": {
            "ArticleIdList": [
                {"IdType": "doi", "Id": "10.1/xyz"},
                {"IdType": "pubmed", "Id": "100002"},
            ]
        },
    },
    # missing abstract -> '' (parser.py:84-87); empty keyword lists
    {
        "MedlineCitation": {
            "PMID": "100003",
            "Article": {"ArticleTitle": "Letter", "Abstract": None},
            "MeshHeadingList": [{"DescriptorName": "case reports"}],
            "KeywordList": [[]],
        },
        "PubmedData": {"ArticleIdList": []},
    },
]


def _row(d):
    mc = d["MedlineCitation"]
    art = mc["Article"]
    abstract = art["Abstract"]
    return (
        (
            mc["PMID"],
            (
                art["ArticleTitle"],
                (abstract["AbstractText"],) if abstract else None,
            ),
            [(h["DescriptorName"],) for h in mc["MeshHeadingList"]]
            if mc["MeshHeadingList"] is not None
            else None,
            mc["KeywordList"],
        ),
        ([(e["IdType"], e["Id"]) for e in d["PubmedData"]["ArticleIdList"]],),
    )


@pytest.fixture(scope="module")
def papers_df(spark):
    rows = [(_row(d),) for d in PAPERS]
    from pyspark.sql.types import StructField, StructType

    return spark.createDataFrame(
        rows, StructType([StructField("paper", pubmed.PAPER_SCHEMA)])
    )


def oracle(d):
    """The reference parser, verbatim semantics."""
    mc = d["MedlineCitation"]
    pmid = mc["PMID"]
    if pmid is None:
        pmid = next(
            e["Id"]
            for e in d["PubmedData"]["ArticleIdList"]
            if e["IdType"] == "pubmed"
        )
    abstract = (
        " ".join(mc["Article"]["Abstract"]["AbstractText"])
        if mc["Article"]["Abstract"]
        else ""
    )
    mesh = (
        [h["DescriptorName"].title() for h in mc["MeshHeadingList"]]
        if mc["MeshHeadingList"] is not None
        else []
    )
    kws = (
        [k.title() for lst in mc["KeywordList"] for k in lst]
        if mc["KeywordList"] is not None
        else []
    )
    return {
        "pubmedID": f"pubmed~{pmid}",
        "title": mc["Article"]["ArticleTitle"],
        "abstract": abstract,
        "MeSH": mesh,
        "keywords": kws,
    }


def test_pubmed_paper_table_matches_oracle(spark, papers_df):
    out = pubmed.pubmed_paper_table(papers_df, "phenylketonurie").collect()
    assert len(out) == len(PAPERS)
    for row, d in zip(sorted(out, key=lambda r: r["pubmedID"]),
                      sorted(PAPERS, key=lambda d: oracle(d)["pubmedID"])):
        exp = oracle(d)
        assert row["pubmedID"] == exp["pubmedID"]
        assert row["title"] == exp["title"]
        assert row["abstract"] == exp["abstract"]          # P2 byte-identical
        assert list(row["MeSH"]) == exp["MeSH"]
        assert row["source"] == "phenylketonurie"
        assert row["node_label"] == "Paper"


def test_keywords_flatten_matches_oracle(spark, papers_df):
    from pyspark.sql import functions as F

    got = papers_df.select(pubmed.keywords(F.col("paper")).alias("k")).collect()
    for row, d in zip(got, PAPERS):
        assert list(row["k"]) == oracle(d)["keywords"]
