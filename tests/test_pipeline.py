"""End-to-end triples P/R, node tables, canonicalization, config parsing."""

import pytest

from sparkmedkg import config, golden, pipeline


def test_triples_pr_ge_095(tables, gold):
    actual = {tuple(r) for r in pipeline.triples(tables).collect()}
    p, r = golden.precision_recall(gold["triples"], actual)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_all_nodes_levels(tables):
    nodes = pipeline.all_nodes(tables)
    labels = {r.node_label for r in nodes.select("node_label").distinct().collect()}
    assert {
        "SearchTerm", "Paper", "DISEASE", "CHEMICAL", "UMLS",
        "Gene", "SnomedConcept", "ClinicalFeature", "Protein", "GO",
    } <= labels


def test_nodes_deduped(tables):
    nodes = pipeline.all_nodes(tables)
    assert nodes.count() == nodes.dropDuplicates(["node_label", "node_id"]).count()


def test_canonical_map_matches_golden(tables, gold):
    actual = {(r.CUI, r.canonical_cui) for r in tables["cui_canonical"].collect()}
    assert actual == set(gold["canonical"].items())


def test_canonical_merges_ambiguous_aliases(tables):
    m = dict(
        (r.CUI, r.canonical_cui) for r in tables["cui_canonical"].collect()
    )
    # 'mtx' is shared by methotrexate + mitoxantrone -> same component
    assert m["C0025598"] == m["C0026259"]
    # 'asa' shared by aspirin + mesalamine
    assert m["C0004057"] == m["C0002100"]
    # unrelated CUIs stay separate
    assert m["C0031485"] != m["C0014544"]


# ---- config parsing (manager.py:131-240 semantics) -----------------------

REQUEST = {
    "disease": "Phenylketonurie",
    "n_articles": 100,
    "pipelines": {
        "pubmed": {"run": True, "meshTerms": True},
        "ner": {"run": True, "entityLinks": True},
        "medGen": {"run": True, "Snomed": True},
        "uniProt": {"run": False},
    },
}


def test_parse_request_defaults():
    disease, cfg = config.parse_request(REQUEST)
    assert disease == "phenylketonurie"
    assert len(cfg["pipelines"]) == 3
    assert "uniProt" not in cfg["pipelines"]
    assert cfg["pipelines"]["medGen"]["clinicalFeatures"] is False
    assert cfg["delete_existing_graph"] is False


def test_parse_request_json_string():
    import json

    disease, _ = config.parse_request(json.dumps(REQUEST))
    assert disease == "phenylketonurie"


def test_parse_request_missing_args():
    with pytest.raises(RuntimeError, match=r"Missing *."):
        config.parse_request({"pipelines": {}})
    with pytest.raises(RuntimeError, match=r"Missing *."):
        config.parse_request({"disease": "x"})


def test_check_pipeline_hierarchy():
    config.check_pipeline(["pubmed", "ner", "medGen", "uniProt"])
    with pytest.raises(
        RuntimeError,
        match=r"Pipe 'medGen' is set in request but required predecessor pipe 'ner' is missing.",
    ):
        config.check_pipeline(["pubmed", "medGen"])
    with pytest.raises(
        RuntimeError,
        match=r"Pipe 'ner' is set in request but required predecessor pipe 'pubmed' is missing.",
    ):
        config.check_pipeline(["ner", "medGen"])


def test_empty_gene_set_gates_uniprot_stages(spark, docs, lkp):
    """manager.py:123-124: the UniProt pipe must be skipped entirely when
    the gene list is empty."""
    from pyspark.sql import functions as F

    from sparkmedkg import pipeline

    no_gene_lkp = dict(lkp)
    no_gene_lkp["medgen"] = lkp["medgen"].withColumn(
        "genes", F.array().cast("array<string>")
    )
    gated = pipeline.build_graph(
        spark, docs, no_gene_lkp, gate_empty_genes=True
    )
    assert "proteins" not in gated and "go" not in gated
    assert gated["genes"].count() == 0

    ungated = pipeline.build_graph(spark, docs, no_gene_lkp)
    assert "proteins" in ungated and "go" in ungated
    assert ungated["proteins"].count() == 0
