"""Enrichment joins + explodes vs the golden oracle (E1-E4, J3-J4)."""

from sparkmedkg import golden


def test_genes_match_golden(tables, gold):
    actual = {(r.source, r.gene) for r in tables["genes"].collect()}
    assert actual == gold["genes"]


def test_snomed_match_golden(tables, gold):
    actual = {
        (r.source, r.SAUI, r.snomed_text, r.SCUI, r.SAB)
        for r in tables["snomed"].collect()
    }
    assert actual == gold["snomed"]


def test_clinical_features_match_golden(tables, gold):
    actual = {
        (r.source, r.CUI, r.type, r.name, r.definition)
        for r in tables["clinical_features"].collect()
    }
    assert actual == gold["clinical_features"]
    # empty-string default, never null (parser.py:36-42)
    assert all(r.definition is not None for r in tables["clinical_features"].collect())


def test_proteins_match_golden(tables, gold):
    actual = {(r.source, r.Entry) for r in tables["proteins"].collect()}
    assert actual == gold["proteins"]


def test_protein_name_shortened(tables):
    # name = everything before first '(' (uniprotpipe.py:77)
    for r in tables["proteins"].collect():
        assert "(" not in r.name
        assert r.ProteinNames.startswith(r.name.rstrip())
        assert r.uniProtUrl == f"https://www.uniprot.org/uniprotkb/{r.Entry}"


def test_substring_fallback_join(tables):
    # 'LR3' has no primary-gene row; must match P16473 via GeneNames contains
    rows = [r for r in tables["proteins"].collect() if r.source == "LR3"]
    assert [r.Entry for r in rows] == ["P16473"]


def test_go_match_golden(tables, gold):
    actual = {
        (r.source, r.name, r.GoID, r.GoType) for r in tables["go"].collect()
    }
    assert actual == gold["go"]


def test_go_malformed_segment_skipped(tables):
    # P07202's first mf segment has no '[' -> dropped; 'heme binding' kept
    rows = {
        (r.name, r.GoID)
        for r in tables["go"].collect()
        if r.source == "P07202" and r.GoType == "molecular function"
    }
    assert rows == {("heme binding", "GO:0020037")}


def test_strict_reference_flips_all_genes_to_containment(spark):
    """uniprotpipe.py:70-75: when ANY requested gene misses the primary
    set, the reference resolves ALL genes via GeneNames containment —
    fanning a primary-matched gene out to synonym rows. Default mode keeps
    exact matches exact."""
    from sparkmedkg import enrich, schemas

    cols = [f.name for f in schemas.UNIPROT_SCHEMA.fields]

    def row(entry, primary, names):
        base = {c: "" for c in cols}
        base.update(
            Entry=entry, GenePrimary=primary, GeneNames=names,
            ProteinNames=f"{entry} protein", Organism="Human",
        )
        return tuple(base[c] for c in cols)

    up = spark.createDataFrame(
        [row("P1", "AAA", "AAA BBB"), row("P2", "CCC", "CCC AAA")],
        schemas.UNIPROT_SCHEMA,
    )
    genes = spark.createDataFrame([("AAA",), ("ZZZ",)], "gene string")

    default = {
        (r["source"], r["Entry"])
        for r in enrich.proteins_table(genes, up).collect()
    }
    strict = {
        (r["source"], r["Entry"])
        for r in enrich.proteins_table(
            genes, up, strict_reference=True
        ).collect()
    }
    assert default == {("AAA", "P1")}
    assert strict == {("AAA", "P1"), ("AAA", "P2")}

    # all genes primary-matched: strict falls back to the exact rename path
    only_matched = spark.createDataFrame([("AAA",)], "gene string")
    strict2 = {
        (r["source"], r["Entry"])
        for r in enrich.proteins_table(
            only_matched, up, strict_reference=True
        ).collect()
    }
    assert strict2 == {("AAA", "P1")}
