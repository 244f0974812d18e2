"""S5: MedGen eSummaryResult XML parsing — reference parity
(parser.py:4-45) including the unexpected-root RuntimeError, plus the
distributed mapInPandas round-trip against the fixture ontology."""

import pytest

from sparkmedkg import fixtures, medgenxml, ontology


def _xml_for(entries: dict) -> str:
    """Reference-shaped eSummaryResult for the given MEDGEN fixture
    entries (multiple DocumentSummary elements in one response)."""
    parts = ["<eSummaryResult><DocumentSummarySet>"]
    for uid, (cui, v) in enumerate(sorted(entries.items())):
        parts.append(f'<DocumentSummary uid="{uid}">')
        parts.append(f"<ConceptId>{cui}</ConceptId><ConceptMeta>")
        parts.append("<AssociatedGenes>")
        for g in v["genes"]:
            parts.append(f"<Gene>{g}</Gene>")
        parts.append("</AssociatedGenes><SNOMEDCT>")
        for saui, text, scui, sab in v["snomed"]:
            parts.append(
                f'<Name SAUI="{saui}" SCUI="{scui}" SAB="{sab}">{text}</Name>'
            )
        parts.append("</SNOMEDCT><ClinicalFeatures>")
        for cfc, typ, name, definition in v["clinical_features"]:
            parts.append(
                f'<ClinicalFeature CUI="{cfc}"><SemanticType>{typ}'
                f"</SemanticType><Name>{name}</Name>"
                + (f"<Definition>{definition}</Definition>" if definition else "")
                + "</ClinicalFeature>"
            )
        parts.append("</ClinicalFeatures></ConceptMeta></DocumentSummary>")
    parts.append("</DocumentSummarySet></eSummaryResult>")
    return "".join(parts)


def test_unexpected_root_raises():
    with pytest.raises(RuntimeError, match="Unexpected XML was passed."):
        medgenxml.parse_medgen_records("<wrong><inner/></wrong>")


def test_local_parse_matches_fixture_ontology():
    rows = medgenxml.parse_medgen_records(_xml_for(ontology.MEDGEN))
    by_cui = {r[1]: r for r in rows}
    assert set(by_cui) == set(ontology.MEDGEN)
    for cui, v in ontology.MEDGEN.items():
        _, _, genes, sn, cf = by_cui[cui]
        assert genes == list(v["genes"])
        assert sn == [tuple(s) for s in v["snomed"]]
        # missing <Definition> child -> '' (reference parser.py:42)
        assert cf == [
            (c, t, n, d if d else "") for c, t, n, d in v["clinical_features"]
        ]


def test_distributed_parse_matches_medgen_df(spark):
    # one multi-summary XML + the same entries split across rows: the
    # mapInPandas operator must emit the exact medgen_df row set either way
    whole = _xml_for(ontology.MEDGEN)
    split = [
        (_xml_for({cui: ontology.MEDGEN[cui]}),) for cui in ontology.MEDGEN
    ]
    expected = {
        (r["CUI"], tuple(r["genes"]))
        for r in fixtures.medgen_df(spark).collect()
    }
    for df in (
        spark.createDataFrame([(whole,)], "xml string"),
        spark.createDataFrame(split, "xml string"),
    ):
        parsed = medgenxml.parse_medgen(df)
        got = {
            (r["CUI"], tuple(r["genes"])) for r in parsed.collect()
        }
        assert got == expected


def test_distributed_parse_snomed_cf_columns(spark):
    df = spark.createDataFrame([(_xml_for(ontology.MEDGEN),)], "xml string")
    rows = {r["CUI"]: r for r in medgenxml.parse_medgen(df).collect()}
    v = ontology.MEDGEN["C0020550"]
    r = rows["C0020550"]
    assert [tuple(s) for s in r["snomed"]] == [tuple(s) for s in v["snomed"]]
    assert [tuple(c) for c in r["clinical_features"]] == [
        (c, t, n, d if d else "") for c, t, n, d in v["clinical_features"]
    ]
