"""Entity linking + concept selection vs the golden oracle."""

import math

from sparkmedkg import golden


def test_links_match_golden(tables, gold):
    actual = {(r.source, r.CUI) for r in tables["links"].collect()}
    p, r = golden.precision_recall(set(gold["links"].keys()), actual)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_link_scores_match_golden(tables, gold):
    for row in tables["links"].collect():
        expected = gold["links"].get((row.source, row.CUI))
        assert expected is not None
        assert math.isclose(row.kb_score, expected[0], abs_tol=1e-9), (
            row.source,
            row.CUI,
            row.kb_score,
            expected[0],
        )
        assert row.name == expected[1]


def test_links_deduped(tables):
    df = tables["links"]
    assert df.count() == df.dropDuplicates(["CUI", "source"]).count()


def test_top_entities_match_golden(tables, gold):
    actual = [r.text for r in tables["top_entities"].collect()]
    assert actual == gold["top_entities"]


def test_selected_cuis_match_golden(tables, gold):
    actual = {r.CUI for r in tables["selected_cuis"].collect()}
    assert actual == gold["selected_cuis"]


def test_threshold_085_applied(tables):
    # every selected CUI must come from a link with score > 0.85
    links = {(r.source, r.CUI): r.kb_score for r in tables["links"].collect()}
    cuis = {r.CUI for r in tables["selected_cuis"].collect()}
    for cui in cuis:
        assert any(s > 0.85 for (src, c), s in links.items() if c == cui)
