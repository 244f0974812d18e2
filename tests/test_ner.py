"""Mention detection: trie matching, Schwartz-Hearst, per-doc dedup."""

from sparkmedkg import golden, ner


def test_schwartz_hearst_basic():
    m = ner.schwartz_hearst(
        "Phenylketonuria (PKU) is inherited. Later PKU recurs."
    )
    assert m == {"pku": "phenylketonuria"}


def test_schwartz_hearst_no_match():
    assert ner.schwartz_hearst("no abbreviation (XYZQW) here") == {}


def test_trie_longest_match():
    trie = ner.build_trie(
        [("seizure", "DISEASE"), ("seizure disorder", "DISEASE")]
    )
    found = ner.find_mentions("A seizure disorder may begin early.", trie)
    assert found == [("seizure disorder", "seizure disorder", "DISEASE")]


def test_trie_all_mode_overlaps():
    trie = ner.build_trie(
        [("seizure", "DISEASE"), ("seizure disorder", "DISEASE")]
    )
    found = ner.find_mentions("A seizure disorder may begin.", trie, mode="all")
    assert ("seizure", "seizure", "DISEASE") in found
    assert ("seizure disorder", "seizure disorder", "DISEASE") in found


def test_abbreviation_resolution_in_mentions():
    trie = ner.build_trie([("pku", "DISEASE"), ("phenylketonuria", "DISEASE")])
    found = ner.find_mentions(
        "Phenylketonuria (PKU) is inherited. PKU is rare.", trie
    )
    assert ("pku", "phenylketonuria", "DISEASE") in found


def test_mentions_match_golden(tables, gold):
    actual = {
        (r.url, r.mention, r.resolved, r.node_label)
        for r in tables["mentions"].collect()
    }
    p, r = golden.precision_recall(gold["mentions"], actual)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_mentions_lang_filtered(tables):
    # non-English docs must not produce mentions
    urls = {r.url for r in tables["mentions"].select("url").distinct().collect()}
    en_urls = {r.url for r in tables["papers"].select("url").collect()}
    assert urls <= en_urls


def test_jvm_lane_equals_python_lane(spark, docs, lkp):
    """detect_mentions_jvm must emit exactly the mapInPandas trie's rows
    in BOTH match modes (incl. Schwartz-Hearst-resolved abbreviations —
    the fixture corpus contains '(PKU)'-style patterns)."""
    bc = ner.broadcast_alias_index(spark, lkp["aliases"], lkp["concepts"])
    lex = ner.alias_label_df(spark, lkp["aliases"], lkp["concepts"])
    for mode in ("longest", "all"):
        py = {tuple(r) for r in ner.detect_mentions(docs, bc, mode=mode).collect()}
        jvm = {
            tuple(r)
            for r in ner.detect_mentions_jvm(docs, lex, mode=mode).collect()
        }
        assert py == jvm, (
            mode,
            sorted(py - jvm)[:5],
            sorted(jvm - py)[:5],
        )
