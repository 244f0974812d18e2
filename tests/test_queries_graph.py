"""Graph analytics: searchTerms + n-hop intersection (A7/A8)."""

import pytest

from sparkmedkg import pipeline, queries
from sparkmedkg.ontology import TOPICS


@pytest.fixture(scope="module")
def graph(tables):
    return pipeline.all_nodes(tables).cache(), pipeline.triples(tables).cache()


def test_search_terms(graph):
    nodes, _ = graph
    terms = {r.search_term for r in queries.search_terms(nodes).collect()}
    assert terms == set(TOPICS)


def test_intersection_gene_level(graph, gold):
    _, edges = graph
    result = queries.intersection(edges, TOPICS, "Gene")
    vals = {(r.e1, r.e2): r.n_common for r in result.collect()}
    # reflexive: |reach ∩ reach| == |reach|
    for t in TOPICS:
        assert vals[(t, t)] > 0
    # symmetric
    for a in TOPICS:
        for b in TOPICS:
            assert vals[(a, b)] == vals[(b, a)]


def test_intersection_matches_bruteforce(graph, gold, tables):
    """Cross-check 2-hop DISEASE reach against a python recomputation."""
    _, edges = graph
    e = [
        (r.src_label, r.src_id, r.dst_label, r.dst_id)
        for r in edges.collect()
    ]
    # python: term -> papers -> disease mentions
    papers = {}
    for sl, s, dl, d in e:
        if sl == "SearchTerm":
            papers.setdefault(s, set()).add(d)
    reach = {t: set() for t in TOPICS}
    for sl, s, dl, d in e:
        if sl == "Paper" and dl == "DISEASE":
            for t, ps in papers.items():
                if s in ps:
                    reach[t].add(d)
    result = queries.intersection(edges, TOPICS, "DISEASE")
    vals = {(r.e1, r.e2): r.n_common for r in result.collect()}
    for a in TOPICS:
        for b in TOPICS:
            assert vals[(a, b)] == len(reach[a] & reach[b])


def test_intersection_unknown_level(graph):
    _, edges = graph
    with pytest.raises(ValueError, match="unknown knowledge graph label"):
        queries.intersection(edges, TOPICS, "Nope")


def test_connected_components_driver_equals_distributed(spark):
    import random

    from sparkmedkg import canon, fixtures

    # fixture alias graph
    aliases = fixtures.aliases_df(spark)
    v = aliases.select(aliases["CUI"].alias("id")).distinct()
    e = canon.alias_cluster_edges(aliases)
    fast = {(r["id"], r["component"])
            for r in canon.connected_components(v, e).collect()}
    slow = {(r["id"], r["component"])
            for r in canon.connected_components(v, e, driver_threshold=0).collect()}
    assert fast == slow and fast

    # random graph, fixed seed
    rng = random.Random(13)
    ids = [f"C{i:04d}" for i in range(60)]
    edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(45)]
    vdf = spark.createDataFrame([(i,) for i in ids], "id string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    fast = {(r["id"], r["component"])
            for r in canon.connected_components(vdf, edf).collect()}
    slow = {(r["id"], r["component"])
            for r in canon.connected_components(vdf, edf, driver_threshold=0).collect()}
    assert fast == slow


def test_intersection_unknown_term_fails_with_reference_message(graph):
    _, edges = graph
    with pytest.raises(ValueError) as ei:
        queries.intersection(edges, ["epilepsy", "notaterm"], "Gene")
    # neo4jconnector.py:285-291 message shape (list of missing terms)
    assert str(ei.value) == (
        "Passed search term '['notaterm']', which is not in Knowledge Graph."
    )


def test_intersection_unknown_level_fails(graph):
    _, edges = graph
    with pytest.raises(ValueError, match="Abort"):
        queries.intersection(edges, ["epilepsy"], "NotALevel")


def test_iceberg_seam_detection_and_merge_sql(spark):
    """The sandbox ships no Iceberg jars -> detection must be honest, and
    the MERGE INTO builders carry the exact upsert-key semantics of
    GraphStore.merge_nodes / merge_edges."""
    from sparkmedkg import materialize

    assert materialize.iceberg_available(spark) is False

    nsql = materialize.iceberg_merge_nodes_sql("kg.nodes")
    assert nsql.startswith("MERGE INTO kg.nodes t")
    assert "t.node_label = s.node_label AND t.node_id = s.node_id" in nsql
    assert nsql.endswith("WHEN NOT MATCHED THEN INSERT *")

    esql = materialize.iceberg_merge_edges_sql("kg.edges")
    for c in ("src_label", "src_id", "pred", "dst_label", "dst_id"):
        assert f"t.{c} = s.{c}" in esql
    assert "WHEN MATCHED" not in esql  # insert-if-absent only, no updates


def test_bucketed_graph_join_no_exchange(graph, spark, tmp_path):
    """The bucketed layout's edge->node hydration join must equal the plain
    join AND carry no Exchange in the physical plan (both sides read
    pre-hashed buckets)."""
    from sparkmedkg import materialize

    nodes, edges = graph
    materialize.write_bucketed_graph(
        spark, nodes, edges, str(tmp_path / "bg"), buckets=4, prefix="t_bkt"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the co-located sort-merge path is what runs
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = materialize.bucketed_expand_join(spark, prefix="t_bkt")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        got = {tuple(r) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    want = {
        tuple(r)
        for r in edges.join(
            nodes, edges["dst_id"] == nodes["node_id"]
        ).select(
            "src_label", "src_id", "pred", "dst_label", "dst_id", "node_label"
        ).collect()
    }
    assert got == want and got
