"""Graph analytics over the materialized nodes/edges tables.

Spark re-expressions of the reference's read endpoints:
- GET /searchTerms (neo4jconnector.py:258-265) -> label-pruned node scan
- GET /intersection (neo4jconnector.py:267-316) -> fixed-n-hop edge
  self-joins + pairwise set intersection (A7): the Cypher
  ``(s:SearchTerm)-[*n]->(x:Level)`` variable-length path becomes n chained
  equi-joins (n <= 6, known per level), then
  groupBy(term).collect_set(node) x pairs -> size(array_intersect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hop distance of each level from SearchTerm (neo4jconnector.py:275-284)
GRAPH_LEVEL_HOPS = {
    "DISEASE": 2,
    "CHEMICAL": 2,
    "UMLS": 3,
    "Gene": 4,
    "Protein": 5,
    "SnomedConcept": 4,
    "ClinicalFeature": 4,
    "GO": 6,
}


def search_terms(nodes: DataFrame) -> DataFrame:
    """All SearchTerm labels — partition-pruned scan on node_label."""
    return nodes.where(F.col("node_label") == "SearchTerm").select(
        F.col("node_id").alias("search_term")
    )


def n_hop_reach(edges: DataFrame, n: int, target_label: str) -> DataFrame:
    """(search_term, node_id): nodes of ``target_label`` exactly n hops from
    each SearchTerm. Iterated self-join of the edges table."""
    frontier = edges.where(F.col("src_label") == "SearchTerm").select(
        F.col("src_id").alias("term"),
        F.col("dst_label").alias("lbl"),
        F.col("dst_id").alias("node"),
    )
    for _ in range(n - 1):
        nxt = edges.select(
            F.col("src_label").alias("e_sl"),
            F.col("src_id").alias("e_s"),
            F.col("dst_label").alias("lbl2"),
            F.col("dst_id").alias("node2"),
        )
        frontier = (
            frontier.join(
                nxt,
                (frontier["lbl"] == nxt["e_sl"]) & (frontier["node"] == nxt["e_s"]),
            )
            .select(
                "term",
                F.col("lbl2").alias("lbl"),
                F.col("node2").alias("node"),
            )
            .distinct()
        )
    return (
        frontier.where(F.col("lbl") == target_label)
        .select("term", "node")
        .distinct()
    )


def intersection(
    edges: DataFrame,
    terms: list[str],
    level: str,
    validate_terms: bool = True,
) -> DataFrame:
    """Pairwise |reach(t1) ∩ reach(t2)| at ``level`` for the given terms
    (the /intersection endpoint). Returns (e1, e2, n_common).

    Like the reference endpoint (neo4jconnector.py:285-293), requested
    terms are validated against the SearchTerms actually in the graph and
    unknown terms fail with the reference's message (its 'fail' tuple
    becomes a ValueError here)."""
    if validate_terms:
        in_db = {
            r["t"]
            for r in edges.where(F.col("src_label") == "SearchTerm")
            .select(F.col("src_id").alias("t"))
            .distinct()
            .collect()
        }
        missing = [t for t in terms if t not in in_db]
        if missing:
            raise ValueError(
                "Passed search term '{term}', which is not in Knowledge "
                "Graph.".format(term=missing)
            )
    if level not in GRAPH_LEVEL_HOPS:
        raise ValueError(f"Passed unknown knowledge graph label: {level}. Abort.")
    reach = n_hop_reach(edges, GRAPH_LEVEL_HOPS[level], level).where(
        F.col("term").isin(terms)
    )
    sets = reach.groupBy("term").agg(F.collect_set("node").alias("nodes"))
    a = sets.select(F.col("term").alias("e1"), F.col("nodes").alias("n1"))
    b = sets.select(F.col("term").alias("e2"), F.col("nodes").alias("n2"))
    return (
        a.crossJoin(b)
        .select(
            "e1",
            "e2",
            F.size(F.array_intersect("n1", "n2")).alias("n_common"),
        )
        .orderBy("e1", "e2")
    )
