"""Oracle-gated queries for the graph-materialization operator family.

These put the S8/S9/J5/J2/A6 operators — previously pytest-verified only —
under the driver's DuckDB value-hash gate by deriving both batches and the
expected result from the ``documents`` table:

- ``q_node_merge``:  pure MERGE-upsert semantics (S8) — first-writer-wins
  by key, via the same anti-join shape GraphStore uses.
- ``q_store_merge``: the REAL GraphStore write path (S8+A6+S11): reset,
  two merges with overlapping keys, an idempotent re-merge, read back from
  the label-partitioned parquet layout.
- ``q_edge_integrity``: J5/S9 — edges survive only when BOTH endpoints
  exist in the nodes table (dangling src for non-en docs, dangling dst for
  the synthetic '-x' terms).
- ``q_selected_cuis_semijoin``: J2/S7 — the ``use_medgen_set`` path
  (medgen.py:148-150 / mim2gene CUI set, SURVEY S7) over the web lexicon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import select, webkg
from sparkmedkg.materialize import GraphStore, edges_from, integrity_filter


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def merge_batches(existing: DataFrame, incoming: DataFrame,
                  keys: list[str]) -> DataFrame:
    """S8 MERGE-by-key upsert as a pure DataFrame op: keep every existing
    row; admit incoming rows only for unseen keys (the reference's Neo4j
    ``MERGE (n {id: ...})`` no-op-on-match semantics, neo4jconnector.py:
    131-221). Same anti-join shape as GraphStore.merge_nodes."""
    fresh = incoming.dropDuplicates(keys).join(existing, keys, "left_anti")
    return existing.unionByName(fresh)


def q_node_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    b1 = docs.where(F.col("doc_id") % 2 == 0).select(
        F.lit("Paper").alias("node_label"),
        F.col("doc_id").cast("string").alias("node_id"),
        F.lit("v1").alias("props"),
    )
    b2 = docs.select(
        F.lit("Paper").alias("node_label"),
        F.col("doc_id").cast("string").alias("node_id"),
        F.lit("v2").alias("props"),
    )
    return merge_batches(b1, b2, ["node_label", "node_id"])


def sql_node_merge() -> str:
    return """
WITH b1 AS (
  SELECT 'Paper' AS node_label, doc_id::VARCHAR AS node_id, 'v1' AS props
  FROM documents WHERE doc_id % 2 = 0
)
SELECT * FROM b1
UNION ALL
SELECT 'Paper', doc_id::VARCHAR, 'v2' FROM documents
WHERE doc_id::VARCHAR NOT IN (SELECT node_id FROM b1)
"""


def q_store_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the real label-partitioned store: merge batch1 (Paper
    nodes, even ids), then batch2 (all Papers + Term nodes — only odd
    Papers and the Terms are new), then batch2 AGAIN (idempotency: adds 0
    rows), and read back."""
    import tempfile

    docs = _docs(spark, sf_dir)
    store = GraphStore(spark, tempfile.mkdtemp(prefix="sparkmedkg_gate_"))
    store.reset()
    b1 = docs.where(F.col("doc_id") % 2 == 0).select(
        F.lit("Paper").alias("node_label"),
        F.col("doc_id").cast("string").alias("node_id"),
        F.lit("v1").alias("props"),
    )
    papers2 = docs.select(
        F.lit("Paper").alias("node_label"),
        F.col("doc_id").cast("string").alias("node_id"),
        F.lit("v2").alias("props"),
    )
    terms = docs.select(
        F.lit("Term").alias("node_label"),
        F.col("source").alias("node_id"),
        F.lit("v2").alias("props"),
    ).distinct()
    b2 = papers2.unionByName(terms)
    store.merge_nodes(b1)
    store.merge_nodes(b2)
    n3 = store.merge_nodes(b2)  # idempotent re-run
    assert n3 == 0, f"re-merge must be a no-op, added {n3}"
    return store.read_nodes()


def sql_store_merge() -> str:
    return """
WITH b1 AS (
  SELECT 'Paper' AS node_label, doc_id::VARCHAR AS node_id, 'v1' AS props
  FROM documents WHERE doc_id % 2 = 0
),
b2 AS (
  SELECT 'Paper' AS node_label, doc_id::VARCHAR AS node_id, 'v2' AS props
  FROM documents
  UNION
  SELECT 'Term', source, 'v2' FROM documents
)
SELECT * FROM b1
UNION ALL
SELECT * FROM b2
WHERE NOT EXISTS (SELECT 1 FROM b1
                  WHERE b1.node_label = b2.node_label
                    AND b1.node_id = b2.node_id)
"""


def q_edge_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    nodes = (
        docs.where(F.col("lang") == "en")
        .select(
            F.lit("Paper").alias("node_label"),
            F.col("doc_id").cast("string").alias("node_id"),
        )
        .unionByName(
            docs.select(
                F.lit("Term").alias("node_label"),
                F.col("source").alias("node_id"),
            ).distinct()
        )
    )
    good = edges_from(docs, "Paper", "doc_id", "Term", "source", dedup=False)
    dangling_dst = edges_from(
        docs.where(F.col("doc_id") % 10 == 0).withColumn(
            "bad", F.concat(F.col("source"), F.lit("-x"))
        ),
        "Paper",
        "doc_id",
        "Term",
        "bad",
        dedup=False,
    )
    return integrity_filter(good.unionByName(dangling_dst), nodes)


def sql_edge_integrity() -> str:
    return """
SELECT 'Paper' AS src_label, doc_id::VARCHAR AS src_id, 'CONTAINS' AS pred,
       'Term' AS dst_label, source AS dst_id
FROM documents WHERE lang = 'en'
"""


def q_selected_cuis_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/S7: high-score link CUIs semi-joined against the gene-bearing
    concept set (here: the DATASTRUCT half of the web lexicon plays the
    mim2gene CUI set)."""
    links = webkg._links_raw(spark, sf_dir)
    gene_cuis = spark.createDataFrame(
        [(c[0],) for c in webkg.WEB_CONCEPTS if c[3] == "DATASTRUCT"],
        "CUI string",
    )
    return select.selected_cuis_semijoin(links, gene_cuis)


def sql_selected_cuis_semijoin() -> str:
    ids = ", ".join(
        f"'{c[0]}'" for c in webkg.WEB_CONCEPTS if c[3] == "DATASTRUCT"
    )
    return f"""
WITH {webkg.sql_aliases_cte()},
read_docs AS (SELECT * FROM documents WHERE lang = 'en'),
{webkg._links_cte().lstrip()}
SELECT DISTINCT cui AS CUI FROM links
WHERE kb_score > 0.85 AND cui IN ({ids})
"""
