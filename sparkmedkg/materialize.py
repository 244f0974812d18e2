"""Graph materialization: partitioned nodes/edges tables.

Replaces the reference's Neo4j ``UNWIND ... MERGE`` sink
(neo4jconnector.py:131-221) with label-partitioned columnar tables:

- MERGE-by-id upsert  -> dropDuplicates(id) + idempotent anti-join append
  (S8); re-running a partition cannot duplicate rows.
- edge MATCH-both-endpoints (S9) -> two left_semi joins for referential
  integrity before append (J5).
- 2000-row UNWIND batches (S10) -> per-partition writes; telemetry becomes
  explicit metrics rows (checkpoint.py).

Writer seam: on an Iceberg-enabled cluster the same contract maps onto
catalog tables — ``iceberg_available`` detects the runtime and
``iceberg_merge_nodes_sql`` / ``iceberg_merge_edges_sql`` build the exact
MERGE INTO statements the upsert becomes there (one atomic snapshot commit
instead of anti-join + append).  This sandbox ships no Iceberg jars, so
``GraphStore`` executes the partitioned-parquet layout with identical
semantics; the SQL builders are unit-tested as strings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkmedkg import schemas


def nodes_from(df: DataFrame, label_col: str, id_col: str, prop_cols: list[str]) -> DataFrame:
    """Project any NodeTable-shaped DF into the canonical nodes schema,
    deduped by (label, id) — the MERGE semantics of S8."""
    props = (
        F.to_json(F.struct(*[F.col(c) for c in prop_cols]))
        if prop_cols
        else F.lit("{}")
    )
    return (
        df.select(
            F.col(label_col).alias("node_label"),
            F.col(id_col).cast("string").alias("node_id"),
            props.alias("props"),
        )
        .dropDuplicates(["node_label", "node_id"])
    )


def edges_from(
    df: DataFrame,
    src_label,
    src_col: str,
    dst_label,
    dst_col: str,
    pred: str = "CONTAINS",
    dedup: bool = True,
) -> DataFrame:
    """One CONTAINS edge per row (§1.3 triple contract). ``src_label`` /
    ``dst_label`` may be a literal string or a Column. Pass ``dedup=False``
    when the caller dedups a union of several edge sets in one shuffle."""
    sl = F.lit(src_label) if isinstance(src_label, str) else src_label
    dl = F.lit(dst_label) if isinstance(dst_label, str) else dst_label
    out = df.select(
        sl.alias("src_label"),
        F.col(src_col).cast("string").alias("src_id"),
        F.lit(pred).alias("pred"),
        dl.alias("dst_label"),
        F.col(dst_col).cast("string").alias("dst_id"),
    )
    return out.dropDuplicates() if dedup else out


def integrity_filter(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """J5/S9: keep only edges whose both endpoints exist in ``nodes``."""
    keys = nodes.select(
        F.col("node_label").alias("_l"), F.col("node_id").alias("_i")
    ).distinct()
    e = edges.join(
        keys,
        (edges["src_label"] == keys["_l"]) & (edges["src_id"] == keys["_i"]),
        "left_semi",
    )
    return e.join(
        keys,
        (e["dst_label"] == keys["_l"]) & (e["dst_id"] == keys["_i"]),
        "left_semi",
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session's classpath.
    Callers that want catalog-table semantics check this and run the
    ``iceberg_merge_*_sql`` statements; otherwise GraphStore's parquet
    layout provides the same MERGE semantics."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def iceberg_merge_nodes_sql(table: str, updates_view: str = "node_updates") -> str:
    """The Iceberg MERGE INTO equivalent of ``GraphStore.merge_nodes``
    (insert-if-absent on the (node_label, node_id) key; one atomic snapshot
    commit replaces the anti-join + append)."""
    return (
        f"MERGE INTO {table} t\n"
        f"USING (SELECT DISTINCT * FROM {updates_view}) s\n"
        "ON t.node_label = s.node_label AND t.node_id = s.node_id\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def iceberg_merge_edges_sql(table: str, updates_view: str = "edge_updates") -> str:
    """MERGE INTO equivalent of ``GraphStore.merge_edges`` (all five edge
    key columns form the identity, matching the reference's
    MERGE-by-all-attrs semantics, neo4jconnector.py:140-143)."""
    on = " AND ".join(
        f"t.{c} = s.{c}"
        for c in ("src_label", "src_id", "pred", "dst_label", "dst_id")
    )
    return (
        f"MERGE INTO {table} t\n"
        f"USING (SELECT DISTINCT * FROM {updates_view}) s\n"
        f"ON {on}\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


class GraphStore:
    """Label-partitioned node/edge store with idempotent MERGE-style appends
    over partitioned parquet (this sandbox has no Iceberg runtime — see
    ``iceberg_available`` / ``iceberg_merge_*_sql`` for the catalog-table
    mapping used on Iceberg-enabled clusters). Partitioning by
    ``node_label``/``dst_label`` gives partition pruning on label-filtered
    reads (the reference's per-label upload loops, neo4jconnector.py:68-94).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.nodes_path = os.path.join(root, "nodes")
        self.edges_path = os.path.join(root, "edges")

    def _exists(self, path: str) -> bool:
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(conf).exists(p)

    def read_nodes(self) -> DataFrame:
        if not self._exists(self.nodes_path):
            return self.spark.createDataFrame([], schemas.NODES_SCHEMA)
        # partition column comes back last on read: restore canonical order
        return self.spark.read.parquet(self.nodes_path).select(
            *[f.name for f in schemas.NODES_SCHEMA.fields]
        )

    def read_edges(self) -> DataFrame:
        if not self._exists(self.edges_path):
            return self.spark.createDataFrame([], schemas.EDGES_SCHEMA)
        return self.spark.read.parquet(self.edges_path).select(
            *[f.name for f in schemas.EDGES_SCHEMA.fields]
        )

    def merge_nodes(self, nodes: DataFrame) -> int:
        """Idempotent upsert: append only (label, id) pairs not yet present."""
        nodes = nodes.dropDuplicates(["node_label", "node_id"])
        if self._exists(self.nodes_path):
            existing = self.read_nodes().select("node_label", "node_id")
            nodes = nodes.join(existing, ["node_label", "node_id"], "left_anti")
        nodes = nodes.persist()
        n = nodes.count()
        if n:
            nodes.write.mode("append").partitionBy("node_label").parquet(self.nodes_path)
        nodes.unpersist()
        return n

    def merge_edges(self, edges: DataFrame) -> int:
        edges = edges.dropDuplicates()
        if self._exists(self.edges_path):
            existing = self.read_edges()
            edges = edges.join(
                existing,
                ["src_label", "src_id", "pred", "dst_label", "dst_id"],
                "left_anti",
            )
        edges = edges.persist()
        n = edges.count()
        if n:
            edges.write.mode("append").partitionBy("dst_label").parquet(self.edges_path)
        edges.unpersist()
        return n

    def reset(self) -> None:
        """S11: MATCH (n) DETACH DELETE n analogue."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Bucketed (co-located) layout: the shuffle-free join path.
# ---------------------------------------------------------------------------

def write_bucketed_graph(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    root: str,
    buckets: int = 8,
    prefix: str = "kg",
) -> None:
    """Materialize nodes/edges as EXTERNAL BUCKETED tables (hash-bucketed +
    sorted on the join key: ``node_id`` / ``dst_id``), so every downstream
    edge->node join — integrity checks, n-hop expansion, attribute
    hydration — reads pre-hashed, pre-sorted buckets and needs NO shuffle
    on either side.

    This is the parquet-catalog analogue of Iceberg's ``bucket(N, col)``
    partition transform: at 10^12 edges the expansion join is THE dominant
    shuffle of every graph query, and bucketing moves that cost to write
    time, once, instead of per query.  Both tables must use the same bucket
    count (Spark only co-locates matching bucket specs)."""
    (
        nodes.write.bucketBy(buckets, "node_id")
        .sortBy("node_id")
        .option("path", os.path.join(root, "nodes_bucketed"))
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{prefix}_nodes_bucketed")
    )
    (
        edges.write.bucketBy(buckets, "dst_id")
        .sortBy("dst_id")
        .option("path", os.path.join(root, "edges_bucketed"))
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{prefix}_edges_bucketed")
    )


def bucketed_expand_join(spark: SparkSession, prefix: str = "kg") -> DataFrame:
    """Edge -> destination-node attribute hydration over the bucketed
    layout: joins bucket-to-bucket with no Exchange (asserted in
    tests/test_queries_graph.py)."""
    n = spark.table(f"{prefix}_nodes_bucketed")
    e = spark.table(f"{prefix}_edges_bucketed")
    return e.join(n, e["dst_id"] == n["node_id"]).select(
        "src_label", "src_id", "pred", "dst_label", "dst_id", "node_label"
    )
