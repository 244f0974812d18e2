"""Canonicalization: skew-aware dedup/counting + connected-components merge
over alias clusters (north_rule).

Hot CUIs (common drugs: the fixture's aspirin/ibuprofen/paracetamol appear in
~60% of docs) skew any groupBy/dropDuplicates on the mention/CUI key. Two
defenses, both plain DataFrame code:

- ``salted_counts``: explicit two-phase aggregation — partial count on
  (salt, key), final on (key). Spark's partial aggregation already does
  map-side combine for ``count``; the explicit salt matters for
  high-cardinality-payload aggs (collect_set/distinct) where map-side combine
  can't fully collapse the hot key.
- AQE skew-join splitting is enabled in session.py as the backstop.

Connected components: small-star/large-star-style iterated min-propagation
over the alias-sharing CUI graph (two CUIs connect when they share a surface
form). Deterministic: component id = min CUI string. Driver loop with
localCheckpoint per iteration to truncate lineage; O(log n) iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_counts(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count-by-key with an explicit salt column (A5 hardening)."""
    salt = (F.crc32(F.col(key).cast("string")) % n_salts).alias("_salt")
    partial = df.groupBy(F.col(key), salt).agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_distinct(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """Two-phase dropDuplicates: first within (salt, keys), then on keys."""
    with_salt = df.withColumn(
        "_salt", F.crc32(F.concat_ws("\x00", *[F.col(k) for k in keys])) % n_salts
    )
    phase1 = with_salt.dropDuplicates([*keys, "_salt"]).drop("_salt")
    return phase1.dropDuplicates(keys)


def alias_cluster_edges(aliases: DataFrame) -> DataFrame:
    """Edges (src, dst) between CUIs sharing a surface form (src < dst)."""
    a = aliases.select("alias", F.col("CUI").alias("src"))
    b = aliases.select("alias", F.col("CUI").alias("dst"))
    return (
        a.join(b, "alias")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def _driver_components(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Union-find on the driver for small graphs; component = min id."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    ids = [r["id"] for r in vertices.collect()]
    for v in ids:
        parent[v] = v
    for r in edges.select("src", "dst").collect():
        # matching the join loop: edges whose endpoints are not both known
        # vertices have no effect
        if r["src"] not in parent or r["dst"] not in parent:
            continue
        a, b = find(r["src"]), find(r["dst"])
        if a != b:
            # union by min: the root IS the min id, so component lookup
            # is just find()
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    rows = [(v, find(v)) for v in sorted(ids)]
    # preserve the caller's id type (string CUIs, bigint doc_ids, ...)
    from pyspark.sql.types import StructField, StructType

    id_type = vertices.schema["id"].dataType
    return vertices.sparkSession.createDataFrame(
        rows,
        StructType(
            [StructField("id", id_type), StructField("component", id_type)]
        ),
    )


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 20,
    n_partitions: int | None = 1,
    driver_threshold: int = 65536,
) -> DataFrame:
    """Min-label propagation to fixpoint.

    vertices: one column ``id``; edges: ``src``, ``dst`` (undirected).
    Returns (id, component) with component = min id reachable.

    ``n_partitions`` sizes the iteration's shuffles to the alias graph, which
    is orders of magnitude smaller than the corpus — running ~8 iterations x
    3 stages at corpus-sized parallelism is pure scheduler overhead. Pass
    None to inherit spark.sql.shuffle.partitions (huge alias graphs).

    Adaptive small-graph fast path: when the graph fits comfortably on the
    driver (|V|+|E| <= ``driver_threshold``), a driver-side union-find
    replaces the iterative join loop — identical output, one job instead of
    ~8 iterations x 2 actions. This mirrors production practice: alias-
    cluster graphs are KB-to-MB scale even when the corpus is 100 TB; the
    distributed loop remains the path for genuinely huge graphs (set
    ``driver_threshold=0`` to force it).
    """
    if driver_threshold:
        size = vertices.limit(driver_threshold + 1).count() + edges.limit(
            driver_threshold + 1
        ).count()
        if size <= driver_threshold:
            return _driver_components(vertices, edges)
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if n_partitions is not None:
        both = both.repartition(n_partitions, "src")
        vertices = vertices.repartition(n_partitions, "id")
    cc = vertices.select(F.col("id"), F.col("id").alias("component"))
    for _ in range(max_iter):
        # candidate component per node = min over neighbors' components
        msgs = (
            both.join(cc, both["src"] == cc["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_cc = (
            cc.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        new_cc = new_cc.localCheckpoint(eager=True)  # truncate lineage per iter
        changed = (
            new_cc.alias("n")
            .join(cc.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        cc = new_cc
        if changed == 0:
            break
    return cc


def cui_canonical_map(aliases: DataFrame) -> DataFrame:
    """(CUI, canonical_cui): connected components over alias clusters."""
    vertices = aliases.select(F.col("CUI").alias("id")).distinct()
    cc = connected_components(vertices, alias_cluster_edges(aliases))
    return cc.select(F.col("id").alias("CUI"), F.col("component").alias("canonical_cui"))
