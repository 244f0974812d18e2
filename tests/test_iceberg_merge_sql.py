"""Shape tests for the Iceberg MERGE INTO builders (materialize.py).

The sandbox has no Iceberg runtime jar, so `iceberg_merge_nodes_sql` /
`iceberg_merge_edges_sql` have zero execution coverage — GraphStore
always takes the parquet anti-join fallback.  These tests pin the
statement shape so regressions in the string builders can't hide:

1. Spark's OWN SQL parser must parse each statement into a
   MergeIntoTable logical plan (real grammar, not a regex) — catches any
   syntax drift (DuckDB 1.0 in this sandbox has no MERGE, so Spark's
   parser is the authoritative grammar available).
2. Clause-level asserts pin the semantics: insert-if-absent only (no
   WHEN MATCHED action), DISTINCT-deduped source, and the exact key
   columns in the ON condition — matching GraphStore's anti-join
   fallback, whose behaviour IS executed and oracle-gated
   (kg_node_merge / kg_store_merge / kg_edge_integrity).
"""

from __future__ import annotations

import pytest

from sparkmedkg.materialize import (
    iceberg_merge_edges_sql,
    iceberg_merge_nodes_sql,
)

EDGE_KEYS = ["src_label", "src_id", "pred", "dst_label", "dst_id"]
NODE_KEYS = ["node_label", "node_id"]


def _parse(spark, sql: str):
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


@pytest.mark.parametrize(
    ("builder", "table", "view", "keys"),
    [
        (iceberg_merge_nodes_sql, "cat.db.nodes", "node_updates", NODE_KEYS),
        (iceberg_merge_edges_sql, "cat.db.edges", "edge_updates", EDGE_KEYS),
    ],
)
def test_merge_sql_parses_to_merge_plan(spark, builder, table, view, keys):
    sql = builder(table)
    plan = _parse(spark, sql)
    assert plan.getClass().getSimpleName() == "MergeIntoTable", (
        plan.getClass().getName()
    )
    plan_str = plan.toString()
    # one not-matched insert action, no matched/not-matched-by-source ones
    assert "notMatchedActions" in dir(plan) or "InsertStarAction" in plan_str

    # clause-level pins (insert-if-absent contract of the fallback path)
    assert sql.count("WHEN NOT MATCHED THEN INSERT *") == 1
    assert "WHEN MATCHED" not in sql
    assert "WHEN NOT MATCHED BY SOURCE" not in sql
    assert f"MERGE INTO {table} t" in sql
    assert f"USING (SELECT DISTINCT * FROM {view}) s" in sql
    for k in keys:
        assert f"t.{k} = s.{k}" in sql
    # the ON condition contains exactly the identity keys, nothing more
    on_line = next(ln for ln in sql.splitlines() if ln.startswith("ON "))
    assert on_line.count(" = ") == len(keys)


def test_merge_sql_custom_view_name(spark):
    sql = iceberg_merge_nodes_sql("c.d.nodes", updates_view="staged")
    assert "FROM staged) s" in sql
    assert _parse(spark, sql).getClass().getSimpleName() == "MergeIntoTable"


def test_merge_sql_keys_drive_the_executed_fallback(spark, tmp_path):
    """Tie the (never-executed) MERGE string to the (executed) fallback:
    replay insert-if-absent using the key columns PARSED OUT of the SQL's
    ON clause and assert the result equals what GraphStore.merge_nodes
    actually materializes.  If the string's keys ever drift from the
    fallback's, this fails without needing an Iceberg runtime."""
    import re

    from sparkmedkg import schemas
    from sparkmedkg.materialize import GraphStore

    sql = iceberg_merge_nodes_sql("cat.db.nodes")
    on_line = next(ln for ln in sql.splitlines() if ln.startswith("ON "))
    keys = re.findall(r"t\.(\w+) = s\.\1", on_line)
    assert keys, on_line

    base = [
        ("Gene", "g1", '{"sym":"A"}'),
        ("Disease", "d1", "{}"),
    ]
    updates = [
        ("Gene", "g1", '{"sym":"CHANGED"}'),  # matched -> must NOT insert
        ("Gene", "g2", "{}"),                 # new
        ("Gene", "g2", "{}"),                 # dup inside updates -> once
        ("Disease", "d2", "{}"),              # new
    ]
    store = GraphStore(spark, str(tmp_path / "g"))
    n0 = store.merge_nodes(
        spark.createDataFrame(base, schemas.NODES_SCHEMA)
    )
    upd = spark.createDataFrame(updates, schemas.NODES_SCHEMA)
    n1 = store.merge_nodes(upd)
    assert (n0, n1) == (2, 2)

    # replay MERGE semantics with the parsed keys
    tgt = spark.createDataFrame(base, schemas.NODES_SCHEMA)
    replayed = tgt.unionByName(
        upd.dropDuplicates().join(tgt, on=keys, how="left_anti")
    )
    got = {tuple(r) for r in store.read_nodes().collect()}
    want = {tuple(r) for r in replayed.collect()}
    assert got == want
    # matched row kept the TARGET's props (insert-if-absent, no update)
    assert ("Gene", "g1", '{"sym":"A"}') in got
