"""End-to-end test of jobs/graph_analytics_job.py against a tiny
materialized graph: the emitted scorecards must match brute-force values
computed from the same edge list."""

from __future__ import annotations

import json
import math
from collections import defaultdict

from pyspark.sql import functions as F

from jobs.graph_analytics_job import main as job_main
from sparkmedkg.materialize import GraphStore

EDGES = [
    # two components: a 4-node SearchTerm/Gene cluster and a 2-node island
    ("SearchTerm", "flu", "CONTAINS", "Gene", "g1"),
    ("SearchTerm", "flu", "CONTAINS", "Gene", "g2"),
    ("SearchTerm", "cold", "CONTAINS", "Gene", "g1"),
    ("SearchTerm", "ache", "CONTAINS", "Gene", "g9"),
]
NODES = [
    ("SearchTerm", "flu", "{}"),
    ("SearchTerm", "cold", "{}"),
    ("SearchTerm", "ache", "{}"),
    ("Gene", "g1", "{}"),
    ("Gene", "g2", "{}"),
    ("Gene", "g9", "{}"),
]


def test_graph_analytics_job_end_to_end(spark, tmp_path):
    graph_dir = str(tmp_path / "graph")
    out_dir = str(tmp_path / "analytics")
    store = GraphStore(spark, graph_dir)
    store.merge_nodes(
        spark.createDataFrame(NODES, "node_label string, node_id string, props string")
    )
    store.merge_edges(
        spark.createDataFrame(
            EDGES,
            "src_label string, src_id string, pred string, "
            "dst_label string, dst_id string",
        )
    )
    assert job_main(["--graph", graph_dir, "--out", out_dir]) == 0

    deg = defaultdict(int)
    for s_l, s_i, _, d_l, d_i in EDGES:
        deg[f"{s_l}|{s_i}"] += 1
        deg[f"{d_l}|{d_i}"] += 1
    all_deg = sum(deg.values())

    hubs = {
        r["node"]: (r["deg"], r["pct_ppm"])
        for r in spark.read.parquet(f"{out_dir}/hubs.parquet").collect()
    }
    for node, d in deg.items():
        assert hubs[node] == (d, d * 1_000_000 // all_deg)

    dd = {
        r["bucket"]: r["n_nodes"]
        for r in spark.read.parquet(f"{out_dir}/degree_dist.parquet").collect()
    }
    want_dd = defaultdict(int)
    for d in deg.values():
        want_dd[math.floor(math.log2(d))] += 1
    assert dd == dict(want_dd)

    comps = spark.read.parquet(f"{out_dir}/components.parquet").collect()
    by_comp = defaultdict(set)
    for r in comps:
        by_comp[r["component"]].add(r["id"])
    groups = sorted(
        [tuple(sorted(v)) for v in by_comp.values()], key=lambda g: g[0]
    )
    assert groups == [
        ("Gene|g1", "Gene|g2", "SearchTerm|cold", "SearchTerm|flu"),
        ("Gene|g9", "SearchTerm|ache"),
    ]

    stats = spark.read.parquet(f"{out_dir}/schema_stats.parquet").collect()
    node_rows = {r["label"]: r["n_nodes"] for r in stats if r["kind"] == "node"}
    assert node_rows == {"SearchTerm": 3, "Gene": 3}
    edge_rows = {r["label"]: r["n_nodes"] for r in stats if r["kind"] == "edge"}
    assert edge_rows == {"SearchTerm-CONTAINS-Gene": 4}
