"""Cold vs memoized timings for the _KG_CACHE/_SS_CACHE-backed queries.

The bench suite runs queries in order inside one session, so queries that
consume the session-memoized substrates (relations.occ_cached /
doc_cui_cached / best_links_cached, simsearch._ss_cached) reuse a
localCheckpoint an earlier query paid for.  That reuse is legitimate
(materialized intermediates are how a production KG service would run),
but the suite numbers alone can't show what a FIRST query pays.  This
tool times each substrate consumer twice:

  cold:     both memo dicts cleared + catalog cache dropped, so the run
            replays the full NER -> link -> substrate lineage;
  memoized: substrate pre-warmed by an immediately preceding cold run.

Usage: python tools/bench_coldlane.py [sf_dir]   (defaults to sf0.1)
Emits a markdown table on stdout (paste into BENCH.md) plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from sparkmedkg import relations, simsearch  # noqa: E402
from sparkmedkg.session import get_spark  # noqa: E402

import bench  # noqa: E402

#: substrate consumers, a representative slice of each family
QUERIES = [
    "kg_relations",
    "kg_pagerank",
    "kg_pmi_edges",
    "kg_collocation_scores",
    "kg_edge_provenance",
    "kg_metapath_counts",
    "kg_random_walks",
    "kg_resnik_lin",
    "ann_graph_topk",
    "emb_knn_outliers",
]


def _clear_all(spark) -> None:
    relations._KG_CACHE.clear()
    simsearch._SS_CACHE.clear()
    spark.catalog.clearCache()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "sparkmedkg-coldlane",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JVM warmup as in bench.py, so cold != first-ever-JVM-query
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
        32 * cpus
    ).count()

    rows = []
    for name in QUERIES:
        fn = bench.BENCH_QUERIES[name]
        _clear_all(spark)
        t0 = time.time()
        fn(spark, sf_dir).count()
        cold = time.time() - t0
        # memoized: substrates are now warm from the cold run
        t0 = time.time()
        fn(spark, sf_dir).count()
        memo = time.time() - t0
        rows.append((name, round(cold, 3), round(memo, 3)))
        print(f"# {name}: cold={cold:.3f}s memo={memo:.3f}s",
              file=sys.stderr)

    print("| query | cold (s) | memoized (s) |")
    print("|---|---|---|")
    for name, cold, memo in rows:
        print(f"| {name} | {cold} | {memo} |")
    print(json.dumps({
        "metric": "coldlane",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "queries": {n: {"cold": c, "memo": m} for n, c, m in rows},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
