"""spark-submit entry point: build the knowledge graph from a docs table.

Usage:
    spark-submit --py-files sparkmedkg.zip jobs/build_kg_job.py \
        --docs /path/to/docs.parquet --out /path/to/graph \
        [--buckets 16] [--group-size 8] [--resume]

Reads docs(url, warc_ts, html, text, lang), runs the checkpointed two-phase
pipeline (doc-parallel NER/linking, then global selection + enrichment), and
materializes label-partitioned nodes/edges under --out. Re-running with
--resume skips completed buckets (idempotent MERGE appends).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sparkmedkg import checkpoint, fixtures
    from sparkmedkg.materialize import GraphStore
    from sparkmedkg.session import get_spark

    spark = get_spark(app_name="build-kg", master=args.master)
    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    lkp = fixtures.lookups(spark)

    store = GraphStore(spark, f"{args.out}/graph")
    log = checkpoint.CheckpointLog(f"{args.out}/markers.jsonl")
    links = checkpoint.LinksStore(spark, f"{args.out}/links")
    if not args.resume and log.done_buckets():
        print("markers exist; pass --resume to continue or clean --out", file=sys.stderr)
        return 2

    summary = checkpoint.run_resumable(
        spark, docs, lkp, store, log, links,
        n_buckets=args.buckets, group_size=args.group_size,
    )
    checkpoint.finalize(spark, store, links, lkp)

    n_nodes = store.read_nodes().count()
    n_edges = store.read_edges().count()
    n_docs = docs.count()
    wall = time.time() - t0
    print(json.dumps({
        "docs": n_docs, "nodes": n_nodes, "edges": n_edges,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 2), **summary,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
