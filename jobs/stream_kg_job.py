"""spark-submit entry point: incremental streaming KG maintenance.

Usage:
    spark-submit --py-files sparkmedkg.zip jobs/stream_kg_job.py \
        --in /path/to/landing_dir --out /path/to/kg_state

Each invocation runs an ``availableNow`` pass over the landing directory:
only files that arrived since the previous invocation are processed (the
stream checkpoint under --out/checkpoint tracks progress), their docs go
through the full NER -> link -> select -> enrich -> triples pipeline, and
the results MERGE idempotently into the graph store under --out/graph.
Re-running with no new files is a no-op ("batches": []).  This is the
cron-driven deployment mode for continuous crawls: build_kg_job for the
initial bulk load, stream_kg_job for the incremental tail.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="input_dir", required=True,
                    help="landing directory of docs parquet drops")
    ap.add_argument("--out", required=True, help="KG state root")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sparkmedkg import fixtures, streaming
    from sparkmedkg.materialize import GraphStore
    from sparkmedkg.session import get_spark

    spark = get_spark(app_name="stream-kg", master=args.master)
    t0 = time.time()
    lkp = fixtures.lookups(spark)

    metrics = streaming.stream_kg_update(
        spark,
        args.input_dir,
        f"{args.out}/graph",
        f"{args.out}/checkpoint",
        lkp,
    )

    store = GraphStore(spark, f"{args.out}/graph")
    print(json.dumps({
        "batches": metrics,
        "nodes": store.read_nodes().count(),
        "edges": store.read_edges().count(),
        "wall_sec": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
