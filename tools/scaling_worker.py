"""One scaling measurement: run the KG pipeline at a given parallelism.

    python tools/scaling_worker.py <cores> <docs_parquet>

Prints one JSON line {cores, docs, wall_sec, docs_per_sec}. The timed region
is the full doc->triples pipeline action (NER -> linking -> selection ->
enrichment -> triple union); session startup and a JVM warmup action are
excluded, mirroring steady-state cluster throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    cores = int(sys.argv[1])
    docs_path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    # Pin this process (and the JVM + Python workers it forks, which inherit
    # the mask) to exactly `cores` CPUs. Without this, a local[2] JVM still
    # uses every host vCPU for GC / shuffle / Arrow-IPC threads, so the "2
    # core" level freeloads on spare capacity and the N->4N speedup is
    # understated. With the mask, each level is a true N-core machine —
    # the honest analogue of the north_rule's N vs 4N executor clusters.
    try:
        os.sched_setaffinity(0, set(range(cores)))
    except (AttributeError, OSError):
        pass  # non-Linux or restricted: fall back to unpinned

    from sparkmedkg import fixtures, pipeline
    from sparkmedkg.session import get_spark

    spark = get_spark(
        f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()  # warmup: JVM, codegen, parquet footer reads
    lkp = fixtures.lookups(spark)
    # warm up the Python worker pool too (mapInPandas forks one worker per
    # core on first use — pandas import cost must not pollute the timing)
    from sparkmedkg import ner

    bc = ner.broadcast_alias_index(spark, lkp["aliases"], lkp["concepts"])
    ner.detect_mentions(docs.limit(64 * cores), bc).count()

    wall = None
    for _ in range(reps):  # best-of-N: damp shared-hypervisor noise
        spark.catalog.clearCache()
        t0 = time.time()
        tables = pipeline.build_graph(spark, docs, lkp, alias_bc=bc)
        n_triples = pipeline.triples(tables).count()
        run = time.time() - t0
        wall = run if wall is None or run < wall else wall

    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "triples": n_triples,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
