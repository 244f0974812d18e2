"""Scaling-efficiency evidence (north_rule: >=0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the two cluster sizes are
evidenced as two parallelism levels of the identical job on the identical
input: local[2] vs local[8], a true 4x core ratio. The host is a 32-vCPU
Firecracker VM on a shared hypervisor — high thread counts see noisy-
neighbor steal, so the levels sit well below the contended capacity (and
match BASELINE.md's suggested local[2]/local[8]). Each level runs in a
fresh JVM via a subprocess; the levels are INTERLEAVED (2,8,2,8) and the
per-level minimum wall is reported, so slow drifts in host load hit both
levels symmetrically instead of whichever level happened to run last.
Each worker pins itself (sched_setaffinity) to exactly N CPUs so a level
cannot freeload on spare host cores for JVM GC/shuffle/Arrow threads —
making each level a true N-core machine.
The corpus is web-page-sized (30-80 sentences, ~3 KB extracted text per
doc — Common-Crawl-like), generated distributed via fixtures.docs_df_dist.

    python tools/bench_scaling.py [n_docs]

Prints one JSON line and rewrites BENCH.md with the measured table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch", "scaling")
LEVELS = (2, 8)


def ensure_corpus(n_docs: int) -> str:
    docs_path = os.path.join(SCRATCH, f"docs_web_{n_docs}.parquet")
    if not os.path.exists(docs_path):
        sys.path.insert(0, REPO)
        from sparkmedkg import fixtures
        from sparkmedkg.session import get_spark

        spark = get_spark("scaling-gen", master="local[16]")
        spark.sparkContext.setLogLevel("ERROR")
        fixtures.docs_df_dist(
            spark, n_docs, min_sent=30, max_sent=80, n_partitions=64
        ).write.mode("overwrite").parquet(docs_path)
        spark.stop()
    return docs_path


def _pyfiles_zip() -> str:
    """Package sparkmedkg once per invocation — the worker is launched
    through the real deployment interface (spark-submit --py-files), the
    north_rule's launch contract."""
    import zipfile

    os.makedirs(SCRATCH, exist_ok=True)
    zpath = os.path.join(SCRATCH, "sparkmedkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sparkmedkg")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_level(cores: int, docs_path: str, reps: int = 2) -> dict:
    # taskset pins the WHOLE process tree (driver JVM + forked Python
    # workers) to exactly `cores` CPUs — a setaffinity inside the Python
    # child would miss the already-running JVM under spark-submit.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         "spark-submit", "--master", f"local[{cores}]",
         "--driver-memory", "12g",
         "--py-files", _pyfiles_zip(),
         os.path.join(REPO, "tools", "scaling_worker.py"),
         str(cores), docs_path, str(reps)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    docs_path = ensure_corpus(n_docs)

    results: dict[int, dict] = {}
    # interleave levels 3x (best of 3 invocations x 2 in-process reps per
    # level): the shared hypervisor shows +/-15% transient slowdowns, and
    # the per-level minimum treats both levels symmetrically
    for c in (*LEVELS, *LEVELS, *LEVELS):
        r = run_level(c, docs_path)
        if c not in results or r["wall_sec"] < results[c]["wall_sec"]:
            results[c] = r
    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    speedup = lo["wall_sec"] / hi["wall_sec"]
    efficiency = round(speedup / (LEVELS[1] / LEVELS[0]), 3)

    summary = {
        "metric": "scaling_efficiency",
        "value": efficiency,
        "unit": f"speedup/{LEVELS[1] // LEVELS[0]}x-cores",
        "n_docs": n_docs,
        "levels": results,
        "speedup": round(speedup, 3),
    }
    print(json.dumps(summary))

    # preserve hand-maintained sections (per-query suite notes) that live
    # after the generated scaling block
    bench_path = os.path.join(REPO, "BENCH.md")
    tail = ""
    if os.path.exists(bench_path):
        prev = open(bench_path).read()
        idx = prev.find("\n## ")
        if idx != -1:
            tail = prev[idx:]
    with open(bench_path, "w") as fh:
        fh.write(
            "# BENCH — measured throughput + scaling efficiency\n\n"
            "Host: 32-vCPU VM (shared hypervisor), 125 GiB RAM; identical job "
            "(docs -> NER -> linking -> selection -> enrichment -> triples)\n"
            "on the identical synthesized corpus "
            f"({n_docs:,} docs, fixtures.docs_df seed=42), launched through "
            "the real deployment\ninterface (`spark-submit --master local[N] "
            "--py-files sparkmedkg.zip`, fresh JVM per level),\neach level "
            "CPU-pinned (taskset over the whole driver+worker tree) to "
            "exactly N cores so\nneither level freeloads on spare host "
            "capacity; timed "
            "region excludes session startup (steady-state throughput). The "
            "north_rule's\ntwo-cluster-size criterion is evidenced as two "
            "parallelism levels, a true 4x core ratio.\n\n"
            "| parallelism | wall (s) | docs/sec |\n|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {results[c]['wall_sec']} | "
                f"{results[c]['docs_per_sec']} |\n"
                for c in LEVELS
            )
            + f"\nSpeedup local[{LEVELS[0]}] -> local[{LEVELS[1]}]: "
            f"**{speedup:.2f}x** over a 4x core increase\n"
            f"-> scaling efficiency **{efficiency:.3f}** "
            f"(target >= 0.8, north_rule).\n\n"
            "Reference single-process baseline (BASELINE.md): ~3.5-4.6 "
            "docs/sec e2e,\n~13-60 abstracts/sec NER-only. See "
            "BENCH_r*.json for the per-query suite at sf0.1.\n"
            + tail
        )


if __name__ == "__main__":
    main()
