"""Kill-and-resume drill for the spark-submit KG job (VERDICT r4 task 7).

tests/test_checkpoint.py proves resume semantics at unit scale with a
SIMULATED crash (an injected exception between bucket groups); this drill
is the deployment-shaped version: run ``jobs/build_kg_job.py`` through
real ``spark-submit`` on an sf0.1-sized corpus, SIGKILL the JVM mid-run
(after the checkpoint log shows >= ``--kill-after`` completed buckets),
re-run with ``--resume``, and assert the final edge set is IDENTICAL to
an uninterrupted control run — byte-for-byte, via sorted row hashes.

Usage:
    python tools/crash_resume_drill.py [--docs N] [--buckets B]
        [--group-size G] [--kill-after K] [--workdir DIR]

Prints one JSON line:
    {"n_docs":..., "edges_control":..., "edges_resumed":...,
     "identical": true, "killed_after_buckets":...,
     "groups_control":..., "groups_resumed":..., ...}

Exit 0 iff the edge sets match and the resumed run did LESS work than the
control (skipped the completed buckets).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def spark_submit(args: list[str], pyzip: str) -> subprocess.Popen:
    cmd = [
        "spark-submit", "--master", "local[8]", "--driver-memory", "8g",
        "--py-files", pyzip, os.path.join(REPO, "jobs", "build_kg_job.py"),
    ] + args
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd=REPO,
    )


def done_buckets(markers: str) -> int:
    if not os.path.exists(markers):
        return 0
    n = 0
    with open(markers) as fh:
        for line in fh:
            try:
                if "bucket" in json.loads(line):
                    n += 1
            except Exception:
                continue
    return n


def edge_hash(spark, graph_dir: str) -> tuple[int, str]:
    from sparkmedkg.materialize import GraphStore

    edges = GraphStore(spark, graph_dir).read_edges()
    rows = sorted(tuple(str(c) for c in r) for r in edges.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(r).encode())
    return len(rows), h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=4)
    ap.add_argument("--kill-after", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/sparkmedkg_drill")
    args = ap.parse_args()

    from sparkmedkg import fixtures
    from sparkmedkg.session import get_spark

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    pyzip = os.path.join(wd, "sparkmedkg.zip")
    subprocess.run(
        ["zip", "-qr", pyzip, "sparkmedkg"], cwd=REPO, check=True
    )

    spark = get_spark("drill", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = os.path.join(wd, "docs.parquet")
    fixtures.docs_df_dist(spark, args.docs).write.mode("overwrite").parquet(
        docs_path
    )

    # control: uninterrupted run
    ctl_out = os.path.join(wd, "ctl")
    p = spark_submit(
        ["--docs", docs_path, "--out", ctl_out, "--buckets",
         str(args.buckets), "--group-size", str(args.group_size)], pyzip
    )
    ctl_stdout, _ = p.communicate()
    assert p.returncode == 0, f"control run failed rc={p.returncode}"
    ctl_summary = json.loads(ctl_stdout.strip().splitlines()[-1])

    # victim: SIGKILL once >= kill_after buckets are marked done
    vic_out = os.path.join(wd, "vic")
    markers = os.path.join(vic_out, "markers.jsonl")
    p = spark_submit(
        ["--docs", docs_path, "--out", vic_out, "--buckets",
         str(args.buckets), "--group-size", str(args.group_size)], pyzip
    )
    killed_at = None
    deadline = time.time() + 1800
    while p.poll() is None and time.time() < deadline:
        n = done_buckets(markers)
        if n >= args.kill_after:
            p.send_signal(signal.SIGKILL)
            killed_at = n
            break
        time.sleep(0.2)
    p.wait()
    assert killed_at is not None, (
        "job finished before the kill threshold; lower --kill-after or "
        "raise --docs"
    )

    # resume
    p = spark_submit(
        ["--docs", docs_path, "--out", vic_out, "--buckets",
         str(args.buckets), "--group-size", str(args.group_size),
         "--resume"], pyzip
    )
    res_stdout, _ = p.communicate()
    assert p.returncode == 0, f"resume run failed rc={p.returncode}"
    res_summary = json.loads(res_stdout.strip().splitlines()[-1])

    n_ctl, h_ctl = edge_hash(spark, f"{ctl_out}/graph")
    n_res, h_res = edge_hash(spark, f"{vic_out}/graph")
    identical = (n_ctl, h_ctl) == (n_res, h_res)
    out = {
        "n_docs": args.docs,
        "buckets": args.buckets,
        "group_size": args.group_size,
        "killed_after_buckets": killed_at,
        "edges_control": n_ctl,
        "edges_resumed": n_res,
        "edge_hash_match": identical,
        "groups_control": ctl_summary.get("groups"),
        "groups_resumed": res_summary.get("groups"),
        "resume_did_less_work": (
            (res_summary.get("groups") or 0) < (ctl_summary.get("groups") or 0)
        ),
    }
    print(json.dumps(out))
    ok = identical and out["resume_did_less_work"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
