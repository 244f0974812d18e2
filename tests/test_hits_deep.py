"""HITS at iters>=3: exercises q_hits's lineage-truncation branch
(webgraph.py — localCheckpoint every 3rd round) against sql_hits(iters).
The driver gate only runs the default 2 iterations, so without this the
deep-run branch would be dead code.

Runs on a 40-doc slice of sf0.001 (full sf0.001 at 3 iterations is
~5 min across both engines — the graph shape, not the size, is what the
branch needs)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


@pytest.fixture(scope="module")
def tiny_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hits_tiny")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy("doc_id")
        .limit(40)
    )
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_hits_deep_matches_oracle(spark, tiny_dir):
    from sparkmedkg import webgraph

    iters = 3  # (i+1) % 3 == 0 fires the localCheckpoint branch
    sdf = webgraph.q_hits(spark, tiny_dir, iters=iters)
    srows = {r["host"]: (r["hub"], r["authority"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{tiny_dir}/documents.parquet/*.parquet'"
    )
    orows = {
        h: (hub, auth)
        for h, hub, auth in con.execute(
            webgraph.sql_hits(iters=iters)
        ).fetchall()
    }
    con.close()

    assert srows, "empty HITS result"
    assert set(srows) == set(orows)
    for h in srows:
        # round(6) outputs on both sides; allow 1-ulp-of-rounding slack.
        assert srows[h][0] == pytest.approx(orows[h][0], abs=2e-6), h
        assert srows[h][1] == pytest.approx(orows[h][1], abs=2e-6), h
