"""Round-3 ANN-index + trend-audit batch: IVF-PQ composed search,
graph-ANN beam search, kNN-distance outliers, Mann-Kendall trend,
SCC feedback edges — independent brute-force Python twins at sf0.001
(the DuckDB oracle parity is covered by selfcheck / test_dtype_parity)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sparkmedkg import annplus, statops
from sparkmedkg.graphalgo import q_feedback_edges, q_scc
from sparkmedkg.simsearch import KNN_QK, knn_graph

SF = "/root/testdata/sf0.001"


def _vecs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {int(vid): [float(x) for x in emb] for vid, emb in rows}


def _qvec_py(v):
    return [int(math.floor(x * 1000 + 0.5)) for x in v]


def _unit_q_py(v):
    n = math.sqrt(sum(x * x for x in v))
    # Spark's round() on doubles is HALF_UP on the decimal string; for
    # these magnitudes python round-half-even only differs at exact .5
    # ties which the quantized test vectors don't hit at 2^15 scale.
    out = []
    for x in v:
        d = x / n * KNN_QK
        f = math.floor(d)
        frac = d - f
        if frac > 0.5 or (frac == 0.5 and True):
            out.append(int(f + 1))
        else:
            out.append(int(f))
    return out


def _d2(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


def test_ivfpq_rerank_is_exact_within_probed_cells(spark):
    """The final dist2 column must equal the exact integer L2 between the
    query and each returned vector, and every returned vector must belong
    to one of the query's probed coarse cells."""
    vecs = {vid: _qvec_py(v) for vid, v in _vecs().items()}
    qq = vecs[0]
    coarse = [(cid, vecs[cid]) for cid in range(1, annplus.IVFPQ_CELLS + 1)]
    probed = [
        cid
        for cid, _ in sorted(coarse, key=lambda t: (_d2(qq, t[1]), t[0]))[
            : annplus.IVFPQ_PROBE
        ]
    ]

    def cell_of(v):
        return min(coarse, key=lambda t: (_d2(v, t[1]), t[0]))[0]

    rows = annplus.ivfpq_topk(spark, SF).collect()
    assert len(rows) == annplus.IVFPQ_TOPK
    for r in rows:
        vid = int(r["vec_id"])
        assert vid != 0
        assert int(r["dist2"]) == _d2(qq, vecs[vid])
        assert int(r["cell"]) == cell_of(vecs[vid])
        assert int(r["cell"]) in probed
    # output is sorted by exact distance, ties on vec_id
    key = [(int(r["dist2"]), int(r["vec_id"])) for r in rows]
    assert key == sorted(key)


def test_graph_topk_matches_python_beam_unroll(spark):
    """Unroll the identical beam search in python over the Spark-produced
    kNN edge set and the unit-quantized vectors."""
    edges = defaultdict(list)
    for r in knn_graph(spark, SF).select("src", "dst").collect():
        edges[int(r["src"])].append(int(r["dst"]))
    uq = {
        int(r["vec_id"]): [int(x) for x in r["q"]]
        for r in annplus._cells(spark, SF).select("vec_id", "q").collect()
    }
    qq = uq[0]

    def dot(v):
        return sum(x * y for x, y in zip(v, qq))

    beam = [annplus.GANN_ENTRY]
    scores = {}
    for _ in range(annplus.GANN_STEPS):
        pool = set(beam)
        for b in beam:
            pool.update(edges.get(b, []))
        pool.discard(0)
        ranked = sorted(pool, key=lambda v: (-dot(uq[v]), v))[
            : annplus.GANN_BEAM
        ]
        beam = ranked
        scores = {v: dot(uq[v]) for v in ranked}
    want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[
        : annplus.GANN_K
    ]
    got = sorted(
        (
            (int(r["rnk"]), int(r["vec_id"]), int(r["dot_q"]))
            for r in annplus.graph_topk(spark, SF).collect()
        )
    )
    assert got == [
        (i + 1, vid, dq) for i, (vid, dq) in enumerate(want)
    ]


def test_knn_outliers_matches_edge_aggregate(spark):
    """mean_dot_micro must be the truncate-toward-zero integer division of
    the exact per-source dot sum over the Spark kNN edge set."""
    sums = defaultdict(int)
    cnts = Counter()
    for r in knn_graph(spark, SF).select("src", "dot_q").collect():
        sums[int(r["src"])] += int(r["dot_q"])
        cnts[int(r["src"])] += 1
    want = {}
    for s, tot in sums.items():
        n = cnts[s]
        scaled = 1_000_000 * tot
        md = scaled // n if scaled >= 0 else -((-scaled) // n)
        want[s] = (n, tot, md)
    rows = annplus.knn_outliers(spark, SF).collect()
    assert len(rows) == min(annplus.OUT_N, len(want))
    key = [(int(r["mean_dot_micro"]), int(r["vec_id"])) for r in rows]
    assert key == sorted(key)
    # the reported rows are exactly the global bottom-N by that key
    bottom = sorted(
        ((md, s) for s, (_, _, md) in want.items())
    )[: annplus.OUT_N]
    assert key == bottom
    for r in rows:
        n, tot, md = want[int(r["vec_id"])]
        assert (int(r["n_nbrs"]), int(r["sum_dot"]), int(r["mean_dot_micro"])) \
            == (n, tot, md)


def test_mann_kendall_matches_quadratic_definition(spark):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, epoch_us(ts) AS ts_us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    hours = defaultdict(Counter)
    for et, ts_us in rows:
        hours[et][int(ts_us) // statops.HOUR_US] += 1
    want = {}
    for et, c in hours.items():
        lo, hi = min(c), max(c)
        xs = [c.get(h, 0) for h in range(lo, hi + 1)]
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else (-1 if xs[j] < xs[i] else 0))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        tie18 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        if var18 > 0:
            num = float(s - 1 if s > 0 else (s + 1 if s < 0 else 0))
            z = round(num / math.sqrt(var18 / 18.0), 6)
        else:
            z = None
        want[et] = (n, s, var18, z)
    got = {
        r["event_type"]: (
            int(r["n_hours"]), int(r["s_stat"]), int(r["var18"]),
            None if r["z"] is None else float(r["z"]),
        )
        for r in statops.events_mann_kendall(spark, SF).collect()
    }
    assert got == want


def test_feedback_edges_are_exactly_intra_scc_edges(spark):
    scc = {
        r["cui"]: r["scc_id"] for r in q_scc(spark, SF).collect()
    }
    sizes = Counter(scc.values())
    from sparkmedkg.graphalgo import PR_MIN_DOCS, _scc_directed_edges

    dedges = [
        (r["src"], r["dst"])
        for r in _scc_directed_edges(spark, SF, PR_MIN_DOCS).collect()
    ]
    want = sorted(
        (s, d, scc[s], sizes[scc[s]])
        for s, d in dedges
        if scc[s] == scc[d]
    )
    got = sorted(
        (r["src"], r["dst"], r["scc_id"], int(r["scc_size"]))
        for r in q_feedback_edges(spark, SF).collect()
    )
    assert got == want
    assert len(want) > 0  # the orientation guarantees cyclic cores exist
    # every feedback edge sits in a component of size >= 2
    assert all(sz >= 2 for _, _, _, sz in got)
