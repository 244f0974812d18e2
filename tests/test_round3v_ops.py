"""Round-3 twenty-second-batch operators: Bloom FPR audit, TwoNN
intrinsic dimension, inter-event gap histogram — brute-force Python twins
at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from sparkmedkg import corpusops, relops, simsearch
from sparkmedkg.corpusops import BLOOM_K, BLOOM_M

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bloom_fpr_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    build = {
        hashlib.md5(r["text"].encode()).hexdigest()
        for r in docs
        if r["doc_id"] % 2 == 0
    }
    probe = {
        hashlib.md5(r["text"].encode()).hexdigest()
        for r in docs
        if r["doc_id"] % 2 == 1
    }

    def bits(fp):
        return {_h60(f"{fp}|{j}") % BLOOM_M for j in range(1, BLOOM_K + 1)}

    registers = set()
    for fp in build:
        registers |= bits(fp)
    n_fp = sum(
        1 for fp in probe if fp not in build and bits(fp) <= registers
    )
    row = corpusops.bloom_fpr(spark, SF).collect()[0]
    assert row["m_bits"] == BLOOM_M
    assert row["k_hashes"] == BLOOM_K
    assert row["n_build"] == len(build)
    assert row["n_probe"] == len(probe)
    assert row["n_set_bits"] == len(registers)
    assert row["n_false_pos"] == n_fp
    assert row["fpr_ppm"] == n_fp * 1_000_000 // len(probe)
    assert row["expected_fpr"] == round(
        (len(registers) / BLOOM_M) ** BLOOM_K, 6
    )


def test_intrinsic_dim_matches_knn_composition(spark):
    kg = simsearch.knn_graph(spark, SF).collect()
    two = defaultdict(dict)
    for r in kg:
        if r["rk"] <= 2:
            two[r["src"]][r["rk"]] = r["cos"]
    qs = []
    for src, d in two.items():
        if 2 not in d or d[1] >= 1.0:
            continue
        mu = (1.0 - d[2]) / (1.0 - d[1])
        qs.append(math.floor(math.log(mu) * 1_000_000 + 0.5))
    row = simsearch.intrinsic_dim(spark, SF).collect()[0]
    assert row["n_used"] == len(qs)
    assert row["sum_ln_mu_e6"] == sum(qs)
    assert row["id_est"] == round(len(qs) / (sum(qs) / 1_000_000.0), 6)
    # the estimate must be a plausible positive dimension, below ambient
    assert 0 < row["id_est"] < 128


def test_gap_histogram_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (r["ts"].replace(tzinfo=None), r["event_id"])
        )
    hist = defaultdict(lambda: [0, None, None])
    for evs in by_user.values():
        evs.sort()
        secs = [int(ts.timestamp()) for ts, _ in evs]
        for a, b in zip(secs, secs[1:]):
            gap = b - a
            bucket = math.floor(math.log2(gap + 1))
            h = hist[bucket]
            h[0] += 1
            h[1] = gap if h[1] is None else min(h[1], gap)
            h[2] = gap if h[2] is None else max(h[2], gap)
    got = {
        r["bucket"]: (r["n_gaps"], r["min_gap_sec"], r["max_gap_sec"])
        for r in relops.events_gap_histogram(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in hist.items()}
    # the profile must show both within-session and between-session modes
    assert len(got) >= 5
