"""Round-3 twenty-sixth-batch operators: spectral bisection (integer
Fiedler power iteration), mojibake audit — brute-force Python twins at
sf0.001."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from sparkmedkg import graphalgo, textstats
from sparkmedkg.graphalgo import SPEC_ITERS, SPEC_Q

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sdiv(a: int, b: int) -> int:
    """Sign-split truncating division (matches div on the magnitude)."""
    return -(abs(a) // b) if a < 0 else abs(a) // b


def test_spectral_bisection_matches_integer_iteration(spark):
    edges = graphalgo._edges(spark, SF, 2).collect()
    adj = defaultdict(list)
    for r in edges:
        adj[r["src"]].append(r["dst"])
    deg = {v: len(n) for v, n in adj.items()}
    n = len(deg)
    dmax = max(deg.values())
    v = {x: ((_h60(x) % 2) * 2 - 1) * SPEC_Q for x in deg}
    for _ in range(SPEC_ITERS):
        u = {
            x: (dmax - deg[x]) * v[x] + sum(v[y] for y in adj[x])
            for x in deg
        }
        su = sum(u.values())
        mean = _sdiv(su, n)
        uc = {x: ux - mean for x, ux in u.items()}
        m = max(max(abs(x) for x in uc.values()), 1)
        # FLOOR(ABS(u) * Q / m) goes through an IEEE double in both
        # engines; mirror that here
        v = {
            x: (0 if ux == 0 else (1 if ux > 0 else -1))
            * int(abs(ux) * SPEC_Q / m)
            for x, ux in uc.items()
        }
    got = {
        r["CUI"]: (r["v"], r["side"])
        for r in graphalgo.q_spectral_bisection(spark, SF).collect()
    }
    assert got == {x: (vx, vx >= 0) for x, vx in v.items()}
    # a bisection must actually split the graph into two non-empty sides
    sides = {s for _, s in got.values()}
    assert sides == {True, False}


def test_mojibake_audit_clean_corpus_and_detectors_fire(spark):
    row = textstats.mojibake_audit(spark, SF).collect()[0]
    assert row["n_docs"] > 0
    # the synthetic corpus is clean ASCII by construction
    assert row["n_replacement_docs"] == 0
    assert row["n_control_docs"] == 0
    assert row["n_nonascii_docs"] == 0
    assert row["replacement_ppm"] == 0

    # inject damaged rows through the SAME expressions to prove the
    # detectors fire
    bad = spark.createDataFrame(
        [
            (1, "clean text"),
            (2, "broken � here"),
            (3, "binary \x01 bleed"),
            (4, "café au lait"),
        ],
        "doc_id bigint, text string",
    )
    repl = F.col("text").contains("�")
    ctrl = F.col("text").rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]")
    nonascii = F.col("text").rlike("[^\\x00-\\x7f]")
    r = bad.agg(
        F.sum(repl.cast("int")).alias("r"),
        F.sum(ctrl.cast("int")).alias("c"),
        F.sum(nonascii.cast("int")).alias("na"),
    ).collect()[0]
    assert (r["r"], r["c"]) == (1, 1)
    assert r["na"] == 2  # U+FFFD and café (the \x01 row is still ASCII)


def test_props_profile_matches_bruteforce(spark):
    import json as _json

    from sparkmedkg import relops

    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per_key = defaultdict(lambda: defaultdict(int))
    for r in rows:
        k = _json.loads(r["props"])["k"]
        obj = {"k": str(k)}
        if r["event_id"] % 3 == 0:
            obj["utm"] = f"src{r['event_id'] % 5}"
        if r["event_type"] == "purchase":
            obj["price"] = str(round(r["value"], 2))
        if r["event_id"] % 7 == 0:
            obj["flag"] = "true"
        for key, val in obj.items():
            if val.lstrip("-").isdigit():
                t = "integer"
            elif val in ("true", "false"):
                t = "bool"
            else:
                try:
                    float(val)
                    t = "double" if "." in val else "string"
                except ValueError:
                    t = "string"
            per_key[key][t] += 1
    got = {
        r["key"]: (r["n_rows"], r["presence_ppm"], r["top_type"], r["n_type_rows"])
        for r in relops.events_props_profile(spark, SF).collect()
    }
    assert set(got) == set(per_key)
    n_events = len(rows)
    for key, types in per_key.items():
        n = sum(types.values())
        top = sorted(types.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[key] == (n, n * 1_000_000 // n_events, top[0], top[1]), key
    # the reconstructed schema must exercise all four types
    assert {v[2] for v in got.values()} == {"integer", "double", "bool", "string"}


def test_ppr_sweep_cut_matches_bruteforce(spark):
    from sparkmedkg import graphalgo, relations

    ppr = {
        r["CUI"]: r["ppr"]
        for r in relations.q_ppr(spark, SF, min_docs=2).collect()
    }
    edges = graphalgo._edges(spark, SF, 2).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
    deg = {v: len(n) for v, n in adj.items()}
    order = sorted(deg, key=lambda v: (-(ppr[v] / deg[v]), v))
    rank = {v: i + 1 for i, v in enumerate(order)}
    tv = sum(deg.values())
    got = {
        r["rank"]: (r["CUI"], r["vol"], r["cut"], r["conductance_ppm"], r["is_best"])
        for r in graphalgo.q_ppr_sweep_cut(spark, SF, min_docs=2).collect()
    }
    vol = cut = 0
    conds = {}
    in_s = set()
    for k, v in enumerate(order[:-1], 1):
        vol += deg[v]
        cut += sum(1 for u in adj[v] if u not in in_s) - sum(
            1 for u in adj[v] if u in in_s
        )
        in_s.add(v)
        cond = cut * 1_000_000 // min(vol, tv - vol)
        conds[k] = (v, vol, cut, cond)
    best = min(c[3] for c in conds.values())
    assert set(got) == set(conds)
    for k, (v, vol_k, cut_k, cond_k) in conds.items():
        assert got[k] == (v, vol_k, cut_k, cond_k, cond_k == best), k
    # the sweep must find a non-trivial community (not a single node cut
    # of everything)
    assert any(flag for _, _, _, _, flag in got.values())
