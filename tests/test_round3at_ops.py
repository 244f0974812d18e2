"""Round-3 PathSim/STL/audio-fingerprint batch — brute-force Python
twins over the sf0.001 tables."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from sparkmedkg import multimodal, relations, statops

SF = "/root/testdata/sf0.001"


def test_pathsim_matches_bruteforce(spark):
    inc = {
        (r["url"], r["CUI"])
        for r in relations._doc_cui(spark, SF).collect()
    }
    diag = Counter(c for _, c in inc)
    by_doc = defaultdict(set)
    for u, c in inc:
        by_doc[u].add(c)
    m = Counter()
    for cuis in by_doc.values():
        cs = sorted(cuis)
        for i, a in enumerate(cs):
            for b in cs[i + 1 :]:
                m[(a, b)] += 1
    exp = {
        (a, b): n
        for (a, b), n in m.items()
        if n >= relations.PR_MIN_DOCS
    }
    got = {
        (r["cui_a"], r["cui_b"]): r
        for r in relations.q_pathsim(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for (a, b), n in exp.items():
        r = got[(a, b)]
        assert int(r["n_shared_docs"]) == n
        assert int(r["pathsim_ppm"]) == (
            2 * n * relations.PATHSIM_PPM // (diag[a] + diag[b])
        )
        # PathSim is bounded by 1 and symmetric in its inputs
        assert 0 < int(r["pathsim_ppm"]) <= relations.PATHSIM_PPM


def test_stl_decompose_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, epoch_us(ts) // {statops.HOUR_US}, COUNT(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    series = defaultdict(dict)
    for t, hr, c in rows:
        series[t][hr] = c
    exp = {}
    for t, by_hr in series.items():
        hrs = list(range(min(by_hr), max(by_hr) + 1))
        dense = [by_hr.get(h, 0) for h in hrs]
        half, wdt = statops.STL_HALF, statops.STL_W
        det = {}
        for i, h in enumerate(hrs):
            if i - half < 0 or i + half >= len(dense):
                continue
            trend = sum(dense[i - half : i + half + 1]) * 1000 // wdt
            det[h] = (dense[i], trend, dense[i] * 1000 - trend)
        seas_acc = defaultdict(list)
        for h, (_, _, d) in det.items():
            seas_acc[h % 24].append(d)
        seas = {
            hod: (sum(ds) + len(ds) * statops.STL_OFF) // len(ds)
            - statops.STL_OFF
            for hod, ds in seas_acc.items()
        }
        for h, (c, trend, d) in det.items():
            s = seas[h % 24]
            exp[(t, h)] = (c, trend, s, d - s)
    got = {
        (r["event_type"], r["hr"]): (
            int(r["c"]),
            int(r["trend_milli"]),
            int(r["seasonal_milli"]),
            int(r["resid_milli"]),
        )
        for r in statops.events_stl_decompose(spark, SF).collect()
    }
    assert got == exp
    # decomposition identity: c*1000 == trend + seasonal + resid
    for c, trend, s, r in got.values():
        assert c * 1000 == trend + s + r


def _afp_fingerprints(text: str) -> set[int]:
    cs = [ord(ch) for ch in text]
    if not cs:
        return set()
    w = multimodal.AFP_FRAME
    nf = (len(cs) - 1) // w + 1
    pk = [max(cs[(f - 1) * w : (f - 1) * w + w]) for f in range(1, nf + 1)]
    out = set()
    for i in range(len(pk)):
        for dt in range(1, min(multimodal.AFP_FANOUT, len(pk) - 1 - i) + 1):
            out.add(pk[i] * 2048 + pk[i + dt] * 8 + dt)
    return out


def test_audio_fingerprint_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    fps = {d: _afp_fingerprints(t or "") for d, t in rows}
    dfreq = Counter(f for s in fps.values() for f in s)
    kept = {f for f, n in dfreq.items() if n <= multimodal.AFP_HOT_CAP}
    exp = {}
    docs = sorted(fps)
    inv = defaultdict(set)
    for d, s in fps.items():
        for f in s & kept:
            inv[f].add(d)
    pair_n = Counter()
    for f, ds in inv.items():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                pair_n[(a, b)] += 1
    exp = {
        p: n for p, n in pair_n.items() if n >= multimodal.AFP_MIN_SHARED
    }
    got = {
        (r["doc_a"], r["doc_b"]): int(r["n_shared"])
        for r in multimodal.audio_fingerprint_pairs(spark, SF).collect()
    }
    assert got == exp
    assert len(got) > 0


def test_zonemap_prune_matches_bruteforce(spark):
    from sparkmedkg import relops

    con = duckdb.connect()
    cents = [
        r[0]
        for r in con.execute(
            f"SELECT CAST(round(value * 100) AS BIGINT) "
            f"FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    con.close()
    # rank-based discrete cuts: cut_i = sorted[ceil(i*n/zones) - 1] — the
    # all-integer definition the op uses (no interpolated-percentile seam)
    srt = sorted(cents)
    n, zones = len(srt), relops.ZM_ZONES
    cuts = [srt[-(-i * n // zones) - 1] for i in range(1, zones)]
    by_zone = defaultdict(list)
    for c in cents:
        z = 1 + sum(1 for cut in cuts if c > cut)
        by_zone[z].append(c)
    got = {
        int(r["zone"]): r
        for r in relops.events_zonemap_prune(spark, SF).collect()
    }
    assert set(got) == set(by_zone)
    pruned_zones = 0
    for z, cs in by_zone.items():
        r = got[z]
        assert int(r["n_rows"]) == len(cs)
        assert int(r["min_cents"]) == min(cs)
        assert int(r["max_cents"]) == max(cs)
        assert bool(r["pruned"]) == (max(cs) < relops.ZM_PROBE_CENTS)
        pruned_zones += bool(r["pruned"])
    # a clustered layout must actually skip files for the standing probe
    # AND keep some — a degenerate all/none outcome would mean the probe
    # constant no longer audits anything
    assert 0 < pruned_zones < len(by_zone)
    # zone maps of a range-partitioned layout are disjoint: a pruned
    # zone's max sits below every kept zone's min-above-probe region
    kept_min = min(
        int(got[z]["max_cents"]) for z in by_zone if not got[z]["pruned"]
    )
    for z in by_zone:
        if got[z]["pruned"]:
            assert int(got[z]["max_cents"]) <= kept_min


def test_closure_distributed_equals_driver_side(spark):
    """The data-scale semi-naive closure and the driver-side literal
    must be row-identical (same pairs, same min depths)."""
    from sparkmedkg import hierarchy

    lit = {
        (r["cui"], r["ancestor"]): int(r["min_depth"])
        for r in hierarchy.ontology_closure(spark).collect()
    }
    dist = {
        (r["cui"], r["ancestor"]): int(r["min_depth"])
        for r in hierarchy.closure_distributed(spark).collect()
    }
    assert lit == dist
    assert len(lit) > len(set(hierarchy.WEB_HIERARCHY))  # true transitivity


def test_ivf_shortlist_reproduces_per_level_topk(spark):
    """Filtering the one-pass probe-ranked shortlist at each level must
    reproduce ivf_topk(n_probe=p) exactly (ids AND rounded cosines)."""
    from pyspark.sql import functions as F

    from sparkmedkg import metrics, simsearch

    short = simsearch.ivf_shortlist(
        spark, SF, n_probe=max(metrics.IVF_CURVE_PROBES)
    ).localCheckpoint(eager=True)
    for p in metrics.IVF_CURVE_PROBES:
        via_short = [
            (r["vec_id"], r["cos"])
            for r in short.where(F.col("prank") <= p)
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(10)
            .select("vec_id", F.round("cos", 6).alias("cos"))
            .collect()
        ]
        direct = [
            (r["vec_id"], r["cos"])
            for r in simsearch.ivf_topk(spark, SF, k=10, n_probe=p).collect()
        ]
        assert via_short == direct


def test_rank_fusion_matches_bruteforce(spark):
    from sparkmedkg import graphalgo, trainprep

    deg = Counter(
        r["src"]
        for r in relations._cooccur_edges(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    )
    kz = {
        r["CUI"]: int(r["katz_num"])
        for r in graphalgo.q_katz(spark, SF).collect()
    }
    tri = {
        r["CUI"]: int(r["n_triangles"])
        for r in trainprep.kg_triangles(
            spark, SF, relations.PR_MIN_DOCS
        ).collect()
    }
    nodes = sorted(deg)
    n = len(nodes)

    def ranks(score):
        order = sorted(nodes, key=lambda c: (-score.get(c, 0), c))
        return {c: i + 1 for i, c in enumerate(order)}

    r_deg, r_kz, r_tri = ranks(deg), ranks(kz), ranks(tri)
    borda = {c: 3 * n - r_deg[c] - r_kz[c] - r_tri[c] for c in nodes}
    cons = {
        c: i + 1
        for i, c in enumerate(sorted(nodes, key=lambda c: (-borda[c], c)))
    }
    got = {
        r["CUI"]: r for r in graphalgo.q_rank_fusion(spark, SF).collect()
    }
    assert set(got) == set(nodes)
    for c in nodes:
        r = got[c]
        assert int(r["r_deg"]) == r_deg[c]
        assert int(r["r_katz"]) == r_kz[c]
        assert int(r["r_tri"]) == r_tri[c]
        assert int(r["borda"]) == borda[c]
        assert int(r["consensus_rank"]) == cons[c]
    # Borda total points are conserved: sum over nodes = 3 * C(n,2)
    assert sum(borda.values()) == 3 * n * (n - 1) // 2
