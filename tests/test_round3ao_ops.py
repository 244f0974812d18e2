"""Round-3 multimodal batch: sampled-frame pHash video near-dup pairs —
brute-force Python twin over the fake decode lane."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from sparkmedkg import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_video_neardup_matches_bruteforce(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    fhs = defaultdict(set)
    for doc_id, text in docs:
        data = text.encode()
        nf = len(data) % mm.FAKE_FPS_MOD + 1
        st = max(1, nf // mm.FRAME_BUDGET)
        for i in range(0, nf, st):
            fhs[doc_id].add(mm._frame_hash(data, i, nf))
    df = defaultdict(int)
    for hs in fhs.values():
        for h in hs:
            df[h] += 1
    kept = {
        d: {h for h in hs if df[h] <= mm.FR_HOT_CAP}
        for d, hs in fhs.items()
    }
    kept = {d: hs for d, hs in kept.items() if len(hs) >= mm.FR_MIN_FRAMES}
    want = {}
    ids = sorted(kept)
    inv = defaultdict(set)
    for d, hs in kept.items():
        for h in hs:
            inv[h].add(d)
    cand = defaultdict(int)
    for h, ds in inv.items():
        ds = sorted(ds)
        for i, x in enumerate(ds):
            for y in ds[i + 1:]:
                cand[(x, y)] += 1
    for (x, y), n in cand.items():
        na, nb = len(kept[x]), len(kept[y])
        c = n * 1_000_000 // min(na, nb)
        if c >= mm.FR_TAU_PPM:
            want[(x, y)] = (n, na, nb, c)
    got = {
        (r["a"], r["b"]): (
            int(r["n_shared"]), int(r["na"]), int(r["nb"]),
            int(r["containment_ppm"]),
        )
        for r in mm.video_neardup_pairs(spark, SF).collect()
    }
    assert got == want
    assert want, "expected at least one near-dup pair at sf0.001"
