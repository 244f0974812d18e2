"""Round-3 sixteenth-batch operators: bot-regularity score, memorization
audit, TextRank keywords, histogram quantile sketch — brute-force Python
twins at sf0.001."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from sparkmedkg import corpusops, metrics, relops, textstats

SF = "/root/testdata/sf0.001"


def test_bot_score_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], int(r["ts"].timestamp()))
        )
    want = {}
    for uid, evs in by_user.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        gaps = [b[2] - a[2] for a, b in zip(evs, evs[1:])]
        n = len(gaps)
        sg = sum(gaps)
        if n < relops.BOT_MIN_GAPS or sg <= 0:
            continue
        sg2 = sum(g * g for g in gaps)
        cv2 = round((n * sg2 - sg * sg) / (sg * sg), 6)
        want[uid] = (n, sg // n, cv2, cv2 < relops.BOT_CV2_TAU)
    got = {
        r["user_id"]: (r["n_gaps"], r["mean_gap_s"], r["cv2"], r["bot"])
        for r in relops.events_bot_score(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0


def _shingles(text, k):
    ws = re.split(" +", text)
    n = max(len(ws) - k + 1, 1)
    return {" ".join(ws[i : i + k]) for i in range(n)}


def test_memorization_audit_matches_bruteforce(spark):
    lo, hi = __import__(
        "sparkmedkg.trainprep", fromlist=["SPLIT_BOUNDS_BP"]
    ).SPLIT_BOUNDS_BP
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    test_sh, train_sh = set(), set()
    for r in docs:
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) % 10_000
        sh = _shingles(r["text"], corpusops.DECON_K)
        if b >= hi:
            test_sh |= sh
        elif b < lo:
            train_sh |= sh
    leaked = len(test_sh & train_sh)
    row = metrics.memorization_audit(spark, SF).collect()[0]
    assert row["n_test_shingles"] == len(test_sh)
    assert row["n_leaked"] == leaked
    assert row["leak_ppm"] == leaked * 1_000_000 // len(test_sh)


def test_textrank_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    pair_n = Counter()
    for r in docs:
        ws = re.split(" +", r["text"].lower())
        for a, b in zip(ws, ws[1:]):
            if a != b:
                pair_n[(min(a, b), max(a, b))] += 1
    adj = defaultdict(set)
    for (x, y), n in pair_n.items():
        if n >= corpusops.TR_MIN_PAIR:
            adj[x].add(y)
            adj[y].add(x)
    nodes = sorted(adj)
    nn = len(nodes)
    pr = {v: 1.0 / nn for v in nodes}
    d = corpusops.TR_DAMPING
    for _ in range(corpusops.TR_ITERS):
        pr = {
            v: (1 - d) / nn + d * sum(pr[u] / len(adj[u]) for u in adj[v])
            for v in nodes
        }
    ranked = sorted(
        ((round(s, 6), t) for t, s in pr.items()),
        key=lambda x: (-x[0], x[1]),
    )[: corpusops.TR_TOPK]
    got = [
        (r["score"], r["term"])
        for r in corpusops.textrank_keywords(spark, SF).collect()
    ]
    assert got == ranked


def test_quantile_sketch_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    vals = sorted(r["n_chars"] for r in docs)
    n = len(vals)
    lo, hi = vals[0], vals[-1]
    b = textstats.QSK_BUCKETS
    width = (hi - lo) // b + 1
    cnt = Counter((v - lo) // width for v in vals)
    buckets = sorted(cnt)
    want = {}
    for q in textstats.QSK_QS:
        need = (q * n + 99) // 100
        cum = 0
        for bk in buckets:
            below = cum
            cum += cnt[bk]
            if cum >= need:
                est = lo + bk * width + ((need - below) * width) // (
                    cnt[bk] + 1
                )
                break
        exact = vals[need - 1]
        want[q] = (exact, est, abs(est - exact))
    got = {
        r["q_pct"]: (r["exact_val"], r["sketch_est"], r["abs_err"])
        for r in textstats.len_quantile_sketch(spark, SF).collect()
    }
    assert got == want
    # the sketch must put every estimate inside one bucket of the truth
    assert all(err <= width for _, _, err in got.values())
