"""Round-3 thirteenth-batch operators: dedup ensemble voting table."""

from __future__ import annotations

import hashlib

from sparkmedkg import dedup, metrics

SF = "/root/testdata/sf0.001"


def test_dedup_ensemble_matches_detectors(spark):
    lsh = {
        (r["a"], r["b"])
        for r in dedup.lsh_candidate_pairs(spark, SF).collect()
    }
    sim = {(r["a"], r["b"]) for r in dedup.simhash_pairs(spark, SF).collect()}
    jac = {
        (r["a"], r["b"])
        for r in dedup.jaccard_pairs_prefix(
            spark, SF, tau=dedup.JACCARD_TAU
        ).collect()
    }
    emb = {
        (r["a"], r["b"])
        for r in dedup.embedding_near_dups(spark, SF).collect()
    }
    md5 = {
        r["doc_id"]: hashlib.md5(r["text"].encode()).hexdigest()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    rows = metrics.dedup_ensemble(spark, SF).collect()
    got = {(r["a"], r["b"]): r for r in rows}

    # the ensemble is exactly the union of the four sparse pair sets
    assert set(got) == lsh | sim | jac | emb
    assert len(rows) == len(got)  # no duplicate (a, b) rows

    for (a, b), r in got.items():
        assert r["lsh"] == ((a, b) in lsh)
        assert r["simhash"] == ((a, b) in sim)
        assert r["jaccard"] == ((a, b) in jac)
        assert r["embedding"] == ((a, b) in emb)
        assert r["exact"] == (md5[a] == md5[b])
        assert r["n_votes"] == sum(
            (r["lsh"], r["simhash"], r["jaccard"], r["embedding"], r["exact"])
        )

    # non-vacuous: at least one multi-vote pair and one single-vote pair
    votes = [r["n_votes"] for r in rows]
    assert max(votes) >= 2 and min(votes) >= 1


def test_metablocking_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from sparkmedkg import er

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    sh = {}
    for d, t in docs.items():
        w = [x for x in t.split(" ") if x != ""]
        n = max(len(w) - 2, 1)
        sh[d] = {" ".join(w[i : i + 3]) for i in range(n)}
    df = Counter(g for gs in sh.values() for g in gs)
    blocks = {g for g, c in df.items() if 2 <= c <= er.MB_BLOCK_CAP}
    cbs = defaultdict(int)
    by_block = defaultdict(list)
    for d, gs in sh.items():
        for g in gs & blocks:
            by_block[g].append(d)
    for g, ids in by_block.items():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cbs[(ids[i], ids[j])] += 1
    w_total = sum(cbs.values())
    n_edges = len(cbs)
    want = {
        p: (w, w * n_edges >= w_total) for p, w in cbs.items()
    }
    got = {
        (r["a"], r["b"]): (r["cbs"], r["keep"])
        for r in er.metablocking(spark, SF).collect()
    }
    assert got == want
    # pruning is non-vacuous: both kept and dropped edges exist
    flags = {k for _, k in got.values()}
    assert flags == {True, False}


def test_l_diversity_matches_bruteforce(spark):
    import json
    from collections import defaultdict

    from sparkmedkg import relops

    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    users, sens = defaultdict(set), defaultdict(set)
    for r in rows:
        qi = (r["event_type"], r["ts"].hour)
        users[qi].add(r["user_id"])
        sens[qi].add(json.loads(r["props"])["k"])
    want = {
        qi: (len(users[qi]), len(sens[qi]), len(sens[qi]) < relops.LDIV_L)
        for qi in users
    }
    got = {
        (r["event_type"], r["hour"]): (
            r["class_size"], r["n_sensitive"], r["at_risk"]
        )
        for r in relops.events_l_diversity(spark, SF).collect()
    }
    assert got == want
    assert {r[2] for r in got.values()} == {True, False}


def test_label_agreement_matches_knn_aggregate(spark):
    from collections import defaultdict

    from sparkmedkg import simsearch

    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    acc = defaultdict(lambda: [0, 0])  # src -> [k_eff, n_same]
    for r in simsearch.knn_graph(spark, SF).collect():
        acc[r["src"]][0] += 1
        acc[r["src"]][1] += int(labels[r["src"]] == labels[r["dst"]])
    want = {
        s: (k, n, n * simsearch.AGREE_PPM // k,
            n * simsearch.AGREE_PPM // k < simsearch.AGREE_SUSPECT)
        for s, (k, n) in acc.items()
    }
    got = {
        r["vec_id"]: (r["k_eff"], r["n_same"], r["agree_ppm"], r["suspect"])
        for r in simsearch.label_agreement(spark, SF).collect()
    }
    assert got == want
    assert want  # non-empty
    assert {v[3] for v in got.values()} == {True, False}


def test_char_entropy_matches_bruteforce(spark, tmp_path):
    import math

    from sparkmedkg import textstats

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    want = {}
    for r in docs:
        cs = list(r["text"])
        n = len(cs)
        uniq = sorted(set(cs))
        s = sum(
            cs.count(u) * math.log2(cs.count(u)) for u in uniq
        )
        ent = round(math.log2(n) - s / n, 6)
        want[r["doc_id"]] = (
            n, len(uniq), ent,
            ent < textstats.ENTROPY_LO or ent > textstats.ENTROPY_HI,
        )
    got = {
        r["doc_id"]: (
            r["n_chars"], r["n_distinct"], r["entropy"], r["suspect"]
        )
        for r in textstats.char_entropy(spark, SF).collect()
    }
    assert got == want

    # suspect flag fires on crafted gibberish (low- and high-entropy ends)
    crafted = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaaaaaa"), (2, "the cat sat on the warm mat")],
        "doc_id bigint, text string",
    )
    crafted.write.parquet(f"{tmp_path}/documents.parquet")
    flags = {
        r["doc_id"]: r["suspect"]
        for r in textstats.char_entropy(spark, str(tmp_path)).collect()
    }
    assert flags == {1: True, 2: False}


def test_seasonality_matches_bruteforce(spark):
    from collections import Counter

    from sparkmedkg import relops

    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    cells = Counter((str(r["ts"].date()), r["ts"].hour) for r in rows)
    tot, days = Counter(), Counter()
    for (d, h), n in cells.items():
        tot[h] += n
        days[h] += 1
    want = {
        (d, h): (
            n, tot[h], days[h],
            n * days[h] * relops.SEASON_HOT_DEN
            > relops.SEASON_HOT_NUM * tot[h],
        )
        for (d, h), n in cells.items()
    }
    got = {
        (r["day"], r["hour"]): (
            r["n"], r["hour_total"], r["n_days"], r["hot"]
        )
        for r in relops.events_seasonality(spark, SF).collect()
    }
    assert got == want
    assert {v[3] for v in got.values()} == {True, False}


def test_reciprocity_matches_bruteforce(spark):
    from sparkmedkg import webgraph

    import hashlib

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    edges = set()
    for r in docs:
        src = f"h{r['doc_id'] % webgraph.N_DST_HOSTS}.example"
        toks = [t for t in r["text"].split(" ") if t][: webgraph.MAX_ANCHORS]
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            dst = f"h{h % webgraph.N_DST_HOSTS}.example"
            if src != dst:
                edges.add((src, dst))
    mutual = {(a, b) for (a, b) in edges if (b, a) in edges}
    row = webgraph.reciprocity(spark, SF).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_mutual_edges"] == len(mutual)
    assert row["n_mutual_dyads"] == len(mutual) // 2
    assert row["n_asym_dyads"] == len(edges) - len(mutual)
    assert row["reciprocity"] == round(len(mutual) / len(edges), 6)
    assert 0 < row["n_mutual_edges"] < row["n_edges"]  # non-vacuous


def test_residual_quant_matches_bruteforce(spark):
    import math

    from sparkmedkg import simsearch

    s = simsearch.RQ_SCALE // simsearch.RQ_Q1
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    want = {}
    for r in rows:
        c1 = d1 = d2 = clipped = 0
        for x in r["embedding"]:
            f = math.floor(float(x) * simsearch.RQ_SCALE + 0.5)
            q1 = math.floor(float(x) * simsearch.RQ_Q1 + 0.5)
            res = f - q1 * s
            q2 = max(min(res, simsearch.RQ_B), -simsearch.RQ_B)
            c1 += q1
            d1 += res * res
            d2 += (res - q2) * (res - q2)
            clipped += int(abs(res) > simsearch.RQ_B)
        want[r["vec_id"]] = (c1, d1, d2, clipped)
    got = {
        r["vec_id"]: (r["c1_checksum"], r["d1"], r["d2"], r["clipped"])
        for r in simsearch.residual_quant(spark, SF).collect()
    }
    assert got == want
    # the refinement ladder actually refines, and clipping is observed
    assert all(d2 <= d1 for _, d1, d2, _ in got.values())
    assert any(c > 0 for *_, c in got.values())
