"""Round-3 governance batch: PII residual audit, class-balance plan —
brute-force twins."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import duckdb

from sparkmedkg import trainprep, webclean

SF = "/root/testdata/sf0.001"


def test_pii_residual_audit_is_clean_and_consistent(spark):
    row = webclean.pii_residual_audit(spark, SF).collect()[0]
    red = webclean.pii_redact(spark, SF).collect()
    assert int(row["n_rows"]) == len(red)
    assert int(row["phones_redacted"]) == sum(int(r["n_phones"]) for r in red)
    assert int(row["nums_redacted"]) == sum(int(r["n_nums"]) for r in red)
    # residual scan of the actual redacted text must be zero
    resid_p = sum(
        len(re.findall(webclean.PHONE_RE, r["redacted"])) for r in red
    )
    resid_n = sum(
        len(re.findall(webclean.NUM_RE, r["redacted"])) for r in red
    )
    assert int(row["residual_phones"]) == resid_p == 0
    assert int(row["residual_nums"]) == resid_n == 0
    assert bool(row["clean"]) is True


def test_class_balance_plan_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    by_label = defaultdict(list)
    for vid, lab in rows:
        by_label[lab].append(vid)
    target = min(len(v) for v in by_label.values())
    got = {
        r["label"]: (int(r["n_before"]), int(r["n_after"]),
                     int(r["kept_share_ppm"]))
        for r in trainprep.class_balance_plan(spark, SF).collect()
    }
    assert set(got) == set(by_label)
    for lab, vids in by_label.items():
        kept = sorted(
            vids,
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )[:target]
        n_b, n_a, share = got[lab]
        assert n_b == len(vids)
        assert n_a == len(kept) == min(target, len(vids))
        assert share == n_a * 1_000_000 // n_b
    # balanced: every class lands exactly at the minority size
    assert {v[1] for v in got.values()} == {target}
