"""Round-3 KG-completion batch: forward-chaining rule application —
brute-force twin from the gated facts + rules tables."""

from __future__ import annotations

from collections import defaultdict

from sparkmedkg import relations

SF = "/root/testdata/sf0.001"


def test_rule_inference_matches_bruteforce(spark):
    facts = {
        (r["subj_cui"], r["pred"], r["obj_cui"])
        for r in relations.q_relations(spark, SF).collect()
    }
    rules = [
        r
        for r in relations.q_amie_rules(spark, SF).collect()
        if int(r["conf_ppm"]) >= relations.RULE_CONF_MIN_PPM
    ]
    din, dout = defaultdict(int), defaultdict(int)
    for s, p, o in facts:
        dout[s] += 1
        din[o] += 1
    hot = {
        z
        for z in set(din) & set(dout)
        if din[z] * dout[z] > relations.CHAIN_FANOUT_CAP
    }
    want = set()
    for r in rules:
        if r["rule_type"] == "inverse":
            for s, p, o in facts:
                if p == r["body_pred_1"] and o != s:
                    cand = (o, r["head_pred"], s)
                    if cand not in facts:
                        want.add(
                            ("inverse", r["head_pred"], r["body_pred_1"],
                             "", o, s, int(r["conf_ppm"]))
                        )
        else:
            by_z = defaultdict(list)
            for s, p, o in facts:
                if p == r["body_pred_2"]:
                    by_z[s].append(o)
            for s, p, o in facts:
                if p == r["body_pred_1"] and o not in hot:
                    for y in by_z.get(o, []):
                        if s != y and (s, r["head_pred"], y) not in facts:
                            want.add(
                                ("chain", r["head_pred"], r["body_pred_1"],
                                 r["body_pred_2"], s, y, int(r["conf_ppm"]))
                            )
    got = {
        (r["rule_type"], r["head_pred"], r["body_pred_1"],
         r["body_pred_2"], r["subj_cui"], r["obj_cui"], int(r["conf_ppm"]))
        for r in relations.q_rule_inference(spark, SF).collect()
    }
    assert got == want
    # every inferred fact must be genuinely new
    for _, hp, _, _, s, o, _ in got:
        assert (s, hp, o) not in facts
