"""exactq unit tests: the scaled integer cuts must equal quantile_cont's
definition computed in exact rational arithmetic (Fraction), across edge
cases — ties, negatives, single-element groups, extreme probabilities."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest

from sparkmedkg import exactq

CASES = [
    ("plain", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
    ("ties", [5, 5, 5, 1, 1, 9, 9, 9, 9, 2]),
    ("negatives", [-7, -3, 0, 4, 4, 11, -3, 2]),
    ("single", [42]),
    ("two", [10, 20]),
    ("skewed", [1] * 20 + [1000]),
]
GRIDS = [([1, 2, 3], 4), (list(range(1, 10)), 10), ([1], 2), ([50, 99], 100)]


def _exact_cut_scaled(xs: list[int], num: int, den: int) -> int:
    """quantile_cont at num/den over xs, in exact rationals, scaled by den."""
    s = sorted(xs)
    n = len(s)
    h = Fraction((n - 1) * num, den)
    k = h.numerator // h.denominator  # floor
    frac = h - k
    hi = s[k + 1] if k + 1 < n else s[k]
    cut = Fraction(s[k]) + frac * (hi - s[k])
    scaled = cut * den
    assert scaled.denominator == 1
    return int(scaled)


@pytest.mark.parametrize(("label", "xs"), CASES)
@pytest.mark.parametrize(("nums", "den"), GRIDS)
def test_scaled_cuts_match_exact_rationals(spark, label, xs, nums, den):
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    row = exactq.quantile_cuts_scaled(df, "v", nums, den).collect()[0]
    want = [_exact_cut_scaled(xs, m, den) for m in nums]
    assert list(row["cuts_scaled"]) == want
    assert row["den"] == den
    assert row["n"] == len(xs)


@pytest.mark.parametrize(("label", "xs"), CASES)
def test_sql_cuts_match_spark(spark, label, xs):
    nums, den = list(range(1, 10)), 10
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    got = list(
        exactq.quantile_cuts_scaled(df, "v", nums, den).collect()[0][
            "cuts_scaled"
        ]
    )
    con = duckdb.connect()
    vals = ", ".join(f"({x})" for x in xs)
    sql = (
        f"WITH src(v) AS (VALUES {vals}),\n"
        + exactq.sql_cuts_cte("src", "v", nums, den)
        + "\nSELECT cuts_scaled FROM qc_cuts"
    )
    want = con.execute(sql).fetchone()[0]
    con.close()
    assert got == list(want)


def test_grouped_matches_global_per_group(spark):
    groups = {"a": [1, 2, 3, 4], "b": [10, 10, 30], "c": [7]}
    rows = [(k, v) for k, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: (list(r["cuts_scaled"]), r["n"])
        for r in exactq.grouped_quantile_cuts_scaled(
            df, "k", "v", [1, 3], 4
        ).collect()
    }
    for k, vs in groups.items():
        want = [_exact_cut_scaled(vs, m, 4) for m in (1, 3)]
        assert got[k] == (want, len(vs))


def test_bucket_expr_matches_definition(spark):
    from pyspark.sql import functions as F

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    cuts = exactq.quantile_cuts_scaled(df, "v", [1, 2, 3], 4)
    got = {
        r["v"]: r["b"]
        for r in df.crossJoin(F.broadcast(cuts))
        .select("v", exactq.bucket_expr("v", 4).alias("b"))
        .distinct()
        .collect()
    }
    cut_scaled = [_exact_cut_scaled(xs, m, 4) for m in (1, 2, 3)]
    for v in set(xs):
        want = 1 + sum(1 for c in cut_scaled if 4 * v > c)
        assert got[v] == want
