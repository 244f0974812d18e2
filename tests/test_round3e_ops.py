"""Round-3 additions, sixth batch: TPC-H Q4/Q6/Q11/Q12 shapes.
Oracle-value parity runs in the driver gate; these pin brute-force
equality and algorithmic invariants."""

from __future__ import annotations

import datetime
from collections import defaultdict

from sparkmedkg import relops

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet").collect()


# ---------------------------------------------------------------------------
# TPC-H Q4: order-priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------

def test_order_priority_bruteforce(spark):
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in relops.tpch_order_priority(spark, SF).collect()
    }
    assert got
    late_orders = set()
    orders = {
        r["o_orderkey"]: (r["o_orderdate"], r["o_orderpriority"])
        for r in _rows(spark, "orders")
        if r["o_orderdate"].year == relops.Q4_YEAR
    }
    cutoff = datetime.timedelta(days=relops.Q4_LATE_DAYS)
    for r in _rows(spark, "lineitem"):
        o = orders.get(r["l_orderkey"])
        if o is not None and r["l_shipdate"] > o[0] + cutoff:
            late_orders.add(r["l_orderkey"])
    want = defaultdict(int)
    for k in late_orders:
        want[orders[k][1]] += 1
    assert got == dict(want)


def test_order_priority_counts_orders_not_lineitems(spark):
    # the semi-join must count each order once, however many late lineitems
    total = sum(
        r["order_count"]
        for r in relops.tpch_order_priority(spark, SF).collect()
    )
    n_orders_in_year = sum(
        1
        for r in _rows(spark, "orders")
        if r["o_orderdate"].year == relops.Q4_YEAR
    )
    assert 0 < total <= n_orders_in_year


# ---------------------------------------------------------------------------
# TPC-H Q6: forecast revenue (pushed-predicate single-scan agg)
# ---------------------------------------------------------------------------

def test_forecast_revenue_bruteforce(spark):
    row = relops.tpch_forecast_revenue(spark, SF).collect()[0]
    want_rev, want_n = 0.0, 0
    for r in _rows(spark, "lineitem"):
        if (
            r["l_shipdate"].year == relops.Q6_YEAR
            and relops.Q6_DISC_LO <= r["l_discount"] <= relops.Q6_DISC_HI
            and r["l_quantity"] < relops.Q6_QTY_LT
        ):
            want_rev += r["l_extendedprice"] * r["l_discount"]
            want_n += 1
    assert row["n_items"] == want_n > 0
    assert abs(row["revenue"] - want_rev) < 1e-4


def test_forecast_revenue_filters_are_pushed(spark):
    plan = relops.tpch_forecast_revenue(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # discount band + quantity cap are scan-level filters, not post-scan
    assert "l_discount" in plan.split("PushedFilters")[1][:400]


# ---------------------------------------------------------------------------
# TPC-H Q12: late-shipment priority split
# ---------------------------------------------------------------------------

def test_shipmode_priority_bruteforce(spark):
    got = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in relops.tpch_shipmode_priority(spark, SF).collect()
    }
    assert got
    orders = {
        r["o_orderkey"]: (r["o_orderdate"], r["o_orderpriority"])
        for r in _rows(spark, "orders")
    }
    cutoff = datetime.timedelta(days=relops.Q12_LATE_DAYS)
    want = defaultdict(lambda: [0, 0])
    for r in _rows(spark, "lineitem"):
        if r["l_shipdate"].year not in relops.Q12_YEARS:
            continue
        odate, prio = orders[r["l_orderkey"]]
        if r["l_shipdate"] > odate + cutoff:
            idx = 0 if prio in relops.Q12_HIGH else 1
            want[r["l_returnflag"]][idx] += 1
    assert got == {k: tuple(v) for k, v in want.items()}


# ---------------------------------------------------------------------------
# TPC-H Q11: important parts vs average-relative threshold
# ---------------------------------------------------------------------------

def test_important_parts_bruteforce(spark):
    got = {
        r["l_partkey"]: r["part_value"]
        for r in relops.tpch_important_parts(spark, SF).collect()
    }
    assert got
    per_part = defaultdict(float)
    for r in _rows(spark, "lineitem"):
        per_part[r["l_partkey"]] += r["l_extendedprice"]
    avg = sum(per_part.values()) / len(per_part)
    want = {
        k: v for k, v in per_part.items() if v > relops.Q11_AVG_MULT * avg
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-3
    # threshold is selective both ways: keeps some, drops some
    assert 0 < len(got) < len(per_part)
