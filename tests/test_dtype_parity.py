"""Spark/DuckDB dtype parity for every oracle-gated query.

Both rounds' only red driver-correctness cells were *type
canonicalization* artifacts (timestamp flavor in r1, HUGEINT sums in
r2): value-identical results that hash apart after pandas coercion.
This test runs every ``queries()`` entry and its ``oracle_sql()`` twin
at sf0.001 and asserts the pandas dtype *kind* (int / float / object /
datetime / bool) matches column-by-column — the exact surface the
driver's hash canonicalization sees.

Convention enforced here (grep-able in the sql_* builders): every
DuckDB aggregate that would widen to HUGEINT/DECIMAL is explicitly
CAST to the Spark-matching type (BIGINT / DOUBLE).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


@pytest.fixture(scope="module")
def duck():
    from tools.dtype_audit import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _entries():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return [(n, fn, oracles[n]) for n, fn in qs.items() if n in oracles]


def test_dtype_parity_all_queries(spark, duck):
    from tools.dtype_audit import audit

    flagged = {}
    for name, fn, sql in _entries():
        problems = audit(spark, duck, name, fn, sql, SF_DIR)
        if problems:
            flagged[name] = problems
    assert not flagged, (
        "driver-hash dtype hazards (pandas dtype kind differs between "
        f"Spark and DuckDB): {flagged}"
    )


def test_events_value_is_cent_aligned(spark):
    """Guard for the cent-domain contract (events_percentiles /
    winsorize / robust_zscore quantize via round(value*100)): every
    events.value must be exactly representable in cents, else those
    operators silently change results (ADVICE r4)."""
    from pyspark.sql import functions as F

    for sf in ("sf0.001", "sf0.01"):
        ev = spark.read.parquet(f"/root/testdata/{sf}/events.parquet")
        off = ev.where(
            F.abs(F.col("value") * 100 - F.round(F.col("value") * 100))
            > 1e-9
        ).count()
        assert off == 0, f"{sf}: {off} non-cent-aligned values"
