"""Pre-audit the oracle builders for driver-hash type hazards.

Both rounds' only red CORRECTNESS cells were *type canonicalization*
artifacts, never wrong values: the driver converts Spark and DuckDB
results to pandas before hashing, and pandas coerces differently —
DuckDB HUGEINT (any SUM of integers) lands as float64/object while
Spark BIGINT lands as int64; DECIMAL lands as object(Decimal);
timestamp flavors differ.  So value-identical results hash apart.

This tool runs every ``__spark_entry__.queries()`` entry AND its
``oracle_sql()`` twin at a small sf dir, pulls both through pandas the
way the driver does, and flags any column whose pandas dtype *kind*
(int / float / object / datetime / bool) differs between engines.
Exit 1 if anything is flagged.

Usage:
    python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: pandas dtype.kind buckets that the driver's hash treats alike.
#: 'i'/'u' (int64) vs 'f' (float64) vs 'O' (object) vs 'M' (datetime)
#: vs 'b' (bool) are the hazard boundaries.
KIND_NAMES = {
    "i": "int", "u": "int", "f": "float", "O": "object",
    "M": "datetime", "m": "timedelta", "b": "bool",
}


def col_kinds(df) -> dict[str, str]:
    return {c: KIND_NAMES.get(df[c].dtype.kind, df[c].dtype.kind)
            for c in df.columns}


def audit(spark, con, name, fn, sql, sf_dir):
    """Return list of problem strings for one query."""
    try:
        sdf = fn(spark, sf_dir)
        # Non-scalar result columns are invisible to the dtype-kind check
        # below (lists land as object in BOTH engines) but crash pandas
        # sorting in the driver's canonicalizer — flag them at the schema
        # level (see also tests/test_contract_guards.py).
        from pyspark.sql import types as T

        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            )
        ]
        if complex_cols:
            return [f"non-scalar result columns: {complex_cols}"]
        spdf = sdf.toPandas()
    except Exception as e:  # pragma: no cover - surfaced to caller
        return [f"spark error: {e}"]
    try:
        odf = con.execute(sql).df()
    except Exception as e:  # pragma: no cover
        return [f"duckdb error: {e}"]
    sk, ok = col_kinds(spdf), col_kinds(odf)
    problems = []
    if sorted(sk) != sorted(ok):
        return [f"cols {sorted(sk)} vs {sorted(ok)}"]
    for c in sk:
        a, b = sk[c], ok[c]
        if a == b:
            continue
        # Empty result sets degrade to object on the DuckDB side for some
        # types; only a real hazard when there are rows to hash.
        if len(odf) == 0 and len(spdf) == 0:
            continue
        problems.append(f"col {c!r}: spark={a} duckdb={b}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from sparkmedkg.session import get_spark

    spark = get_spark("dtype-audit", master="local[8]",
                      shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    flagged = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        problems = audit(spark, con, name, fn, oracles[name], sf_dir)
        dt = time.time() - t0
        if problems:
            print(f"HAZARD {name} ({dt:.1f}s): {'; '.join(problems)}")
            flagged.append(name)
        else:
            print(f"ok     {name} ({dt:.1f}s)")
    print()
    if flagged:
        print(f"FLAGGED ({len(flagged)}): {flagged}")
        return 1
    print("ALL DTYPE-CLEAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
