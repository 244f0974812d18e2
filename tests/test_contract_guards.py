"""Driver-contract guards (VERDICT r3 tasks 3, 4, 8).

Three rounds of history say the only red CORRECTNESS cells are *type
canonicalization* artifacts, and ``tools/dtype_audit.py`` provably cannot
see the list-column class (lists are dtype ``object`` in both engines, so
the kind comparison passes while the driver's pandas sort crashes with
``TypeError: unhashable type: 'list'``).  These guards close that hole at
the schema level, and pin the cross-family ``DRIVER_HEAD`` ordering so the
driver's first-51-keys check keeps certifying breadth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_driver_head_is_prefix_and_cross_family():
    """First 51 queries() keys == DRIVER_HEAD and span >= 8 families.

    The driver checks exactly the dict head; if future additions push the
    cross-family sample out of the window, a 51-row driver pass would
    silently certify one family again (VERDICT r3 task 4/8)."""
    q = entrymod.queries()
    keys = list(q)
    assert len(entrymod.DRIVER_HEAD) == 51
    assert keys[:51] == entrymod.DRIVER_HEAD
    fams = {k.split("_")[0] for k in keys[:51]}
    assert len(fams) >= 8, sorted(fams)
    # every head entry is oracle-gated (strong check, not rows-only)
    sql = entrymod.oracle_sql()
    missing = [k for k in entrymod.DRIVER_HEAD if k not in sql]
    assert not missing, missing


def _flatten_complex(schema: T.StructType) -> list[str]:
    return [
        f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)
    ]


def test_all_query_result_schemas_are_scalar_only(spark):
    """No ArrayType/MapType/StructType in ANY queries() result schema.

    The driver's canonicalizer does a pandas sort over result cells and
    crashes on list cells; dtype_audit.py cannot catch this (object kind on
    both sides).  Schema construction is lazy — no job runs for most
    entries — so this sweeps all ~390 entries cheaply."""
    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        try:
            cols = _flatten_complex(fn(spark, SF).schema)
        except Exception as e:  # surface builder crashes distinctly
            errs[name] = repr(e)[:200]
            continue
        if cols:
            bad[name] = cols
    assert not errs, errs
    assert not bad, bad
