"""Driver-contract guards (VERDICT r3 tasks 3/4/8, r4 tasks 1/8).

Three rounds of history say the only red CORRECTNESS cells are *type
canonicalization* artifacts, and ``tools/dtype_audit.py`` provably cannot
see the list-column class (lists are dtype ``object`` in both engines, so
the kind comparison passes while the driver's pandas sort crashes with
``TypeError: unhashable type: 'list'``).  These guards close that hole at
the schema level, and pin the ROTATING ``driver_head`` contract: a pinned
flagship core re-certified every round, plus a deterministic per-round
sample of never-driver-checked queries so driver coverage accumulates
across rounds instead of re-checking the same 50 forever (VERDICT r4
task 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_driver_head_is_prefix_core_pinned_and_cross_family():
    """queries() leads with driver_head(); DRIVER_CORE is its pinned
    prefix; the head spans >= 8 families and is fully oracle-gated.

    The driver checks exactly the dict head; this pins the contract the
    rotation must keep delivering."""
    q = entrymod.queries()
    keys = list(q)
    head = entrymod.driver_head(keys)
    assert len(head) == entrymod.DRIVER_HEAD_LEN
    assert keys[: len(head)] == head
    assert head[: len(entrymod.DRIVER_CORE)] == entrymod.DRIVER_CORE
    fams = {k.split("_")[0] for k in head}
    assert len(fams) >= 8, sorted(fams)
    # every head entry is oracle-gated (strong check, not rows-only)
    sql = entrymod.oracle_sql()
    missing = [k for k in head if k not in sql]
    assert not missing, missing


def test_driver_head_rotation_samples_fresh_queries():
    """While never-driver-checked queries remain, the rotated portion of
    the head must consist of them — this is what converts judge-only
    queries into driver-certified ones round over round."""
    keys = list(entrymod.queries())
    checked = entrymod.driver_checked_names()
    ncore = len(entrymod.DRIVER_CORE)
    pool = [k for k in keys if k not in checked and k not in entrymod.DRIVER_CORE]
    head = entrymod.driver_head(keys)
    rotated = head[ncore:]
    want_fresh = min(len(pool), len(rotated))
    got_fresh = sum(1 for k in rotated if k not in checked)
    assert got_fresh == want_fresh, (got_fresh, want_fresh)


def test_driver_head_rotation_changes_with_round():
    """Freshness guard (VERDICT r4 task 8): consecutive round values must
    produce different rotated samples (the core stays pinned), otherwise
    the rotation is wired wrong and coverage stops accumulating."""
    keys = list(entrymod.queries())
    ncore = len(entrymod.DRIVER_CORE)
    heads = [entrymod.driver_head(keys, rnd=r) for r in (5, 6, 7, 8)]
    for h in heads:
        assert h[:ncore] == entrymod.DRIVER_CORE
    tails = [tuple(h[ncore:]) for h in heads]
    assert len(set(tails)) == len(tails), "rotation is round-invariant"


def test_driver_head_deterministic_within_round():
    """Same round value -> identical head (the driver and the selfcheck
    must sample the same 50)."""
    keys = list(entrymod.queries())
    assert entrymod.driver_head(keys, rnd=5) == entrymod.driver_head(
        keys, rnd=5
    )


def _flatten_complex(schema: T.StructType) -> list[str]:
    return [
        f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)
    ]


def test_all_query_result_schemas_are_scalar_only(spark):
    """No ArrayType/MapType/StructType in ANY queries() result schema.

    The driver's canonicalizer does a pandas sort over result cells and
    crashes on list cells; dtype_audit.py cannot catch this (object kind on
    both sides).  Schema construction is lazy — no job runs — for every
    entry EXCEPT the stream_*_replay builders, which execute a full
    availableNow query before returning; those are checked against their
    statically-declared schemas (streaming.REPLAY_RESULT_SCHEMAS, pinned
    to the real replay output in test_streaming) so this sweep stays
    cheap (ADVICE r4)."""
    from sparkmedkg import streaming

    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        if name in streaming.REPLAY_RESULT_SCHEMAS:
            schema = T._parse_datatype_string(
                streaming.REPLAY_RESULT_SCHEMAS[name]
            )
            cols = _flatten_complex(schema)
        else:
            try:
                cols = _flatten_complex(fn(spark, SF).schema)
            except Exception as e:  # surface builder crashes distinctly
                errs[name] = repr(e)[:200]
                continue
        if cols:
            bad[name] = cols
    assert not errs, errs
    assert not bad, bad


def test_every_stream_replay_has_declared_schema():
    """Each stream_* entry in queries() must appear in
    REPLAY_RESULT_SCHEMAS (else the scalar-only sweep would silently
    start executing streaming jobs again)."""
    from sparkmedkg import streaming

    stream_entries = [
        k for k in entrymod.queries() if k.startswith("stream_")
    ]
    missing = [
        k
        for k in stream_entries
        if k not in streaming.REPLAY_RESULT_SCHEMAS
    ]
    assert not missing, missing
