"""Source/sink format breadth: the engine's tables round-trip through
every Spark built-in columnar/text format a lake deployment might
mandate (parquet is the default store; ORC for Hive-era lakes, CSV/JSON
for interchange).  Schema and row multiset must survive each round-trip
— a format whose writer drops types (CSV) must read back losslessly
through the declared schema."""

from __future__ import annotations

from sparkmedkg import webkg

SF = "/root/testdata/sf0.001"


def _triples(spark):
    return webkg.q_triples(spark, SF).select(
        "src_label", "src_id", "pred", "dst_label", "dst_id"
    )


def _key(rows):
    return sorted(tuple(r) for r in rows)


def _shape(schema):
    # (name, dataType) pairs — nullability flags legitimately differ
    # across format writers
    return [(f.name, f.dataType) for f in schema.fields]


def test_orc_round_trip(spark, tmp_path):
    t = _triples(spark)
    p = str(tmp_path / "triples_orc")
    t.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert _shape(back.schema) == _shape(t.schema)
    assert _key(back.collect()) == _key(t.collect())


def test_csv_round_trip_via_declared_schema(spark, tmp_path):
    t = _triples(spark)
    p = str(tmp_path / "triples_csv")
    t.write.mode("overwrite").option("header", True).csv(p)
    back = spark.read.schema(t.schema).option("header", True).csv(p)
    assert _shape(back.schema) == _shape(t.schema)
    assert _key(back.collect()) == _key(t.collect())


def test_json_round_trip_via_declared_schema(spark, tmp_path):
    t = _triples(spark)
    p = str(tmp_path / "triples_json")
    t.write.mode("overwrite").json(p)
    back = spark.read.schema(t.schema).json(p)
    assert _key(back.collect()) == _key(t.collect())
