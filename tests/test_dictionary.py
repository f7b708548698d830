"""Dictionary-driven schema tests (reference DICTIONARY_URL semantics)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from aced_etl_pod_spark.sources.dictionary import conform, schema_for

DICT = {
    "patient": {
        "properties": {
            "id": {"type": "string"},
            "age": {"type": "integer"},
            "score": {"type": ["number", "null"]},
            "active": {"type": "boolean"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "born": {"type": "string", "format": "date-time"},
            "address": {
                "type": "object",
                "properties": {"city": {"type": "string"}, "zip": {"type": "string"}},
            },
        }
    }
}


def test_schema_compilation():
    s = schema_for(DICT, "patient")
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["id"] == T.StringType()
    assert by_name["age"] == T.LongType()
    assert by_name["score"] == T.DoubleType()
    assert by_name["active"] == T.BooleanType()
    assert by_name["tags"] == T.ArrayType(T.StringType())
    assert by_name["born"] == T.TimestampType()
    assert by_name["address"] == T.StructType(
        [T.StructField("city", T.StringType()), T.StructField("zip", T.StringType())]
    )


def test_schema_from_json_file(tmp_path):
    p = tmp_path / "dict.json"
    p.write_text(json.dumps(DICT))
    assert schema_for(str(p), "patient").fieldNames() == schema_for(DICT, "patient").fieldNames()


def test_conform_casts_fills_and_prunes(spark):
    df = spark.createDataFrame(
        [("p1", "41", "extra")], "id string, age string, junk string"
    )
    out = conform(df, schema_for(DICT, "patient"))
    row = out.first()
    assert row["age"] == 41 and isinstance(row["age"], int)
    assert row["score"] is None and row["tags"] is None
    assert "junk" not in out.columns
    assert [f.name for f in out.schema.fields] == [
        "id", "age", "score", "active", "tags", "born", "address",
    ]


def test_ndjson_scan_with_dictionary_schema(spark, tmp_path):
    src = tmp_path / "patients.ndjson"
    src.write_text(
        '{"id": "a", "age": 3, "tags": ["x"], "born": "2024-01-02T03:04:05"}\n'
        '{"id": "b", "age": 9, "active": true}\n'
    )
    df = spark.read.schema(schema_for(DICT, "patient")).json(str(src))
    rows = {r["id"]: r for r in df.collect()}
    assert rows["a"]["born"].year == 2024
    assert rows["b"]["active"] is True and rows["b"]["tags"] is None
