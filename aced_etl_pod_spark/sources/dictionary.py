"""Data-dictionary-driven schemas (reference D1.2 / §1.2).

The reference's types come from a remote JSON "data dictionary"
(``DICTIONARY_URL`` → aced-test.json, etl-job/fhir_import_export.py:411-414),
passed as ``schema_path`` into the flattener and every loader (:219-258).
Here the dictionary is a plain JSON document (local path or dict) whose
per-node ``properties`` compile to explicit Spark ``StructType``s — the
schemas are still *externally supplied and dynamic*, but inference never
touches the data (a 100 TB inference scan is unacceptable).

Dictionary shape (JSON-Schema-ish, like a Gen3 dictionary):

    {"patient": {"properties": {"id": {"type": "string"},
                                "age": {"type": "integer"},
                                "tags": {"type": "array",
                                         "items": {"type": "string"}},
                                "born": {"type": "string",
                                         "format": "date-time"}}}}
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALARS = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def _field_type(spec: dict) -> T.DataType:
    t = spec.get("type", "string")
    if isinstance(t, list):  # e.g. ["string", "null"]
        non_null = [x for x in t if x != "null"]
        t = non_null[0] if non_null else "string"
    if t == "string" and spec.get("format") == "date-time":
        return T.TimestampType()
    if t == "array":
        return T.ArrayType(_field_type(spec.get("items", {"type": "string"})))
    if t == "object":
        return _struct_type(spec.get("properties", {}))
    return _SCALARS.get(t, T.StringType())


def _struct_type(properties: dict) -> T.StructType:
    return T.StructType(
        [T.StructField(name, _field_type(spec), True) for name, spec in properties.items()]
    )


def load_dictionary(source: str | dict) -> dict:
    """Accept a parsed dict or a local JSON path (the DICTIONARY_URL
    analog; fetching is the caller's concern — no network in the engine)."""
    if isinstance(source, dict):
        return source
    with open(source) as f:
        return json.load(f)


def schema_for(dictionary: str | dict, node: str) -> T.StructType:
    """Explicit StructType for one node type of the dictionary."""
    d = load_dictionary(dictionary)
    if node not in d:
        raise KeyError(f"node {node!r} not in dictionary (has {sorted(d)})")
    return _struct_type(d[node].get("properties", {}))


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast a DataFrame onto a dictionary schema: dictionary fields
    missing from the data become typed nulls; extra data columns are
    dropped; present columns are cast. This is the loader-side contract the
    reference delegates to its schema_path arguments (:230-258)."""
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
