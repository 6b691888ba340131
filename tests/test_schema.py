from __future__ import annotations

import pytest
from pyspark.sql import types as T

from go_integ_spark.schema.stream import (
    Field,
    StreamSchema,
    json_schema_to_spark_type,
    parse_ddl,
    spark_type_to_json_schema,
)


def test_parse_ddl_primitives_and_nested():
    st = parse_ddl(
        "id long, name string, ok boolean, score double, "
        "tags array<string>, meta struct<a: int, b: string>, m map<string, double>"
    )
    assert st["id"].dataType == T.LongType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert st["meta"].dataType == T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    assert st["m"].dataType == T.MapType(T.StringType(), T.DoubleType())


def test_json_schema_reflection():
    # nested struct parity with reference storm items (types.go:20-31)
    s = StreamSchema.from_ddl(
        "items",
        "StatusId long, PartNo string, IsBuyable boolean, "
        "Product struct<Id: long, ManufacturerId: long, ManufacturerPartNo: string>",
    )
    js = s.json_schema()
    assert js["type"] == "object"
    assert js["properties"]["Product"]["type"] == "object"
    assert js["properties"]["Product"]["properties"]["Id"] == {"type": "integer"}
    # round trip back to spark types
    back = json_schema_to_spark_type(js)
    assert isinstance(back, T.StructType)
    assert back["Product"].dataType["Id"].dataType == T.LongType()


def test_field_keys_sorted_projection():
    # reference FieldKeys: sorted property names (schema.go:72-74)
    s = StreamSchema.from_ddl("u", "b string, a string, c long")
    assert s.field_keys() == ["a", "b", "c"]


def test_key_metadata_builders_and_validate():
    s = (
        StreamSchema.from_ddl("users", "id long, updated_at string")
        .primary(Field("id"))
        .ordered_by(Field("updated_at").desc())
        .iterated_by("updated_at")
    )
    assert s.incremental
    assert s.cursor_field() == "updated_at"
    s.validate()
    bad = StreamSchema.from_ddl("x", "a string").primary(Field("missing"))
    with pytest.raises(ValueError, match="missing"):
        bad.validate()


def test_timestamp_and_binary_json_schema():
    js = spark_type_to_json_schema(parse_ddl("ts timestamp, blob binary"))
    assert js["properties"]["ts"] == {"type": "string", "format": "date-time"}
    assert js["properties"]["blob"]["contentEncoding"] == "base64"


def test_entry_queries_cost_ascending_and_complete():
    """The driver-gate ordering contract: every registered query has a
    measured cost entry (new queries must be timed via
    scripts/time_queries.py), and queries() iterates cheapest-first so
    a time-budgeted gate sweep completes the maximum number of rows."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    missing = [n for n in names if n not in entry._MEASURED_COST]
    assert not missing, f"untimed queries (run scripts/time_queries.py): {missing}"
    costs = [entry._MEASURED_COST[n] for n in names]
    assert costs == sorted(costs)
    assert set(entry.oracle_sql()) <= set(names)
