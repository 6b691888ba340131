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


def test_entry_queries_family_round_robin_and_complete():
    """The driver-gate ordering contract: every registered query has a
    measured cost entry (new queries must be timed via
    scripts/time_queries.py), and queries() iterates in rotated family
    round-robin order so a time-budgeted gate sweep verifies every
    operator family every round (cost-ascending starved the tail: 35
    queries never got a driver CORRECTNESS row in rounds 1-3)."""
    import __spark_entry__ as entry
    from go_integ_spark.registry import load_all

    names = list(entry.queries())
    registry = load_all()
    assert set(names) == set(registry), "queries() must expose the full registry"
    missing = [n for n in names if n not in entry._MEASURED_COST]
    assert not missing, f"untimed queries (run scripts/time_queries.py): {missing}"

    fam = {n: (s.tags[0] if s.tags else "misc") for n, s in registry.items()}
    n_families = len(set(fam.values()))
    lead_block = names[:n_families]
    assert len({fam[n] for n in lead_block}) == n_families, (
        "first block must cover every operator family exactly once"
    )
    # Rank blocks: the i-th occurrence of a family must come after all
    # (i-1)-th occurrences — i.e. occurrence index is non-decreasing.
    seen: dict[str, int] = {}
    ranks = []
    for n in names:
        ranks.append(seen.get(fam[n], 0))
        seen[fam[n]] = ranks[-1] + 1
    assert ranks == sorted(ranks)
    # Rotation advances with the completed-round count, so across
    # rounds different family members occupy the lead block.
    assert entry._round_index() >= 0
    assert set(entry.oracle_sql()) <= set(names)


def test_entry_rotation_cycles_every_query_through_lead_block(monkeypatch):
    """Across consecutive rounds the rotation must put EVERY member of
    every family at the front of its family exactly once per cycle —
    the property that guarantees the driver's time-budgeted gate
    eventually verifies the whole registry even if it only ever
    reaches the first blocks."""
    import __spark_entry__ as entry
    from go_integ_spark.registry import load_all

    registry = load_all()
    fam = {n: (s.tags[0] if s.tags else "misc") for n, s in registry.items()}
    n_families = len(set(fam.values()))
    max_family = max(
        sum(1 for f in fam.values() if f == g) for g in set(fam.values())
    )
    leads: set[str] = set()
    for rot in range(max_family):
        monkeypatch.setattr(entry, "_round_index", lambda r=rot: r)
        leads.update(entry._ordered_names()[:n_families])
    # every family of size <= max_family cycles fully within
    # max_family rounds; families smaller than max_family wrap early,
    # so the union of lead blocks must cover the whole registry.
    assert leads == set(registry)
