"""Declarative stream schemas -> Spark StructType + key metadata.

Capability parity with the reference's schema system
(/root/reference/schema.go:5-105): a stream is a named, typed record
collection with primary-key / order-by / iterate-by (cursor) field
metadata, reflected into JSON Schema for catalog emission
(/root/reference/schema.go:27-35 uses Go-struct reflection; here the
declaration is explicit Spark types, and JSON Schema is derived).

Unlike the reference (whose ``Schema.Validate`` is a stub,
schema.go:19-21), ``StreamSchema.validate`` actually checks that key
fields exist.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T


class SortOrder(enum.Enum):
    # reference: schema.go:82-95 (SortOrder ASC/DESC on FieldDef)
    ASC = "ASC"
    DESC = "DESC"


@dataclass(frozen=True)
class Field:
    """A key-field reference with optional sort order
    (reference FieldDef: schema.go:97-105)."""

    path: str
    order: SortOrder = SortOrder.ASC

    def asc(self) -> "Field":
        return Field(self.path, SortOrder.ASC)

    def desc(self) -> "Field":
        return Field(self.path, SortOrder.DESC)


# Spark type -> JSON Schema type mapping (reference relies on
# go-jsonschema-generator reflection; the type surface it uses is
# int/float/string/bool/nested struct — SURVEY.md §1.3).
_JSON_TYPES: list[tuple[type, dict]] = [
    (T.StringType, {"type": "string"}),
    (T.BooleanType, {"type": "boolean"}),
    (T.LongType, {"type": "integer"}),
    (T.IntegerType, {"type": "integer"}),
    (T.ShortType, {"type": "integer"}),
    (T.ByteType, {"type": "integer"}),
    (T.DoubleType, {"type": "number"}),
    (T.FloatType, {"type": "number"}),
    (T.TimestampType, {"type": "string", "format": "date-time"}),
    (T.DateType, {"type": "string", "format": "date"}),
    (T.BinaryType, {"type": "string", "contentEncoding": "base64"}),
]


def spark_type_to_json_schema(dt: T.DataType) -> dict:
    if isinstance(dt, T.StructType):
        return {
            "type": "object",
            "properties": {f.name: spark_type_to_json_schema(f.dataType) for f in dt.fields},
            "required": sorted(f.name for f in dt.fields if not f.nullable),
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": spark_type_to_json_schema(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {
            "type": "object",
            "additionalProperties": spark_type_to_json_schema(dt.valueType),
        }
    if isinstance(dt, T.DecimalType):
        return {"type": "number"}
    for klass, js in _JSON_TYPES:
        if isinstance(dt, klass):
            return dict(js)
    raise TypeError(f"no JSON Schema mapping for Spark type {dt}")


_SPARK_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
}


def json_schema_to_spark_type(js: dict) -> T.DataType:
    t = js.get("type")
    if t == "object":
        if "properties" in js:
            return T.StructType(
                [
                    T.StructField(k, json_schema_to_spark_type(v))
                    for k, v in js["properties"].items()
                ]
            )
        return T.MapType(T.StringType(), T.StringType())
    if t == "array":
        return T.ArrayType(json_schema_to_spark_type(js.get("items", {"type": "string"})))
    if t == "string" and js.get("format") == "date-time":
        return T.TimestampType()
    if t in _SPARK_TYPES:
        return _SPARK_TYPES[t]
    return T.StringType()


@dataclass
class StreamSchema:
    """Declarative stream definition (reference Schema, schema.go:5-17).

    Builder-style modifiers mirror the reference's fluent API
    (``.Primary(...)``/.OrderBy(...)/.IterateBy(...),
    schema.go:42-70) but return self for chaining.
    """

    name: str
    struct: T.StructType
    namespace: str = ""
    primary_key: tuple[Field, ...] = ()
    order_by: tuple[Field, ...] = ()
    iterate_by: tuple[Field, ...] = ()  # cursor key(s)
    incremental: bool = False

    def primary(self, *fields: Field | str) -> "StreamSchema":
        self.primary_key = tuple(Field(f) if isinstance(f, str) else f for f in fields)
        return self

    def ordered_by(self, *fields: Field | str) -> "StreamSchema":
        self.order_by = tuple(Field(f) if isinstance(f, str) else f for f in fields)
        return self

    def iterated_by(self, *fields: Field | str) -> "StreamSchema":
        self.iterate_by = tuple(Field(f) if isinstance(f, str) else f for f in fields)
        self.incremental = True
        return self

    # -- derived ----------------------------------------------------------
    def field_keys(self) -> list[str]:
        """Sorted top-level field names — the projection list pushed to
        servers (reference FieldKeys: schema.go:72-74, utils.go:26-33,
        consumed as ``fields=``/``$select=`` in every integration).
        """
        return sorted(f.name for f in self.struct.fields)

    def json_schema(self) -> dict:
        return spark_type_to_json_schema(self.struct)

    def cursor_field(self) -> str | None:
        return self.iterate_by[0].path if self.iterate_by else None

    def validate(self) -> None:
        names = {f.name for f in self.struct.fields}
        for group, fields in (
            ("primary_key", self.primary_key),
            ("order_by", self.order_by),
            ("iterate_by", self.iterate_by),
        ):
            for f in fields:
                top = f.path.split(".")[0]
                if top not in names:
                    raise ValueError(
                        f"stream {self.name!r}: {group} field {f.path!r} "
                        f"not in schema fields {sorted(names)}"
                    )

    @classmethod
    def from_ddl(cls, name: str, ddl: str, **kw) -> "StreamSchema":
        """Build from a DDL string, e.g. ``"id long, email string"``.

        Parsed locally (not via StructType.fromDDL) so stream
        declarations never need a live SparkContext — the connector
        layer is usable from a plain Python process, like the
        reference's CLI mode.
        """
        return cls(name=name, struct=parse_ddl(ddl), **kw)


_DDL_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "byte": T.ByteType(),
    "tinyint": T.ByteType(),
    "short": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_ddl_type(s: str) -> T.DataType:
    s = s.strip()
    low = s.lower()
    if low in _DDL_PRIMITIVES:
        return _DDL_PRIMITIVES[low]
    if low.startswith("decimal"):
        inner = s[s.index("(") + 1 : s.rindex(")")] if "(" in s else "10,0"
        p, sc = (int(x) for x in inner.split(","))
        return T.DecimalType(p, sc)
    if low.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_ddl_type(s[6:-1]))
    if low.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[4:-1])
        return T.MapType(parse_ddl_type(k), parse_ddl_type(v))
    if low.startswith("struct<") and s.endswith(">"):
        return parse_ddl(s[7:-1])
    raise ValueError(f"cannot parse DDL type {s!r}")


def parse_ddl(ddl: str) -> T.StructType:
    fields = []
    for part in _split_top(ddl):
        name, _, typ = part.partition(" ")
        if not typ:
            name, _, typ = part.partition(":")
        fields.append(T.StructField(name.strip().strip(":"), parse_ddl_type(typ)))
    return T.StructType(fields)
