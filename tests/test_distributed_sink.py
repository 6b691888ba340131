"""Distributed (JVM to_json) protocol encoding must agree with the
driver-side Python encoders byte-for-byte on the same rows, and the
parallel NDJSON write must round-trip.
"""

from __future__ import annotations

import datetime as dt
import io
import json

from go_integ_spark.protocols.airbyte import AirbyteWriter
from go_integ_spark.protocols.distributed import (
    airbyte_envelope,
    singer_envelope,
    write_ndjson,
)
from go_integ_spark.protocols.singer import SingerWriter
from go_integ_spark.schema.stream import StreamSchema

ROWS = [
    {"id": 1, "name": "alpha", "qty": 3},
    {"id": 2, "name": "beta", "qty": 7},
]
TS_MS = 1700000000000
CLOCK = lambda: dt.datetime.fromtimestamp(TS_MS / 1000, dt.timezone.utc)  # noqa: E731


def _schema():
    return StreamSchema.from_ddl("items", "id bigint, name string, qty bigint")


def test_airbyte_envelope_matches_python_encoder(spark):
    df = spark.createDataFrame([(r["id"], r["name"], r["qty"]) for r in ROWS],
                               ["id", "name", "qty"])
    jvm_lines = sorted(r["line"] for r in airbyte_envelope(df, "items", TS_MS).collect())

    out = io.StringIO()
    w = AirbyteWriter(out, clock=CLOCK)
    w.open_stream(_schema()).emit_records(ROWS)
    py_lines = sorted(line for line in out.getvalue().splitlines() if line)

    assert [json.loads(l) for l in jvm_lines] == [json.loads(l) for l in py_lines]


def test_singer_envelope_matches_python_encoder(spark):
    df = spark.createDataFrame([(r["id"], r["name"], r["qty"]) for r in ROWS],
                               ["id", "name", "qty"])
    jvm_lines = sorted(
        r["line"] for r in singer_envelope(df, "items", TS_MS // 1000).collect()
    )

    out = io.StringIO()
    w = SingerWriter(out, clock=CLOCK)
    w.open_stream(_schema()).emit_records(ROWS)
    py_lines = sorted(
        line for line in out.getvalue().splitlines()
        if json.loads(line)["type"] == "RECORD"
    )

    assert [json.loads(l) for l in jvm_lines] == [json.loads(l) for l in py_lines]


def test_write_ndjson_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(i, f"n{i}") for i in range(100)], ["id", "name"])
    path = str(tmp_path / "out")
    write_ndjson(airbyte_envelope(df, "items", TS_MS), path)
    back = spark.read.text(path)
    assert back.count() == 100
    ids = sorted(
        json.loads(r["value"])["record"]["data"]["id"] for r in back.collect()
    )
    assert ids == list(range(100))
