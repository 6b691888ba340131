"""Manual (push-model) sources (reference S13: ManualRunner,
frontend.go:13-15, backend.go:9-47) and NDJSON output compression
(reference K5: zstd response wrapping, proto.go:196-204).
"""

from __future__ import annotations

import datetime as dt
import io
import json

import pytest

from go_integ_spark.engine.compress import read_compressed, wrap_output
from go_integ_spark.protocols.airbyte import AirbyteWriter
from go_integ_spark.schema.stream import StreamSchema
from go_integ_spark.sources.manual import ManualContext, ManualSource

FIXED_CLOCK = lambda: dt.datetime(2022, 4, 7, 12, 0, 0, tzinfo=dt.timezone.utc)  # noqa: E731

USERS = StreamSchema.from_ddl("users", "id long, name string")
TAGS = StreamSchema.from_ddl("tags", "id long, label string")


def _runner(ctx: ManualContext) -> None:
    config, state = ctx.load()
    users = ctx.stream(USERS)
    tags = ctx.stream(TAGS)
    users.emit({"id": 1, "name": "ada"}, {"id": 2, "name": "bob"})
    tags.emit_batch([{"id": 10, "label": config["label"]}])
    users.emit({"id": 3, "name": "eve"})
    users.emit_state({"max_id": 3})


SOURCE = ManualSource(name="manual-demo", runner=_runner)


def test_manual_runner_collects_per_stream_rows():
    ctx = SOURCE.run({"label": "x"})
    assert sorted(ctx.handles) == ["tags", "users"]
    assert [r["id"] for r in ctx.handles["users"].rows] == [1, 2, 3]
    assert ctx.handles["tags"].rows == [{"id": 10, "label": "x"}]


def test_manual_runner_emits_through_protocol():
    buf = io.StringIO()
    writer = AirbyteWriter(buf, clock=FIXED_CLOCK)
    SOURCE.run({"label": "x"}, writer=writer)
    msgs = [json.loads(line) for line in buf.getvalue().splitlines()]
    recs = [m for m in msgs if m["type"] == "RECORD"]
    assert [m["record"]["stream"] for m in recs] == ["users", "users", "tags", "users"]
    states = [m for m in msgs if m["type"] == "STATE"]
    assert states and states[-1]["state"]["users"] == {"max_id": 3}


def test_manual_dataframes_typed(spark):
    dfs = SOURCE.dataframes(spark, {"label": "x"})
    assert dfs["users"].schema.simpleString() == "struct<id:bigint,name:string>"
    assert dfs["users"].count() == 3
    assert dfs["tags"].collect()[0]["label"] == "x"


@pytest.mark.parametrize("codec", ["none", "gzip", "zstd"])
def test_compression_round_trip(codec):
    raw = io.BytesIO()
    out = wrap_output(raw, codec)
    out.write('{"type":"RECORD"}\n{"type":"STATE"}\n')
    out.close()
    back = read_compressed(io.BytesIO(raw.getvalue()), codec)
    assert back.read().count("\n") == 2


def test_zstd_emits_standard_frames():
    """The zstd wire bytes must be real zstd (reference clients use
    libzstd): standard frame magic, decompressible by an independent
    decoder (pyarrow's one-shot codec)."""
    import pyarrow as pa

    raw = io.BytesIO()
    out = wrap_output(raw, "zstd")
    out.write("x\n" * 100)
    out.close()
    frame = raw.getvalue()
    assert frame[:4] == bytes.fromhex("28b52ffd")  # zstd frame magic
    got = pa.Codec("zstd").decompress(frame, decompressed_size=200, asbytes=True)
    assert got == b"x\n" * 100


# --- F1: secret masking (reference MaskedString, utils.go:12-24) ----------
def test_masked_str_and_config_masking():
    import json

    from go_integ_spark.engine.envelope import MaskedStr, mask_config

    s = MaskedStr("hunter22")
    assert s == "hunter22"  # usable as the real value in code
    assert s.masked() == "x" * 8  # len-preserving, like the reference
    schema = {
        "properties": {
            "api_key": {"type": "string", "airbyte_secret": True},
            "token": {"type": "string", "writeOnly": True},
            "url": {"type": "string"},
        }
    }
    cfg = {"api_key": "secret99", "token": "t0k3n", "url": "https://x", "n": 3}
    safe = mask_config(cfg, schema)
    assert safe == {"api_key": "xxxxxxxx", "token": "xxxxx", "url": "https://x", "n": 3}
    # MaskedStr masks regardless of schema
    assert mask_config({"p": MaskedStr("abc")})["p"] == "xxx"
    assert "secret99" not in json.dumps(safe)
