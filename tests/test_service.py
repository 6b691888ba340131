"""HTTP service mode (reference R6): /discover listing, /{source}/
{cmd} dispatch with the NDJSON envelope as request body, longest-
prefix source matching, gzip response negotiation, 404/500 paths.
"""

from __future__ import annotations

import gzip
import json
import urllib.request

import pytest

from go_integ_spark.engine.service import IntegService
from go_integ_spark.examples.connectors import pokeapi, shopify
from tests.stub_server import StubServer


@pytest.fixture(scope="module")
def upstream():
    with StubServer() as s:
        yield s


@pytest.fixture(scope="module")
def service(upstream):
    svc = IntegService({"pokeapi": pokeapi, "shopify": shopify})
    server = svc.serve()
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url: str, body: str, headers: dict | None = None) -> tuple[int, bytes, dict]:
    req = urllib.request.Request(
        url, data=body.encode(), method="POST", headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_discover_lists_sources(service):
    with urllib.request.urlopen(f"{service}/discover") as resp:
        assert json.loads(resp.read()) == ["pokeapi", "shopify"]


def test_spec_roundtrip(service):
    status, body, _ = _post(f"{service}/pokeapi/spec", "")
    assert status == 200
    msg = json.loads(body.splitlines()[0])
    assert msg["type"] == "SPEC"


def test_read_with_envelope_body(service, upstream):
    envelope = "\n".join(
        [
            json.dumps({"type": "SETTINGS", "settings": {"format": "airbyte"}}),
            json.dumps({"type": "CONFIG", "config": {"url": upstream.base}}),
        ]
    )
    status, body, _ = _post(f"{service}/pokeapi/read", envelope)
    assert status == 200
    msgs = [json.loads(line) for line in body.splitlines()]
    assert sum(m["type"] == "RECORD" for m in msgs) == 25


def test_gzip_negotiation(service, upstream):
    envelope = json.dumps({"type": "CONFIG", "config": {"url": upstream.base}})
    status, body, headers = _post(
        f"{service}/pokeapi/read", envelope, {"Accept-Encoding": "gzip"}
    )
    assert status == 200
    assert headers.get("Content-Encoding") == "gzip"
    lines = gzip.decompress(body).splitlines()
    assert sum(json.loads(ln)["type"] == "RECORD" for ln in lines) == 25


def test_zstd_negotiation(service, upstream):
    """reference proto.go:196-204: Accept-Zstd wraps the response in
    zstd; round-trip through the repo's own reader."""
    import io

    from go_integ_spark.engine.compress import read_compressed

    envelope = json.dumps({"type": "CONFIG", "config": {"url": upstream.base}})
    status, body, headers = _post(
        f"{service}/pokeapi/read", envelope, {"Accept-Zstd": "1"}
    )
    assert status == 200
    assert headers.get("Content-Encoding") == "zstd"
    assert body[:4] == bytes.fromhex("28b52ffd")  # standard zstd frame
    lines = read_compressed(io.BytesIO(body), "zstd").read().splitlines()
    assert sum(json.loads(ln)["type"] == "RECORD" for ln in lines) == 25


def test_unknown_source_or_cmd_404(service):
    assert _post(f"{service}/nosuch/read", "")[0] == 404
    assert _post(f"{service}/pokeapi/frobnicate", "")[0] == 404


def test_singer_format_selectable(service, upstream):
    envelope = "\n".join(
        [
            json.dumps({"type": "SETTINGS", "settings": {"format": "singer"}}),
            json.dumps({"type": "CONFIG", "config": {"url": upstream.base}}),
        ]
    )
    status, body, _ = _post(f"{service}/pokeapi/read", envelope)
    assert status == 200
    first = json.loads(body.splitlines()[0])
    assert first["type"] == "SCHEMA"  # Singer emits SCHEMA up-front
