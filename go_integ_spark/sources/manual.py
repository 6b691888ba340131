"""Manual (push-model) sources: a runner opens arbitrary streams and
pushes typed rows itself, instead of the engine pulling pages from a
paginated HTTP stream.

Reference parity: ``ManualRunner``/``ManualContext`` + the backend
stream registry that collects per-stream flushers and closes them at
the end of the run (frontend.go:13-15, backend.go:9-47,
sourcedef.go:103-106,176-184, proto.go:31-35).

Spark mapping: each pushed stream becomes a programmatically created
DataFrame (``spark.createDataFrame`` with the declared StructType).
Manual runners execute driver-side by nature — exactly like the
reference, where the runner is one goroutine — so they are for
low-volume control-plane streams (settings, catalogs, small
dimension feeds); high-volume extraction belongs to the partitioned
HTTP DataSource (sources/datasource.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from go_integ_spark.protocols.base import ProtocolWriter, StreamWriter
from go_integ_spark.schema.stream import StreamSchema


class ManualStreamHandle:
    """What ``ctx.stream(schema)`` returns: an emitter the runner
    pushes record batches into (reference backend.go:19-37 — `Stream`
    returns the protocol's per-stream writer and registers its
    flusher)."""

    def __init__(self, schema: StreamSchema, writer: StreamWriter | None):
        self.schema = schema
        self.rows: list[dict] = []
        self._writer = writer

    def emit(self, *records: dict) -> None:
        self.rows.extend(records)
        if self._writer:
            self._writer.emit_records(list(records))

    def emit_batch(self, records: list[dict]) -> None:
        self.rows.extend(records)
        if self._writer:
            self._writer.emit_records(records)

    def emit_state(self, state: Any) -> None:
        if self._writer:
            self._writer.emit_state(state)


class ManualContext:
    """Run context handed to a manual runner (reference
    ManualContext = Loader + Stream opener, frontend.go:13-15)."""

    def __init__(
        self,
        config: dict,
        state: dict | None = None,
        writer: ProtocolWriter | None = None,
    ):
        self._config = config
        self._state = state
        self._writer = writer
        self.handles: dict[str, ManualStreamHandle] = {}

    def load(self) -> tuple[dict, dict | None]:
        """Config + state in one call (reference protocol.go:35-53)."""
        return self._config, self._state

    def stream(self, schema: StreamSchema) -> ManualStreamHandle:
        if schema.name in self.handles:
            return self.handles[schema.name]
        sw = self._writer.open_stream(schema) if self._writer else None
        handle = ManualStreamHandle(schema, sw)
        self.handles[schema.name] = handle
        return handle


ManualRunner = Callable[[ManualContext], None]


@dataclass
class ManualSource:
    """A push-model connector: one runner, streams opened at run time
    (reference sourcedef.go:103-106 ``Manual(...)``)."""

    name: str
    runner: ManualRunner
    config_json_schema: dict = field(default_factory=dict)
    docs_url: str = ""

    def run(
        self,
        config: dict,
        state: dict | None = None,
        writer: ProtocolWriter | None = None,
    ) -> ManualContext:
        """Execute the runner; protocol emission (if a writer is
        given) happens inline as the runner pushes. Returns the
        context with all opened handles and their collected rows."""
        ctx = ManualContext(config, state, writer)
        self.runner(ctx)
        if writer:
            writer.close("read")
        return ctx

    def dataframes(self, spark, config: dict, state: dict | None = None) -> dict:
        """Run and materialize every pushed stream as a DataFrame
        with its declared StructType."""
        ctx = self.run(config, state)
        return {
            name: spark.createDataFrame(h.rows, schema=h.schema.struct)
            for name, h in ctx.handles.items()
        }
