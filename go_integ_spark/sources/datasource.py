"""Spark 4 Python Data Source wrapping an HttpStream: paginated HTTP
extraction *inside executors*, registered via
``spark.dataSource.register`` and read with
``spark.read.format("http_stream")``.

This is the scale path for connector reads (the Spark-idiomatic
answer to the reference's in-process runner loop, proto.go:283-293):

- **Projection pushdown for free**: Spark hands the reader the pruned
  schema; we forward the pruned field list into the HTTP query
  (``fields=``/``$select=``) exactly like the reference's P1
  (shopify.go:52, storm.go:47).
- **Distributed pagination**: for offset/limit APIs
  (OffsetLimitPaginator), N input partitions fetch interleaved
  offset strides (partition p takes offsets p, p+N, p+2N, ... pages)
  — pagination chains run in parallel across executors. Token/
  link-style paginations are inherently sequential, so they get one
  partition (the API, not Spark, is the bottleneck there).
- The stream spec travels to executors by pickle (everything in
  sources/ is picklable by construction).

Driver-side alternative for small probes: Engine.read_dataframes
(distributed=False).
"""

from __future__ import annotations

import base64
import json
import pickle
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from go_integ_spark.sources.http import OffsetLimitPaginator
from go_integ_spark.sources.source import HttpStream


@dataclass
class _StridePartition(InputPartition):
    index: int
    num: int


class HttpStreamDataSource(DataSource):
    """options:
    - ``spec``: base64(pickle(HttpStream))      [required]
    - ``config``: JSON connector config          [required]
    - ``state``: JSON per-stream state           [optional]
    - ``num_partitions``: offset-stride fan-out  [optional, offset/limit only]
    """

    @classmethod
    def name(cls) -> str:
        return "http_stream"

    def _stream(self) -> HttpStream:
        return pickle.loads(base64.b64decode(self.options["spec"]))

    def schema(self):
        return self._stream().schema.struct

    def reader(self, schema) -> "HttpStreamReader":
        return HttpStreamReader(self._stream(), self.options, schema)


class HttpStreamReader(DataSourceReader):
    def __init__(self, stream: HttpStream, options, schema):
        self.stream = stream
        self.config = json.loads(options.get("config", "{}"))
        self.state = json.loads(options["state"]) if options.get("state") else None
        self.num_partitions = int(options.get("num_partitions", "1"))
        self.transport = (
            pickle.loads(base64.b64decode(options["transport"]))
            if options.get("transport")
            else None
        )
        # Catalyst-pruned schema -> the projection pushed to the server.
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        if self.num_partitions > 1 and isinstance(
            self.stream.paginator(), OffsetLimitPaginator
        ):
            return [
                _StridePartition(i, self.num_partitions)
                for i in range(self.num_partitions)
            ]
        return [_StridePartition(0, 1)]

    def read(self, partition: _StridePartition) -> Iterator[tuple]:
        stream = self.stream
        if partition.num > 1:
            stream = _with_stride(stream, partition.index, partition.num)
        pages, _ = stream.read(
            self.config, self.state, transport=self.transport, fields=self.fields
        )
        names = self.fields
        for page in pages:
            for rec in page:
                yield tuple(rec.get(n) for n in names)


def _with_stride(stream: HttpStream, index: int, num: int) -> HttpStream:
    """Rebind an offset/limit stream so this partition fetches offsets
    index, index+num, index+2num, ... (interleaved stride)."""
    from dataclasses import replace as dc_replace

    base = stream.paginator()
    assert isinstance(base, OffsetLimitPaginator)

    def paginator_factory(
        _base: OffsetLimitPaginator = base, _index: int = index, _num: int = num
    ):
        return _StridedOffsetPaginator(
            offset_param=_base.offset_param,
            limit_param=_base.limit_param,
            page_size=_base.page_size,
            stride=_num,
            _offset=_index * _base.page_size,
        )

    return dc_replace(stream, paginator=paginator_factory)


@dataclass
class _StridedOffsetPaginator(OffsetLimitPaginator):
    stride: int = 1

    def first_params(self):
        return {
            self.offset_param: str(self._offset),
            self.limit_param: str(self.page_size),
        }

    def next(self, prev, resp, records):
        if len(records) < self.page_size:
            return None
        self._offset += self.page_size * self.stride
        from dataclasses import replace

        params = tuple(
            (k, v)
            for k, v in prev.params
            if k not in (self.offset_param, self.limit_param)
        )
        return replace(
            prev,
            params=params
            + (
                (self.offset_param, str(self._offset)),
                (self.limit_param, str(self.page_size)),
            ),
        )


def _warmup_transport(req):
    """Canned empty page: the warmup read stops after one request per
    partition (module-level so it pickles to executors — a __main__
    function does not unpickle in pyspark.daemon workers)."""
    from go_integ_spark.sources.http import HttpResponse

    return HttpResponse(
        status=200,
        headers={"content-type": "application/json"},
        body=b'{"records": []}',
    )


def _warmup_paginator():
    return OffsetLimitPaginator(offset_param="start", limit_param="num", page_size=500)


def warmup_datasource(spark, num_partitions: int = 8) -> None:
    """One empty N-partition Python DataSource read: spins up the
    DataSource planning + worker path so its one-time cost (~3 s
    measured at sf0.1: cold 5.4 s vs warm 2.1 s for the same read) is
    not billed to whichever connector query runs first — the same
    treatment bench.py gives the pandas-UDF worker pool."""
    from go_integ_spark.schema.stream import StreamSchema

    warm_stream = HttpStream(
        schema=StreamSchema.from_ddl("warm", "id bigint"),
        path="/warm",
        record_path="records",
        paginator=_warmup_paginator,
    )
    df, _ = stream_dataframe(
        spark,
        warm_stream,
        {"url": "http://warmup.invalid"},
        None,
        transport=_warmup_transport,
        num_partitions=num_partitions,
    )
    df.write.format("noop").mode("overwrite").save()


def stream_dataframe(spark, stream: HttpStream, config: dict, state, transport=None, num_partitions: int = 1):
    """Register + read an HttpStream as a DataFrame via the Python
    DataSource. Returns (df, new_state) — new_state computed from the
    cursor spec (the executor-side read uses the same window).

    ``transport`` (stub, auth-wrapping, throttled client) is pickled
    into the DataSource options so executors actually use it; a
    non-picklable transport raises here rather than being silently
    swapped for the default urllib transport mid-read.
    """
    try:
        spark.dataSource.register(HttpStreamDataSource)
    except Exception:  # already registered
        pass
    transport_opt = None
    if transport is not None:
        try:
            transport_opt = base64.b64encode(pickle.dumps(transport)).decode()
        except Exception as ex:
            raise ValueError(
                "distributed read requires a picklable transport (or None "
                "for the default urllib transport); got "
                f"{type(transport).__name__}: {ex}"
            ) from ex
    new_state = None
    if stream.cursor is not None:
        from go_integ_spark.sources.source import utc_now

        new_state = stream.cursor.new_state(state, utc_now)
    reader = (
        spark.read.format("http_stream")
        .option("spec", base64.b64encode(pickle.dumps(stream)).decode())
        .option("config", json.dumps(config))
        .option("num_partitions", str(num_partitions))
    )
    if state is not None:
        reader = reader.option("state", json.dumps(state))
    if transport_opt is not None:
        reader = reader.option("transport", transport_opt)
    return reader.schema(stream.schema.struct).load(), new_state
