"""Distributed protocol encoding: the 100 TB path for the NDJSON
sinks.

The driver-side writers (``protocols/airbyte.py`` / ``singer.py``)
are faithful to the reference's wire — a single stdout pipe
(reference proto.go:347-363 buffers + flushes one stream). That
serializes all encoding through one process, which caps throughput at
one core no matter the cluster. Here the same envelopes are built
JVM-side with ``to_json`` (whole-stage codegen, zero Python in the
record path) and written as parallel part-files — every executor
encodes its own partitions, so protocol emission scales with the
cluster like any other write.

Envelope shapes match the reference exactly:
- Airbyte RECORD (pkg/airbyte/proto.go:21-32):
  ``{"type":"RECORD","record":{"stream":S,"emitted_at":ms,"data":...}}``
- Singer RECORD (pkg/singer/singer.go:20-34):
  ``{"type":"RECORD","stream":S,"time_extracted":unix,"record":...}``

``emitted_at``/``time_extracted`` are injected per batch (the
reference stamps per flush buffer; one timestamp per write is the
same observable semantics and keeps the output deterministic for
golden tests).

tests/test_distributed_sink.py pins byte-agreement with the
driver-side Python encoders; the ``sink_airbyte_envelope`` query
pins byte-agreement with DuckDB's JSON serializer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_integ_spark.registry import register
from go_integ_spark.tables import load_table


def airbyte_envelope(df: DataFrame, stream: str, emitted_at_ms: int) -> DataFrame:
    """(line: string) — one Airbyte RECORD envelope per row, encoded
    JVM-side. Null fields are dropped by ``to_json`` (matching
    fastjson's omitempty-style marshal of absent values)."""
    return df.select(
        F.to_json(
            F.struct(
                F.lit("RECORD").alias("type"),
                F.struct(
                    F.lit(stream).alias("stream"),
                    F.lit(emitted_at_ms).alias("emitted_at"),
                    F.struct(*[F.col(c) for c in df.columns]).alias("data"),
                ).alias("record"),
            )
        ).alias("line")
    )


def singer_envelope(df: DataFrame, stream: str, time_extracted: int) -> DataFrame:
    """(line: string) — one Singer RECORD envelope per row."""
    return df.select(
        F.to_json(
            F.struct(
                F.lit("RECORD").alias("type"),
                F.lit(stream).alias("stream"),
                F.lit(time_extracted).alias("time_extracted"),
                F.struct(*[F.col(c) for c in df.columns]).alias("record"),
            )
        ).alias("line")
    )


def write_ndjson(lines: DataFrame, path: str, compression: str | None = None) -> None:
    """Parallel NDJSON write: one part-file per partition, optional
    codec (the distributed analogue of the reference's zstd response
    option, proto.go:196-204)."""
    w = lines.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


_SINK_TS = 1700000000000  # fixed stamp so the oracle is deterministic


@register(
    "sink_airbyte_envelope",
    tags=("sink", "protocol"),
    bench=True,  # the reference's primary function: envelope emission throughput
    oracle=f"""
SELECT to_json({{type: 'RECORD', record: {{stream: 'orders',
           emitted_at: {_SINK_TS},
           data: {{o_orderkey: o_orderkey, o_custkey: o_custkey,
                   o_orderstatus: o_orderstatus,
                   o_orderpriority: o_orderpriority}}}}}})::VARCHAR AS line
FROM orders
""",
)
def sink_airbyte_envelope(spark, sf_dir: str) -> DataFrame:
    """Airbyte RECORD envelopes for the orders stream, encoded
    entirely JVM-side — DuckDB builds the identical bytes, so the
    driver gate checks the encoder, not just row counts. (Stable
    column subset: JSON float formatting differs across engines.)
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    return airbyte_envelope(orders, "orders", _SINK_TS)


@register(
    "sink_singer_envelope",
    tags=("sink", "protocol"),
    oracle=f"""
SELECT to_json({{type: 'RECORD', stream: 'customer',
           time_extracted: {_SINK_TS},
           record: {{c_custkey: c_custkey, c_name: c_name,
                     c_mktsegment: c_mktsegment,
                     c_nationkey: c_nationkey}}}})::VARCHAR AS line
FROM customer
""",
)
def sink_singer_envelope(spark, sf_dir: str) -> DataFrame:
    """Singer RECORD envelopes for the customer stream (K3's
    distributed emission path) — the Singer twin of
    ``sink_airbyte_envelope``: the envelope is flat (stream and
    time_extracted ride at the top level next to the record, per the
    Singer spec) where Airbyte nests everything under ``record``.
    Encoded entirely JVM-side; DuckDB builds the identical bytes, so
    the driver gate value-checks the encoder itself. Pure map-side
    projection — envelope emission runs at scan speed at 100 TB.
    """
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey"
    )
    return singer_envelope(customer, "customer", _SINK_TS)
