"""Structured Streaming layer: the streaming analogues of the
reference's incremental sync (SURVEY.md §2.9).

Reference semantics -> Spark streaming mapping:
- T1 sync modes: full_refresh = batch overwrite; incremental =
  cursor-filtered batch (engine/lifecycle) or a continuous stream
  (this module).
- T2 cursor state: the reference checkpoints a JSON cursor doc per
  stream; Structured Streaming checkpoints offsets + state store —
  same at-least-once contract with atomic commit per micro-batch.
- T3 destination modes: outputMode append/complete + foreachBatch
  overwrite.
- T4 watermarks/windows/sessions: absent in the reference
  (processing-time cursor only, shopify.go:71); first-class here.
- T5 exactly-once / PK dedup: dropDuplicates[WithinWatermark] on the
  schema's primary key.

Scale notes: every aggregation here is keyed so state is
hash-partitioned across executors; watermarks bound state size;
``availableNow`` triggers give batch-sized reprocessing with
streaming semantics (the Spark-idiomatic "incremental batch").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_integ_spark.schema.stream import StreamSchema


def read_stream(
    spark: SparkSession,
    path: str,
    schema,
    format: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-backed streaming source. In production the same pipeline
    reads kafka/kinesis; file streaming is the test/backfill path.
    """
    reader = spark.readStream.format(format).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation (T4).

    State is keyed by (window, key): bounded by watermark expiry, so
    at 100 TB/day the state store holds only open windows per key.
    """
    w = (
        F.window(ts_col, window, slide)
        if slide
        else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session-window aggregation: the streaming twin of the batch
    ``events_sessionize`` operator (operators/events.py) — same
    30-minute inactivity gap, incremental state instead of a window
    function over history.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(f"{key_col}"),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def pk_dedup_stream(events: DataFrame, pk: list[str], ts_col: str = "ts",
                    watermark: str = "1 hour") -> DataFrame:
    """T5: primary-key dedup within the watermark horizon —
    dropDuplicatesWithinWatermark keeps state bounded (a plain
    dropDuplicates on an unbounded stream grows state forever; this
    is the 100 TB-safe variant).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(pk)


def incremental_to_protocol(
    spark: SparkSession,
    source_path: str,
    schema: StreamSchema,
    out_dir: str,
    checkpoint_dir: str,
    stream_format: str = "parquet",
) -> None:
    """Streaming read -> Airbyte-envelope NDJSON files via
    foreachBatch, cursor state advanced atomically per micro-batch.

    This is the streaming version of the engine's ``read`` command:
    RECORD lines are written distributed (JVM-side to_json — no
    Python serialization in the row path), and the per-batch STATE
    line commits only after the batch's records are durable — the
    same record-then-state ordering the Airbyte protocol guarantees
    at close (pkg/airbyte/proto.go:43-51).
    """
    cursor = schema.cursor_field()
    name = schema.name

    def emit_batch(batch: DataFrame, epoch_id: int) -> None:
        import time as _time

        from go_integ_spark.protocols.distributed import airbyte_envelope

        # one stamp per micro-batch (reference stamps per flush buffer,
        # stream_proto.go:20-27 — same observable semantics)
        lines = airbyte_envelope(batch, name, int(_time.time() * 1000))
        lines.withColumnRenamed("line", "value").write.mode("append").text(
            f"{out_dir}/records"
        )
        if cursor is not None:
            hi = batch.agg(F.max(cursor)).collect()[0][0]
            if hi is not None:
                import json as _json

                with open(f"{out_dir}/state-{epoch_id:010d}.json", "w") as f:
                    _json.dump(
                        {"type": "STATE", "state": {name: {"To": str(hi)}}}, f
                    )

    q = (
        read_stream(spark, source_path, schema.struct, format=stream_format)
        .writeStream.foreachBatch(emit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
