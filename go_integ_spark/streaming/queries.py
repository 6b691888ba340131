"""Streaming queries registered in the driver's correctness gate.

A Structured Streaming job driven to completion with ``availableNow``
must produce exactly the batch answer — so unlike most streaming
code, these get a full value-level DuckDB oracle, proving the
streaming operators (file source, event-time tumbling window, state
store aggregation, memory sink) are lossless end-to-end.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_integ_spark.registry import register
from go_integ_spark.streaming.pipeline import read_stream
from go_integ_spark.tables import load_table


@register(
    "streaming_hourly_counts",
    tags=("streaming", "window", "event_time"),
    oracle="""
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
""",
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window counts computed BY THE STREAMING
    ENGINE (file source -> window agg -> memory sink, availableNow),
    returned as the final materialized table. Hour-aligned window
    starts equal date_trunc('hour'), so the batch SQL oracle applies
    verbatim — the gate checks that incremental state-store
    aggregation loses nothing vs a batch scan.

    Scale shape: in production the same plan reads kafka with a
    watermark; state per (window, event_type) is bounded by the
    watermark horizon, and the memory sink becomes a table/topic
    write.
    """
    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="sg_stream_gate_") + "/events"
    ev.write.mode("overwrite").parquet(path)

    agg = (
        read_stream(spark, path, ev.schema)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"shc_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("hour_start"), "event_type", "n"
    )


@register(
    "streaming_pk_dedup",
    tags=("streaming", "dedup"),
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def streaming_pk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``dropDuplicates`` driven to completion: the state
    store must surface every distinct key exactly once, whatever the
    file/batch arrival order — so projecting the key columns equals
    batch DISTINCT, value-exactly. (Non-key columns are first-arrival
    nondeterministic and deliberately not returned.)

    At scale this is the exactly-once ingestion guard (T5): unbounded
    key state unless bounded by ``withWatermark`` — the watermarked
    variant is ``streaming/pipeline.py::pk_dedup_stream``.
    """
    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="sg_stream_dedup_") + "/events"
    ev.write.mode("overwrite").parquet(path)

    deduped = (
        read_stream(spark, path, ev.schema)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    name = f"spd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
