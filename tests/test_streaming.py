"""Structured Streaming tests: driven to completion synchronously
with availableNow + processAllAvailable over parquet file sources.
"""

from __future__ import annotations

import json
import uuid

import pytest
from pyspark.sql import functions as F

from go_integ_spark.schema.stream import StreamSchema
from go_integ_spark.streaming.pipeline import (
    incremental_to_protocol,
    pk_dedup_stream,
    read_stream,
    session_counts,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    # re-write events at micro-precision ts (streaming sources read
    # the raw nanos parquet as long; use the converted loader output)
    from go_integ_spark.tables import load_table

    p = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, SF, "events").write.parquet(p)
    return p


def _run_to_memory(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if df.isStreaming else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_windowed_counts_match_batch(spark, events_path):
    from go_integ_spark.tables import load_table

    schema = spark.read.parquet(events_path).schema
    stream = read_stream(spark, events_path, schema)
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts(stream, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT * FROM {name}")
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    # streaming append emits only watermark-closed windows; with
    # watermark 0s + availableNow all but the final window close.
    got_n = got.agg(F.sum("n")).collect()[0][0]
    batch_n = batch.agg(F.sum("n")).collect()[0][0]
    assert got_n is not None and batch_n is not None
    assert got_n <= batch_n
    # every emitted window matches the batch computation exactly
    j = got.join(
        batch.select(
            F.col("win.start").alias("window_start"),
            "event_type",
            F.col("n").alias("batch_n"),
        ),
        ["window_start", "event_type"],
    )
    assert j.filter(F.col("n") != F.col("batch_n")).count() == 0
    assert j.count() == got.count()


def test_session_counts_runs(spark, events_path):
    schema = spark.read.parquet(events_path).schema
    stream = read_stream(spark, events_path, schema)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        session_counts(stream, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() > 0
    # sessions are per-user, start <= end
    assert out.filter(F.col("session_start") > F.col("session_end")).count() == 0


def test_pk_dedup_stream(spark, tmp_path):
    src = str(tmp_path / "dup")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:05:00", 2.0),
         (2, "2024-01-01 00:01:00", 3.0)],
        "event_id long, ts_s string, value double",
    ).selectExpr("event_id", "cast(ts_s as timestamp) as ts", "value").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_stream(spark, src, schema)
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        pk_dedup_stream(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(f"SELECT * FROM {name}")
    assert out.count() == 2  # one row per PK within watermark


def test_stateful_running_cursor(spark, events_path):
    from go_integ_spark.streaming.stateful import running_max_cursor

    schema = spark.read.parquet(events_path).schema
    stream = read_stream(spark, events_path, schema).select("user_id", "ts", "value")
    name = f"cur_{uuid.uuid4().hex[:8]}"
    q = (
        running_max_cursor(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(f"SELECT * FROM {name}")
    # final state per user matches the batch aggregate
    batch = (
        spark.read.parquet(events_path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.max("ts").alias("max_ts"),
            F.sum("value").alias("total_value"),
        )
    )
    # take the last update per user (update mode may emit per batch)
    from pyspark.sql import Window

    last = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_total").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    j = last.join(batch, "user_id", "inner")
    bad = j.filter(
        (last["n_total"] != batch["n_total"]) | (last["max_ts"] != batch["max_ts"])
    )
    assert bad.count() == 0
    assert last.count() == batch.count()


def test_incremental_to_protocol_sink(spark, events_path, tmp_path):
    schema = StreamSchema(
        name="events",
        struct=spark.read.parquet(events_path).schema,
    ).iterated_by("ts")
    out_dir = str(tmp_path / "out")
    incremental_to_protocol(
        spark, events_path, schema, out_dir, str(tmp_path / "ckpt")
    )
    recs = spark.read.text(f"{out_dir}/records")
    n_src = spark.read.parquet(events_path).count()
    assert recs.count() == n_src
    line = json.loads(recs.limit(1).collect()[0].value)
    assert line["type"] == "RECORD" and line["record"]["stream"] == "events"
    assert set(line["record"]) == {"stream", "emitted_at", "data"}
    states = sorted((tmp_path / "out").glob("state-*.json"))
    assert states
    last_state = json.loads(states[-1].read_text())
    assert last_state["state"]["events"]["To"] >= "2024-01-30"


def test_watermark_drops_late_data_append_mode(spark, tmp_path):
    """Append-mode windowed agg with a 30-min watermark, driven batch
    by batch (maxFilesPerTrigger=1, mtime-ordered files):

    - batch 1: 10:05, 10:45, 11:55  -> watermark after batch = 11:25
    - batch 2: 10:15 (LATE: its [10:00,11:00) window is already past
      the watermark -> dropped), 12:10 (open window, never finalized)

    Final append output must be exactly one finalized window
    [10:00,11:00) with count 2 — late row excluded, open windows
    withheld. This is the semantics the batch oracle can't see.
    """
    import datetime as dt
    import os
    import time
    import uuid

    d = str(tmp_path / "wm_events")
    os.makedirs(d)
    schema = "user_id long, ts timestamp"

    def write_file(idx, rows):
        # the file source watches d non-recursively: write elsewhere,
        # move the part-file in, and order batches by mtime
        df = spark.createDataFrame(rows, schema).coalesce(1)
        staging = f"{d}_staging{idx}"
        df.write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        dest = os.path.join(d, f"batch{idx}.parquet")
        os.rename(os.path.join(staging, part), dest)
        os.utime(dest, (idx * 1000, idx * 1000))

    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write_file(1, [(1, T(10, 5)), (2, T(10, 45)), (3, T(11, 55))])

    stream = (
        spark.readStream.schema(schema)
        .parquet(d)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 -> watermark = 11:25
        write_file(2, [(4, T(10, 15)), (5, T(12, 10))])
        q.processAllAvailable()  # batch 2: 10:15 late-dropped, window emitted
    finally:
        q.stop()
    out = [
        (r["w"]["start"], r["n"]) for r in spark.table(name).collect()
    ]
    assert out == [(T(10, 0), 2)], out


def test_tws_user_profile_matches_batch(spark):
    """transformWithState final state == batch aggregate. Skipped
    where protobuf (the TWS state-server protocol) is unavailable."""
    import pytest as _pytest

    from go_integ_spark.streaming.queries import (
        _streaming_tws_user_profile,
        _tws_available,
    )

    if not _tws_available():
        _pytest.skip("protobuf not installed; transformWithState needs it")
    from pyspark.sql import functions as F

    from go_integ_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["n_purchases"], r["max_ts_us"])
        for r in _streaming_tws_user_profile(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    want = {
        r["user_id"]: (r["n"], r["p"], r["m"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
            F.unix_micros(F.max("ts")).alias("m"),
        )
        .collect()
    }
    assert got == want


def test_streaming_chunk_manifest_equals_batch(spark):
    """The stateless chunk transform driven through the streaming
    engine (multi-micro-batch availableNow, append mode) must produce
    the batch manifest exactly — per-row results independent of
    micro-batch boundaries."""
    from go_integ_spark.operators.text import text_chunk_overlap
    from go_integ_spark.streaming.queries import streaming_chunk_manifest

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in streaming_chunk_manifest(spark, sf).collect()}
    want = {tuple(r) for r in text_chunk_overlap(spark, sf).collect()}
    assert got == want and len(got) > 0


def test_streaming_static_enrich_equals_batch_join(spark):
    """The stream-static join driven to completion must equal the
    plain batch broadcast join + aggregation over the same tables."""
    from go_integ_spark.streaming.queries import streaming_static_enrich
    from go_integ_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["mktsegment"], r["event_type"]): (r["n"], r["total_value"])
        for r in streaming_static_enrich(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    cust = load_table(spark, sf, "customer")
    want = {
        (r["mktsegment"], r["event_type"]): (r["n"], r["total_value"])
        for r in ev.join(
            F.broadcast(cust), F.col("c_custkey") == F.col("user_id") + 1
        )
        .groupBy(F.col("c_mktsegment").alias("mktsegment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_srp_registry_equals_batch_twin(spark):
    """The streaming SRP bucket registry driven to completion must
    equal the batch GROUP BY over the identical bucket kernel —
    VALUES and DTYPES both (VERDICT r6: the r6 hash-red for this
    query was a type-level divergence the value comparison could not
    see, so schema identity is asserted explicitly)."""
    from go_integ_spark.operators.dedup import srp_bucket_udf
    from go_integ_spark.streaming.queries import streaming_srp_registry
    from go_integ_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got_df = streaming_srp_registry(spark, sf)
    batch = (
        load_table(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.explode(srp_bucket_udf()(F.col("embedding"))).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.min("vec_id").alias("first_vec_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
    assert [
        (f.name, f.dataType.simpleString()) for f in got_df.schema.fields
    ] == [(f.name, f.dataType.simpleString()) for f in batch.schema.fields]
    got = {tuple(r) for r in got_df.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_streaming_paragraph_dedup_equals_batch_distinct(spark):
    """Exploding paragraphs inside a streaming plan and deduplicating
    on the content hash must surface exactly the batch-distinct hash
    set, regardless of micro-batch arrival order."""
    from go_integ_spark.operators.dedup import paragraph_hashes
    from go_integ_spark.streaming.queries import streaming_paragraph_dedup
    from go_integ_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["ph"] for r in streaming_paragraph_dedup(spark, sf).collect()}
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    want = {
        r["ph"] for r in paragraph_hashes(docs).select("ph").distinct().collect()
    }
    assert got == want and len(got) > 0


def test_state_partitions_auto_sizing(tmp_path, monkeypatch):
    """Shard count derives from source volume (VERDICT r10 #4): floor
    at MIN for gate-sized sources, ceil(bytes/shard_bytes) above it,
    clamped at MAX; SG_STATE_PARTITIONS stays an explicit override."""
    from go_integ_spark.streaming import queries as sq

    monkeypatch.delenv("SG_STATE_PARTITIONS", raising=False)
    assert sq.state_partitions_for(None) == sq.MIN_STATE_PARTITIONS
    src = tmp_path / "src"
    src.mkdir()
    (src / "part-0.parquet").write_bytes(b"x" * 1024)
    assert sq.state_partitions_for(str(src)) == sq.MIN_STATE_PARTITIONS
    monkeypatch.setattr(sq, "STATE_SHARD_BYTES", 128)
    assert sq.state_partitions_for(str(src)) == 8  # ceil(1024/128)
    monkeypatch.setattr(sq, "MAX_STATE_PARTITIONS", 6)
    assert sq.state_partitions_for(str(src)) == 6
    monkeypatch.setenv("SG_STATE_PARTITIONS", "7")
    assert sq.state_partitions_for(str(src)) == 7


def test_state_partitions_remote_uri(monkeypatch):
    """Remote (object-store) sources size through Hadoop's
    FileSystem.getContentSummary via the JVM gateway (VERDICT r11
    item 4 — the os.walk form silently returned MIN shards for any
    s3a/gs URI). Mocked FS here; the derivation is bytes-identical to
    the local path: ceil(bytes / STATE_SHARD_BYTES) clamped to
    [MIN, MAX]. A remote URI with no session fails loud."""
    from unittest.mock import MagicMock

    import pytest as _pytest

    from go_integ_spark.streaming import queries as sq

    monkeypatch.delenv("SG_STATE_PARTITIONS", raising=False)
    fake_spark = MagicMock()
    summary = (
        fake_spark._jvm.org.apache.hadoop.fs.Path.return_value
        .getFileSystem.return_value.getContentSummary.return_value
    )
    summary.getLength.return_value = 10 * sq.STATE_SHARD_BYTES
    assert sq.state_partitions_for("s3a://bucket/corpus", fake_spark) == 10
    fake_spark._jvm.org.apache.hadoop.fs.Path.assert_called_with(
        "s3a://bucket/corpus"
    )
    # ceil, floor and cap behave exactly like the local branch
    summary.getLength.return_value = 10 * sq.STATE_SHARD_BYTES + 1
    assert sq.state_partitions_for("gs://b/x", fake_spark) == 11
    summary.getLength.return_value = 1
    assert (
        sq.state_partitions_for("hdfs://nn/x", fake_spark)
        == sq.MIN_STATE_PARTITIONS
    )
    summary.getLength.return_value = 10_000 * sq.STATE_SHARD_BYTES
    assert (
        sq.state_partitions_for("s3a://b/x", fake_spark)
        == sq.MAX_STATE_PARTITIONS
    )
    with _pytest.raises(ValueError, match="needs the"):
        sq.state_partitions_for("s3a://bucket/corpus")
    # explicit override still wins without touching the FS
    monkeypatch.setenv("SG_STATE_PARTITIONS", "9")
    assert sq.state_partitions_for("s3a://bucket/corpus") == 9


def test_state_partitions_file_uri_forms(tmp_path, monkeypatch):
    """Every file-URI spelling walks the SAME local directory (ADVICE
    r12): the r12 form stripped a fixed len('file://') prefix, so
    Hadoop's canonical single-slash 'file:/tmp/x' became 'mp/x' and
    the stream silently sized at MIN shards — the exact
    silent-undersizing class the r12 remote fix closed for s3a/gs.
    A file URI with a remote authority fails loud."""
    import pytest as _pytest

    from go_integ_spark.streaming import queries as sq

    monkeypatch.delenv("SG_STATE_PARTITIONS", raising=False)
    src = tmp_path / "src"
    src.mkdir()
    (src / "part-0.parquet").write_bytes(b"x" * 1024)
    monkeypatch.setattr(sq, "STATE_SHARD_BYTES", 128)
    want = 8  # ceil(1024/128), pinned by the plain-path test above
    assert sq.state_partitions_for(str(src)) == want
    assert sq.state_partitions_for(f"file://{src}") == want
    assert sq.state_partitions_for(f"file:{src}") == want  # Hadoop form
    assert sq.state_partitions_for(f"file://localhost{src}") == want
    with _pytest.raises(ValueError, match="remote host"):
        sq.state_partitions_for("file://nfs-server/exports/corpus")
