"""Dissect the bench's plan_warmup line (VERDICT r13 item 3).

plan_warmup = sum over headline queries of (cold - warm) execution
time. The r14 before-run attributes 7.8 s total, of which
streaming_session_window carries 2.5 s and dedup_minhash_lsh 1.5 s.
Hypothesis for the streaming term: most of it is SESSION-LEVEL
one-time cost (streaming-engine class loading, MicroBatchExecution /
state-store provider / commit-log init), not per-plan codegen — the
same class of cost the bench's _fresh_session already warms for the
pandas-UDF worker pool and the Python DataSource path.

Test: arm A = bench session warmup, then measure the two queries
cold/warm exactly like _run_pass. Arm B = same plus ONE trivial
streaming query (3-row parquet -> groupBy count -> memory sink,
availableNow) run before the measurements — a different plan shape
(plain hash aggregate, no session_window, no explode/dedup), so it
warms the engine, not the measured plans.

Each invocation of this script is one fresh process (one arm).
Usage: python scripts/probe_plan_warmup.py A|B
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trivial_streaming_warm(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    src = tempfile.mkdtemp(prefix="sg_stream_warm_")
    df = spark.range(0, 3).select(
        F.col("id"), (F.col("id") % 2).alias("k")
    )
    df.write.mode("overwrite").parquet(src)
    schema = df.schema
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("warm_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.catalog.dropTempView("warm_stream")
    return time.perf_counter() - t0


def measure(spark, registry, name: str, sf_dir: str) -> tuple[float, float]:
    from go_integ_spark.functions import cache

    spec = registry[name]
    slots_before = set(cache._slots)
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    for slot in set(cache._slots) - slots_before:
        cache._slots.pop(slot)[2].unpersist()
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0
    return cold, warm


def main() -> None:
    arm = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    from go_integ_spark.registry import load_all

    registry = load_all()
    spark = bench._fresh_session("probe_plan_warmup", sf_dir, os.cpu_count() or 1)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, object] = {"arm": arm}
    if arm == "B":
        out["trivial_streaming_warm_sec"] = round(trivial_streaming_warm(spark), 3)

    # same one-time source builds the bench does (billed separately there)
    from go_integ_spark.streaming.queries import _docs_stream_source, _events_stream_source

    t0 = time.perf_counter()
    _events_stream_source(spark, sf_dir)
    out["events_source_build_sec"] = round(time.perf_counter() - t0, 3)
    _docs_stream_source(spark, sf_dir)

    from go_integ_spark.operators.dedup import _cached_doc_sets
    from go_integ_spark.tables import load_table

    t0 = time.perf_counter()
    _cached_doc_sets(load_table(spark, sf_dir, "documents")).write.format(
        "noop"
    ).mode("overwrite").save()
    out["shingle_cache_sec"] = round(time.perf_counter() - t0, 3)

    for q in ("streaming_session_window", "dedup_minhash_lsh",
              "streaming_paragraph_dedup", "ann_bruteforce_topk"):
        cold, warm = measure(spark, registry, q, sf_dir)
        out[q] = {"cold": round(cold, 3), "warm": round(warm, 3),
                  "delta": round(cold - warm, 3)}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
