"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line with per-query wall seconds.

Each query is materialized via a count-like action (collect on the
aggregated/limited result) — full plan execution, no driver blowup.
A warmup query runs first so JVM/codegen startup is not billed to the
first measured query.

The JSON line carries ``"contended": bool`` — round 3's 47 s artifact
was a second Spark JVM sharing the box (the same build measured ~17 s
solo), so the bench self-reports whether foreign JVMs or high system
load were present at start or end; a contended number should be
re-measured solo rather than recorded as a regression.

It also carries ``"cpu_calib_sec"``: the wall time of a fixed
single-thread numpy workload. Round 5 found a second way absolute
numbers shift without a code change: the driver restarted the round
on a slower host (2.1 GHz vs the earlier box) and every bench query
scaled uniformly ~1.45x at idle load. Comparing
``value / cpu_calib_sec`` across rounds separates host-speed drift
from real plan regressions.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _foreign_jvms() -> list[int]:
    """PIDs of java processes NOT parented by this bench process (our
    own Spark driver JVM is a direct child and is excluded)."""
    me = os.getpid()
    pids: list[int] = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                argv0 = f.read().split(b"\0", 1)[0].decode(errors="replace")
            if "java" not in os.path.basename(argv0):
                continue
            with open(f"/proc/{p}/stat") as f:
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            continue
        if ppid != me:
            pids.append(int(p))
    return pids


def _cpu_calibration() -> float:
    """Seconds for a fixed single-thread numpy workload (deterministic
    input, ~0.5 s on a 2024-class core). A host-speed fingerprint:
    bench totals should be compared across rounds relative to this."""
    import numpy as np

    a = np.arange(1_000_000, dtype=np.float64) % 97
    b = (a * 31.0 + 7.0) % 89
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(60):
        acc += float(a @ b)
        a = (a + b) % 97
    _ = acc
    return round(time.perf_counter() - t0, 4)


def _cpu_calibration_parallel() -> float:
    """Wall seconds for every core running the single-thread workload
    at once (numpy dot releases the GIL, so threads suffice). On a
    healthy exclusive host this ~equals the single-thread figure; a
    larger ratio means parallel throughput is degraded (hypervisor
    steal, frequency capping under all-core load, a noisy neighbor) —
    the failure mode round 6's intra-day 24 s -> 47 s swings on
    identical code traced to, which the single-thread fingerprint
    cannot see because it only holds one core."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    n = os.cpu_count() or 1

    def one(_: int) -> float:
        a = np.arange(1_000_000, dtype=np.float64) % 97
        b = (a * 31.0 + 7.0) % 89
        acc = 0.0
        for _ in range(60):
            acc += float(a @ b)
            a = (a + b) % 97
        return acc

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n) as ex:
        list(ex.map(one, range(n)))
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    from go_integ_spark.registry import load_all
    from go_integ_spark.session import get_spark

    ncpus = os.cpu_count() or 1
    cpu_calib = _cpu_calibration()
    cpu_calib_par = _cpu_calibration_parallel()
    jvms_start = _foreign_jvms()
    load1_start = os.getloadavg()[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    bench_queries = [name for name, spec in registry.items() if spec.bench]
    # Bill the shared shingle-set build to its natural owner:
    # dedup_minhash_lsh builds + caches the per-doc shingle sets that
    # dedup_ngram_jaccard then reuses, so it must run first — otherwise
    # the jaccard line absorbs the whole one-time build cost.
    if "dedup_minhash_lsh" in bench_queries and "dedup_ngram_jaccard" in bench_queries:
        bench_queries.remove("dedup_minhash_lsh")
        bench_queries.insert(
            bench_queries.index("dedup_ngram_jaccard"), "dedup_minhash_lsh"
        )

    spark = get_spark(app_name="go_integ_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: touch the biggest table so file listing + codegen init
    # happen outside the measured section, and run one trivial pandas
    # UDF so the Python worker pool + Arrow path spin up here — r6
    # found ~2-3 s of worker startup billed to whichever pandas-UDF
    # query happened to run first (minhash since the r6 reorder,
    # ngram_jaccard in r1 — the bulk of the "minhash 2.45 -> 7.8 s
    # trend" VERDICT r5 flagged).
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    _warm = F.pandas_udf(lambda s: s + 1, "long")
    spark.range(0, 32 * 1024, 1, ncpus).select(
        _warm(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    # The shared per-doc shingle-set cache is a ONE-TIME build that
    # four dedup queries reuse; billed to its own line so the LSH
    # number measures LSH (r1-r5 billed it to dedup_minhash_lsh,
    # which made that line's trend unreadable — VERDICT r5 item 5).
    if "dedup_minhash_lsh" in bench_queries:
        from go_integ_spark.operators.dedup import _cached_doc_sets
        from go_integ_spark.tables import load_table

        t0 = time.perf_counter()
        _cached_doc_sets(
            load_table(spark, sf_dir, "documents")
        ).write.format("noop").mode("overwrite").save()
        timings["dedup_shingle_cache_build"] = round(time.perf_counter() - t0, 4)
        print(
            f"# dedup_shingle_cache_build: "
            f"{timings['dedup_shingle_cache_build']:.3f}s",
            file=sys.stderr,
        )

    for name in bench_queries:
        spec = registry[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # noop sink: executes the full physical plan (nothing is
        # optimized away, unlike count()) without driver collection.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    jvms_end = _foreign_jvms()
    contended = bool(jvms_start or jvms_end) or load1_start > 0.5 * ncpus
    if contended:
        print(
            f"# CONTENDED RUN: foreign JVMs start={jvms_start} "
            f"end={jvms_end}, load1 at start {load1_start:.1f} on "
            f"{ncpus} cpus — timings unreliable, re-run solo",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpu_calib_sec": cpu_calib,
                "cpu_calib_par_sec": cpu_calib_par,
                "contended": contended,
                "contention": {
                    "foreign_jvms_start": len(jvms_start),
                    "foreign_jvms_end": len(jvms_end),
                    "load1_start": round(load1_start, 2),
                    "cpus": ncpus,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
