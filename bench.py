"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line with per-query wall seconds.

Each query is materialized via a noop-format write — full plan
execution, no driver collection. A warmup query runs first so
JVM/codegen startup is not billed to the first measured query.

Measurement QA (the three host-noise failure modes that produced
bogus trend points in rounds 3, 5 and 7, and the rule for each):

- **Foreign load at start** — round 3's 47 s artifact was a second
  Spark JVM sharing the box; round 7's committed 29.76 s started at
  load1 8.18 and inflated a contiguous early window 1.4-2.35x while
  late queries ran flat (a decaying external load), against a true
  ~20 s measured twice solo. The start gate is therefore load1 >
  0.15 * ncpus (r7's 0.5 * ncpus gate passed the load-8.18 run) or
  any foreign JVM.
- **Two-run disagreement** (BASELINE.md rule, encoded here): when
  the start gate trips, the harness automatically runs the measured
  loop a SECOND time back-to-back (fresh JVM + per-operator caches
  cleared in between, so both passes are the same cold measurement —
  a same-JVM re-run reuses the generated-code cache and measured
  ~25% fast) and reports the faster pass; if
  the two totals disagree by >25% the line is marked
  ``"contended": true`` regardless — it must be re-measured solo,
  never recorded as a regression.
- **Host-speed drift** — round 5's driver moved to a 2.1 GHz box and
  everything scaled ~1.45x uniformly. ``cpu_calib_sec`` (fixed
  single-thread numpy workload) fingerprints the host before the
  run and ``cpu_calib_end_sec`` after it; compare
  ``value / cpu_calib_sec`` across rounds, and distrust a run whose
  start/end calibs disagree (frequency shifted mid-run).
  ``cpu_calib_par_sec`` runs the same workload on every core at
  once: a par/single ratio well above the host's norm means degraded
  all-core throughput (steal, capping, noisy neighbor) that the
  single-thread probe cannot see.
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


def classify_run(
    totals: list[float],
    jvms_start: list[int],
    jvms_mid: list[int],
    jvms_end: list[int],
) -> bool:
    """The contended verdict, pure so tests can pin it: evidence of a
    sharing tenant DURING the measurement — foreign JVMs at any
    checkpoint, or two back-to-back cold passes disagreeing >25%
    (BASELINE.md rule). A high start load ALONE is not contention: it
    triggers the second pass, and if both cold passes then agree the
    number is reproducible and the start load was stale decay. A
    non-positive pass total is itself evidence the measurement is
    broken — treat it as contended rather than dividing by it."""
    if any(t <= 0 for t in totals):
        return True
    disagree = (
        len(totals) == 2 and abs(totals[0] - totals[1]) / min(totals) > 0.25
    )
    return bool(jvms_start or jvms_mid or jvms_end) or disagree


def _reset_operator_caches() -> None:
    """Drop every per-process memoized DataFrame handle before the
    session restart: the handles point into the JVM being stopped,
    and pass 2 must rebuild (and re-bill) them against the fresh
    session. One-time artifacts billed to their OWN line outside the
    loop (the connector gate HTTP server, a pure-Python object) are
    deliberately NOT reset — both passes see them warm."""
    from go_integ_spark.functions import cache as fcache

    fcache._slots.clear()


def _fresh_session(app_name: str, sf_dir: str, ncpus: int):
    """A new warmed-up Spark session. Pass 2 of the two-run rule gets
    its OWN JVM: within one session, re-running the identical plans
    reuses Spark's generated-code cache and a fully JIT-warm JVM, so
    a same-session second pass measured ~25% faster than pass 1 on an
    idle host — a structural advantage that would make two-pass
    rounds incomparable with single-pass rounds. A fresh JVM + the
    standard warmup makes both passes the same cold measurement.

    Warmup: touch the biggest table so file listing + codegen init
    happen outside the measured section, and run one trivial pandas
    UDF so the Python worker pool + Arrow path spin up here — r6
    found ~2-3 s of worker startup billed to whichever pandas-UDF
    query happened to run first."""
    from pyspark.sql import functions as F

    from go_integ_spark.session import get_spark

    spark = get_spark(app_name=app_name)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    _warm = F.pandas_udf(lambda s: s + 1, "long")
    spark.range(0, 32 * 1024, 1, ncpus).select(
        _warm(F.col("id"))
    ).write.format("noop").mode("overwrite").save()
    # ... and one empty 8-partition Python DataSource read, so the
    # DataSource planning/worker path is warm too — otherwise ~3 s of
    # one-time spin-up bills to the connector headline line (cold
    # 5.4 s vs warm 2.1 s measured at sf0.1; same treatment as the
    # pandas-UDF pool above).
    from go_integ_spark.sources.datasource import warmup_datasource

    warmup_datasource(spark)
    return spark


def _run_pass(spark, registry, bench_queries, sf_dir) -> dict[str, float]:
    """One measured pass over the headline set. Returns per-query
    wall seconds (plus the separately-billed shingle-cache line)."""
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
    return timings


# A contended attempt is never good enough for the committed round
# artifact (VERDICT r8: a flagged 14.2 s was recorded as BENCH_r08's
# headline and read as a fantasy trend point) — retry the WHOLE
# measurement up to this many times and keep the first clean one.
MAX_ATTEMPTS = 3


def _one_attempt(registry, bench_queries, sf_dir: str, ncpus: int) -> dict:
    """One full measurement attempt: pass 1, the conditional fresh-JVM
    pass 2 (BASELINE.md two-run rule), and the contended verdict.
    Returns every per-pass per-query timing so the committed JSON is
    machine-readable trend evidence, not just a headline total."""
    jvms_start = _foreign_jvms()
    load1_start = os.getloadavg()[0]
    _reset_operator_caches()
    spark = _fresh_session("go_integ_spark_bench", sf_dir, ncpus)

    # The connector gate server is a ONE-TIME driver-side artifact
    # (parquet -> pylist load + HTTP server start) the distributed
    # extract query reuses; billed to its own line like the shingle
    # cache so the measured line is the distributed read itself.
    server_start_sec = None
    if "connector_datasource_distributed_read" in bench_queries:
        from go_integ_spark.operators.advanced import _orders_gate_server

        t0 = time.perf_counter()
        _orders_gate_server(sf_dir)
        server_start_sec = round(time.perf_counter() - t0, 4)
        print(f"# connector_gate_server_start: {server_start_sec:.3f}s", file=sys.stderr)

    # The docs stream-source parquet write is a ONE-TIME artifact the
    # streaming headline line reads from; billed to its own line so
    # the measured line is the streaming run itself (memoized per
    # process — later passes/attempts see it warm, like the gate
    # server above).
    if "streaming_paragraph_dedup" in bench_queries:
        from go_integ_spark.streaming.queries import _docs_stream_source

        t0 = time.perf_counter()
        _docs_stream_source(spark, sf_dir)
        print(
            f"# stream_source_documents_build: "
            f"{time.perf_counter() - t0:.3f}s",
            file=sys.stderr,
        )

    start_flagged = bool(jvms_start) or load1_start > 0.15 * ncpus
    pass_queries = [_run_pass(spark, registry, bench_queries, sf_dir)]
    totals = [round(sum(pass_queries[0].values()), 4)]
    jvms_mid = _foreign_jvms()

    if start_flagged or jvms_mid:
        # Auto second pass (BASELINE.md two-run rule): fresh JVM +
        # cleared per-operator caches so both passes are the same
        # cold measurement, then report the faster pass. >25% total
        # disagreement means the host is actively contended — flag
        # the attempt either way.
        print(
            f"# start flagged (foreign JVMs start={jvms_start} "
            f"mid={jvms_mid}, load1_start {load1_start:.1f} on {ncpus} "
            f"cpus) — running second back-to-back pass in a fresh JVM",
            file=sys.stderr,
        )
        _reset_operator_caches()
        spark.stop()
        spark = _fresh_session("go_integ_spark_bench_p2", sf_dir, ncpus)
        pass_queries.append(_run_pass(spark, registry, bench_queries, sf_dir))
        totals.append(round(sum(pass_queries[1].values()), 4))

    spark.stop()
    jvms_end = _foreign_jvms()
    best = min(range(len(totals)), key=totals.__getitem__)
    return {
        "timings": pass_queries[best],
        "totals": totals,
        "pass_queries": pass_queries,
        "contended": classify_run(totals, jvms_start, jvms_mid, jvms_end),
        "server_start_sec": server_start_sec,
        "contention": {
            "foreign_jvms_start": len(jvms_start),
            "foreign_jvms_mid": len(jvms_mid),
            "foreign_jvms_end": len(jvms_end),
            "load1_start": round(load1_start, 2),
            "load1_end": round(os.getloadavg()[0], 2),
            "cpus": ncpus,
        },
    }


def main() -> None:
    from go_integ_spark.registry import load_all

    ncpus = os.cpu_count() or 1
    cpu_calib = _cpu_calibration()
    cpu_calib_par = _cpu_calibration_parallel()
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

    attempts = []
    for i in range(MAX_ATTEMPTS):
        attempt = _one_attempt(registry, bench_queries, sf_dir, ncpus)
        attempts.append(attempt)
        if not attempt["contended"]:
            break
        print(
            f"# attempt {i + 1}/{MAX_ATTEMPTS} CONTENDED "
            f"(pass totals {attempt['totals']}, "
            f"{attempt['contention']}) — "
            + ("retrying" if i + 1 < MAX_ATTEMPTS else "giving up"),
            file=sys.stderr,
        )
        time.sleep(5)

    final = attempts[-1]
    contended = final["contended"]
    if contended:
        print(
            "# ALL ATTEMPTS CONTENDED — this output is NOT a trend "
            "point (trend_point: false); re-run solo",
            file=sys.stderr,
        )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cpu_calib_end = _cpu_calibration()
    out = {
        "metric": "headline_queries_total_sec",
        "value": min(final["totals"]),
        "unit": "sec",
        "queries": final["timings"],
        "sf": float(sf),
        "cpu_calib_sec": cpu_calib,
        "cpu_calib_par_sec": cpu_calib_par,
        "cpu_calib_end_sec": cpu_calib_end,
        "contended": contended,
        # The one bit a trend consumer must check: false means every
        # retry was contended and "value" is measurement noise.
        "trend_point": not contended,
        "attempts": len(attempts),
        "pass_totals": final["totals"],
        # Per-pass per-query seconds for every pass of the recorded
        # attempt — the back-to-back repeat evidence, machine-readable
        # (VERDICT r8 #2) instead of living only in BASELINE.md prose.
        "pass_queries": final["pass_queries"],
        "contention": final["contention"],
    }
    if final["server_start_sec"] is not None:
        out["connector_gate_server_start_sec"] = final["server_start_sec"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
