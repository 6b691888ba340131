"""1000x kNN first-execution straggler probe (VERDICT r13 item 5).

The scoring reduce (~2000 tasks, 5-7 GB shuffle read) shows 20-40 s
first-wave tasks against a single-digit-second median on FIRST
execution only; warm replays pass. Hypothesis under test: the cost is
JVM heap growth + GC while the heap expands from its small initial
size toward spark.driver.memory (local mode: the driver JVM is the
executor), which a warm replay no longer pays. The candidate fix is
pre-committing the heap: ``-Xms<driver mem> -XX:+AlwaysPreTouch``
(guide section 5 - memory; the VERDICT's "pre-touch" suggestion).

Arms (fresh process each; SG_PRETOUCH=1 adds the java options):

    SPARK_GRAFT_DRIVER_MEM=48g python scripts/probe_knn_straggler.py
    SPARK_GRAFT_DRIVER_MEM=48g SG_PRETOUCH=1 \
        python scripts/probe_knn_straggler.py

Prints one JSON line: wall, the scoring stage's task med/max, and a
per-task attribution over that stage - duration vs launch order, GC
ms, fetch-wait ms - binned into launch waves, so the straggler's
cause is read off the artifact rather than guessed.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def _task_list(ui: str, app_id: str, sid: int, att: int) -> list[dict]:
    tasks: list[dict] = []
    page = 1000
    while True:
        batch = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
                f"taskList?offset={len(tasks)}&length={page}&sortBy=ID"
            )
        )
        tasks.extend(batch)
        if len(batch) < page:
            break
    seen: set = set()
    out = []
    for t in tasks:
        if t.get("taskId") in seen:
            continue
        seen.add(t.get("taskId"))
        out.append(t)
    return out


def _wave_report(tasks: list[dict], ncpus: int) -> dict:
    """Bin tasks into launch waves of ncpus and summarize each wave's
    run time, GC and fetch wait; plus the top-10 slowest tasks with
    their launch rank so 'stragglers are the first wave' (or not) is
    directly visible."""
    from datetime import datetime, timezone

    def _ms(iso: str) -> float:
        # UI epoch format: 2026-08-17T12:34:56.789GMT
        iso = iso.replace("GMT", "+00:00")
        return datetime.fromisoformat(iso).astimezone(timezone.utc).timestamp() * 1e3

    rows = []
    for t in tasks:
        m = t.get("taskMetrics") or {}
        sr = m.get("shuffleReadMetrics", {})
        rows.append(
            {
                "launch_ms": _ms(t["launchTime"]),
                "run_ms": m.get("executorRunTime", 0),
                "gc_ms": m.get("jvmGcTime", 0),
                "fetch_ms": sr.get("fetchWaitTime", 0),
                "read_mb": round(
                    (sr.get("localBytesRead", 0) + sr.get("remoteBytesRead", 0))
                    / 1e6,
                    1,
                ),
            }
        )
    rows.sort(key=lambda r: r["launch_ms"])
    for rank, r in enumerate(rows):
        r["rank"] = rank
    waves = []
    for w0 in range(0, min(len(rows), ncpus * 8), ncpus):
        chunk = rows[w0 : w0 + ncpus]
        runs = sorted(r["run_ms"] for r in chunk)
        waves.append(
            {
                "wave": w0 // ncpus,
                "run_med_ms": runs[len(runs) // 2],
                "run_max_ms": runs[-1],
                "gc_sum_ms": sum(r["gc_ms"] for r in chunk),
                "fetch_sum_ms": sum(r["fetch_ms"] for r in chunk),
            }
        )
    rest = rows[ncpus * 8 :]
    runs_all = sorted(r["run_ms"] for r in rows)
    med = runs_all[len(runs_all) // 2] or 1
    slow = sorted(rows, key=lambda r: -r["run_ms"])[:10]
    return {
        "n_tasks": len(rows),
        "run_med_ms": med,
        "run_max_ms": runs_all[-1],
        "max_over_med": round(runs_all[-1] / med, 1),
        "gc_total_ms": sum(r["gc_ms"] for r in rows),
        "fetch_total_ms": sum(r["fetch_ms"] for r in rows),
        "first_waves": waves,
        "steady_med_ms": (
            sorted(r["run_ms"] for r in rest)[len(rest) // 2] if rest else None
        ),
        "slowest_tasks": [
            {
                "rank": r["rank"],
                "run_ms": r["run_ms"],
                "gc_ms": r["gc_ms"],
                "fetch_ms": r["fetch_ms"],
                "read_mb": r["read_mb"],
            }
            for r in slow
        ],
    }


def main() -> None:
    pretouch = os.environ.get("SG_PRETOUCH") == "1"
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    data_dir = os.path.join(ROOT, ".smoke_x1000")
    import smoke_scale as sm

    from go_integ_spark.registry import load_all
    from go_integ_spark.session import get_spark

    # get_spark owns the pretouch java options now (session.py
    # pretouch_enabled, shipped from this probe's A/B/A evidence);
    # pin the env so the base arm stays base even at 48g where the
    # session default is ON.
    os.environ["SG_PRETOUCH"] = "1" if pretouch else "0"
    extra = {"spark.ui.enabled": "true"}
    t_sess0 = time.perf_counter()
    spark = get_spark(
        app_name=f"probe_knn_straggler_{'pretouch' if pretouch else 'base'}",
        shuffle_partitions=256,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sess_sec = round(time.perf_counter() - t_sess0, 2)
    ui = "http://localhost:4040"
    ncpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    spark.read.parquet(f"{data_dir}/embeddings.parquet").count()
    _warm = F.pandas_udf(lambda s: s + 1, "long")
    spark.range(0, 32 * 1024, 1, 32).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    reg = load_all()
    lo = sm._max_stage_id(ui) + 1
    t0 = time.perf_counter()
    n = reg["embedding_knn_graph"].fn(spark, data_dir).count()
    sec = round(time.perf_counter() - t0, 2)

    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    heavy = [
        s
        for s in sm.stage_report(ui)
        if s["stage"] >= lo
        and (s["shuffle_read_mb"] > 100 or s["task_max_ms"] > 5000)
    ]
    scoring = max(heavy, key=lambda s: s["shuffle_read_mb"])
    tasks = _task_list(ui, app_id, scoring["stage"], 0)
    from bench import _cpu_calibration, _cpu_calibration_parallel, par_band

    par = _cpu_calibration_parallel()
    out = {
        "arm": "pretouch" if pretouch else "base",
        "driver_mem": mem,
        "session_startup_sec": sess_sec,
        "sec": sec,
        "rows": n,
        "cpu_calib_sec": _cpu_calibration(),
        "cpu_calib_par_sec": par,
        "par_band": par_band(par),
        "scoring_stage": scoring,
        "scoring_tasks": _wave_report(tasks, ncpus),
        "heavy_stages": heavy,
    }
    print(json.dumps(out))
    dst = os.environ.get("SMOKE_OUT")
    if dst:
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
