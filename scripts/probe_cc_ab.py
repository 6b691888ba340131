"""1000x A/B probe: embedding_communities CC edge-list partitioning.

VERDICT r11 item 2: the communities 1000x wall drifted 129.8 ->
206.9 s with an UNVERIFIED "variance + bin-partitioned graph"
attribution. The suspected mechanism: connected_components persists
the symmetrized edge list, and every CC round's hop join requires
ClusteredDistribution on `src` — if the cached list arrived
partitioned some other way (the kNN grid's bin/pair hash), the FULL
20M-row edge list re-shuffles every round. The r12 fix
(operators/dedup.py) repartitions it on `src` once before the
persist; the CC_EDGE_REPART=0 toggle preserves the old shape for
this probe only.

This probe, on one session over the 1000x corpus (2M vectors):
  1. builds the kNN graph once (cached slot) — doubling as the
     VERDICT item-3 check that the fused/caller-supplied cell sizing
     recovers the ~13% two-aggregate overhead (target <= ~650 s at
     <= 10x data-task skew, r11: 713.3 s),
  2. runs embedding_communities twice per arm, ALTERNATING
     (off, on, off, on) so page-cache/JIT warm drift is shared
     across arms instead of biasing the second arm.

Run (clean host):
  SMOKE_SCALE=1000 SMOKE_SHUFFLE=256 SPARK_GRAFT_DRIVER_MEM=48g \
    python scripts/probe_cc_ab.py
Writes the summary JSON to $SMOKE_OUT if set; full per-stage lines
go to stdout for the committed PROBE log.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SMOKE_SCALE", "1000")
os.environ.setdefault("SMOKE_SHUFFLE", "256")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

import smoke_scale as sm  # noqa: E402  (reads SMOKE_* at import)


def main() -> None:
    if not os.path.exists(f"{sm.DATA_DIR}/documents.parquet"):
        sm.generate()

    from pyspark.sql import functions as F

    from go_integ_spark.registry import load_all
    from go_integ_spark.session import get_spark
    from go_integ_spark.tables import load_table

    spark = get_spark(
        app_name="probe_cc_ab",
        shuffle_partitions=int(os.environ["SMOKE_SHUFFLE"]),
        # retain every stage: the first probe's 3,141-stage session
        # evicted run 1 from the UI REST API (default retainedStages
        # 1000), blanking its rows in the stage report
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "10000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"
    reg = load_all()
    results: dict[str, dict] = {}

    def timed(name: str, thunk) -> None:
        lo = sm._max_stage_id(ui) + 1
        t0 = time.perf_counter()
        n = thunk()
        secs = round(time.perf_counter() - t0, 2)
        results[name] = {"rows": n, "sec": secs,
                         "stages": [lo, sm._max_stage_id(ui)]}
        print(f"\n== {name}: {n} rows in {secs}s ==", flush=True)

    _noop = F.pandas_udf(lambda x: x.astype(float), "double")

    def _warm():
        wemb = load_table(spark, sm.DATA_DIR, "embeddings")
        wemb.select(F.sum(_noop(F.col("vec_id")))).collect()
        wemb.agg(F.sum(F.size("embedding"))).collect()
        return 0

    timed("session_warmup", _warm)
    # One kNN build, shared by every communities run via the cached
    # slot — also the fused-cell-sizing scale check (item 3).
    timed(
        "embedding_knn_graph",
        lambda: reg["embedding_knn_graph"].fn(spark, sm.DATA_DIR).count(),
    )
    # Drift-cancelling arm order (probe 1 showed in-session drift:
    # walls 143.6 / 90.2 / 111.0 / 194.7 s across four runs with a
    # 4.6 s single-task GC stall in the last — adjacent pairs with
    # the order FLIPPED between pairs cancel any monotone drift).
    # CC_AB_ARMS overrides, e.g. "1,0,0,1,1,0".
    # CC_AB_VAR generalizes the probe to any CC toggle (r13: the
    # CC_DELTA neighbor-min delta-propagation A/B reuses this
    # harness; CC_EDGE_REPART stays the default for the r12 artifact
    # shape). Each run returns (row count, label signature) in ONE
    # job — sum of xxhash64 over the full output row — so the arms
    # carry 1000x label-identity evidence, not just counts.
    var = os.environ.get("CC_AB_VAR", "CC_EDGE_REPART")
    sigs: dict[str, int] = {}

    def _run_communities(label: str) -> int:
        df = reg["embedding_communities"].fn(spark, sm.DATA_DIR)
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # pmod keeps the 2M-row sum far inside int64 (ANSI mode
            # raises on sum(xxhash64) overflow)
            F.sum(
                F.pmod(
                    F.xxhash64("vec_id", "community_id", "community_size"),
                    F.lit(2_147_483_647),
                )
            ).alias("sig"),
        ).collect()[0]
        sigs[label] = r["sig"]
        return r["n"]

    arms = os.environ.get("CC_AB_ARMS", "1,0,0,1,1,0").split(",")
    for i, arm in enumerate(arms):
        os.environ[var] = arm
        label = (
            f"communities_run{i + 1}_{var.lower()}_"
            f"{'on' if arm == '1' else 'off'}"
        )
        timed(label, lambda lab=label: _run_communities(lab))
        # nudge dead checkpoint/persist blocks from the finished run
        # out of the heap before the next arm measures
        import gc

        gc.collect()
        spark._jvm.System.gc()
    os.environ.pop(var, None)
    assert len(set(sigs.values())) == 1, (
        f"label signatures disagree across arms: {sigs}"
    )

    report = sm.stage_report(ui)
    shuffly = [s for s in report
               if s["shuffle_write_mb"] or s["shuffle_read_mb"]]

    def eff_skew(s: dict) -> float:
        # stall-robust eligibility, mirroring smoke_scale (r13)
        per_task_mb = (s["shuffle_write_mb"] + s["shuffle_read_mb"]) / max(
            s["tasks"], 1
        )
        if not (
            s["task_max_ms"] >= 30_000
            or s["task_med_ms"] >= 1000
            or per_task_mb >= 16
        ):
            return 0
        v = s["data_skew"] if s["data_skew"] is not None else s["skew"]
        return v or 0

    def owner(stage_id: int) -> str:
        for qname, r in results.items():
            lo, hi = r.get("stages", (1, 0))
            if lo <= stage_id <= hi:
                return qname
        return "?"

    for s in shuffly:
        empt = (
            f" data_skew={s['data_skew']} (excl {s['empty_tasks']} empty)"
            if s["empty_tasks"]
            else ""
        )
        print(
            f"stage {s['stage']:>3} tasks={s['tasks']:>3} "
            f"shufW={s['shuffle_write_mb']:>8}MB "
            f"shufR={s['shuffle_read_mb']:>8}MB "
            f"task med/max={s['task_med_ms']:.0f}/{s['task_max_ms']:.0f}ms "
            f"skew={s['skew']}{empt} | {owner(s['stage'])}"
        )
    # Per-query worst data-task skew, so the A/B arms and the kNN
    # build each carry their own PASS/FAIL against the 10x bound.
    per_q: dict[str, float] = {}
    for s in shuffly:
        q = owner(s["stage"])
        per_q[q] = max(per_q.get(q, 0.0), eff_skew(s))
    worst = max(per_q.values(), default=0)
    worst_owner = max(per_q, key=per_q.get) if per_q else "-"
    print(f"\nper-query worst data-task skew: "
          f"{json.dumps(per_q, sort_keys=True)}")
    print(f"worst overall: {worst}x (in {worst_owner}; "
          f"{'PASS' if worst < 10 else 'FAIL'} vs the 10x bound)")
    arm_off = [r["sec"] for k, r in results.items() if k.endswith("_off")]
    arm_on = [r["sec"] for k, r in results.items() if k.endswith("_on")]
    from bench import _cpu_calibration, _cpu_calibration_parallel, par_band

    calib_par = _cpu_calibration_parallel()
    summary = {
        "queries": results,
        "per_query_skew": per_q,
        "worst_skew": worst,
        "worst_skew_query": worst_owner,
        "ab_var": var,
        f"{var.lower()}_off_sec": arm_off,
        f"{var.lower()}_on_sec": arm_on,
        "label_signature": next(iter(sigs.values()), None),
        "scale": sm.SCALE,
        "shuffle_partitions": os.environ.get("SMOKE_SHUFFLE"),
        "cpu_calib_sec": _cpu_calibration(),
        "cpu_calib_par_sec": calib_par,
        "par_band": par_band(calib_par),
    }
    print(json.dumps(summary))
    out = os.environ.get("SMOKE_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
