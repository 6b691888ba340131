"""1000x multilang bitext probe for the balanced split geometry
(VERDICT r13 item 6): wall seconds + the FULL pair-set sha256 digest,
so old-geometry and new-geometry arms can be compared for both speed
and byte-identity. Run from any checkout (the arm under test):

    SPARK_GRAFT_DRIVER_MEM=48g SMOKE_DIR=/root/repo/.smoke_x1000/multilang \
        python scripts/probe_bitext_geometry.py

Prints one JSON line: {sec, n_pairs, pair_digest, calib fields,
scoring-stage skew report}.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def main() -> None:
    data_dir = os.environ.get(
        "SMOKE_DIR", os.path.join(ROOT, ".smoke_x1000", "multilang")
    )
    import smoke_scale as sm

    from go_integ_spark.operators.similarity import similarity_bitext_pairs
    from go_integ_spark.session import get_spark

    spark = get_spark(
        app_name="probe_bitext_geometry",
        shuffle_partitions=256,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"

    # session warmup (unbilled, identical in both arms): touch the
    # corpus, spin the Python worker pool
    from pyspark.sql import functions as F

    spark.read.parquet(f"{data_dir}/embeddings.parquet").count()
    _warm = F.pandas_udf(lambda s: s + 1, "long")
    spark.range(0, 32 * 1024, 1, 32).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    lo = sm._max_stage_id(ui) + 1
    t0 = time.perf_counter()
    rows = similarity_bitext_pairs(spark, data_dir).collect()
    sec = round(time.perf_counter() - t0, 2)
    canon = sorted(tuple(r) for r in rows)
    digest = hashlib.sha256(repr(canon).encode()).hexdigest()

    report = [
        s
        for s in sm.stage_report(ui)
        if s["stage"] >= lo and (s["shuffle_read_mb"] > 100 or s["task_max_ms"] > 5000)
    ]
    from bench import _cpu_calibration, _cpu_calibration_parallel, par_band

    par = _cpu_calibration_parallel()
    out = {
        "sec": sec,
        "n_pairs": len(rows),
        "pair_digest": digest,
        "cpu_calib_sec": _cpu_calibration(),
        "cpu_calib_par_sec": par,
        "par_band": par_band(par),
        "heavy_stages": report,
    }
    print(json.dumps(out))
    dst = os.environ.get("SMOKE_OUT")
    if dst:
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
