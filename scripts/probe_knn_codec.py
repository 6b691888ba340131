"""1000x kNN-graph shuffle-codec A/B (VERDICT r13 item 7): the
embedding_knn_graph probe shuffles ~10 GB at this scale — enough to
measure spark.io.compression.codec=zstd vs the lz4 default, which the
17 MB gate inputs cannot. Also records the scoring stage's task
med/max so the first-execution-straggler question (item 5) gets data
from the same runs.

    SPARK_GRAFT_DRIVER_MEM=48g SG_IO_CODEC=zstd \
        python scripts/probe_knn_codec.py

Prints one JSON line {codec, sec, rows, shuffle stage report, calib}.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def main() -> None:
    codec = os.environ.get("SG_IO_CODEC", "lz4")
    data_dir = os.path.join(ROOT, ".smoke_x1000")
    import smoke_scale as sm

    from go_integ_spark.registry import load_all
    from go_integ_spark.session import get_spark

    spark = get_spark(
        app_name=f"probe_knn_codec_{codec}",
        shuffle_partitions=256,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.io.compression.codec": codec,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"

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

    report = [
        s
        for s in sm.stage_report(ui)
        if s["stage"] >= lo
        and (s["shuffle_read_mb"] > 100 or s["task_max_ms"] > 5000)
    ]
    from bench import _cpu_calibration, _cpu_calibration_parallel, par_band

    par = _cpu_calibration_parallel()
    out = {
        "codec": codec,
        "sec": sec,
        "rows": n,
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
