"""Solo latency-spread probe for connector_datasource_distributed_read
(VERDICT r13 item 4 'done' criterion: 5-run solo spread <= 1.3x).

One fresh process per run (bench-identical measurement: _fresh_session
warmups, gate server start, cold + warm noop execution, warm
reported). Usage:
    for i in 1 2 3 4 5; do python scripts/probe_connector_solo.py; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    from go_integ_spark.operators.advanced import _orders_gate_server
    from go_integ_spark.registry import load_all

    registry = load_all()
    spark = bench._fresh_session("probe_connector_solo", sf_dir, os.cpu_count() or 1)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    _orders_gate_server(sf_dir)
    server_start = time.perf_counter() - t0
    fn = registry["connector_datasource_distributed_read"].fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0
    spark.stop()
    print(
        json.dumps(
            {
                "server_start_sec": round(server_start, 3),
                "cold_sec": round(cold, 3),
                "warm_sec": round(warm, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
