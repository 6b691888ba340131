"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[N]``; the same config block is what we
would ship to a 1000-executor cluster — AQE on (runtime re-plan,
skew-join splitting, partition coalescing), adaptive broadcast
thresholds, Arrow for any pandas exchange, UTC session timezone so
results are comparable with the DuckDB oracle (duckdb timestamps are
UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_engine_contract(spark: SparkSession) -> None:
    """Pin the two runtime-settable confs the ENGINE CONTRACT requires,
    in one advertised place (every table/file read routes through
    here — tables.load_table, sources.files.FileStream):

    - ``nanosAsLong``: the driver's events.parquet stores
      TIMESTAMP(NANOS), unreadable without it;
    - UTC session timezone: the NTZ -> LTZ normalization cast is only
      a wall-clock identity under UTC — a non-UTC session would
      silently shift instants relative to the DuckDB oracles and
      unix_micros epochs.

    DELIBERATELY permanent, not scoped-and-restored: returned frames
    are lazy, so restoring the timezone before the caller's action
    would re-break the cast. The engine operates in UTC; callers
    mixing these reads with local-time timestamp logic in one session
    are outside the contract (documented in README/STATUS).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _mem_gb(mem: str) -> float:
    """Parse a JVM memory string ("48g", "512m", "8192k") to GiB.
    Unparseable values resolve to 0.0 (pretouch stays off)."""
    m = mem.strip().lower()
    try:
        if m.endswith("g"):
            return float(m[:-1])
        if m.endswith("m"):
            return float(m[:-1]) / 1024.0
        if m.endswith("k"):
            return float(m[:-1]) / (1024.0 * 1024.0)
        return float(m) / (1024.0**3)
    except ValueError:
        return 0.0


def pretouch_enabled(mem: str, env: str | None) -> bool:
    """Whether to pre-commit the driver/executor heap
    (``-Xms<mem> -XX:+AlwaysPreTouch``). Explicit SG_PRETOUCH=1/0
    wins; default is on only in the large-heap scale regime
    (>= 16 GiB — the 1000x-probe / production-profile shape), so the
    bench and the test suite at the 8g default keep an unchanged JVM
    environment and the driver's bench stays comparable.

    Why (guide §5; r14 straggler probe, ABA arms
    SMOKE_r14_1000x_knn_straggler_{base2,pretouch,base3}.json): in a
    fresh large-heap JVM every heavyweight stage's FIRST wave pays
    concurrent heap-commit page faults while the heap grows toward
    -Xmx — 32 tasks fault-zeroing pages simultaneously. At the 1000x
    kNN probe this made wave-0 of the 5.4 GB scoring exchange run
    ~44 s vs a 3.2 s steady median (13.7x, zero GC / zero fetch in
    the stragglers) and inflated every single-wave 32-task stage.
    Pre-committing the heap moves that cost to session startup
    (~63 s for 48g, once, off the measured path) where it zeroes
    sequentially without contending with task compute."""
    if env is not None:
        return env == "1"
    return _mem_gb(mem) >= 16.0


def get_spark(
    app_name: str = "go_integ_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # Local mode: shuffle partitions ~ cores. On a real cluster this is
    # left to AQE (coalescePartitions) with a high initial value.
    shuffle = shuffle_partitions if shuffle_partitions is not None else cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores ts as TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Accept subset-key hash partitioning for co-partitioned
        # binary ops (cogroup): the block scorers pre-place whole
        # scoring blocks into cost-balanced bins and exchange on the
        # BIN id (functions/blocks.py); bin_id is functionally
        # determined by the grouping keys, so ClusteredDistribution
        # semantics hold and EnsureRequirements must not stack a
        # byte-coalescible full-key exchange on top (r11; plan pins
        # in tests/test_round11_ops.py).
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Shuffle/broadcast/spill codec (guide §2.3/§9): zstd over the
        # lz4 default. A/B'd at the 1000x kNN probe where shuffles are
        # GBs (SMOKE_r14_1000x_knn_codec_{lz4,zstd}.json, adjacent
        # same-window arms): scoring-exchange shuffle bytes -18.9%
        # (6626 -> 5377 MB), wall -13.1%, every codec-touched stage
        # faster (map medians -39%, scoring-stage max task -21%) with
        # no codec-free stage improved — the win is the byte
        # reduction, not window drift. At the 17 MB bench inputs the
        # codec is in the noise either way. SG_IO_CODEC overrides
        # (the probe's A/B hook and an lz4 escape hatch for
        # high-entropy payloads per the guide's "measure both").
        .config(
            "spark.io.compression.codec",
            os.environ.get("SG_IO_CODEC", "zstd"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if pretouch_enabled(mem, os.environ.get("SG_PRETOUCH")):
        # Only effective when this call launches the gateway JVM
        # (first session of the process) — exactly the fresh-JVM case
        # the first-wave page-fault cost belongs to.
        builder = builder.config(
            "spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
