"""Loading the driver-generated analytics tables (TESTDATA.md).

Parquet scans are the scale path: Catalyst pushes filters and prunes
columns into the scan (check ``PushedFilters`` / ``ReadSchema`` in
``df.explain``), and file splitting gives free parallelism. At 100 TB
these tables would be partitioned/bucketed on their join keys; the
query code below never assumes single-file inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor
# (region: 5 rows, nation: 25 rows — fixed-cardinality dims in TPC-H).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # events.parquet stores TIMESTAMP(NANOS); a vanilla session (no
    # session.py confs) throws PARQUET_TYPE_ILLEGAL on read. The conf
    # is runtime-settable, so set it here rather than relying on the
    # caller's session build.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk; with nanosAsLong it arrives
        # as long ns. Truncate to micros (Spark's native precision) —
        # the same truncation DuckDB applies when surfacing ns values.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}
