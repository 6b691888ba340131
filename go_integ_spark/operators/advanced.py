"""Advanced operators: as-of join (Spark has no native one),
exact percentiles, keep-latest PK dedup (CDC emulation), winnowing
fingerprints, and the connector-layer incremental read wired into the
correctness gate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_integ_spark.functions.hashing import h60, h60_sql
from go_integ_spark.registry import register
from go_integ_spark.tables import load_table


@register(
    "asof_join_purchase_click",
    tags=("join", "asof", "window"),
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id, 0 AS kind FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, event_id, 1 AS kind FROM events WHERE event_type = 'purchase'
), w AS (
    SELECT user_id, ts, event_id, kind,
           max(CASE WHEN kind = 0 THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS click_us
    FROM tagged
)
SELECT event_id, user_id, ts, CAST(click_us AS BIGINT) AS asof_click_us
FROM w WHERE kind = 1
""",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at
    or before it (NULL if none) via union + prefix-max window — the
    scale-correct as-of shape: ONE shuffle on the key, no per-key
    pandas, no range explosion; each left row picks up the running
    max right-side timestamp at its sort position, O(1) state per
    partition. The window order (ts, kind, event_id) is total for
    cross-engine determinism.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.max(F.when(F.col("kind") == 0, F.unix_micros(F.col("ts")))).over(w)
    return (
        clicks.unionByName(purchases)
        .withColumn("click_us", running)
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("click_us").cast("bigint").alias("asof_click_us"),
        )
    )


@register(
    "agg_percentiles",
    tags=("agg", "percentile"),
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). Exact percentile holds all group values
    — fine per small group count; the 100 TB path with high-
    cardinality groups is ``percentile_approx`` (t-digest, mergeable
    map-side), which trades the oracle for bounded memory.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "dedup_keep_latest",
    tags=("dedup", "cdc", "window"),
    oracle="""
SELECT user_id, event_id, ts, round(value, 4) AS value
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
) = 1
""",
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK keep-latest (CDC/SCD compaction): one row per key, newest
    wins. The MERGE-emulation pattern from the guide (anti-join +
    union + window) collapses to one max_by aggregation when the full
    history is present: argmax by (ts, event_id) per key. One shuffle
    on the key; at 100 TB feed this from a PK-bucketed table so even
    that shuffle disappears.

    max_by, NOT row_number (rewritten round 7): a rank window cannot
    map-side combine — every version of a key crosses the exchange —
    and Spark's row_number state is a 32-bit int, so one hot key with
    >2^31 versions breaks it (ANSI throws; legacy wraps back through
    rn==1 and emits a SECOND "latest" row, silently violating the PK
    invariant). The aggregate form combines partially on the map side
    (only per-partition winners shuffle) and has no counter at all.
    """
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "ts", "value"),
            F.struct("ts", "event_id"),
        ).alias("r")
    )
    return latest.select(
        "user_id",
        F.col("r.event_id").alias("event_id"),
        F.col("r.ts").alias("ts"),
        F.round("r.value", 4).alias("value"),
    )


@register(
    "connector_file_incremental_read",
    tags=("connector", "incremental", "pushdown"),
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
""",
)
def connector_file_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's connector path inside the correctness gate: a
    FileStream (S12) with a cursor (P3) reads events incrementally
    from a state document — the same StreamSchema/state machinery the
    HTTP connectors use, with the cursor predicate pushed into the
    parquet scan by Catalyst instead of into a query string.
    """
    import datetime as dt

    from go_integ_spark.schema.stream import StreamSchema
    from go_integ_spark.sources.files import FileStream

    fs = FileStream(
        schema=StreamSchema.from_ddl(
            "events",
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        ).iterated_by("ts"),
        path=f"{sf_dir}/events.parquet",
    )
    # tz-AWARE cursor: a naive datetime literal converts via the OS
    # timezone (time.mktime), not the UTC-pinned session zone, so the
    # incremental cutoff would shift on non-UTC hosts while the
    # DuckDB oracle stays put (reproduced under TZ=America/New_York).
    state = {"To": dt.datetime(2024, 1, 20, tzinfo=dt.timezone.utc)}
    # NB: uses the engine's incremental read; we only take the frame
    # (the driver's comparator has no notion of the advanced state).
    # Observed variant: the cursor high-water mark rides the caller's
    # own action instead of costing a dedicated max() job.
    df, _resolve = fs.incremental_dataframe_observed(spark, state)
    return df.select("event_id", "ts", "user_id", "event_type", "value")


WINNOW_K = 8  # char k-gram width
WINNOW_WINDOW = 4  # winnowing window (guarantee gap = K + WINDOW - 1)


def winnow_sets(
    docs: DataFrame, k: int = WINNOW_K, window: int = WINNOW_WINDOW
) -> DataFrame:
    """(doc_id, fps array<bigint>, n) — winnowing document
    fingerprints (Schleimer et al., MOSS): rolling char k-gram
    hashes, minimum per sliding window, distinct.

    Arrow-batched kernel: hashlib md5 IS the engine's md5, so the
    60-bit slice (int of the first 15 hex chars — exactly
    ``functions/hashing.h60``) is bit-identical to both the JVM
    expression form and the DuckDB oracle, and the sliding-window min
    is a vectorized numpy view. The earlier expression form evaluated
    an interpreted md5+conv lambda per char gram, and any query that
    referenced the fingerprint frame from several join branches
    re-paid it per branch — text_winnow_overlap measured ~95 s at
    gate scale against ~3 s with the kernel. tests/test_dedup.py
    pins kernel == expression.
    """
    import numpy as np
    import pandas as pd

    from go_integ_spark.functions.hashing import h60_py

    def _fps(col):
        out = []
        for text in col:
            t = text or ""
            # Grams are CHARACTER windows (matching Spark substring /
            # DuckDB substr), each hashed over its UTF-8 bytes — the
            # byte-sliced variant diverges on any multi-byte text.
            n_grams = len(t) - k + 1
            if n_grams < window:
                out.append(None)
                continue
            h = np.fromiter(
                (h60_py(t[i : i + k]) for i in range(n_grams)),
                dtype=np.int64,
                count=n_grams,
            )
            mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
            out.append(np.unique(mins))
        return pd.Series(out, dtype=object)

    fps_udf = F.pandas_udf(_fps, "array<bigint>")
    return (
        docs.select("doc_id", fps_udf(F.col("text")).alias("fps"))
        .filter(F.col("fps").isNotNull())
        .withColumn("n", F.size("fps"))
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, window: int = WINNOW_WINDOW
) -> DataFrame:
    """(doc_id, fingerprint) rows — exploded ``winnow_sets``."""
    return winnow_sets(docs, k, window).select(
        "doc_id", F.explode("fps").alias("fingerprint")
    )


# Shared winnowing CTE: (doc_id, fps) per doc, mirroring
# winnow_fingerprints exactly (same k-gram hash, window min,
# distinct, and the >= window length filter).
_WINNOW_CTE = f"""
WITH g AS (
    SELECT doc_id,
           list_transform(generate_series(1, greatest(length(text) - {WINNOW_K - 1}, 0)),
               i -> ('0x' || substr(md5(substr(text, CAST(i AS INT), {WINNOW_K})),
                     1, 15))::BIGINT) AS hashes
    FROM documents
), f AS (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, len(hashes) - {WINNOW_WINDOW - 1}),
               i -> list_min(hashes[CAST(i AS INT):CAST(i + {WINNOW_WINDOW - 1} AS INT)])))
               AS fps
    FROM g WHERE len(hashes) >= {WINNOW_WINDOW}
)
"""


@register(
    "text_winnow_fingerprint",
    tags=("text", "fingerprint", "dedup"),
    oracle=_WINNOW_CTE
    + """
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
       list_min(fps) AS min_fingerprint
FROM f
""",
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint summary per document (fingerprint count +
    min fingerprint). The engine-portable h60 k-gram hash gives this
    query a full value-level DuckDB oracle (it was rows-only while
    xxhash64-based); near-dup detection equivalence with Jaccard is
    pinned in tests/test_dedup.py.
    """
    from go_integ_spark.operators.dedup import _spread

    docs = load_table(spark, sf_dir, "documents")
    fp = winnow_fingerprints(_spread(docs))
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fingerprint").alias("min_fingerprint"),
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bin_seconds: int,
) -> DataFrame:
    """Point-in-interval join as an equi-join on time bins.

    Spark plans a bare ``p.ts BETWEEN i.lo AND i.hi`` join as a
    BroadcastNestedLoopJoin — quadratic, and a non-starter at scale.
    Binning restores hash semantics: each interval is exploded to the
    ``width/bin`` bins it overlaps, each point maps to exactly ONE
    bin, the join is a plain shuffled equi-join on the bin id, and
    the exact predicate filters inside the matched bin. Because a
    point lives in one bin, no pair can match twice — no dedup pass.
    ``bin_seconds`` should be ~ the typical interval width: wider
    bins mean fewer interval copies but more false candidates.

    Returns interval rows joined with matching point rows; callers
    aggregate. Left-outer on the bin join keeps empty intervals.
    """
    p_bin = (F.unix_micros(F.col(point_ts)) / F.lit(bin_seconds * 1_000_000)).cast(
        "long"
    )
    lo_bin = (F.unix_micros(F.col(lo)) / F.lit(bin_seconds * 1_000_000)).cast("long")
    hi_bin = (F.unix_micros(F.col(hi)) / F.lit(bin_seconds * 1_000_000)).cast("long")
    iv = intervals.withColumn("bin", F.explode(F.sequence(lo_bin, hi_bin)))
    pt = points.withColumn("bin", p_bin)
    in_range = (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi))
    return iv.join(pt, on="bin", how="left").withColumn(
        "matched", F.when(in_range, F.lit(1)).otherwise(F.lit(0))
    )


@register(
    "range_join_error_clicks",
    tags=("join", "range", "interval"),
    oracle="""
SELECT e.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'click') c
  ON c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
GROUP BY e.event_id
""",
)
def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unkeyed interval join: clicks within the 10 minutes before
    each error, counted per error. See range_join_binned — the plan
    is a hash equi-join on 10-minute bins (2 bins per interval), not
    a nested loop; tests/test_plans.py pins that.
    """
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    joined = range_join_binned(clicks, errors, "cts", "lo", "hi", bin_seconds=600)
    return joined.groupBy("event_id").agg(
        F.sum("matched").cast("bigint").alias("n_clicks")
    )


@register(
    "connector_http_paginated_read",
    tags=("connector", "http", "pagination"),
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders
""",
)
def connector_http_paginated_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core capability inside the correctness gate: a
    paginated HTTP API (offset/limit, S6 — sitoo.go:56-62) served
    from the orders table by an in-process stub, extracted through
    the engine's HttpStream (pagination loop, record-path extraction,
    short-page termination), and returned as a DataFrame that must
    hash-match DuckDB reading the same parquet. End-to-end proof the
    HTTP extract path is lossless.

    Driver-side fetch (probe-scale); the executor-distributed path is
    the Python DataSource (tests/test_spark_integration.py).
    """
    from go_integ_spark.schema.stream import StreamSchema
    from go_integ_spark.sources.http import OffsetLimitPaginator
    from go_integ_spark.sources.source import HttpStream

    port = _orders_gate_server(sf_dir)
    stream = HttpStream(
        schema=StreamSchema.from_ddl(
            "orders",
            "o_orderkey bigint, o_custkey bigint, "
            "o_orderstatus string, o_orderpriority string",
        ),
        path="/orders",
        record_path="records",
        paginator=lambda: OffsetLimitPaginator(
            offset_param="start", limit_param="num", page_size=1000
        ),
    )
    pages, _ = stream.read({"url": f"http://127.0.0.1:{port}"}, None)
    fetched = [r for p in pages for r in p]
    return spark.createDataFrame(
        [(r["o_orderkey"], r["o_custkey"], r["o_orderstatus"], r["o_orderpriority"]) for r in fetched],
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_orderpriority string",
    )


@register(
    "connector_graphql_cursor_read",
    tags=("connector", "http", "graphql", "pagination"),
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer
""",
)
def connector_graphql_cursor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relay-style GraphQL cursor pagination end-to-end: an
    in-process GraphQL stub serves the customer table as a
    connection (``edges[].node`` + ``pageInfo.hasNextPage/endCursor``),
    extracted through HttpStream's POST-body path
    (GraphQLCursorPaginator re-POSTs the query with
    ``variables.after``; record_unwrap peels ``node``). The result
    must hash-match DuckDB reading the same parquet — proof the
    cursor chain is lossless. No reference twin: the reference's
    Shopify integration is REST (shopify.go:46-53); this is the same
    API's GraphQL successor style.

    Driver-side fetch (probe-scale, same guardrail as the REST twin);
    distributed extraction reuses the DataSource path unchanged since
    HttpStream pickles with its body template.
    """
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow.parquet as pq

    from go_integ_spark.schema.stream import StreamSchema
    from go_integ_spark.sources.http import GraphQLCursorPaginator
    from go_integ_spark.sources.source import HttpStream

    cols = ["c_custkey", "c_name", "c_acctbal"]
    rows = pq.read_table(f"{sf_dir}/customer.parquet", columns=cols).to_pylist()
    page_size = 500

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            payload = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            after = (payload.get("variables") or {}).get("after")
            start = int(after.split(":", 1)[1]) if after else 0
            page = rows[start : start + page_size]
            nxt = start + len(page)
            body = _json.dumps(
                {
                    "data": {
                        "customers": {
                            "edges": [{"node": r} for r in page],
                            "pageInfo": {
                                "hasNextPage": nxt < len(rows),
                                "endCursor": f"cur:{nxt}",
                            },
                        }
                    }
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        stream = HttpStream(
            schema=StreamSchema.from_ddl(
                "customers", "c_custkey bigint, c_name string, c_acctbal double"
            ),
            path="/graphql",
            record_path="data.customers.edges",
            record_unwrap="node",
            json_body={
                "query": "query($after: String) { customers(first: 500, after: $after)"
                " { edges { node { c_custkey c_name c_acctbal } }"
                " pageInfo { hasNextPage endCursor } } }",
                "variables": {"after": None},
            },
            paginator=lambda: GraphQLCursorPaginator(connection_path="data.customers"),
        )
        pages, _ = stream.read({"url": f"http://127.0.0.1:{srv.server_port}"}, None)
        fetched = [r for p in pages for r in p]
    finally:
        srv.shutdown()
        srv.server_close()
    return spark.createDataFrame(
        [(r["c_custkey"], r["c_name"], r["c_acctbal"]) for r in fetched],
        schema="c_custkey bigint, c_name string, c_acctbal double",
    )


BASKET_MIN_SUPPORT = 2


@register(
    "basket_part_pairs",
    tags=("basket", "pairs", "agg"),
    oracle=f"""
WITH pp AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM pp a
JOIN pp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {BASKET_MIN_SUPPORT}
""",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in
    >= {support} orders. Same bucket-and-enumerate shape as the dedup
    pair miner (operators/dedup.py::_pairs_from_sorted_array): group
    lineitems by order, enumerate each basket's pairs JVM-side — one
    shuffle on the basket key instead of a distinct + self-join
    (three shuffles), and pair fan-out is bounded by basket size
    squared, never by part popularity.
    """
    from go_integ_spark.operators.dedup import _pairs_from_sorted_array

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    return (
        baskets.select(F.explode(_pairs_from_sorted_array("ds")).alias("p"))
        .groupBy(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= BASKET_MIN_SUPPORT)
    )


if basket_part_pairs.__doc__:  # absent under PYTHONOPTIMIZE=2
    basket_part_pairs.__doc__ = basket_part_pairs.__doc__.replace(
        "{support}", str(BASKET_MIN_SUPPORT)
    )


# Paginated servers for the distributed-read gate query, one per
# sf_dir, kept alive for the session (the DataSource read is lazy:
# executors fetch when the driver collects, so the server must
# outlive this function). Daemon worker processes die with the
# session process.
_GATE_SERVERS: dict[str, int] = {}

# Worker processes serving one gate fixture. 4 is plenty for the
# bench's 8 concurrent strides over 300 pages; the 2M-row scale probe
# (scripts/probe_connector_scale.py) uses its own 8-worker pool.
GATE_WORKERS = 4


def _gate_worker_main(sf_dir: str, port: int, parent_pid: int) -> None:
    """One gate-server worker process: loads the orders page data,
    binds the shared SO_REUSEPORT port, prints READY, serves until
    the parent dies (ppid watchdog) or it is terminated. Launched as
    a fresh subprocess — not a fork: by the time the bench/gate calls
    for the server a Spark JVM and its py4j sockets already exist in
    the parent, and a forked child inheriting those descriptors is a
    latent hazard a measurement fixture must not carry."""
    import json as _json
    import socket
    import threading
    import time as _time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import pyarrow.parquet as pq

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    rows = pq.read_table(f"{sf_dir}/orders.parquet", columns=cols).to_pylist()

    # Serve pre-serialized page bodies: with 8 executor strides
    # hitting the server concurrently, per-request json.dumps of
    # 500-row slices would make the bench line measure the TOY
    # SERVER, not the client extract path. Cache keyed by
    # (start, num); bounded by page count.
    page_cache: dict[tuple[int, int], bytes] = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            start = int(q.get("start", ["0"])[0])
            num = int(q.get("num", ["1000"])[0])
            body = page_cache.get((start, num))
            if body is None:
                body = _json.dumps({"records": rows[start : start + num]}).encode()
                page_cache[(start, num)] = body
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    class ReusePortServer(ThreadingHTTPServer):
        def server_bind(self):
            self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
            super().server_bind()

    def _watch_parent() -> None:
        while os.getppid() == parent_pid:
            _time.sleep(2.0)
        os._exit(0)

    threading.Thread(target=_watch_parent, daemon=True).start()
    srv = ReusePortServer(("127.0.0.1", port), Handler)
    print("READY", flush=True)
    srv.serve_forever()


def _orders_gate_server(sf_dir: str) -> int:
    """Start (once per sf_dir) the paginated orders API the connector
    gate queries read. Served from GATE_WORKERS independent PROCESSES
    sharing one SO_REUSEPORT listen port — NOT from a thread inside
    the driver python process: the r13 bench line was bimodal
    (0.71-2.25 s on identical code) because the in-driver toy server's
    30-request pagination chains competed with the driver's own GIL
    and scheduler slice, so the line measured driver-process jitter,
    not the extract path (VERDICT r13 item 4). The kernel
    load-balances connections across the worker listeners (the
    HTTP/1.0 close-per-request handler makes every page fetch a fresh
    connection), same isolation the 2M-row scale probe already used."""
    import socket
    import subprocess
    import sys

    if sf_dir in _GATE_SERVERS:
        return _GATE_SERVERS[sf_dir]
    # hold the chosen port with a REUSEPORT-bound (non-listening)
    # socket until every worker has bound it, so no other process can
    # claim it in the gap; TCP routes connections only to LISTENING
    # sockets, so the placeholder never receives one.
    placeholder = socket.socket()
    placeholder.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
    placeholder.bind(("127.0.0.1", 0))
    port = placeholder.getsockname()[1]
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "go_integ_spark.operators.advanced",
                sf_dir,
                str(port),
                str(os.getpid()),
            ],
            stdout=subprocess.PIPE,
            env=env,
        )
        for _ in range(int(os.environ.get("SG_GATE_WORKERS", GATE_WORKERS)))
    ]
    for p in procs:
        if b"READY" not in p.stdout.readline():
            raise RuntimeError(
                f"gate-server worker for {sf_dir} failed to become ready"
            )
    # workers self-terminate via the ppid watchdog when this process
    # exits; terminate eagerly too so a long-lived session that
    # re-execs doesn't strand listeners until the watchdog tick.
    import atexit

    def _reap() -> None:
        for p in procs:
            try:
                p.terminate()
            except OSError:
                pass

    atexit.register(_reap)
    placeholder.close()
    _GATE_SERVERS[sf_dir] = port
    return port


def _gate_paginator():
    # module-level: the stream pickles to executors
    from go_integ_spark.sources.http import OffsetLimitPaginator

    return OffsetLimitPaginator(offset_param="start", limit_param="num", page_size=500)


@register(
    "connector_datasource_distributed_read",
    tags=("connector", "datasource", "distributed"),
    # Headline bench: the reference's core capability (paginated HTTP
    # extract) on its distributed path — without a bench line a read-
    # path regression would be invisible round-to-round (VERDICT r7
    # missing-item 2). The one-time gate-server start is billed to
    # its own line in bench.py, like the shingle cache.
    bench=True,
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders
""",
)
def connector_datasource_distributed_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path of the HTTP extract inside the correctness
    gate: the same paginated orders API, but read through the Python
    DataSource — 8 input partitions fetch interleaved offset strides
    IN EXECUTORS (sources/datasource.py), and the union of all
    pagination chains must still hash-match DuckDB reading the
    parquet. Proves the distributed fan-out loses/duplicates nothing.
    """
    from go_integ_spark.schema.stream import StreamSchema
    from go_integ_spark.sources.datasource import stream_dataframe
    from go_integ_spark.sources.source import HttpStream

    port = _orders_gate_server(sf_dir)
    stream = HttpStream(
        schema=StreamSchema.from_ddl(
            "orders",
            "o_orderkey bigint, o_custkey bigint, "
            "o_orderstatus string, o_orderpriority string",
        ),
        path="/orders",
        record_path="records",
        paginator=_gate_paginator,
    )
    df, _ = stream_dataframe(
        spark, stream, {"url": f"http://127.0.0.1:{port}"}, None, num_partitions=8
    )
    return df


CDC_CUTOFF = "2024-01-01 06:00:00"


@register(
    "cdc_snapshot_diff",
    tags=("cdc", "connector", "aggregation"),
    oracle=f"""
WITH new_s AS (
    SELECT user_id, event_id AS new_event_id, ts AS new_ts
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) = 1
), old_s AS (
    SELECT user_id, event_id AS old_event_id
    FROM events
    WHERE ts <= TIMESTAMP '{CDC_CUTOFF}'
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) = 1
)
SELECT n.user_id,
       CASE WHEN o.old_event_id IS NULL THEN 'insert' ELSE 'update' END AS op,
       o.old_event_id,
       n.new_event_id,
       n.new_ts
FROM new_s n
LEFT JOIN old_s o USING (user_id)
WHERE o.old_event_id IS NULL OR o.old_event_id <> n.new_event_id
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff CDC: which per-user latest rows changed between
    the pre-cutoff snapshot and now — 'insert' for users first seen
    after the cutoff, 'update' for users whose latest row moved. This
    is the connector fallback when a source declares no cursor field
    (the reference's incremental mode requires IterateBy,
    sourcedef.go:58-66; diffing snapshots is what's left without it).

    Scale shape: ONE shuffle — both snapshots' arg-max rows come out
    of a single groupBy(user_id) via conditional struct max
    (max(when(ts <= cutoff, struct)) beside max(struct)), instead of
    the naive two-window-two-join plan that scans and shuffles events
    twice. The diff filter is then row-local on the aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    return snapshot_diff(ev, CDC_CUTOFF)


def snapshot_diff(ev: DataFrame, cutoff: str) -> DataFrame:
    """Single-shuffle snapshot diff over any (user_id, ts, event_id)
    frame — see ``cdc_snapshot_diff`` for semantics and scale notes.
    """
    pack = F.struct(F.col("ts"), F.col("event_id"))
    cutoff_ts = F.lit(cutoff).cast("timestamp")
    agg = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("ts") <= cutoff_ts, pack)).alias("old"),
        F.max(pack).alias("new"),
    )
    return (
        agg.filter(
            F.col("old").isNull()
            | (F.col("old.event_id") != F.col("new.event_id"))
        )
        .select(
            "user_id",
            F.when(F.col("old").isNull(), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.col("old.event_id").alias("old_event_id"),
            F.col("new.event_id").alias("new_event_id"),
            F.col("new.ts").alias("new_ts"),
        )
    )


@register(
    "agg_sketch_accuracy",
    tags=("agg", "sketch", "approx"),
    oracle="""
SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
       TRUE AS hll_orders_ok,
       TRUE AS p50_ok
""" + "FROM lineitem",
)
def agg_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy gate: HyperLogLog++ distinct counts and the
    quantile sketch (``approx_count_distinct`` rsd=2%,
    ``percentile_approx`` accuracy=10000) are computed alongside their
    exact counterparts in ONE aggregation pass, and the query returns
    the exact values plus booleans asserting each sketch landed within
    tolerance (5% for HLL, 1% for the quantile). The DuckDB oracle
    recomputes the exact values and expects every boolean TRUE — so
    the correctness gate genuinely verifies sketch error bounds, not
    just that the functions run.

    Scale shape: sketches are THE 100 TB answer for distincts and
    quantiles — fixed-size mergeable state (HLL registers / KLL-style
    buckets), map-side partial aggregation, no giant hash table of
    distinct keys, no full sort. The exact twins here exist only to
    measure the sketches and would be dropped at production scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("median_exact"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("hll_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5D, 10000)").alias("p50_approx"),
    )
    return row.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round("median_exact", 2).alias("median_price"),
        (F.abs(F.col("hll_orders") - F.col("n_orders")) <= 0.05 * F.col("n_orders")).alias("hll_orders_ok"),
        (F.abs(F.col("p50_approx") - F.col("median_exact")) <= 0.01 * F.col("median_exact")).alias("p50_ok"),
    )


HIST_BINS = 20

# Shared with streaming_histogram: driven to completion, the streamed
# bucket counts must equal this batch result exactly.
HISTOGRAM_ORACLE = f"""
WITH stats AS (
    SELECT min(value) AS mn, max(value) AS mx FROM events
), b AS (
    SELECT CAST(least(floor((e.value - s.mn) * {HIST_BINS} / (s.mx - s.mn)),
                      {HIST_BINS - 1}) AS INT) AS bucket,
           s.mn, s.mx
    FROM events e CROSS JOIN stats s
)
SELECT bucket,
       round(mn + bucket * ((mx - mn) / {HIST_BINS}), 4) AS bin_lo,
       round(mn + (bucket + 1) * ((mx - mn) / {HIST_BINS}), 4) AS bin_hi,
       CAST(count(*) AS BIGINT) AS n
FROM b
GROUP BY bucket, mn, mx
"""


@register(
    "agg_histogram",
    tags=("agg", "histogram", "two_pass"),
    oracle=HISTOGRAM_ORACLE,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of the event value distribution — the
    profiling aggregate behind range-partition planning, skew
    detection, and dashboard distributions. Two passes, both
    map-side-combined: pass 1 reduces to a single (min, max) row that
    rides a one-row broadcast cross join; pass 2 buckets row-locally
    and aggregates {HIST_BINS} counter rows. Scan-bound at 100 TB —
    the shuffle carries at most {HIST_BINS} rows per task.

    Cross-engine exactness: the bucket expression is the identical
    left-associated double arithmetic in both engines
    (floor((v - mn) * B / (mx - mn)) capped at B - 1), and the bin
    edges derive from the same (mn, mx) scalars, so even boundary
    values bucket identically.
    """
    ev = load_table(spark, sf_dir, "events").select("value")
    stats = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    bucket = F.least(
        F.floor(
            ((F.col("value") - F.col("mn")) * HIST_BINS) / (F.col("mx") - F.col("mn"))
        ),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    width = (F.col("mx") - F.col("mn")) / HIST_BINS
    return (
        ev.crossJoin(F.broadcast(stats))
        .select(bucket.alias("bucket"), "mn", "mx")
        .groupBy("bucket", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.col("mn") + F.col("bucket") * width, 4).alias("bin_lo"),
            F.round(F.col("mn") + (F.col("bucket") + 1) * width, 4).alias("bin_hi"),
            "n",
        )
    )


if agg_histogram.__doc__:  # absent under PYTHONOPTIMIZE=2
    agg_histogram.__doc__ = agg_histogram.__doc__.replace(
        "{HIST_BINS}", str(HIST_BINS)
    )


ATTRIBUTION_DAYS = 7


@register(
    "asof_join_click_attribution",
    tags=("join", "asof", "window"),
    oracle=f"""
WITH tagged AS (
    SELECT user_id, ts, event_id, 0 AS kind FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, event_id, 1 AS kind FROM events WHERE event_type = 'purchase'
), w AS (
    SELECT user_id, ts, event_id, kind,
           min(CASE WHEN kind = 1 THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS next_purchase_us
    FROM tagged
)
SELECT event_id, user_id, ts,
       CAST(CASE WHEN next_purchase_us - epoch_us(ts)
                      <= {ATTRIBUTION_DAYS} * 86400000000 THEN next_purchase_us
            END AS BIGINT) AS attributed_purchase_us,
       coalesce(next_purchase_us - epoch_us(ts)
                    <= {ATTRIBUTION_DAYS} * 86400000000, FALSE) AS attributed
FROM w WHERE kind = 0
""",
)
def asof_join_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance window — the attribution
    query (each click matched to the user's next purchase at-or-after
    it, only if within 7 days). The mirror of
    ``asof_join_purchase_click``: same union + single-shuffle window
    shape, but the running aggregate is a suffix-min over the
    FOLLOWING frame instead of a prefix-max — both directions of
    as-of now exist as first-class queries. O(1) state per partition,
    unchanged at 100 TB.

    Ordering (ts, kind, event_id) is total and puts clicks (kind 0)
    before purchases at equal timestamps, so a same-instant purchase
    is attributable — the same convention, mirrored, that the
    backward query uses.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.min(F.when(F.col("kind") == 1, F.unix_micros(F.col("ts")))).over(w)
    horizon = ATTRIBUTION_DAYS * 86_400_000_000
    in_window = (F.col("next_purchase_us") - F.unix_micros(F.col("ts"))) <= horizon
    return (
        clicks.unionByName(purchases)
        .withColumn("next_purchase_us", nxt)
        .filter(F.col("kind") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(in_window, F.col("next_purchase_us"))
            .cast("bigint")
            .alias("attributed_purchase_us"),
            F.coalesce(in_window, F.lit(False)).alias("attributed"),
        )
    )


RFM_BUCKETS = 5


@register(
    "events_rfm",
    tags=("events", "window", "scoring"),
    oracle=f"""
WITH px AS (
    SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
), anchor AS (
    SELECT max(ts) AS mx FROM px
), rfm AS (
    SELECT p.user_id,
           CAST(date_diff('day', max(p.ts), a.mx) AS BIGINT) AS recency_days,
           CAST(count(*) AS BIGINT) AS frequency,
           round(sum(p.value), 4) AS monetary
    FROM px p CROSS JOIN anchor a
    GROUP BY p.user_id, a.mx
)
SELECT user_id, recency_days, frequency, monetary,
       CAST(ntile({RFM_BUCKETS}) OVER (
           ORDER BY recency_days, user_id) AS INT) AS r_score,
       CAST(ntile({RFM_BUCKETS}) OVER (
           ORDER BY frequency DESC, user_id) AS INT) AS f_score,
       CAST(ntile({RFM_BUCKETS}) OVER (
           ORDER BY monetary DESC, user_id) AS INT) AS m_score
FROM rfm
""",
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer scoring — the
    classic segmentation aggregate: per purchasing user, days since
    last purchase (vs the corpus max — deterministic anchor),
    purchase count, total spend, and quintile scores for each
    (ntile over a TOTAL order: metric then user_id, so both engines
    tile identically).

    Scale note: the per-user rollup is one map-side-combined
    aggregation; the ntile windows are global single-partition sorts
    over the USER table (users << events). At extreme user counts the
    scores would come from approx-quantile cuts against the same
    rollup (the embedding_outliers two-pass pattern) instead of a
    global sort — documented trade, not needed at gate scale.
    """
    ev = load_table(spark, sf_dir, "events")
    px = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    anchor = px.agg(F.max("ts").alias("mx"))
    rfm = (
        px.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "mx")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 4).alias("monetary"),
        )
        .select(
            "user_id",
            F.datediff(F.to_date("mx"), F.to_date("last_ts"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return rfm.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy("recency_days", "user_id"))
        .cast("int")
        .alias("r_score"),
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy(F.col("frequency").desc(), "user_id"))
        .cast("int")
        .alias("f_score"),
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy(F.col("monetary").desc(), "user_id"))
        .cast("int")
        .alias("m_score"),
    )


@register(
    "cdc_scd2_history",
    tags=("cdc", "window"),
    oracle="""
SELECT user_id, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(lead(epoch_us(ts)) OVER w AS BIGINT) AS valid_to_us,
       (lead(ts) OVER w IS NULL) AS is_current,
       round(value, 4) AS value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build — the OTHER standard CDC
    materialization next to keep-latest (``dedup_keep_latest``
    compacts to one row per key; SCD2 keeps EVERY version with a
    validity interval): per key, ``valid_from`` is the change's own
    timestamp, ``valid_to`` the next change's (NULL + is_current for
    the open row). One shuffle on the key serves the single lead
    window; at 100 TB this is the classic one-pass history rebuild,
    and the same window incrementalizes per micro-batch (new rows
    close the previous current row — the foreachBatch MERGE pattern
    streaming_foreach_batch_merge demonstrates).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros(F.col("ts"))).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("valid_from_us"),
        nxt.cast("bigint").alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        F.round("value", 4).alias("value"),
    )


OVERLAP_BIN_US = 86_400_000_000  # 1-day bins for the interval overlap


@register(
    "join_interval_overlap",
    tags=("join", "range", "interval"),
    oracle="""
SELECT p.event_id AS purchase_id, x.event_id AS error_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') x
  ON x.user_id = p.user_id
 AND p.ts <= x.ts + INTERVAL 1 DAY
 AND x.ts <= p.ts + INTERVAL 7 DAY
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL x INTERVAL overlap join (both sides are ranges —
    the class range_join_error_clicks' point-in-interval bins don't
    cover): each purchase carries a 7-day attribution window, each
    error a 1-day impact window, and the query emits same-user
    overlapping (purchase, error) window pairs.

    Scale shape: both interval sets explode to their covered day
    bins, the join is a hash equi-join on (user_id, bin) — never a
    nested loop — duplicate bin hits collapse with one distinct, and
    the exact overlap predicate filters bin-grazing false positives.
    Bin width trades explode factor against join selectivity; a day
    keeps it at <= 8 rows per purchase and 2 per error.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    day = OVERLAP_BIN_US

    def with_bins(df, lo, hi):
        # one row per covered day bin; cast truncation == floor for
        # the non-negative microsecond timestamps this corpus carries
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    (F.col(lo) / day).cast("bigint"),
                    (F.col(hi) / day).cast("bigint"),
                )
            ),
        )

    purchases = with_bins(
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            us.alias("p_lo"),
            (us + 7 * day).alias("p_hi"),
        ),
        "p_lo",
        "p_hi",
    )
    errors = with_bins(
        ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            "user_id",
            us.alias("x_lo"),
            (us + day).alias("x_hi"),
        ),
        "x_lo",
        "x_hi",
    )
    overlap = (F.col("p_lo") <= F.col("x_hi")) & (F.col("x_lo") <= F.col("p_hi"))
    return (
        purchases.join(errors, ["user_id", "bin"])
        .filter(overlap)
        .select("purchase_id", "error_id")
        .distinct()
    )


@register(
    "agg_mode_deterministic",
    tags=("agg", "window"),
    oracle="""
SELECT user_id, event_type AS mode_event_type, CAST(n AS BIGINT) AS n
FROM (
    SELECT user_id, event_type, count(*) AS n,
           row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type
           ) AS rn
    FROM events
    GROUP BY user_id, event_type
)
WHERE rn = 1
""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value) with a DETERMINISTIC tie
    rule (count desc, then value) — built-in ``mode()`` breaks ties
    arbitrarily in both engines, which is exactly what a correctness
    gate cannot accept, so the portable spelling is count + window.
    Scale: the count aggregate combines map-side to (group, value)
    cardinality; the window partitions by group over value-bounded
    rows — nothing is corpus-sized after the first combine.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


@register(
    "agg_correlation",
    tags=("agg", "statistics"),
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(stddev_samp(l_quantity), 4) AS sd_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical co-movement aggregates per group: Pearson
    correlation, sample covariance, and standard deviation — the
    profiling numbers behind feature selection and anomaly baselines.
    All three are single-pass mergeable aggregates (sum/sum-of-
    squares/cross-product moments combine map-side), so the plan is
    one combine-enabled aggregation — the 100 TB shape by
    construction. Rounding absorbs the engines' moment-accumulation
    order differences (same contract as agg_percentiles).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
    )


WINNOW_OVERLAP_THRESHOLD = 0.35  # MOSS-style report threshold
# Common-fingerprint drop (straight from the MOSS paper: fingerprints
# appearing "in too many documents" carry no authorship signal and
# their buckets are the quadratic cost): fingerprints in more than
# this many docs are excluded from pair counting in BOTH engines, so
# the oracle stays value-exact.
WINNOW_DF_CAP = 64


@register(
    "text_winnow_overlap",
    tags=("text", "fingerprint", "join"),
    oracle=_WINNOW_CTE
    + f"""
, sz AS (
    SELECT doc_id, len(fps) AS n FROM f
), e AS (
    SELECT doc_id, unnest(fps) AS fp FROM f
), rare AS (
    SELECT fp FROM e GROUP BY fp HAVING count(*) <= {WINNOW_DF_CAP}
), er AS (
    SELECT e.doc_id, e.fp FROM e JOIN rare USING (fp)
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared
    FROM er a JOIN er b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared,
       round(shared / least(sa.n, sb.n), 4) AS overlap
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE shared / least(sa.n, sb.n) >= {WINNOW_OVERLAP_THRESHOLD}
""",
)
def text_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style document-overlap report: pairs of documents sharing
    >= 35% of the SMALLER side's winnowing fingerprints — the
    plagiarism/quote-detection statistic (Schleimer et al.), robust
    to reordering and insertion where shingle Jaccard is not, and
    asymmetric like ``dedup_containment`` so a short excerpt inside a
    long doc still trips it. Per the MOSS recipe, fingerprints in
    more than WINNOW_DF_CAP documents are dropped before pair
    counting (no authorship signal, quadratic buckets) — mirrored in
    the oracle, so the gate stays value-exact.

    Pair counting here is a fingerprint equi self-JOIN (codegen hash
    join), not the dedup family's bucket-array enumeration: winnow
    mins concentrate (the globally smallest gram hashes surface in
    MANY docs), and the nested-transform enumeration paid ~100us of
    interpreted higher-order evaluation PER PAIR on those buckets —
    measured 95 s at gate scale vs ~3 s for the join on the same
    pairs. The overlap denominator still uses full per-doc
    fingerprint counts.
    """
    from go_integ_spark.operators.dedup import _spread

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # sets_ feeds the df-filter branch AND both sides of the pair
    # self-join; without the persist the md5-per-char-gram winnow
    # kernel re-runs once per branch (8 ArrowEvalPython nodes in the
    # unpersisted plan).
    sets_ = winnow_sets(_spread(docs)).persist()
    sh = sets_.select("doc_id", "n", F.explode("fps").alias("sid"))
    rare = (
        sh.groupBy("sid")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= WINNOW_DF_CAP)
        .select("sid")
    )
    shr = sh.join(rare, "sid")
    a = shr.select(
        F.col("sid"),
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("n_a"),
    )
    b = shr.select(
        F.col("sid"),
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("n_b"),
    )
    pairs = (
        a.join(b, "sid")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "n_a", "doc_b", "n_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    overlap = F.col("c") / F.least(F.col("n_a"), F.col("n_b"))
    return (
        pairs.filter(overlap >= WINNOW_OVERLAP_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            F.col("c").cast("bigint").alias("shared"),
            F.round(overlap, 4).alias("overlap"),
        )
    )


@register(
    "agg_regression",
    tags=("agg", "statistics"),
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (price ~ quantity):
    slope, intercept, and R^2 via the SQL regression aggregates —
    single-pass mergeable moment accumulators (sums of x, y, xy, xx),
    so the whole fit is one combine-enabled aggregation with no
    second pass over the data. The trend-extraction shape behind
    q6-style forecasting at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
    )


# --- Count-min sketch -------------------------------------------------

# Sketch geometry: 4 independent hash rows x 256 counters = 1 KiB of
# int64 state. Error bound: overcount <= 2 * N / W with probability
# 1 - (1/2)^D (Cormode & Muthukrishnan 2005); the gate query emits the
# actual overcount per heavy hitter so the bound is visible data, not
# a claim.
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP_K = 20


@register(
    "agg_countmin_sketch",
    tags=("agg", "sketch", "heavy_hitters"),
    oracle=f"""
WITH words AS (
    SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS word
    FROM documents
), exact AS (
    SELECT word, CAST(count(*) AS BIGINT) AS exact_n
    FROM words GROUP BY 1
), top AS (
    SELECT word, exact_n, rn FROM (
        SELECT word, exact_n,
               row_number() OVER (ORDER BY exact_n DESC, word) AS rn
        FROM exact
    ) WHERE rn <= {CMS_TOP_K}
), depths AS (
    SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d
), cms AS (
    SELECT dp.d,
           {h60_sql("CAST(dp.d AS VARCHAR) || ':' || w.word")}
               % {CMS_WIDTH} AS bucket,
           CAST(count(*) AS BIGINT) AS c
    FROM words w, depths dp
    GROUP BY 1, 2
), est AS (
    SELECT t.word, min(c.c) AS cms_n
    FROM top t, depths dp
    JOIN cms c
      ON c.d = dp.d
     AND c.bucket = {h60_sql("CAST(dp.d AS VARCHAR) || ':' || t.word")}
               % {CMS_WIDTH}
    GROUP BY t.word
)
SELECT t.word, t.exact_n, e.cms_n, e.cms_n - t.exact_n AS overcount,
       CAST(t.rn AS INT) AS rank
FROM top t JOIN est e ON e.word = t.word
""",
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus vocabulary: a {CMS_DEPTH}x{CMS_WIDTH}
    counter grid (1 KiB of mergeable int64 state) estimates every
    word's frequency; the query reports the estimate next to the
    exact count for the global top-{CMS_TOP_K} heavy hitters, plus the
    realized overcount — so the gate verifies the sketch's one-sided
    error guarantee (cms_n >= exact_n always; expected overcount
    <= 2N/{CMS_WIDTH} per row) on real data, the same way
    agg_sketch_accuracy gates HLL/quantile sketches.

    The hash family is the engine-portable ``h60(depth ':' word)``
    (md5-derived), so sketch contents are bit-identical in Spark,
    DuckDB, and any future backend — a CMS built by one engine can be
    merged with or probed by another.

    Scale shape: the sketch build is ONE aggregation whose shuffle
    carries at most {CMS_DEPTH}*{CMS_WIDTH} = {CMS_DEPTH * CMS_WIDTH} counter rows per map
    partition (map-side partial combine collapses the token stream
    into the fixed grid before anything moves) — THE structure for
    frequency estimation when the vocabulary itself is too large to
    shuffle. The exact side exists only to measure the sketch; the
    probe joins the top-k words against the {CMS_DEPTH * CMS_WIDTH}-row grid
    (broadcast). At 100 TB you'd keep the build and drop the exact
    twin; per-partition grids merge by cellwise addition.
    """
    docs = load_table(spark, sf_dir, "documents")
    # words feeds the sketch build AND the exact side; persist so the
    # corpus tokenization (regexp + explode over every document) runs
    # once per action, not once per branch.
    words = docs.select(
        F.explode(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("word")
    ).persist()
    depths = F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    keyed = words.select(
        "word", F.explode(depths).alias("d")
    ).withColumn(
        "bucket",
        h60(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("word")))
        % CMS_WIDTH,
    )
    cms = keyed.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))

    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    top = (
        exact.orderBy(F.col("exact_n").desc(), F.col("word"))
        .limit(CMS_TOP_K)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("exact_n").desc(), F.col("word")))
            .cast("int"),
        )
    )
    probe = top.select(
        "word", "exact_n", "rank", F.explode(depths).alias("d")
    ).withColumn(
        "bucket",
        h60(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("word")))
        % CMS_WIDTH,
    )
    est = (
        probe.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("word", "exact_n", "rank")
        .agg(F.min("c").alias("cms_n"))
    )
    return est.select(
        "word",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
        "rank",
    )


if agg_countmin_sketch.__doc__:  # absent under PYTHONOPTIMIZE=2
    agg_countmin_sketch.__doc__ = (
        agg_countmin_sketch.__doc__
        .replace("{CMS_DEPTH * CMS_WIDTH}", str(CMS_DEPTH * CMS_WIDTH))
        .replace("{CMS_DEPTH}", str(CMS_DEPTH))
        .replace("{CMS_WIDTH}", str(CMS_WIDTH))
        .replace("{CMS_TOP_K}", str(CMS_TOP_K))
    )


# --- Bloom-filter pre-filter ------------------------------------------

# k=3 hash positions per key; bits sized to the realized key count
# (m = 10n + 1 -> ~0.26 fill -> ~1.7% FPR) the way a deployment sizes
# a bloom to its build side, so the realized FPR the gate reports
# stays in the useful band at every scale factor instead of
# saturating as the corpus grows.
BLOOM_K = 3
BLOOM_BITS_PER_KEY = 10
BLOOM_PRICE_CUT = 450000.0


@register(
    "agg_bloom_prefilter",
    tags=("agg", "sketch", "join"),
    oracle=f"""
WITH keys AS (
    SELECT DISTINCT o_custkey AS k FROM orders
    WHERE o_totalprice > {BLOOM_PRICE_CUT}
), mbits AS (
    SELECT CAST({BLOOM_BITS_PER_KEY} * count(*) + 1 AS BIGINT) AS m FROM keys
), hs AS (
    SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i
), bits AS (
    SELECT DISTINCT
           {h60_sql("'bloom' || i || ':' || CAST(k AS VARCHAR)")} % m AS bit
    FROM keys, hs, mbits
), probe AS (
    SELECT c_custkey,
           {h60_sql("'bloom' || i || ':' || CAST(c_custkey AS VARCHAR)")} % m
               AS bit
    FROM customer, hs, mbits
), hits AS (
    SELECT p.c_custkey, count(b.bit) AS nhit
    FROM probe p LEFT JOIN bits b USING (bit)
    GROUP BY 1
), flags AS (
    SELECT h.c_custkey,
           CAST(h.nhit = {BLOOM_K} AS INT) AS bloom_pos,
           CAST(k.k IS NOT NULL AS INT) AS is_member
    FROM hits h LEFT JOIN keys k ON k.k = h.c_custkey
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM keys) AS n_keys,
       (SELECT m FROM mbits) AS m_bits,
       (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(bloom_pos) AS BIGINT) AS n_bloom_positive,
       CAST(sum(is_member) AS BIGINT) AS n_true_members,
       CAST(sum(bloom_pos) - sum(is_member) AS BIGINT) AS n_false_positive,
       -- HUGEINT: the bp numerator wraps BIGINT past ~9.2e14 false
       -- positives; DuckDB's HUGEINT sums kept going while Spark's
       -- int64 wrapped — a silent cross-engine divergence class
       CAST((sum(bloom_pos)::HUGEINT - sum(is_member)) * 10000
            // greatest(count(*) - sum(is_member), 1) AS BIGINT) AS fpr_bp
FROM flags
""",
)
def agg_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter, measured: build a bloom
    (k={BLOOM_K} h60 positions, m = {BLOOM_BITS_PER_KEY}n+1 bits) over the
    high-value order custkeys, probe EVERY customer, and report the
    realized false-positive rate next to the exact semi-join truth —
    the sketch that replaces a corpus-sized shuffle semi-join with a
    broadcast bit set when one side is small enough to sketch but too
    large (or too remote) to broadcast raw.

    A bloom-positive customer has ALL {BLOOM_K} of its hash bits set;
    bloom-negative is certain-negative (no false negatives — the gate
    proves n_true_members <= n_bloom_positive on data). The hash
    family is the engine-portable h60, so the realized bit set and
    every count are bit-identical across engines and the FPR is an
    exact integer ratio in basis points.

    Scale shape: the build collapses orders to DISTINCT keys (one
    key-only shuffle), then to <= m DISTINCT bit positions — the bit
    set is bounded by m NO MATTER how large the build side grows, and
    ships as one broadcast. The probe side never shuffles for the
    bloom test (explode x{BLOOM_K} + broadcast join + per-key count);
    only the truth semi-join (which exists to measure the sketch, and
    at 100 TB is exactly what the bloom is deployed to avoid) and the
    final 1-row aggregate exchange anything.
    """
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.filter(F.col("o_totalprice") > BLOOM_PRICE_CUT)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .persist()
    )
    # m is sized from the realized key count — one bounded scalar to
    # the driver (the histogram-bounds pattern), mirrored by the
    # oracle's scalar CTE.
    m = BLOOM_BITS_PER_KEY * keys.count() + 1

    def positions(key_col: F.Column) -> F.Column:
        return F.array(
            *[
                h60(F.concat(F.lit(f"bloom{i}:"), key_col.cast("string"))) % m
                for i in range(BLOOM_K)
            ]
        )

    bits = keys.select(F.explode(positions(F.col("k"))).alias("bit")).distinct()
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    probe = cust.select("c_custkey", F.explode(positions(F.col("c_custkey"))).alias("bit"))
    hits = (
        probe.join(F.broadcast(bits.withColumn("present", F.lit(1))), "bit", "left")
        .groupBy("c_custkey")
        .agg(F.count("present").alias("nhit"))
    )
    flags = hits.join(
        keys.withColumnRenamed("k", "c_custkey").withColumn("member", F.lit(1)),
        "c_custkey",
        "left",
    ).select(
        (F.col("nhit") == BLOOM_K).cast("int").alias("bloom_pos"),
        F.col("member").isNotNull().cast("int").alias("is_member"),
    )
    n_keys = keys.agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum("bloom_pos").cast("bigint").alias("n_bloom_positive"),
        F.sum("is_member").cast("bigint").alias("n_true_members"),
    )
    return (
        agg.crossJoin(F.broadcast(n_keys))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_keys",
            F.lit(m).cast("bigint").alias("m_bits"),
            "n_bits_set",
            "n_probes",
            "n_bloom_positive",
            "n_true_members",
            (F.col("n_bloom_positive") - F.col("n_true_members")).alias(
                "n_false_positive"
            ),
            # decimal numerator (oracle twin: HUGEINT) — int64 wraps
            # past ~9.2e14 false positives
            F.expr(
                "cast(cast(n_bloom_positive - n_true_members as"
                " decimal(38,0)) * 10000"
                " div greatest(n_probes - n_true_members, 1) as bigint)"
            ).alias("fpr_bp"),
        )
    )


if agg_bloom_prefilter.__doc__:  # absent under PYTHONOPTIMIZE=2
    agg_bloom_prefilter.__doc__ = (
        agg_bloom_prefilter.__doc__
        .replace("{BLOOM_K}", str(BLOOM_K))
        .replace("{BLOOM_BITS_PER_KEY}", str(BLOOM_BITS_PER_KEY))
    )


# --- nearest-direction as-of join -------------------------------------


@register(
    "asof_join_nearest",
    tags=("join", "asof", "window"),
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id, 0 AS kind FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, event_id, 1 AS kind FROM events WHERE event_type = 'purchase'
), w AS (
    SELECT user_id, ts, event_id, kind,
           max(CASE WHEN kind = 0 THEN epoch_us(ts) END) OVER wb AS cb,
           min(CASE WHEN kind = 0 THEN epoch_us(ts) END) OVER wf AS cf
    FROM tagged
    WINDOW wb AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), n AS (
    SELECT event_id, user_id, ts, epoch_us(ts) AS tu, cb, cf
    FROM w WHERE kind = 1
), pick AS (
    SELECT event_id, user_id, ts, tu,
           CASE WHEN cb IS NULL AND cf IS NULL THEN NULL
                WHEN cf IS NULL THEN cb
                WHEN cb IS NULL THEN cf
                WHEN tu - cb <= cf - tu THEN cb ELSE cf END AS nc,
           CASE WHEN cb IS NULL AND cf IS NULL THEN NULL
                WHEN cf IS NULL
                     OR (cb IS NOT NULL AND tu - cb <= cf - tu) THEN 'backward'
                ELSE 'forward' END AS direction
    FROM n
)
SELECT event_id, user_id, ts,
       CAST(nc AS BIGINT) AS near_click_us,
       CAST(abs(nc - tu) AS BIGINT) AS delta_us,
       direction
FROM pick
""",
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join — the third member of the as-of
    trio (pandas ``merge_asof(direction='nearest')``): each purchase
    matched to the user's click with the smallest absolute time
    distance, looking BOTH ways, with the backward match winning
    exact-distance ties (a same-instant click is a 0-delta backward
    match by the total (ts, kind, event_id) sort). Emits the matched
    click timestamp, the exact microsecond distance, and which
    direction won — the sensor-alignment / log-correlation join where
    "closest reading" matters more than "latest reading".

    Scale shape: the same union + window construction as the
    backward and forward variants, with BOTH frames (prefix-max and
    suffix-min over the interleaved click timestamps) computed in one
    window pass — one exchange on user_id, one sort, O(1) state per
    partition, no range explosion and no per-key pandas.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    base = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    click_us = F.when(F.col("kind") == 0, F.unix_micros(F.col("ts")))
    n = (
        clicks.unionByName(purchases)
        .withColumn("cb", F.max(click_us).over(wb))
        .withColumn("cf", F.min(click_us).over(wf))
        .filter(F.col("kind") == 1)
        .withColumn("tu", F.unix_micros(F.col("ts")))
    )
    backward_wins = (F.col("tu") - F.col("cb")) <= (F.col("cf") - F.col("tu"))
    nc = (
        F.when(F.col("cb").isNull() & F.col("cf").isNull(), F.lit(None))
        .when(F.col("cf").isNull(), F.col("cb"))
        .when(F.col("cb").isNull(), F.col("cf"))
        .when(backward_wins, F.col("cb"))
        .otherwise(F.col("cf"))
    )
    direction = (
        F.when(F.col("cb").isNull() & F.col("cf").isNull(), F.lit(None))
        .when(
            F.col("cf").isNull() | (F.col("cb").isNotNull() & backward_wins),
            F.lit("backward"),
        )
        .otherwise(F.lit("forward"))
    )
    return n.withColumn("nc", nc).select(
        "event_id",
        "user_id",
        "ts",
        F.col("nc").cast("bigint").alias("near_click_us"),
        F.abs(F.col("nc") - F.col("tu")).cast("bigint").alias("delta_us"),
        direction.alias("direction"),
    )


# pandas merge_asof(tolerance=...) parity: a backward match only
# counts within this window. 24h sits inside the corpus's backward-gap
# IQR (p25 ~14.5h, median ~36h at sf0.01), so both arms of the gate
# are populated at every SF.
ASOF_TOLERANCE_US = 24 * 3600 * 1_000_000


@register(
    "asof_join_tolerance",
    tags=("join", "asof", "window"),
    oracle=f"""
WITH tagged AS (
    SELECT user_id, ts, event_id, 0 AS kind FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, event_id, 1 AS kind FROM events WHERE event_type = 'purchase'
), w AS (
    SELECT user_id, ts, event_id, kind,
           max(CASE WHEN kind = 0 THEN epoch_us(ts) END) OVER wb AS cb
    FROM tagged
    WINDOW wb AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), n AS (
    SELECT event_id, user_id, ts, epoch_us(ts) AS tu, cb
    FROM w WHERE kind = 1
)
SELECT event_id, user_id, ts,
       cb IS NOT NULL AND tu - cb <= {ASOF_TOLERANCE_US} AS matched,
       CAST(CASE WHEN cb IS NOT NULL AND tu - cb <= {ASOF_TOLERANCE_US}
                 THEN cb END AS BIGINT) AS click_us,
       CAST(CASE WHEN cb IS NOT NULL AND tu - cb <= {ASOF_TOLERANCE_US}
                 THEN tu - cb END AS BIGINT) AS delta_us
FROM n
""",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded backward as-of join — pandas
    ``merge_asof(direction='backward', tolerance=...)`` parity,
    completing the as-of family (backward / forward / nearest /
    tolerance): each purchase matches the user's latest
    click-at-or-before ONLY if it lies within ASOF_TOLERANCE_US
    (24 h); a staler click yields an explicit non-match rather than a
    misleading far-away join partner — the attribution-window /
    sensor-staleness semantics every event pipeline needs alongside
    the unbounded variant.

    Scale shape: identical to the other as-of members — ONE union +
    window construction (one exchange on user_id, one sort, O(1)
    state per partition), the tolerance gate is a pure row-local
    integer comparison on the already-computed prefix-max, so the
    bound costs nothing. No range explosion, no per-key pandas.
    Reference repo has no joins at all (SURVEY.md §2.3); pandas'
    merge_asof documents the tolerance contract this mirrors.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    base = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    click_us = F.when(F.col("kind") == 0, F.unix_micros(F.col("ts")))
    n = (
        clicks.unionByName(purchases)
        .withColumn("cb", F.max(click_us).over(wb))
        .filter(F.col("kind") == 1)
        .withColumn("tu", F.unix_micros(F.col("ts")))
    )
    in_tol = F.col("cb").isNotNull() & (
        (F.col("tu") - F.col("cb")) <= ASOF_TOLERANCE_US
    )
    return n.select(
        "event_id",
        "user_id",
        "ts",
        in_tol.alias("matched"),
        F.when(in_tol, F.col("cb")).cast("bigint").alias("click_us"),
        F.when(in_tol, F.col("tu") - F.col("cb"))
        .cast("bigint")
        .alias("delta_us"),
    )


if __name__ == "__main__":
    # gate-server worker entry: python -m go_integ_spark.operators.advanced
    #   <sf_dir> <port> <parent_pid>
    import sys as _sys

    _gate_worker_main(_sys.argv[1], int(_sys.argv[2]), int(_sys.argv[3]))
