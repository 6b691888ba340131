"""Rows²-aware exchange sizing for blocked pair scorers.

Every cogrouped / grouped block scorer in this repo does QUADRATIC
work per block (a |probe block| x |member block| fold-cosine or
int-gate matmul) while a block's shuffled BYTES are linear in its
rows. AQE's partition coalescing balances exchange bytes, so it
happily packs several near-cap blocks into one task: that task's
cost is the SUM of their quadratics while its byte size looks
average. This is exactly the r10 1000x kNN-graph finding — 144x
data-task skew on the scoring exchange at 1000x (where blocks run at
the KNN_CELL_CAP bound) vs 4.2x at 100x (where blocks are ~10x
smaller and byte-balance still tracks cost).

The fix is to bypass byte-coalescing on exactly these exchanges and
nowhere else: ``repartition(n, *keys)`` plants a REPARTITION_BY_NUM
shuffle that (a) AQE never coalesces, and (b) already satisfies the
downstream ``groupBy(*keys)``/``cogroup`` ClusteredDistribution, so
EnsureRequirements adds no second exchange (plan-pinned in
tests/test_round11_ops.py). Sizing ``n`` to ~the block count makes
expected blocks-per-task O(1) with balls-in-bins variance, so task
skew is bounded by the largest SINGLE block — and the largest block
is what each operator's cap (KNN_CELL_CAP, SEMDEDUP_MAX_CLUSTER,
LSH_MAX_BUCKET, ...) already bounds.

Results are bit-identical by construction: block membership is
defined by the KEYS, not by which task a block lands in, and every
kernel here is fold-exact per block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Upper bound on block-scoring partitions: a runaway block count
# (degenerate splitting) must not turn into millions of ~ms tasks —
# scheduling overhead at local[32] is ~1-2 ms/task, so 32k tasks cap
# the overhead at ~1 min while still giving the 1000x probes (~14k
# blocks) one task per block.
MAX_BLOCK_PARTITIONS = 32768


def block_partition_count(spark, n_blocks: int) -> int:
    """Partition count for a block-scoring exchange: one partition
    per block, floored at the session shuffle parallelism (tiny gate
    corpora keep their normal width) and capped at
    ``MAX_BLOCK_PARTITIONS``."""
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return int(max(base, min(int(n_blocks), MAX_BLOCK_PARTITIONS)))


def repartition_for_blocks(
    df: DataFrame, keys: list[str], n_blocks: int
) -> DataFrame:
    """Hash-repartition ``df`` on the block keys with an EXPLICIT
    partition count (REPARTITION_BY_NUM) sized to ``n_blocks`` so
    AQE's byte-based coalescing cannot merge rows²-cost blocks into
    one task. The downstream groupBy/cogroup on the same keys reuses
    this exchange."""
    n = block_partition_count(df.sparkSession, n_blocks)
    return df.repartition(n, *keys)


def pack_bins(costs: list[float], capacity: float) -> tuple[list[int], int]:
    """Worst-fit-decreasing bin packing: assign each item to the
    least-loaded open bin that still fits, else open a new one.
    Returns (bin id per item, bin count). Used to pack scoring
    blocks into ~equal-COST partitions: one-partition-per-block is
    right when blocks are near-uniform, but a clustered corpus makes
    them bimodal (near-cap hot blocks vs tiny cold cells), and then
    max/median task time is the block-size ratio. Packing cold
    blocks together around the hot ones makes the MEDIAN task a full
    bin while the max stays one bin (plus a hash collision or two),
    so stage balance is bounded by small constants at any scale.
    O(n log n); item costs above capacity are clamped (such an item
    fills its own bin)."""
    import heapq

    order = sorted(range(len(costs)), key=lambda i: -costs[i])
    heap: list[tuple[float, int]] = []
    assign = [0] * len(costs)
    nbins = 0
    for i in order:
        c = min(costs[i], capacity)
        if heap and heap[0][0] + c <= capacity:
            load, b = heapq.heappop(heap)
            assign[i] = b
            heapq.heappush(heap, (load + c, b))
        else:
            assign[i] = nbins
            heapq.heappush(heap, (c, nbins))
            nbins += 1
    return assign, nbins


def grid_block_cogroup(
    probes,
    members,
    keys: list[str],
    probe_id: str,
    member_id: str,
    score_fn,
    schema: str,
    cap: int,
    overhead: float = 50_000.0,
):
    """2-D capped block grid + cost-binned exchange for an asymmetric
    cogrouped scorer — the ``embedding_knn_graph`` shape generalized
    (r11). ``probes``/``members`` each carry the ``keys`` columns plus
    payload; every (probe-block x member-block) pair of a cell meets
    exactly once: the member side splits by ``xxhash64(member_id)``
    into ceil(n/cap) sub-blocks and replicates across the probe
    side's splits, and vice versa. Per-block costs come from one
    map-side-combined count aggregate per side (cells-sized driver
    collect); ``pack_bins`` packs blocks into ~equal-cost bins and
    the exchange hashes the BIN id with an explicit partition count
    (REPARTITION_BY_NUM — requires
    spark.sql.requireAllClusterKeysForCoPartition=false, set in
    get_spark).

    RESULT CONTRACT: callers must be split-invariant — the scored
    pair set is unchanged by construction, but a score_fn that emits
    per-probe top-k emits it PER BLOCK, so the caller needs a global
    top-k (window) downstream; any global survivor ranks <= k inside
    its own sub-block, so the union always feeds that window every
    global survivor. ``score_fn(probe_pdf, member_pdf)`` — the
    member side's key/split columns arrive prefixed ``m_``.
    """
    from pyspark.sql import functions as F

    spark = probes.sparkSession
    csz = members.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_m"))
    psz = probes.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_p"))
    sz = (
        csz.join(psz, list(keys), "full")
        .na.fill(0, ["n_m", "n_p"])
        .collect()
    )
    split_rows = []
    blocks = []
    costs: list[float] = []
    for r in sz:
        n_m, n_p = r["n_m"], r["n_p"]
        if n_m == 0 or n_p == 0:
            continue  # an empty side scores nothing; skip the cell
        nc = max(1, -(-n_m // cap))
        np_ = max(1, -(-n_p // cap))
        kv = tuple(r[k] for k in keys)
        split_rows.append(kv + (nc, np_))
        mc, pc = n_m / nc, n_p / np_
        for cs in range(nc):
            for ps in range(np_):
                blocks.append(kv + (cs, ps))
                costs.append(mc * pc + overhead)
    if not blocks:
        # degenerate corpus: deliver an empty frame of the right schema
        return (
            probes.groupBy(*keys)
            .cogroup(members.groupBy(*keys))
            .applyInPandas(lambda p, m: score_fn(p.iloc[:0], m.iloc[:0]), schema)
        )
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    total = sum(costs)
    capacity = max(
        min(float(cap) * cap, total / max(4 * base, 64)), 4 * overhead
    )
    assign, n_bins = pack_bins(costs, capacity)
    n_parts = block_partition_count(spark, n_bins)
    m_keys = [f"m_{k}" for k in keys]
    # separate local frames per side: sharing one broadcast frame
    # across both cogroup branches trips the ambiguous-self-join check
    p_splits = spark.createDataFrame(split_rows, list(keys) + ["n_cs", "n_ps"])
    m_splits = spark.createDataFrame(split_rows, m_keys + ["mn_cs", "mn_ps"])
    bin_rows = [b + (a,) for b, a in zip(blocks, assign)]
    p_bins = spark.createDataFrame(
        bin_rows, list(keys) + ["csplit", "psplit", "bin_id"]
    )
    m_bins = spark.createDataFrame(
        bin_rows, m_keys + ["m_csplit", "m_psplit", "m_bin"]
    )
    p = (
        probes.join(F.broadcast(p_splits), list(keys))
        .withColumn(
            "psplit", F.pmod(F.xxhash64(probe_id), F.col("n_ps")).cast("int")
        )
        .withColumn(
            "csplit",
            F.explode(F.sequence(F.lit(0), F.col("n_cs") - 1, F.lit(1))),
        )
        .drop("n_cs", "n_ps")
        .join(F.broadcast(p_bins), list(keys) + ["csplit", "psplit"])
        .repartition(n_parts, "bin_id")
    )
    m = members
    for k, mk in zip(keys, m_keys):
        m = m.withColumnRenamed(k, mk)
    m = (
        m.join(F.broadcast(m_splits), m_keys)
        .withColumn(
            "m_csplit",
            F.pmod(F.xxhash64(member_id), F.col("mn_cs")).cast("int"),
        )
        .withColumn(
            "m_psplit",
            F.explode(F.sequence(F.lit(0), F.col("mn_ps") - 1, F.lit(1))),
        )
        .drop("mn_cs", "mn_ps")
        .join(F.broadcast(m_bins), m_keys + ["m_csplit", "m_psplit"])
        .repartition(n_parts, "m_bin")
    )
    return (
        p.groupBy("bin_id", *keys, "csplit", "psplit")
        .cogroup(m.groupBy("m_bin", *m_keys, "m_csplit", "m_psplit"))
        .applyInPandas(score_fn, schema)
    )
