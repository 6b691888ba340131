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
