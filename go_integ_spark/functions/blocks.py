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

import os

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


# ~fixed per-block overhead (Arrow batch + pandas assembly) in
# pair-units: bounds how many tiny cold blocks one bin may hold, and
# floors the bin capacity.
BLOCK_OVERHEAD = 50_000.0
# Row-LINEAR per-block cost (shuffle of the replicated ~520 B/row
# payload + Arrow transfer + pandas assembly), in pair-units per
# row. Without it the packer prices a pair-light/row-heavy block (a
# hot cell's near-cap member rows replicated across many probe
# splits) at ~zero and stacks dozens into one bin — the r12 1000x
# bitext probe read a 165.5 s max task over a 6.7 s median on the
# backward scoring stage from exactly this shape.
#
# UNITS (re-derived r13): a "pair-unit" is one SCORED pair — fold
# kernel + per-probe ranking/extraction — measured ~430 ns in-task,
# NOT the pure tiled fold's ~100 ns. r12 divided by the pure-fold
# rate and got ~3e3; replaying its own backward-stage calibration
# data (20k rows + 2.7e6 pairs per 6.7 s task) against the
# inclusive pair time gives row_time = (6.7 - 2.7e6*430ns)/20k
# ~ 277 us => ~644 pair-units/row. The 4.7x overpricing made
# row-dominated bins real-cheap and pair-dominated bins real-
# expensive behind uniform planned costs — the healthy-host 1000x
# multilang probe read 31x task skew (med ~1 s row bins, max ~31 s
# pair bins) from exactly this, and the r12 'forward 13.4x' was the
# same defect at smaller magnitude.
ROW_COST = 650.0

# Self-calibration reference (r13, VERDICT r12 item 4). ROW_COST's
# 3e3 was calibrated END-TO-END on one host/payload: it prices the
# whole per-row linear path (shuffle write+read of the replicated
# ~520 B payload, Python-worker Arrow IPC, cogroup split, object
# stack), most of which no driver-side micro-benchmark can see — the
# micro-measurable slice (Arrow IPC round-trip + object stack vs the
# tiled fold kernel) puts the kernel at only ~19 pairs per
# row-equivalent on the calibration host. So the runtime calibration
# tracks the RATIO: time both micro-workloads at first use and scale
# the empirical anchor by (micro_ratio_now / micro_ratio_ref),
# assuming the unmeasurable overhead shifts with the measurable
# Arrow/pandas path (both are single-core Python/memcpy work) rather
# than with the BLAS-shaped kernel. On the calibration host class
# this returns ~3e3; a host with relatively slower Python/Arrow
# raises it. d is held at the reference 64: pair and row cost are
# both ~linear in payload width, so the ratio is ~width-invariant.
# Clamped to [ROW_COST/3, ROW_COST*4] — the anchor stays the source
# of truth, calibration only corrects hardware drift; any failure
# falls back to the constant. SG_ROW_COST overrides everything.
# Fallback reference for the min-of-3 timing method on an IDLE
# calibration host (2026-08-17, three reads 10.5/11.4/11.1; the
# r12-era 19.4 was the old sum-of-reps method under partial load and
# over-scaled the anchor ~1.8x on loaded sessions). The OPERATIVE
# reference comes from the committed calib_fingerprint.json via
# _micro_ratio_ref(), which also automates the documented
# re-measure-on-host-class-change step (VERDICT r13 item 8); this
# constant only backstops a missing/corrupt fingerprint file.
_MICRO_RATIO_REF = 11.0
_row_cost_cache: float | None = None

_CALIB_FINGERPRINT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "calib_fingerprint.json"
)


def _host_cpu_fingerprint() -> float:
    """Seconds for the fixed single-thread numpy workload — the SAME
    host-class fingerprint bench.py's _cpu_calibration records with
    every committed bench artifact, duplicated here because the
    package cannot import the repo-root harness script. Keep the two
    in lockstep: the committed fingerprint file's host_cpu_calib_sec
    was measured with this workload."""
    import time

    import numpy as np

    a = np.arange(1_000_000, dtype=np.float64) % 97
    b = (a * 31.0 + 7.0) % 89
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(60):
        acc += float(a @ b)
        a = (a + b) % 97
    _ = acc
    return time.perf_counter() - t0


def _micro_ratio_ref() -> float:
    """The kernel-vs-Arrow ratio reference for THIS host class.

    The committed fingerprint file pins (host class, idle min-of-3
    reference) together: when the current host's single-thread
    fingerprint falls inside the file's tolerance band the committed
    reference applies, and the ratio scaling in calibrated_row_cost
    corrects within-class drift (load, frequency caps). A host
    OUTSIDE the band is a different class — the committed reference
    was never measured there, so the reference is re-derived
    in-process with the same min-of-3 method (the manual
    're-measure whenever the host class changes' step from r13,
    automated). On a foreign class this anchors the row cost at
    ROW_COST at re-derivation time and lets subsequent load drift
    scale from there."""
    import json as _json

    with open(_CALIB_FINGERPRINT_PATH) as f:
        fp = _json.load(f)
    ref = float(fp["micro_ratio_ref"])
    anchor = float(fp["host_cpu_calib_sec"])
    tol = float(fp["tolerance"])
    now = _host_cpu_fingerprint()
    if anchor / tol <= now <= anchor * tol:
        return ref
    return _micro_ratio()

# Per-block kernel-pair ceiling (r13). Kernel work measured ~430 ns
# per pair on the scoring hot path (fold + per-probe ranking, healthy
# host) — 8M pairs bounds a single block's kernel at ~3.5 s, the same
# order as a typical row-dominated task, so a mis-priced pair/row
# ratio can no longer stack 200x of real work behind a "uniform"
# planned cost. Raising it trades straggler risk for less side
# replication; SG_BLOCK_PAIR_CAP overrides for probes.
BLOCK_PAIR_CAP = 8_000_000.0


def block_pair_cap() -> float:
    env = os.environ.get("SG_BLOCK_PAIR_CAP")
    return float(env) if env is not None else BLOCK_PAIR_CAP


def _micro_ratio() -> float:
    """Kernel pairs/s over Arrow-assembly rows/s, both single-core
    micro-timed (~0.3 s total, once per process)."""
    import time

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from go_integ_spark.functions.vector import fold_cosine_block

    rng = np.random.default_rng(7)
    d, m = 64, 512
    vecs = pd.Series([rng.standard_normal(d) for _ in range(m)])
    norms = pd.Series(np.ones(m))
    fold_cosine_block(vecs, norms, vecs, norms)  # warm
    # min-of-3 on each side: a loaded machine (e.g. calibrating while
    # a probe runs) inflates single timings asymmetrically; the min
    # approximates the uncontended cost on both sides so the RATIO
    # stays load-insensitive
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fold_cosine_block(vecs, norms, vecs, norms)
        best = min(best, time.perf_counter() - t0)
    pairs_per_sec = m * m / best

    k = 20_000
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(k, dtype=np.int64),
            "e": [rng.standard_normal(d) for _ in range(k)],
        }
    )
    tbl = pa.Table.from_pandas(pdf)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    buf = sink.getvalue()

    def roundtrip() -> None:
        df = pa.ipc.open_stream(buf).read_all().to_pandas()
        np.stack([np.asarray(x, dtype=np.float64) for x in df["e"]])

    roundtrip()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        roundtrip()
        best = min(best, time.perf_counter() - t0)
    rows_per_sec = k / best
    return pairs_per_sec / rows_per_sec


def calibrated_row_cost() -> float:
    """ROW_COST adjusted for this host's measured kernel-vs-Arrow
    throughput ratio; memoized so every plan in a process prices
    identically (results are split-invariant either way — only bin
    shapes move). See _MICRO_RATIO_REF."""
    global _row_cost_cache
    if _row_cost_cache is not None:
        return _row_cost_cache
    env = os.environ.get("SG_ROW_COST")
    if env is not None:
        _row_cost_cache = float(env)
        return _row_cost_cache
    try:
        rc = ROW_COST * _micro_ratio() / _micro_ratio_ref()
        rc = min(ROW_COST * 4, max(ROW_COST / 3, rc))
    except Exception:  # pragma: no cover - calibration must never block planning
        rc = ROW_COST
    _row_cost_cache = rc
    return rc


def plan_grid_bins(
    cells: list[tuple[tuple, int, int]],
    cap: int,
    base_partitions: int,
    overhead: float = BLOCK_OVERHEAD,
) -> tuple[list[tuple], list[tuple], int]:
    """The ONE grid scheduler (r11 review: the kNN path and the
    generic helper had copy-pasted capacity/packing policies that
    could silently diverge). ``cells`` is [(key_tuple, n_members,
    n_probes)]. Each cell splits into ceil(n/cap) sub-blocks per
    dimension; per-block cost ~ (n_m/nc)*(n_p/np) quadratic kernel
    work + ROW_COST*(rows) linear Arrow/assembly work + overhead
    (the row term keeps pair-light/row-heavy blocks from stacking —
    see ROW_COST); worst-fit-decreasing packs blocks into bins whose
    capacity sits between 4-bins-per-core (parallelism floor — a
    pure cap^2 capacity starved 25 of 32 cores at the 100x probe)
    and the cap^2 single-block bound. Returns (split_rows [(key...,
    n_cs, n_ps)], bin_rows [(key..., csplit, psplit, bin_id)],
    n_bins)."""
    row_cost = calibrated_row_cost()
    split_rows: list[tuple] = []
    blocks: list[tuple] = []
    pair_cap = block_pair_cap()
    costs: list[float] = []
    for kv, n_m, n_p in cells:
        if n_m == 0 or n_p == 0:
            continue  # an empty side scores nothing; skip the cell
        nc = max(1, -(-n_m // cap))
        np_ = max(1, -(-n_p // cap))
        # Per-block PAIR bound (r13, found on a healthy-host 1000x
        # multilang probe): capping each DIMENSION at `cap` still
        # admits a cap x cap = 67M-pair single block, and the
        # row-vs-pair cost constants cannot price that safely — the
        # probe's planned bins were uniform to 1.3x while measured
        # kernel time spread 200x (a 5.7k x 8.1k block ran 19.7 s
        # against a row-dominated median bin's 0.09 s; observed task
        # skew 31-38x, reproduced twice, par-calib healthy; the r12
        # "forward-stage 13.4x host stall" was this same defect).
        # Bounding mc*pc directly makes the packing robust to ANY
        # cost-constant error: no single block can exceed ~pair_cap
        # of kernel work. Each split increment replicates the OTHER
        # side once more (probes x nc member-splits, members x np_
        # probe-splits), so grow the split whose replication is
        # cheaper.
        #
        # Measured and REJECTED (r14, VERDICT r13 item 6): a
        # near-square argmin geometry (minimize total shipped rows
        # n_p*nc + n_m*np_ under the pair cap) was A/B'd at the
        # 1000x multilang probe — pair set byte-identical, map-side
        # shuffle only -3% (17.85 vs 18.43 GB: cap-bound hot cells
        # are a small share of corpus bytes), and wall WORSE (994 s
        # healthy vs 799 s degraded-window greedy) because splitting
        # the larger side multiplies the explode over its expensive
        # parse lineage on the critical-path map stage. Artifacts:
        # SMOKE_r14_1000x_bitext_geom_{greedy,balanced}.json,
        # scripts/probe_bitext_geometry.py. Keep the corner greedy:
        # it never replicates the bigger side while the cap allows.
        while (n_m / nc) * (n_p / np_) > pair_cap:
            if n_p <= n_m:
                nc += 1
            else:
                np_ += 1
        split_rows.append(kv + (nc, np_))
        mc, pc = n_m / nc, n_p / np_
        for cs in range(nc):
            for ps in range(np_):
                blocks.append(kv + (cs, ps))
                costs.append(mc * pc + row_cost * (mc + pc) + overhead)
    if not blocks:
        return [], [], 0
    # capacity's single-block bound gets the same row term, so a
    # maximal block still fits one bin exactly
    max_block = float(min(cap * cap, pair_cap)) + row_cost * 2 * cap
    capacity = max(
        min(max_block, sum(costs) / max(4 * base_partitions, 64)),
        4 * overhead,
    )
    assign, n_bins = pack_bins(costs, capacity)
    bin_rows = [b + (a,) for b, a in zip(blocks, assign)]
    return split_rows, bin_rows, n_bins


def _murmur3_int(x: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32 hash of one IntegerType value (the
    expression behind ``F.hash`` / HashPartitioning, seed 42) —
    public algorithm, reimplemented so the driver can PREDICT which
    shuffle partition an int key lands in. Returns the SIGNED 32-bit
    result Java produces."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = (x & 0xFFFFFFFF) * c1 & 0xFFFFFFFF
    k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
    k = k * c2 & 0xFFFFFFFF
    h = (seed & 0xFFFFFFFF) ^ k
    h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
    h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= 4  # one 4-byte block
    h ^= h >> 16
    h = h * 0x85EBCA6B & 0xFFFFFFFF
    h ^= h >> 13
    h = h * 0xC2B2AE35 & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def alias_bin_ids(n_bins: int, n_parts: int) -> list[int] | None:
    """Replacement ids for bins 0..n_bins-1 such that murmur3-pmod
    places every bin in a DISTINCT shuffle partition. pack_bins
    builds ~equal-cost bins, but ``repartition(n, bin_id)`` HASHES
    the id — with ~n bins in ~n partitions, birthday collisions
    stack several quadratic-cost bins into one task while other
    partitions sit empty (the r12 1000x kNN probes read a 201 s max
    task over a 17.6 s median from exactly this). Greedy driver-side
    search, O(n_parts log n_parts) expected tries; returns None when
    n_bins > n_parts (only past MAX_BLOCK_PARTITIONS — stacking is
    then unavoidable and uniform).

    The search is BOUNDED (ADVICE r12): n_bins ~ n_parts is a
    coupon-collector search (~n_parts * H(n_parts) expected tries),
    and an unbounded loop would turn a pathological hash/modulus
    interaction into a driver hang. The cap is ~32x the
    coupon-collector expectation, so hitting it means the hash is
    behaving non-uniformly for this modulus — give up and return
    None, degrading to the old collision behavior (stacked bins),
    never a hang."""
    if n_bins > n_parts:
        return None
    import math

    budget = int(32 * n_parts * (math.log(n_parts) + 1)) + 64
    aliases: list[int] = []
    used: set[int] = set()
    cand = 0
    while len(aliases) < n_bins:
        if cand >= budget:
            return None
        p = _murmur3_int(cand) % n_parts
        if p < 0:
            p += n_parts
        if p not in used:
            used.add(p)
            aliases.append(cand)
        cand += 1
    return aliases


def grid_block_cogroup(
    probes,
    members,
    keys: list[str],
    probe_id: str,
    member_id: str,
    score_fn,
    schema: str,
    cap: int,
    slot: str | None = None,
    cell_sizes: list[tuple[tuple, int, int]] | None = None,
):
    """2-D capped block grid + cost-binned exchange for an asymmetric
    cogrouped scorer — the ``embedding_knn_graph`` shape generalized
    (r11). ``probes``/``members`` each carry the ``keys`` columns plus
    payload; every (probe-block x member-block) pair of a cell meets
    exactly once: the member side splits by ``xxhash64(member_id)``
    into ceil(n/cap) sub-blocks and replicates across the probe
    side's splits, and vice versa. Per-block costs come from ONE
    fused map-side-combined count aggregate over the union of both
    sides' key columns (cells-sized driver collect; r11 ran two
    aggregates + a join here, ~13% of the 1000x kNN wall);
    ``plan_grid_bins`` packs blocks into ~equal-cost bins and the
    exchange hashes the BIN id with an explicit partition count
    (REPARTITION_BY_NUM — requires
    spark.sql.requireAllClusterKeysForCoPartition=false, set in
    get_spark).

    ``slot``: single-slot cache prefix for the two input frames.
    Without it, the count aggregate executes each un-persisted input
    lineage a full extra time (for kernel-derived sides that is a
    whole extra O(N*K*d) pass — the exact cost the kNN path's
    persisted assignment frame eliminates); pass a stable name
    whenever the inputs embed non-trivial compute.

    ``cell_sizes``: caller-supplied [(key_tuple, n_members,
    n_probes)] per cell, skipping the count aggregate entirely. Use
    when both sides derive from one already-persisted frame the
    caller can aggregate in a single pass (the kNN path's assignment
    frame: n_p = all probe rows per cell, n_m = rank-0 rows).
    Zero-size cells are skipped by ``plan_grid_bins`` either way.

    RESULT CONTRACT: callers must be split-invariant — the scored
    pair set is unchanged by construction, but a score_fn that emits
    per-probe top-k emits it PER BLOCK, so the caller needs a global
    top-k (window) downstream; any global survivor ranks <= k inside
    its own sub-block, so the union always feeds that window every
    global survivor. ``score_fn(probe_pdf, member_pdf)`` — the
    member side's key/split columns arrive prefixed ``m_`` (in every
    branch, including the degenerate empty-corpus fallback).
    """
    from pyspark.sql import functions as F

    spark = probes.sparkSession
    if slot is not None:
        from go_integ_spark.functions.cache import cached_persist

        probes = cached_persist(f"{slot}_probes", probes, lambda p=probes: p)
        members = cached_persist(
            f"{slot}_members", members, lambda m=members: m
        )
    # Key dtypes must agree across sides: the cogroup pairs key
    # columns positionally and the fused union below would otherwise
    # insert silent casts (ADVICE r11) — fail loud instead.
    for k in keys:
        pt = probes.schema[k].dataType
        mt = members.schema[k].dataType
        if pt != mt:
            raise TypeError(
                f"grid_block_cogroup key {k!r}: probe side is {pt}, "
                f"member side is {mt} — key dtypes must match"
            )
    m_keys = [f"m_{k}" for k in keys]
    members_renamed = members
    for k, mk in zip(keys, m_keys):
        members_renamed = members_renamed.withColumnRenamed(k, mk)
    if cell_sizes is None:
        # ONE aggregate over the union of both sides' keys: each
        # lineage is scanned once (as before) but the sizing runs as
        # a single map-side-combined job instead of two jobs + a join.
        sz = (
            probes.select(*keys)
            .withColumn("_is_m", F.lit(False))
            .unionByName(
                members.select(*keys).withColumn("_is_m", F.lit(True))
            )
            .groupBy(*keys)
            .agg(
                F.count_if(F.col("_is_m")).alias("n_m"),
                F.count_if(~F.col("_is_m")).alias("n_p"),
            )
            .collect()
        )
        cell_sizes = [
            (tuple(r[k] for k in keys), r["n_m"], r["n_p"]) for r in sz
        ]
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    split_rows, bin_rows, n_bins = plan_grid_bins(cell_sizes, cap, base)
    if not bin_rows:
        # degenerate corpus: deliver an empty frame of the right
        # schema, through the same renamed-member contract
        return (
            probes.groupBy(*keys)
            .cogroup(members_renamed.groupBy(*m_keys))
            .applyInPandas(
                lambda p, m: score_fn(p.iloc[:0], m.iloc[:0]), schema
            )
        )
    n_parts = block_partition_count(spark, n_bins)
    # Perfect bin->partition placement: remap bin ids so murmur3-pmod
    # (what repartition(n, col) actually applies) sends every bin to
    # its own partition — without this, birthday collisions stack
    # several ~equal-cost bins into one task (201 s max over a 17.6 s
    # median at the 1000x kNN probe). Ids are opaque to scoring, so
    # results are unchanged.
    aliases = alias_bin_ids(n_bins, n_parts)
    if aliases is not None:
        bin_rows = [b[:-1] + (aliases[b[-1]],) for b in bin_rows]
    # explicit schemas: the split/bin columns must be INT on both
    # sides — positionally-paired cogroup keys of different widths
    # only work by UnsafeRow storage accident (r11 review)
    key_ddl = ",".join(
        f"{k} {probes.schema[k].dataType.simpleString()}" for k in keys
    )
    m_key_ddl = ",".join(
        f"m_{k} {members.schema[k].dataType.simpleString()}" for k in keys
    )
    p_splits = spark.createDataFrame(
        split_rows, f"{key_ddl}, n_cs int, n_ps int"
    )
    m_splits = spark.createDataFrame(
        split_rows, f"{m_key_ddl}, mn_cs int, mn_ps int"
    )
    p_bins = spark.createDataFrame(
        bin_rows, f"{key_ddl}, csplit int, psplit int, bin_id int"
    )
    m_bins = spark.createDataFrame(
        bin_rows, f"{m_key_ddl}, m_csplit int, m_psplit int, m_bin int"
    )
    p = (
        probes.join(F.broadcast(p_splits), list(keys))
        .withColumn(
            "psplit", F.pmod(F.xxhash64(probe_id), F.col("n_ps")).cast("int")
        )
        # n_cs is int by schema, so the sequence elements (and the
        # exploded csplit) are already int — matching m_csplit's type
        .withColumn(
            "csplit",
            F.explode(F.sequence(F.lit(0), F.col("n_cs") - 1, F.lit(1))),
        )
        .drop("n_cs", "n_ps")
        .join(F.broadcast(p_bins), list(keys) + ["csplit", "psplit"])
        .repartition(n_parts, "bin_id")
    )
    m = (
        members_renamed.join(F.broadcast(m_splits), m_keys)
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
