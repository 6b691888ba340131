"""Round-11 pins: rows²-aware block exchanges (functions/blocks.py).

The r10 1000x kNN-graph probe showed AQE's byte-balanced partition
coalescing packing several quadratic-cost scoring blocks into one
task (144x data-task skew at 1000x). The fix routes every blocked
pair scorer through an explicit one-partition-per-block
REPARTITION_BY_NUM exchange. These tests pin (a) the sizing
arithmetic, (b) the plan shape — the cogroup/groupBy consumes the
REPARTITION_BY_NUM exchange directly, with no second
ENSURE_REQUIREMENTS exchange stacked on top — and (c) result
invariance (the block grid defines membership by KEYS, so where a
block lands cannot change any value).
"""

from __future__ import annotations

import re

import pytest

from go_integ_spark.functions import blocks

SF = "/root/testdata/sf0.001"


class TestBlockPartitionCount:
    def test_floor_cap_and_passthrough(self, spark):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        try:
            # below the session floor -> floor
            assert blocks.block_partition_count(spark, 3) == 16
            # between floor and cap -> exact block count
            assert blocks.block_partition_count(spark, 1234) == 1234
            # above the cap -> cap (runaway block counts must not
            # schedule millions of ~ms tasks)
            assert (
                blocks.block_partition_count(spark, 10**9)
                == blocks.MAX_BLOCK_PARTITIONS
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    def test_repartition_is_by_num_on_keys(self, spark):
        df = spark.range(100).withColumnRenamed("id", "k")
        out = blocks.repartition_for_blocks(df, ["k"], 10**9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan
        assert f"{blocks.MAX_BLOCK_PARTITIONS})" in plan


def _cogroup_plan(spark, build):
    df = build(spark)
    return df._jdf.queryExecution().executedPlan().toString()


class TestScoringExchangeShape:
    """The scorer's FlatMapCoGroupsInPandas / FlatMapGroupsInPandas
    children must be the REPARTITION_BY_NUM exchanges themselves —
    an ENSURE_REQUIREMENTS exchange between them would mean
    EnsureRequirements did NOT accept our partitioning and AQE
    byte-coalescing is back in charge of the scoring stage."""

    def _pin(self, plan, apply_op, n_repart):
        assert apply_op in plan
        assert plan.count("REPARTITION_BY_NUM") >= n_repart
        # walk the indented tree: between each repartition exchange
        # and its nearest apply ancestor there must be no
        # ENSURE_REQUIREMENTS exchange on the same branch. Cheap
        # proxy that has caught every planning regression so far:
        # every hash Exchange directly under the apply node (child
        # lines at one deeper indent that are Exchanges) says
        # REPARTITION_BY_NUM.
        lines = plan.split("\n")
        (apply_i,) = [i for i, l in enumerate(lines) if apply_op in l]
        depth = len(lines[apply_i]) - len(lines[apply_i].lstrip(" :+-"))
        for line in lines[apply_i + 1 :]:
            d = len(line) - len(line.lstrip(" :+-"))
            if d <= depth:
                break
            if "Exchange hashpartitioning" in line and d <= depth + 6:
                assert "REPARTITION_BY_NUM" in line, line

    def test_knn_graph_scoring_exchange(self, spark):
        from go_integ_spark.operators.similarity import _build_knn_graph
        from go_integ_spark.tables import load_table

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", "embedding"
        )
        plan = _build_knn_graph(spark, emb)._jdf.queryExecution().executedPlan().toString()
        self._pin(plan, "FlatMapCoGroupsInPandas", 2)

    def test_strict_miner_scoring_exchange(self, spark, registry):
        df = registry["dedup_embedding_cosine_strict"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        self._pin(plan, "FlatMapCoGroupsInPandas", 2)

    def test_embedding_cosine_grouped_exchange(self, spark, registry):
        df = registry["dedup_embedding_cosine"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        self._pin(plan, "FlatMapGroupsInPandas", 1)

    def test_contamination_scoring_exchange(self, spark, registry):
        df = registry["contamination_embedding"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        self._pin(plan, "FlatMapCoGroupsInPandas", 2)


@pytest.fixture(scope="module")
def registry():
    from go_integ_spark.registry import load_all

    return load_all()


class TestKnnSingleKernelPass:
    def test_assignment_frame_is_cached_and_rank0(self, spark):
        """The posexploded assignment frame must live in the
        'knn_assign' single-slot cache (one centroid-scoring kernel
        pass serves corpus side, probe side, and the cell-size
        table), and its rank-0 rows must reproduce the independent
        nearest-cell assignment."""
        from go_integ_spark.functions import cache
        from go_integ_spark.functions.vector import with_norm
        from go_integ_spark.operators.similarity import (
            IVF_K,
            _build_knn_graph,
            ivf_centroids,
            nearest_cells_pd,
        )
        from go_integ_spark.tables import load_table

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", "embedding"
        )
        _build_knn_graph(spark, emb).collect()
        assert "knn_assign" in cache._slots
        pe = cache._slots["knn_assign"][2]
        got = {
            (r["vec_id"], r["cell_id"])
            for r in pe.filter("pos = 0").select("vec_id", "cell_id").collect()
        }
        v = with_norm(emb)
        (crow,) = ivf_centroids(
            v, max(IVF_K, int(emb.count() ** 0.5))
        ).collect()
        from pyspark.sql import functions as F

        want = {
            (r["vec_id"], r["cell_id"])
            for r in v.select(
                "vec_id",
                F.element_at(nearest_cells_pd(crow, 1), 1).alias("cell_id"),
            ).collect()
        }
        assert got == want and len(got) > 0


class TestTiledFoldKernel:
    def test_bit_identity_vs_naive_fold(self):
        """The tiled fold_cosine_block must reproduce the naive
        per-dim accumulate BIT-FOR-BIT on awkward shapes (tile
        boundaries, singleton rows, non-multiple-of-tile sizes) —
        the whole oracle contract of every cogrouped scorer rides on
        this float sequence."""
        import numpy as np
        import pandas as pd

        from go_integ_spark.functions.vector import fold_cosine_block

        rng = np.random.RandomState(42)
        for m, n, d in [(1, 1, 1), (3, 7, 5), (9, 4097, 64), (257, 33, 64)]:
            a = rng.randn(m, d)
            b = rng.randn(n, d)
            an = np.sqrt((a * a).sum(1))
            bn = np.sqrt((b * b).sum(1))
            naive = np.zeros((m, n))
            for k in range(d):
                naive += a[:, k : k + 1] * b[:, k][None, :]
            naive /= an[:, None] * bn[None, :]
            got = fold_cosine_block(
                pd.Series(list(a)), pd.Series(an),
                pd.Series(list(b)), pd.Series(bn),
            )
            assert np.array_equal(got, naive), (m, n, d)


class TestPackBins:
    def test_capacity_respected_and_clamped(self):
        costs = [100.0, 1.0, 1.0, 1.0, 50.0, 49.0]
        assign, n = blocks.pack_bins(costs, 100.0)
        loads = {}
        for i, b in enumerate(assign):
            loads[b] = loads.get(b, 0.0) + min(costs[i], 100.0)
        assert max(loads.values()) <= 100.0
        assert n == len(set(assign))
        # an oversize item fills its own bin instead of looping
        assign, n = blocks.pack_bins([1e12], 100.0)
        assert (assign, n) == ([0], 1)
        assert blocks.pack_bins([], 100.0) == ([], 0)

    def test_balance_on_bimodal_costs(self):
        # the kNN regime: a few near-capacity hot blocks + many tiny
        # cold cells; bins must come out near-equal, not bimodal
        costs = [9e6] * 10 + [5e4] * 500
        assign, n = blocks.pack_bins(costs, 1e7)
        loads = [0.0] * n
        for i, b in enumerate(assign):
            loads[b] += costs[i]
        assert max(loads) <= 1e7
        # every bin except possibly one is at least half full
        assert sum(1 for x in loads if x < 5e6) <= 1
