"""Round-13 pins: CC delta propagation invariance, the bounded alias
search, self-calibrating ROW_COST, the bench par_band verdict, and
the stall-robust probe skew eligibility rule."""

from __future__ import annotations

import os
import sys

import pytest

from go_integ_spark.session import get_spark

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s


class TestCCDeltaInvariance:
    def test_components_identical_both_arms(self, spark, monkeypatch):
        """CC_DELTA replays each round's neighbor-min from an
        accumulated per-node best plus changed-source contributions;
        labels must be byte-identical to the full recompute — the
        equality rests on label monotonicity (every assignment is a
        least()), so a chain graph (multi-round, pointer jumps) and a
        clique both pin it."""
        from go_integ_spark.operators.dedup import connected_components

        # chain of 6 (forces several rounds + path halving), a
        # triangle, an isolated pair
        rows = [(i, i + 1) for i in range(30, 36)] + [
            (1, 2),
            (2, 3),
            (3, 1),
            (50, 51),
        ]
        edges = spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")
        monkeypatch.setenv("CC_DELTA", "0")
        off = sorted(map(tuple, connected_components(edges).collect()))
        monkeypatch.setenv("CC_DELTA", "1")
        on = sorted(map(tuple, connected_components(edges).collect()))
        assert off == on
        comp = dict(on)
        assert {comp[n] for n in range(30, 37)} == {30}
        assert {comp[n] for n in (1, 2, 3)} == {1}
        assert comp[50] == 50 and comp[51] == 50


class TestAliasSearchBounded:
    def test_pathological_hash_returns_none_not_hang(self, monkeypatch):
        """ADVICE r12: with n_bins ~ n_parts the greedy search is a
        coupon-collector loop; a degenerate hash (constant) must trip
        the budget and fall back to None (old collision behavior),
        never hang the driver."""
        from go_integ_spark.functions import blocks

        monkeypatch.setattr(blocks, "_murmur3_int", lambda x, seed=42: 7)
        assert blocks.alias_bin_ids(2, 32) is None

    def test_healthy_hash_still_aliases(self):
        from go_integ_spark.functions.blocks import (
            _murmur3_int,
            alias_bin_ids,
        )

        for n_bins, n_parts in ((32, 32), (700, 722)):
            aliases = alias_bin_ids(n_bins, n_parts)
            assert aliases is not None
            parts = {_murmur3_int(a) % n_parts for a in aliases}
            assert len(parts) == n_bins


class TestRowCostCalibration:
    def test_env_override_and_clamp(self, monkeypatch):
        from go_integ_spark.functions import blocks

        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        monkeypatch.setenv("SG_ROW_COST", "1234.5")
        assert blocks.calibrated_row_cost() == 1234.5
        # calibration path: clamped to [ROW_COST/3, ROW_COST*4] so a
        # broken micro-timing can never run the packer off the anchor
        monkeypatch.delenv("SG_ROW_COST")
        # pin the reference: this test exercises the CLAMP, and since
        # r14 the reference is fingerprint-sourced (and re-derived via
        # _micro_ratio on a foreign host class, which would otherwise
        # see the same monkeypatched value)
        monkeypatch.setattr(blocks, "_micro_ratio_ref", lambda: 11.0)
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        monkeypatch.setattr(blocks, "_micro_ratio", lambda: 1e9)
        assert blocks.calibrated_row_cost() == blocks.ROW_COST * 4
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        monkeypatch.setattr(blocks, "_micro_ratio", lambda: 0.0)
        assert blocks.calibrated_row_cost() == blocks.ROW_COST / 3

    def test_micro_calibration_lands_near_anchor_on_this_host(
        self, monkeypatch
    ):
        """On the calibration host class the runtime value must sit
        within 2x of the empirical 3e3 anchor (VERDICT r12 item 4's
        done-bar); the clamp guarantees 4x worst-case anywhere."""
        from go_integ_spark.functions import blocks

        monkeypatch.delenv("SG_ROW_COST", raising=False)
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        rc = blocks.calibrated_row_cost()
        assert blocks.ROW_COST / 2 <= rc <= blocks.ROW_COST * 2

    def test_calibration_failure_falls_back(self, monkeypatch):
        from go_integ_spark.functions import blocks

        def boom():
            raise RuntimeError("no numpy today")

        monkeypatch.delenv("SG_ROW_COST", raising=False)
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        monkeypatch.setattr(blocks, "_micro_ratio", boom)
        assert blocks.calibrated_row_cost() == blocks.ROW_COST


class TestParBand:
    def test_band_against_recorded_host_class(self, monkeypatch):
        """bench.par_band: healthy sessions on this host class
        measure par-calib 3.5-4.6 s, degraded windows 8.5-14.2 s;
        the 5.0 ceiling splits the clusters (BASELINE.md r13 rule)."""
        monkeypatch.delenv("SG_PAR_HEALTHY_MAX", raising=False)
        from bench import par_band

        assert par_band(3.7) == "healthy"
        assert par_band(4.6) == "healthy"
        assert par_band(8.51) == "degraded"  # the r12 official bench
        assert par_band(14.2) == "degraded"
        monkeypatch.setenv("SG_PAR_HEALTHY_MAX", "7.0")
        assert par_band(6.4) == "healthy"  # r7-class host, re-banded


class TestSkewVerdictEligibility:
    def test_r12_stall_flags_declassified_real_flags_kept(self):
        """The stall-robust rule (VERDICT r12 item 3): the two r12
        false headlines are ineligible, every real packing defect
        ever found stays eligible."""
        from reemit_skew import eligible

        knn_final_stall = {  # 11.8x: one 5.1 s stall, 0.43 s median
            "tasks": 256,
            "shuffle_write_mb": 0.0,
            "shuffle_read_mb": 260.44,
            "task_med_ms": 432,
            "task_max_ms": 5093,
        }
        assert not eligible(knn_final_stall)
        cc_gc_stall = {  # 51.5x: one 4.6 s GC stall on a 14 MB stage
            "tasks": 256,
            "shuffle_write_mb": 14.0,
            "shuffle_read_mb": 0.0,
            "task_med_ms": 89,
            "task_max_ms": 4600,
        }
        assert not eligible(cc_gc_stall)
        bitext_forward = {  # the open 13.4x: 6.0 s median — REAL duty
            "tasks": 1023,
            "shuffle_write_mb": 100.0,
            "shuffle_read_mb": 3000.0,
            "task_med_ms": 6000,
            "task_max_ms": 80700,
        }
        assert eligible(bitext_forward)
        mispacked_bin = {  # r12's found defect class: 201.9 s max task
            "tasks": 722,
            "shuffle_write_mb": 0.0,
            "shuffle_read_mb": 5.0,
            "task_med_ms": 500,
            "task_max_ms": 201_900,
        }
        assert eligible(mispacked_bin)  # >=30 s max floor catches it

    def test_reemit_parses_committed_log_line(self, tmp_path):
        from reemit_skew import replay

        log = tmp_path / "probe.log"
        log.write_text(
            "stage  44 tasks=256 shufW=     0.0MB shufR=  260.44MB "
            "task med/max=432/5093ms skew=11.8 | embedding_knn_graph\n"
            "stage  12 tasks= 64 shufW=   500.0MB shufR=   500.0MB "
            "task med/max=14900/104900ms skew=7.0 | embedding_knn_graph\n"
        )
        rep = replay(str(log))
        assert rep["stages_parsed"] == 2
        assert rep["worst_eligible_skew"] == 7.0
        assert rep["verdict"] == "PASS"
        assert len(rep["declassified_stall_flags"]) == 1


def _sparse_neardup_embeddings(n=1500, dim=64, n_pairs=40, seed=11):
    """Same planted sparse near-dup regime as test_round10_ops: an
    isotropic bulk (random-pair cosine ~0 at dim 64) plus planted
    partners at cos ~0.93."""
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.normal(0, 1.0, size=(n, dim))
    for i in range(n_pairs):
        a, b = 2 * i, 2 * i + 1
        base[b] = base[a] + rng.normal(0, 0.22, size=dim)
    return base


def test_contamination_embedding_strict_on_planted_corpus(spark, tmp_path):
    """VERDICT r12 item 7: the production-shaped (>= 0.8, fixed
    nprobe) decontamination twin must be NON-vacuously correct — on a
    planted corpus it must (a) equal its IVF-replaying DuckDB oracle
    exactly and (b) agree with the brute-force eval-vs-train verdict
    for every eval item (planted partners share probe cells by
    construction, so recall is 1.0 here)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entry
    from go_integ_spark.operators.curation import CONTAM_EMB_STRICT

    base = _sparse_neardup_embeddings()
    n = len(base)
    path = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [r.astype("float32") for r in base], pa.list_(pa.float32())
                ),
            }
        ),
        f"{path}/embeddings.parquet",
    )
    q, o = entry.queries(), entry.oracle_sql()
    name = "contamination_embedding_strict"
    got = sorted(map(tuple, q[name](spark, path).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{path}/embeddings.parquet'"
    )
    oracle = sorted(con.execute(o[name]).fetchall())
    assert got == oracle
    # brute-force eval-vs-train verdicts on the float64-cast vectors
    e = base.astype("float32").astype("float64")
    nrm = np.sqrt((e * e).sum(axis=1))
    sim = (e @ e.T) / np.outer(nrm, nrm)
    ev_ids = [i for i in range(n) if i % 10 == 0]
    tr_ids = np.array([i for i in range(n) if i % 10 != 0])
    brute = {
        ev: bool((sim[ev, tr_ids] >= CONTAM_EMB_STRICT).any()) for ev in ev_ids
    }
    got_verdicts = {int(r[0]): bool(r[1]) for r in got}
    assert got_verdicts == brute
    assert sum(brute.values()) >= 8, "corpus must contain contaminated evals"


class TestCCHashJoinInvariance:
    def test_components_identical_both_arms(self, spark, monkeypatch):
        """CC_HASHJOIN only swaps the per-round hop/jump join
        strategy (shuffled-hash build on the nodes-sized side vs
        sort-merge); the labels must be byte-identical."""
        from go_integ_spark.operators.dedup import connected_components

        rows = [(i, i + 1) for i in range(30, 36)] + [
            (1, 2),
            (2, 3),
            (3, 1),
            (50, 51),
        ]
        edges = spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")
        monkeypatch.setenv("CC_HASHJOIN", "0")
        off = sorted(map(tuple, connected_components(edges).collect()))
        monkeypatch.setenv("CC_HASHJOIN", "1")
        on = sorted(map(tuple, connected_components(edges).collect()))
        assert off == on and len(off) == 12


class TestBlockPairCap:
    def test_no_block_exceeds_pair_cap(self, monkeypatch):
        """r13: the planner must bound every block's kernel pairs at
        BLOCK_PAIR_CAP regardless of cost constants — the 1000x
        multilang probe measured a 200x real-time spread across bins
        whose PLANNED costs were uniform to 1.3x, because a capped
        dimension still admitted cap x cap = 67M-pair blocks."""
        from go_integ_spark.functions import blocks

        monkeypatch.setenv("SG_ROW_COST", "3000")
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        cells = [
            (("en", 1), 5673, 166515),  # the probe's hottest cell
            (("de", 2), 7767, 83040),
            (("fr", 3), 182, 40),
            (("zh", 4), 8192, 8192),
        ]
        split_rows, bin_rows, n_bins = blocks.plan_grid_bins(
            cells, 8192, 256
        )
        splits = {tuple(s[:-2]): (s[-2], s[-1]) for s in split_rows}
        for kv, n_m, n_p in cells:
            nc, np_ = splits[kv]
            assert (n_m / nc) * (n_p / np_) <= blocks.BLOCK_PAIR_CAP, kv
        # and the env override widens it
        monkeypatch.setenv("SG_BLOCK_PAIR_CAP", "1e12")
        s2, _, _ = blocks.plan_grid_bins(cells, 8192, 256)
        sp2 = {tuple(s[:-2]): (s[-2], s[-1]) for s in s2}
        assert sp2[("zh", 4)] == (1, 1)  # one cap x cap block again

    def test_split_growth_prefers_cheaper_replication(self):
        """Growing the member split replicates probes and vice versa;
        the greedy must grow the side whose replication ships fewer
        rows (probe-heavy cells split the member dimension less)."""
        from go_integ_spark.functions import blocks

        (split,), _, _ = [
            x for x in [blocks.plan_grid_bins([((1,), 100, 1_000_000)], 8192, 256)]
        ][0]
        nc, np_ = split[-2], split[-1]
        # probe side is 10_000x heavier: replicate PROBES (grow nc)
        # as little as possible, split probes (np_) instead
        assert np_ > nc
