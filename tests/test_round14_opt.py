"""Round-14 optimization pins: bench retry-into-healthy-window
(VERDICT r13 item 1), the funnel near-dup de-array (item 2), and the
cached_persist token key (ADVICE r13)."""

from __future__ import annotations

import bench
from pyspark.sql import Window
from pyspark.sql import functions as F


def _att(total, contended=False, band="healthy"):
    return {"contended": contended, "par_band": band, "totals": [total]}


def test_select_attempt_prefers_healthy_uncontended():
    """VERDICT r13 item 1: a degraded attempt must not be recorded
    when a later healthy one exists — and vice versa a healthy early
    attempt must win over a faster-but-degraded later one."""
    degraded = _att(20.0, band="degraded")
    healthy = _att(30.0)
    assert bench.select_attempt([degraded, healthy]) is healthy
    assert bench.select_attempt([healthy, degraded]) is healthy


def test_select_attempt_contended_loses_to_degraded():
    """Contention (a sharing tenant) invalidates harder than a
    degraded hypervisor window: the degraded-but-solo attempt is the
    recordable one."""
    contended = _att(18.0, contended=True)
    degraded = _att(40.0, band="degraded")
    assert bench.select_attempt([contended, degraded]) is degraded


def test_select_attempt_ties_break_on_faster_total():
    """Same verdict class -> the faster total is the least-disturbed
    measurement (noise only ever inflates)."""
    slow = _att(31.0)
    fast = _att(29.0)
    assert bench.select_attempt([slow, fast]) is fast
    d_slow = _att(44.0, band="degraded")
    d_fast = _att(41.0, band="degraded")
    assert bench.select_attempt([d_slow, d_fast]) is d_fast


class TestArrowWindowBand:
    """r14: the Python-boundary (syscall/scheduler) degradation axis.
    A window can stall JVM<->Python wakeups 3-40x while the pure-CPU
    par calibration reads healthy; the in-process Arrow micro ratio
    detects it (24.8 measured in the stalled window vs the committed
    idle reference 11.0)."""

    def test_band_thresholds(self, monkeypatch):
        monkeypatch.delenv("SG_ARROW_HEALTHY_MAX_FACTOR", raising=False)
        assert bench.arrow_band(11.0, 11.0) == "healthy"
        assert bench.arrow_band(16.4, 11.0) == "healthy"  # <= ref*1.5
        assert bench.arrow_band(24.8, 11.0) == "degraded"
        # foreign host class / unreadable fingerprint: never blocks
        assert bench.arrow_band(24.8, None) == "unknown"
        assert bench.arrow_band(float("nan"), 11.0) == "unknown"

    def test_select_attempt_penalizes_arrow_degraded(self):
        stalled = {**_att(20.0), "arrow_band": "degraded"}
        clean = {**_att(30.0), "arrow_band": "healthy"}
        assert bench.select_attempt([stalled, clean]) is clean
        # unknown (unfingerprinted host) does NOT penalize
        unknown = {**_att(30.0), "arrow_band": "unknown"}
        assert bench.select_attempt([stalled, unknown]) is unknown
        # legacy attempts without the key still select (no crash)
        assert bench.select_attempt([_att(30.0), _att(29.0)])["totals"] == [
            29.0
        ]

    def test_arrow_window_measures_on_this_host(self):
        ratio, band = bench._arrow_window()
        assert band in ("healthy", "degraded", "unknown")
        if band != "unknown":
            assert ratio > 0


def test_session_io_codec_default_and_override(monkeypatch):
    """r14 codec ship (guide §2.3/§9): zstd is the session default —
    A/B'd at the 1000x kNN probe, scoring-exchange shuffle -18.9%
    bytes / -13.1% wall (SMOKE_r14_1000x_knn_codec_*.json) — and
    SG_IO_CODEC overrides for probes/escape hatch."""
    import inspect

    from go_integ_spark import session as sess

    src = inspect.getsource(sess.get_spark)
    assert "spark.io.compression.codec" in src
    monkeypatch.delenv("SG_IO_CODEC", raising=False)
    assert 'os.environ.get("SG_IO_CODEC", "zstd")' in src


def test_live_session_uses_zstd_codec(spark):
    """The conftest session is built by get_spark with no override,
    so the shipped default must be live in it."""
    assert spark.conf.get("spark.io.compression.codec") == "zstd"


class TestFunnelWindowMinEquivalence:
    def test_window_form_equals_selfjoin_form(self, spark):
        """VERDICT r13 item 2: the de-arrayed near-dup membership —
        window min over chunk_hash, no collect_set buffer — must
        produce exactly the self-join form's dup set. Same fixture as
        the r13 pin: a hot chunk, a pair chunk, a unique chunk, a doc
        that is min of one group but non-min of another, and a
        duplicate (doc, hash) occurrence."""
        rows = [
            (1, "h1"),
            (2, "h1"),
            (3, "h1"),
            (4, "h2"),
            (5, "h2"),
            (6, "h3"),
            (4, "h4"),
            (2, "h4"),
            (2, "h1"),
        ]
        wins = spark.createDataFrame(rows, "doc_id bigint, chunk_hash string")
        join_form = (
            wins.select(F.col("doc_id").alias("a"), "chunk_hash")
            .join(
                wins.select(F.col("doc_id").alias("b"), "chunk_hash"),
                "chunk_hash",
            )
            .filter(F.col("a") < F.col("b"))
            .select(F.col("b").alias("doc_id"))
            .distinct()
        )
        window_form = (
            wins.withColumn(
                "mn", F.min("doc_id").over(Window.partitionBy("chunk_hash"))
            )
            .filter(F.col("doc_id") != F.col("mn"))
            .select("doc_id")
            .distinct()
        )
        jf = sorted(r.doc_id for r in join_form.collect())
        wf = sorted(r.doc_id for r in window_form.collect())
        assert jf == wf == [2, 3, 4, 5]

    def test_funnel_plan_has_no_object_hash_aggregate(self, spark):
        """The de-array's point is the aggregation-buffer class: the
        funnel plan must carry NO ObjectHashAggregate (collect_set's
        physical form) — the near-dup stage is a sort-based window."""
        from go_integ_spark.operators.curation import curation_pipeline_funnel

        df = curation_pipeline_funnel(spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "ObjectHashAggregate" not in plan
        assert plan.count("Window") >= 1


class TestGreedySplitGeometryKept:
    """VERDICT r13 item 6 was measured and REJECTED: the near-square
    minimum-replication geometry shipped only -3% map-side bytes at
    the 1000x multilang probe (pair set byte-identical) and ran
    WORSE on wall because splitting the larger side multiplies its
    expensive parse lineage on the critical-path map stage
    (SMOKE_r14_1000x_bitext_geom_{greedy,balanced}.json). This pins
    the kept greedy's defining property so a future round does not
    silently re-land the rejected form: the bigger side is never
    replicated while growing the smaller side's split can still
    satisfy the pair cap."""

    def test_big_side_not_replicated_on_cap_bound_cells(self, monkeypatch):
        from go_integ_spark.functions import blocks

        monkeypatch.setenv("SG_ROW_COST", "650")
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        # the 1000x multilang probe's two hot cells: probes >> members
        cells = [(("en",), 5673, 166515), (("de",), 7767, 83040)]
        split_rows, _, _ = blocks.plan_grid_bins(cells, 8192, 256)
        splits = {s[0]: (s[-2], s[-1]) for s in split_rows}
        pair_cap = blocks.block_pair_cap()
        for kv, n_m, n_p in cells:
            nc, np_ = splits[kv[0]]
            assert (n_m / nc) * (n_p / np_) <= pair_cap  # cap holds
            assert nc == 1, kv  # big (probe) side ships exactly once

    def test_uncapped_cells_keep_minimum_splits(self, monkeypatch):
        from go_integ_spark.functions import blocks

        monkeypatch.setenv("SG_ROW_COST", "650")
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        split_rows, _, _ = blocks.plan_grid_bins(
            [((1,), 182, 40), ((2,), 100, 1_000_000)], 8192, 256
        )
        splits = {s[0]: (s[-2], s[-1]) for s in split_rows}
        assert splits[1] == (1, 1)
        # pair-light probe-heavy cell: dimension cap only, no member
        # replication beyond it
        assert splits[2] == (1, -(-1_000_000 // 8192))


class TestMicroRatioRefFingerprint:
    """VERDICT r13 item 8: the grid cost model's calibration reference
    is sourced from the committed fingerprint file, and a host-class
    change re-derives it automatically (min-of-3) instead of the
    former manual doc step."""

    def test_ref_comes_from_committed_fingerprint_on_matching_host(
        self, monkeypatch
    ):
        import json

        from go_integ_spark.functions import blocks

        with open(blocks._CALIB_FINGERPRINT_PATH) as f:
            fp = json.load(f)
        monkeypatch.setattr(
            blocks, "_host_cpu_fingerprint", lambda: fp["host_cpu_calib_sec"]
        )
        monkeypatch.setattr(
            blocks,
            "_micro_ratio",
            lambda: (_ for _ in ()).throw(AssertionError("must not re-derive")),
        )
        assert blocks._micro_ratio_ref() == fp["micro_ratio_ref"]

    def test_foreign_host_class_rederives_reference(self, monkeypatch):
        import json

        from go_integ_spark.functions import blocks

        with open(blocks._CALIB_FINGERPRINT_PATH) as f:
            fp = json.load(f)
        foreign = fp["host_cpu_calib_sec"] * fp["tolerance"] * 2
        monkeypatch.setattr(blocks, "_host_cpu_fingerprint", lambda: foreign)
        monkeypatch.setattr(blocks, "_micro_ratio", lambda: 42.5)
        assert blocks._micro_ratio_ref() == 42.5

    def test_missing_fingerprint_file_falls_back_to_anchor(
        self, monkeypatch
    ):
        from go_integ_spark.functions import blocks

        monkeypatch.setattr(
            blocks, "_CALIB_FINGERPRINT_PATH", "/nonexistent/fp.json"
        )
        monkeypatch.setattr(blocks, "_row_cost_cache", None)
        monkeypatch.delenv("SG_ROW_COST", raising=False)
        # _micro_ratio_ref raises -> calibrated_row_cost's guard
        # returns the anchor constant, never blocking planning
        assert blocks.calibrated_row_cost() == blocks.ROW_COST
        monkeypatch.setattr(blocks, "_row_cost_cache", None)


class TestCachedPersistToken:
    def test_token_change_evicts_instead_of_forking(self, spark):
        """ADVICE r13 (entity.py): a parameter baked into the built
        frame goes through cached_persist's token — changing it must
        EVICT the one live slot, not fork a second persisted frame."""
        from go_integ_spark.functions import cache

        base = spark.range(0, 10)
        cache._slots.pop("_r14_tok", None)
        f1 = cache.cached_persist(
            "_r14_tok", base, lambda: base.filter("id < 5"), token=5
        )
        assert f1.count() == 5
        f2 = cache.cached_persist(
            "_r14_tok", base, lambda: base.filter("id < 3"), token=3
        )
        assert f2.count() == 3
        # one live slot, holding the new token's frame
        assert cache._slots["_r14_tok"][3] == 3
        assert cache._slots["_r14_tok"][2] is f2
        # old frame was unpersisted by the eviction
        assert f1.storageLevel.useMemory is False
        # same token -> served the cached handle
        f3 = cache.cached_persist(
            "_r14_tok", base, lambda: base.filter("id < 3"), token=3
        )
        assert f3 is f2
        cache._slots.pop("_r14_tok")[2].unpersist()

    def test_er_kept_names_single_slot_across_cap_change(
        self, spark, monkeypatch
    ):
        """The entity.py consumer: monkeypatching MAX_BLOCK must reuse
        the ONE er_kept_names slot (evict + rebuild), never leave two
        live persisted frames."""
        import go_integ_spark.operators.entity as entity
        from go_integ_spark.functions import cache

        sf = "/root/testdata/sf0.001"
        cache._slots.pop("er_kept_names", None)
        entity._kept_names(spark, sf)
        monkeypatch.setattr(entity, "MAX_BLOCK", entity.MAX_BLOCK + 7)
        entity._kept_names(spark, sf)
        er_slots = [s for s in cache._slots if s.startswith("er_kept_names")]
        assert er_slots == ["er_kept_names"]
        assert cache._slots["er_kept_names"][3] == entity.MAX_BLOCK
        cache._slots.pop("er_kept_names")[2].unpersist()


class TestPretouchRegime:
    """Session-level heap pre-commit (VERDICT r13 item 5, guide §5):
    ON by default only in the large-heap scale regime (>= 16 GiB
    driver memory — the 1000x-probe / production profile), OFF at the
    bench/test 8g default so the driver's measured JVM environment is
    unchanged; SG_PRETOUCH=1/0 overrides both ways. Evidence for the
    default: SMOKE_r14_1000x_knn_straggler_{base2,pretouch,base3}
    ABA arms."""

    def test_default_off_at_bench_memory(self):
        from go_integ_spark.session import pretouch_enabled

        assert pretouch_enabled("8g", None) is False
        assert pretouch_enabled("512m", None) is False

    def test_default_on_at_scale_memory(self):
        from go_integ_spark.session import pretouch_enabled

        assert pretouch_enabled("48g", None) is True
        assert pretouch_enabled("16g", None) is True

    def test_env_overrides_both_ways(self):
        from go_integ_spark.session import pretouch_enabled

        assert pretouch_enabled("8g", "1") is True
        assert pretouch_enabled("48g", "0") is False

    def test_unparseable_memory_stays_off(self):
        from go_integ_spark.session import _mem_gb, pretouch_enabled

        assert _mem_gb("weird") == 0.0
        assert pretouch_enabled("weird", None) is False
        assert _mem_gb("16384m") == 16.0
