"""Property tests for cdc_snapshot_diff and curation_pipeline_funnel
beyond the value-level oracle: boundary cutoffs and funnel
monotonicity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_integ_spark.operators.advanced import snapshot_diff
from go_integ_spark.registry import load_all
from go_integ_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_cutoff_at_max_ts_is_empty(spark):
    # Snapshot == current state -> nothing changed.
    ev = load_table(spark, SF_DIR, "events")
    hi = ev.agg(F.max("ts")).collect()[0][0]
    assert snapshot_diff(ev, str(hi)).count() == 0


def test_cutoff_before_min_ts_is_all_inserts(spark):
    # Empty old snapshot -> one 'insert' per user, carrying the same
    # latest row keep-latest dedup would pick.
    ev = load_table(spark, SF_DIR, "events")
    diff = snapshot_diff(ev, "2023-01-01 00:00:00")
    rows = {r["user_id"]: r for r in diff.collect()}
    assert all(r["op"] == "insert" for r in rows.values())
    assert all(r["old_event_id"] is None for r in rows.values())
    latest = load_all()["dedup_keep_latest"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(latest)
    for r in latest:
        assert rows[r["user_id"]]["new_event_id"] == r["event_id"]


def test_mid_cutoff_partitions_users(spark):
    # insert-users and update-users are disjoint; every diffed user's
    # new row is strictly after the cutoff.
    ev = load_table(spark, SF_DIR, "events")
    cutoff = "2024-01-01 06:00:00"
    diff = snapshot_diff(ev, cutoff).collect()
    by_op = {"insert": set(), "update": set()}
    for r in diff:
        by_op[r["op"]].add(r["user_id"])
        assert str(r["new_ts"]) > cutoff
    assert not (by_op["insert"] & by_op["update"])


def test_funnel_counts_monotone_non_increasing(spark):
    rows = sorted(
        load_all()["curation_pipeline_funnel"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "input", "lang_quality", "exact_dedup", "near_dedup", "sample",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0


def test_histogram_partitions_the_corpus(spark):
    """Histogram invariants: bucket counts sum to the corpus row
    count, bucket ids are within [0, HIST_BINS), and bin edges tile
    [mn, mx] contiguously (each bucket's hi equals the next one's lo
    at 4-decimal resolution)."""
    from go_integ_spark.operators.advanced import HIST_BINS, agg_histogram
    from go_integ_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        agg_histogram(spark, sf).collect(), key=lambda r: r["bucket"]
    )
    total = load_table(spark, sf, "events").count()
    assert sum(r["n"] for r in rows) == total
    assert all(0 <= r["bucket"] < HIST_BINS for r in rows)
    by_bucket = {r["bucket"]: r for r in rows}
    for b, r in by_bucket.items():
        nxt = by_bucket.get(b + 1)
        if nxt is not None:
            assert abs(r["bin_hi"] - nxt["bin_lo"]) < 1e-9


def test_click_attribution_window_semantics(spark, tmp_path):
    """Forward as-of: a click attributes to the NEXT purchase
    at-or-after it only within the 7-day window; same-instant
    purchases attribute; clicks with no later purchase stay NULL."""
    from datetime import datetime

    from go_integ_spark.operators.advanced import asof_join_click_attribution

    def ts(day, hour=0):
        return datetime(2024, 1, day, hour)

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, ts(1), 1, "click", 0.0, "{}"),      # purchase same instant -> attributed
        (2, ts(1), 1, "purchase", 5.0, "{}"),
        (3, ts(2), 1, "click", 0.0, "{}"),      # next purchase day 20 -> outside window
        (4, ts(20), 1, "purchase", 5.0, "{}"),
        (5, ts(25), 1, "click", 0.0, "{}"),     # no later purchase -> NULL
        (6, ts(3), 2, "click", 0.0, "{}"),      # purchase day 9 -> inside 7d? 6 days -> yes
        (7, ts(9), 2, "purchase", 1.0, "{}"),
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(path + "/events.parquet")
    got = {
        r["event_id"]: (r["attributed"], r["attributed_purchase_us"])
        for r in asof_join_click_attribution(spark, path).collect()
    }
    us = lambda d: int(datetime(2024, 1, d).timestamp() * 1_000_000)
    assert got[1] == (True, us(1))
    assert got[3] == (False, None)
    assert got[5] == (False, None)
    assert got[6] == (True, us(9))
