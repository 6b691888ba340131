"""Invariant pins for the round-6 additions beyond oracle equality:
the CMS error guarantee, perplexity-tertile geometry, DAU/WAU window
algebra, and bitext-pair shape. Value-level correctness is covered by
the oracle sweep; these assert the SEMANTIC claims the docstrings
make.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_integ_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"

REG = load_all()


def test_countmin_is_one_sided(spark):
    rows = REG["agg_countmin_sketch"].fn(spark, SF_DIR).collect()
    assert rows, "top-k heavy hitters must be non-empty"
    assert {r["rank"] for r in rows} == set(range(1, len(rows) + 1))
    for r in rows:
        # THE count-min guarantee: never undercounts.
        assert r["cms_n"] >= r["exact_n"], r
        assert r["overcount"] == r["cms_n"] - r["exact_n"]


def test_perplexity_buckets_geometry(spark):
    rows = REG["text_perplexity_buckets"].fn(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) >= 2
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        n = len(rs)
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r["ppl_bucket"]] += 1
        # Value thresholds put ties in the better bucket, so head and
        # head+middle can only EXCEED their rank targets, never fall
        # short; all three cover the scored set exactly.
        assert counts["head"] >= math.ceil(n / 3), (lang, counts)
        assert counts["head"] + counts["middle"] >= math.ceil(2 * n / 3)
        assert sum(counts.values()) == n
        # Score ordering respects bucket ordering: every head score >=
        # every middle score >= every tail score.
        worst = {}
        best = {}
        for r in rs:
            b = r["ppl_bucket"]
            worst[b] = min(worst.get(b, r["avg_logp"]), r["avg_logp"])
            best[b] = max(best.get(b, r["avg_logp"]), r["avg_logp"])
        for hi, lo in (("head", "middle"), ("middle", "tail")):
            if hi in worst and lo in best:
                assert worst[hi] >= best[lo], (lang, worst, best)
        assert order  # silence linters; ordering map used above


def test_rolling_distinct_window_algebra(spark):
    out = REG["window_rolling_distinct_users"].fn(spark, SF_DIR)
    rows = sorted(out.collect(), key=lambda r: r["day"])
    assert rows
    daus = {r["day"]: r["dau"] for r in rows}
    for r in rows:
        window_daus = [
            d for day, d in daus.items() if 0 <= (r["day"] - day).days <= 6
        ]
        # WAU dominates every constituent DAU and never exceeds their sum.
        assert r["wau"] >= max(window_daus), r
        assert r["wau"] <= sum(window_daus), r


def test_bitext_pairs_shape(spark):
    from go_integ_spark.operators.similarity import (
        BITEXT_COS_FLOOR_U,
        BITEXT_MARGIN_MIN_U,
    )

    rows = REG["similarity_bitext_pairs"].fn(spark, SF_DIR).collect()
    assert rows, "the clustered corpus must yield mined pairs"
    seen = set()
    for r in rows:
        assert r["tgt_lang"] != "en"
        assert r["margin_u"] >= BITEXT_MARGIN_MIN_U
        assert r["cos_u"] >= BITEXT_COS_FLOOR_U
        key = (r["src_id"], r["tgt_lang"])
        assert key not in seen, f"duplicate best-match for {key}"
        seen.add(key)


def test_salted_skew_partitions_are_even(spark):
    # The claim join_salted_skew gates semantically; here pin the
    # MECHANISM: the shuffle key it joins on really is widened beyond
    # the 5-value event_type (salt column present pre-join).
    plan = (
        REG["join_salted_skew"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "__salt" in plan
