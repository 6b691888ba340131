"""Curation operators: sampling determinism/stratification and
contamination-rate invariants (the oracle sweep in
test_queries_oracle.py covers value-level DuckDB agreement).
"""

from __future__ import annotations

from go_integ_spark.operators.curation import (
    DEFAULT_RATE,
    SAMPLE_RATES,
    contamination_ngram_overlap,
    sample_stratified,
)
from go_integ_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_sample_is_deterministic_and_stratified(spark):
    a = sorted(map(tuple, sample_stratified(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sample_stratified(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0

    docs = load_table(spark, SF_DIR, "documents")
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept: dict = {}
    for _, lang in a:
        kept[lang] = kept.get(lang, 0) + 1
    # each stratum's realized rate should be within +/-20pp of its
    # configured rate (hash buckets are uniform; strata are small here)
    for lang, total in totals.items():
        rate = SAMPLE_RATES.get(lang, DEFAULT_RATE) / 100
        assert abs(kept.get(lang, 0) / total - rate) < 0.20, lang


def test_contamination_rate_bounds_and_split(spark):
    rows = contamination_ngram_overlap(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["doc_id"] % 10 == 0  # held-out split only
        assert 0 <= r["n_contaminated"] <= r["n_grams"]
        assert 0.0 <= r["contamination_rate"] <= 1.0
