"""Invariant pins for the round-6 second-session additions (BM25
retrieval, DSIR importance weights, scalar-quantization encode,
IVF recall self-evaluation, BPE tokenizer application). Value-level
correctness is covered by the oracle sweep; these assert the
SEMANTIC claims the docstrings make.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_integ_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"

REG = load_all()


def test_bm25_topk_shape_and_saturation(spark):
    from go_integ_spark.operators.text import BM25_TERMS, BM25_TOP_N

    rows = REG["text_bm25_topk"].fn(spark, SF_DIR).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    # Every query term matches at least one doc in this corpus.
    assert set(by_term) == set(BM25_TERMS)
    for term, rs in by_term.items():
        assert len(rs) <= BM25_TOP_N
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), term
        # Lucene idf variant is always positive, tf > 0 on every
        # emitted row -> every BM25 score is strictly positive.
        for r in rs:
            assert r["bm25"] > 0, r
        # rank order == descending rounded score (doc_id tiebreak).
        by_rank = sorted(rs, key=lambda r: r["rank"])
        for a, b in zip(by_rank, by_rank[1:]):
            assert (a["bm25"], -a["doc_id"]) >= (b["bm25"], -b["doc_id"]), term


def test_dsir_weights_favor_target_language(spark):
    """THE DSIR claim: documents drawn from the target distribution
    get higher importance weights than the rest of the raw pool."""
    out = REG["curation_dsir_weights"].fn(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    j = out.join(docs, "doc_id").collect()
    assert len(j) == 500
    tgt = [r["logw_u"] / r["n_grams"] for r in j if r["lang"] == "en"]
    rest = [r["logw_u"] / r["n_grams"] for r in j if r["lang"] != "en"]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_model_is_bounded(spark):
    """The broadcast model table is bucket-bounded, not corpus-sized."""
    from go_integ_spark.operators.curation import DSIR_BUCKETS

    out = REG["curation_dsir_weights"].fn(spark, SF_DIR)
    # n_grams per doc equals words-1 (all docs are single-line).
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", (F.size(F.split("text", " ")) - 1).alias("want")
    )
    bad = out.join(docs, "doc_id").filter(F.col("n_grams") != F.col("want"))
    assert bad.count() == 0
    assert DSIR_BUCKETS <= 4096
