"""Invariants for the chunking + shuffle-shard manifest operators
beyond their DuckDB oracles (which pin exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_integ_spark.operators.curation import (
    N_SHUFFLE_SHARDS,
    curation_shuffle_shards,
)
from go_integ_spark.operators.text import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    text_chunk_overlap,
)
from go_integ_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_chunk_overlap_covers_every_token(spark):
    """Chunking must tile each document completely: chunk 0 starts at
    token 1, consecutive chunks advance by the stride, and the last
    chunk reaches the document's end — no token can fall outside
    every chunk."""
    docs = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    chunks: dict[int, list] = {}
    for r in text_chunk_overlap(spark, SF_DIR).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    assert set(chunks) == set(docs)
    for doc_id, rows in chunks.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = docs[doc_id]
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        # Every chunk but the last is full-size (or the doc is short).
        for r in rows[:-1]:
            assert r["n_tokens"] == CHUNK_TOKENS
        # Coverage: the last chunk's window reaches the end of the doc.
        last_start = (len(rows) - 1) * CHUNK_STRIDE
        assert last_start + rows[-1]["n_tokens"] >= n
        assert rows[-1]["n_tokens"] == min(CHUNK_TOKENS, n - last_start)


def test_chunk_overlap_plan_is_map_side_only(spark):
    plan = text_chunk_overlap(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_shuffle_shards_deterministic_and_balanced(spark):
    a = {tuple(r) for r in curation_shuffle_shards(spark, SF_DIR).collect()}
    b = {tuple(r) for r in curation_shuffle_shards(spark, SF_DIR).collect()}
    assert a == b, "shard manifest must be run-to-run identical"
    counts: dict[int, int] = {}
    keys: dict[int, set] = {}
    for _, shard, sort_key, _ in a:
        assert 0 <= shard < N_SHUFFLE_SHARDS
        counts[shard] = counts.get(shard, 0) + 1
        keys.setdefault(shard, set()).add(sort_key)
    mean = sum(counts.values()) / N_SHUFFLE_SHARDS
    assert len(counts) == N_SHUFFLE_SHARDS
    for shard, n in counts.items():
        assert 0.5 * mean <= n <= 1.5 * mean, (shard, n, mean)
    # Sort keys are collision-free per shard (a total training order).
    for shard, ks in keys.items():
        assert len(ks) == counts[shard]


def test_shuffle_shards_plan_is_map_side_only(spark):
    plan = (
        curation_shuffle_shards(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
