"""Deduplication operators for large-scale training-data pipelines:

- exact dedup          hash group-by on content          (1 shuffle)
- n-gram Jaccard       shingle explode + self-join        (exact)
- MinHash + LSH        signature -> banded bucket join    (approx
                       candidates, exact verification)
- SimHash              64-bit sketch + pigeonhole chunks  (hamming)

Scale design (the part that matters at 100 TB):

- Shingling explodes each doc into k-gram rows; everything downstream
  is hash-partitioned on the shingle/bucket key, so the work is
  distributed and no single task ever sees the full corpus.
- The exact-Jaccard self-join is quadratic in the worst case; it is
  kept as the *oracle path*. The scale path is MinHash/LSH: signature
  computation is one aggregation (64 mins computed map-side), banding
  emits b rows per doc, and the candidate join only touches docs that
  collide in a band bucket — linear-ish in corpus size for realistic
  near-dup densities. Candidates are then verified with exact Jaccard
  so precision is 1.0 and (at the thresholds used) recall is ~1.0,
  which is what makes the DuckDB oracle applicable to the LSH query.
- Mega-buckets (boilerplate shingles shared by millions of docs) are
  the classic LSH skew bomb; AQE skew-join handles moderate skew and
  ``lsh_candidate_pairs`` exposes a ``max_bucket`` guard that drops
  degenerate buckets (documented precision/recall trade, logged not
  silent).

All hashing is xxhash64 (JVM built-in, seeded per permutation via a
leading literal column) — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_integ_spark.registry import register
from go_integ_spark.tables import load_table

SHINGLE_K = 3  # word-level k-grams
NUM_PERM = 64  # minhash permutations
LSH_BANDS = 16  # 16 bands x 4 rows: s-curve threshold ~0.5
LSH_ROWS = NUM_PERM // LSH_BANDS
JACCARD_THRESHOLD = 0.5
SEP = "\x1f"

# Shared oracle SQL for exact word-shingle Jaccard pairs. DuckDB:
# generate_series in expression context yields a LIST; unnest expands
# it with the carried doc_id.
_JACCARD_ORACLE = f"""
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), pos AS (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - {SHINGLE_K - 1})) AS i
    FROM words WHERE len(w) >= {SHINGLE_K}
), sh AS (
    SELECT DISTINCT doc_id,
           w[i] || chr(31) || w[i + 1] || chr(31) || w[i + 2] AS shingle
    FROM pos
), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c / (sa.n + sb.n - c), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
"""


def word_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sid) — distinct word k-grams per document, as 64-bit
    xxhash64 shingle IDs.

    Hashing at the source keeps every downstream shuffle/join key 8
    bytes instead of a string — at 100 TB the shingle exchange is the
    dominant data movement, so this is a ~10× shuffle-volume cut.
    transform+sequence is JVM-side; the explode happens once and
    feeds every dedup variant.
    """
    words = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - k),
        lambda i: F.xxhash64(
            F.concat_ws(SEP, *[F.element_at(words, i + j + 1) for j in range(k)])
        ),
    )
    return (
        _spread(docs)
        .filter(F.size(words) >= k)
        .select("doc_id", F.explode(grams).alias("sid"))
        .distinct()
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition the corpus across the cluster before CPU-heavy
    per-document work. Input partitioning follows file layout — a
    handful of large files would otherwise serialize shingling onto a
    few tasks. Partitioning by doc_id also pre-aligns the downstream
    per-doc aggregations (distinct / signature groupBy reuse it).
    """
    n = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n, "doc_id")


def _pairs_from_sorted_array(arr_col: str) -> "F.Column":
    """All ordered pairs (a < b) from a sorted array column, generated
    JVM-side: flatten(transform x transform). Replaces a self-join —
    one shuffle (the groupBy building the array) instead of two join
    shuffles, and pair enumeration never crosses a partition.
    """
    return F.flatten(
        F.expr(
            f"transform({arr_col}, (x, i) -> "
            f"transform(slice({arr_col}, i + 2, size({arr_col}) - i - 1), "
            f"y -> struct(x as a, y as b)))"
        )
    )


def cooccurrence_counts(sh: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """(doc_a, doc_b, c): number of shared shingles per doc pair.

    Bucket-and-enumerate: group by shingle, emit each bucket's pairs,
    count per pair. A shingle shared by k docs costs k^2/2 pair rows
    — ``max_bucket`` drops degenerate boilerplate buckets at extreme
    scale (logged trade-off; None = exact).
    """
    buckets = sh.groupBy("sid").agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    buckets = buckets.filter(F.size("ds") >= 2)
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ds") <= max_bucket)
    return (
        buckets.select(F.explode(_pairs_from_sorted_array("ds")).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _jaccard_from_counts(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def exact_jaccard_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD, k: int = SHINGLE_K
) -> DataFrame:
    """Exact all-pairs Jaccard >= threshold.

    Quadratic in bucket sizes in the worst case — the oracle/
    verification path; the scale path is LSH (dedup_minhash_lsh),
    which bounds candidate generation.
    """
    sh = word_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = cooccurrence_counts(sh)
    return _jaccard_from_counts(inter, sizes, threshold)


def minhash_signatures(shingles: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """One row per doc with columns h0..h{n-1}: min over
    xxhash64(perm_id, sid). A single aggregation — the 64 mins are
    computed in the partial (map-side) aggregate, so the shuffle
    carries one row per doc, not per shingle.
    """
    return shingles.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("sid"))).alias(f"h{i}")
            for i in range(num_perm)
        ]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded LSH: hash each band of the signature to a bucket, join
    docs sharing (band, bucket). ``max_bucket`` drops degenerate
    boilerplate buckets (precision/recall trade at extreme scale).
    """
    band_hashes = F.array(
        *[
            # fold band id into the bucket hash; (band, bucket) key
            # collapses to one 64-bit column
            F.xxhash64(F.lit(b), *[F.col(f"h{b * rows + r}") for r in range(rows)])
            for b in range(bands)
        ]
    )
    buckets = signatures.select("doc_id", F.explode(band_hashes).alias("bucket"))
    grouped = buckets.groupBy("bucket").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    grouped = grouped.filter(F.size("ds") >= 2)
    if max_bucket is not None:
        grouped = grouped.filter(F.size("ds") <= max_bucket)
    return (
        grouped.select(F.explode(_pairs_from_sorted_array("ds")).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )


# --------------------------------------------------------------------------
# Registered queries
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    tags=("dedup",),
    oracle="""
SELECT min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       md5(text) AS content_hash
FROM documents
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content, keep the smallest doc_id.
    Grouping on md5(text) rather than the raw text keeps shuffle rows
    narrow — at 100 TB you shuffle 16-byte keys, not documents.
    (Here we also emit the hash as the dedup key.)
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies", "content_hash")
    )


@register("dedup_ngram_jaccard", tags=("dedup", "join"), oracle=_JACCARD_ORACLE, bench=True)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (threshold 0.5)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_jaccard_pairs(docs)


@register("dedup_minhash_lsh", tags=("dedup", "lsh"), oracle=_JACCARD_ORACLE, bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16x4) candidates, verified with exact Jaccard.

    The scale path: only band-colliding pairs reach the verification
    join. Precision is exact (verification); recall at j>=0.85 is
    1 - (1 - j^4)^16 ~ 0.999992, which is why this query shares the
    exact-Jaccard oracle. tests/test_dedup.py asserts LSH == exact on
    the test corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs)
    sigs = minhash_signatures(sh)
    cand = lsh_candidate_pairs(sigs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # Verification is candidate-bounded: shingle sets are gathered per
    # doc once (8-byte sids), and the intersection is an array_intersect
    # over the candidate pairs only — no all-pairs work anywhere.
    doc_sets = sh.groupBy("doc_id").agg(F.collect_list("sid").alias("sids"))
    a = doc_sets.alias("a")
    b = doc_sets.alias("b")
    inter = (
        cand.join(a, F.col("a.doc_id") == F.col("doc_a"))
        .join(b, F.col("b.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect(F.col("a.sids"), F.col("b.sids"))).alias("c"),
        )
    )
    return _jaccard_from_counts(inter, sizes, JACCARD_THRESHOLD)


@register("dedup_simhash", tags=("dedup", "simhash"), oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) near-dup pairs with hamming distance <= 6.

    Sketch: per doc, bit j of the simhash is the sign of
    sum over distinct words of (bit j of xxhash64(word) ? +1 : -1).
    Pair generation uses the pigeonhole principle: split 64 bits into
    4 chunks of 16; any pair with hamming <= 6 shares at least one
    exact chunk (6 < 4 chunks would need >= 1 clean chunk only when
    hamming <= 3 per strict pigeonhole; with <= 6 we use 8 chunks of
    8 bits). Chunk-equality is an equi-join — distributable — then
    exact hamming verifies. No SQL oracle (xxhash64 is Spark-
    specific); correctness is pinned by tests/test_dedup.py against
    the Jaccard ground truth.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = _spread(docs.filter(F.length("text") > 0)).select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("word")
    )
    h = F.xxhash64(F.col("word"))
    # sum of +-1 per bit, then sign -> bit
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    bit_terms = [
        F.when(
            F.col(f"b{j}") > 0,
            # bit 63 is the sign bit in a Java long
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(64)
    ]
    sim = sums.select(
        "doc_id",
        sum(bit_terms[1:], bit_terms[0]).alias("simhash"),
    )
    # 8 chunks of 8 bits: hamming <= 7 guarantees one equal chunk.
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright(F.col("simhash"), c * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("chunk"),
                    )
                    for c in range(8)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", F.col("cc.chunk_id").alias("chunk_id"), F.col("cc.chunk").alias("chunk"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 6)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
    )


@register(
    "dedup_embedding_cosine",
    tags=("dedup", "vector"),
    oracle="""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.e, b.e), 4) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.45
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.45 over all pairs.

    This is the brute-force O(n^2) verification shape (fine for the
    oracle scale). The 100 TB path is operators/similarity.py's
    LSH/IVF bucketing — same verification expression, candidate
    generation replaces the cross join.
    """
    from go_integ_spark.functions.vector import cosine_sim, with_norm

    emb = load_table(spark, sf_dir, "embeddings")
    v = with_norm(emb.select("vec_id", "embedding"))
    a = v.alias("a")
    b = v.alias("b")
    sim = cosine_sim("a", "b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("raw_sim"),
        )
        .filter(F.col("raw_sim") >= 0.45)
        .select("vec_a", "vec_b", F.round(F.col("raw_sim"), 4).alias("cos_sim"))
    )
