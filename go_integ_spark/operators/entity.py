"""Entity resolution: blocked fuzzy matching over record names.

The classic record-linkage shape a training-data/metadata pipeline
needs (the reference framework extracts records; linking the
near-identical ones is the first downstream cleanup): cheap
deterministic BLOCKING key -> within-block pairwise edit distance on
the DISTINCT-name table -> match pairs with record counts.

Spark-first scale design (the dedup_minhash_lsh discipline applied
to string ER):

- comparisons run on the *distinct-name* table, never the record
  table: the corpus is touched once by a map-side-combined groupBy,
  and everything after is vocabulary-sized (at 100 TB the record
  table is petabytes but the distinct-name table still fits a
  broadcast);
- the block key (SECOND name token — `split_part(p_name, ' ', 2)`;
  on the gate generator's 2-token names this coincides with the last
  token, but the contract is positional) bounds the candidate set
  exactly
  like an LSH band bucket: the pair join is an equi-join on the
  block key, one shuffle of name-sized rows, never an all-pairs
  cross product;
- `MAX_BLOCK` drops degenerate mega-blocks (a block holding half the
  vocabulary makes the within-block quadratic explode; production ER
  re-blocks those on a finer key). The cap is part of the oracle
  contract (the similarity_threshold_join precedent) so a binding
  cap can never silently diverge;
- `levenshtein` runs JVM-side (Catalyst built-in) on both engines.

Nothing here exists in the reference (its framework has zero
analytics operators, SURVEY.md §2.3); this is a net-new capability
of the Spark engine, like the join/agg surface in relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_integ_spark.registry import register
from go_integ_spark.tables import load_table

# Match if edit distance <= MAX_EDIT (tight fuzzy: one-token adjective
# typos / abbreviations land here; the observed sf0.01 distribution is
# d=1:8, d=2:16, d>=3:128+ pairs, so 2 keeps matches selective).
MAX_EDIT = 2

# Blocks holding more than this many DISTINCT names are dropped whole
# (degenerate blocking key; production re-blocks on a finer key).
# Non-binding on every gate corpus (8 names/block at sf0.01) — the
# oracle enforces the same cap so binding is always cross-checked.
MAX_BLOCK = 1_000

ER_FUZZY_ORACLE = f"""
WITH names AS (
    SELECT p_name,
           split_part(p_name, ' ', 2) AS block_key,
           CAST(count(*) AS BIGINT) AS n_records
    FROM part
    GROUP BY 1, 2
), blocks AS (
    SELECT *, count(*) OVER (PARTITION BY block_key) AS block_n
    FROM names
), kept AS (
    SELECT * FROM blocks WHERE block_n <= {MAX_BLOCK}
)
SELECT a.block_key,
       a.p_name AS name_a,
       b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
       a.n_records AS records_a,
       b.n_records AS records_b
FROM kept a
JOIN kept b
  ON a.block_key = b.block_key AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {MAX_EDIT}
"""


def _kept_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-name table with blocking key, record count, a stable
    long node id (min record key — identical on both engines), and
    the MAX_BLOCK guard applied.

    ``cached_persist``: every consumer references this frame at least
    twice (both sides of the block self-join; er_golden_record adds a
    third for survivorship), and Catalyst does not share subplans
    across DataFrame references — the r13 before-plan shows the whole
    scan->agg->window subtree duplicated per side (guide §2.4:
    remove shuffles outright). The persisted frame is vocabulary-
    sized (distinct names after the MAX_BLOCK guard), so at 100 TB it
    is a KB-per-name table, not the record corpus; the self-join then
    reuses the cached window partitioning on block_key instead of
    re-exchanging each side."""
    from pyspark.sql import Window

    from go_integ_spark.functions.cache import cached_persist

    part = load_table(spark, sf_dir, "part")

    def build() -> DataFrame:
        names = part.groupBy(
            F.col("p_name"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("block_key"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_records"),
            F.min("p_partkey").cast("bigint").alias("nid"),
        )
        return names.withColumn(
            "block_n", F.count(F.lit(1)).over(Window.partitionBy("block_key"))
        ).filter(F.col("block_n") <= MAX_BLOCK)

    # MAX_BLOCK participates in the verifying KEY (token), not the
    # slot name: the cached frame bakes the guard in, so a different
    # cap (tests monkeypatch it) must rebuild — and via the token it
    # EVICTS the old cap's frame instead of forking a second live
    # slot that stays persisted for the session (ADVICE r13).
    return cached_persist("er_kept_names", part, build, token=MAX_BLOCK)


def _match_pairs(kept: DataFrame) -> DataFrame:
    """Within-block fuzzy match pairs over the distinct-name table:
    equi-join on block_key, `name_a < name_b` canonicalization, JVM
    levenshtein filter. Carries both display columns and the node
    ids the clustering stage consumes."""
    a = kept.select(
        "block_key",
        F.col("p_name").alias("name_a"),
        F.col("n_records").alias("records_a"),
        F.col("nid").alias("src"),
    )
    b = kept.select(
        "block_key",
        F.col("p_name").alias("name_b"),
        F.col("n_records").alias("records_b"),
        F.col("nid").alias("dst"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "block_key")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(dist <= MAX_EDIT)
        .withColumn("edit_dist", dist.cast("int"))
    )


@register(
    "er_blocked_fuzzy_parts",
    tags=("entity", "join", "fuzzy"),
    oracle=ER_FUZZY_ORACLE,
    bench=True,  # the ER family's headline representative (r11)
)
def er_blocked_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity-match pairs over part names.

    Plan: one map-side-combined groupBy collapses records to the
    distinct-name table (with record counts — the survivorship
    input); a window over block_key sizes each block for the
    MAX_BLOCK guard; the candidate join is a self equi-join on
    block_key with `a.p_name < b.p_name` halving + dedup'ing pairs;
    `levenshtein` filters JVM-side. No cross join anywhere — the
    quadratic is bounded per block and the joined relation is
    vocabulary-sized, not corpus-sized.
    """
    return _match_pairs(_kept_names(spark, sf_dir)).select(
        "block_key",
        "name_a",
        "name_b",
        "edit_dist",
        "records_a",
        "records_b",
    )


ER_GOLDEN_ORACLE = f"""
WITH RECURSIVE names AS (
    SELECT p_name,
           split_part(p_name, ' ', 2) AS block_key,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(min(p_partkey) AS BIGINT) AS nid
    FROM part
    GROUP BY 1, 2
), blocks AS (
    SELECT *, count(*) OVER (PARTITION BY block_key) AS block_n
    FROM names
), kept AS (
    SELECT * FROM blocks WHERE block_n <= {MAX_BLOCK}
), mpairs AS (
    SELECT a.nid AS src, b.nid AS dst
    FROM kept a
    JOIN kept b
      ON a.block_key = b.block_key AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {MAX_EDIT}
), edges AS (
    SELECT src, dst FROM mpairs
    UNION ALL
    SELECT dst AS src, src AS dst FROM mpairs
), reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
    SELECT src AS nid, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
), member AS (
    SELECT n.p_name, n.n_records, c.cluster_id
    FROM kept n JOIN comp c ON n.nid = c.nid
), ranked AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY n_records DESC, p_name
           ) AS rn,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size
    FROM member
)
SELECT cluster_id, p_name AS entity_name, n_records, cluster_size,
       rn = 1 AS is_golden
FROM ranked
"""


@register(
    "er_golden_record",
    tags=("entity", "graph", "survivorship"),
    oracle=ER_GOLDEN_ORACLE,
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship over the fuzzy-match graph: connected components
    cluster the matched names (cluster id = smallest member node id),
    then one window pass elects the golden record per cluster — the
    name holding the most records, tie-broken lexicographically.
    The record-linkage counterpart of dedup_canonical_pick: mine
    pairs -> cluster -> keep one canonical identity.

    Scale shape: the match graph lives on the vocabulary-sized
    distinct-name table, so the iterative CC (min-label propagation
    with path halving, dedup.connected_components) runs on a graph
    orders of magnitude smaller than the record table; the
    survivorship window partitions by cluster_id, bounded by the
    largest fuzzy cluster, never the corpus. Matched-name clusters
    only — unmatched names are already their own golden record and
    stay on the main table.
    """
    from pyspark.sql import Window

    from go_integ_spark.operators.dedup import connected_components

    kept = _kept_names(spark, sf_dir)
    edges = _match_pairs(kept).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    comp = connected_components(edges).select(
        F.col("node").alias("nid"), F.col("component").alias("cluster_id")
    )
    member = kept.join(comp, "nid")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_records"), F.asc("p_name")
    )
    return member.select(
        "cluster_id",
        F.col("p_name").alias("entity_name"),
        "n_records",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .cast("bigint")
        .alias("cluster_size"),
        (F.row_number().over(w) == 1).alias("is_golden"),
    )


ER_BLOCKING_QUALITY_ORACLE = f"""
WITH names AS (
    SELECT p_name, split_part(p_name, ' ', 2) AS block_key
    FROM part GROUP BY 1, 2
), pairs AS (
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           a.block_key = b.block_key AS same_block,
           levenshtein(a.p_name, b.p_name) <= {MAX_EDIT} AS is_match
    FROM names a JOIN names b ON a.p_name < b.p_name
)
SELECT CAST((SELECT count(*) FROM names) AS BIGINT) AS n_names,
       CAST(count(*) AS BIGINT) AS total_pairs,
       CAST(sum(CASE WHEN same_block THEN 1 ELSE 0 END) AS BIGINT)
           AS n_candidates,
       CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN same_block AND is_match THEN 1 ELSE 0 END)
            AS BIGINT) AS n_caught,
       round(1.0 - sum(CASE WHEN same_block THEN 1 ELSE 0 END)
                   / count(*), 4) AS reduction_ratio,
       round(CASE WHEN sum(CASE WHEN is_match THEN 1 ELSE 0 END) = 0
                  THEN 1.0
                  ELSE sum(CASE WHEN same_block AND is_match
                           THEN 1 ELSE 0 END)
                       / sum(CASE WHEN is_match THEN 1 ELSE 0 END)
             END, 4) AS pair_completeness
FROM pairs
"""


@register(
    "er_blocking_quality",
    tags=("entity", "eval", "quality"),
    oracle=ER_BLOCKING_QUALITY_ORACLE,
)
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-strategy eval: reduction ratio (share of all-pairs
    comparisons the block key eliminates) and pair completeness
    (share of true fuzzy matches the blocking retains) — the two
    numbers that decide whether a blocking key is shippable before
    anyone runs the full linkage.

    The ground truth is the UNBLOCKED all-pairs edit-distance sweep
    over the distinct-name table — a deliberate bounded cross join,
    the eval-matrix exception (the ann_bruteforce_topk precedent):
    it is vocabulary x vocabulary, never record x record, and in
    production this eval runs on a sampled vocabulary while the
    production path (er_blocked_fuzzy_parts) stays equi-join-only.
    """
    from go_integ_spark.functions.cache import cached_persist

    part = load_table(spark, sf_dir, "part")
    # The vocabulary frame feeds THREE consumers (the driver-side
    # n_names count plus both cross-join branches); persisting it
    # means the part scan + distinct-name groupBy run once, not
    # twice (ADVICE r10). Single-slot cache, so a long session never
    # accumulates copies.
    names = cached_persist(
        "er_quality_names",
        part,
        lambda: part.groupBy(
            F.col("p_name"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias(
                "block_key"
            ),
        ).agg(F.count(F.lit(1)).alias("_n")),
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("block_key").alias("block_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("block_key").alias("block_b")
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            (F.col("block_a") == F.col("block_b")).alias("same_block"),
            (
                F.levenshtein(F.col("name_a"), F.col("name_b")) <= MAX_EDIT
            ).alias("is_match"),
        )
    )
    n_names = names.count()
    both = F.sum(
        F.when(F.col("same_block") & F.col("is_match"), 1).otherwise(0)
    )
    n_true = F.sum(F.when(F.col("is_match"), 1).otherwise(0))
    n_cand = F.sum(F.when(F.col("same_block"), 1).otherwise(0))
    return pairs.agg(
        F.lit(n_names).cast("bigint").alias("n_names"),
        F.count(F.lit(1)).cast("bigint").alias("total_pairs"),
        n_cand.cast("bigint").alias("n_candidates"),
        n_true.cast("bigint").alias("n_true"),
        both.cast("bigint").alias("n_caught"),
        F.round(F.lit(1.0) - n_cand / F.count(F.lit(1)), 4).alias(
            "reduction_ratio"
        ),
        F.round(
            F.when(n_true == 0, F.lit(1.0)).otherwise(both / n_true), 4
        ).alias("pair_completeness"),
    )
