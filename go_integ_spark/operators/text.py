"""Text-analysis operators over the ``documents`` table: language ID,
quality scoring, token counting, fingerprinting.

All hot-path logic is built-in Spark SQL functions (JVM codegen, no
Python UDFs): these operators run at full scan speed and scale
linearly — language ID on 100 TB of documents is embarrassingly
parallel with zero shuffles (pure projection).

Each heuristic is deliberately expressible in ANSI SQL so the DuckDB
oracle runs the *same* logic — the correctness gate checks the
implementation, not the linguistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_integ_spark.registry import register
from go_integ_spark.tables import load_table

# Marker stopwords per language, checked as padded substrings.
# Priority order breaks ties deterministically.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "and", "of"]),
    ("fr", ["le", "la", "et", "les"]),
    ("es", ["el", "los", "que", "y"]),
    ("de", ["der", "die", "und", "das"]),
    ("zh", ["的", "是", "了"]),
]


def _occurrences(padded: Column, word: str) -> Column:
    """Count occurrences of the word (space-delimited) in a
    space-padded text. Spaces are DOUBLED first so ADJACENT repeats
    each get their own delimiters — without it ``' the the '``
    counts 1, not 2, because consecutive matches share a space (the
    text_bm25_topk fix, applied here too). length-delta /
    pattern-length: identical left-to-right non-overlapping
    semantics in Spark and DuckDB.
    """
    pat = f" {word} "
    doubled = F.replace(padded, F.lit(" "), F.lit("  "))
    return (
        F.length(doubled) - F.length(F.replace(doubled, F.lit(pat), F.lit("")))
    ) / len(pat)


def _occurrences_sql(padded: str, word: str) -> str:
    pat = f" {word} "
    doubled = f"replace({padded}, ' ', '  ')"
    return (
        f"(length({doubled}) - length(replace({doubled}, ' {word} ', '')))"
        f" / {len(pat)}"
    )


@register(
    "text_lang_id",
    tags=("text", "langid"),
    oracle="""
WITH scored AS (
    SELECT doc_id,
           {scores}
    FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)
)
SELECT doc_id,
       CASE
         WHEN score_en = 0 AND score_fr = 0 AND score_es = 0
              AND score_de = 0 AND score_zh = 0 THEN 'und'
         WHEN score_en >= score_fr AND score_en >= score_es
              AND score_en >= score_de AND score_en >= score_zh THEN 'en'
         WHEN score_fr >= score_es AND score_fr >= score_de
              AND score_fr >= score_zh THEN 'fr'
         WHEN score_es >= score_de AND score_es >= score_zh THEN 'es'
         WHEN score_de >= score_zh THEN 'de'
         ELSE 'zh'
       END AS pred_lang
FROM scored
""".format(
        scores=",\n           ".join(
            f"{'(' + ' + '.join(_occurrences_sql('p', w) for w in ws) + ')'} AS score_{lang}"
            for lang, ws in LANG_MARKERS
        )
    ),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword-count language ID. Pure projection — no
    shuffle, no UDF; a single codegen'd stage over the scan.
    Deterministic priority-ordered argmax (en > fr > es > de > zh on
    ties; 'und' when no marker hits).
    """
    docs = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scored = docs.select(
        "doc_id",
        *[
            sum(_occurrences(padded, w) for w in ws).alias(f"score_{lang}")
            for lang, ws in LANG_MARKERS
        ],
    )
    all_zero = None
    for lang, _ in LANG_MARKERS:
        c = F.col(f"score_{lang}") == 0
        all_zero = c if all_zero is None else (all_zero & c)
    pred = F.when(all_zero, F.lit("und"))
    langs = [lang for lang, _ in LANG_MARKERS]
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        pred = pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit(langs[-1]))
    return scored.select("doc_id", pred.alias("pred_lang"))


@register(
    "text_quality_score",
    tags=("text", "quality"),
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words,
       round(length(regexp_replace(text, '[^a-z]', '', 'g'))
             / greatest(len(regexp_extract_all(text, '[a-z]+')), 1), 4) AS avg_word_len,
       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
             / greatest(length(text), 1), 4) AS punct_ratio,
       round(((length(replace(' ' || text || ' ', ' ', '  '))
               - length(replace(replace(' ' || text || ' ', ' ', '  '),
                                ' the ', ''))) / 5
              + (length(replace(' ' || text || ' ', ' ', '  '))
                 - length(replace(replace(' ' || text || ' ', ' ', '  '),
                                  ' a ', ''))) / 3)
             / greatest(len(regexp_extract_all(text, '[a-z]+')), 1), 4) AS stopword_ratio,
       (len(regexp_extract_all(text, '[a-z]+')) BETWEEN 10 AND 1000
        AND length(regexp_replace(text, '[^a-z]', '', 'g'))
            / greatest(len(regexp_extract_all(text, '[a-z]+')), 1) BETWEEN 2 AND 12)
           AS quality_ok
FROM documents
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: word count, mean word length, punctuation
    ratio, stopword ratio, boolean gate. All length/regexp projections
    — scan-bound at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)).cast("bigint")
    n_words_safe = F.greatest(n_words, F.lit(1))
    alpha_len = F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
    punct_len = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    stop_hits = _occurrences(padded, "the") + _occurrences(padded, "a")
    avg_word_len = alpha_len / n_words_safe
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(punct_len / F.greatest(F.length("text"), F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits / n_words_safe, 4).alias("stopword_ratio"),
        (n_words.between(10, 1000) & avg_word_len.between(2, 12)).alias("quality_ok"),
    )


@register(
    "text_token_count",
    tags=("text", "tokenize"),
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)  AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT)
           AS n_bpe_ish_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish regex
    (letter runs | digit runs | single non-alnum). regexp_extract_all
    is JVM-side; the patterns avoid engine-specific regex features so
    Spark (Java regex) and DuckDB (RE2) agree.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
        .cast("bigint")
        .alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
        .cast("bigint")
        .alias("n_bpe_ish_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "text_fingerprint",
    tags=("text", "fingerprint"),
    oracle="""
SELECT doc_id,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercased
    text — the exact-dedup key for documents whose only difference is
    spacing/casing. (The shingle-based near-dup fingerprints live in
    operators/dedup.py.)
    """
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# PII patterns kept to regex features Java regex and DuckDB RE2 agree
# on (no backrefs, no lookaround): emails and long digit runs
# (account/phone-shaped identifiers).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_DIGIT_RUN = r"[0-9]{6,}"
_PII_ANY = f"({PII_EMAIL})|({PII_DIGIT_RUN})"


@register(
    "text_pii_redact",
    tags=("text", "pii"),
    oracle=rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_DIGIT_RUN}')) AS BIGINT)
           AS n_digit_runs,
       md5(regexp_replace(text, '{_PII_ANY}', '<PII>', 'g')) AS redacted_md5
FROM documents
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count email/digit-run matches per doc and emit the
    md5 of the redacted text (hash, not text, so the driver compare
    stays narrow). Row-local regexp — codegen, zero shuffles, linear
    at 100 TB. tests/test_text_pii.py proves the match/replace
    semantics on strings that actually contain PII; this corpus is
    synthetic word-soup, so counts here are mostly zero.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_DIGIT_RUN), 0))
        .cast("bigint")
        .alias("n_digit_runs"),
        F.md5(F.regexp_replace(F.col("text"), _PII_ANY, "<PII>")).alias(
            "redacted_md5"
        ),
    )


@register(
    "text_repetition_ratio",
    tags=("text", "quality"),
    oracle=r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_distinct_words,
       round(1.0 - len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS repetition_ratio
FROM documents
WHERE len(string_split(text, ' ')) > 0
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: 1 - distinct/total words. High
    ratio = boilerplate/spam-shaped doc, the standard cheap filter
    before expensive dedup. Row-local array ops, no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    return docs.filter(n > 0).select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        nd.cast("bigint").alias("n_distinct_words"),
        F.round(1.0 - nd.cast("double") / n, 4).alias("repetition_ratio"),
    )


TFIDF_TOP_N = 5


@register(
    "text_tfidf_topk",
    tags=("text", "tfidf", "window"),
    oracle=f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
    SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
), df AS (
    SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word
), n AS (
    SELECT count(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.word,
           round(tf.tf * ln(n.n_docs / df.df), 4) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, word, tfidf
FROM scored
QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, word ASC
) <= {TFIDF_TOP_N}
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{N} most characteristic terms per document by tf-idf.

    Scale shape: term frequencies partial-aggregate map-side before
    one shuffle on (doc_id, word); the document-frequency side joins
    on word WITHOUT a forced broadcast — a web-scale token vocabulary
    is itself distributed-sized, so the join strategy is left to
    AQE (which still broadcasts at test scale and switches to a
    partitioned join when the vocabulary outgrows the threshold).
    n_docs rides the df aggregation as a grand total instead of a
    separate count job. Ranking is on the ROUNDED score (desc, then
    word asc) in both engines, so cross-engine float noise below 1e-4
    cannot reorder the cut.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # The corpus size is its OWN 1-row aggregate branch cross-joined
    # in (broadcast; no driver-side count() round trip) — it cannot
    # ride the df aggregation because documents with zero words never
    # reach the word table. On parquet the branch is a
    # metadata-served count; on a filtered/non-columnar source it is
    # a real second scan, the cost of exact n_docs.
    df_ = words.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    n_docs_df = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.join(df_, "word").crossJoin(n_docs_df).select(
        "doc_id",
        "word",
        F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_N)
        .select("doc_id", "word", "tfidf")
    )


EMBED_DIM = 16  # stub embedding dimensionality


@register(
    "text_embed_hash",
    tags=("text", "embedding", "pandas_udf"),
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), b AS (
    SELECT doc_id,
           ('0x' || substr(md5(w), 1, 15))::BIGINT % {EMBED_DIM} AS j
    FROM toks
), n AS (
    SELECT doc_id, count(*) AS nt FROM b GROUP BY doc_id
), c AS (
    SELECT doc_id, j, count(*) AS cj FROM b GROUP BY doc_id, j
), dims AS (
    SELECT doc_id, unnest(generate_series(0, {EMBED_DIM - 1})) AS j FROM n
)
SELECT d.doc_id,
       CAST(d.j AS INT) AS dim_idx,
       round(coalesce(c.cj, 0) / CAST(n.nt AS DOUBLE), 6) AS v
FROM dims d
JOIN n ON n.doc_id = d.doc_id
LEFT JOIN c ON c.doc_id = d.doc_id AND c.j = d.j
""",
)
def text_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding generation through the batch model-inference shape:
    an Arrow-batched ``mapInPandas`` kernel maps each document to a
    {EMBED_DIM}-dim vector (here a deterministic hashed-token
    histogram — swap in a real encoder without touching the plan),
    emitted in exploded (doc_id, dim_idx, v) feature-store layout.

    The stub hashes with md5 so DuckDB computes the identical
    embedding — the inference plumbing itself is value-level
    oracle-checked, same trick as the multimodal kernels. Scale: the
    kernel is per-batch Python (the GPU-model slot); everything
    around it is row-local, so throughput scales with executors and
    maxRecordsPerBatch controls the batch shape a model server wants.
    """
    import math
    from collections.abc import Iterator

    import pandas as pd

    from go_integ_spark.functions.hashing import h60_py

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("dim_idx", IntegerType()),
            StructField("v", DoubleType()),
        ]
    )

    def embed(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, dims, vals = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split(" ")
                counts = [0] * EMBED_DIM
                for w in toks:
                    j = h60_py(w) % EMBED_DIM
                    counts[j] += 1
                nt = float(len(toks))
                for j in range(EMBED_DIM):
                    ids.append(doc_id)
                    dims.append(j)
                    # floor(x*1e6+0.5): HALF-UP like DuckDB round();
                    # Python round() is half-to-EVEN and flips exact
                    # ties (1/128 -> .007812 vs DuckDB .007813)
                    vals.append(
                        math.floor(counts[j] / nt * 1e6 + 0.5) / 1e6
                    )
            yield pd.DataFrame({"doc_id": ids, "dim_idx": dims, "v": vals})

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(embed, out_schema)


HH_TOP_K = 15


@register(
    "text_heavy_hitters",
    tags=("text", "topk", "heavy_hitters"),
    oracle=f"""
WITH words AS (
    SELECT lang, unnest(regexp_extract_all(text, '[a-z]+')) AS word
    FROM documents
), counts AS (
    SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt
    FROM words GROUP BY 1, 2
)
SELECT lang, word, cnt, CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY cnt DESC, word
    ) AS rn
    FROM counts
)
WHERE rn <= {HH_TOP_K}
""",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most frequent terms per language — the heavy-hitters
    primitive behind vocabulary building and stopword discovery.

    Scale shape: the explode is row-local; the groupBy count does
    map-side partial aggregation so the shuffle carries at most
    |vocabulary| rows per partition, not |corpus| tokens. The final
    per-language ranking reuses ``salted_topk``: with only a handful
    of distinct languages a plain Window.partitionBy(lang) would sort
    each language's ENTIRE vocabulary in one task (the fixed-
    cardinality-partition trap); the salted two-phase top-k bounds the
    single-task input to k * num_partitions rows regardless of
    vocabulary size.
    """
    from go_integ_spark.operators.similarity import salted_topk

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.explode(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("word"),
    )
    counts = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("cnt"))
    top = salted_topk(counts, "lang", [F.col("cnt").desc(), F.col("word").asc()], HH_TOP_K)
    return top.select("lang", "word", "cnt", F.col("rn").cast("int").alias("rank"))


@register(
    "text_word_stats",
    tags=("text", "quality", "entropy"),
    oracle="""
WITH words AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS word
    FROM documents
), wc AS (
    SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS c
    FROM words GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(max(c) AS BIGINT) AS top_word_cnt,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax_cnt,
       round(ln(sum(c)) - list_sum(list(c * ln(c) ORDER BY c)) / sum(c), 4)
           AS word_entropy
FROM wc
GROUP BY doc_id
""",
)
def text_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-distribution stats: token count, unique
    count, top-word count, hapax count, and Shannon entropy of the
    word distribution (natural log; computed via the identity
    H = ln(n) - sum(c*ln(c))/n so one pass over per-word counts
    suffices).

    Low-entropy / high top-word-fraction documents are boilerplate or
    spam; hapax fraction tracks vocabulary richness — standard
    pretraining-corpus quality signals.

    Scale shape: everything is row-local array math on the already-
    tokenized document (no explode, no shuffle, no UDF) — a single
    codegen'd projection over the scan. Per-row cost is
    O(n_unique * n_words) for the count-by-word transform, bounded in
    practice by document length.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr("regexp_extract_all(text, '[a-z]+', 0)").alias("ws")
    )
    # Per-word counts within the row: distinct words -> count of each.
    cnts = toks.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.expr(
            "transform(array_distinct(ws), w -> cast(size(filter(ws, x -> x = w)) AS DOUBLE))"
        ).alias("cs"),
    )
    return cnts.filter(F.col("n_words") > 0).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.size("cs").cast("long").alias("n_unique"),
        F.array_max("cs").cast("long").alias("top_word_cnt"),
        F.size(F.expr("filter(cs, c -> c = 1.0D)")).cast("long").alias("hapax_cnt"),
        F.round(
            F.log(F.col("n_words").cast("double"))
            # fold over the count-SORTED array: the oracle's
            # list(c*ln(c) ORDER BY c) folds the same multiset in the
            # same order, pinning the float sum to the last ulp (an
            # unordered SUM could flip the 4dp rounding)
            - F.expr(
                "aggregate(array_sort(cs), 0.0D, (acc, c) -> acc + c * ln(c))"
            )
            / F.col("n_words").cast("double"),
            4,
        ).alias("word_entropy"),
    )


@register(
    "text_unigram_entropy",
    tags=("text", "quality"),
    oracle="""
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w,
           len(string_split(text, ' ')) AS n
    FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       round(len(list_distinct(w)) * 1.0 / n, 4) AS ttr,
       round(-list_sum(list_transform(list_sort(list_distinct(w)),
           u -> (len(list_filter(w, x -> x = u)) * 1.0 / n)
                * ln(len(list_filter(w, x -> x = u)) * 1.0 / n))), 4)
           AS entropy
FROM words WHERE n > 0
""",
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy + type-token ratio — the classic
    cheap quality signals (low entropy = repetitive/templated text,
    the thing quality filters drop first).

    Overlaps text_word_stats' word_entropy BY DESIGN, differing where
    it matters for composition: this operator tokenizes on whitespace
    (the same token stream the shingle/dedup family and
    corpus_token_stats use, so its entropy is comparable with theirs),
    while word_stats' regex tokenizer normalizes punctuation; and it
    adds TTR, the second standard repetitiveness ratio.

    Entirely ROW-LOCAL JVM expressions: distinct words, then a fold
    of -p*ln(p) over the SORTED distinct list — sorting fixes the
    float summation order so the DuckDB oracle reproduces the sum to
    the last ulp (an unordered SUM could differ and break the
    rounded hash). Per-doc cost is O(distinct * words); nothing
    shuffles, the filter reaches the scan.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split("text", " ")
    out = docs.withColumn("w", w).withColumn("n", F.size("w")).filter(F.col("n") > 0)
    # p is computed ONCE per distinct word (the filter scan is the
    # dominant O(distinct * words) row cost; the old fold ran it
    # twice — once for the factor, once inside ln). Same fold order
    # (sorted distinct words), bit-identical values.
    entropy = F.expr(
        "-aggregate(transform(array_sort(array_distinct(w)),"
        " u -> size(filter(w, x -> x = u)) / cast(n as double)),"
        " cast(0.0 as double), (acc, p) -> acc + p * ln(p))"
    )
    return out.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        F.round(F.size(F.array_distinct("w")) / F.col("n").cast("double"), 4).alias(
            "ttr"
        ),
        F.round(entropy, 4).alias("entropy"),
    )


# Retrieval/training chunking: 64-token windows, stride 48 (16-token
# overlap) — the standard context-chunking move for RAG indexing and
# long-document training splits.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

# Shared by the batch query and streaming_chunk_manifest (the
# availableNow streaming run of the identical transform).
CHUNK_ORACLE = f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), n AS (
    SELECT doc_id, ws,
           1 + (greatest(len(ws) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})
               // {CHUNK_STRIDE} AS n_chunks
    FROM w
), c AS (
    SELECT doc_id, t.i AS chunk_id,
           ws[t.i * {CHUNK_STRIDE} + 1 : t.i * {CHUNK_STRIDE} + {CHUNK_TOKENS}] AS cw
    FROM n, unnest(generate_series(0, n_chunks - 1)) AS t(i)
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(cw) AS INT) AS n_tokens,
       ('0x' || substr(md5(array_to_string(cw, ' ')), 1, 15))::BIGINT AS chunk_hash
FROM c
"""


def chunk_manifest(docs: DataFrame) -> DataFrame:
    """The chunk transform itself — a pure map-side Project over any
    (doc_id, text) frame, batch or streaming (it is stateless, so the
    streaming engine runs it without watermarks or state stores)."""
    from go_integ_spark.functions.hashing import h60

    chunks = F.expr(
        f"transform(sequence(0, (greatest(size(ws) - {CHUNK_TOKENS}, 0)"
        f" + {CHUNK_STRIDE - 1}) div {CHUNK_STRIDE}), i ->"
        f" struct(i AS chunk_id, slice(ws, i * {CHUNK_STRIDE} + 1,"
        f" {CHUNK_TOKENS}) AS cw))"
    )
    return (
        docs.withColumn("ws", F.split("text", " "))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").cast("int").alias("chunk_id"),
            F.size("c.cw").cast("int").alias("n_tokens"),
            h60(F.array_join("c.cw", " ")).alias("chunk_hash"),
        )
    )


@register(
    "text_chunk_overlap",
    tags=("text", "chunking"),
    oracle=CHUNK_ORACLE,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, stride 48):
    one row per (doc, chunk) with token count and the engine-portable
    h60 content hash — the chunk manifest a RAG indexer or a
    long-document training splitter consumes.

    Entirely ROW-LOCAL: the chunk list is a JVM ``transform`` over a
    per-doc ``sequence`` (chunk count is closed-form integer math, so
    both engines derive the identical chunking), then one explode —
    no shuffle anywhere, the whole query is a map-side Project over
    the scan, which is what lets a 1000-executor job chunk 100 TB in
    a single pass. Every doc yields >= 1 chunk (short docs produce
    one partial chunk); consecutive full chunks overlap by
    CHUNK_TOKENS - CHUNK_STRIDE tokens.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_manifest(docs)


# Per-doc bigram-LM scores as a reusable oracle fragment: yields
# (doc_id, n_bigrams, avg_logp). Shared by text_bigram_logprob and
# the CCNet-style perplexity bucketing built on top of it.
BIGRAM_SCORES_SQL = """
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), inst AS (
    SELECT doc_id, ws[t.i] AS w1, ws[t.i + 1] AS w2
    FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
), d AS (
    SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k
    FROM inst GROUP BY 1, 2, 3
), c2 AS (
    SELECT w1, w2, CAST(sum(k) AS DOUBLE) AS n2 FROM d GROUP BY 1, 2
), c1 AS (
    SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY 1
), probs AS (
    SELECT c2.w1, c2.w2, ln(c2.n2 / c1.n1) AS logp
    FROM c2 JOIN c1 ON c1.w1 = c2.w1
)
SELECT d.doc_id,
       CAST(sum(d.k) AS BIGINT) AS n_bigrams,
       round(list_sum(list(d.k * p.logp ORDER BY d.w1, d.w2)) / sum(d.k), 4)
           AS avg_logp
FROM d JOIN probs p ON p.w1 = d.w1 AND p.w2 = d.w2
GROUP BY d.doc_id
"""


def _bigram_scores_arrow(docs: DataFrame, model: dict) -> DataFrame:
    """Per-doc LM scoring as ONE map-side Arrow pass over the docs
    scan (r10, VERDICT r9 #2): the fitted {(w1, w2): logp} table
    rides a broadcast — the CCNet production shape, which ships the
    KenLM model to every worker and scores locally — so scoring
    itself shuffles NOTHING. The r9 form shuffled the 21.8M-row
    per-doc bigram-count frame twice (once to build it, once to fold
    it); a document's bigrams are row-local, so both shuffles were
    avoidable. Per doc the kernel replays the contract's exact float
    sequence: distinct-bigram counts (Counter), (w1, w2)-sorted
    (Python str order == UTF-8 byte order == the engines' binary
    collation), one ``k * logp`` product then one add per bigram —
    bit-identical to the retired ``_bigram_fold_expr`` HOF fold and
    the oracle's ``list_sum(list(... ORDER BY w1, w2))`` (pinned in
    tests/test_round10_ops.py). Output is (doc_id, n_bigrams, s);
    the average and rounding stay JVM-side."""
    from typing import Iterator

    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(model)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        m = bc.value
        for pdf in batches:
            out: list[tuple] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                ws = text.split(" ")
                if len(ws) < 2:
                    continue
                cnt = Counter(zip(ws, ws[1:]))
                acc, n = 0.0, 0
                for key in sorted(cnt):
                    k = cnt[key]
                    acc += k * m[key]
                    n += k
                out.append((int(did), n, acc))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "n_bigrams", "s"])

    return docs.mapInPandas(score, "doc_id long, n_bigrams long, s double")


def _bigram_fold_expr(d: DataFrame, probs: DataFrame) -> DataFrame:
    """The retired JVM-HOF fold — kept as the bit-exactness reference
    the round-10 kernel pin compares against."""
    return (
        d.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.expr(
                "aggregate(array_sort(collect_list("
                " struct(w1, w2, k * logp AS kl))),"
                " 0.0D, (acc, x) -> acc + x.kl)"
            ).alias("s"),
        )
    )


def bigram_doc_scores(docs: DataFrame) -> DataFrame:
    """The shared scoring pipeline of :func:`text_bigram_logprob`:
    fit the corpus bigram LM and return (doc_id, n_bigrams,
    avg_logp) — see that query's docstring for the scale shape."""
    inst = (
        docs.withColumn("ws", F.split("text", " "))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), i ->"
                    " struct(element_at(ws, i) AS w1,"
                    " element_at(ws, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # Model fit: total bigram counts straight off the instance stream
    # (map-side partial agg collapses to the distinct-bigram
    # vocabulary before the shuffle — identical integers to the
    # retired per-doc-then-total double aggregation).
    c2 = inst.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("n2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    probs = c2.join(c1, "w1").select(
        "w1", "w2", F.log(F.col("n2") / F.col("n1")).alias("logp")
    )
    # The per-doc float sum folds k*logp over the (w1, w2)-SORTED
    # distinct-bigram list — the oracle's list(k*logp ORDER BY w1,
    # w2) folds the same multiset in the same order, so avg_logp is
    # bit-identical across engines AND across runs. r10: the fold
    # runs map-side in _bigram_scores_arrow against the broadcast
    # model (_bigram_fold_expr is the pinned bit-exactness
    # reference); the model collect is vocabulary-bounded — the
    # KenLM-held-per-worker shape.
    model = {(r["w1"], r["w2"]): r["logp"] for r in probs.collect()}
    return _bigram_scores_arrow(docs.select("doc_id", "text"), model).select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.round(F.col("s") / F.col("n_bigrams"), 4).alias("avg_logp"),
    )


@register(
    "text_bigram_logprob",
    tags=("text", "lm", "llm_pipeline"),
    oracle=BIGRAM_SCORES_SQL,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit bigram language-model scoring — the KenLM-style
    quality signal LLM curation pipelines use (CCNet/Gopher score
    documents by LM perplexity; the distributed restatement fits the
    LM on the corpus itself): P(w2|w1) = c(w1,w2) / c(w1 as prefix),
    and each doc's score is the occurrence-weighted mean log
    probability of its bigrams. Low avg_logp = improbable token
    sequences (noise, boilerplate mash, wrong-language) — the ranking
    a perplexity filter thresholds on. Docs with fewer than two
    tokens carry no bigrams and are absent by definition.

    Scale shape: bigram extraction is row-local (one explode); the
    MODEL is two hash aggregations whose map-side partial pass
    collapses the hot stopword-bigram keys before they shuffle, so
    the model table is bounded by distinct bigrams (vocabulary-, not
    corpus-sized). Scoring is ONE join of the instance stream
    against the model on the bigram key (model side broadcastable
    under AQE at gate scale) and ONE shuffle — the per-doc rollup.
    An earlier shape pre-grouped instances by (doc, bigram) "to
    compress before the join", but on natural text per-doc bigram
    repetition is low, so that grouping was a second full-size
    shuffle that compressed nothing (measured 16.8 s -> 8.9 s at the
    50k-doc scale smoke when removed); the per-doc rollup already
    combines map-side. At 100 TB the model would be fit once,
    written bucketed by (w1, w2), and reused across scoring runs —
    the join-back is then co-located.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_doc_scores(docs)


@register(
    "text_perplexity_buckets",
    tags=("text", "lm", "curation", "llm_pipeline"),
    oracle=f"""
WITH scores AS (
    {BIGRAM_SCORES_SQL}
), su AS (
    SELECT s.doc_id, doc.lang, s.avg_logp,
           CAST(round(s.avg_logp * 10000) AS BIGINT) AS score_u
    FROM scores s JOIN documents doc ON doc.doc_id = s.doc_id
), gs AS (
    SELECT lang, score_u, CAST(count(*) AS BIGINT) AS c
    FROM su GROUP BY 1, 2
), cum AS (
    SELECT lang, score_u,
           sum(c) OVER (PARTITION BY lang ORDER BY score_u DESC) AS cum,
           sum(c) OVER (PARTITION BY lang) AS n_lang
    FROM gs
), cuts AS (
    SELECT lang,
           max(CASE WHEN 3 * cum >= n_lang THEN score_u END) AS t_head,
           max(CASE WHEN 3 * cum >= 2 * n_lang THEN score_u END) AS t_mid
    FROM cum GROUP BY lang
)
SELECT su.doc_id, su.lang, su.avg_logp,
       CASE WHEN su.score_u >= c.t_head THEN 'head'
            WHEN su.score_u >= c.t_mid THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM su JOIN cuts c ON c.lang = su.lang
""",
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): every
    document is assigned to the head / middle / tail THIRD of its
    language's LM-score distribution — the split CCNet uses to keep
    head+middle and drop (or down-weight) tail. The LM signal is the
    corpus-fit bigram avg_logp of :func:`text_bigram_logprob` (higher
    = more probable = lower perplexity = "head").

    The cutoffs are VALUE thresholds, not rank positions: per
    language, t_head is the largest 4-digit-fixed score at which the
    cumulative (descending) doc count reaches ceil(n/3), and ties on
    the threshold all go to the better bucket — so membership depends
    only on a document's own score and two per-language constants,
    never on a global ordering of documents.

    Scale shape: this is why the value-threshold formulation wins at
    100 TB — a rank-based ntile needs a per-language TOTAL SORT of
    every document, while the thresholds here come from a cumulative
    window over the (lang, score_u) HISTOGRAM: at most 20001 distinct
    4-digit scores per language regardless of corpus size (the same
    aggregate-then-window-on-small move as curation_token_budget's
    grid walk). Scoring shuffles once to fit the LM (see
    text_bigram_logprob), the histogram shuffle carries counters, and
    the final bucket assignment is a broadcast join of per-language
    (t_head, t_mid) against the score stream — row-local. Documents
    with fewer than two tokens carry no LM score and are absent, as
    in the underlying query.
    """
    docs = load_table(spark, sf_dir, "documents")
    scores = bigram_doc_scores(docs.select("doc_id", "text"))
    su = scores.join(docs.select("doc_id", "lang"), "doc_id").withColumn(
        "score_u", F.round(F.col("avg_logp") * 10000).cast("bigint")
    )
    gs = su.groupBy("lang", "score_u").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("score_u").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cum = gs.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n_lang", F.sum("c").over(w_all)
    )
    cuts = cum.groupBy("lang").agg(
        F.max(
            F.when(3 * F.col("cum") >= F.col("n_lang"), F.col("score_u"))
        ).alias("t_head"),
        F.max(
            F.when(3 * F.col("cum") >= 2 * F.col("n_lang"), F.col("score_u"))
        ).alias("t_mid"),
    )
    return su.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "avg_logp",
        F.when(F.col("score_u") >= F.col("t_head"), F.lit("head"))
        .when(F.col("score_u") >= F.col("t_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


# Minimum bigram occurrences before a pair can be called a
# collocation — the word2vec phrase-mining discount threshold role:
# below it, PMI is dominated by chance co-occurrence of rare words.
COLLOC_MIN_COUNT = 5


@register(
    "text_collocations",
    tags=("text", "lm", "llm_pipeline"),
    oracle=f"""
WITH docs AS (
    SELECT doc_id, text FROM documents WHERE length(text) > 0
), toks AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM docs
), uni AS (
    SELECT w, CAST(count(*) AS BIGINT) AS n1 FROM toks GROUP BY w
), tot AS (
    SELECT CAST(sum(n1) AS DOUBLE) AS nt FROM uni
), w AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM docs
), inst AS (
    SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2
    FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
), big AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2 FROM inst GROUP BY 1, 2
), btot AS (
    SELECT CAST(sum(n2) AS DOUBLE) AS mt FROM big
)
SELECT b.w1, b.w2, b.n2,
       round(ln((CAST(b.n2 AS DOUBLE) * t.nt * t.nt)
                / (bt.mt * CAST(u1.n1 AS DOUBLE) * CAST(u2.n1 AS DOUBLE))),
             4) + 0.0 AS pmi
FROM big b
CROSS JOIN tot t
CROSS JOIN btot bt
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
WHERE b.n2 >= {COLLOC_MIN_COUNT}
""",
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining — the phrase-detection pass tokenizer /
    vocab builders run before training (word2vec-style phrase scoring
    is the discounted variant of the same statistic): for every
    adjacent word pair seen at least COLLOC_MIN_COUNT times,
    ``pmi = ln(p(w1,w2) / (p(w1) * p(w2)))`` with the joint estimated
    over bigram instances and the marginals over token instances.
    High-PMI pairs are the multi-word units worth a single vocab slot.

    Scale shape: token and bigram extraction are row-local explodes;
    both count tables aggregate with map-side partial combine, so the
    shuffled rows are vocabulary-scaled, not corpus-scaled. The two
    scalar totals ride a one-row broadcast cross join (the bounded
    pattern relational.py's subquery scalars use). The marginal
    join-back runs on the bigram table — already >= MIN_COUNT
    filtered, so its skew ceiling is the vocabulary's Zipf head, and
    the unigram side is broadcastable under AQE. The PMI argument is
    arranged identically in both engines (left-associated double
    products) so ln sees bit-identical inputs.
    """
    from go_integ_spark.functions.cache import cached_persist

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    # cached_persist both count tables: the returned plan references
    # uni three times (u1, u2, the tot scalar) and big twice (btot,
    # the output rows), and Catalyst does not share subplans across
    # DataFrame references — the r13 before-plan carried FIVE
    # corpus scan+explode subtrees for what is two passes of real
    # work (guide §1.2/§2.4: don't recompute what you already have).
    # Both frames are vocabulary-sized (unigram / bigram counts), so
    # the persist is bounded at any corpus scale; the corpus itself
    # is now tokenized exactly once per n-gram order.
    uni = cached_persist(
        "text_colloc_uni",
        docs,
        lambda: toks.groupBy("w").agg(F.count(F.lit(1)).alias("n1")),
    )
    tot = uni.agg(F.sum("n1").cast("double").alias("nt"))
    inst = (
        docs.withColumn("ws", F.split("text", " "))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), i ->"
                    " struct(element_at(ws, i) AS w1,"
                    " element_at(ws, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    big = cached_persist(
        "text_colloc_big",
        docs,
        lambda: inst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2")),
    )
    btot = big.agg(F.sum("n2").cast("double").alias("mt"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("n1").alias("n1a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n1").alias("n1b"))
    pmi = F.log(
        (F.col("n2").cast("double") * F.col("nt") * F.col("nt"))
        / (F.col("mt") * F.col("n1a").cast("double") * F.col("n1b").cast("double"))
    )
    return (
        big.filter(F.col("n2") >= COLLOC_MIN_COUNT)
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .join(u1, "w1")
        .join(u2, "w2")
        # +0.0 normalizes IEEE signed zero: a tiny-negative PMI rounds
        # to -0.0 in one engine and +0.0 in the other; -0.0 + 0.0 is
        # +0.0 everywhere, so the value hash agrees.
        .select("w1", "w2", "n2", (F.round(pmi, 4) + F.lit(0.0)).alias("pmi"))
    )


# BPE merge rounds learned by text_bpe_vocab. Real tokenizers learn
# 30k-100k; 12 keeps the gate query bounded while exercising the full
# iterate-count-merge loop.
BPE_MERGES = 12
# Training-vocabulary cap: the merge loop state is bounded O(cap)
# regardless of corpus size (the min-frequency pruning every real
# tokenizer trainer applies).
BPE_VOCAB_CAP = 50_000


def _bpe_apply_merge(syms: list, left: str, right: str) -> list:
    """One greedy left-to-right BPE merge pass over a symbol list —
    the exact scan order every BPE implementation uses (overlapping
    occurrences resolve leftmost-first: 'aaa' under (a,a) -> [aa, a]).
    Shared by the Spark kernel and the pure-Python reference in
    tests/test_text_lm.py, so the two can only diverge in
    orchestration, not merge semantics."""
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


# Symbol-boundary separator for the BPE oracle's string encoding.
# \x1f (ASCII unit separator) never appears in the corpus (pinned by
# tests/test_text_lm.py::test_bpe_oracle_separator_absent).
_BPE_SEP = "\x1f"


def _bpe_oracle() -> str:
    """Full vocab-learning oracle: the shared CTE chain plus the
    merge-table SELECT."""
    rounds = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS merge_rank, l AS \"left\","
        f" r2 AS \"right\", pc AS pair_count FROM b{r}"
        for r in range(BPE_MERGES)
    )
    return _bpe_ctes() + "\n" + rounds


def _bpe_ctes() -> str:
    """Statically-unrolled DuckDB twin of the BPE merge loop (CTE
    chain only — ``_bpe_oracle`` appends the merge-table SELECT and
    ``_bpe_apply_oracle`` appends the tokenizer-application chain).

    The loop state (word -> symbol list) is encoded as a string with
    every symbol WRAPPED in double separators: ['x','a'] ->
    '\\x1f\\x1fx\\x1f\\x1fa\\x1f\\x1f'. Applying merge (l, r) greedily
    leftmost-first is then EXACTLY one non-overlapping string
    ``replace`` of '\\x1fl\\x1f\\x1fr\\x1f' with '\\x1flr\\x1f': each match
    consumes the inner half of each boundary pair, so adjacent merges
    ('x a a a a y' -> x aa aa y) still fire while prefix/suffix
    near-matches ('a' + 'ab') cannot ('aaa' -> [aa, a], leftmost
    rule, verified against _bpe_apply_merge by the pytest pin). With
    the merge count a fixed constant the whole iterate-count-merge
    loop unrolls into {BPE_MERGES} chained CTE rounds — a full value
    oracle for a query that would otherwise be rows-only.
    """
    s, s2 = _BPE_SEP, _BPE_SEP * 2
    ctes = [
        f"""
WITH words AS (
    SELECT w, CAST(count(*) AS BIGINT) AS cnt
    FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ) WHERE length(w) > 0
    GROUP BY w
    ORDER BY cnt DESC, w
    LIMIT {BPE_VOCAB_CAP}
), v0 AS MATERIALIZED (
    SELECT '{s2}' || array_to_string(string_split(w, ''), '{s2}')
               || '{s2}' AS st,
           cnt
    FROM words
)"""
    ]
    for r in range(BPE_MERGES):
        ctes.append(
            f""", p{r} AS (
    SELECT sy[t.i] AS l, sy[t.i + 1] AS r2,
           CAST(sum(cnt) AS BIGINT) AS pc
    FROM (
        SELECT list_filter(string_split(st, '{s2}'), x -> x <> '') AS sy,
               cnt
        FROM v{r}
    ), unnest(generate_series(1, len(sy) - 1)) AS t(i)
    GROUP BY 1, 2
), b{r} AS MATERIALIZED (
    SELECT l, r2, pc FROM p{r} ORDER BY pc DESC, l, r2 LIMIT 1
), v{r + 1} AS MATERIALIZED (
    -- LEFT JOIN ON TRUE + coalesce: when b{r} is EMPTY (the corpus
    -- fully merged in < BPE_MERGES rounds) the round is a no-op,
    -- matching the Spark side's early break; a CROSS JOIN would
    -- collapse every later round to zero rows
    SELECT coalesce(replace(v.st, '{s}' || b.l || '{s2}' || b.r2 || '{s}',
                            '{s}' || b.l || b.r2 || '{s}'), v.st) AS st,
           v.cnt
    FROM v{r} v LEFT JOIN b{r} b ON TRUE
)"""
        )
    return "".join(ctes)


@register(
    "text_bpe_vocab",
    tags=("text", "tokenizer", "iterative", "llm_pipeline"),
    oracle=_bpe_oracle(),
)
def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding vocabulary learning — the tokenizer-training
    pass of an LLM data pipeline. Classic BPE trains on the WORD
    FREQUENCY table, not corpus positions: ONE corpus-scaled
    aggregation (map-side combined) produces (word, count); the merge
    loop then needs only that table. Output: the learned merge table
    (rank, left, right, pair_count) — the tokenizer's merges.txt.

    Scale contract: the corpus is touched exactly once. The merge
    loop runs driver-side over the top-``BPE_VOCAB_CAP`` word types
    by count (deterministic tie-break on the word) — a BOUNDED O(cap)
    collect, never O(corpus): capping the training vocabulary is what
    production tokenizer trainers do anyway (min-frequency pruning /
    training-corpus caps), and it is what keeps the loop's state
    independent of corpus size. A first version iterated the merge
    loop as 12 distributed jobs over the vocab table; at gate scale
    that was ~46 s of pure job overhead for a table of a few thousand
    rows — the count is the only part of this problem that is big.
    """
    return spark.createDataFrame(
        _bpe_learn_merges(spark, sf_dir),
        "merge_rank int, left string, right string, pair_count bigint",
    )


def _bpe_learn_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """Run the bounded driver-side merge loop (see ``text_bpe_vocab``
    scale contract) and return the learned merge table — shared by
    the vocab query and the tokenizer-application query so both use
    the identical tokenizer."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") > 0
    )
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(BPE_VOCAB_CAP)
        .collect()
    )
    vocab: dict[tuple, int] = {}
    for r in top:
        key = tuple(r["w"])
        vocab[key] = vocab.get(key, 0) + int(r["cnt"])

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(BPE_MERGES):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + cnt
                )
        if not pairs:
            break
        (left, right), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, pc))
        merged: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            key = tuple(_bpe_apply_merge(list(syms), left, right))
            merged[key] = merged.get(key, 0) + cnt
        vocab = merged
    return merges


# Gopher quality-rule bounds (Rae et al. 2021, table A1 — the public
# rule set Dolma/RefinedWeb-style pipelines reuse). Word-count floor
# lowered 50 -> 20 for this corpus's short synthetic docs; every
# other bound is the published value.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
_GOPHER_STOPS = "the|be|to|of|and|that|have|with"


@register(
    "text_gopher_quality",
    tags=("text", "quality", "llm_pipeline"),
    oracle=f"""
WITH m AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
               AS n_nonws_chars,
           CAST(length(text) - length(replace(text, '#', ''))
                + (length(text) - length(replace(text, '...', ''))) / 3
                AS BIGINT) AS n_symbols,
           CAST(len(regexp_extract_all(text, '\\S*[a-zA-Z]\\S*')) AS BIGINT)
               AS n_alpha_words,
           CAST(len(regexp_extract_all(lower(text),
                '\\b({_GOPHER_STOPS})\\b')) AS BIGINT) AS n_stop_hits
    FROM documents
)
SELECT doc_id, n_words,
       round(n_nonws_chars / greatest(n_words, 1)::DOUBLE, 4)
           AS mean_word_len,
       round(n_symbols / greatest(n_words, 1)::DOUBLE, 4) AS symbol_ratio,
       round(n_alpha_words / greatest(n_words, 1)::DOUBLE, 4) AS alpha_frac,
       n_stop_hits,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND n_nonws_chars / greatest(n_words, 1)::DOUBLE
            BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN}
        AND n_symbols / greatest(n_words, 1)::DOUBLE
            <= {GOPHER_MAX_SYMBOL_RATIO}
        AND n_alpha_words / greatest(n_words, 1)::DOUBLE
            >= {GOPHER_MIN_ALPHA_FRAC}
        AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}) AS gopher_ok
FROM m
""",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021) — the
    published heuristic gate web-scale pipelines (Gopher, Dolma,
    RefinedWeb variants) apply before any model-based scoring: word
    count bounds, mean word length bounds, symbol-to-word ratio
    (# and ellipsis), fraction of words containing an alphabetic
    character, and a minimum stop-word hit count. Emits the metrics
    AND the composite verdict so downstream curation can re-weight
    instead of hard-dropping.

    All five signals are integer token/char counts from
    ``regexp_extract_all`` / ``replace`` projections — scan-bound
    row-local JVM expressions (no UDF, no shuffle), identical in
    DuckDB because the patterns stay inside the Java-regex/RE2 common
    subset (character classes, alternation, ``\\b``).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
    ).cast("bigint")
    n_nonws = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("bigint")
    n_symbols = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
        + (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
        )
        / F.lit(3)
    ).cast("bigint")
    n_alpha = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"\S*[a-zA-Z]\S*"), 0)
    ).cast("bigint")
    n_stops = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(rf"\b({_GOPHER_STOPS})\b"), 0
        )
    ).cast("bigint")
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = n_nonws / nw
    sym_ratio = n_symbols / nw
    alpha_frac = n_alpha / nw
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_ratio"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        n_stops.alias("n_stop_hits"),
        (
            n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & mean_wl.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
            & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO)
            & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
            & (n_stops >= GOPHER_MIN_STOP_HITS)
        ).alias("gopher_ok"),
    )


# --- Hashed linear quality classifier --------------------------------

# fastText-style hashed bag-of-words geometry: feature dim and the
# per-bucket weight range (integer milli-units, expectation centred
# so random text scores ~0).
CLF_BUCKETS = 1024
CLF_WEIGHT_MOD = 2001  # weights in [0, 2000], mean 1000
CLF_WEIGHT_CENTER = 1000


@register(
    "text_classifier_score",
    tags=("text", "quality", "classifier", "llm_pipeline"),
    oracle=f"""
WITH w AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
    FROM documents
), s AS (
    SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(list_transform(ws, x ->
               (('0x' || substr(md5('w:' || CAST(
                   (('0x' || substr(md5(x), 1, 15))::BIGINT) % {CLF_BUCKETS}
               AS VARCHAR)), 1, 15))::BIGINT) % {CLF_WEIGHT_MOD}
           )), 0) AS BIGINT) AS sum_u
    FROM w
)
SELECT doc_id, n_words,
       (sum_u // greatest(n_words, 1)) - {CLF_WEIGHT_CENTER} AS score_u,
       ((sum_u // greatest(n_words, 1)) - {CLF_WEIGHT_CENTER} >= 0) AS keep
FROM s
""",
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality-filter slot — the fastText-classifier pass
    modern curation stacks (CCNet's LM-vs-wiki filter, DCLM's
    fastText keep/drop, FineWeb-Edu's educational scorer) run after
    the rule-based gates: a hashed bag-of-words linear model scores
    every document and the score (plus a keep verdict at the 0
    threshold) drives filtering or mix re-weighting.

    The weights here are DETERMINISTIC HASH-DERIVED stand-ins (bucket
    = h60(word) % {CLF_BUCKETS}, weight = h60('w:' bucket) %
    {CLF_WEIGHT_MOD}, centred at {CLF_WEIGHT_CENTER}) so the full scoring
    path — tokenize, hash to buckets, per-instance weight lookup,
    mean-pool, threshold — is gate-checkable bit-for-bit; a trained
    model drops into the same plumbing by replacing the weight
    expression with a broadcast bucket->weight map lookup
    (element_at on a {CLF_BUCKETS}-entry literal map, still row-local).
    All arithmetic is int64 (instance-weight sum, one floor division
    by the word count — operands kept non-negative so Spark's
    truncating div and DuckDB's flooring // agree).

    Scale shape: a single scan-bound projection — the tokenize/hash/
    sum runs inside one JVM ``aggregate`` HOF per row, zero
    shuffles, zero UDFs, zero driver state. This is the 100 TB
    filter shape: classifier inference as a map over the corpus,
    embarrassingly parallel across executors.
    """
    from go_integ_spark.functions.hashing import h60_expr

    bucket = f"pmod({h60_expr('x')}, {CLF_BUCKETS})"
    keyed = f"concat('w:', cast({bucket} as string))"
    weight = f"pmod({h60_expr(keyed)}, {CLF_WEIGHT_MOD})"
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("ws"),
    ).select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        F.expr(
            f"aggregate(ws, 0L, (acc, x) -> acc + {weight})"
        ).alias("sum_u"),
    )
    score_u = F.expr("sum_u div greatest(n_words, 1L)") - CLF_WEIGHT_CENTER
    return s.select(
        "doc_id",
        "n_words",
        score_u.alias("score_u"),
        (score_u >= 0).alias("keep"),
    )


# BM25 retrieval constants (Robertson/Sparck-Jones; Lucene's
# always-positive idf variant). Query terms are fixed corpus words so
# the gate query is deterministic; a real retrieval service binds
# them per request.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_N = 10
BM25_TERMS = ["spark", "join", "vector", "window", "data"]


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    # Spaces are DOUBLED before padding so adjacent occurrences of a
    # term never share a delimiter space — the non-overlapping
    # length-delta count is then exact for runs like 'data data data'.
    return f"""
WITH docs AS (
    SELECT doc_id, ' ' || replace(text, ' ', '  ') || ' ' AS p,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents WHERE length(text) > 0
), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS sdl
    FROM docs
), terms AS (
    SELECT unnest([{terms}]) AS term
), tf AS (
    SELECT t.term, d.doc_id, d.dl,
           CAST((length(d.p) - length(replace(d.p, ' ' || t.term || ' ', '')))
                / (length(t.term) + 2) AS BIGINT) AS tf
    FROM docs d CROSS JOIN terms t
), hit AS (
    SELECT * FROM tf WHERE tf > 0
), df AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM hit GROUP BY term
), scored AS (
    SELECT h.term, h.doc_id,
           round(
               ln(1.0 + (CAST(t.nd - f.df AS DOUBLE) + 0.5)
                        / (CAST(f.df AS DOUBLE) + 0.5))
               * (CAST(h.tf AS DOUBLE) * ({BM25_K1} + 1.0))
               / (CAST(h.tf AS DOUBLE)
                  + {BM25_K1} * (1.0 - {BM25_B}
                                 + {BM25_B} * (CAST(h.dl AS DOUBLE) * CAST(t.nd AS DOUBLE)
                                               / CAST(t.sdl AS DOUBLE)))),
               4) + 0.0 AS bm25
    FROM hit h JOIN df f USING (term) CROSS JOIN tot t
)
SELECT term, doc_id, bm25, CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY term ORDER BY bm25 DESC, doc_id
    ) AS rn FROM scored
)
WHERE rn <= {BM25_TOP_N}
"""


@register(
    "text_bm25_topk",
    tags=("text", "retrieval", "llm_pipeline"),
    oracle=_bm25_oracle(),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed query-term set — the lexical
    half of a retrieval-augmented pipeline (the dense half is the ANN
    family). ``idf`` is Lucene's always-positive
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; the tf saturation uses
    k1=1.2, b=0.75 with document-length normalization against the
    corpus mean.

    Scale shape: term frequency is a LENGTH-DELTA projection on the
    space-doubled padded text (doubling makes adjacent occurrences
    non-overlapping, so the count is exact; one replace per query
    term, JVM codegen) — the
    corpus is never exploded to tokens, so the per-term row stream is
    only the matching documents. Document frequency aggregates those
    hits (map-side combined, |terms| x |docs| worst case but
    hit-filtered first); the two corpus scalars (N, sum dl) ride a
    one-row broadcast. Ranking runs on the ROUNDED score with a
    doc_id tie-break so cross-engine float noise below 1e-4 cannot
    reorder the cut, and the final top-k is a per-term window over
    hit rows only.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.concat(
                F.lit(" "),
                F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
                F.lit(" "),
            ).alias("p"),
            F.size(F.split("text", " ")).cast("bigint").alias("dl"),
        )
    )
    tot = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("dl").cast("bigint").alias("sdl"),
    )
    terms = F.array(*[F.lit(t) for t in BM25_TERMS])
    hit = (
        docs.select(
            "doc_id",
            "p",
            "dl",
            F.explode(terms).alias("term"),
        )
        .withColumn(
            "tf",
            (
                (
                    F.length("p")
                    - F.length(
                        F.replace(
                            F.col("p"),
                            F.concat(F.lit(" "), F.col("term"), F.lit(" ")),
                        )
                    )
                )
                / (F.length("term") + F.lit(2))
            ).cast("bigint"),
        )
        .filter(F.col("tf") > 0)
        .select("term", "doc_id", "dl", "tf")
    )
    df_ = hit.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + ((F.col("nd") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    denom = F.col("tf").cast("double") + F.lit(BM25_K1) * (
        F.lit(1.0)
        - F.lit(BM25_B)
        + F.lit(BM25_B)
        # per-operand double cast: the int64 product dl*nd wraps once
        # n_docs * doc_len passes 2^63 (one 9M-token doc at 1e12 docs)
        * (
            F.col("dl").cast("double")
            * F.col("nd").cast("double")
            / F.col("sdl").cast("double")
        )
    )
    scored = (
        hit.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "doc_id",
            (
                F.round(
                    idf * (F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)) / denom,
                    4,
                )
                + F.lit(0.0)
            ).alias("bm25"),
        )
    )
    # salted_topk (not a plain 5-partition window): each fixed term
    # would otherwise sort its ENTIRE hit set in one task — the
    # fixed-cardinality-partition trap text_heavy_hitters documents —
    # and row_number's int32 counter caps a term at 2^31 hits
    from go_integ_spark.operators.similarity import salted_topk

    out = salted_topk(
        scored, "term", [F.desc("bm25"), F.asc("doc_id")], BM25_TOP_N
    )
    return out.select(
        "term", "doc_id", "bm25", F.col("rn").cast("int").alias("rank")
    )


def _bpe_apply_oracle() -> str:
    """Extend the unrolled vocab-learning CTE chain with a tokenizer
    APPLICATION chain: every distinct word type is encoded with the
    same double-separator scheme and pushed through the 12 learned
    merges as chained non-overlapping replaces (d0..d{n}); per-doc
    token counts then join word-type token counts back to the
    (doc_id, word, count) table — the oracle never tokenizes a word
    type twice."""
    s, s2 = _BPE_SEP, _BPE_SEP * 2
    parts = [_bpe_ctes()]
    parts.append(
        f""", wdoc AS (
    SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ) WHERE length(w) > 0
    GROUP BY doc_id, w
), types AS (
    SELECT DISTINCT w FROM wdoc
), d0 AS (
    SELECT w, '{s2}' || array_to_string(string_split(w, ''), '{s2}')
               || '{s2}' AS st
    FROM types
)"""
    )
    for r in range(BPE_MERGES):
        parts.append(
            f""", d{r + 1} AS (
    SELECT d.w,
           coalesce(replace(d.st, '{s}' || b.l || '{s2}' || b.r2 || '{s}',
                            '{s}' || b.l || b.r2 || '{s}'), d.st) AS st
    FROM d{r} d LEFT JOIN b{r} b ON TRUE
)"""
        )
    parts.append(
        f""", ntok AS (
    SELECT w, CAST(len(list_filter(string_split(st, '{s2}'), x -> x <> ''))
                   AS BIGINT) AS n_sym
    FROM d{BPE_MERGES}
)
SELECT wd.doc_id,
       CAST(sum(wd.cnt) AS BIGINT) AS n_words,
       CAST(sum(wd.cnt * t.n_sym) AS BIGINT) AS n_tokens,
       CAST((sum(wd.cnt * t.n_sym) * 10000) // sum(wd.cnt) AS BIGINT)
           AS fert_bp
FROM wdoc wd JOIN ntok t USING (w)
GROUP BY wd.doc_id"""
    )
    return "".join(parts)


@register(
    "text_bpe_apply",
    tags=("text", "tokenizer", "llm_pipeline"),
    oracle=_bpe_apply_oracle(),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE tokenizer to the corpus and report
    per-document token counts and fertility (tokens per word, basis
    points) — the pass that prices a corpus in training tokens and
    flags languages the tokenizer fragments. Uses the identical merge
    table ``text_bpe_vocab`` emits (shared learner).

    Scale shape: the corpus aggregates once to (doc_id, word, count)
    with map-side combine — tokenization then runs per WORD TYPE, not
    per instance. The merge chain itself is 12 chained JVM
    ``replace`` calls over the double-separator symbol encoding (the
    same encoding trick the oracle unrolls), i.e. whole-stage-codegen
    string ops with the 12 learned (left, right) pairs inlined as
    literals from the bounded driver loop — no UDF, no Python in the
    hot path, and the only corpus-scaled exchange is the final
    group-back to documents carrying integers.
    """
    s, s2 = _BPE_SEP, _BPE_SEP * 2
    merges = _bpe_learn_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wdoc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    types = wdoc.select("w").distinct()
    st = F.concat(
        # (?s): Java '.' skips line terminators by default, so a
        # newline inside a word would silently merge into the next
        # symbol while the oracle's per-char split keeps it separate
        F.lit(s2), F.regexp_replace(F.col("w"), "(?s)(.)", f"$1{s2}")
    )
    for _, left, right, _ in merges:
        st = F.replace(
            st,
            F.lit(f"{s}{left}{s2}{right}{s}"),
            F.lit(f"{s}{left}{right}{s}"),
        )
    ntok = types.select(
        "w",
        F.size(
            F.filter(F.split(st, s2), lambda x: x != F.lit(""))
        ).cast("bigint").alias("n_sym"),
    )
    return (
        wdoc.join(ntok, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sym")).alias("n_tokens"),
            F.expr("cast(sum(cnt * n_sym) * 10000 div sum(cnt) as bigint)")
                .alias("fert_bp"),
        )
    )


# --- Gopher repetition rules (duplicated n-gram coverage) -------------

# The two representative repetition signals from Rae et al. 2021
# table A1 that text_repetition_ratio's distinct/total words proxy
# does NOT capture: how much of the document the single heaviest
# 2-gram covers, and how much of it sits inside 3-grams that occur
# more than once. Bounds are the published ones for these two rows.
DUP_TOP2_MAX_SHARE = 0.20
DUP_3GRAM_MAX_FRAC = 0.18


def _run_cover_exprs(sorted_arr: str) -> tuple[str, str]:
    """SQL exprs (top_cover, dup_cover) over a SORTED gram array:
    run-length encode adjacent equal grams, then cover = run_count *
    gram_char_len. top = max cover over all runs; dup = sum of covers
    over runs longer than 1. Pure integer HOF arithmetic, zero
    shuffle. ANSI-safe: the run-boundary filter scans sequence(2, m)
    so ``i - 1`` never hits index 0, and the sequence() call is
    CASE-guarded for single-gram arrays — sequence(2, 1) builds the
    DESCENDING [2, 1] and its element_at(s, 2) throws under ANSI
    (the injected-fixture test covers the 2-word-doc case the gate
    corpus never produces)."""
    s = sorted_arr
    starts = (
        f"concat(array(1), CASE WHEN size({s}) >= 2 THEN "
        f"filter(sequence(2, size({s})), "
        f"i -> element_at({s}, i) != element_at({s}, i - 1)) "
        f"ELSE cast(array() AS array<int>) END)"
    )
    covers = (
        f"zip_with(st, concat(slice(st, 2, size(st) - 1), "
        f"array(size({s}) + 1)), "
        f"(a, b) -> struct(b - a AS r, "
        f"cast(b - a AS bigint)"
        f" * length(element_at({s}, a)) AS cov))"
    )
    wrapped = f"transform(array(struct({starts} AS dummy)), x -> x.dummy)"
    # Bind starts once via a lateral-style nested HOF: outer transform
    # over a 1-element array carrying the starts array as `st`.
    top = (
        f"element_at(transform({wrapped}, st -> "
        f"array_max(transform({covers}, c -> c.cov))), 1)"
    )
    dup = (
        f"element_at(transform({wrapped}, st -> "
        f"aggregate({covers}, 0L, (acc, c) -> "
        f"acc + IF(c.r > 1, c.cov, 0L))), 1)"
    )
    return top, dup


@register(
    "text_dup_ngram_fraction",
    tags=("text", "quality", "llm_pipeline"),
    oracle=f"""
WITH w AS (
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           string_split(text, ' ') AS ws
    FROM documents
), g2 AS (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
    FROM w, unnest(generate_series(1, len(ws) - 1)) t(i)
    WHERE len(ws) >= 2
), c2 AS (
    SELECT doc_id, CAST(max(c * length(g)) AS BIGINT) AS top2_cover
    FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
    GROUP BY doc_id
), g3 AS (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
    FROM w, unnest(generate_series(1, len(ws) - 2)) t(i)
    WHERE len(ws) >= 3
), c3 AS (
    SELECT doc_id,
           CAST(coalesce(sum(c * length(g)) FILTER (c > 1), 0) AS BIGINT)
               AS dup3_cover
    FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g)
    GROUP BY doc_id
)
SELECT w.doc_id, w.n_chars,
       coalesce(top2_cover, 0) AS top2_cover,
       coalesce(dup3_cover, 0) AS dup3_cover,
       round(least(coalesce(top2_cover, 0) / greatest(w.n_chars, 1)::DOUBLE,
                   1.0), 4) AS top2_share,
       round(least(coalesce(dup3_cover, 0) / greatest(w.n_chars, 1)::DOUBLE, 1.0), 4)
           AS dup3_frac,
       (round(least(coalesce(top2_cover, 0) / greatest(w.n_chars, 1)::DOUBLE,
                    1.0), 4)
            <= {DUP_TOP2_MAX_SHARE}
        AND round(least(coalesce(dup3_cover, 0) / greatest(w.n_chars, 1)::DOUBLE, 1.0), 4)
            <= {DUP_3GRAM_MAX_FRAC}) AS repetition_ok
FROM w
LEFT JOIN c2 ON c2.doc_id = w.doc_id
LEFT JOIN c3 ON c3.doc_id = w.doc_id
""",
)
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021): the character
    coverage of the heaviest word 2-gram (boilerplate headers/menus
    repeat one phrase) and of all word 3-grams occurring more than
    once (spun/templated text repeats many phrases a little), each
    as a fraction of document characters, plus the composite verdict
    at the published bounds.

    Scale shape: the whole computation is ROW-LOCAL — grams are
    sorted per document and run-length encoded with integer HOF
    arithmetic, so the query is a zero-shuffle scan projection. The
    oracle computes the identical counts via the conventional
    explode + GROUP BY (doc_id, gram) route, which is also the Spark
    fallback when documents are too large to sort in one row buffer;
    counts agree by construction, and every signal stays in exact
    int64 until the one final division (rounded 4dp on both sides).
    """
    docs = load_table(spark, sf_dir, "documents")
    top2 = _run_cover_exprs("s2")[0]
    dup3 = _run_cover_exprs("s3")[1]
    grams2 = (
        "array_sort(transform(sequence(1, size(ws) - 1), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))"
    )
    grams3 = (
        "array_sort(transform(sequence(1, size(ws) - 2), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1), "
        "' ', element_at(ws, i + 2))))"
    )
    base = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.split("text", " ").alias("ws"),
    )
    covered = base.select(
        "doc_id",
        "n_chars",
        F.when(F.size("ws") >= 2, F.expr(grams2))
        .otherwise(F.expr("array()").cast("array<string>"))
        .alias("s2"),
        F.when(F.size("ws") >= 3, F.expr(grams3))
        .otherwise(F.expr("array()").cast("array<string>"))
        .alias("s3"),
    ).select(
        "doc_id",
        "n_chars",
        F.when(F.size("s2") >= 1, F.expr(top2)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("top2_cover"),
        F.when(F.size("s3") >= 1, F.expr(dup3)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("dup3_cover"),
    )
    nc = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    top2_share = F.round(F.least(F.col("top2_cover") / nc, F.lit(1.0)), 4)
    dup3_frac = F.round(
        F.least(F.col("dup3_cover") / nc, F.lit(1.0)), 4
    )
    return covered.select(
        "doc_id",
        "n_chars",
        "top2_cover",
        "dup3_cover",
        top2_share.alias("top2_share"),
        dup3_frac.alias("dup3_frac"),
        (
            (top2_share <= DUP_TOP2_MAX_SHARE)
            & (dup3_frac <= DUP_3GRAM_MAX_FRAC)
        ).alias("repetition_ok"),
    )


# --- Language-ID evaluation (confusion metrics) -----------------------

from go_integ_spark.registry import REGISTRY as _REGISTRY  # noqa: E402


def _lang_confusion_oracle() -> str:
    """Composes text_lang_id's committed oracle as a CTE so the
    evaluation's predictions are definitionally the evaluated
    query's — the two can never drift apart."""
    pred = _REGISTRY["text_lang_id"].oracle
    return f"""
WITH pred AS ({pred}
), cells AS (
    SELECT d.lang AS gold, p.pred_lang AS pred, count(*) AS c
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY 1, 2
), cls AS (
    SELECT DISTINCT gold AS lang FROM cells
)
SELECT k.lang,
       CAST(coalesce(sum(c) FILTER (gold = k.lang), 0) AS BIGINT) AS n_gold,
       CAST(coalesce(sum(c) FILTER (gold = k.lang AND pred = k.lang), 0)
            AS BIGINT) AS tp,
       CAST(coalesce(sum(c) FILTER (gold != k.lang AND pred = k.lang), 0)
            AS BIGINT) AS fp,
       CAST(coalesce(sum(c) FILTER (gold = k.lang AND pred != k.lang), 0)
            AS BIGINT) AS fn,
       round(coalesce(sum(c) FILTER (gold = k.lang AND pred = k.lang), 0)
             / nullif(coalesce(sum(c) FILTER (pred = k.lang), 0),
                      0)::DOUBLE, 6) AS precision,
       round(coalesce(sum(c) FILTER (gold = k.lang AND pred = k.lang), 0)
             / nullif(coalesce(sum(c) FILTER (gold = k.lang), 0),
                      0)::DOUBLE, 6) AS recall,
       round(2 * coalesce(sum(c) FILTER (gold = k.lang AND pred = k.lang), 0)
             / nullif(2 * coalesce(sum(c) FILTER (gold = k.lang
                                                  AND pred = k.lang), 0)
                      + coalesce(sum(c) FILTER (gold != k.lang
                                                AND pred = k.lang), 0)
                      + coalesce(sum(c) FILTER (gold = k.lang
                                                AND pred != k.lang), 0),
                      0)::DOUBLE, 6) AS f1
FROM cls k CROSS JOIN cells
GROUP BY k.lang
"""


@register(
    "text_lang_confusion",
    tags=("text", "langid", "eval", "llm_pipeline"),
    oracle=_lang_confusion_oracle(),
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-QA for the language-ID heuristic: per-class
    TP/FP/FN, precision, recall and F1 of ``text_lang_id``'s
    predictions against the corpus's gold ``lang`` column — the
    measurement that decides whether a cheap scan-bound classifier
    is good enough to route a 100 TB corpus, per language.

    The predictions come from the registered ``text_lang_id`` query
    itself (and the oracle composes its committed oracle as a CTE),
    so evaluation and production classifier cannot diverge. All
    metrics are single divisions of exact integer counts (6dp both
    sides, NULL when a class is never predicted).

    Scale shape: predictions are a zero-shuffle projection; the gold
    join is doc_id-aligned (in production the same scan provides
    both columns — here a self-join the optimizer collapses), and the
    per-class conditional counters aggregate map-side to one row per
    language. The tiny class-list cross join runs over the already-
    aggregated confusion-cell frame on BOTH sides (languages x
    cells, never languages x documents).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pred = text_lang_id(spark, sf_dir)
    j = docs.join(pred, "doc_id").select(
        F.col("lang").alias("gold"), F.col("pred_lang").alias("pred")
    )
    cells = j.groupBy("gold", "pred").agg(F.count(F.lit(1)).alias("c"))
    classes = cells.select(F.col("gold").alias("lang")).distinct()
    m = classes.join(F.broadcast(cells), how="cross")
    agg = m.groupBy("lang").agg(
        F.sum(F.when(F.col("gold") == F.col("lang"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_gold"),
        F.sum(
            F.when(
                (F.col("gold") == F.col("lang")) & (F.col("pred") == F.col("lang")),
                F.col("c"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.when(
                (F.col("gold") != F.col("lang")) & (F.col("pred") == F.col("lang")),
                F.col("c"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fp"),
        F.sum(
            F.when(
                (F.col("gold") == F.col("lang")) & (F.col("pred") != F.col("lang")),
                F.col("c"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return agg.select(
        "lang",
        "n_gold",
        "tp",
        "fp",
        "fn",
        F.round(tp / F.nullif((tp + fp).cast("double"), F.lit(0.0)), 6).alias(
            "precision"
        ),
        F.round(tp / F.nullif((tp + fn).cast("double"), F.lit(0.0)), 6).alias(
            "recall"
        ),
        F.round(
            2 * tp / F.nullif((2 * tp + fp + fn).cast("double"), F.lit(0.0)), 6
        ).alias("f1"),
    )


# --- RAKE keyword extraction -----------------------------------------
#
# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
# phrases are maximal stopword-free word runs; each member word is
# scored deg(w)/freq(w) over all candidate occurrences (deg counts
# the full length of every phrase containing w, freq its occurrence
# count), and a phrase scores the sum of its member word scores. The
# fixed-point contract: word scores are (deg * 10000) div freq in
# int64 basis points BEFORE summing, so phrase scores are exact
# integers both engines reproduce bit-for-bit.

RAKE_STOPWORDS = ["the", "a", "and", "of", "is", "to", "in"]
RAKE_MAX_LEN = 4  # RAKE's standard candidate-length cap
RAKE_TOP_N = 20
_RAKE_SEP = "\x02"


def _rake_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(phrase, words array, nw) — one row per candidate occurrence.
    Stopword boundaries are cut with ONE global regexp over the
    space-doubled padded text (doubling gives adjacent stopwords
    their own delimiters — the bm25 trick), entirely JVM codegen."""
    alt = "|".join(RAKE_STOPWORDS)
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    seg = F.regexp_replace(
        F.concat(
            F.lit(" "),
            F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        ),
        f" ({alt}) ",
        f" {_RAKE_SEP} ",
    )
    words = F.filter(
        F.split(F.col("seg"), " "), lambda x: x != F.lit("")
    )
    return (
        docs.select(F.explode(F.split(seg, _RAKE_SEP)).alias("seg"))
        .select(words.alias("ws"))
        .withColumn("nw", F.size("ws"))
        .filter((F.col("nw") >= 1) & (F.col("nw") <= RAKE_MAX_LEN))
        .select(F.array_join("ws", " ").alias("phrase"), "ws", "nw")
    )


def _rake_oracle() -> str:
    alt = "|".join(RAKE_STOPWORDS)
    return f"""
WITH seg AS (
    SELECT regexp_replace(' ' || replace(text, ' ', '  ') || ' ',
                          ' ({alt}) ', ' ' || chr(2) || ' ', 'g') AS s
    FROM documents WHERE length(text) > 0
), occ AS (
    SELECT list_filter(string_split(p, ' '), x -> x <> '') AS ws
    FROM (SELECT unnest(string_split(s, chr(2))) AS p FROM seg)
), cand AS (
    SELECT array_to_string(ws, ' ') AS phrase, ws, len(ws) AS nw
    FROM occ WHERE len(ws) BETWEEN 1 AND {RAKE_MAX_LEN}
), wstat AS (
    -- HUGEINT path: deg(w)*10000 wraps BIGINT once a word's corpus
    -- degree passes ~9.2e14 (Zipf head of a ~1e15-token corpus)
    SELECT w, CAST(sum(nw)::HUGEINT * 10000 // count(*) AS BIGINT) AS score_bp
    FROM (SELECT unnest(ws) AS w, nw FROM cand)
    GROUP BY w
), pocc AS (
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(any_value(nw) AS BIGINT) AS n_words
    FROM cand GROUP BY phrase
), pscore AS (
    SELECT p.phrase, CAST(sum(s.score_bp) AS BIGINT) AS score_bp
    FROM (SELECT DISTINCT phrase, ws FROM cand) p,
         unnest(p.ws) AS t(w)
    JOIN wstat s ON s.w = t.w
    GROUP BY p.phrase
)
SELECT o.phrase, o.n_words, o.n_occurrences, sc.score_bp
FROM pocc o JOIN pscore sc ON sc.phrase = o.phrase
ORDER BY sc.score_bp DESC, o.phrase
LIMIT {RAKE_TOP_N}
"""


@register(
    "text_rake_keywords",
    tags=("text", "keywords", "llm_pipeline"),
    oracle=_rake_oracle(),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level RAKE keywords: the RAKE_TOP_N candidate phrases
    by summed member-word deg/freq scores (exact basis points),
    with phrase length and occurrence counts.

    Scale shape: phrase segmentation is one global regexp over the
    padded text (JVM codegen, no Python); word statistics aggregate
    VOCABULARY-scale rows with map-side combine; phrase scoring joins
    the distinct-phrase set against the word table on the word key.
    The final top-N is Spark's TakeOrderedAndProject — per-partition
    heads then one bounded merge, never a corpus-scale single
    partition; the (score desc, phrase asc) order makes the cut
    deterministic cross-engine.
    """
    cand = _rake_phrases(spark, sf_dir)
    wstat = (
        cand.select(F.explode("ws").alias("w"), "nw")
        .groupBy("w")
        .agg(
            # decimal numerator (oracle twin: HUGEINT): deg(w)*10000
            # wraps int64 once a word's corpus degree passes ~9.2e14
            F.expr(
                "cast(cast(sum(nw) as decimal(38,0)) * 10000"
                " div count(*) as bigint)"
            ).alias("score_bp")
        )
    )
    pocc = cand.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.first("nw").cast("bigint").alias("n_words"),
    )
    pscore = (
        cand.select("phrase", "ws")
        .distinct()
        .select("phrase", F.explode("ws").alias("w"))
        .join(wstat, "w")
        .groupBy("phrase")
        .agg(F.sum("score_bp").cast("bigint").alias("score_bp"))
    )
    return (
        pocc.join(pscore, "phrase")
        .select("phrase", "n_words", "n_occurrences", "score_bp")
        .orderBy(F.desc("score_bp"), F.asc("phrase"))
        .limit(RAKE_TOP_N)
    )


# --- vocabulary growth curve (Heaps' law) -------------------------------


@register(
    "text_vocab_growth",
    tags=("text", "corpus", "diagnostics"),
    oracle="""
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS ws,
           ntile(10) OVER (ORDER BY doc_id) AS decile
    FROM documents
), per_doc AS (
    SELECT doc_id, decile, CAST(len(ws) AS BIGINT) AS n_tokens FROM d
), w AS (
    SELECT word, min(doc_id) AS first_doc FROM (
        SELECT doc_id, unnest(ws) AS word FROM d
    ) GROUP BY word
), wd AS (
    SELECT p.decile, CAST(count(*) AS BIGINT) AS new_vocab
    FROM w JOIN per_doc p ON p.doc_id = w.first_doc
    GROUP BY p.decile
), dd AS (
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM per_doc GROUP BY decile
)
SELECT CAST(dd.decile AS INTEGER) AS decile,
       CAST(sum(dd.n_docs) OVER win AS BIGINT) AS cum_docs,
       CAST(sum(dd.n_tokens) OVER win AS BIGINT) AS cum_tokens,
       CAST(sum(coalesce(wd.new_vocab, 0)) OVER win AS BIGINT) AS cum_vocab,
       CAST(coalesce(wd.new_vocab, 0) AS BIGINT) AS new_vocab
FROM dd LEFT JOIN wd USING (decile)
WINDOW win AS (ORDER BY dd.decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): cumulative distinct
    vocabulary vs cumulative tokens at corpus deciles (by doc_id
    order) — the corpus-linguistics health curve: natural text grows
    vocabulary as a power law (the curve keeps bending up), while a
    templated/duplicated corpus plateaus early and machine-generated
    gibberish grows linearly. A new-ingest curve that suddenly
    flattens means the crawl started re-fetching what it already has.

    Exactness: pure integer counting — each word's first occurrence
    is min(doc_id), its decile is the first doc's decile, and every
    cumulative is a running sum over the 10-row decile frame.

    Scale shape: the deterministic ntile is the SMALL-CORPUS form —
    an unpartitioned rank funnels every doc header through one task
    and Spark's ntile counter is a 32-bit int (hard cap ~2.1e9 docs;
    single-task memory binds well before that, ~1e9). At 100 TB
    replace it with the two-pass split: aggregate a doc_id histogram,
    take the 9 decile boundary ids from it, and assign deciles with a
    row-local comparison against the broadcast boundaries (the
    curation_holdout_split hash-split pattern) — the cumulative
    semantics are unchanged because deciles stay doc_id-ordered.
    First occurrences are ONE vocabulary-scaled min aggregation over
    the token stream; the join back to deciles ships (word-first
    doc_id) pairs; everything after operates on a 10-row frame.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.withColumn("ws", F.split("text", " ")).withColumn(
        "decile", F.ntile(10).over(Window.orderBy("doc_id"))
    )
    per_doc = d.select(
        "doc_id", "decile", F.size("ws").cast("bigint").alias("n_tokens")
    )
    w = (
        d.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    wd = (
        w.join(
            per_doc.select(F.col("doc_id").alias("first_doc"), "decile"),
            "first_doc",
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_vocab"))
    )
    dd = per_doc.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    win = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = dd.join(wd, "decile", "left").withColumn(
        "new_vocab", F.coalesce("new_vocab", F.lit(0)).cast("bigint")
    )
    return joined.select(
        "decile",
        F.sum("n_docs").over(win).cast("bigint").alias("cum_docs"),
        F.sum("n_tokens").over(win).cast("bigint").alias("cum_tokens"),
        F.sum("new_vocab").over(win).cast("bigint").alias("cum_vocab"),
        "new_vocab",
    )


# Zipf fit: words ranked per source, slope of ln(count) on ln(rank)
# over the top-R head. R bounds the per-source regression input so
# the fit cost is independent of vocabulary size.
ZIPF_TOP_R = 100


@register(
    "text_zipf_fit",
    tags=("text", "quality", "statistics"),
    oracle=f"""
WITH words AS (
    SELECT source, unnest(regexp_extract_all(text, '[a-z]+')) AS word
    FROM documents
), counts AS (
    SELECT source, word, count(*) AS cnt
    FROM words GROUP BY 1, 2
), ranked AS (
    SELECT source, ln(CAST(cnt AS DOUBLE)) AS y,
           ln(CAST(row_number() OVER (
               PARTITION BY source ORDER BY cnt DESC, word
           ) AS DOUBLE)) AS x,
           row_number() OVER (
               PARTITION BY source ORDER BY cnt DESC, word
           ) AS rn
    FROM counts
), fit AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_ranked,
           count(*) * sum(x * y) - sum(x) * sum(y) AS sxy,
           count(*) * sum(x * x) - sum(x) * sum(x) AS sxx,
           count(*) * sum(y * y) - sum(y) * sum(y) AS syy
    FROM ranked WHERE rn <= {ZIPF_TOP_R}
    GROUP BY source
)
SELECT source, n_ranked,
       round(sxy / sxx, 4) AS zipf_slope,
       round((sxy * sxy) / (sxx * syy), 4) AS zipf_r2
FROM fit
WHERE n_ranked >= 3
""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: OLS slope of ln(count) vs ln(rank)
    over each source's top-{ZIPF_TOP_R} words. Natural text sits near
    slope -1 with high r^2; templated/boilerplate or spammy sources
    bend away from the power law — a corpus-level quality signal that
    complements the per-document scores (text_quality_score,
    text_gopher_quality). Beyond-reference (the Go engine has no text
    analytics); standard corpus-linguistics diagnostic.

    Engine discipline: the slope is spelled as the SAME explicit
    moment formula on both engines (n*Sxy - Sx*Sy over n*Sxx - Sx^2),
    not each engine's regr_slope builtin, whose internal algorithm is
    implementation-defined; inputs are ln() of exact integer counts
    and ranks, outputs rounded to 4 (the repo's float-agg rounding
    rule).

    Scale shape: one (source, word) count shuffle with map-side
    partial aggregation (at most |vocabulary| rows per partition),
    ranking through ``salted_topk`` so no task sorts a whole
    vocabulary, then a tiny per-source moment aggregation — the fit
    input is <= {ZIPF_TOP_R} rows per source by construction.
    """
    from go_integ_spark.operators.similarity import salted_topk

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("word"),
    )
    counts = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = salted_topk(
        counts, "source", [F.col("cnt").desc(), F.col("word").asc()], ZIPF_TOP_R
    ).select(
        "source",
        F.log(F.col("cnt").cast("double")).alias("y"),
        F.log(F.col("rn").cast("double")).alias("x"),
    )
    n = F.count(F.lit(1))
    sxy = n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")
    sxx = n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    syy = n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y")
    fit = ranked.groupBy("source").agg(
        n.cast("bigint").alias("n_ranked"),
        sxy.alias("sxy"),
        sxx.alias("sxx"),
        syy.alias("syy"),
    )
    return fit.filter(F.col("n_ranked") >= 3).select(
        "source",
        "n_ranked",
        F.round(F.col("sxy") / F.col("sxx"), 4).alias("zipf_slope"),
        F.round((F.col("sxy") * F.col("sxy")) / (F.col("sxx") * F.col("syy")), 4).alias(
            "zipf_r2"
        ),
    )
