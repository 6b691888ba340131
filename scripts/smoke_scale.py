"""Scale smoke for the skew- and envelope-sensitive scale paths.

The sf0.1 gate corpus (5k docs / 2k vectors) is too small to observe
LSH bucket skew, IVF cell balance or fixed-point envelope pressure,
so this script generates a scaled corpus (deterministic seed, with
injected near-dup clusters AND a heavy 16-word boilerplate paragraph
to pressure both the LSH ``max_bucket`` cap and the paragraph-dedup
hot hash key), runs the flagship dedup/similarity/curation/text
queries against it, and reports per-stage shuffle volume and
task-time skew from the Spark UI REST API. The pass criteria
(recorded in STATUS.md): no task over 10x the median task time in
any shuffle stage, and the cross-engine float-gate margins
(tests/test_round7_ops.py pins) hold on the scaled corpus too — the
r7 int64-overflow bug was only caught because the 10x corpus had 30x
the magnitude; envelope/margin failure classes SCALE WITH DATA.

``SMOKE_SCALE`` (default 10) multiplies the gate corpus: 10 -> 50k
docs / 20k vectors (~2 min on local[32]); 100 -> 500k docs / 200k
vectors (~15-30 min) — the VERDICT r7 item-8 design-point check.
Data lands in .smoke_x{scale}/ (gitignored); delete to regenerate.

Other knobs: ``SMOKE_ONLY`` (comma list of lines), ``SMOKE_SHUFFLE``
(shuffle partitions — size to the corpus at 1000x),
``SMOKE_ORDER_SEED`` (seeded shuffle of the line order; cache
producer->consumer chains keep relative order — run two seeds and
compare per-line to bound matrix-position effects), ``SMOKE_OUT``
(also write the summary JSON to this path — the standing-gate
artifact committed as SMOKE_r{N}.json).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("SMOKE_SCALE", "10"))
# Comma-separated allowlist of smoke lines (empty = run everything).
# The 1000x design probe (5M docs / 2M vectors) runs a TARGETED
# subset this way — the full matrix at 1000x would spend hours on
# lines whose scale story the 100x pass already establishes.
ONLY = frozenset(filter(None, os.environ.get("SMOKE_ONLY", "").split(",")))


def _selected(name: str) -> bool:
    return not ONLY or name in ONLY
N_DOCS = 5_000 * SCALE
N_VECS = 2_000 * SCALE
DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".smoke_sf1" if SCALE == 10 else f".smoke_x{SCALE}",
)

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "shuffle stage task executor driver broadcast skew salt bucket band probe"
).split()

# Exactly PARA_TOKENS (16) words: every injected doc then opens with
# an IDENTICAL aligned paragraph unit, so dedup_paragraph's
# first-occurrence ranking sees one ~2.5k-row hot hash key — the
# paragraph-level analogue of the LSH mega-bucket.
BOILERPLATE = (
    "click here to subscribe to our newsletter today and never miss"
    " a single breaking update again"
)


def generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DATA_DIR, exist_ok=True)
    rng = np.random.RandomState(42)

    texts: list[str] = []
    for i in range(N_DOCS):
        n = int(rng.randint(30, 60))
        words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), n)]
        if i % 20 == 0:
            # Heavy shared boilerplate: ~2.5k docs share these exact
            # 8 words -> mega-buckets that MUST hit the max_bucket cap.
            words = BOILERPLATE.split() + words
        if i % 17 == 0 and i > 0:
            # Near-dup: copy an earlier doc, perturb one word.
            base = texts[i - 1].split()
            base[int(rng.randint(0, len(base)))] = VOCAB[int(rng.randint(0, len(VOCAB)))]
            words = base
        texts.append(" ".join(words))
    # Multiple row groups, or every Spark scan of this corpus is ONE
    # real task: pyarrow's default row_group_size (1Mi rows) puts the
    # whole table in a single row group, and Spark's split planning
    # can't parallelize inside one — the first 100x run reported
    # 244.8x task skew that was ENTIRELY this layout artifact (12
    # splits, 11 empty). Real 100 TB corpora are thousands of files;
    # ~50-60 row groups models that honestly.
    docs = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([("en", "zh", "de", "fr")[i % 4] for i in range(N_DOCS)]),
            "source": pa.array([f"src{i % 7}" for i in range(N_DOCS)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, f"{DATA_DIR}/documents.parquet",
                   row_group_size=max(4096, N_DOCS // 56))

    centers = rng.normal(0, 5.0, size=(10, 64))
    emb = centers[np.arange(N_VECS) % 10] + rng.normal(0, 1.0, size=(N_VECS, 64))
    vecs = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [row.astype("float32") for row in emb],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 10 for i in range(N_VECS)], pa.int32()),
        }
    )
    pq.write_table(vecs, f"{DATA_DIR}/embeddings.parquet",
                   row_group_size=max(4096, N_VECS // 56))

    # Sparse near-dup regime (r10, VERDICT r9 #1): the clustered
    # corpus above makes EVERY within-cluster pair a near-dup, so
    # any >= 0.8 pair miner's OUTPUT is quadratic there by
    # construction. Production corpora are the opposite shape —
    # isotropic bulk (random 64-dim pairs sit at cos ~0, far under
    # 0.8) with a sparse ~1% planted near-dup population — and that
    # is the regime dedup_embedding_cosine_strict's 100x line runs
    # on: output is corpus-LINEAR (one row per planted pair).
    os.makedirs(f"{DATA_DIR}/sparse", exist_ok=True)
    sp = rng.normal(0, 1.0, size=(N_VECS, 64))
    n_pairs = N_VECS // 100
    for i in range(n_pairs):
        a, b = 2 * i, 2 * i + 1
        sp[b] = sp[a] + rng.normal(0, 0.22, size=64)  # cos ~0.93
    sparse = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [row.astype("float32") for row in sp],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(sparse, f"{DATA_DIR}/sparse/embeddings.parquet",
                   row_group_size=max(4096, N_VECS // 56))
    if _selected("similarity_bitext_pairs(12lang)"):
        generate_multilang()
    print(f"generated {N_DOCS} docs / {N_VECS} vectors "
          f"(+ sparse near-dup regime, {n_pairs} planted pairs) in {DATA_DIR}")


# 12 languages — the dimension the gate corpus (4 langs) never
# exercises: the r10 bitext plan must stay language-count-independent
# (one multilang Arrow probe kernel, one broadcast codebook map), and
# the per-(lang, cell) cogroup blocks must stay balanced when the
# language fan-out is 11 targets instead of 3.
MULTILANG = (
    "en zh de fr es ru ja pt it ar ko hi".split()
)


def generate_parts() -> None:
    """Synthetic `part` table for the ER smoke line (VERDICT r11
    item 8): 10 records per distinct name, names = `<word><4digits>
    <block>` so the ER block key (second token) gives ~500-name
    blocks, plus one planted mega-block (> MAX_BLOCK distinct names)
    so the guard is exercised — at gate scale it never binds. Random
    4-digit suffixes make distance-<=2 first-token pairs common
    enough that every block emits some matches (output stays
    vocabulary-linear)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    n_records = 20_000 * SCALE
    n_names = max(200, n_records // 10)
    n_blocks = max(4, n_names // 500)
    names = []
    seen = set()
    while len(names) < n_names:
        w = VOCAB[int(rng.randint(0, len(VOCAB)))]
        suffix = int(rng.randint(0, 10_000))
        if len(names) % 50 == 0:
            block = "megablock"  # 2% of names -> one dropped block
        else:
            block = f"blk{int(rng.randint(0, n_blocks)):04d}"
        nm = f"{w}{suffix:04d} {block}"
        if nm not in seen:
            seen.add(nm)
            names.append(nm)
    p_name = [names[int(rng.randint(0, n_names))] for _ in range(n_records)]
    tbl = pa.table(
        {
            "p_partkey": pa.array(range(n_records), pa.int64()),
            "p_name": pa.array(p_name),
        }
    )
    pq.write_table(tbl, f"{DATA_DIR}/part.parquet",
                   row_group_size=max(4096, n_records // 56))


def generate_multilang() -> None:
    """The multi-language bitext regime (r10, VERDICT r9 #6): the
    same topic-cluster embedding generator, spread over 12 languages
    round-robin, so every topic has candidate translations in every
    language and the miner's forward fan-out is 11 target languages
    wide. Lives in DATA_DIR/multilang/{documents,embeddings}."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(f"{DATA_DIR}/multilang", exist_ok=True)
    rng = np.random.RandomState(1234)
    centers = rng.normal(0, 5.0, size=(24, 64))
    emb = centers[np.arange(N_VECS) % 24] + rng.normal(0, 1.0, size=(N_VECS, 64))
    langs = [MULTILANG[i % len(MULTILANG)] for i in range(N_VECS)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_VECS), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(N_VECS)]),
                "lang": pa.array(langs),
                "source": pa.array([f"src{i % 7}" for i in range(N_VECS)]),
                "n_chars": pa.array([6] * N_VECS, pa.int64()),
            }
        ),
        f"{DATA_DIR}/multilang/documents.parquet",
        row_group_size=max(4096, N_VECS // 56),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [row.astype("float32") for row in emb],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([i % 24 for i in range(N_VECS)], pa.int32()),
            }
        ),
        f"{DATA_DIR}/multilang/embeddings.parquet",
        row_group_size=max(4096, N_VECS // 56),
    )
    print(f"generated multilang regime: {N_VECS} vectors over "
          f"{len(MULTILANG)} languages in {DATA_DIR}/multilang")



def _max_stage_id(ui: str) -> int:
    """Highest stage id the UI has seen — sampled before/after each
    smoke line so every stage in the report is ATTRIBUTABLE to the
    query that ran it (r10: the 6.6x worst-skew stage was guessable
    but not provable before this)."""
    try:
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
        )
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def _data_task_skew(
    ui: str, app_id: str, sid: int, att: int
) -> tuple[float | None, int]:
    """max/median executor run time over DATA-BEARING tasks only,
    plus the count of empty tasks excluded. Streaming micro-batch
    file-read stages schedule defaultParallelism tasks but only
    files-per-trigger of them carry bytes — a ~9 ms empty-split
    median under a real 48 s task reads as four-digit "skew" when no
    row was ever distributed unevenly (the 1000x probe's one FAIL was
    exactly this artifact). Raw skew is still reported alongside."""
    # Page through taskList: a single ?length=N fetch silently
    # truncates stages with more tasks, so skew would be computed
    # over a partial sample at larger probe scales (ADVICE r10).
    # Explicit sortBy=ID pins a deterministic order across the
    # separate REST requests (the default sort is not contractually
    # stable, so pages could duplicate/skip tasks — ADVICE r11), and
    # the dedupe-by-taskId below guards against overlap regardless.
    tasks = []
    page = 1000
    try:
        while True:
            batch = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
                    f"taskList?offset={len(tasks)}&length={page}&sortBy=ID"
                )
            )
            tasks.extend(batch)
            if len(batch) < page:
                break
    except Exception:
        # A fetch failure MID-pagination must not yield skew over a
        # partial sample (the straggler could be in the missing
        # tail) — fall back to None so the caller uses the raw
        # taskSummary skew, which always includes the true max.
        return None, 0
    seen_ids: set = set()
    deduped = []
    for t in tasks:
        tid = t.get("taskId")
        if tid in seen_ids:
            continue
        seen_ids.add(tid)
        deduped.append(t)
    tasks = deduped
    runs = []
    empties = 0
    for t in tasks:
        m = t.get("taskMetrics") or {}
        # RECORDS, not bytes: a split that covers no row-group start
        # still reads the parquet FOOTER (bytesRead > 0, records 0) —
        # exactly the 26-of-30 no-op tasks this filter must exclude.
        moved = (
            m.get("inputMetrics", {}).get("recordsRead", 0)
            + m.get("shuffleReadMetrics", {}).get("recordsRead", 0)
            + m.get("shuffleWriteMetrics", {}).get("recordsWritten", 0)
            + m.get("outputMetrics", {}).get("recordsWritten", 0)
        )
        if moved > 0:
            runs.append(m.get("executorRunTime", 0))
        else:
            empties += 1
    if not runs:
        return None, empties
    runs.sort()
    med = runs[len(runs) // 2] or 1
    return round(runs[-1] / med, 1), empties


def stage_report(ui: str) -> list[dict]:
    """Per completed stage: shuffle bytes + task-time quantiles."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    out = []
    for s in stages:
        sid, att = s["stageId"], s["attemptId"]
        try:
            q = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
                    "taskSummary?quantiles=0.5,1.0"
                )
            )
            med, mx = q["executorRunTime"]
        except Exception:
            med = mx = 0.0
        skew = round(mx / med, 1) if med else None
        data_skew, empties = skew, 0
        if skew is not None and skew > 10:
            # re-measure over data-bearing tasks before calling it skew
            data_skew, empties = _data_task_skew(ui, app_id, sid, att)
        out.append(
            {
                "stage": sid,
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                "task_med_ms": med,
                "task_max_ms": mx,
                "skew": skew,
                "data_skew": data_skew,
                "empty_tasks": empties,
            }
        )
    return out


def check_float_margins() -> dict:
    """The tests/test_round7_ops.py cross-engine margin pins, applied
    to the scaled corpus: every float-gated / float-ordered decision
    in the similarity family must sit far from its boundary HERE too,
    or the operators' oracle contract would not survive this scale.
    Thresholds mirror the test constants."""
    import numpy as np
    import pyarrow.parquet as pq

    from go_integ_spark.operators.similarity import (
        HARD_NEG_DUP_CEILING,
        N_QUERIES,
        TOP_K,
    )

    t = pq.read_table(
        f"{DATA_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    e = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    order = np.argsort(ids)
    e = e[order]
    u = e / np.sqrt((e * e).sum(axis=1))[:, None]
    sims = u[:N_QUERIES] @ u.T
    mask = np.ones_like(sims, dtype=bool)
    mask[np.arange(N_QUERIES), np.arange(N_QUERIES)] = False
    gate = float(np.abs(sims[mask] - HARD_NEG_DUP_CEILING).min())
    adjacency = np.inf
    for q in range(N_QUERIES):
        s = sims[q][mask[q]]
        below = np.sort(s[s < HARD_NEG_DUP_CEILING])[::-1][: TOP_K + 1]
        top = np.sort(s)[::-1][: TOP_K + 1]
        for seq in (below, top):
            if len(seq) > 1:
                adjacency = min(adjacency, float(np.abs(np.diff(seq)).min()))
    assert gate > 1e-4, (
        f"hard-negatives gate margin {gate:.2e} at scale {SCALE}x — "
        f"inside the cross-engine drift pin"
    )
    assert adjacency > 1e-7, (
        f"rank-adjacency margin {adjacency:.2e} at scale {SCALE}x"
    )
    return {"gate_margin": gate, "rank_adjacency_margin": adjacency}


def main() -> None:
    if not os.path.exists(f"{DATA_DIR}/documents.parquet") or not os.path.exists(
        f"{DATA_DIR}/sparse/embeddings.parquet"
    ):
        generate()
    if _selected("similarity_bitext_pairs(12lang)") and not os.path.exists(
        f"{DATA_DIR}/multilang/embeddings.parquet"
    ):
        generate_multilang()
    if _selected("er_blocked_fuzzy_parts") and not os.path.exists(
        f"{DATA_DIR}/part.parquet"
    ):
        generate_parts()

    margins = check_float_margins()
    print(f"float-gate margins at {SCALE}x: {margins}")

    from go_integ_spark.registry import load_all
    from go_integ_spark.session import get_spark

    # SMOKE_SHUFFLE sizes shuffle partitions to the corpus (the 100 TB
    # discipline: partitions must fit executor memory at the target
    # SF — the 1000x probe runs 256, not core-count 32; pair with
    # SPARK_GRAFT_DRIVER_MEM for the single-JVM heap).
    shuffle = int(os.environ.get("SMOKE_SHUFFLE", "0")) or None
    spark = get_spark(
        app_name="smoke_scale",
        shuffle_partitions=shuffle,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"
    reg = load_all()

    # One-time artifacts billed to their own lines (the bench.py
    # precedent): the docs stream-source write feeding the streaming
    # smoke line.
    results = {}

    def timed(name, thunk, extra=None):
        lo = _max_stage_id(ui) + 1
        t0 = time.perf_counter()
        n = thunk()
        secs = round(time.perf_counter() - t0, 2)
        results[name] = {"rows": n, "sec": secs,
                         "stages": [lo, _max_stage_id(ui)]}
        if extra:
            results[name].update(extra() if callable(extra) else extra)
        print(f"\n== {name}: {n} rows in {secs}s ==")
        return n
    # Named session warmup (r10, VERDICT r9 #5): the ann_ivfpq_topk
    # 100x "variance" (10.6-19.5 s across runs) was never ADC vs LUT
    # — phase-profiled, EVERY phase (centroid collect 5.5->0.45 s,
    # LUT build 3.9->1.6 s, serve 10.4->2.8 s) carries first-touch
    # session state: Python/Arrow worker spawn, codegen JIT, page
    # cache. Absorbing that into a billed warmup line makes the
    # measured lines position-independent: two fresh-process runs of
    # the ivfpq line then agree within 2.5% (12.69 / 12.37 s).
    from pyspark.sql import functions as F

    from go_integ_spark.tables import load_table

    # no type hints: function-local 'pd' breaks string-annotation
    # resolution in pandas_udf's eval-type inference
    _noop = F.pandas_udf(lambda x: x.astype(float), "double")

    def _warm():
        wemb = load_table(spark, DATA_DIR, "embeddings")
        wemb.select(F.sum(_noop(F.col("vec_id")))).collect()
        wemb.agg(F.sum(F.size("embedding"))).collect()
        load_table(spark, DATA_DIR, "documents").agg(
            F.sum(F.length("text"))
        ).collect()
        return 0

    timed("session_warmup", _warm)

    if _selected("streaming_paragraph_dedup"):
        from go_integ_spark.streaming.queries import _docs_stream_source

        timed(
            "stream_source_documents_build",
            lambda: (_docs_stream_source(spark, DATA_DIR), 0)[1],
        )
    lines = (
        "dedup_minhash_lsh",
        "ann_ivf_topk",
        "ann_ivfpq_topk",
        "dedup_paragraph",
        # round-5 additions with a distinct scale shape: the
        # whole-corpus kNN cell join (probe side NOT broadcastable)
        # and the corpus-once + bounded-collect BPE trainer.
        "embedding_knn_graph",
        "text_bpe_vocab",
        # round-6: the iterative CC on the 20k mutual-kNN graph —
        # the query whose per-round driver cost used to explode
        # (originStats squaring, see _checkpoint_fresh_stats); at
        # this scale the fixed loop runs ~40 s, previously unbounded.
        "embedding_communities",
        # round-6: cluster-then-prune SemDeDup — the injected
        # near-dup clusters pressure its within-cluster quadratic
        # (sqrt(20k) = 142 cells, ~140 vectors each).
        "dedup_semdedup",
        # round-6: PageRank over the source duplication graph — at
        # this scale the ~2.9k near-dup pairs collapse onto 7 source
        # nodes, exercising the pair->edge aggregation and the lazy
        # 8-round unroll over checkpointed frames.
        "graph_pagerank_sources",
        # round-6: triangle closure over the same pair frame — the
        # injected near-dup clusters make dense local neighborhoods,
        # pressuring the wedge join's per-vertex fan-out.
        "graph_triangle_count",
        # round-6: hybrid RRF — both broadcast-query rankers stream
        # the 50k-doc / 20k-vector corpus; checks the salted top-k
        # reductions stay bounded at 10x gate scale.
        "similarity_hybrid_rrf",
        # round-6: the (source, word) cell pipeline — the injected
        # boilerplate inflates one source's token mass; checks the
        # single token-stream exchange and the vocabulary-scaled
        # re-aggregations hold at 10x.
        "corpus_source_divergence",
        # round-6: the per-source dedup pricing over the paragraph
        # pipeline — the 2.5k-doc shared boilerplate paragraph is a
        # mega-hot ranking key here.
        "curation_dedup_impact",
        # round-7: the nprobe sweep — ONE cell enumeration must feed
        # all four curve points at 20k vectors (a per-point re-scan
        # would show as 4x the probe-join shuffle volume), and the
        # ceiling-gated hard-negative reduction must stay bounded on
        # the injected near-dup clusters (many candidates AT the
        # 0.45 ceiling).
        "similarity_ivf_probe_recall",
        "similarity_hard_negatives",
        # round-8: the truncated-dimension recall sweep — one corpus
        # scan must feed all depths (the scored frame is a
        # cached_persist slot; a per-depth re-scan would triple the
        # broadcast-join volume), and the per-depth salted top-k
        # reductions must stay bounded at 200k vectors.
        "similarity_matryoshka_recall",
        # round-8: Zipf fit — the (source, word) count shuffle and
        # the salted top-100 ranking under the injected boilerplate's
        # inflated token mass (one source's vocabulary is hot).
        "text_zipf_fit",
        # the packing window partitions by (lang, shard) — the plan
        # pin asserts the shape, this asserts the runtime at 500k
        # docs (a lang-only window would sort 125k rows in one task).
        "curation_pack_sequences",
        # round-9 additions (VERDICT r8 #6): the un-smoked heavy tail.
        # The IVF-probed bitext miner replaced the broadcast-en
        # crossJoin — at this scale the old form would broadcast a
        # 50k x 64-float slice; the new one is 5 cell equi-joins whose
        # candidate volume the fixed gate codebook (K=16) still makes
        # quadratic-ish per cell — at production scale K grows with
        # the corpus (offline k-means) and this collapses.
        "similarity_bitext_pairs",
        # BPE application: 12 chained JVM replaces over 500k docs'
        # word types — the vocabulary-scaled (not corpus-scaled)
        # model table must hold at 100x token mass.
        "text_bpe_apply",
        # NOT dedup_embedding_cosine: its probe-coverage rule (probe
        # = cells/4, forced by the noise-floor 0.45 threshold) makes
        # total block work ~N^2/4 at ANY cell count — measured 7 min
        # at 10x, hours at 100x. That is the operator's documented
        # envelope (production near-dup thresholds >= 0.8 concentrate
        # neighbors into few cells); the scale-safe embedding-quality
        # representative here is the linear outlier scan instead.
        "embedding_outliers",
        # the physically partitioned corpus layout: the one-time
        # partitionBy write at 200k vectors + the pruned probe scan
        # (INSET partition filters — the 100 TB read path).
        "ann_ivf_topk_partitioned",
        # token-budget selection without a global sort: the driver
        # walks the (lang, tok) group table, which scales with the
        # VOCABULARY of token counts, not the corpus.
        "curation_token_budget_select",
        # streaming driven availableNow at 100x: explode-in-streaming
        # + state-store dedup over the 500k-doc paragraph stream (the
        # one-time stream-source write bills to its own line below).
        "streaming_paragraph_dedup",
        # CCNet tertile bucketing: the per-language cumulative
        # histogram (never a per-language total sort) must hold at
        # 500k docs — the heaviest text line after BPE.
        "text_perplexity_buckets",
        # train/test n-gram contamination: the shingle join between
        # the split halves under the injected boilerplate's hot
        # shingles.
        "contamination_ngram_overlap",
        # exact-substring dedup: winnowing window hashes + the
        # first-occurrence ranking under the 25k-doc shared
        # boilerplate opening (the hot hash key by construction).
        "dedup_exact_substring",
        # round-12 (VERDICT r11 item 8): blocked fuzzy ER over the
        # synthetic part table (generate_parts) — ~500-name blocks,
        # one planted mega-block exercising the MAX_BLOCK guard, the
        # within-block levenshtein quadratic at a 100x vocabulary.
        "er_blocked_fuzzy_parts",
        # round-12 (VERDICT r11 item 6): embedding decontamination
        # through the unified capped grid. 100x is this operator's
        # scale design point: its 0.45 noise-floor threshold forces
        # the cells/4 coverage probe rule (~N^2/4 pair work, the
        # dedup_embedding_cosine envelope) — at 1000x that is ~10^12
        # pair-units and a ~370 GB probe-replication shuffle BY
        # DESIGN; the production-shaped >=0.8 strict operating point
        # is what runs at 1000x (dedup_embedding_cosine_strict).
        "contamination_embedding",
    )
    # De-positioned matrix (VERDICT r10 #5): bitext read 110 s inside
    # the full 31-line matrix vs 67.5 s standalone — page-cache /
    # persist pressure from EARLIER lines' cached artifacts, i.e. a
    # line's number depended on its position, not its plan.
    # SMOKE_ORDER_SEED shuffles the line order (unset = the written
    # order, so existing artifacts stay comparable); two runs under
    # different seeds agreeing per-line bounds the position effect.
    # Producer->consumer chains (cached_persist reuse) keep their
    # RELATIVE order after the shuffle — otherwise a consumer
    # randomly pays its producer's whole build and the matrix
    # measures cache luck, not plans.
    _CHAINS = (
        # dedup_lsh_pairs + dedup_doc_shingle_sets slots (the r11
        # two-seed agreement run caught contamination_ngram_overlap
        # at 3.45 s when scheduled before the shingle cache existed
        # vs 0.38 s after — consumers of a cached artifact must
        # follow its producer)
        (
            "dedup_minhash_lsh",
            "curation_dedup_impact",
            "graph_pagerank_sources",
            "graph_triangle_count",
            "contamination_ngram_overlap",
            "curation_token_budget_select",
        ),
        # knn_graph slot
        ("embedding_knn_graph", "embedding_communities"),
    )
    seed = os.environ.get("SMOKE_ORDER_SEED")
    if seed is not None:
        import random

        lines = list(lines)
        random.Random(int(seed)).shuffle(lines)
        for chain in _CHAINS:
            present = [n for n in chain if n in lines]
            slots = sorted(lines.index(n) for n in present)
            for i, n in zip(slots, present):
                lines[i] = n
        print(f"line order (seed {seed}): {lines}")
    for name in lines:
        if not _selected(name):
            continue
        timed(name, lambda q=name: reg[q].fn(spark, DATA_DIR).count())

    # The production-shaped strict near-dup miner runs on the sparse
    # regime (see generate()): output must be corpus-linear — every
    # planted pair and nothing else at 64-dim isotropic bulk.
    if _selected("dedup_embedding_cosine_strict(sparse)"):
        n = timed(
            "dedup_embedding_cosine_strict(sparse)",
            lambda: reg["dedup_embedding_cosine_strict"].fn(
                spark, f"{DATA_DIR}/sparse"
            ).count(),
        )
        assert n >= (N_VECS // 100) * 0.95, (
            f"strict miner recovered only {n} of ~{N_VECS // 100} planted pairs"
        )

    # Decontamination at the PRODUCTION operating point (r13, VERDICT
    # r12 item 7): strict >= 0.8 threshold, fixed nprobe, train side
    # in its one assigned cell — ~N^1.5 total pair work, the shape
    # that runs at 1000x (the 0.45 noise-floor form's cells/4 rule is
    # ~N^2/4 BY DESIGN and its scale line is the 100x one). Runs on
    # the sparse production-shaped regime; the planted (2i, 2i+1)
    # partners make every fifth pair's even member an eval item, so
    # ~N_VECS/500 evals must come back contaminated.
    if _selected("contamination_embedding_strict(sparse)"):
        _contam_counts: list = []

        def _contam_strict() -> int:
            # one job for rows + contaminated count — a second .fn
            # pass would re-run the whole plan
            r = (
                reg["contamination_embedding_strict"]
                .fn(spark, f"{DATA_DIR}/sparse")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_if(F.col("contaminated")).alias("c"),
                )
                .collect()[0]
            )
            _contam_counts.append(r["c"])
            return r["n"]

        timed("contamination_embedding_strict(sparse)", _contam_strict)
        n_contam = _contam_counts[0]
        results["contamination_embedding_strict(sparse)"]["contaminated"] = (
            n_contam
        )
        want = N_VECS // 500
        assert n_contam >= want * 0.9, (
            f"strict decontamination found {n_contam} contaminated evals, "
            f"expected ~{want} planted"
        )

    # Bitext over the 12-language regime (VERDICT r9 #6): the
    # language-count dimension the 4-lang main corpus never tests —
    # the plan must stay one multilang Arrow kernel per side
    # (test_round10_ops pins plan-size independence; here the SKEW
    # and runtime bound are the claim), and every language must
    # contribute pairs.
    if _selected("similarity_bitext_pairs(12lang)"):
        from go_integ_spark.operators.similarity import similarity_bitext_pairs

        ml = similarity_bitext_pairs(spark, f"{DATA_DIR}/multilang")
        timed("similarity_bitext_pairs(12lang)", ml.count)
        ml_langs = ml.select("tgt_lang").distinct().count()
        results["similarity_bitext_pairs(12lang)"]["target_langs"] = ml_langs
        print(f"   ({ml_langs} target languages)")
        # the >= 1.0 ratio-margin legitimately blanks a borderline
        # language (10/11 at the 10x regime); broad coverage is the claim
        assert ml_langs >= 9, (
            f"expected pairs in >=9 of 11 target langs, got {ml_langs}"
        )

    report = stage_report(ui)
    shuffly = [s for s in report if s["shuffle_write_mb"] or s["shuffle_read_mb"]]

    def verdict_eligible(s: dict) -> bool:
        # Stall-robust eligibility (VERDICT r12 item 3): the r12
        # probes carried two red-looking headlines — knn_final 11.8x
        # from ONE 5.1 s host stall on a 0.43 s-median 1 MB/task
        # bookkeeping stage, cc_ab 51.5x from one 4.6 s GC stall on a
        # 14 MB even stage — that each needed prose to explain away.
        # A stage enters the straggler verdict only when its skew
        # could be a PLAN problem: its median task is >= 1 s (real
        # per-task work; a single-task stall can't read as 10x), or
        # its per-task shuffle volume is material (>= 16 MB/task — a
        # data distribution CAN be the cause), or its max task is
        # >= 30 s (a straggler that long is material whatever the
        # stage's bookkeeping looks like, so a genuinely mis-packed
        # bin can never hide behind this floor). Everything still
        # prints; ineligible stages just can't set the PASS/FAIL.
        if s["task_max_ms"] >= 30_000:
            return True
        per_task_mb = (s["shuffle_write_mb"] + s["shuffle_read_mb"]) / max(
            s["tasks"], 1
        )
        return s["task_med_ms"] >= 1000 or per_task_mb >= 16

    def eff_skew(s: dict) -> float:
        # data-bearing-task skew where it was measured, raw otherwise,
        # gated by verdict_eligible (scheduling noise on sub-second
        # bookkeeping exchanges reads as "96x skew" otherwise).
        if not verdict_eligible(s):
            return 0
        v = s["data_skew"] if s["data_skew"] is not None else s["skew"]
        return v or 0

    worst = max((eff_skew(s) for s in shuffly), default=0)

    def owner(stage_id: int) -> str:
        for qname, r in results.items():
            lo, hi = r.get("stages", (1, 0))
            if lo <= stage_id <= hi:
                return qname
        return "?"

    for s in shuffly:
        s["verdict_eligible"] = verdict_eligible(s)
        empt = (
            f" data_skew={s['data_skew']} (excl {s['empty_tasks']} empty)"
            if s["empty_tasks"]
            else ""
        )
        elig = "" if s["verdict_eligible"] else " [not verdict-eligible]"
        print(
            f"stage {s['stage']:>3} tasks={s['tasks']:>3} "
            f"shufW={s['shuffle_write_mb']:>8}MB shufR={s['shuffle_read_mb']:>8}MB "
            f"task med/max={s['task_med_ms']:.0f}/{s['task_max_ms']:.0f}ms "
            f"skew={s['skew']}{empt}{elig} | {owner(s['stage'])}"
        )
    worst_stage = max(shuffly, key=eff_skew, default=None) if shuffly else None
    worst_owner = owner(worst_stage["stage"]) if worst_stage else "-"
    print(f"\nworst shuffle-stage DATA-task skew (max/median): {worst}x "
          f"(in {worst_owner}; {'PASS' if worst < 10 else 'FAIL'} vs the 10x bound)")
    # Host fingerprint (r12): the 2026-08-16 probe session measured
    # cpu_calib_par at 9.3-14.2 s vs the 3.5-4.4 s host norm (13%
    # hypervisor steal + 38% system time under all-core load) —
    # without these fields a degraded-host wall reads as a plan
    # regression. Ratios (skew) stay comparable; walls need the par
    # calib next to them.
    from bench import _cpu_calibration, _cpu_calibration_parallel, par_band

    calib_par = _cpu_calibration_parallel()
    summary = {
        "queries": results,
        "worst_skew": worst,
        "worst_skew_query": worst_owner,
        # the worst VERDICT-ELIGIBLE stage's full row, so a flagged
        # artifact carries its own evidence (med/max/volume) instead
        # of needing the probe log
        "worst_skew_stage": worst_stage,
        "scale": SCALE,
        "order_seed": os.environ.get("SMOKE_ORDER_SEED"),
        "shuffle_partitions": os.environ.get("SMOKE_SHUFFLE"),
        "only": sorted(ONLY) if ONLY else None,
        "cpu_calib_sec": _cpu_calibration(),
        "cpu_calib_par_sec": calib_par,
        # measured AT report time, i.e. right when the verdict is
        # computed — a flagged PASS/FAIL self-describes its host
        # (VERDICT r12 item 3: two r12 headlines were host stalls
        # recorded without the calib that would have said so)
        "par_band": par_band(calib_par),
    }
    print(json.dumps(summary))
    # Standing-gate artifact (VERDICT r10 #8): SMOKE_OUT=path writes
    # the same JSON to a file so a round can commit its 100x matrix
    # and the next round's judge diffs instead of re-deriving.
    out = os.environ.get("SMOKE_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
