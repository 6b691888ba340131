"""Invariant pins for the round-6 fourth-session additions
(SemDeDup, temperature sampling, Cohen's kappa, unpivot/melt,
Gopher duplicated-n-gram coverage, language-ID confusion metrics).

Value-level correctness is covered by the DuckDB oracle sweep; the
tests here are (a) oracle-INDEPENDENT pure-Python references for the
tricky kernels — the round-6 lesson: when the Spark query and its
oracle are generated from one mental model, a shared flaw is
invisible to the value gate — and (b) the semantic claims the
docstrings make.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from go_integ_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"

REG = load_all()


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# --- SemDeDup ---------------------------------------------------------


def test_semdedup_matches_numpy_reference(spark):
    """Full third-implementation check: rebuild the cluster-then-
    prune pipeline in numpy/pure-int arithmetic from the raw parquet
    and require the identical (cid, dist2_u, keep) per vector."""
    import numpy as np

    from go_integ_spark.operators.dedup import (
        SEMDEDUP_GATE_QMAX,
        SEMDEDUP_TAU_DEN,
        SEMDEDUP_TAU_NUM,
    )
    from go_integ_spark.operators.similarity import KMEANS_SCALE

    rows = REG["dedup_semdedup"].fn(spark, SF_DIR).collect()
    got = {r["vec_id"]: (r["cid"], r["dist2_u"], r["keep"]) for r in rows}

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in emb], dtype=np.int64)
    e = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in emb])
    order = np.argsort(ids)
    ids, e = ids[order], e[order]
    q = np.floor(e * KMEANS_SCALE + 0.5).astype(np.int64)
    n = len(ids)
    k = math.ceil(math.sqrt(n))

    def assign(cents):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)  # first occurrence == lowest cid tie
        return cid, d2[np.arange(n), cid]

    cents0 = q[ids < k]
    cid0, _ = assign(cents0)
    # round-half-up integer mean per (cluster, dim), exact int math
    alive = sorted(set(cid0.tolist()))
    cents1 = np.stack(
        [
            np.array(
                [
                    (2 * int(q[cid0 == c, d].sum()) + int((cid0 == c).sum()))
                    // (2 * int((cid0 == c).sum()))
                    for d in range(q.shape[1])
                ],
                dtype=np.int64,
            )
            for c in alive
        ]
    )
    cid1_idx, d2_1 = assign(cents1)
    cid1 = np.array(alive, dtype=np.int64)[cid1_idx]

    # within-cluster pairs above tau — the all-int64 gate (pure
    # Python ints here, so this reference is overflow-free by
    # construction and independent of the numpy kernel's int64 path);
    # the multiplier replays gate_quant_mult's exact arithmetic
    # (named mult: the per-cluster loop below reuses `m` for indices)
    mult = SEMDEDUP_GATE_QMAX / max(float(np.abs(e).max()), 1e-30)
    qg = np.floor(e * mult + 0.5).astype(np.int64)
    num2 = SEMDEDUP_TAU_NUM * SEMDEDUP_TAU_NUM
    den2 = SEMDEDUP_TAU_DEN * SEMDEDUP_TAU_DEN
    n2 = [int((qg[i] * qg[i]).sum()) for i in range(n)]
    dropped: set[int] = set()
    for c in alive:
        m = np.where(cid1 == c)[0]
        if len(m) < 2:
            continue
        ok = np.zeros((len(m), len(m)), dtype=bool)
        for a_i in range(len(m)):
            for b_i in range(len(m)):
                ia, ib = int(m[a_i]), int(m[b_i])
                dot = int(sum(int(x) * int(y) for x, y in zip(qg[ia], qg[ib])))
                ok[a_i, b_i] = (
                    dot >= 0
                    and n2[ia] > 0
                    and n2[ib] > 0
                    and den2 * dot * dot >= num2 * n2[ia] * n2[ib]
                )
        ii, jj = np.where(np.triu(ok, k=1))
        for a, b in zip(m[ii], m[jj]):
            da, db = int(d2_1[a]), int(d2_1[b])
            va, vb = int(ids[a]), int(ids[b])
            if da < db or (da == db and va > vb):
                dropped.add(va)
            else:
                dropped.add(vb)

    want = {
        int(ids[i]): (int(cid1[i]), int(d2_1[i]), int(ids[i]) not in dropped)
        for i in range(n)
    }
    assert got == want
    # the prune is non-trivial on this corpus
    assert dropped, "corpus produced no semantic duplicates at tau"


def test_semdedup_keep_rule_direction(spark):
    """Every cluster with any drop keeps its farthest-from-centroid
    member (the SemDeDup keep rule, not keep-nearest)."""
    rows = REG["dedup_semdedup"].fn(spark, SF_DIR).collect()
    by_cid: dict[int, list] = {}
    for r in rows:
        by_cid.setdefault(r["cid"], []).append(r)
    for cid, rs in by_cid.items():
        if any(not r["keep"] for r in rs):
            far = max(rs, key=lambda r: (r["dist2_u"], -r["vec_id"]))
            assert far["keep"], f"cluster {cid} dropped its farthest member"


# --- Gopher duplicated-n-gram coverage --------------------------------


def test_dup_ngram_fraction_matches_python_reference(spark):
    from go_integ_spark.operators.text import (
        DUP_3GRAM_MAX_FRAC,
        DUP_TOP2_MAX_SHARE,
    )

    rows = REG["text_dup_ngram_fraction"].fn(spark, SF_DIR).collect()
    texts = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    assert len(rows) == len(texts)
    for r in rows:
        text = texts[r["doc_id"]]
        ws = text.split(" ")
        nc = len(text)
        g2 = Counter(
            " ".join(ws[i : i + 2]) for i in range(len(ws) - 1)
        )
        g3 = Counter(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
        top2 = max((c * len(g) for g, c in g2.items()), default=0)
        dup3 = sum(c * len(g) for g, c in g3.items() if c > 1)
        assert r["n_chars"] == nc
        assert r["top2_cover"] == top2, r["doc_id"]
        assert r["dup3_cover"] == dup3, r["doc_id"]
        assert r["top2_share"] == round(min(top2 / max(nc, 1), 1.0), 4)
        assert r["dup3_frac"] == round(min(dup3 / max(nc, 1), 1.0), 4)
        assert r["repetition_ok"] == (
            r["top2_share"] <= DUP_TOP2_MAX_SHARE
            and r["dup3_frac"] <= DUP_3GRAM_MAX_FRAC
        )


def test_dup_ngram_fraction_edge_fixtures(spark, tmp_path):
    """The corpus never produces docs under 10 words, so the ANSI
    hazards live only here: empty text (n_chars = 0 division),
    single-word docs (no grams at all), and the 2-word doc whose
    single 2-gram used to drive sequence(2, 1) DESCENDING into an
    out-of-bounds element_at. Values pinned against the pure-Python
    definition, clamps included."""
    from go_integ_spark.operators.text import text_dup_ngram_fraction

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, ""), (4, "x y x y"), (5, "w w w"),
         (6, "p q r p q r p q r")],
        "doc_id long, text string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in text_dup_ngram_fraction(spark, str(tmp_path)).collect()
    }
    # (top2_cover, dup3_cover, top2_share, dup3_frac)
    want = {
        1: (3, 0, 1.0, 0.0),       # one gram covers everything (clamped)
        2: (0, 0, 0.0, 0.0),       # no grams
        3: (0, 0, 0.0, 0.0),       # empty text, guarded division
        4: (6, 0, 0.8571, 0.0),    # "x y" twice over 7 chars
        5: (6, 0, 1.0, 0.0),       # overlap pushes cover past n_chars
        6: (9, 35, 0.5294, 1.0),   # heavy 3-gram repetition, clamped
    }
    got = {
        d: (r["top2_cover"], r["dup3_cover"], r["top2_share"], r["dup3_frac"])
        for d, r in rows.items()
    }
    assert got == want


# --- Temperature sampling ---------------------------------------------


def test_temperature_sampling_matches_python_reference(spark):
    from go_integ_spark.operators.curation import (
        TEMP_SCALE,
        TEMP_TOKEN_BUDGET,
    )

    rows = REG["curation_temperature_sampling"].fn(spark, SF_DIR).collect()
    docs = _docs(spark).select("lang", "text").collect()
    toks: Counter = Counter()
    ndocs: Counter = Counter()
    for r in docs:
        toks[r["lang"]] += len(r["text"].split(" "))
        ndocs[r["lang"]] += 1
    su = {
        lang: math.floor(math.sqrt(t) * TEMP_SCALE + 0.5)
        for lang, t in toks.items()
    }
    s_tot, t_tot = sum(su.values()), sum(toks.values())
    assert len(rows) == len(toks)
    for r in rows:
        lang = r["lang"]
        assert r["n_docs"] == ndocs[lang]
        assert r["n_tokens"] == toks[lang]
        assert r["sample_p"] == round(su[lang] / s_tot, 6)
        assert r["up_weight"] == round(
            (su[lang] * t_tot) / (s_tot * toks[lang]), 6
        )
        assert r["epochs"] == round(
            (TEMP_TOKEN_BUDGET * su[lang]) / (s_tot * toks[lang]), 4
        )


def test_temperature_flattens_toward_uniform(spark):
    """THE temperature-sampling claim: alpha < 1 moves every
    language's sampling probability strictly toward uniform from its
    natural token share (up-weight > 1 iff share < uniform)."""
    rows = REG["curation_temperature_sampling"].fn(spark, SF_DIR).collect()
    uniform = 1.0 / len(rows)
    for r in rows:
        if r["token_share"] < uniform:
            assert r["token_share"] < r["sample_p"] < uniform + 1e-9
        else:
            assert uniform - 1e-9 < r["sample_p"] < r["token_share"]


# --- Cohen's kappa ----------------------------------------------------


def test_annotation_agreement_matches_python_reference(spark):
    from go_integ_spark.operators.curation import (
        KAPPA_MIN_DISTINCT,
        KAPPA_MIN_WORDS,
    )

    (row,) = REG["curation_annotation_agreement"].fn(spark, SF_DIR).collect()
    n11 = n10 = n01 = n00 = 0
    for r in _docs(spark).select("text").collect():
        ws = r["text"].split(" ")
        a = len(ws) >= KAPPA_MIN_WORDS
        b = len(set(ws)) >= KAPPA_MIN_DISTINCT
        n11 += a and b
        n10 += a and not b
        n01 += (not a) and b
        n00 += (not a) and not b
    n = n11 + n10 + n01 + n00
    smp = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert (row["n"], row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    assert row["po"] == round((n11 + n00) / n, 6)
    assert row["pe"] == round(smp / (n * n), 6)
    assert row["kappa"] == round((n * (n11 + n00) - smp) / (n * n - smp), 6)
    # all four cells populated -> the thresholds are doing work
    assert min(n11, n10, n01, n00) > 0


# --- Unpivot ----------------------------------------------------------


def test_unpivot_is_exact_inverse_of_wide(spark):
    out = REG["events_unpivot_metrics"].fn(spark, SF_DIR)
    rows = out.collect()
    per_user: dict[int, dict] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], {})[r["metric"]] = r["metric_value"]
    assert per_user
    for uid, m in per_user.items():
        assert set(m) == {"n_events", "total_value", "n_types"}, uid
        assert m["n_events"] == int(m["n_events"])  # exact count in double
        assert 1 <= m["n_types"] <= 5


# --- Language-ID confusion --------------------------------------------


def test_lang_confusion_consistency(spark):
    rows = REG["text_lang_confusion"].fn(spark, SF_DIR).collect()
    n_docs = _docs(spark).count()
    assert sum(r["n_gold"] for r in rows) == n_docs
    for r in rows:
        assert r["tp"] + r["fn"] == r["n_gold"]
        if r["precision"] is not None:
            assert 0.0 <= r["precision"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0
        if r["f1"] is not None and r["precision"] and r["recall"]:
            prf = (
                2
                * r["tp"]
                / (2 * r["tp"] + r["fp"] + r["fn"])
            )
            assert abs(r["f1"] - prf) < 1e-6


def test_lang_confusion_uses_registered_predictions(spark):
    """The evaluation's per-class TP column must equal a direct join
    of text_lang_id's output with the gold column."""
    pred = REG["text_lang_id"].fn(spark, SF_DIR)
    gold = _docs(spark).select("doc_id", "lang")
    direct = (
        gold.join(pred, "doc_id")
        .filter(F.col("lang") == F.col("pred_lang"))
        .groupBy("lang")
        .count()
        .collect()
    )
    want = {r["lang"]: r["count"] for r in direct}
    rows = REG["text_lang_confusion"].fn(spark, SF_DIR).collect()
    got = {r["lang"]: r["tp"] for r in rows}
    assert got == {lang: want.get(lang, 0) for lang in got}
    # every correctly-predicted language appears in the evaluation
    assert set(want) <= set(got)
