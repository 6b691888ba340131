"""Property-based tests (hypothesis): invariants fuzzed over
generated inputs rather than hand-picked fixtures — the layer the
reference's static-analysis-only CI never had (SURVEY.md §5).

No Spark session here: these target the pure-Python surfaces
(parsers, envelope, masking), so the suite stays fast.
"""

from __future__ import annotations

import io
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from go_integ_spark.engine.envelope import mask_config
from go_integ_spark.protocols.airbyte import AirbyteWriter
from go_integ_spark.schema.stream import StreamSchema
from go_integ_spark.sources.parsers import parse_jsonl

# JSON-safe scalars/objects (no NaN — JSON round-trip is the contract)
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=40),
)
records = st.dictionaries(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1,
        max_size=10,
    ),
    scalars,
    max_size=6,
)


@given(st.lists(records, max_size=20))
@settings(max_examples=200, deadline=None)
def test_jsonl_round_trip(rows):
    """parse_jsonl(serialize(rows)) == rows for any JSON-able rows,
    regardless of blank/whitespace interleaving."""
    blob = "\n\n".join(json.dumps(r) for r in rows) + "\n  \n"
    assert parse_jsonl(blob) == rows
    assert parse_jsonl(blob.encode()) == rows


@given(st.lists(records, min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_airbyte_record_envelope_round_trip(rows):
    """Every emitted RECORD line is valid NDJSON whose data payload
    round-trips exactly; one line per record, in order."""
    import datetime as dt

    out = io.StringIO()
    w = AirbyteWriter(
        out, clock=lambda: dt.datetime(2022, 1, 1, tzinfo=dt.timezone.utc)
    )
    w.open_stream(StreamSchema.from_ddl("s", "x string")).emit_records(rows)
    lines = [json.loads(line) for line in out.getvalue().splitlines() if line]
    assert len(lines) == len(rows)
    for msg, rec in zip(lines, rows):
        assert msg["type"] == "RECORD"
        assert msg["record"]["stream"] == "s"
        assert msg["record"]["data"] == rec


@given(
    st.dictionaries(
        st.sampled_from(["api_key", "password", "token", "url", "user"]),
        st.text(min_size=0, max_size=30),
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_mask_config_is_length_preserving_and_non_leaking(cfg):
    """Masked secrets keep their length (utils.go:12-24 semantics)
    and never leak the original value; non-secret keys pass through."""
    schema = {
        "type": "object",
        "properties": {
            "api_key": {"type": "string", "airbyte_secret": True},
            "password": {"type": "string", "writeOnly": True},
            "token": {"type": "string", "airbyte_secret": True},
            "url": {"type": "string"},
            "user": {"type": "string"},
        },
    }
    masked = mask_config(cfg, schema)
    for k, v in cfg.items():
        if k in ("api_key", "password", "token"):
            assert len(str(masked[k])) == len(v)
            assert v == "" or set(str(masked[k])) <= {"x"}
        else:
            assert masked[k] == v


@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd")), max_size=20
        ),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_xml_declared_array_collects_all_items(values):
    """A path declared as an array collects every repeated element in
    document order — including the 0/1-element cases where undeclared
    repeats would silently overwrite (xml.go:115-124 semantics).
    Leaf text is NOT truncated (the reference's 30-byte quirk is
    deliberately fixed, SURVEY.md §2.1 S9)."""
    from go_integ_spark.sources.parsers import parse_xml

    body = "".join(f"<item>{v}</item>" for v in values)
    doc = f"<root><items>{body}</items></root>"
    out = parse_xml(doc, arrays=["items.item"])
    items = out["items"].get("item", []) if isinstance(out["items"], dict) else []
    assert items == [v.strip() for v in values]


@given(
    rate=st.floats(min_value=0.1, max_value=100),
    burst=st.integers(min_value=1, max_value=8),
    n=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=60, deadline=None)
def test_rate_limiter_never_over_admits(rate, burst, n):
    """Token-bucket safety: across any acquisition sequence, admits
    never exceed burst + rate * elapsed (tokens can't go negative or
    exceed the bucket)."""
    from go_integ_spark.sources.http import RateLimiter

    t = [0.0]
    rl = RateLimiter(
        rate=rate, burst=burst, clock=lambda: t[0],
        sleep=lambda s: t.__setitem__(0, t[0] + s),
    )
    start = t[0]
    for _ in range(n):
        rl.acquire()
    elapsed = t[0] - start
    assert n <= burst + rate * elapsed + 1e-6
    assert 0.0 <= rl._tokens <= burst


@given(
    gaps=st.lists(
        st.integers(min_value=1, max_value=3600), min_size=1, max_size=12
    )
)
@settings(max_examples=15, deadline=None)
def test_session_window_boundary_matches_lag_oracle(spark, gaps):
    """The exact session_window gap semantics the streaming oracle
    assumes: an event extends its session to last_ts + gap and a
    session at exactly that boundary MERGES (abutting windows
    coalesce), so a new session starts only when the gap is STRICTLY
    greater than the threshold. The lag-based assignment with > gap
    must agree for arbitrary gap sequences including the 1800s
    boundary itself (verified empirically: two events exactly 1800s
    apart are ONE session of 2 events)."""
    import datetime as dt

    from pyspark.sql import functions as F

    GAP_S = 1800
    ts = [dt.datetime(2024, 1, 1)]
    for g in gaps:
        ts.append(ts[-1] + dt.timedelta(seconds=g))
    df = spark.createDataFrame([(1, t) for t in ts], "user_id long, ts timestamp")
    native = (
        df.groupBy(F.session_window("ts", f"{GAP_S} seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("session_window.start").alias("s"), "n")
    )
    got = sorted((r["s"], r["n"]) for r in native.collect())
    # lag-based assignment: new session when diff > GAP_S (strict)
    sessions = []
    for i, t in enumerate(ts):
        if i == 0 or (t - ts[i - 1]).total_seconds() > GAP_S:
            sessions.append([t, 1])
        else:
            sessions[-1][1] += 1
    want = sorted((s, n) for s, n in sessions)
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=40
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=12, deadline=None)
def test_paragraph_dedup_matches_python_reference(spark, tmp_path_factory, docs):
    """dedup_paragraph vs a direct Python restatement of its contract
    (aligned PARA_TOKENS-token windows; an occurrence is duplicate
    iff a same-content paragraph occurred earlier in (doc_id,
    para_id) order) over arbitrary tiny-vocabulary corpora — the
    tiny vocabulary forces heavy cross-doc and within-doc collisions,
    the regime the operator exists for."""
    from go_integ_spark.operators.dedup import (
        PARA_KEEP_MAX_DUP,
        PARA_TOKENS,
        dedup_paragraph,
    )

    texts = [" ".join(words) for words in docs]
    path = str(tmp_path_factory.mktemp("paradup"))
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    ).write.mode("overwrite").parquet(path + "/documents.parquet")

    seen: set[str] = set()
    want = {}
    for doc_id, text in enumerate(texts):
        ws = text.split(" ")
        paras = [
            " ".join(ws[i : i + PARA_TOKENS])
            for i in range(0, len(ws), PARA_TOKENS)
        ]
        n_dup = 0
        for p in paras:
            if p in seen:
                n_dup += 1
            else:
                seen.add(p)
        frac = n_dup / len(paras)
        want[doc_id] = (len(paras), n_dup, round(frac, 4), frac <= PARA_KEEP_MAX_DUP)

    got = {
        r["doc_id"]: (r["n_paras"], r["n_dup_paras"], r["dup_frac"], r["keep"])
        for r in dedup_paragraph(spark, path).collect()
    }
    assert got == want


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e3,
                max_value=1e3,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e3,
                max_value=1e3,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=60, deadline=None)
def test_fold_cosine_block_matches_sequential_python(a_vecs, b_vecs):
    """fold_cosine_block must reproduce, bit for bit, a pure-Python
    left-to-right fold (product then accumulate per dimension, norm
    product rounded once) — the association order that keeps it equal
    to the JVM expression and the DuckDB oracles. Fuzzing guards the
    kernel against vectorization changes (FMA, pairwise summation)
    that would silently break cross-cell dedupe."""
    import math

    from go_integ_spark.functions.vector import fold_cosine_block

    def norm(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return math.sqrt(acc)

    a_norms = [norm(v) or 1.0 for v in a_vecs]
    b_norms = [norm(v) or 1.0 for v in b_vecs]
    block = fold_cosine_block(a_vecs, a_norms, b_vecs, b_norms)
    for i, av in enumerate(a_vecs):
        for j, bv in enumerate(b_vecs):
            acc = 0.0
            for d in range(len(av)):
                acc = acc + av[d] * bv[d]
            want = acc / (a_norms[i] * b_norms[j])
            assert block[i, j] == want, (i, j)


@given(
    st.lists(st.integers(min_value=-(10**13), max_value=10**13), min_size=1, max_size=50)
)
@settings(max_examples=200, deadline=None)
def test_integer_centroid_rounding_is_exact_half_up(values):
    """The k-means gate path computes centroid coordinates as
    floor((2*s + n) / (2n)) over exact integer sums. That must equal
    round-half-UP of the true rational mean s/n for any sign — the
    property that makes the unrolled DuckDB oracle bit-identical —
    and the double division inside must never flip the floor (the
    ratio is at least 1/(2n) from any integer it doesn't hit)."""
    from fractions import Fraction

    import math

    s, n = sum(values), len(values)
    got = int(math.floor((2 * s + n) / (2.0 * n)))
    want = int(math.floor(Fraction(s, n) + Fraction(1, 2)))
    assert got == want


@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    st.text(alphabet="abc", min_size=1, max_size=2),
    st.text(alphabet="abc", min_size=1, max_size=2),
)
@settings(max_examples=300, deadline=None)
def test_bpe_string_encoding_matches_greedy_merge(syms, left, right):
    """The BPE oracle's double-separator string encoding must apply a
    merge EXACTLY like the greedy leftmost-first scan
    (_bpe_apply_merge): one non-overlapping replace of
    sep+left+sep+sep+right+sep. Fuzzes adjacent merges ('aaa' ->
    [aa, a]), prefix/suffix near-matches ('a' next to 'ab'), and
    multi-char symbols — the hazards the encoding was designed
    around."""
    from go_integ_spark.operators.text import _BPE_SEP, _bpe_apply_merge

    s2 = _BPE_SEP * 2
    encoded = s2 + s2.join(syms) + s2
    replaced = encoded.replace(
        f"{_BPE_SEP}{left}{s2}{right}{_BPE_SEP}",
        f"{_BPE_SEP}{left}{right}{_BPE_SEP}",
    )
    got = [x for x in replaced.split(s2) if x != ""]
    want = _bpe_apply_merge(list(syms), left, right)
    assert got == want, (syms, left, right)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.integers(min_value=0, max_value=30),  # tok (incl. 0 edge)
        ),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=200),
)
@settings(max_examples=300, deadline=None)
def test_greedy_budget_plan_equals_prefix_reference(docs, budget):
    """greedy_budget_plan's bucket walk must select EXACTLY the docs a
    direct per-language running sum over (tok DESC, doc_id) keeps
    within budget — including tok=0 groups, empty boundary (m=0), and
    budget=0."""
    from collections import Counter

    from go_integ_spark.operators.curation import greedy_budget_plan

    rows = [(lang, tok, i) for i, (lang, tok) in enumerate(docs)]
    # reference: strict running-sum prefix per language
    want = set()
    for lang in {r[0] for r in rows}:
        cum = 0
        for _, tok, did in sorted(
            (r for r in rows if r[0] == lang), key=lambda r: (-r[1], r[2])
        ):
            cum += tok
            if cum > budget:
                break
            want.add(did)
    # plan: group table -> bucket walk -> doc selection
    groups = Counter()
    for lang, tok, _ in rows:
        groups[(lang, tok)] += 1
    gtable = [
        (lang, tok, n, tok * n) for (lang, tok), n in groups.items()
    ]
    full_keep, boundary = greedy_budget_plan(gtable, budget)
    got = set()
    fk = set(full_keep)
    for lang, tok, did in rows:
        if (lang, tok) in fk:
            got.add(did)
    for lang, (tok_b, m) in boundary.items():
        members = sorted(
            did for lg, tok, did in rows if lg == lang and tok == tok_b
        )
        got.update(members[:m])
    assert got == want, (docs, budget, got, want)


# --- seventh round-6 session kernels ----------------------------------


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
        st.dictionaries(
            st.sampled_from([f"w{i}" for i in range(12)]),
            st.integers(min_value=1, max_value=50),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_tv_closed_form_absent_mass_identity(per_src):
    """The algebraic identity corpus_source_divergence relies on:
    folding absent-word mass in closed form equals the naive sum over
    the FULL vocabulary, for any counts."""
    corpus: dict[str, int] = {}
    for cnt in per_src.values():
        for w, c in cnt.items():
            corpus[w] = corpus.get(w, 0) + c
    n_tot = sum(corpus.values())
    for cnt in per_src.values():
        n_s = sum(cnt.values())
        naive = sum(
            abs(cnt.get(w, 0) * n_tot - c_w * n_s) for w, c_w in corpus.items()
        )
        present = sum(
            abs(c_sw * n_tot - corpus[w] * n_s) for w, c_sw in cnt.items()
        )
        w_s = sum(corpus[w] for w in cnt)
        closed = present + (n_tot - w_s) * n_s
        assert closed == naive
        # and the resulting TV is a valid distance in [0, 1]
        assert 0 <= closed <= 2 * n_s * n_tot


@given(
    st.sets(st.integers(min_value=0, max_value=500), max_size=60),
    st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
)
@settings(max_examples=200, deadline=None)
def test_bloom_construction_never_false_negative(keys, probes):
    """For ANY key and probe sets, the h60 bloom construction used by
    agg_bloom_prefilter admits every true member (one-sided error)."""
    from go_integ_spark.functions.hashing import h60_py
    from go_integ_spark.operators.advanced import BLOOM_BITS_PER_KEY, BLOOM_K

    m = BLOOM_BITS_PER_KEY * len(keys) + 1
    bits = {h60_py(f"bloom{i}:{k}") % m for k in keys for i in range(BLOOM_K)}
    pos = {
        p
        for p in probes
        if all(h60_py(f"bloom{i}:{p}") % m in bits for i in range(BLOOM_K))
    }
    assert keys & probes <= pos  # no false negatives, ever
    assert len(bits) <= min(m, BLOOM_K * len(keys))


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_ewma_weights_bound_and_constant_fixpoint(vals):
    """The tap-truncated integer EWMA stays within the window's
    [min, max] and is exactly v on constant series."""
    from go_integ_spark.operators.events import _EWMA_WEIGHTS, EWMA_TAPS

    hist: list[int] = []
    for v in vals:
        hist.append(v)
        window = hist[-EWMA_TAPS:][::-1]
        num = sum(w * x for w, x in zip(_EWMA_WEIGHTS, window))
        den = sum(_EWMA_WEIGHTS[: len(window)])
        e = num // den
        assert min(window) <= e <= max(window)
    if len(set(vals)) == 1:
        assert e == vals[0]


# --- int64 cosine tau gate (round 7) ----------------------------------
#
# The SemDeDup pair gate: den^2*dot^2 >= num^2*na2*nb2 over vectors
# quantized by the corpus-adaptive multiplier
# SEMDEDUP_GATE_QMAX / max|x| (gate_quant_mult). Two properties
# fuzzed here, no Spark needed (the kernel math is plain numpy):
#  1. the numpy int64 path equals a pure-Python unbounded-int replay
#     (catches silent int64 overflow — numpy wraps, Python cannot);
#  2. the integer gate decides cos(qa, qb) >= num/den EXACTLY (the
#     rational comparison via Fraction — no floats anywhere).


@given(
    st.lists(
        st.lists(
            # wide magnitude range on purpose: the corpus-adaptive
            # multiplier must keep the gate int64-safe for ANY |x|
            # (a fixed scale silently wrapped on the 10x smoke
            # corpus's |x| ~ 22 embeddings)
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, width=32
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_int_cosine_gate_matches_exact_rational(vecs):
    import numpy as np
    from fractions import Fraction

    from go_integ_spark.operators.dedup import (
        SEMDEDUP_GATE_QMAX,
        SEMDEDUP_TAU_DEN,
        SEMDEDUP_TAU_NUM,
    )

    num, den = SEMDEDUP_TAU_NUM, SEMDEDUP_TAU_DEN
    e = np.array(vecs, dtype=np.float64)
    mult = SEMDEDUP_GATE_QMAX / max(float(np.abs(e).max()), 1e-30)
    q = np.floor(e * mult + 0.5).astype(np.int64)
    assert np.abs(q).max(initial=0) <= SEMDEDUP_GATE_QMAX + 1
    dot = q @ q.T
    n2 = np.diag(dot)
    ok_np = (
        (dot >= 0)
        & (n2[:, None] > 0)
        & (n2[None, :] > 0)
        & (den * den * dot * dot >= num * num * (n2[:, None] * n2[None, :]))
    )
    qs = [[int(x) for x in row] for row in q]
    for i in range(len(qs)):
        for j in range(len(qs)):
            d = sum(a * b for a, b in zip(qs[i], qs[j]))
            na2 = sum(a * a for a in qs[i])
            nb2 = sum(b * b for b in qs[j])
            ok_py = (
                d >= 0
                and na2 > 0
                and nb2 > 0
                and den * den * d * d >= num * num * na2 * nb2
            )
            assert bool(ok_np[i, j]) == ok_py, (i, j, d, na2, nb2)
            # gate == exact rational cos^2 comparison with sign guard
            if na2 > 0 and nb2 > 0:
                want = d >= 0 and Fraction(d * d, na2 * nb2) >= Fraction(
                    num * num, den * den
                )
                assert ok_py == want
