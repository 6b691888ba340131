"""Every registered query with an oracle must match DuckDB at
sf0.001 (fast) — the same comparison the driver runs at sf0.01.
Run the slow full check with GO_INTEG_SF=/root/testdata/sf0.01.

Also the GATE-SHAPE guard (VERDICT r5 item 8): the driver's
canonicalizer pandas-lexsorts every output column, so an array / map
/ struct column in a gate output crashes the comparison before any
values are checked (three r5 reds shared that one root cause), and a
None oracle records a permanently-red ``no_oracle`` row. Both
failure classes are structurally rejected here.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from go_integ_spark.registry import load_all
from tests.oracle_utils import compare

SF_DIR = os.environ.get("GO_INTEG_SF", "/root/testdata/sf0.001")

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)

# Queries allowed to register oracle=None (rows-only driver check).
# Empty: every registered query carries a full value oracle — the
# iterative ones (kmeans, BPE) unroll their fixed iteration counts.
ROWS_ONLY_ALLOWLIST: set[str] = set()

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _assert_gate_shape(name: str, df) -> None:
    for f in df.schema.fields:
        assert not isinstance(f.dataType, _COMPLEX), (
            f"{name}: gate output column {f.name!r} has complex type "
            f"{f.dataType.simpleString()}; the driver canonicalizer "
            "cannot hash it — serialize (array_join / to_json) in the "
            "gate projection and expose the typed form as a library fn"
        )


def test_no_unlisted_rows_only_queries():
    assert set(ROWS_ONLY_QUERIES) <= ROWS_ONLY_ALLOWLIST, (
        "queries registered with oracle=None (red 'no_oracle' driver "
        f"rows): {sorted(set(ROWS_ONLY_QUERIES) - ROWS_ONLY_ALLOWLIST)}"
    )


def test_oracle_output_types_are_version_safe(spark):
    """Cross-engine TYPE audit (the r6 red-row class nothing else
    catches): the driver hashes both result sets through pandas, so
    an oracle output column whose DuckDB type is build-dependent
    (HUGEINT from list_sum/sum, FLOAT, unsigned) or disagrees with
    the Spark column's type can hash-diverge on the driver host while
    the local fetchall()-based value comparison — which yields plain
    Python ints either way — stays green forever. Both r6 hash-reds
    (dedup_semdedup.dist2_u = raw list_sum HUGEINT,
    streaming_srp_registry.bucket = unnest of a list_sum element)
    were this class."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from audit_oracle_types import audit

    bad = audit(spark)
    assert not bad, "type-fragile oracle outputs:\n  " + "\n  ".join(bad)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    _assert_gate_shape(name, df)
    ok, msg = compare(df, spec.oracle, SF_DIR)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    _assert_gate_shape(name, df)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
