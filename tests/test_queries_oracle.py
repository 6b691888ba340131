"""Every registered query with an oracle must match DuckDB at
sf0.001 (fast) — the same comparison the driver runs at sf0.01.
Run the slow full check with GO_INTEG_SF=/root/testdata/sf0.01.
"""

from __future__ import annotations

import os

import pytest

from go_integ_spark.registry import load_all
from tests.oracle_utils import compare

SF_DIR = os.environ.get("GO_INTEG_SF", "/root/testdata/sf0.001")

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    ok, msg = compare(df, spec.oracle, SF_DIR)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
