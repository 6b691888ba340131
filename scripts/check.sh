#!/usr/bin/env bash
# Round-close validation in one command (the repo-local analogue of
# the reference's go.yml race+cover gate on every push): lint/syntax,
# the full pytest suite — which includes the every-registered-query
# DuckDB oracle sweep at sf0.001 (tests/test_queries_oracle.py) —
# and the two driver-facing surfaces (bench JSON line with contention
# flag; __spark_entry__ contract is exercised by tests/test_schema.py).
#
#   scripts/check.sh            # full check (~5 min)
#   GO_INTEG_SF=/root/testdata/sf0.01 scripts/check.sh   # slow sweep
#
# Deeper sweeps (run before a round close, not per push):
#   python scripts/strict_sweep.py /root/testdata/sf0.01   # bit-exact
#   python scripts/strict_sweep.py /root/testdata/sf0.1    # 10x-scale
# The sf0.1 strict sweep is the one that caught the fixed-probe-count
# recall regression in the embedding-dedup family (round 6) — scale
# factors exercise different cell/bucket geometry than the gate SF.
set -euo pipefail
cd "$(dirname "$0")/.."

if command -v ruff >/dev/null 2>&1; then
    ruff check go_integ_spark tests scripts bench.py __spark_entry__.py
else
    echo "== ruff not installed; syntax-checking via compileall =="
    python -m compileall -q go_integ_spark tests scripts bench.py __spark_entry__.py
fi

echo "== pytest (full suite incl. sf0.001 oracle sweep) =="
python -m pytest tests/ -x -q

echo "== bench CLI (one JSON line expected) =="
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
python bench.py 2>/dev/null | python -c '
import json, sys
line = sys.stdin.readline()
d = json.loads(line)
assert {"metric", "value", "unit", "queries", "sf", "contended"} <= d.keys(), d.keys()
print("bench ok: %ss, contended=%s" % (d["value"], d["contended"]))
'

echo "== check.sh PASSED =="
