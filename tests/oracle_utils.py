"""Local replica of the driver's DuckDB-oracle comparison:
row count + column names + order-insensitive value comparison with
column names sorted before comparing.

STRICT since round 7: the round-6 replica rounded floats to 9
decimals and folded -0.0 into 0.0, and two queries that passed it
("196/196 BIT-EXACT") hash-failed the real driver gate. Floats now
canonicalize to their exact round-trip ``repr`` — no rounding, and
-0.0 / 0.0 stay DISTINCT (Python's ``-0.0 == 0.0`` would otherwise
hide a signed-zero divergence the driver's hash can see). ``repr``
also separates int 1 from float 1.0, so an engine-side type drift
(e.g. a DuckDB HUGEINT reaching pandas as float — the r6
streaming_srp_registry red) fails HERE first.
"""

from __future__ import annotations

import hashlib
import math
from typing import Any

import duckdb

from go_integ_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact round-trip repr: bit-exact, keeps -0.0 distinct
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    """Driver-style digest over the canonical (name-sorted columns,
    row-sorted, strict-normed) value matrix — lets a test or sweep
    log ONE comparable token per result set."""
    h = hashlib.sha256()
    for row in canonicalize(cols, rows):
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(
    spark_df, oracle_sql: str, sf_dir: str
) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    sc = canonicalize(s_cols, s_rows)
    oc = canonicalize(o_cols, o_rows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
