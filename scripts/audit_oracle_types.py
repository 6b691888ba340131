"""Audit every oracle's OUTPUT column types against the Spark
query's schema — the r6 red-row class nothing else catches.

Why: the driver converts BOTH result sets through pandas before
hashing. DuckDB's `list_sum` / `sum` return HUGEINT on some builds
and BIGINT on others, `cursor.fetchall()` hands Python ints either
way (so the repo's local value comparison can NEVER see the
difference), but a pandas conversion of HUGEINT yields float64 /
object — and then the driver's value hash of `2.3e13` (float) vs
`23000000000000` (int) diverges even though every VALUE is equal.
Both r6 hash-reds fit this exactly: `dedup_semdedup` exposed the
Lloyd-assign CTE's raw `list_sum` as `dist2_u`, and
`streaming_srp_registry` exposed the SRP bucket CTE's unnest of a
`list_sum`-derived element as `bucket`.

The contract this audit enforces: for every registered query, each
oracle output column's DuckDB type must (a) be in the SAFE set —
types whose pandas mapping is unambiguous across DuckDB versions —
and (b) agree with the Spark column's type under the canonical
mapping. Run: python scripts/audit_oracle_types.py [sf_dir]
(or set GO_INTEG_SF; default /root/testdata/sf0.001).

Note on cost: Spark schemas come from fully CONSTRUCTING each
registered query (schema-only, no action — but operators that do
bounded driver-side collects at build time, e.g. ivf_centroids, run
those little jobs). Against the sf0.001 default that is ~2 min for
the whole registry; pointing at a bigger sf_dir or a missing dir
makes the audit slow or fail, which is why the dir is a parameter.
A query whose build fails is reported per-query, not an abort.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GO_INTEG_SF", "/root/testdata/sf0.001")

# DuckDB type -> the Spark simpleString()s it may legitimately pair
# with. HUGEINT/UBIGINT/FLOAT/UHUGEINT are deliberately ABSENT: their
# pandas mapping is build-dependent, so an oracle must CAST them.
SAFE_PAIRS = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "TINYINT": {"tinyint"},
    "DOUBLE": {"double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
}


def audit(spark) -> list[str]:
    """Every violation as one human-readable line; empty == safe.
    Shared by the CLI below and tests/test_queries_oracle.py."""
    import duckdb

    from go_integ_spark.registry import load_all
    from go_integ_spark.tables import TABLE_NAMES

    reg = load_all()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    bad: list[str] = []
    for name, spec in sorted(reg.items()):
        if spec.oracle is None:
            continue
        try:
            rel = con.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
            o_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as exc:  # report, keep auditing the rest
            bad.append(f"{name}: oracle failed to bind: {exc}")
            continue
        try:
            s_types = {
                f.name: f.dataType.simpleString()
                for f in spec.fn(spark, SF_DIR).schema.fields
            }
        except Exception as exc:  # schema derivation must not abort audit
            bad.append(f"{name}: spark schema failed: {exc}")
            continue
        for col, ot in o_types.items():
            base = ot.split("(")[0]
            st = s_types.get(col)
            if st is None:
                bad.append(f"{name}.{col}: oracle-only column (spark lacks it)")
            elif base not in SAFE_PAIRS:
                bad.append(
                    f"{name}.{col}: oracle type {ot} is version-fragile "
                    f"(spark {st}) — CAST it"
                )
            elif st not in SAFE_PAIRS[base]:
                bad.append(
                    f"{name}.{col}: oracle {ot} vs spark {st} — "
                    "pandas canonicalization may diverge"
                )
    con.close()
    return bad


def main() -> None:
    from go_integ_spark.session import get_spark

    global SF_DIR
    if len(sys.argv) > 1:
        SF_DIR = sys.argv[1]
    if not os.path.isdir(SF_DIR):
        sys.exit(f"sf_dir {SF_DIR!r} does not exist — pass one as argv[1]")
    spark = get_spark(
        app_name="audit_oracle_types", master="local[4]", shuffle_partitions=4
    )
    bad = audit(spark)
    if bad:
        print(f"FLAGGED {len(bad)} column(s):")
        for b in bad:
            print(" ", b)
        sys.exit(1)
    print("OK: all oracle outputs type-safe")


if __name__ == "__main__":
    main()
