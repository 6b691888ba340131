"""Strict bit-exact verify for a subset of registered queries.

Usage: python scripts/verify_queries.py name1 [name2 ...] [--sf DIR]
Same comparison class as strict_sweep.py (IEEE bit patterns, no
rounding forgiveness) but only for the named queries — the fast
inner loop while developing a new operator.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strict_sweep import canon  # noqa: E402


def main() -> None:
    import duckdb

    from go_integ_spark.registry import load_all
    from go_integ_spark.session import get_spark
    from go_integ_spark.tables import TABLE_NAMES

    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args):
            sys.exit("usage: verify_queries.py name [name ...] [--sf DIR]")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        sys.exit("usage: verify_queries.py name [name ...] [--sf DIR]")
    spark = get_spark(app_name="verify_queries", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    reg = load_all()
    bad = 0
    for name in args:
        try:
            spec = reg[name]
            df = spec.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            if sorted(df.columns) != sorted(o_cols):
                print(f"FAIL {name}: columns {sorted(df.columns)} vs {sorted(o_cols)}")
                bad += 1
                continue
            sc, oc = canon(df.columns, s_rows), canon(o_cols, o_rows)
            if sc != oc:
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                only_s = [r for r in sc if r not in oc][:2]
                only_o = [r for r in oc if r not in sc][:2]
                print(f"FAIL {name}: values ({len(sc)} vs {len(oc)} rows)")
                print("  first aligned diffs:", diffs)
                print("  spark-only:", only_s)
                print("  oracle-only:", only_o)
                bad += 1
            else:
                print(f"ok   {name} ({len(sc)} rows) @ {sf_dir}")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {str(e)[:400]}")
            bad += 1
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    main()
