"""Bit-exact driver-paranoia sweep: every registered query vs its
oracle at sf0.01 with NO float forgiveness — IEEE bit patterns must
match (so -0.0 vs +0.0, last-ULP drift, and NaN payloads all fail).
The pytest oracle sweep rounds to 9 digits and collapses signed
zero, which is exactly how round 5's text_collocations -0.0 red
escaped local detection; this sweep closes that gap.

Usage: python scripts/strict_sweep.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _strict(v):
    if isinstance(v, bool) or v is None:
        return ("b", v)
    if isinstance(v, float):
        return ("f", struct.pack("<d", v))  # bit pattern: -0.0 != 0.0, NaN canonical per payload
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, bytes):
        return ("y", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("s", str(v))


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_strict(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> None:
    import duckdb

    from go_integ_spark.registry import load_all
    from go_integ_spark.session import get_spark
    from go_integ_spark.tables import TABLE_NAMES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="strict_sweep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    reg = load_all()
    fails = []
    for name in sorted(reg):
        spec = reg[name]
        try:
            df = spec.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            if sorted(df.columns) != sorted(o_cols):
                fails.append((name, "columns"))
                print(f"FAIL {name}: columns", flush=True)
                continue
            sc, oc = canon(df.columns, s_rows), canon(o_cols, o_rows)
            if sc != oc:
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                fails.append((name, "values"))
                print(f"FAIL {name}: values; first diffs {diffs}", flush=True)
            else:
                print(f"ok   {name} ({len(sc)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 - report-and-continue sweep
            fails.append((name, f"error {e}"))
            print(f"ERR  {name}: {str(e)[:200]}", flush=True)
    print(f"\n{len(reg) - len(fails)}/{len(reg)} bit-exact; failures: {fails}")
    spark.stop()


if __name__ == "__main__":
    main()
