"""Mimic the driver's correctness gate: run every __spark_entry__ query at a
given sf dir and compare with the DuckDB oracle (row count + schema-ish +
order-insensitive values, columns sorted by name). Usage:

    python scripts/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    return v


def normalize(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return cols, sorted(rows, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from blacklab_spark.session import get_spark

    spark = get_spark("check-entry", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL-oracle] {name}: {e}")
            continue
        sc, sr = normalize(sdf)
        oc, orr = normalize(odf)
        ok = True
        if sc != oc:
            ok = False
            failures.append((name, f"columns differ: spark={sc} oracle={oc}"))
        elif len(sr) != len(orr):
            ok = False
            failures.append((name, f"row count: spark={len(sr)} oracle={len(orr)}"))
        elif sr != orr:
            ok = False
            diffs = [
                (a, b) for a, b in zip(sr, orr) if a != b
            ][:3]
            failures.append((name, f"values differ, first diffs: {diffs}"))
        print(f"[{'ok' if ok else 'FAIL'}] {name}: {len(sr)} rows  ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:500]}")
        sys.exit(1)
    print("all checked queries match")


if __name__ == "__main__":
    main()
