"""Run every oracle-paired query through Spark AND DuckDB and compare,
the way the driver's correctness gate does (row count + column names +
order-insensitive values). Exact float equality — the bar is the
driver's value-hash.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from cassandra_data_migrator_spark.entry_queries import ORACLES, QUERIES, TABLES  # noqa: E402
from cassandra_data_migrator_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLES.get(name)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:24s} spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if sql is None:
            print(f"skip  {name:24s} (no oracle; spark rows={len(s_rows)})")
            continue
        try:
            rel = con.sql(sql)
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:24s} duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        dt = time.time() - t0
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL  {name:24s} columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL  {name:24s} rowcount spark={len(s_rows)} duck={len(d_rows)}")
            continue
        a = norm_rows(s_cols, s_rows)
        b = norm_rows(d_cols, d_rows)
        if a != b:
            failures.append(name)
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {name:24s} values differ at sorted-row {bad}:")
            print(f"      spark: {a[bad]}")
            print(f"      duck : {b[bad]}")
            continue
        print(f"ok    {name:24s} rows={len(s_rows):6d}  {dt:5.1f}s")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
