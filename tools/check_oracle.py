"""Local oracle-parity harness: run every registered query on Spark and
its DuckDB oracle over the same parquet, compare row count, column
names, and order-insensitive values (sorted columns, stringified rows).

Approximates the driver's CORRECTNESS gate so mismatches surface before
a round ends. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from map_reduce_framework_using_python_spark.oracle import (  # noqa: E402
    canon_rows,
    type_mismatches,
)
from map_reduce_framework_using_python_spark.plans import REGISTRY  # noqa: E402
from map_reduce_framework_using_python_spark.session import get_spark  # noqa: E402
from map_reduce_framework_using_python_spark.sources.io import TABLES  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    unknown = only - set(REGISTRY)
    if unknown:
        # A typo'd name must not make the gate pass vacuously with
        # "0 pass, 0 fail" and exit 0 (r7 tools review).
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for name in TABLES:
        src = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(src):
            # Spark-written datasets are DIRECTORIES of part files;
            # DuckDB needs the glob form for those (r7 tools review).
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    n_pass = n_fail = n_skip = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"SKIP {name}: rows-only ({len(srows)} rows)")
            n_skip += 1
            continue
        try:
            rel = con.sql(q.oracle)
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        type_errs = type_mismatches(sdf.dtypes, rel.columns, rel.types)
        if type_errs:
            print(f"FAIL {name}: type divergence: {'; '.join(type_errs)}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        s_can = canon_rows([c.lower() for c in scols], srows)
        d_can = canon_rows(dcols, drows)
        if s_can != d_can:
            diff = [(a, b) for a, b in zip(s_can, d_can) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diff}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
