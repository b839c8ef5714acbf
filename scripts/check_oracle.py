#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
testdata tables registered as views, and compares against the Spark
parquet dump in <verifyOutDir>/<name>/ — column names (sorted), row
count, and exact values (rows sorted by all columns). Prints a per-
query verdict and a nonzero exit if anything mismatches.

Dev-only tool (the driver has its own comparator); not part of the
Scala library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = []
    for name in sorted(oracle):
        try:
            odf = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures.append(name)
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failures.append(name)
            continue
        ocols, scols = sorted(odf.column_names), sorted(sdf.column_names)
        if ocols != scols:
            print(f"FAIL {name}: columns differ\n  oracle: {ocols}\n  spark:  {scols}")
            failures.append(name)
            continue
        if odf.num_rows != sdf.num_rows:
            print(f"FAIL {name}: rows oracle={odf.num_rows} spark={sdf.num_rows}")
            failures.append(name)
            continue
        orows = sorted(tuple(canon(r[c]) for c in ocols) for r in odf.to_pylist())
        srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.to_pylist())
        if orows != srows:
            ndiff = sum(1 for a, b in zip(orows, srows) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(orows)} rows differ")
            for a, b in list(zip(orows, srows))[:200]:
                if a != b:
                    print(f"  oracle: {a}\n  spark:  {b}")
                    break
            failures.append(name)
            continue
        print(f"ok   {name} ({odf.num_rows} rows)")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
