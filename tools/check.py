#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sf tables registered as views, and compares against the Spark parquet
dump in <verifyOutDir>/<name>/. Compare = sort columns by name, sort
rows, exact value equality (floats compared bit-exact AND with 1e-9
rel tolerance reported separately).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    rows = [tuple(norm(r[i]) for i in order) for r in data]
    return sorted(cols), sorted(rows, key=repr)


def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional subset: comma-separated names
        names = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            dcols, drows = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            scols, srows = rows_of(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if dcols != scols:
            print(f"FAIL {name}: columns differ duck={dcols} spark={scols}")
            n_fail += 1
            continue
        if len(drows) != len(srows):
            print(f"FAIL {name}: rowcount duck={len(drows)} spark={len(srows)}")
            n_fail += 1
            continue
        exact = drows == srows
        if exact:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
            continue
        # find first diff
        bad = None
        for i, (dr, sr) in enumerate(zip(drows, srows)):
            if dr != sr:
                ok = all(approx_eq(a, b) for a, b in zip(dr, sr))
                bad = (i, dr, sr, ok)
                if not ok:
                    break
        i, dr, sr, ok = bad
        tag = "FAIL(tolerance-only)" if ok else "FAIL"
        print(f"{tag} {name}: row {i}\n  duck : {dr}\n  spark: {sr}")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
