#!/usr/bin/env python3
"""Partition-count invariance audit: bitwise-compare two graft.Verify
output dirs (e.g. local[32] vs local[4]) query by query with DuckDB
EXCEPT in both directions. (Local iteration tool only.)

Usage: python3 tools/compare_runs.py <outDirA> <outDirB>
"""
import sys, glob, os
import duckdb

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    n_ok = n_bad = 0
    for name in names:
        fa = glob.glob(f"{a_dir}/{name}/*.parquet")
        fb = glob.glob(f"{b_dir}/{name}/*.parquet")
        if not fa or not fb:
            print(f"MISS {name}: a={len(fa)} b={len(fb)}"); n_bad += 1; continue
        try:
            d1 = con.execute(
                f"SELECT COUNT(*) FROM (SELECT * FROM read_parquet({fa!r}) "
                f"EXCEPT ALL SELECT * FROM read_parquet({fb!r}))").fetchone()[0]
            d2 = con.execute(
                f"SELECT COUNT(*) FROM (SELECT * FROM read_parquet({fb!r}) "
                f"EXCEPT ALL SELECT * FROM read_parquet({fa!r}))").fetchone()[0]
        except Exception as e:
            print(f"ERR  {name}: {e}"); n_bad += 1; continue
        if d1 or d2:
            print(f"DIFF {name}: a-only={d1} b-only={d2}"); n_bad += 1
        else:
            n_ok += 1
    print(f"== {n_ok} identical, {n_bad} different/missing of {len(names)}")

if __name__ == "__main__":
    main()
