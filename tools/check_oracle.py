#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Local iteration tool only — the shipped library is pure Scala/Spark.)
"""
import json, sys, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        bad = None
        # Dtype-kind mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark
        # BIGINT -> int64) passes == but fails the driver's value hash.
        kind_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                    for c in got.columns
                    if got[c].dtype.kind != want[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch {kind_bad}")
            n_fail += 1; continue
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (c, i, a[i], b[i], int((~eq).sum())); break
        if bad:
            c, i, av, bv, n = bad
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} ({n} diffs)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # queries without oracles: rows-only
    for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(qdir)
        if name not in oracles:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet({glob.glob(qdir+'/*.parquet')!r})"
            ).fetchone()[0]
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
