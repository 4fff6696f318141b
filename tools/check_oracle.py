#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]
(Local iteration tool only — the shipped library is pure Scala/Spark.)
With jsonOut, also writes a driver-style per-query artifact
{name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}}.
"""
import json, sys, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    results = {}
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0

    def record(name, rows=False, schema=False, hsh=False, sr=None, orr=None, err=None):
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hsh, "spark_rows": sr,
                         "oracle_rows": orr, "err": err}

    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record(name, err="no_spark_output"); continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            record(name, err=str(e)[:200]); continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            record(name, rows=len(got) == len(want), sr=len(got), orr=len(want),
                   err="schema_mismatch"); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1
            record(name, schema=True, sr=len(got), orr=len(want),
                   err="row_count_mismatch"); continue
        bad = None
        # Dtype-kind mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark
        # BIGINT -> int64) passes == but fails the driver's value hash.
        kind_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                    for c in got.columns
                    if got[c].dtype.kind != want[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch {kind_bad}")
            n_fail += 1
            record(name, rows=True, sr=len(got), orr=len(want),
                   err=f"dtype_kind_mismatch {kind_bad}"[:200]); continue
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
            record(name, rows=True, schema=True, sr=len(got), orr=len(want),
                   err=f"value_mismatch col {c} row {i}: spark={av!r} oracle={bv!r}"[:200])
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            record(name, rows=True, schema=True, hsh=True,
                   sr=len(got), orr=len(want))
    # queries without oracles: rows-only
    for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(qdir)
        if name not in oracles:
            files = glob.glob(qdir + "/*.parquet")
            if not files:
                # a failed Verify leaves an empty dir — report it as a
                # failure instead of crashing before the summary/jsonOut
                print(f"ROWS {name}: no spark output EMPTY!")
                n_fail += 1
                record(name, err="no_spark_output")
                continue
            n = con.execute(
                f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            record(name, rows=n > 0, sr=n, err="no_oracle")
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
