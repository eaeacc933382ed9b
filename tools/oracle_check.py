#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just lets us catch oracle
mismatches before the driver does).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir (Spark parquet) runs the matching SQL
from oracle_sql.json in DuckDB with each table of sfDir registered as a view,
then compares: column names (sorted), row counts, and values (rows sorted).
"""
import json, sys, glob, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows; normalize floats/NaN for compare
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols, got_rows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            exp_cols, exp_rows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}"); n_fail += 1; continue
        gt = dict(zip(got.columns, [str(t) for t in got.types]))
        et = dict(zip(exp.columns, [str(t) for t in exp.types]))
        tdiff = {c: (gt[c], et[c]) for c in gt if gt[c] != et[c]}
        if tdiff:
            print(f"WARN {name}: type mismatch {tdiff}")
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}"); n_fail += 1; continue
        if got_rows != exp_rows:
            bad = next(i for i,(a,b) in enumerate(zip(got_rows,exp_rows)) if a!=b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {got_rows[bad]}")
            print(f"  duckdb: {exp_rows[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
