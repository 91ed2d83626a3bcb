#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle_sql.json query in DuckDB over <sfDir>'s tables, sorts
columns by name, and compares values exactly (with a float near-miss
report to distinguish real bugs from ulp noise).
"""
import duckdb, glob, json, math, os, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; amplified corpora (AmplifyFull) are
        # Spark-written DIRECTORIES of part files under the same name
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{outdir}/*")
                    if os.path.isdir(p)])
    n_ok = 0
    for name in names:
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"{name:35s} NO-OUTPUT"); continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        got = got[sorted(got.columns)]
        if name not in oracle:
            print(f"{name:35s} rows-only ({len(got)} rows)"
                  + ("  EMPTY!" if len(got) == 0 else ""))
            n_ok += len(got) > 0
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name:35s} ORACLE-ERROR {e}"); continue
        exp = exp[sorted(exp.columns)]
        status, detail = compare(exp, got)
        n_ok += status == "OK"
        print(f"{name:35s} {status} {detail}")
    print(f"== {n_ok}/{len(names)} ok")

def compare(exp, got):
    if list(exp.columns) != list(got.columns):
        return "COLS-DIFF", f"oracle={list(exp.columns)} got={list(got.columns)}"
    if len(exp) != len(got):
        return "ROWS-DIFF", f"oracle={len(exp)} got={len(got)}"
    # The driver hashes pandas values, so a dtype mismatch (e.g. DuckDB
    # HUGEINT -> float64/object vs Spark int64) hash-mismatches even when
    # the values are numerically equal. Fail loudly on dtype drift here so
    # the local sweep catches it before the driver does.
    dt_diff = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
               if str(exp[c].dtype) != str(got[c].dtype)]
    if dt_diff:
        c, ed, gd = dt_diff[0]
        return "DTYPE-DIFF", f"col={c} oracle={ed} got={gd} (cast the oracle SQL)"
    worst = 0.0
    for c in exp.columns:
        e, g = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(e, g)):
            a_na = a is None or (not isinstance(a, (list, tuple)) and pd.isna(a))
            b_na = b is None or (not isinstance(b, (list, tuple)) and pd.isna(b))
            if a_na or b_na:
                if a_na and b_na:
                    continue
                return "VAL-DIFF", f"col={c} row={i} oracle={a} got={b}"
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    rel = abs(a - b) / max(abs(a), abs(b), 1e-300)
                    if rel > 1e-9:
                        return "VAL-DIFF", f"col={c} row={i} oracle={a!r} got={b!r}"
                    worst = max(worst, rel)
                continue
            if a != b:
                return "VAL-DIFF", f"col={c} row={i} oracle={a!r} got={b!r}"
    return "OK", (f"({len(exp)} rows, float-ulp worst={worst:.2e})"
                  if worst else f"({len(exp)} rows, exact)")

if __name__ == "__main__":
    main()
