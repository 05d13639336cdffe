#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle. Usage:
    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
(Driver-side tooling only — the Spark library itself has no Python deps.)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        diff = None
        for c in got.columns:
            a, b = got[c], want[c]
            # The driver's compare hashes typed values: an int column on one
            # side vs float on the other (e.g. a DuckDB HUGEINT window sum
            # arriving as float64) fails there even when the values are
            # equal — flag it here so local runs match the driver.
            ka, kb = a.dtype.kind, b.dtype.kind
            dtype_diff = None
            if ka != kb and {ka, kb} <= {"i", "u", "f"} and "f" in (ka, kb):
                # record it but still run the value comparison below: when a
                # nullable int column holds NULLs on one side, pandas coerces
                # that side to float64 and the per-row value diff (the
                # actionable part) would otherwise be hidden
                dtype_diff = f"col {c}: dtype kind mismatch spark={a.dtype} oracle={b.dtype}"
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                ok = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
            else:
                ok = (a == b) | (a.isna() & b.isna())
            if not ok.all():
                i = ok.idxmin()
                diff = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
                if dtype_diff:
                    diff = f"{dtype_diff}; {diff}"
                break
            if dtype_diff:
                diff = dtype_diff
                break
        if diff:
            print(f"FAIL {name}: {diff}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
