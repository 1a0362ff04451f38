#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<query>/ parquet dirs + <outDir>/oracle_sql.json. Registers the
testdata parquet tables as DuckDB views, runs each oracle, and compares
(columns sorted by name, rows sorted by all columns, exact equality).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file parquet; synthesized scale dirs
        # (BenchScale) are spark-written DIRECTORIES of part files
        import os
        src = f"{sf}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        if not glob.glob(src):
            continue  # table absent at this scale point (partial synth)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        s, d = norm(sdf), norm(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        bad = None
        # The driver's hash is numeric-dtype-sensitive (e.g. DuckDB SUM(BIGINT) ->
        # HUGEINT -> float64 via pandas, vs Spark int64): an int-vs-float mismatch
        # fails even when every value compares numerically equal. Datetime
        # resolution (ns vs us) and date-as-object differences are tolerated
        # (empirically driver-green in round 2).
        for c in s.columns:
            # distinct names: do NOT shadow `sf` (the scale-factor dir) above
            s_int = np.issubdtype(s[c].dtype, np.integer)
            s_flt = np.issubdtype(s[c].dtype, np.floating)
            d_int = np.issubdtype(d[c].dtype, np.integer)
            d_flt = np.issubdtype(d[c].dtype, np.floating)
            if (s_int and d_flt) or (s_flt and d_int):
                bad = f"col {c} dtype: spark={s[c].dtype} duck={d[c].dtype}"
                break
            # DuckDB DECIMAL arithmetic (e.g. an uncast `0.0 + x * 25000.0`)
            # lands in pandas as object-Decimal while Spark emits float64 —
            # norm() stringifies the object side, the numeric fallback below
            # parses it back, and the mismatch survives to the driver's
            # type-sensitive hash. Flag numeric-vs-object too.
            s_num, d_num = s_int or s_flt, d_int or d_flt
            if (s_num and d[c].dtype == object) or (d_num and s[c].dtype == object):
                bad = f"col {c} dtype: spark={s[c].dtype} duck={d[c].dtype} (numeric vs object)"
                break
        for c in (s.columns if bad is None else []):
            a, b = s[c].values, d[c].values
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
                af = pd.to_numeric(s[c], errors="coerce").values.astype(float)
                bf = pd.to_numeric(d[c], errors="coerce").values.astype(float)
                eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            else:
                eq = (pd.Series(a).astype(str).values == pd.Series(b).astype(str).values)
            if not eq.all():
                i = int(np.argmin(eq))
                bad = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} ({int((~eq).sum())} diffs)"
                break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
