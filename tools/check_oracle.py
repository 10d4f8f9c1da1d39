#!/usr/bin/env python3
"""Dev-only harness (runs on the driver-side python, not part of the
library): approximate the driver's DuckDB-oracle compare so query/oracle
pairs can be iterated locally before a round ends.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]
(after: sbt "runMain graft.Verify <sfDir> <verifyOutDir>")
"""
import duckdb, json, sys
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # optional third arg: comma-separated name prefixes to check
    if len(sys.argv) > 3:
        prefixes = sys.argv[3].split(",")
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}
    ok = fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"[MISS ] {name}: no spark output: {str(e).splitlines()[0]}")
            fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[OERR ] {name}: oracle failed: {str(e).splitlines()[0]}")
            fail += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"[COLS ] {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            fail += 1
            continue
        if len(got) != len(exp):
            print(f"[ROWS ] {name}: spark={len(got)} oracle={len(exp)}")
            fail += 1
            continue
        dt_g = [str(t) for t in got.dtypes]
        dt_e = [str(t) for t in exp.dtypes]
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if g.equals(e):
            tag = "OK   " if dt_g == dt_e else "OK/DT"
            extra = "" if dt_g == dt_e else f"  dtypes spark={dt_g} oracle={dt_e}"
            print(f"[{tag}] {name} ({len(got)} rows){extra}")
            ok += 1
        else:
            fail += 1
            bad = []
            for c in g.columns:
                col_eq = (g[c] == e[c]) | (g[c].isna() & e[c].isna())
                if not col_eq.all():
                    i = int((~col_eq).idxmax())
                    bad.append(f"{c}[row{i}]: {g[c][i]!r} vs {e[c][i]!r}")
            print(f"[DIFF ] {name}: {'; '.join(bad[:4])}")
    print(f"\n{ok} ok, {fail} fail / {ok+fail} total")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
