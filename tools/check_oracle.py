#!/usr/bin/env python3
"""Dev-only harness (runs on the driver-side python, not part of the
library): approximate the driver's DuckDB-oracle compare so query/oracle
pairs can be iterated locally before a round ends.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir] [prefixes] [--json PATH]
(after: sbt "runMain graft.Verify <sfDir> <verifyOutDir>")

--json PATH writes the driver-shaped per-query verdict map
  {name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}}
so a round's correctness signal survives even if the driver's own
CORRECTNESS_r{N}.json artifact goes missing (round 15 arrived empty).
The builder commits this as CORRECTNESS_builder_r{N}.json each round.
"""
import duckdb, json, sys
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # optional third arg: comma-separated name prefixes to check
    if len(args) > 2:
        prefixes = args[2].split(",")
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}
    ok = fail = 0
    verdicts = {}
    for name in sorted(oracle):
        sql = oracle[name]
        v = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None}
        verdicts[name] = v
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            msg = str(e).splitlines()[0]
            print(f"[MISS ] {name}: no spark output: {msg}")
            v["err"] = f"no spark output: {msg}"
            fail += 1
            continue
        v["spark_rows"] = len(got)
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            msg = str(e).splitlines()[0]
            print(f"[OERR ] {name}: oracle failed: {msg}")
            v["err"] = f"oracle failed: {msg}"
            fail += 1
            continue
        v["oracle_rows"] = len(exp)
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"[COLS ] {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            v["err"] = f"columns: spark={list(got.columns)} oracle={list(exp.columns)}"
            fail += 1
            continue
        v["schema_match"] = True
        if len(got) != len(exp):
            print(f"[ROWS ] {name}: spark={len(got)} oracle={len(exp)}")
            v["err"] = f"rows: spark={len(got)} oracle={len(exp)}"
            fail += 1
            continue
        v["rows_match"] = True
        dt_g = [str(t) for t in got.dtypes]
        dt_e = [str(t) for t in exp.dtypes]
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if g.equals(e):
            tag = "OK   " if dt_g == dt_e else "OK/DT"
            extra = "" if dt_g == dt_e else f"  dtypes spark={dt_g} oracle={dt_e}"
            print(f"[{tag}] {name} ({len(got)} rows){extra}")
            v["hash_match"] = True
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
            v["err"] = f"value diff: {'; '.join(bad[:2])}"
    if json_out:
        with open(json_out, "w") as f:
            json.dump(verdicts, f, indent=1, sort_keys=True)
        print(f"verdict map -> {json_out}")
    print(f"\n{ok} ok, {fail} fail / {ok+fail} total")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
