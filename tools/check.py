#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness compare.

Usage: python3 tools/check.py <outDir> <sfDir> [query...]

Reads each <outDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over
the raw parquet tables in <sfDir>, canonicalizes both sides (columns
sorted by name, rows sorted, values stringified) and hash-compares.
"""
import sys, json, hashlib, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            try: v = list(v.tolist() if hasattr(v, "tolist") else v)
            except Exception: pass
            if isinstance(v, list):
                return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d): continue
        if only and name not in only: continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pq.read_table(f).to_pandas() for f in files]) if files \
              else pd.DataFrame()
        if name not in oracle:
            print(f"  ?  {name}: no oracle ({len(got)} rows)")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs oracle {wc}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            n_fail += 1; continue
        if canon(got) != canon(want):
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            g = got.reindex(gc, axis=1).sort_values(gc).head(5)
            w = want.reindex(wc, axis=1).sort_values(wc).head(5)
            print("  got:\n", g.to_string(), "\n  want:\n", w.to_string())
            n_fail += 1; continue
        print(f"  ok {name} ({len(got)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
