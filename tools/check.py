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
    # optional --json <path>: also write the machine-readable tally the
    # round commits as CORRECTNESS_SELF.json (VERDICT r16 item 2 — the
    # driver's own correctness artifact came back empty once; the
    # builder's mirror tally makes that immediately adjudicable)
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check.py [--json <tally.json>] <outDir> <sfDir> [query...]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        sys.exit("usage: check.py [--json <tally.json>] <outDir> <sfDir> [query...]")
    out_dir, sf_dir = args[0], args[1]
    only = set(args[2:])
    results = {}
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
            results[name] = {"status": "rows_only", "rows": len(got),
                             "ok": bool(len(got) > 0)}
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            results[name] = {"status": "oracle_error", "ok": False}
            n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs oracle {wc}")
            results[name] = {"status": "schema_mismatch", "ok": False}
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            results[name] = {"status": "row_count_mismatch", "ok": False,
                             "rows": len(got), "oracle_rows": len(want)}
            n_fail += 1; continue
        if canon(got) != canon(want):
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            g = got.reindex(gc, axis=1).sort_values(gc).head(5)
            w = want.reindex(wc, axis=1).sort_values(wc).head(5)
            print("  got:\n", g.to_string(), "\n  want:\n", w.to_string())
            results[name] = {"status": "hash_mismatch", "ok": False, "rows": len(got)}
            n_fail += 1; continue
        print(f"  ok {name} ({len(got)} rows)")
        results[name] = {"status": "ok", "ok": True, "rows": len(got)}
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        tally = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "n_rows_only": sum(1 for r in results.values()
                                    if r["status"] == "rows_only"),
                 "queries": results}
        with open(json_out, "w") as f:
            json.dump(tally, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)

main()
