#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<name>/ parquet dirs + <outDir>/oracle_sql.json. Registers the sf
parquet tables as DuckDB views, runs each oracle, and compares row sets
(sorted by all columns, values normalized to strings) against the Spark
result.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if pd.isna(v):
            return "NULL"
        return repr(v)  # full precision
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def norm_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.apply(lambda col: col.map(norm_cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a Spark-side crash leaves no output dir; that must FAIL, not vanish
    for name in sorted(oracles):
        if not os.path.isdir(os.path.join(out, name)):
            print(f"FAIL {name}: no Spark dump (query crashed?)")
            n_fail += 1
    for name in sorted(os.listdir(out)):
        d = os.path.join(out, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e_ = norm_df(got), norm_df(exp)
        if list(g.columns) != list(e_.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e_.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e_):
            print(f"FAIL {name}: rows {len(g)} vs {len(e_)}")
            n_fail += 1
            continue
        if not g.equals(e_):
            diff = (g != e_).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != e_.at[i, c]:
                        print(f"    row {i} col {c}: spark={g.at[i,c]!r} oracle={e_.at[i,c]!r}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
