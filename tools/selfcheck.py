#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs `graft.Verify` output (parquet per query + oracle_sql.json) against
DuckDB on the same testdata tables and reports per-query match status.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"----  {name}: no oracle ({len(got)} rows)")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        # value compare: exact on strings/ints, tolerant-then-exact report on floats
        mismatch = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            if str(gv.dtype).startswith("float") or str(ev.dtype).startswith("float"):
                import numpy as np
                if not np.allclose(gv.fillna(-9e99), ev.fillna(-9e99), rtol=0, atol=1e-9):
                    mismatch = c
                    break
                if not (gv.fillna(-9e99) == ev.fillna(-9e99)).all():
                    print(f"WARN  {name}: column {c} equal only within 1e-9 (hash may differ)")
            else:
                if not (gv.astype(str) == ev.astype(str)).all():
                    mismatch = c
                    break
        if mismatch:
            print(f"FAIL  {name}: value mismatch in column {mismatch}")
            bad = (g[mismatch].astype(str) != e[mismatch].astype(str))
            print(pd.concat([g[bad].head(3), e[bad].head(3)], axis=1))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
