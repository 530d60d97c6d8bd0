#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet dir (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with the sf tables
registered as views, sorts columns by name and rows by all columns, and
compares values exactly. Dev tool only — NOT part of the library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a hash-like strict compare; floats via repr
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s


def main(sfdir: str, outdir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            fails += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fails += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            fails += 1
        elif len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            fails += 1
        elif not g.equals(x):
            neq = (g != x).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first:")
            idx = neq[neq].index[0]
            print("  spark :", g.loc[idx].to_dict())
            print("  duckdb:", x.loc[idx].to_dict())
            fails += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
    return fails


if __name__ == "__main__":
    # optional extra args: restrict the check to the named queries
    sys.exit(1 if main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None) else 0)
