#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>'s parquet tables, and compares row count, column names/types,
and exact values. Dev tool only — the shipped library has no Python deps.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            fails += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            fails += 1
            continue
        got_r = got.reset_index(drop=True)
        exp_r = exp.reset_index(drop=True)
        mismatch = None
        for c in got.columns:
            a, b = got_r[c], exp_r[c]
            try:
                same = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                same = a.astype(str).values == b.astype(str).values
            if not same.all():
                i = int((~same).argmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i])
                break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duckdb={bv!r}")
            fails += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
