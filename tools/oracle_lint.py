#!/usr/bin/env python3
"""Oracle output-type lint — guards the correctness gate's hash compare.

The driver hashes the DuckDB result *representation*, so an oracle whose
output column DuckDB types wider than Spark writes (HUGEINT for a bare
top-level SUM(BIGINT), or DECIMAL) hash-mismatches even when every value
is identical. Round 7 lost 12 green rows to exactly this. This lint plans
every oracle with LIMIT 0 and fails on any HUGEINT/UHUGEINT/DECIMAL
output column; the fix is always an outer CAST(... AS BIGINT/DOUBLE).

Usage: python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>
  e.g. sbt "runMain graft.DumpOracles target/oracle_sql.json" &&
       python3 tools/oracle_lint.py /root/testdata/sf0.001 target/oracle_sql.json

Dev tool only — the shipped library has no Python deps.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types DuckDB may emit that the driver's hash treats differently from
# Spark's parquet output (int64 / float64 / utf8 / ts / bool / lists).
def bad_type(t):
    t = str(t).upper()
    return (t in ("HUGEINT", "UHUGEINT")
            or t.startswith("DECIMAL")
            or t.startswith("UINT"))


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:
            print(f"FAIL {name}: oracle does not plan: {e}")
            fails += 1
            continue
        for col, typ in zip(rel.columns, rel.types):
            if bad_type(typ):
                print(f"FAIL {name}: column `{col}` planned as {typ} — "
                      f"wrap the expression in an outer CAST so DuckDB and "
                      f"Spark agree on the physical type")
                fails += 1
    print(f"[oracle-lint] {len(oracle)} oracles checked, {fails} type fails")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
