#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <name> parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: schema (column names), row count, and a
hash of the value matrix with columns sorted by name and rows sorted by
all columns. Exits nonzero on any mismatch.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).df()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(tuple(map(repr, r)) for r in df.itertuples(index=False))
    return list(df.columns), len(rows), rows


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got_n, got = canon(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want_cols, want_n, want = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            failures += 1
        elif got_n != want_n:
            print(f"FAIL {name}: rows {got_n} != {want_n}")
            failures += 1
        elif got != want:
            bad = next(i for i, (a, b) in enumerate(zip(got, want)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n  got  {got[bad]}\n  want {want[bad]}")
            failures += 1
        else:
            print(f"OK   {name} ({got_n} rows)")
    print(f"{len(oracle) - failures}/{len(oracle)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
