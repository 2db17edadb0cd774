#!/usr/bin/env python3
"""Emit the DuckDB result schema of every oracle SQL as TSV.

Usage: python3 tools/oracle_schema.py <oracle_sql.json> <sf_dir>

For each oracle entry, registers the sf_dir parquet tables exactly like
tools/check.py and prints one line per result column:

    <query-name>\t<column-name>\t<duckdb-type>

Types come from DuckDB's relation metadata (no rows are fetched), so
this is the oracle side of the name+type contract that OracleSchemaSpec
checks against the Spark plan's schema.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    for name, sql in sorted(oracle.items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            print(f"{name}\t{col}\t{typ}")


if __name__ == "__main__":
    main()
