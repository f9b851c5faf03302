#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verifyOutDir> <sfDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sf
tables, and compares row count, column names, and values (columns sorted by
name, rows sorted by all columns, exact equality).
"""
import json
import os
import sys

import duckdb
import pyarrow.types as pat

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def nested_cols(table):
    """Columns the driver's pandas row sorter cannot hash (crash in r1)."""
    return [f.name for f in table.schema
            if pat.is_list(f.type) or pat.is_large_list(f.type)
            or pat.is_fixed_size_list(f.type) or pat.is_struct(f.type)
            or pat.is_map(f.type)]


def decimal_cols(table):
    """DuckDB HUGEINT/decimal results hash-mismatch Spark int64 (r1 q59/q99)."""
    return [f.name for f in table.schema if pat.is_decimal(f.type)]


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    # Guard every result dir (including rows-only queries with no oracle):
    # an array/struct output column crashes the DRIVER's checker even when
    # this arrow-based one would cope, so local must fail too.
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(os.path.join(out_dir, name)):
            continue
        t = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0"
        ).fetch_arrow_table()
        nc = nested_cols(t)
        if nc:
            failed.append(name)
            print(f"FAIL {name}: nested output columns {nc} "
                  "(driver pandas sorter crashes on these)")
    for name, sql in sorted(oracle.items()):
        if name in failed:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
            exp = con.execute(sql).fetch_arrow_table()
            dc = decimal_cols(exp)
            if dc:
                failed.append(name)
                print(f"FAIL {name}: oracle decimal columns {dc} "
                      "(DuckDB HUGEINT/decimal vs Spark int64 -> driver "
                      "hash mismatch; CAST to BIGINT/DOUBLE)")
                continue
            g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
            if g_cols != e_cols:
                failed.append(name)
                print(f"FAIL {name}: columns {g_cols} != {e_cols}")
                continue
            if got.num_rows != exp.num_rows:
                failed.append(name)
                print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}")
                continue
            g = got.select(g_cols).to_pylist()
            e = exp.select(e_cols).to_pylist()
            key = lambda r: tuple(
                (v is None, str(type(v)), str(v)) for v in
                (r[c] for c in g_cols))
            g.sort(key=key)
            e.sort(key=key)
            bad = sum(1 for a, b in zip(g, e) if a != b)
            if bad:
                failed.append(name)
                ex = next((a, b) for a, b in zip(g, e) if a != b)
                print(f"FAIL {name}: {bad}/{len(g)} rows differ; e.g.\n"
                      f"  got {ex[0]}\n  exp {ex[1]}")
            else:
                print(f"OK   {name}: {got.num_rows} rows")
        except Exception as exc:
            failed.append(name)
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
