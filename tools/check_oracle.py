#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet tables, and compares: column names (sorted), row count, and values
(rows sorted canonically). Exits nonzero on any mismatch.

Canonicalization is driver-faithful: the Spark output is read with
pandas/pyarrow, which preserves parquet DECIMAL as decimal.Decimal, while the
oracle side comes out of DuckDB as float64 — so a DECIMAL output column will
(correctly) mismatch here exactly as it does in the driver's hash gate, even
when the numeric values are equal. Final verify schemas must therefore avoid
DECIMAL (emit BIGINT cents — see graft.operators.Money).
"""
import decimal
import json
import math
import sys

import duckdb
import pandas as pd


def canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # keep Decimal distinct from float on purpose (driver parity)
        return f"decimal:{v}"
    return str(v)


def table_of(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failed.append(name)
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failed.append(name)
            continue
        gc, gr = table_of(got)
        ec, er = table_of(exp)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            failed.append(name)
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
            failed.append(name)
            continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
            failed.append(name)
            continue
        print(f"OK   {name}: {len(gr)} rows, {len(gc)} cols")
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print(f"\nall {len(oracles)} queries match")


if __name__ == "__main__":
    main()
