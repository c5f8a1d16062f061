#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
run graft.Verify at a given SF (done separately via sbt), then compare each
<out>/<name> parquet against the DuckDB result of <out>/oracle_sql.json.

Comparison goes through pandas (`.df()`) on BOTH sides, like the driver's
harness, so dtype-level mismatches are caught: e.g. DuckDB `SUM(BIGINT)`
returns HUGEINT which pandas materializes as float64 ("3.0"), while the
Spark parquet column is int64 ("3") — an uncast SUM in an oracle therefore
hash-mismatches on the driver even when the values are numerically equal
(this exact bug hit corpus_pack_greedy / corpus_report / text_bm25_top3 in
round 3; a fetchall()-based compare masked it locally).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Dev-only tool (driver-side python/duckdb); NOT part of the Scala library.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd


def norm(v):
    # dtype-sensitive normalization: int64 3 -> "3", float64 3.0 -> "3.0"
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        return "NULL" if np.isnan(v) else repr(float(v))
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(norm(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def table_key(df):
    # driver compares column-name-sorted values; row order normalized here
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(norm(v) for v in row)
                  for row in df.itertuples(index=False, name=None))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            spark_df.columns = [c.lower() for c in spark_df.columns]
            oracle_df = con.sql(sql).df()
            oracle_df.columns = [c.lower() for c in oracle_df.columns]
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(spark_df.columns) != sorted(oracle_df.columns):
            print(f"FAIL {name}: columns {sorted(spark_df.columns)} != "
                  f"{sorted(oracle_df.columns)}")
            n_fail += 1
            continue
        sk, ok = table_key(spark_df), table_key(oracle_df)
        if sk == ok:
            print(f"PASS {name} ({len(sk)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(sk)} vs {len(ok)} rows")
            for i, (a, b) in enumerate(zip(sk, ok)):
                if a != b:
                    print(f"  first diff at sorted-row {i}:")
                    print(f"    spark : {a}")
                    print(f"    oracle: {b}")
                    break

    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
