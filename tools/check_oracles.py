#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
run graft.Verify at a given SF (done separately via sbt), then compare each
<out>/<name> parquet against the DuckDB result of <out>/oracle_sql.json.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Dev-only tool (driver-side python/duckdb); NOT part of the Scala library.
"""
import json
import sys

import duckdb


def norm(v):
    if isinstance(v, float):
        # exact compare is intended; repr keeps full precision
        return repr(v)
    return str(v)


def table_key(rows, cols):
    # driver compares column-name-sorted values; row order normalized here
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


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
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            oracle_rel = con.sql(sql)
            oracle_cols = [c.lower() for c in oracle_rel.columns]
            oracle_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != "
                  f"{sorted(oracle_cols)}")
            n_fail += 1
            continue
        sk, ok = table_key(spark_rows, spark_cols), table_key(
            oracle_rows, oracle_cols)
        if sk == ok:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(spark_rows)} vs {len(oracle_rows)} rows")
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
