#!/usr/bin/env python3
"""Compare FuzzRun's Spark results against DuckDB running the same SQL.

Usage: python3 scripts/fuzz_check.py <sfDir> <fuzzSqlJson> <outDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, sql_json, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    queries = json.load(open(sql_json))
    n_pass = n_fail = 0
    for name in sorted(queries):
        sql = queries[name]
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:150]}\n  SQL: {sql[:150]}")
            n_fail += 1
            continue
        spark_df = spark_df[sorted(spark_df.columns)]
        duck_df = duck_df[sorted(duck_df.columns)]
        ok = (list(spark_df.columns) == list(duck_df.columns)
              and len(spark_df) == len(duck_df))
        if ok:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    eq = (a.isna() & b.isna()) | (a == b)
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    ok = False
                    break
        # gen_sweepcarry embeds its own decomposition-vs-naive assertion:
        # a column named expect_zero must be all-zero IN the (matching)
        # results — a cross-engine-consistent wrong decomposition would
        # otherwise slip through the compare
        if ok and "expect_zero" in duck_df.columns \
                and (duck_df["expect_zero"] != 0).any():
            ok = False
            print(f"FAIL {name}: expect_zero violated\n  SQL: {sql[:200]}")
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}\n"
                  f"  SQL: {sql[:200]}")
    print(f"== fuzz: {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
