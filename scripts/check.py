#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [--strict] [--lint-only]

For each query dumped by graft.Verify: read the Spark parquet result,
run the oracle SQL in DuckDB against views over the same parquet tables,
sort columns by name, and compare row count, schema-ish dtypes, and
exact values. Every name in queries.json (the declared inventory) must
produce a result dir — a query whose Verify run failed is a FAIL, not a
skip. --strict turns the dtype WARN into FAIL (the driver compares
dtypes). Every run starts with an oracle lint (EXPLAIN each oracleSql in
DuckDB — binder errors fail the gate before any compare); --lint-only
stops after the lint, for a fast pre-flight at sf0.001.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, strict=False, lint_only=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Lint pre-step: EXPLAIN every oracle before comparing anything. Both
    # round-3 gate failures were DuckDB binder ambiguities (an ambiguous
    # column reference) invisible to Spark — a bad oracle must fail loudly
    # here, not ship to the driver's gate.
    lint_fail = 0
    for name in sorted(oracle):
        try:
            con.sql(f"EXPLAIN {oracle[name]}")
        except Exception as e:
            print(f"LINT-FAIL {name}: {str(e)[:200]}")
            lint_fail += 1
    if lint_fail:
        print(f"== oracle lint: {lint_fail} of {len(oracle)} oracles failed to bind ==")
    if lint_only:
        print(f"== oracle lint: {len(oracle) - lint_fail}/{len(oracle)} bind clean ==")
        return 1 if lint_fail else 0
    qj = f"{out_dir}/queries.json"
    declared = json.load(open(qj)) if os.path.exists(qj) else []
    n_pass = n_fail = 0
    # no-oracle queries get the driver's weaker rows-only check; a declared
    # no-oracle query with no result dir is a failed Verify run → FAIL
    no_oracle = sorted(set(declared) - set(oracle)) if declared else [
        os.path.basename(d.rstrip("/")) for d in sorted(glob.glob(f"{out_dir}/*/"))
        if os.path.basename(d.rstrip("/")) not in oracle]
    for name in no_oracle:
        d = f"{out_dir}/{name}"
        if not glob.glob(f"{d}/*.parquet"):
            print(f"FAIL {name}: no spark result written"); n_fail += 1
            continue
        n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        if n > 0:
            print(f"PASS {name} (rows-only: {n} rows, no oracle)"); n_pass += 1
        else:
            print(f"FAIL {name}: no-oracle query returned 0 rows"); n_fail += 1
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1; continue
        spark_df = spark_df[sorted(spark_df.columns)]
        duck_df = duck_df[sorted(duck_df.columns)]
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} "
                  f"duck={list(duck_df.columns)}"); n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1; continue
        if list(map(str, spark_df.dtypes)) != list(map(str, duck_df.dtypes)):
            lvl = "FAIL" if strict else "WARN"
            print(f"{lvl} {name}: dtypes spark={list(map(str, spark_df.dtypes))} "
                  f"duck={list(map(str, duck_df.dtypes))}")
            if strict:
                n_fail += 1; continue
        bad = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (c, i, a[i], b[i], int((~eq).sum()))
                break
        if bad:
            c, i, av, bv, n = bad
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duck={bv!r} ({n} diffs)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if (n_fail or lint_fail) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], strict="--strict" in sys.argv[3:],
             lint_only="--lint-only" in sys.argv[3:]))
