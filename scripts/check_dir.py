#!/usr/bin/env python3
"""check.py variant for DIRECTORY-parquet scale dirs (e.g. ScaleGen output,
where each table is a <table>.parquet/ directory of part files) — same
compare as scripts/check.py but views use a /*.parquet glob.

Scale-dir oracle overrides: scripts/oracle_10x_overrides.json entries
replace the primary oracle for queries whose naive SQL form DuckDB
cannot execute at 10x (no interval-join optimization). Every override
must be proven row-identical to the primary form at the scales where
both complete (recorded in that file); PRAGMAs memory_limit/threads/
temp_directory are set so quadratic-but-bounded oracles (q_triangles)
spill to the big volume instead of aborting.

Usage: python3 scripts/check_dir.py <sfDir> <verifyOutDir> [names...]
"""
import sys, json, os, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    # PRAGMAs derived from the host, env-overridable (round-16 advice: the
    # old hardcoded 48GB/24-thread values assumed this container; a
    # memory_limit above physical RAM defeats DuckDB's spill heuristics
    # and OOM-kills the gate instead of spilling). Default: ~40% of
    # physical RAM, 3/4 of the CPUs, spill dir beside the (big-volume)
    # scale dir rather than /tmp.
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if not mem:
        try:
            page = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            mem = f"{max(1, int(page * 0.4) // (1 << 30))}GB"
        except (ValueError, OSError):
            mem = "8GB"
    threads = os.environ.get("GRAFT_DUCKDB_THREADS") or max(
        1, (os.cpu_count() or 4) * 3 // 4)
    tmp = os.environ.get("GRAFT_DUCKDB_TMP") or os.path.join(
        os.path.dirname(os.path.abspath(sf_dir)), "duckdb_tmp")
    con.sql(f"PRAGMA memory_limit='{mem}'")
    con.sql(f"PRAGMA threads={threads}")
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"PRAGMA temp_directory='{tmp}'")
    print(f"NOTE duckdb pragmas: memory_limit={mem} threads={threads} tmp={tmp}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    alt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "oracle_10x_overrides.json")
    if os.path.exists(alt_path):
        alt = {k: v for k, v in json.load(open(alt_path)).items()
               if not k.startswith("_")}
        used = sorted(set(alt) & set(oracle))
        if used:
            print(f"NOTE scale-dir oracle overrides active: {used}")
        oracle.update({k: v for k, v in alt.items() if k in oracle})
    n_pass = n_fail = 0
    for name in names or sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            want = con.sql(oracle[name]).df()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            import pandas as pd
            g = got.reset_index(drop=True)
            w = want.reset_index(drop=True)
            eq = True
            for c in g.columns:
                a, b = g[c], w[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    same = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    same = ((a.isna() & b.isna()) | (a.astype(str) == b.astype(str))).all()
                if not same:
                    eq = False
                    print(f"FAIL {name}: column {c} differs")
                    break
            if eq:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
