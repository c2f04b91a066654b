#!/usr/bin/env python3
"""Generated-coverage exactness proof for the q_interval_join 10x oracle
override (round-16 advice #5): the minute-binned reformulation in
scripts/oracle_10x_overrides.json had only been proven row-identical to
the naive non-equi pair join at sf0.01 and sf0.1 — two point checks. A
shared binning-edge-case bug (overlap start exactly on a bucket edge,
zero-length touch overlaps) could in principle pass both points. This
fuzz pins the equivalence with SEEDED GENERATED interval sets that FORCE
those edges every round:

  - starts drawn minute-aligned (the bucket edge), half-minute-aligned,
    and unaligned, in a biased mix;
  - durations that are exact whole minutes (aligned ENDS → touch
    candidates), zero (point intervals), and arbitrary;
  - per round, three adversarial constructions appended: a pair with
    b.start == a.end exactly (zero-length touch overlap), an interval
    whose start is snapped onto another's bucket edge, and a point
    interval at a third's start.

Both forms run in DuckDB (the override replaces the ORACLE side — the
Spark side keeps being checked against the naive oracle at the scales
where it completes), on the SAME algebra as the override: intervals ×
spanned-minute explosion, pair join on the shared minute, counted once
at the minute of the overlap start, houred into buckets.

Usage: python3 scripts/interval_override_fuzz.py [rounds] [seed]
Expect: "== interval override fuzz: N pass / 0 fail =="
"""
import random
import sys

import duckdb

NAIVE = """
SELECT (greatest(a.s_us, b.s_us) // 3600000000) * 3600000000 AS bucket_us,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us)) AS BIGINT)
    AS sum_overlap_us,
  CAST(max(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us)) AS BIGINT)
    AS max_overlap_us
FROM iv a JOIN iv b
  ON a.i < b.i AND a.s_us <= b.e_us AND b.s_us <= a.e_us
GROUP BY 1 ORDER BY 1
"""

BINNED = """
WITH e AS (
  SELECT i, s_us, e_us,
    unnest(generate_series(s_us // 60000000, e_us // 60000000)) AS m
  FROM iv
), p AS (
  SELECT (greatest(a.s_us, b.s_us) // 3600000000) * 3600000000 AS bucket_us,
    least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS ov
  FROM e a JOIN e b ON a.m = b.m AND a.i < b.i
    AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    AND greatest(a.s_us, b.s_us) // 60000000 = a.m
)
SELECT bucket_us, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(ov) AS BIGINT) AS sum_overlap_us,
  CAST(max(ov) AS BIGINT) AS max_overlap_us
FROM p GROUP BY 1 ORDER BY 1
"""

MIN_US = 60000000


def gen_intervals(rng, n):
    ivs = []
    for i in range(n):
        align = rng.choice([MIN_US, MIN_US, MIN_US // 2, 1])
        s = rng.randrange(0, 240) * align
        if rng.random() < 0.3:
            s += rng.randrange(1, MIN_US)  # push off the edge sometimes
        r = rng.random()
        if r < 0.25:
            dur = rng.randrange(1, 8) * MIN_US  # aligned end
        elif r < 0.40:
            dur = 0  # point interval
        else:
            dur = rng.randrange(1, 10 * MIN_US)
        ivs.append((i, s, s + dur))
    k = len(ivs)
    # adversarial constructions, every round:
    ivs.append((k, ivs[0][2], ivs[0][2] + MIN_US))  # b.s == a.e touch
    ivs.append((k + 1, (ivs[1][1] // MIN_US) * MIN_US, ivs[1][2]))  # edge start
    ivs.append((k + 2, ivs[2][1], ivs[2][1]))  # point at a third's start
    return ivs


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 424242
    rng = random.Random(seed)
    con = duckdb.connect()
    n_pass = n_fail = 0
    for r in range(rounds):
        ivs = gen_intervals(rng, rng.randrange(50, 300))
        con.sql("CREATE OR REPLACE TABLE iv(i BIGINT, s_us BIGINT, e_us BIGINT)")
        con.executemany("INSERT INTO iv VALUES (?, ?, ?)", ivs)
        a = con.sql(NAIVE).fetchall()
        b = con.sql(BINNED).fetchall()
        if a == b:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL round {r} (seed {seed}): naive {len(a)} rows != "
                  f"binned {len(b)} rows")
            for row in sorted(set(a) ^ set(b))[:6]:
                print(f"  diff: {row}")
    print(f"== interval override fuzz: {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
