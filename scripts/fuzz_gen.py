#!/usr/bin/env python3
"""Differential-test query generator.

Emits N seeded-random queries in the dialect subset common to Spark SQL
and DuckDB (same text runs on both engines): scans with numeric/string
predicates, grouped aggregates with exact decimal-mediated sums, HAVING,
ORDER BY total orders, LIMIT. Spark runs them via graft.FuzzRun; DuckDB
via scripts/fuzz_check.py; results must match exactly.

Usage: python3 scripts/fuzz_gen.py [N] [seed] > /tmp/fuzz_sql.json
"""
import json, random, sys

# (table, [(col, kind)]) — kind: i=integer-ish, d=2dp double, s=string
TABLES = {
    "customer": [("c_custkey", "i"), ("c_nationkey", "i"), ("c_acctbal", "d"),
                 ("c_mktsegment", "s")],
    "orders":   [("o_orderkey", "i"), ("o_custkey", "i"), ("o_totalprice", "d"),
                 ("o_orderstatus", "s"), ("o_orderpriority", "s")],
    "lineitem": [("l_orderkey", "i"), ("l_partkey", "i"), ("l_suppkey", "i"),
                 ("l_linenumber", "i"), ("l_quantity", "d"),
                 ("l_extendedprice", "d"), ("l_discount", "d"),
                 ("l_returnflag", "s"), ("l_linestatus", "s")],
    "part":     [("p_partkey", "i"), ("p_size", "i"), ("p_retailprice", "d"),
                 ("p_brand", "s"), ("p_type", "s")],
    "events":   [("event_id", "i"), ("user_id", "i"), ("value", "d"),
                 ("event_type", "s")],
    "documents": [("doc_id", "i"), ("n_chars", "i"), ("lang", "s"), ("source", "s")],
}

RANGES = {"i": (0, 2000), "d": (0.0, 10000.0)}

# sort key per table. NOTE lineitem's (l_orderkey, l_linenumber) is NOT
# unique in the synthetic data (the fuzzer itself caught the tie-order
# divergence) — window queries additionally order their output by rn so
# arbitrary rn assignment among identical tied rows cannot reorder output
SORT_KEY = {
    "customer": ["c_custkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"], "part": ["p_partkey"],
    "events": ["event_id"], "documents": ["doc_id"],
}

# FK join paths: (left table, right table, join condition)
JOINS = [
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("nation", "region", "n_regionkey = r_regionkey"),
]
JOIN_COLS = {"nation": [("n_nationkey", "i"), ("n_name", "s")],
             "region": [("r_regionkey", "i"), ("r_name", "s")]}


def pred(rng, cols):
    c, k = rng.choice(cols)
    if k == "i":
        if rng.random() < 0.2:
            lo = rng.randint(*RANGES["i"])
            return f"{c} BETWEEN {lo} AND {lo + rng.randint(1, 500)}"
        if rng.random() < 0.2:
            vals = sorted({rng.randint(*RANGES["i"]) for _ in range(rng.randint(2, 5))})
            return f"{c} IN ({', '.join(map(str, vals))})"
        v = rng.randint(*RANGES["i"])
        op = rng.choice([">", "<", ">=", "<=", "=", "!="])
        return f"{c} {op} {v}"
    if k == "d":
        v = round(rng.uniform(*RANGES["d"]), 2)
        op = rng.choice([">", "<", ">=", "<="])
        return f"{c} {op} {v}"
    if rng.random() < 0.3:
        ch = rng.choice("ABCDEFGHIJKLMNOPRSTUW")
        return f"{c} LIKE '%{ch.lower()}%'"
    # string: prefix compare (collation-free, byte order)
    ch = rng.choice("ABCDEFGHIJKLMNOPRSTUW")
    return f"{c} {rng.choice(['>=', '<'])} '{ch}'"


def agg_exprs(rng, cols):
    out = ["count(*) AS n"]
    for c, k in cols:
        if k == "d" and rng.random() < 0.6:
            out.append(
                f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS sum_{c}")
        elif k == "i" and rng.random() < 0.4:
            out.append(f"MIN({c}) AS min_{c}")
            out.append(f"MAX({c}) AS max_{c}")
    return out


def gen_join(rng):
    lt, rt, cond = rng.choice(JOINS)
    lcols = TABLES.get(lt, JOIN_COLS.get(lt))
    rcols = TABLES.get(rt, JOIN_COLS.get(rt))
    where = pred(rng, lcols)
    groups = [c for c, k in rcols if k == "s"] or [rcols[0][0]]
    g = rng.choice(groups)
    aggs = ["count(*) AS n"] + [
        f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS sum_{c}"
        for c, k in lcols if k == "d"][:2]
    return (f"SELECT {g}, {', '.join(aggs)} FROM {lt} JOIN {rt} ON {cond} "
            f"WHERE {where} GROUP BY {g} ORDER BY {g}")


def gen_window(rng):
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    key = ", ".join(SORT_KEY[t])
    part = rng.choice([c for c, k in cols if k == "s"] or [SORT_KEY[t][0]])
    where = pred(rng, cols)
    return (f"SELECT {key}, {part}, CAST(row_number() OVER "
            f"(PARTITION BY {part} ORDER BY {key}) AS BIGINT) AS rn "
            f"FROM {t} WHERE {where} ORDER BY {key}, {part}, rn")


def gen_distinct(rng):
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    picks = [c for c, k in cols if k in ("s", "i")]
    proj = rng.sample(picks, rng.randint(1, min(2, len(picks))))
    where = pred(rng, cols)
    return (f"SELECT DISTINCT {', '.join(proj)} FROM {t} WHERE {where} "
            f"ORDER BY {', '.join(proj)}")


def gen_case(rng):
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    dcols = [c for c, k in cols if k == "d"]
    if not dcols:
        return gen_distinct(rng)
    c = rng.choice(dcols)
    cut = round(rng.uniform(*RANGES["d"]), 2)
    where = pred(rng, cols)
    return (f"SELECT CASE WHEN {c} > {cut} THEN 'hi' ELSE 'lo' END AS band, "
            f"count(*) AS n, CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s "
            f"FROM {t} WHERE {where} GROUP BY 1 ORDER BY band")


def gen_scalar(rng):
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    scol = [c for c, k in cols if k == "s"][0]
    key = ", ".join(SORT_KEY[t])
    where = rng.choice([
        f"length({scol}) > {rng.randint(3, 12)}",
        f"upper({scol}) >= '{rng.choice('ABCDEFGHIJKLMNOP')}'",
        f"substr({scol}, 1, 1) >= '{rng.choice('abcdefgp').upper()}'"
        if rng.random() < 0.5 else f"lower({scol}) >= '{rng.choice('abcdefgp')}'",
    ])
    return (f"SELECT {key}, {scol}, CAST(length({scol}) AS INTEGER) AS slen "
            f"FROM {t} WHERE {where} ORDER BY {key}, {scol}")


def gen_union(rng):
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    key = ", ".join(SORT_KEY[t])
    p1, p2 = pred(rng, cols), pred(rng, cols)
    return (f"SELECT 'a' AS src, {key} FROM {t} WHERE {p1} "
            f"UNION ALL SELECT 'b' AS src, {key} FROM {t} WHERE {p2} "
            f"ORDER BY src, {key}")


def gen_subquery(rng):
    lt, rt, cond = rng.choice(JOINS[:2])   # orders→customer, lineitem→orders
    lk, rk = cond.split(" = ")
    lcols = TABLES[lt]
    inner_where = pred(rng, TABLES.get(rt, JOIN_COLS.get(rt)))
    key = ", ".join(SORT_KEY[lt])
    where = pred(rng, lcols)
    # NOT IN is safe here: the subquery key columns contain no NULLs
    # (NULL-poisoned NOT IN would empty the result in both engines anyway)
    op = "IN" if rng.random() < 0.7 else "NOT IN"
    return (f"SELECT {key} FROM {lt} WHERE {where} AND {lk} {op} "
            f"(SELECT {rk} FROM {rt} WHERE {inner_where}) ORDER BY {key}")


def gen_leftjoin(rng):
    # LEFT JOIN manufactures NULLs (the base tables have none): exercises
    # count(col) vs count(*), SUM-over-empty→NULL, and coalesce defaults
    lt, rt, cond = rng.choice([("customer", "orders", "o_custkey = c_custkey"),
                               ("orders", "lineitem", "l_orderkey = o_orderkey")])
    lkey = SORT_KEY[lt][0]
    rcols = TABLES[rt]
    rkey = SORT_KEY[rt][0]
    rd = [c for c, k in rcols if k == "d"][0]
    where = pred(rng, TABLES[lt])
    inner = pred(rng, rcols)
    return (f"SELECT {lkey}, count({rkey}) AS n_matched, count(*) AS n_rows, "
            f"CAST(SUM(CAST({rd} AS DECIMAL(18,2))) AS DOUBLE) AS s, "
            f"coalesce(MIN({rkey}), -1) AS min_or_default "
            f"FROM {lt} LEFT JOIN (SELECT * FROM {rt} WHERE {inner}) r ON {cond} "
            f"WHERE {where} GROUP BY {lkey} ORDER BY {lkey}")


def gen_global(rng):
    # global aggregate, sometimes over an empty selection (count→0,
    # SUM→NULL, MIN/MAX→NULL: the empty-input corner both engines must
    # agree on, returning exactly one row)
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    dcol = [c for c, k in cols if k == "d"]
    icol = [c for c, k in cols if k == "i"][0]
    where = pred(rng, cols)
    if rng.random() < 0.3:   # force-empty branch
        where = f"{icol} < -1"
    aggs = ["count(*) AS n", f"MIN({icol}) AS mn", f"MAX({icol}) AS mx"]
    if dcol:
        aggs.append(
            f"CAST(SUM(CAST({dcol[0]} AS DECIMAL(18,2))) AS DOUBLE) AS s")
    return f"SELECT {', '.join(aggs)} FROM {t} WHERE {where}"


DATE_COLS = {"orders": "o_orderdate", "lineitem": "l_shipdate"}

# tables whose SORT_KEY is a unique total order (lineitem's is not):
# required by lag/lead (arbitrary tie order would change WHICH row is
# "previous" when tied rows differ in the lagged column)
UNIQUE_KEY_TABLES = [t for t in TABLES if t != "lineitem"]


def gen_winfam(rng):
    # rank/dense_rank/lag/lead/ntile/percent_rank in one named window.
    # Ordering inside the window is the table's unique key, so every
    # rank-family output is deterministic; INTEGER-returning Spark
    # functions are CAST to BIGINT to match DuckDB's int64.
    t = rng.choice(UNIQUE_KEY_TABLES)
    cols = TABLES[t]
    key = SORT_KEY[t][0]
    part = rng.choice([c for c, k in cols if k == "s"] or [key])
    icol = rng.choice([c for c, k in cols if k == "i"])
    where = pred(rng, cols)
    picks = rng.sample([
        f"CAST(rank() OVER w AS BIGINT) AS rnk",
        f"CAST(dense_rank() OVER w AS BIGINT) AS drnk",
        f"CAST(ntile({rng.randint(2, 7)}) OVER w AS BIGINT) AS tile",
        f"lag({icol}) OVER w AS prev_i",
        f"lead({icol}) OVER w AS next_i",
        f"percent_rank() OVER w AS pr",
        f"cume_dist() OVER w AS cd",
    ], rng.randint(2, 4))
    return (f"SELECT {key}, {part}, {', '.join(picks)} FROM {t} "
            f"WHERE {where} WINDOW w AS (PARTITION BY {part} ORDER BY {key}) "
            f"ORDER BY {key}")


def gen_grouping(rng):
    # CUBE / ROLLUP / GROUPING SETS with grouping_id disambiguation.
    # grouping_id(a, b) is common dialect (DuckDB aliases GROUPING);
    # NULLS FIRST is explicit (DuckDB defaults NULLS LAST on ASC).
    # The filter is guaranteed non-empty ON PURPOSE: over an EMPTY input,
    # DuckDB follows the SQL standard and still emits one row for the
    # grand-total () grouping set, while Spark returns zero rows — a real
    # engine divergence (documented here, excluded from the differential).
    t, a, b = rng.choice([
        ("orders", "o_orderstatus", "o_orderpriority"),
        ("lineitem", "l_returnflag", "l_linestatus"),
        ("part", "p_brand", "p_type"),
    ])
    cols = TABLES[t]
    dcol = [c for c, k in cols if k == "d"][0]
    # every d-col's value range starts above 40 or spans far beyond it
    where = f"{dcol} >= {round(rng.uniform(0.0, 40.0), 2)}"
    form = rng.choice([f"CUBE({a}, {b})", f"ROLLUP({a}, {b})",
                       f"GROUPING SETS (({a}), ({b}), ())",
                       f"GROUPING SETS (({a}, {b}), ({a}), ())"])
    return (f"SELECT {a}, {b}, grouping_id({a}, {b}) AS gid, count(*) AS n, "
            f"CAST(SUM(CAST({dcol} AS DECIMAL(18,2))) AS DOUBLE) AS s "
            f"FROM {t} WHERE {where} GROUP BY {form} "
            f"ORDER BY gid, {a} NULLS FIRST, {b} NULLS FIRST")


def gen_exists(rng):
    # correlated EXISTS / NOT EXISTS (planned as semi/anti join)
    lt, rt, cond = rng.choice(JOINS[:2])
    lk, rk = cond.split(" = ")
    key = ", ".join(SORT_KEY[lt])
    where = pred(rng, TABLES[lt])
    inner = pred(rng, TABLES.get(rt, JOIN_COLS.get(rt)))
    neg = rng.choice(["", "NOT "])
    return (f"SELECT {key} FROM {lt} WHERE {where} AND {neg}EXISTS "
            f"(SELECT 1 FROM {rt} WHERE {rk} = {lk} AND {inner}) "
            f"ORDER BY {key}")


def gen_datefn(rng):
    # date-part extraction on real TIMESTAMP columns (midnight-aligned in
    # the data; events.ts is excluded — raw ns longs on the Spark side)
    t = rng.choice(list(DATE_COLS))
    dc = DATE_COLS[t]
    cols = TABLES[t]
    key = ", ".join(SORT_KEY[t])
    where = pred(rng, cols)
    parts = rng.sample([
        f"CAST(year({dc}) AS INTEGER) AS y",
        f"CAST(month({dc}) AS INTEGER) AS m",
        f"CAST(day({dc}) AS INTEGER) AS dom",
        f"CAST(quarter({dc}) AS INTEGER) AS q",
    ], rng.randint(2, 3))
    agg = rng.random() < 0.5
    if agg:
        return (f"SELECT CAST(year({dc}) AS INTEGER) AS y, "
                f"CAST(month({dc}) AS INTEGER) AS m, count(*) AS n "
                f"FROM {t} WHERE {where} GROUP BY 1, 2 ORDER BY y, m")
    return (f"SELECT {key}, {', '.join(parts)} FROM {t} WHERE {where} "
            f"ORDER BY {key}")


def gen_arith(rng):
    # integer expression trees: + - * unary-minus abs, int comparisons.
    # Products of two key columns stay far inside BIGINT (≤ ~1e12), so
    # Spark's ANSI overflow can't fire; no /, %, or // (division dialect
    # and sign semantics differ between engines).
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    # exclude the sort key: a projected duplicate column name breaks the
    # parquet dump (and is poor SQL anyway)
    icols = [c for c, k in cols if k == "i" and c not in SORT_KEY[t]]
    if len(icols) < 2:
        return gen_datefn(rng)
    a, b = rng.sample(icols, 2)
    key = ", ".join(SORT_KEY[t])
    where = pred(rng, cols)
    exprs = rng.sample([
        f"{a} + {b} AS e_add",
        f"{a} - 2 * {b} AS e_mix",
        f"-{a} AS e_neg",
        f"abs({a} - {b}) AS e_abs",
        f"{a} * {b} AS e_mul",
        f"CASE WHEN {a} > {b} THEN {a} ELSE {b} END AS e_max",
    ], rng.randint(2, 4))
    return (f"SELECT {key}, {a}, {b}, {', '.join(exprs)} FROM {t} "
            f"WHERE {where} ORDER BY {key}, {a}, {b}")


def gen_percentile(rng):
    # exact discrete quantiles: percentile_disc returns an ACTUAL data
    # value (no interpolation), so it is engine-exact where
    # percentile_cont is not — see SURVEY §2D / q_quantiles
    t = rng.choice([t for t in TABLES if any(k == "d" for _, k in TABLES[t])])
    cols = TABLES[t]
    dcol = rng.choice([c for c, k in cols if k == "d"])
    part = rng.choice([c for c, k in cols if k == "s"] or [SORT_KEY[t][0]])
    q1, q2 = rng.sample([0.1, 0.25, 0.5, 0.75, 0.9], 2)
    where = pred(rng, cols)
    return (f"SELECT {part}, count(*) AS n, "
            f"percentile_disc({q1}) WITHIN GROUP (ORDER BY {dcol}) AS p_a, "
            f"percentile_disc({q2}) WITHIN GROUP (ORDER BY {dcol}) AS p_b "
            f"FROM {t} WHERE {where} GROUP BY {part} ORDER BY {part}")


def gen_argextreme(rng):
    # max_by/min_by with the table's UNIQUE key as the ordering value —
    # deterministic winner by construction (the H6 tie hazard that bit
    # q_latest_checksum_per_table is designed out here)
    t = rng.choice(UNIQUE_KEY_TABLES)
    cols = TABLES[t]
    key = SORT_KEY[t][0]
    vcol = rng.choice([c for c, _ in cols if c != key])
    part = rng.choice([c for c, k in cols if k == "s"] or [key])
    where = pred(rng, cols)
    return (f"SELECT {part}, count(*) AS n, "
            f"max_by({vcol}, {key}) AS last_v, min_by({vcol}, {key}) AS first_v, "
            f"MIN({key}) AS mn, MAX({key}) AS mx "
            f"FROM {t} WHERE {where} GROUP BY {part} ORDER BY {part}")


def gen_textfn(rng):
    # string-function breadth over the long text column (the substring-
    # dedup/scrub family's building blocks): 1-based substr, split_part,
    # instr/strpos-free (position via instr exists in both? -> use
    # length/replace/md5/upper which are byte-exact on this ASCII corpus)
    k = rng.randint(1, 40)
    j = rng.randint(1, 20)
    n = rng.randint(1, 6)
    where = f"n_chars >= {rng.randint(50, 300)}"
    exprs = rng.sample([
        f"length(text) AS len_t",
        f"md5(substr(text, {j}, {k})) AS h_sub",
        f"split_part(text, ' ', {n}) AS tok_n",
        f"length(replace(text, ' ', '__')) AS len_r",
        f"upper(substr(text, 1, {j})) AS up_p",
        f"md5(lower(text)) AS h_lo",
    ], rng.randint(3, 5))
    return (f"SELECT doc_id, {', '.join(exprs)} "
            f"FROM documents WHERE {where} ORDER BY doc_id "
            f"LIMIT {rng.randint(50, 400)}")


def gen_frames(rng):
    # frame-schedule arithmetic + byte-range slicing (the q_frame_schedule
    # / q_frame_extract building blocks): per doc a frame count from
    # n_chars at a random frame size, a budget-bounded stride via exact
    # floor over a double divide (floor(int / d) is exact under 2^53 in
    # both engines), and md5 digests of literal-offset slices (substr
    # past end-of-string degrades identically).
    fsz = rng.choice([8, 16, 32, 64])
    budget = rng.choice([4, 8, 12])
    offs = sorted(rng.sample(range(1, 400), rng.randint(2, 4)))
    digests = ", ".join(
        f"md5(substr(text, {o}, {fsz})) AS f{i}" for i, o in enumerate(offs))
    where = f"n_chars >= {rng.randint(0, 200)}"
    return (
        f"SELECT doc_id, CAST(floor(n_chars / {fsz}.0) AS BIGINT) AS n_frames, "
        f"CAST(floor((floor(n_chars / {fsz}.0) + {budget - 1}) / {budget}.0) "
        f"AS BIGINT) AS stride, {digests} "
        f"FROM documents WHERE {where} ORDER BY doc_id "
        f"LIMIT {rng.randint(50, 400)}")


def gen_graphcte(rng):
    # the unrolled-iteration family (q_pagerank / q_label_prop /
    # q_components shape): derive a small edge list, unroll 1..3 rounds of
    # min-label propagation as plain chained CTEs (identical text in both
    # engines — no RECURSIVE, no div), census the labels. Exact integer
    # math throughout; every output ordered totally.
    a, b, tbl = rng.choice([
        ("o_custkey", "o_orderkey % 499", "orders"),
        ("l_suppkey", "l_partkey % 307", "lineitem"),
        ("l_orderkey % 811", "l_suppkey", "lineitem"),
        ("user_id", "event_id % 631", "events"),
    ])
    where = pred(rng, TABLES[tbl])
    rounds = rng.randint(1, 3)
    offset = 1000000
    ctes = [
        f"eo AS (SELECT DISTINCT {a} AS a, {offset} + ({b}) AS b "
        f"FROM {tbl} WHERE {where})",
        "e AS (SELECT a AS src, b AS dst FROM eo "
        "UNION ALL SELECT b AS src, a AS dst FROM eo)",
        "l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"l{i} AS (SELECT node, min(lbl) AS lbl FROM ("
            f"SELECT e.dst AS node, l.lbl FROM e "
            f"JOIN l{i - 1} l ON l.node = e.src "
            f"UNION ALL SELECT node, lbl FROM l{i - 1}) x GROUP BY node)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT lbl AS community, count(*) AS n_nodes, "
            f"min(node) AS min_node, max(node) AS max_node "
            f"FROM l{rounds} GROUP BY lbl "
            f"ORDER BY n_nodes DESC, community LIMIT {rng.randint(20, 100)}")


def gen_wedge(rng):
    # the bipartite wedge / C(n,2) census family (q_butterflies shape):
    # derive a distinct (a, b) pair list over MODDED key domains (mods
    # bound every per-key degree, so the a<b pair join stays small in
    # both engines), then census wedges Σ C(d,2) from both sides and
    # butterflies Σ C(w,2) over the shared-pair counts. Integer values
    # only; d*(d-1) is even so /2 is exact in the double both engines
    # produce for int division, and the CAST normalizes the dtype.
    m1 = rng.choice([31, 43, 61, 83, 97])
    m2 = rng.choice([29, 37, 53, 71, 89])
    a, b, tbl = rng.choice([
        (f"o_custkey % {m1}", f"o_orderkey % {m2}", "orders"),
        (f"l_suppkey % {m1}", f"l_partkey % {m2}", "lineitem"),
        (f"user_id % {m1}", f"event_id % {m2}", "events"),
        (f"doc_id % {m1}", f"n_chars % {m2}", "documents"),
    ])
    where = pred(rng, TABLES[tbl])
    c2 = lambda x: f"CAST({x} * ({x} - 1) / 2 AS BIGINT)"
    ctes = (
        f"eo AS (SELECT DISTINCT ({a}) AS a, ({b}) AS b FROM {tbl} WHERE {where}), "
        f"adeg AS (SELECT a, count(*) AS d FROM eo GROUP BY a), "
        f"bdeg AS (SELECT b, count(*) AS d FROM eo GROUP BY b), "
        f"cp AS (SELECT x.b AS b1, y.b AS b2, count(*) AS w FROM eo x "
        f"JOIN eo y ON x.a = y.a AND x.b < y.b GROUP BY x.b, y.b)")
    shape = rng.random()
    if shape < 0.4:  # 1-row census (the q_butterflies contract)
        return (
            f"WITH {ctes} "
            f"SELECT (SELECT count(*) FROM eo) AS n_edges, "
            f"(SELECT CAST(coalesce(sum({c2('d')}), 0) AS BIGINT) FROM adeg) AS w_a, "
            f"(SELECT CAST(coalesce(sum({c2('d')}), 0) AS BIGINT) FROM bdeg) AS w_b, "
            f"(SELECT CAST(coalesce(sum({c2('w')}), 0) AS BIGINT) FROM cp) AS n_bfly")
    if shape < 0.7:  # per-key wedge ranking (the hub census q_degree_hist feeds)
        side = rng.choice(["adeg", "bdeg"])
        key = "a" if side == "adeg" else "b"
        return (f"WITH {ctes} SELECT {key}, d, {c2('d')} AS wedges "
                f"FROM {side} ORDER BY wedges DESC, {key} "
                f"LIMIT {rng.randint(20, 120)}")
    # shared-count distribution: how many pairs share w hubs
    return (f"WITH {ctes} SELECT w, count(*) AS n_pairs, "
            f"min(b1) AS min_b1, max(b2) AS max_b2 "
            f"FROM cp GROUP BY w ORDER BY w")


def gen_rrf(rng):
    # reciprocal-rank fusion over two independent rankings of one table —
    # the q_hybrid_rrf dialect class: row_number ranks (total orders via
    # the unique key tiebreak), fused by floor(1e6 / (60 + r)). The
    # division is ONE double divide of exact small ints + floor —
    # bit-identical across engines (no integer-division dialect needed).
    t = rng.choice([t for t in TABLES
                    if len([c for c, k in TABLES[t]
                            if k in ("i", "d") and c != SORT_KEY[t][0]]) >= 2
                    and len(SORT_KEY[t]) == 1])
    cols = TABLES[t]
    key = SORT_KEY[t][0]
    a, b = rng.sample([c for c, k in cols if k in ("i", "d") and c != key], 2)
    where = pred(rng, cols)
    n = rng.randint(5, 30)
    da, db = rng.choice(["ASC", "DESC"]), rng.choice(["ASC", "DESC"])
    return (
        f"WITH ra AS (SELECT {key}, CAST(row_number() OVER "
        f"(ORDER BY {a} {da}, {key}) AS BIGINT) AS r FROM {t} WHERE {where}), "
        f"rb AS (SELECT {key}, CAST(row_number() OVER "
        f"(ORDER BY {b} {db}, {key}) AS BIGINT) AS r FROM {t} WHERE {where}) "
        f"SELECT ra.{key}, ra.r AS r_a, rb.r AS r_b, "
        f"CAST(floor(1000000 / (60 + ra.r)) + floor(1000000 / (60 + rb.r)) "
        f"AS BIGINT) AS rrf "
        f"FROM ra JOIN rb ON rb.{key} = ra.{key} "
        f"WHERE ra.r <= {n} OR rb.r <= {n} "
        f"ORDER BY rrf DESC, ra.{key} LIMIT {rng.randint(10, 40)}")


def gen_clip(rng):
    # winsorized aggregates — the q_winsorize dialect class: global disc-
    # percentile clip bounds (actual data values, engine-exact), clipped
    # sums through DECIMAL, per-side clip counts.
    t = rng.choice([t for t in TABLES if any(k == "d" for _, k in TABLES[t])])
    cols = TABLES[t]
    dcol = rng.choice([c for c, k in cols if k == "d"])
    scol = rng.choice([c for c, k in cols if k == "s"] or [SORT_KEY[t][0]])
    lo = rng.choice([0.05, 0.1, 0.25])
    hi = rng.choice([0.75, 0.9, 0.95])
    where = pred(rng, cols)
    return (
        f"WITH b AS (SELECT "
        f"percentile_disc({lo}) WITHIN GROUP (ORDER BY {dcol}) AS lo, "
        f"percentile_disc({hi}) WITHIN GROUP (ORDER BY {dcol}) AS hi "
        f"FROM {t} WHERE {where}) "
        f"SELECT {scol}, count(*) AS n, "
        f"CAST(SUM(CAST(least(greatest({dcol}, b.lo), b.hi) AS DECIMAL(18,2))) "
        f"AS DOUBLE) AS win_total, "
        f"CAST(sum(CASE WHEN {dcol} < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo, "
        f"CAST(sum(CASE WHEN {dcol} > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi "
        f"FROM {t} CROSS JOIN b WHERE {where} "
        f"GROUP BY {scol}, b.lo, b.hi ORDER BY {scol}")


def gen_containment(rng):
    # the q_dedup_containment / q_containment_est dialect class (round-14
    # ask #4): set containment + the size-aware Jaccard→containment
    # bridge over integer/label element sets per user. The pair join is
    # bounded by the element domain; every ratio is FLOOR of one double
    # division of exact ints (bit-identical across engines — never an
    # integer-division dialect or a double→int CAST, which rounds in
    # DuckDB and truncates in Spark).
    B = rng.choice([25, 50, 100, 200])
    thr = rng.choice([20, 30, 50, 70])
    el = rng.choice([
        f"CAST(FLOOR(value / {B}) AS BIGINT)",
        "event_type",
        f"concat(event_type, '#', CAST(CAST(FLOOR(value / {B}) AS BIGINT) AS STRING))",
    ])
    where = " AND ".join(pred(rng, TABLES["events"])
                         for _ in range(rng.randint(1, 2)))
    base = (
        f"WITH el AS (SELECT user_id AS sid, {el} AS e FROM events "
        f"WHERE {where} GROUP BY 1, 2), "
        f"sz AS (SELECT sid, CAST(count(*) AS BIGINT) AS n FROM el GROUP BY 1), ")
    shape = rng.random()
    if shape < 0.3:
        # rare-band inverted-index candidate generation (the df-cap shape)
        lo = rng.randint(2, 3)
        hi = lo + rng.randint(2, 8)
        return base + (
            f"rare AS (SELECT e FROM el GROUP BY e "
            f"HAVING count(*) BETWEEN {lo} AND {hi}), "
            f"pr AS (SELECT a.sid AS sa, b.sid AS sb, "
            f"CAST(count(*) AS BIGINT) AS c "
            f"FROM el a JOIN rare r ON a.e = r.e "
            f"JOIN el b ON b.e = r.e AND a.sid < b.sid GROUP BY 1, 2) "
            f"SELECT sa, sb, c, za.n AS na, zb.n AS nb, "
            f"CAST(FLOOR((100.0 * c) / LEAST(za.n, zb.n)) AS BIGINT) AS cont_pct "
            f"FROM pr JOIN sz za ON za.sid = pr.sa JOIN sz zb ON zb.sid = pr.sb "
            f"ORDER BY sa, sb")
    pair = (
        f"pr AS (SELECT a.sid AS sa, b.sid AS sb, CAST(count(*) AS BIGINT) AS c "
        f"FROM el a JOIN el b ON b.e = a.e AND a.sid < b.sid GROUP BY 1, 2) ")
    if shape < 0.65:
        # both metrics + the size-aware bridge: Ĉ derived from exact
        # Ĵ = c/(na+nb−c) via |∩|̂ = Ĵ(na+nb)/(1+Ĵ) — algebraically the
        # containment again, probing the bridge arithmetic cross-engine
        j = "(c / CAST(za.n + zb.n - c AS DOUBLE))"
        return base + pair + (
            f"SELECT sa, sb, c, za.n AS na, zb.n AS nb, "
            f"CAST(FLOOR((100.0 * c) / LEAST(za.n, zb.n)) AS BIGINT) AS cont_pct, "
            f"CAST(FLOOR((1000000.0 * c) / (za.n + zb.n - c)) AS BIGINT) AS jacc_ppm, "
            f"CAST(FLOOR(1000000.0 * ({j} * (za.n + zb.n) / (1.0 + {j})) "
            f"/ LEAST(za.n, zb.n)) AS BIGINT) AS cont_bridge_ppm "
            f"FROM pr JOIN sz za ON za.sid = pr.sa JOIN sz zb ON zb.sid = pr.sb "
            f"WHERE 100 * c >= {thr} * LEAST(za.n, zb.n) "
            f"ORDER BY sa, sb")
    # engulfed/engulfer census (the q_dedup_containment output contract)
    return base + pair + (
        f"SELECT CASE WHEN zb.n < za.n THEN sb ELSE sa END AS engulfed, "
        f"CASE WHEN zb.n < za.n THEN sa ELSE sb END AS engulfer, "
        f"LEAST(za.n, zb.n) AS n_small, GREATEST(za.n, zb.n) AS n_big, "
        f"c AS n_common "
        f"FROM pr JOIN sz za ON za.sid = pr.sa JOIN sz zb ON zb.sid = pr.sb "
        f"WHERE 100 * c >= {thr} * LEAST(za.n, zb.n) "
        f"ORDER BY 1, 2")


def gen_sweepcarry(rng):
    # the q_watermark_plan / PrefixCarry dialect class (round-14 ask #4):
    # a prefix aggregate over a unique axis computed BOTH ways in one
    # query — the naive global-order window and the bucket-partitioned
    # window + carry-join decomposition — with the mismatch count emitted
    # as `expect_zero` (fuzz_check asserts that column is all-zero, on
    # top of the cross-engine compare). Merge is COALESCE/CASE based:
    # GREATEST/LEAST null semantics differ across engines.
    B = rng.choice([64, 256, 1024, 8192])
    agg = rng.choice(["MAX", "MIN", "SUM"])
    axis, measure, tbl = rng.choice([
        ("event_id", "CAST(FLOOR(value * 100) AS BIGINT)", "events"),
        ("o_orderkey", "CAST(FLOOR(o_totalprice * 100) AS BIGINT)", "orders"),
        ("c_custkey", "CAST(FLOOR(c_acctbal * 100) AS BIGINT)", "customer"),
        ("p_partkey", "CAST(p_size AS BIGINT)", "part"),
    ])
    where = pred(rng, TABLES[tbl])
    if agg == "SUM":
        merge = ("CASE WHEN w.rin IS NULL AND cr.cv IS NULL THEN NULL "
                 "ELSE COALESCE(w.rin, 0) + COALESCE(cr.cv, 0) END")
    else:
        cmp_ = ">" if agg == "MAX" else "<"
        merge = ("CASE WHEN w.rin IS NULL THEN cr.cv "
                 "WHEN cr.cv IS NULL THEN w.rin "
                 f"WHEN w.rin {cmp_} cr.cv THEN w.rin ELSE cr.cv END")
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    sql = (
        f"WITH ev AS (SELECT {axis} AS k, {measure} AS v FROM {tbl} "
        f"WHERE {where}), "
        f"b AS (SELECT k, v, CAST(FLOOR(k / {B}) AS BIGINT) AS bk FROM ev), "
        f"naive AS (SELECT k, {agg}(v) OVER (ORDER BY k {frame}) AS r FROM ev), "
        f"w AS (SELECT k, bk, {agg}(v) OVER "
        f"(PARTITION BY bk ORDER BY k {frame}) AS rin FROM b), "
        f"bm AS (SELECT bk, {agg}(v) AS bv FROM b GROUP BY 1), "
        f"cr AS (SELECT bk, {agg}(bv) OVER (ORDER BY bk {frame}) AS cv FROM bm), "
        f"dec AS (SELECT w.k, {merge} AS m FROM w JOIN cr ON cr.bk = w.bk) ")
    if rng.random() < 0.6:
        # COALESCE(…, 0): an empty filter result must read as 0 mismatches,
        # not a NULL sum
        return sql + (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(COALESCE(SUM(CASE WHEN n1.r IS DISTINCT FROM d.m "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS expect_zero, "
            "CAST(COALESCE(SUM(COALESCE(d.m, -1)), 0) AS BIGINT) AS chk "
            "FROM naive n1 JOIN dec d ON d.k = n1.k")
    return sql + (f"SELECT d.k, d.m FROM dec d ORDER BY d.k "
                  f"LIMIT {rng.randint(100, 1000)}")


def gen_bitmask(rng):
    # the q_audience_overlap dialect class (round-14 ask #4): per-user
    # bitmask over a bounded label alphabet, then mask census / bit-pair
    # overlap / popcount histogram — bits packed and extracted with pure
    # FLOOR-divide arithmetic (no engine-specific bit operators).
    nb = rng.randint(3, 6)
    B = rng.choice([100, 150, 200, 250])
    lbl = rng.choice([
        f"CAST(FLOOR(value / {B}) AS BIGINT) % {nb}",
        f"event_id % {nb}",
        f"(user_id + event_id) % {nb}",
    ])
    where = pred(rng, TABLES["events"])
    base = (
        f"WITH el AS (SELECT user_id AS uid, CAST({lbl} AS BIGINT) AS b "
        f"FROM events WHERE {where} GROUP BY 1, 2), "
        f"mask AS (SELECT uid, CAST(SUM(CAST(FLOOR(POWER(2.0, b)) AS BIGINT)) "
        f"AS BIGINT) AS m FROM el GROUP BY 1) ")
    def bit(p):
        return f"(FLOOR(m / {1 << p}) - 2 * FLOOR(m / {1 << (p + 1)}))"
    shape = rng.random()
    if shape < 0.4:
        return base + ("SELECT m, CAST(count(*) AS BIGINT) AS n_users "
                       "FROM mask GROUP BY m ORDER BY m")
    if shape < 0.8:
        i = rng.randint(0, nb - 1)
        j = (i + rng.randint(1, nb - 1)) % nb
        return base + (
            f"SELECT CAST(SUM(CASE WHEN {bit(i)} = 1 AND {bit(j)} = 1 "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS both_ij, "
            f"CAST(SUM(CASE WHEN {bit(i)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_i, "
            f"CAST(SUM(CASE WHEN {bit(j)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_j, "
            f"CAST(count(*) AS BIGINT) AS n_users FROM mask")
    bits = " + ".join(bit(p) for p in range(nb))
    return base + (f"SELECT CAST({bits} AS BIGINT) AS n_types, "
                   f"CAST(count(*) AS BIGINT) AS n_users "
                   f"FROM mask GROUP BY 1 ORDER BY 1")


def gen_chisq(rng):
    # the q_chisq_drift dialect class: two-window categorical mix census
    # with the collapsed two-cell chi-square D^2/(n1*n2*(o1+o2)) —
    # D = o1*n2 - o2*n1 exact in int64, the only float work one
    # identically-associated double chain (FLOOR-ppm, never a float sum).
    day = rng.randint(8, 24)
    cut = f"TIMESTAMP '2024-01-{day:02d} 00:00:00'"
    k = rng.randint(3, 9)
    cat = rng.choice([
        "event_type",
        f"CAST(user_id % {k} AS BIGINT)",
        f"concat(event_type, '#', CAST(CAST(event_id % {k} AS BIGINT) AS STRING))",
    ])
    where = pred(rng, TABLES["events"])
    base = (
        f"WITH cb AS (SELECT {cat} AS k, CAST(count(*) AS BIGINT) AS o1 "
        f"FROM events WHERE ts <= {cut} AND {where} GROUP BY 1), "
        f"cn AS (SELECT {cat} AS k, CAST(count(*) AS BIGINT) AS o2 "
        f"FROM events WHERE ts > {cut} AND {where} GROUP BY 1), "
        f"m AS (SELECT k, coalesce(o1, 0) AS o1, coalesce(o2, 0) AS o2 "
        f"FROM cb FULL OUTER JOIN cn USING (k)), "
        f"t AS (SELECT CAST(sum(o1) AS BIGINT) AS n1, "
        f"CAST(sum(o2) AS BIGINT) AS n2 FROM m) ")
    d = "(o1 * n2 - o2 * n1)"
    shape = rng.random()
    if shape < 0.4:
        return base + (
            f"SELECT k, o1, o2, CAST({d} AS BIGINT) AS d_num, "
            f"CAST(FLOOR((CAST({d} AS DOUBLE) * CAST({d} AS DOUBLE)) "
            f"/ ((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) "
            f"* CAST(o1 + o2 AS DOUBLE)) * 1000000.0) AS BIGINT) AS chi_ppm "
            f"FROM m CROSS JOIN t WHERE n1 > 0 AND n2 > 0 ORDER BY k")
    if shape < 0.8:
        return base + (
            f"SELECT k, o1, o2, "
            f"CAST(FLOOR(o1 * 1000000.0 / n1) AS BIGINT) AS share_base_ppm, "
            f"CAST(FLOOR(o2 * 1000000.0 / n2) AS BIGINT) AS share_new_ppm, "
            f"CAST(ABS({d}) AS BIGINT) AS d_abs "
            f"FROM m CROSS JOIN t WHERE n1 > 0 AND n2 > 0 ORDER BY k")
    return base + (
        f"SELECT k, CAST(ABS({d}) AS BIGINT) AS d_abs "
        f"FROM m CROSS JOIN t WHERE n1 > 0 AND n2 > 0 "
        f"ORDER BY d_abs DESC, k LIMIT {rng.randint(2, 5)}")


def gen_basket(rng):
    # the q_basket_rules dialect class: basket pair support / confidence
    # / lift in FLOOR-ppm over a bounded item alphabet — per-basket pair
    # fan-out is structurally capped by the alphabet, so the self-join
    # never explodes a key.
    if rng.random() < 0.5:
        k = rng.randint(4, 10)
        basket, item, tbl = ("l_orderkey",
                             f"CAST(l_suppkey % {k} AS BIGINT)", "lineitem")
        where = pred(rng, TABLES["lineitem"])
    else:
        basket, item, tbl = "user_id", "event_type", "events"
        where = pred(rng, TABLES["events"])
    minb = rng.randint(1, 4)
    base = (
        f"WITH b AS (SELECT DISTINCT {basket} AS ok, {item} AS item "
        f"FROM {tbl} WHERE {where}), "
        f"t AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM b), "
        f"ic AS (SELECT item, CAST(count(*) AS BIGINT) AS ni FROM b GROUP BY 1), "
        f"pc AS (SELECT a.item AS i1, c.item AS i2, "
        f"CAST(count(*) AS BIGINT) AS nb "
        f"FROM b a JOIN b c ON a.ok = c.ok AND a.item < c.item GROUP BY 1, 2) ")
    if rng.random() < 0.5:
        return base + (
            f"SELECT i1, i2, nb, ia.ni AS n1, ib.ni AS n2, "
            f"CAST(FLOOR(nb * 1000000.0 / t.n) AS BIGINT) AS support_ppm, "
            f"CAST(FLOOR(nb * 1000000.0 / ia.ni) AS BIGINT) AS conf_ppm "
            f"FROM pc CROSS JOIN t JOIN ic ia ON ia.item = pc.i1 "
            f"JOIN ic ib ON ib.item = pc.i2 "
            f"WHERE nb >= {minb} ORDER BY i1, i2")
    return base + (
        f"SELECT i1, i2, nb, "
        f"CAST(FLOOR(nb * 1000000.0 * t.n / (ia.ni * ib.ni)) AS BIGINT) "
        f"AS lift_ppm "
        f"FROM pc CROSS JOIN t JOIN ic ia ON ia.item = pc.i1 "
        f"JOIN ic ib ON ib.item = pc.i2 "
        f"WHERE nb >= {minb} ORDER BY i1, i2")


def gen_tridelta(rng):
    # the q_triangles_delta dialect class: the inclusion–exclusion
    # identity Δ = A − W2 + T3 asserted IN the query (the gen_sweepcarry
    # expect_zero pattern) — on a derived co-occurrence projection with a
    # hash-chosen "new" edge subset, tri(all) − tri(old) must equal the
    # new-edge-anchored recount for ANY 2-coloring (the identity is
    # set-theoretic; append-monotonicity is only what makes it USABLE
    # incrementally). Triangle counting uses the canonical a<b<c order.
    M = rng.choice([40, 60, 80])
    p = rng.randint(3, 7)
    where = pred(rng, TABLES["events"])
    base = (
        f"WITH e0 AS (SELECT DISTINCT CAST(user_id % {M} AS BIGINT) AS u, "
        f"CAST({M} + (event_id % {M}) AS BIGINT) AS v "
        f"FROM events WHERE {where}), "
        f"ce AS (SELECT a.u AS u, b.u AS v FROM e0 a JOIN e0 b "
        f"ON a.v = b.v AND a.u < b.u GROUP BY 1, 2), "
        f"newe AS (SELECT u, v FROM ce WHERE (u * 31 + v * 17) % {p} = 0), "
        f"olde AS (SELECT u, v FROM ce WHERE (u * 31 + v * 17) % {p} != 0), "
        f"sym AS (SELECT u AS x, v AS y FROM ce "
        f"UNION ALL SELECT v AS x, u AS y FROM ce), "
        f"symn AS (SELECT u AS x, v AS y FROM newe "
        f"UNION ALL SELECT v AS x, u AS y FROM newe), "
        f"ta AS (SELECT CAST(count(*) AS BIGINT) AS t FROM ce a "
        f"JOIN ce b ON b.u = a.u AND b.v > a.v "
        f"JOIN ce c ON c.u = a.v AND c.v = b.v), "
        f"tod AS (SELECT CAST(count(*) AS BIGINT) AS t FROM olde a "
        f"JOIN olde b ON b.u = a.u AND b.v > a.v "
        f"JOIN olde c ON c.u = a.v AND c.v = b.v), "
        f"aa AS (SELECT CAST(count(*) AS BIGINT) AS a FROM newe n "
        f"JOIN sym sa ON sa.x = n.u "
        f"JOIN sym sb ON sb.x = n.v AND sb.y = sa.y), "
        f"w2 AS (SELECT CAST(count(*) AS BIGINT) AS w FROM symn a "
        f"JOIN symn b ON b.x = a.x AND b.y > a.y "
        f"JOIN ce e ON e.u = a.y AND e.v = b.y), "
        f"t3 AS (SELECT CAST(count(*) AS BIGINT) AS t FROM newe a "
        f"JOIN newe b ON b.u = a.u AND b.v > a.v "
        f"JOIN newe c ON c.u = a.v AND c.v = b.v) ")
    return base + (
        "SELECT ta.t AS tri_all, tod.t AS tri_old, aa.a AS a_term, "
        "w2.w AS w2_term, t3.t AS t3_term, "
        "(ta.t - tod.t) - (aa.a - w2.w + t3.t) AS expect_zero "
        "FROM ta CROSS JOIN tod CROSS JOIN aa CROSS JOIN w2 CROSS JOIN t3")


def gen_rank(rng):
    # the GlobalRank/withNtiles dialect class (round-15, verdict ask #7):
    # SQL ntile(k) computed BOTH ways in one query — the window form and
    # the closed form from (global rank, total count) that the engine's
    # distributed ranker uses — with the mismatch count emitted as
    # `expect_zero` (the gen_sweepcarry pattern: fuzz_check asserts that
    # column is all-zero on top of the cross-engine compare). Closed
    # form: small = n//k, m = n%k, bigSpan = m*(small+1);
    # tile = rank if small == 0 else
    #        (rank-1)//(small+1)+1           if rank <= bigSpan
    #        m + (rank-1-bigSpan)//small + 1 otherwise.
    k = rng.choice([2, 3, 4, 5, 7, 10, 16, 100])
    key, val, tbl = rng.choice([
        ("event_id", "CAST(FLOOR(value * 100) AS BIGINT)", "events"),
        ("o_orderkey", "CAST(FLOOR(o_totalprice * 100) AS BIGINT)", "orders"),
        ("c_custkey", "CAST(FLOOR(c_acctbal * 100) AS BIGINT)", "customer"),
        ("p_partkey", "CAST(p_size AS BIGINT)", "part"),
    ])
    where = pred(rng, TABLES[tbl])
    small = f"CAST(FLOOR(nn.n / {k}) AS BIGINT)"
    m = f"(nn.n % {k})"
    big_span = f"({m} * ({small} + 1))"
    closed = (
        f"CASE WHEN {small} = 0 THEN r.rk "
        f"WHEN r.rk <= {big_span} "
        f"THEN CAST(FLOOR((r.rk - 1) / ({small} + 1)) AS BIGINT) + 1 "
        f"ELSE {m} + CAST(FLOOR((r.rk - 1 - {big_span}) / {small}) AS BIGINT) + 1 "
        f"END")
    base = (
        f"WITH ev AS (SELECT {key} AS id, {val} AS v FROM {tbl} "
        f"WHERE {where}), "
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev), "
        f"r AS (SELECT id, v, "
        f"CAST(row_number() OVER (ORDER BY v, id) AS BIGINT) AS rk, "
        f"CAST(ntile({k}) OVER (ORDER BY v, id) AS BIGINT) AS wt FROM ev), "
        f"c AS (SELECT r.id, r.v, r.wt, {closed} AS ct "
        f"FROM r CROSS JOIN nn) ")
    if rng.random() < 0.6:
        # COALESCE(…, 0): an empty filter must read as 0 mismatches
        return base + (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(COALESCE(SUM(CASE WHEN ct IS DISTINCT FROM wt "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS expect_zero, "
            "CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS chk FROM c")
    return base + (f"SELECT id, v, wt, ct FROM c ORDER BY id "
                   f"LIMIT {rng.randint(100, 1000)}")


def gen_signed(rng):
    # the q_vector_stats regression class (round-15): SIGNED division /
    # modulo semantics pinned cross-engine. Probed ground truth: both
    # engines' % is trunc-mod (sign of dividend: -7 % 3 = -1, 7 % -3 = 1),
    # int/int `/` is true division returning double in both, and
    # FLOOR(a/b) is the common floor-division spelling. The floor-mod
    # bridge ((a % b) + b) % b == a - FLOOR(a/b)*b (b > 0) is asserted
    # IN-QUERY as expect_zero — the identity that fails the moment one
    # side pairs trunc with floor, which is exactly how q_vector_stats'
    # pmod-floor spell diverged against DuckDB's truncating integer `//`.
    key, val, tbl = rng.choice([
        ("event_id", "CAST(FLOOR(value * 100) AS BIGINT)", "events"),
        ("o_orderkey", "CAST(FLOOR(o_totalprice * 100) AS BIGINT)", "orders"),
        ("c_custkey", "CAST(FLOOR(c_acctbal * 100) AS BIGINT)", "customer"),
        ("p_partkey", "CAST(p_size AS BIGINT)", "part"),
    ])
    shift = rng.randint(20, 500000)  # push a good fraction of a negative
    b = rng.choice([2, 3, 7, 16, 20, 97, 1000])
    where = pred(rng, TABLES[tbl])
    base = (
        f"WITH ev AS (SELECT {key} AS id, ({val} - {shift}) AS a "
        f"FROM {tbl} WHERE {where}), "
        f"d AS (SELECT id, a, a % {b} AS tm, "
        f"CAST(FLOOR(a / {b}) AS BIGINT) AS fq, "
        f"((a % {b}) + {b}) % {b} AS fm FROM ev) ")
    if rng.random() < 0.5:
        return base + (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(COALESCE(SUM(CASE WHEN fm != a - fq * {b} "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS expect_zero, "
            "CAST(COALESCE(SUM(tm), 0) AS BIGINT) AS chk_tm, "
            "CAST(COALESCE(SUM(fq), 0) AS BIGINT) AS chk_fq FROM d")
    return base + (f"SELECT id, a, tm, fq, fm FROM d ORDER BY id "
                   f"LIMIT {rng.randint(100, 1000)}")


def gen_layout(rng):
    # the q_compact_plan next-fit binning class (round-15 ask #7): the
    # closed-form bin id — floor(exclusive-prefix-sum / target) over a
    # per-partition-key file census — had a single hand-written oracle
    # and no generated coverage. Each query derives a randomized census
    # (group key × id-bucket "day", bytes = count * mult), computes the
    # exclusive prefix sum BOTH ways — the window running sum the engine
    # uses, and an independent smaller-day join re-aggregation — and
    # asserts bin-id agreement IN-QUERY as expect_zero on top of the
    # cross-engine compare of the binned plan itself. (g, day) is unique
    # by construction (GROUP BY), so the window order is total (H6).
    key, g, tbl = rng.choice([
        ("event_id", "event_type", "events"),
        ("o_orderkey", "o_orderpriority", "orders"),
        ("l_orderkey", "l_returnflag", "lineitem"),
        ("doc_id", "lang", "documents"),
        ("doc_id", "source", "documents"),
    ])
    bucket = rng.choice([7, 20, 53, 100, 256, 500])
    mult = rng.choice([1, 10, 50, 100, 137])
    target = rng.choice([500, 1000, 5000, 20000, 50000])
    where = pred(rng, TABLES[tbl])
    base = (
        f"WITH f AS (SELECT {g} AS g, "
        f"CAST(FLOOR({key} / {bucket}) AS BIGINT) AS day, "
        f"CAST(count(*) * {mult} AS BIGINT) AS bytes "
        f"FROM {tbl} WHERE {where} GROUP BY 1, 2), "
        f"w AS (SELECT g, day, bytes, "
        f"CAST(SUM(bytes) OVER (PARTITION BY g ORDER BY day "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes "
        f"AS BIGINT) AS so_w FROM f), "
        f"j AS (SELECT a.g AS g, a.day AS day, "
        f"CAST(COALESCE(SUM(b.bytes), 0) AS BIGINT) AS so_j "
        f"FROM f a LEFT JOIN f b ON b.g = a.g AND b.day < a.day "
        f"GROUP BY a.g, a.day), "
        f"m AS (SELECT w.g, w.day, w.bytes, w.so_w, j.so_j, "
        f"CAST(FLOOR(w.so_w / {target}) AS BIGINT) AS bin_w, "
        f"CAST(FLOOR(j.so_j / {target}) AS BIGINT) AS bin_j "
        f"FROM w JOIN j ON j.g = w.g AND j.day = w.day) ")
    if rng.random() < 0.5:
        # summary branch: prefix-sum identity + bin-id identity in-query
        return base + (
            "SELECT CAST(count(*) AS BIGINT) AS n_files, "
            "CAST(COALESCE(SUM(CASE WHEN so_w != so_j OR bin_w != bin_j "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS expect_zero, "
            "CAST(COALESCE(SUM(bin_w), 0) AS BIGINT) AS chk_bins, "
            "CAST(COALESCE(MAX(so_w + bytes), 0) AS BIGINT) AS chk_off FROM m")
    # plan branch: the full binned compaction plan, cross-engine row
    # compare, with the identity violation count riding along per bin
    return base + (
        "SELECT g, bin_w AS bin_id, CAST(count(*) AS BIGINT) AS n_files, "
        "CAST(SUM(bytes) AS BIGINT) AS bytes_total, "
        "CAST(MIN(day) AS BIGINT) AS day_min, CAST(MAX(day) AS BIGINT) AS day_max, "
        "CAST(COALESCE(SUM(CASE WHEN bin_w != bin_j THEN 1 ELSE 0 END), 0) "
        "AS BIGINT) AS expect_zero "
        "FROM m GROUP BY 1, 2 ORDER BY 1, 2")


def gen_novelty(rng):
    # the q_ngram_novelty first-owner class (round 16): ownership of a
    # value = min id holding it, computed BOTH ways — the min-groupby
    # census the engine uses and an independent correlated NOT EXISTS
    # (no strictly-smaller id with the same value) — with the mismatch
    # count as in-query expect_zero on top of the cross-engine compare
    # of the per-owner census.
    key, val, tbl = rng.choice([
        ("event_id", "CAST(FLOOR(value * 10) AS BIGINT)", "events"),
        ("event_id", "user_id", "events"),
        ("o_orderkey", "o_custkey", "orders"),
        ("c_custkey", "c_nationkey", "customer"),
        ("l_orderkey * 10 + l_linenumber", "l_partkey", "lineitem"),
        ("doc_id", "n_chars", "documents"),
    ])
    where = pred(rng, TABLES[tbl])
    base = (
        f"WITH p AS (SELECT {key} AS id, CAST({val} AS BIGINT) AS v "
        f"FROM {tbl} WHERE {where}), "
        f"own AS (SELECT v, min(id) AS owner FROM p GROUP BY v), "
        f"chk AS (SELECT p.id, p.v, "
        f"CASE WHEN o.owner = p.id THEN 1 ELSE 0 END AS f_min, "
        f"CASE WHEN NOT EXISTS (SELECT 1 FROM p p2 "
        f"WHERE p2.v = p.v AND p2.id < p.id) THEN 1 ELSE 0 END AS f_ex "
        f"FROM p JOIN own o ON o.v = p.v) ")
    if rng.random() < 0.5:
        return base + (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(COALESCE(SUM(CASE WHEN f_min != f_ex THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) AS expect_zero, "
            "CAST(COALESCE(SUM(f_min), 0) AS BIGINT) AS n_owners, "
            "CAST(COALESCE(SUM(CASE WHEN f_min = 1 THEN id ELSE 0 END), 0) "
            "AS BIGINT) AS chk_ownersum FROM chk")
    return base + (
        "SELECT v, CAST(min(id) AS BIGINT) AS owner, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(COALESCE(SUM(CASE WHEN f_min != f_ex THEN 1 ELSE 0 END), 0) "
        "AS BIGINT) AS expect_zero "
        f"FROM chk GROUP BY v ORDER BY v LIMIT {rng.randint(100, 800)}")


def gen_query(rng):
    roll = rng.random()
    if roll < 0.02:
        return gen_novelty(rng)
    if roll < 0.045:
        return gen_layout(rng)
    roll = rng.random()
    if roll < 0.03:
        return gen_containment(rng)
    if roll < 0.06:
        return gen_sweepcarry(rng)
    if roll < 0.09:
        return gen_bitmask(rng)
    roll = rng.random()
    if roll < 0.03:
        return gen_chisq(rng)
    if roll < 0.06:
        return gen_basket(rng)
    if roll < 0.08:
        return gen_tridelta(rng)
    if roll < 0.11:
        return gen_rank(rng)
    if roll < 0.14:
        return gen_signed(rng)
    roll = rng.random()
    if roll < 0.04:
        return gen_graphcte(rng)
    if roll < 0.08:
        return gen_wedge(rng)
    if roll < 0.11:
        return gen_rrf(rng)
    if roll < 0.14:
        return gen_clip(rng)
    roll = rng.random()
    if roll < 0.05:
        return gen_percentile(rng)
    if roll < 0.10:
        return gen_argextreme(rng)
    if roll < 0.14:
        return gen_textfn(rng)
    if roll < 0.17:
        return gen_frames(rng)
    roll = rng.random()
    if roll < 0.04:
        return gen_arith(rng)
    roll = rng.random()
    if roll < 0.05:
        return gen_winfam(rng)
    if roll < 0.09:
        return gen_grouping(rng)
    if roll < 0.13:
        return gen_exists(rng)
    if roll < 0.17:
        return gen_datefn(rng)
    roll = rng.random()
    if roll < 0.06:
        return gen_global(rng)
    if roll < 0.1:
        return gen_leftjoin(rng)
    if roll < 0.12:
        return gen_join(rng)
    if roll < 0.22:
        return gen_window(rng)
    if roll < 0.30:
        return gen_distinct(rng)
    if roll < 0.38:
        return gen_case(rng)
    if roll < 0.46:
        return gen_scalar(rng)
    if roll < 0.52:
        return gen_union(rng)
    if roll < 0.60:
        return gen_subquery(rng)
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    kind = rng.choice(["scan", "agg", "agg"])
    where = " AND ".join(pred(rng, cols) for _ in range(rng.randint(1, 3)))
    if kind == "scan":
        keys = [c for c, _ in cols]
        proj = rng.sample(keys, rng.randint(2, len(keys)))
        # total order over ALL projected columns + a unique key first
        # column set may not contain the key — order by all projected cols
        order = ", ".join(proj)
        limit = rng.choice(["", f" LIMIT {rng.randint(5, 500)}",
                            f" LIMIT {rng.randint(5, 200)} OFFSET {rng.randint(1, 50)}"])
        # LIMIT needs a total order: only emit when ordering by a superset
        # that includes the table's unique key (first col of each table)
        key = cols[0][0]
        if limit and key not in proj:
            proj.append(key)
            order = ", ".join(proj)
        return (f"SELECT {', '.join(proj)} FROM {t} WHERE {where} "
                f"ORDER BY {order}{limit}")
    group_candidates = [c for c, k in cols if k in ("s", "i")]
    g = rng.sample(group_candidates, rng.randint(1, min(2, len(group_candidates))))
    aggs = agg_exprs(rng, cols)
    having = f" HAVING count(*) > {rng.randint(0, 3)}" if rng.random() < 0.4 else ""
    return (f"SELECT {', '.join(g + aggs)} FROM {t} WHERE {where} "
            f"GROUP BY {', '.join(g)}{having} ORDER BY {', '.join(g)}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    fam = None
    for a in sys.argv[3:]:
        if a.startswith("--family="):
            fam = a.split("=", 1)[1]
    rng = random.Random(seed)
    if fam:
        gens = {"containment": gen_containment, "sweepcarry": gen_sweepcarry,
                "bitmask": gen_bitmask, "chisq": gen_chisq,
                "basket": gen_basket, "tridelta": gen_tridelta,
                "rank": gen_rank, "signed": gen_signed, "layout": gen_layout,
                "novelty": gen_novelty}
        fns = [gens[f] for f in fam.split(",")]
        queries = {f"fz_{i:04d}": fns[i % len(fns)](rng) for i in range(n)}
    else:
        queries = {f"fz_{i:04d}": gen_query(rng) for i in range(n)}
    json.dump(queries, sys.stdout, indent=0)


if __name__ == "__main__":
    main()
