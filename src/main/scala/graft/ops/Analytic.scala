package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Canonical => C, Q, Tables => T}
import graft.functions.TopKAggregator

/** Analytic breadth beyond the reference's surface (which delegates all of
  * SQL to DuckDB — SURVEY.md §2C): window-function families, CUBE /
  * GROUPING SETS, correlated and scalar subqueries, scalar string/date
  * function parity, and the bounded-memory top-k-per-group aggregator as a
  * declared (oracle-checked) operator.
  *
  * Scale posture: every query is one shuffle on its natural key (window
  * partition or group key) plus the determinism sort; scalar-function
  * queries are pure map-side projections. The scalar subquery broadcasts a
  * 1-row aggregate (BroadcastNestedLoopJoin over one row — no fact
  * shuffle).
  */
object Analytic {

  /** lag/lead/first_value — the navigation-function family, per user over
    * event time. Total order inside each partition via (ts, event_id). */
  val windowLeadLag: Q = Q(
    "q_window_lead_lag",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
      |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_eid
      |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("event_id")).over(w).as("first_eid"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** ntile/percent_rank/cume_dist — the distribution-function family.
    * The window order is unique ((o_totalprice, o_orderkey)), so rank ==
    * row_number and the rational outputs are identical exact divisions in
    * both engines. */
  val windowNtile: Q = Q(
    "q_window_ntile",
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile,
      |  percent_rank() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey) AS pr,
      |  cume_dist() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey) AS cd
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    T.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey")
  }

  /** CUBE over (returnflag, linestatus): all four grouping combinations in
    * one Expand + hash-aggregate pass over the fact (no re-scan per
    * grouping). SQL form for the same reason as q_rollup (DataFrame cube
    * trips the ambiguous-self-join detector on later column refs). */
  val cube: Q = Q(
    "q_cube",
    """SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag, l_linestatus) AS gid,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d).createOrReplaceTempView("g_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, grouping_id(l_returnflag, l_linestatus) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM g_lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** Explicit GROUPING SETS — two one-dimension rollups plus the grand
    * total, one pass over orders. */
  val groupingSets: Q = Q(
    "q_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d).createOrReplaceTempView("g_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping_id(o_orderstatus, o_orderpriority) AS gid,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM g_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** Correlated EXISTS with an extra predicate: customers holding at least
    * one order above the threshold. Plans as a left-semi hash join — the
    * filter reduces the build side before it broadcasts/shuffles. */
  val existsCorrelated: Q = Q(
    "q_exists_correlated",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    val bigOrders = T.orders(s, d)
      .filter(col("o_totalprice") > 150000)
      .select("o_custkey")
    T.customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Uncorrelated scalar subquery: orders above the global average price.
    * The average is exact (decimal sum / count, H3) and joins as a 1-row
    * broadcast — the fact side streams map-side, no shuffle before the
    * determinism sort. */
  val subqueryScalar: Q = Q(
    "q_subquery_scalar",
    """WITH g AS (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |           / COUNT(*) AS avg_price
      |  FROM orders)
      |SELECT o_orderkey, o_totalprice, avg_price
      |FROM orders, g WHERE o_totalprice > avg_price
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val o = T.orders(s, d)
    val g = o.agg((C.dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
    o.join(broadcast(g))
      .filter(col("o_totalprice") > col("avg_price"))
      .select("o_orderkey", "o_totalprice", "avg_price")
      .orderBy("o_orderkey")
  }

  /** Scalar string-function parity sweep (substr/upper/lower/replace/
    * length/lpad/reverse/regexp_extract/concat_ws) — pure map-side
    * projection, all inside whole-stage codegen. */
  val stringFuncs: Q = Q(
    "q_string_funcs",
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_upper,
      |  lower(c_name) AS name_lower,
      |  substr(c_name, 10, 9) AS id_part,
      |  replace(c_name, 'Customer#', 'C-') AS short_name,
      |  CAST(length(c_name) AS INTEGER) AS name_len,
      |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_pad,
      |  reverse(c_mktsegment) AS seg_rev,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS id_digits,
      |  concat_ws('|', c_mktsegment, c_name) AS joined
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    T.customer(s, d).select(
      col("c_custkey"),
      upper(col("c_mktsegment")).as("seg_upper"),
      lower(col("c_name")).as("name_lower"),
      substring(col("c_name"), 10, 9).as("id_part"),
      regexp_replace(col("c_name"), lit("Customer#"), lit("C-")).as("short_name"),
      length(col("c_name")).as("name_len"),
      lpad(col("c_nationkey").cast(StringType), 4, "0").as("nat_pad"),
      reverse(col("c_mktsegment")).as("seg_rev"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("id_digits"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
      .orderBy("c_custkey")
  }

  /** Scalar date/timestamp-function parity sweep: extraction, truncation,
    * interval arithmetic, day difference. Timestamps compared as epoch
    * micros (H5); order dates are midnight-aligned so day arithmetic has
    * no partial-day divergence between engines. */
  val dateFuncs: Q = Q(
    "q_date_funcs",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS y,
      |  CAST(month(o_orderdate) AS INTEGER) AS m,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
      |  epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30_us,
      |  CAST(date_diff('day', o_orderdate, TIMESTAMP '2025-01-01 00:00:00') AS INTEGER) AS days_to_2025
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    T.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      unix_micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
      unix_micros(col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus30_us"),
      datediff(lit("2025-01-01").cast(DateType), col("o_orderdate").cast(DateType))
        .as("days_to_2025"))
      .orderBy("o_orderkey")
  }

  /** Array-function parity sweep over the token array (element_at both
    * ends, slice, position, containment) — map-side only; the array is
    * built and consumed inside one projection, never shuffled. */
  val arrayFuncs: Q = Q(
    "q_array_funcs",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  toks[1] AS first_tok,
      |  toks[-1] AS last_tok,
      |  CAST(len(toks) AS BIGINT) AS n_tok,
      |  array_to_string(toks[1:3], ' ') AS first3,
      |  CAST(list_position(toks, 'the') AS BIGINT) AS pos_the,
      |  list_contains(toks, 'the') AS has_the
      |FROM t ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    T.documents(s, d).select(
      col("doc_id"),
      element_at(toks, 1).as("first_tok"),
      element_at(toks, -1).as("last_tok"),
      size(toks).cast(LongType).as("n_tok"),
      concat_ws(" ", slice(toks, 1, 3)).as("first3"),
      array_position(toks, "the").as("pos_the"),
      array_contains(toks, "the").as("has_the"))
      .orderBy("doc_id")
  }

  /** Bounded-memory top-k per group as a DECLARED operator: the typed
    * TopKAggregator (k-entry partial buffers, associative merge — the
    * shuffle carries ≤k rows per partition×group instead of every
    * candidate) with the window-function formulation as its oracle. This
    * promotes the scale path itself to oracle-checked status rather than
    * only spec-checked (TopKAggregatorSpec). */
  val topkPerGroup: Q = Q(
    "q_topk_per_group",
    """SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val top = T.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAggregator(3).toColumn.name("top"))
    top.toDF("o_orderpriority", "top")
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast(IntegerType).as("rn"),
        col("col._1").as("o_orderkey"), col("col._2").as("o_totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  /** Bounded-ROWS moving aggregate (4-row trailing window) — the frame
    * family q_window_running (unbounded) and q_window_range (RANGE) don't
    * cover. Sum is exact decimal over the frame; the average divides by
    * the frame's actual row count so leading edges are exact too. */
  val windowMoving: Q = Q(
    "q_window_moving",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mov_avg
      |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    val movSum = sum(col("value").cast(DecimalType(18, 2))).over(w).cast(DoubleType)
    T.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        movSum.as("mov_sum"),
        (movSum / count(lit(1)).over(w)).as("mov_avg"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Conditional / null-handling scalar sweep: least/greatest (IEEE
    * double compares of identical products), nullif (manufactures NULLs —
    * the base data has none), coalesce defaulting, and a 3-arm CASE band.
    * Map-side projection. The ORDER BY chain includes every output column
    * except flag_or_null, whose value is determined by flag_default —
    * so the order is total (H6) without sorting on a NULLable key. */
  val conditionalFuncs: Q = Q(
    "q_conditional_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  least(l_quantity, l_discount * 100) AS lo,
      |  greatest(l_quantity, l_tax * 100) AS hi,
      |  nullif(l_returnflag, 'N') AS flag_or_null,
      |  coalesce(nullif(l_returnflag, 'N'), '-') AS flag_default,
      |  CASE WHEN l_quantity >= 25 THEN 'big' WHEN l_quantity >= 10 THEN 'mid'
      |       ELSE 'small' END AS band
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, lo, hi, flag_default, band""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      least(col("l_quantity"), col("l_discount") * 100).as("lo"),
      greatest(col("l_quantity"), col("l_tax") * 100).as("hi"),
      nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
      coalesce(nullif(col("l_returnflag"), lit("N")), lit("-")).as("flag_default"),
      when(col("l_quantity") >= 25, "big")
        .when(col("l_quantity") >= 10, "mid")
        .otherwise("small").as("band"))
      .orderBy("l_orderkey", "l_linenumber", "lo", "hi", "flag_default", "band")
  }

  /** Event-transition mining: per-user consecutive (prev → next) event
    * pairs counted corpus-wide — the Markov transition table behind
    * next-action models and bot detection. One window shuffle on user_id
    * (lag inside the per-user sort), then a 25-group aggregate with
    * map-side partials. */
  val userPath: Q = Q(
    "q_user_path",
    """WITH steps AS (
      |  SELECT user_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |    event_type AS next_type
      |  FROM events)
      |SELECT prev_type, next_type, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users
      |FROM steps WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type ORDER BY prev_type, next_type""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        col("event_type").as("next_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("prev_type", "next_type")
  }

  /** RFM segmentation: per-customer recency (latest order date), frequency
    * (order count), monetary (exact decimal total), then quartile labels
    * over a TOTAL order (metric + customer key — ties broken
    * deterministically, the H6 rule ntile needs).
    *
    * Scale shape: a window `ntile(4) OVER (ORDER BY …)` moves EVERY
    * customer through one window task — fine at sf, a single-task funnel
    * at 10⁸ customers (the q_watermark_plan class of scale-killer, round
    * 14 audit). Each quartile label goes through
    * [[graft.core.GlobalRank.withNtiles]] instead: range-repartitioned
    * distributed sort per key, rank within partitions, per-partition
    * prefix offsets, closed-form SQL-ntile from (rank, n) —
    * bit-identical to the window ntile (GlobalRankSpec sweeps n×k; the
    * DuckDB oracle still runs the naive window form). The three keys
    * are ranked in ONE batched call: one lazy-checkpointed base, one
    * union offset-census action, one pivot-assembly join — the
    * sequential form paid 3 eager checkpoints + 3 synchronous control
    * reads for a 10k-row census (round-14 verdict #2, 0.56 → 2.19 s).
    * PlanShapeSpec pins the no-global-window plan. */
  val rfm: Q = Q(
    "q_rfm",
    """WITH base AS (
      |  SELECT o_custkey AS cust,
      |    max(epoch_us(o_orderdate)) AS recency_us,
      |    count(*) AS freq,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY 1)
      |SELECT cust, recency_us, freq, monetary,
      |  CAST(ntile(4) OVER (ORDER BY recency_us, cust) AS BIGINT) AS r_q,
      |  CAST(ntile(4) OVER (ORDER BY freq, cust) AS BIGINT) AS f_q,
      |  CAST(ntile(4) OVER (ORDER BY monetary, cust) AS BIGINT) AS m_q
      |FROM base ORDER BY cust""".stripMargin
  ) { (s, d) =>
    val base = T.orders(s, d)
      .groupBy(col("o_custkey").as("cust"))
      .agg(max(unix_micros(col("o_orderdate"))).as("recency_us"),
        count(lit(1)).as("freq"),
        C.dsum(col("o_totalprice")).as("monetary"))
    graft.core.GlobalRank.withNtiles(base, Seq("cust"), Seq(
      ("r_q", 4, Seq(col("recency_us"), col("cust"))),
      ("f_q", 4, Seq(col("freq"), col("cust"))),
      ("m_q", 4, Seq(col("monetary"), col("cust")))))
      .select(col("cust"), col("recency_us"), col("freq"), col("monetary"),
        col("r_q").cast(LongType).as("r_q"),
        col("f_q").cast(LongType).as("f_q"),
        col("m_q").cast(LongType).as("m_q"))
      .orderBy("cust")
  }

  /** Windowed DISTINCT count via the max-dense_rank identity: neither
    * engine's window frames support COUNT(DISTINCT), but
    * max(dense_rank over (key ORDER BY v)) over (key) ≡ the partition's
    * distinct-v count, expressible identically in both. Two window passes
    * share one hash-partition shuffle on user_id (different intra-partition
    * orders, so one exchange + two sorts — the second sort is the
    * unavoidable cost of the unordered-frame max). */
  val windowDistinct: Q = Q(
    "q_window_distinct",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  max(dr) OVER (PARTITION BY user_id) AS n_types
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS dr
      |  FROM events)
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    val wRank = Window.partitionBy("user_id").orderBy("event_type")
    val wAll = Window.partitionBy("user_id")
    T.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .withColumn("dr", dense_rank().over(wRank).cast(LongType))
      .withColumn("n_types", max(col("dr")).over(wAll))
      .select("user_id", "event_id", "ts_us", "n_types")
      .orderBy("user_id", "event_id")
  }

  /** First-touch / last-touch conversion attribution — which prior
    * event type gets credit for each purchase: the per-conversion
    * backward scan every marketing/ads warehouse runs, and the window
    * idiom q_user_path (adjacent transitions) and the as-of family
    * (single keyed match) don't cover — attribution needs BOTH the
    * earliest and the most recent qualifying touch strictly before the
    * conversion in one pass. Non-purchase events are the touches;
    * first_value/last_value with IGNORE NULLS over a ROWS … 1 PRECEDING
    * frame resolve both models inside ONE per-user sort (the frame
    * excludes the conversion row itself, so a purchase never attributes
    * to itself or a later event). Census per (model, touch_type):
    * conversions and exact-decimal revenue (the H3 dsum convention).
    *
    * Scale shape: one window shuffle on user_id (both window expressions
    * share the frame spec, so one sort), then a map-side unpivot of the
    * two models and a ≤ 2·|event types|-group partial aggregate. No
    * join, no second shuffle beyond the final tiny group-by. */
  val attribution: Q = Q(
    "q_attribution",
    """WITH ev AS (
      |  SELECT user_id, event_id, ts, value, event_type,
      |    CASE WHEN event_type <> 'purchase' THEN event_type END AS touch
      |  FROM events),
      |ann AS (
      |  SELECT event_type, value,
      |    first_value(touch IGNORE NULLS) OVER w AS first_touch,
      |    last_value(touch IGNORE NULLS) OVER w AS last_touch
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT model, touch_type, CAST(count(*) AS BIGINT) AS n_conversions,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT 'first' AS model, first_touch AS touch_type, value
      |  FROM ann WHERE event_type = 'purchase' AND first_touch IS NOT NULL
      |  UNION ALL
      |  SELECT 'last', last_touch, value
      |  FROM ann WHERE event_type = 'purchase' AND last_touch IS NOT NULL)
      |GROUP BY model, touch_type ORDER BY model, touch_type""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // unpivot the two models with ONE bounded explode instead of a
    // self-union: a union would evaluate the window subtree once per
    // branch (two sorts over the reused exchange); this keeps a single
    // Window operator in the plan (PlanShapeSpec pins it)
    T.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("event_type"),
        when(col("event_type") =!= "purchase", col("event_type")).as("touch"))
      .select(col("event_type"), col("value"),
        first(col("touch"), ignoreNulls = true).over(w).as("first_touch"),
        last(col("touch"), ignoreNulls = true).over(w).as("last_touch"))
      .filter(col("event_type") === "purchase")
      .select(col("value"), explode(array(
        struct(lit("first").as("model"), col("first_touch").as("touch_type")),
        struct(lit("last").as("model"), col("last_touch").as("touch_type"))))
        .as("mt"))
      .filter(col("mt.touch_type").isNotNull)
      .groupBy(col("mt.model").as("model"), col("mt.touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"), C.dsum(col("value")).as("sum_value"))
      .orderBy("model", "touch_type")
  }

  /** Pairwise AUDIENCE OVERLAP between event types — "how many users do
    * checkout and search share?" — here over the HIGH-VALUE audience
    * (users with a value ≥ 200 event of the type; the sf events value
    * tail — unfiltered, every user does every type and the census is
    * all-ones), done the way it scales: never a
    * user-level self-join (users² at 100 TB), but a per-user TYPE
    * BITMASK (one bit_or aggregate, the only user-keyed shuffle), then a
    * mask census of ≤ 2^types rows, from which every pair's |A|, |B|,
    * |A∩B|, |A∪B| falls out in closed form by conditional sums over the
    * tiny census × pair table. Exact integers; jaccard as floor-ppm.
    * The bit index is the rank of the type name in sorted order — a
    * deterministic dictionary both engines derive identically. Grows
    * O(2^types) census rows — right for enumerable type sets (5 here);
    * a high-cardinality "type" would switch to per-pair sketches
    * (q_approx_distinct's path). */
  val audienceOverlap: Q = Q(
    "q_audience_overlap",
    """WITH ty AS (
      |  SELECT event_type,
      |    CAST(row_number() OVER (ORDER BY event_type) - 1 AS INT) AS idx
      |  FROM (SELECT DISTINCT event_type FROM events)),
      |um AS (
      |  SELECT user_id, CAST(bit_or(1::BIGINT << idx) AS BIGINT) AS mask
      |  FROM events JOIN ty USING (event_type)
      |  WHERE value >= 200 GROUP BY user_id),
      |mc AS (SELECT mask, CAST(count(*) AS BIGINT) AS c FROM um GROUP BY 1),
      |pr AS (
      |  SELECT a.event_type AS type_a, a.idx AS ia,
      |         b.event_type AS type_b, b.idx AS ib
      |  FROM ty a JOIN ty b ON a.idx < b.idx),
      |agg AS (
      |  SELECT type_a, type_b,
      |    CAST(sum(CASE WHEN (mask >> ia) & 1 = 1 THEN c ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN (mask >> ib) & 1 = 1 THEN c ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN (mask >> ia) & 1 = 1 AND (mask >> ib) & 1 = 1
      |             THEN c ELSE 0 END) AS BIGINT) AS n_both,
      |    CAST(sum(CASE WHEN (mask >> ia) & 1 = 1 OR (mask >> ib) & 1 = 1
      |             THEN c ELSE 0 END) AS BIGINT) AS n_union
      |  FROM pr CROSS JOIN mc GROUP BY 1, 2)
      |SELECT type_a, type_b, n_a, n_b, n_both, n_union,
      |  CAST(CASE WHEN n_union = 0 THEN 0
      |       ELSE (1000000 * n_both) // n_union END AS BIGINT) AS jaccard_ppm
      |FROM agg ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val w = Window.orderBy("event_type")
    // type dictionary: O(types) rows — the lone unpartitioned window
    val ty = T.events(s, d).select("event_type").distinct()
      .withColumn("idx", (row_number().over(w) - 1).cast(IntegerType))
    val um = T.events(s, d).filter(col("value") >= 200)
      .join(broadcast(ty), "event_type")
      .groupBy("user_id")
      .agg(bit_or(expr("shiftleft(1L, idx)")).as("mask"))
    val mc = um.groupBy("mask").agg(count(lit(1)).as("c"))
    val pr = ty.select(col("event_type").as("type_a"), col("idx").as("ia"))
      .crossJoin(ty.select(col("event_type").as("type_b"), col("idx").as("ib")))
      .filter(col("ia") < col("ib"))
    def hasBit(bitCol: String) =
      expr(s"(mask >> $bitCol) & 1").cast(LongType) === 1L
    broadcast(pr).crossJoin(mc)
      .groupBy("type_a", "type_b")
      .agg(
        sum(when(hasBit("ia"), col("c")).otherwise(0L)).as("n_a"),
        sum(when(hasBit("ib"), col("c")).otherwise(0L)).as("n_b"),
        sum(when(hasBit("ia") && hasBit("ib"), col("c")).otherwise(0L))
          .as("n_both"),
        sum(when(hasBit("ia") || hasBit("ib"), col("c")).otherwise(0L))
          .as("n_union"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"), col("n_union"),
        when(col("n_union") === 0L, 0L)
          .otherwise(expr("(1000000 * n_both) div n_union")).as("jaccard_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** Pair-support floor: a rule must cover ≥ 2.2% of baskets to be
    * emitted — right at the uniform-brand expectation, so the gate
    * genuinely bisects the pair population instead of admitting
    * everything (the classic a-priori min-support gate; compared on
    * exact integers — n_both·10⁶ ≥ ppm·n_orders — so no float ever
    * decides membership). */
  private val BasketMinSupportPpm = 22000L

  /** Market-basket association rules over order baskets — the classic
    * retail-analytics operator the inventory lacked (q_cooccur_lift is
    * the TOKEN-pair lift inside documents; this is basket-level support
    * / confidence / lift over what customers put in one ORDER, the
    * output a recommender or store-layout job consumes). Items are part
    * BRANDS (lineitem ⋈ part), baskets are orders; a rule ante → conseq
    * is emitted in BOTH directions (confidence is asymmetric) when the
    * pair clears the min-support gate.
    *
    * All three metrics are exact integer ppm: support = n_both/n_orders,
    * confidence = n_both/n_ante, lift = n_both·n_orders/(n_ante·n_conseq)
    * (numerator n_both·n_orders·10⁶ ≈ 2·10¹⁶ at sf0.1 — int64-safe;
    * past ~10⁹ baskets the documented switch is DECIMAL(38,0), the
    * q_ks_drift rule).
    *
    * Scale shape: one partial-aggregating distinct over (order, brand),
    * then the pair self-join keyed on o_orderkey — per-basket fan-out is
    * C(k, 2) with k ≤ min(basket size, |brand dictionary| = 25), so no
    * join key ever explodes (the bound is structural, not data-luck:
    * a basket cannot contain more distinct brands than the dictionary
    * holds; for catalog-sized dictionaries the hub-split recipe from
    * Graph.blockedSpokePairs applies verbatim). The pair census
    * collapses to ≤ dict² rows before the broadcast metric joins. */
  val basketRules: Q = Q(
    "q_basket_rules",
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS item
       |  FROM lineitem JOIN part ON p_partkey = l_partkey),
       |t AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM b),
       |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM b GROUP BY 1),
       |pc AS (SELECT a.item AS i1, c.item AS i2, CAST(count(*) AS BIGINT) AS n_both
       |       FROM b a JOIN b c ON a.ok = c.ok AND a.item < c.item GROUP BY 1, 2),
       |keep AS (SELECT i1, i2, n_both FROM pc CROSS JOIN t
       |         WHERE n_both * 1000000 >= $BasketMinSupportPpm * n_orders),
       |dir AS (SELECT i1 AS ante, i2 AS conseq, n_both FROM keep
       |        UNION ALL SELECT i2 AS ante, i1 AS conseq, n_both FROM keep)
       |SELECT dir.ante, dir.conseq, dir.n_both,
       |  ia.n_item AS n_ante, ic2.n_item AS n_conseq,
       |  CAST(dir.n_both * 1000000 // t.n_orders AS BIGINT) AS support_ppm,
       |  CAST(dir.n_both * 1000000 // ia.n_item AS BIGINT) AS confidence_ppm,
       |  CAST(dir.n_both * t.n_orders * 1000000 // (ia.n_item * ic2.n_item)
       |    AS BIGINT) AS lift_ppm
       |FROM dir CROSS JOIN t
       |JOIN ic ia ON ia.item = dir.ante
       |JOIN ic ic2 ON ic2.item = dir.conseq
       |ORDER BY ante, conseq""".stripMargin
  ) { (s, d) =>
    // one shuffle builds the baskets (collect_set dedups in the agg);
    // pairs then expand MAP-SIDE from each sorted basket array — no
    // second shuffle of the (order, item) relation and no self-join:
    // per-basket fan-out is C(k, 2) with k capped by the dictionary
    // (basketCensus, shared with q_basket_chisq)
    val (t0, ic, pc) = basketCensus(s, d)
    val t = t0.select(col("n_baskets").as("n_orders"))
    val keep = pc.crossJoin(broadcast(t))
      .filter(col("n_both") * 1000000L >= lit(BasketMinSupportPpm) * col("n_orders"))
    val dir = keep.select(col("i1").as("ante"), col("i2").as("conseq"),
        col("n_both"), col("n_orders"))
      .unionAll(keep.select(col("i2").as("ante"), col("i1").as("conseq"),
        col("n_both"), col("n_orders")))
    dir
      .join(broadcast(ic.select(col("item").as("ante"), col("n_item").as("n_ante"))),
        "ante")
      .join(broadcast(ic.select(col("item").as("conseq"), col("n_item").as("n_conseq"))),
        "conseq")
      .select(col("ante"), col("conseq"), col("n_both"),
        col("n_ante"), col("n_conseq"),
        expr("n_both * 1000000 div n_orders").as("support_ppm"),
        expr("n_both * 1000000 div n_ante").as("confidence_ppm"),
        expr("n_both * n_orders * 1000000 div (n_ante * n_conseq)").as("lift_ppm"))
      .orderBy("ante", "conseq")
  }

  /** The shared basket machinery (one shuffle, map-side pair expansion)
    * factored for [[basketRules]]' sibling censuses: (baskets, 1-row
    * total, per-item counts, unordered pair counts). */
  private def basketCensus(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val baskets = T.lineitem(s, d)
      .join(T.part(s, d), col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
      .groupBy("ok").agg(sort_array(collect_set(col("item"))).as("items"))
      .localCheckpoint() // feeds totals, item counts, and the pair expansion
    val t = baskets.agg(count(lit(1)).as("n_baskets"))
    val ic = baskets
      .select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val pc = baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items) - i - 1),
          |    y -> struct(x AS i1, y AS i2))))""".stripMargin)).as("p"))
      .groupBy(col("p.i1").as("i1"), col("p.i2").as("i2"))
      .agg(count(lit(1)).as("n_both"))
    (t, ic, pc)
  }

  /** Rule-significance census — the chi-square INTERESTINGNESS measure
    * basket mining runs after support/confidence/lift (q_basket_rules):
    * per unordered item pair, the 2×2 presence/absence contingency test
    * against independence. The textbook N·(ad−bc)²/(r₁·r₂·c₁·c₂)
    * collapses on the basket margins to N·D²/(n₁(N−n₁)·n₂(N−n₂)) with
    * D = n_both·N − n₁·n₂ — EXACT in int64 (|D| ≤ N², ~2·10¹⁰ at sf0.1;
    * the documented DECIMAL(38,0) switch past ~10⁹ baskets), so the only
    * float work is one identically-associated double chain rounded to
    * 6 dp (the q_chisq_drift recipe on the association axis; no float is
    * ever summed). D's SIGN is the association direction (positive =
    * co-occur above independence), emitted as exact integer evidence.
    * Universal items (n = N) are excluded by both engines — a margin of
    * zero makes the statistic undefined, and an item in every basket
    * carries no association signal.
    *
    * Scale shape: identical to q_basket_rules — the shared basketCensus
    * (one shuffle + map-side pair expansion, per-basket fan-out capped
    * by the dictionary), then O(dict²) arithmetic rows. */
  val basketChisq: Q = Q(
    "q_basket_chisq",
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS item
      |  FROM lineitem JOIN part ON p_partkey = l_partkey),
      |t AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM b),
      |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS ni FROM b GROUP BY 1),
      |pc AS (SELECT a.item AS i1, c.item AS i2, CAST(count(*) AS BIGINT) AS nb
      |       FROM b a JOIN b c ON a.ok = c.ok AND a.item < c.item GROUP BY 1, 2)
      |SELECT i1, i2, nb AS n_both, ia.ni AS n_i1, ib.ni AS n_i2,
      |  CAST(nb * t.n - ia.ni * ib.ni AS BIGINT) AS d_num,
      |  round((CAST(t.n AS DOUBLE)
      |      * (CAST(nb * t.n - ia.ni * ib.ni AS DOUBLE)
      |         * CAST(nb * t.n - ia.ni * ib.ni AS DOUBLE)))
      |    / ((CAST(ia.ni AS DOUBLE) * CAST(t.n - ia.ni AS DOUBLE))
      |       * (CAST(ib.ni AS DOUBLE) * CAST(t.n - ib.ni AS DOUBLE))), 6)
      |    AS chi2
      |FROM pc CROSS JOIN t
      |JOIN ic ia ON ia.item = pc.i1 JOIN ic ib ON ib.item = pc.i2
      |WHERE ia.ni < t.n AND ib.ni < t.n
      |ORDER BY i1, i2""".stripMargin
  ) { (s, d) =>
    val (t, ic, pc) = basketCensus(s, d)
    val dNum = col("n_both") * col("n") - col("ni1") * col("ni2")
    pc.crossJoin(broadcast(t.select(col("n_baskets").as("n"))))
      .join(broadcast(ic.select(col("item").as("i1"), col("n_item").as("ni1"))),
        "i1")
      .join(broadcast(ic.select(col("item").as("i2"), col("n_item").as("ni2"))),
        "i2")
      .filter(col("ni1") < col("n") && col("ni2") < col("n"))
      .select(col("i1"), col("i2"), col("n_both"),
        col("ni1").as("n_i1"), col("ni2").as("n_i2"),
        dNum.as("d_num"),
        round((col("n").cast(DoubleType) *
            (dNum.cast(DoubleType) * dNum.cast(DoubleType))) /
          ((col("ni1").cast(DoubleType) *
            (col("n") - col("ni1")).cast(DoubleType)) *
           (col("ni2").cast(DoubleType) *
            (col("n") - col("ni2")).cast(DoubleType))), 6)
          .as("chi2"))
      .orderBy("i1", "i2")
  }

  val all: Seq[Q] = Seq(
    windowLeadLag, windowNtile, windowMoving, cube, groupingSets,
    existsCorrelated, subqueryScalar, stringFuncs, dateFuncs, arrayFuncs,
    conditionalFuncs, topkPerGroup, userPath, rfm, windowDistinct, attribution,
    audienceOverlap, basketRules, basketChisq)
}
