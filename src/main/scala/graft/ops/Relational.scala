package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Canonical => C, Q, Tables => T}

/** Relational core: scans, filters, grouped aggregation, joins, top-k,
  * windows, set ops, rollup — the engine surface the reference delegates
  * wholesale to DuckDB (SURVEY.md §2C), built as declarative Spark plans so
  * Catalyst/AQE pick the physical strategy.
  *
  * Scale posture, per operator:
  *  - scans: filter + projection push into the parquet reader
  *    (PushedFilters / ReadSchema verified via explain);
  *  - grouped aggs: hash aggregate with map-side partial rows — shuffle
  *    carries one row per (partition × group);
  *  - joins: dimension sides are explicitly broadcast(); the fact side
  *    never shuffles for dim joins. Fact-fact joins (none needed here)
  *    would rely on bucketing/AQE;
  *  - top-k: orderBy+limit plans as TakeOrderedAndProject — per-partition
  *    heaps, no global sort;
  *  - windows: one shuffle on the partition key, sort within partitions.
  */
object Relational {

  /** R1+R8+R9: scan → filter → project, the minimal pushdown showcase. */
  val scanProjectFilter: Q = Q(
    "q_scan_project_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, epoch_us(l_shipdate) AS ship_us
      |FROM lineitem WHERE l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber, l_quantity, ship_us""".stripMargin
  ) { (s, d) =>
    // ORDER BY spans every output column: (l_orderkey, l_linenumber) is
    // NOT unique in the synthetic lineitem, and tie order between engines
    // is arbitrary unless the projection itself is totally ordered.
    T.lineitem(s, d)
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        unix_micros(col("l_shipdate")).as("ship_us"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "ship_us")
  }

  /** R2 (duckdb_cdc.go:146-159): schema probe as rows — no data read at
    * all on the Spark side (metadata-only, like the reference's LIMIT 0).
    * Type names are normalized to DuckDB's spellings for the oracle. */
  val schemaProbe: Q = Q(
    "q_schema_probe",
    """SELECT column_name, column_type
      |FROM (DESCRIBE SELECT * FROM lineitem)
      |ORDER BY column_name""".stripMargin
  ) { (s, d) =>
    val typeName: DataType => String = {
      case LongType      => "BIGINT"
      case IntegerType   => "INTEGER"
      case DoubleType    => "DOUBLE"
      case FloatType     => "FLOAT"
      case StringType    => "VARCHAR"
      case TimestampType => "TIMESTAMP"
      case BooleanType   => "BOOLEAN"
      case dt            => dt.sql
    }
    val rows = T.lineitem(s, d).schema.fields.toSeq
      .map(f => (f.name, typeName(f.dataType)))
    s.createDataFrame(rows).toDF("column_name", "column_type")
      .orderBy("column_name")
  }

  /** TPC-H Q1 shape: grouped aggregation with exact decimal-mediated sums
    * (H3) — partial aggregation makes this a 6-group shuffle regardless of
    * fact size. */
  val groupAgg: Q = Q(
    "q_group_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        C.dsum(col("l_quantity")).as("sum_qty"),
        C.dsum(col("l_extendedprice")).as("sum_base_price"),
        C.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        C.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** 3-way dim join: orders ⋈ customer ⋈ nation ⋈ region, revenue per
    * region. nation/region are broadcast explicitly; customer is small
    * enough that AQE broadcasts it too at bench scale — at 100 TB it would
    * be a shuffled join on c_custkey, which is the right plan there. */
  val join3Way: Q = Q(
    "q_join_3way",
    """SELECT r_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(C.dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name")
  }

  /** Semi + anti join (EXISTS / NOT EXISTS): orders' key side is reduced to
    * a broadcast-able distinct-key stream by the semi-join itself — no
    * payload columns cross the shuffle. */
  val semiAnti: Q = Q(
    "q_semi_anti",
    """SELECT c_custkey, 'HAS_ORDERS' AS status FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'NO_ORDERS' AS status FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    val cust = T.customer(s, d)
    val ord = T.orders(s, d)
    val has = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("HAS_ORDERS").as("status"))
    val not = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("NO_ORDERS").as("status"))
    has.unionAll(not).orderBy("c_custkey")
  }

  /** Generalizes R10 (ORDER BY ... LIMIT 1): top-k plans as
    * TakeOrderedAndProject — k rows per partition, k rows to the driver. */
  val topK: Q = Q(
    "q_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Ranking window: top 3 most recent orders per customer. */
  val windowRank: Q = Q(
    "q_window_rank",
    """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey,
      |  epoch_us(o_orderdate) AS od_us FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
    T.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        unix_micros(col("o_orderdate")).as("od_us"))
      .orderBy("o_custkey", "rn")
  }

  /** Running (cumulative) sum per user over event time. The sum runs over
    * DECIMAL so the cumulative value is exact in both engines regardless of
    * their window-aggregation internals (segment trees vs sequential). */
  val windowRunning: Q = Q(
    "q_window_running",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast(DoubleType).as("running"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** EXCEPT / INTERSECT (distinct set semantics, same as SQL). */
  val setOps: Q = Q(
    "q_set_ops",
    """SELECT 'NEVER_PURCHASED' AS label, user_id FROM (
      |  SELECT user_id FROM events EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT 'SIGNUP_AND_PURCHASE' AS label, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'signup'
      |  INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase')
      |ORDER BY label, user_id""".stripMargin
  ) { (s, d) =>
    val e = T.events(s, d)
    val allUsers = e.select("user_id")
    val purchasers = e.filter(col("event_type") === "purchase").select("user_id")
    val signups = e.filter(col("event_type") === "signup").select("user_id")
    val never = allUsers.except(purchasers)
      .select(lit("NEVER_PURCHASED").as("label"), col("user_id"))
    val both = signups.intersect(purchasers)
      .select(lit("SIGNUP_AND_PURCHASE").as("label"), col("user_id"))
    never.unionAll(both).orderBy("label", "user_id")
  }

  /** EXCEPT ALL / INTERSECT ALL — the multiplicity-preserving (bag
    * semantics) variants: a user appearing 5× on the left and 2× on the
    * right survives EXCEPT ALL 3 times. Rows of equal value are
    * interchangeable, so ORDER BY (label, user_id) is still a total order
    * of the OUTPUT multiset (H6). Spark plans both as aggregate+generate
    * (count per key, replicate the difference) — one shuffle each. */
  val setOpsAll: Q = Q(
    "q_set_ops_all",
    """SELECT label, user_id FROM (
      |  SELECT 'NON_ERROR_MINUS_PURCHASES' AS label, user_id FROM (
      |    SELECT user_id FROM events WHERE event_type != 'error'
      |    EXCEPT ALL
      |    SELECT user_id FROM events WHERE event_type = 'purchase')
      |  UNION ALL
      |  SELECT 'CLICKS_COMMON_WITH_VIEWS' AS label, user_id FROM (
      |    SELECT user_id FROM events WHERE event_type = 'click'
      |    INTERSECT ALL
      |    SELECT user_id FROM events WHERE event_type = 'purchase'))
      |ORDER BY label, user_id""".stripMargin
  ) { (s, d) =>
    val e = T.events(s, d)
    def ofType(cond: org.apache.spark.sql.Column) = e.filter(cond).select("user_id")
    val minus = ofType(col("event_type") =!= "error")
      .exceptAll(ofType(col("event_type") === "purchase"))
      .select(lit("NON_ERROR_MINUS_PURCHASES").as("label"), col("user_id"))
    val common = ofType(col("event_type") === "click")
      .intersectAll(ofType(col("event_type") === "purchase"))
      .select(lit("CLICKS_COMMON_WITH_VIEWS").as("label"), col("user_id"))
    minus.unionAll(common).orderBy("label", "user_id")
  }

  /** ROLLUP over (region, nation) with grouping_id disambiguation — plans
    * as a single Expand + hash aggregate (one pass over the fact). */
  val rollup: Q = Q(
    "q_rollup",
    """SELECT r_name, n_name, GROUPING(r_name, n_name) AS gid,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // DataFrame rollup + later column refs trips Spark's ambiguous-self-join
    // detector (group keys keep input exprIds); the SQL form plans
    // identically (Expand + hash aggregate) without the false positive.
    T.orders(s, d).createOrReplaceTempView("g_orders")
    T.customer(s, d).createOrReplaceTempView("g_customer")
    broadcast(T.nation(s, d)).createOrReplaceTempView("g_nation")
    broadcast(T.region(s, d)).createOrReplaceTempView("g_region")
    s.sql(
      """SELECT r_name, n_name, grouping_id(r_name, n_name) AS gid,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM g_orders
        |JOIN g_customer ON o_custkey = c_custkey
        |JOIN g_nation ON c_nationkey = n_nationkey
        |JOIN g_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
  }

  /** RANGE-frame window: per order, how many orders the same customer
    * placed in the trailing 30 days (inclusive). Range frames matter at
    * scale because the sliding bound is evaluated within the one
    * partition sort — no self-join against a time band. */
  val windowRange: Q = Q(
    "q_window_range",
    """SELECT o_orderkey,
      |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
      |    RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_trailing_30d
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("od_us"))
      .rangeBetween(-2592000000000L, Window.currentRow)
    T.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate")).as("od_us"))
      .select(col("o_orderkey"), count(lit(1)).over(w).as("n_trailing_30d"))
      .orderBy("o_orderkey")
  }

  /** Deterministic per-group column statistics: min/max/avg/stddev from
    * exact decimal sums (S1, S2), so the only float ops are the final
    * sqrt/divisions — identical in both engines (H3). */
  val columnStats: Q = Q(
    "q_column_stats",
    """SELECT l_returnflag,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CASE WHEN count(*) > 1 THEN
      |    sqrt((CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(27,4))) AS DOUBLE)
      |          - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |            * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |         / (count(*) - 1)) END AS std_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val s1 = sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType)
    val s2 = sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(27, 4)))
      .cast(DoubleType)
    val n = count(lit(1))
    T.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (s1 / n).as("avg_qty"),
        // guarded: (n-1) divisor throws under ANSI mode for 1-row groups
        when(n > 1, sqrt((s2 - s1 * s1 / n) / (n - lit(1)))).as("std_qty"),
        n.as("n"))
      .orderBy("l_returnflag")
  }

  /** Exact discrete quantiles: unlike interpolated or approximate
    * percentiles, disc returns actual data values — engine-comparable
    * with no float interpolation hazard. Computed via the bounded-buffer
    * grid path (GridPercentile): Spark's PercentileDisc aggregate buffers
    * every row per group (the 100 TB scale-killer); the grid pre-aggregate
    * keeps state O(distinct values) with map-side partials. The oracle
    * stays the built-in percentile_disc — two different algorithms, same
    * ANSI semantics. */
  val quantiles: Q = Q(
    "q_quantiles",
    """SELECT l_returnflag,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
      |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
      |  percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val li = T.lineitem(s, d)
    // l_quantity has ~50 distinct values: the flat grid compresses 600k
    // rows to ≤50/task map-side — the cheap path. l_extendedprice is ~1
    // distinct per row: bucketed two-phase keeps its state bounded.
    val qty = graft.core.GridPercentile.disc(li, Seq("l_returnflag"),
      "l_quantity", Seq("p50_qty" -> 0.5, "p90_qty" -> 0.9))
    val price = graft.core.GridPercentile.discBucketed(li, Seq("l_returnflag"),
      "l_extendedprice", step = 16.0, "p99_price", 0.99)
    qty.join(price, "l_returnflag")
      .select("l_returnflag", "p50_qty", "p90_qty", "p99_price")
      .orderBy("l_returnflag")
  }

  /** Pivot: events long→wide, one count column per event_type. The value
    * list is explicit, so the plan is a single conditional aggregate (no
    * distinct-values pre-pass) and the output schema is deterministic —
    * exactly what the FILTER-clause oracle produces. */
  val pivot: Q = Q(
    "q_pivot",
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(
    scanProjectFilter, schemaProbe, groupAgg, join3Way, semiAnti,
    topK, windowRank, windowRunning, windowRange, setOps, setOpsAll, rollup,
    columnStats, quantiles, pivot)
}
