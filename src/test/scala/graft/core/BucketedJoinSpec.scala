package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Proof of the co-located-join scale story (SURVEY §6): bucketed tables
  * joined on their bucket key need NO shuffle exchange — the scan's hash
  * partitioning satisfies the join's required distribution, so at 100 TB
  * the big-big join moves zero bytes across the wire. The same elision
  * applies to the native as-of exec, whose ClusteredDistribution
  * requirement is deliberately the same contract a shuffled equi-join
  * declares (plans/AsOfJoin.scala requiredChildDistribution).
  */
class BucketedJoinSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed big-big equi-join plans with zero shuffle exchanges") {
    val s = spark
    s.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    s.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")

    val joined = s.table("lineitem_bkt")
      .join(s.table("orders_bkt").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val p = plan(joined)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
    // and it computes the same rows as the shuffled join over raw parquet
    val raw = s.read.parquet(s"$sf/lineitem.parquet")
      .join(s.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == raw.count())
  }

  test("native as-of join elides exchanges over bucketed inputs") {
    val s = spark
    import s.implicits._
    // purchases / signups bucketed by user key under DISTINCT column names
    // (the AsOf API requires disjoint sides)
    val e = Tables.events(s, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id", "ts_us")
      .saveAsTable("purch_bkt")
    e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_event_id"),
        col("user_id").as("s_uid"), col("ts_us").as("signup_ts_us"))
      .write.mode("overwrite").bucketBy(8, "s_uid").sortBy("s_uid", "signup_ts_us")
      .saveAsTable("signup_bkt")

    val asof = graft.plans.AsOf.backward(
      s.table("purch_bkt"), s.table("signup_bkt"),
      "user_id", "ts_us", "s_uid", "signup_ts_us")
    val p = plan(asof)
    assert(p.contains("AsOfJoin ["), p)
    assert(!p.contains("Exchange"),
      s"bucketed as-of must not shuffle either side:\n$p")

    // same answer as the as-of over raw (shuffled) scans
    val rawP = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val rawS = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_event_id"),
        col("user_id").as("s_uid"), col("ts_us").as("signup_ts_us"))
    val raw = graft.plans.AsOf.backward(
      rawP, rawS, "user_id", "ts_us", "s_uid", "signup_ts_us")
    val cols = asof.columns.sorted.map(col).toIndexedSeq
    assert(asof.select(cols: _*).orderBy(cols: _*).collect().toSeq ==
      raw.select(cols: _*).orderBy(cols: _*).collect().toSeq)
  }
}
