package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (repo:TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. At 100 TB these
  * would be partitioned directories; `spark.read.parquet` handles both —
  * nothing here assumes single-file inputs. Column pruning and predicate
  * pushdown happen automatically because every operator builds a
  * declarative plan on top of these scans (verified via
  * `.explain("formatted")`: `PushedFilters`/`ReadSchema` show up).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Reads require two session configs (ns-timestamps as long, no NTZ
    * inference — see Session.tune). Set them defensively here too so the
    * operators work under any caller-provided session, not only ones
    * built through graft.core.Session. Both are dynamic SQL confs. */
  private def ensureConfs(spark: SparkSession): Unit = {
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    } catch { case _: Throwable => () }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    ensureConfs(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** events.ts is nanosecond-precision parquet, which Spark only reads as
    * LongType (spark.sql.legacy.parquet.nanosAsLong — set in Session).
    * Normalize to TimestampType here (integer `div`, no double round-trip:
    * epoch-nanos exceed 2^53). Sub-microsecond parts are zero in the data,
    * so this is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Incremental read of events with `ts > cutoff`: the bound is applied
    * to the RAW column before the ns→timestamp conversion, because a
    * predicate on the derived column cannot reach the parquet scan
    * (PlanShapeSpec guards this — it is the difference between O(new
    * data) and O(table) per poll at scale). */
  def eventsSince(s: SparkSession, d: String, cutoffMicros: Long): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.filter(col("ts") > cutoffMicros * 1000L)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      raw.filter(col("ts") > timestamp_micros(lit(cutoffMicros)))
  }
  /** Complement of [[eventsSince]]: events with `ts <= cutoff`, the
    * already-processed prefix. Same raw-column pushdown rule. */
  def eventsUntil(s: SparkSession, d: String, cutoffMicros: Long): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.filter(col("ts") <= cutoffMicros * 1000L)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      raw.filter(col("ts") <= timestamp_micros(lit(cutoffMicros)))
  }

  /** (event_id, user_id, ts_us) for events with lo ≤ event_id < hi — the
    * id-slice reader the temporal delta family uses (ids are assigned
    * monotonically at ingest, the same contract as the doc-id slices).
    * The id predicate is on a stored column, so it reaches the parquet
    * scan regardless of the ts normalization. */
  def eventsRawSlice(s: SparkSession, d: String, lo: Long, hi: Long): DataFrame =
    events(s, d)
      .filter(col("event_id") >= lo && col("event_id") < hi)
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"))

  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
