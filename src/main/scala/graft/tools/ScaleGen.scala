package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sensitivity harness: writes a K×-replicated copy of a test-data
  * scale factor (default 10× sf0.1 ≈ "sf1") so the bench can measure how
  * each query's runtime grows with data volume — the round-5 evidence
  * that no operator is super-linear (VERDICT round 4, next-step 6).
  *
  * Replication shifts every key column by replica·base, preserving join
  * fan-outs and per-key row counts (each replica is a disjoint,
  * internally-consistent copy). Dimension tables with enumerated domains
  * (region, nation) are copied as-is — exactly how a 10× TPC-H scale-up
  * behaves. Text/embedding payloads repeat verbatim, which makes the
  * dedup family's work GROW (every doc gains 9 exact clones) — the
  * stress direction we want for dedup-at-scale evidence.
  *
  * Each key DOMAIN has ONE shift base, `max(key in the owning table)+1`
  * (partkey from part, custkey from customer, …), shared by every column
  * referencing that domain. Deriving the base per fact-side column would
  * cross-wire FKs whenever coverage is sparse (dim max > fact max — real
  * TPC-H has customers with no orders), silently changing the per-key
  * fan-outs this tool exists to preserve.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> [k]
  */
object ScaleGen {

  /** key domain → (owning table, its key column): the base source. */
  private val domains: Map[String, (String, String)] = Map(
    "custkey"  -> ("customer", "c_custkey"),
    "suppkey"  -> ("supplier", "s_suppkey"),
    "partkey"  -> ("part", "p_partkey"),
    "orderkey" -> ("orders", "o_orderkey"),
    "eventid"  -> ("events", "event_id"),
    "userid"   -> ("events", "user_id"),
    "docid"    -> ("documents", "doc_id"),
    "vecid"    -> ("embeddings", "vec_id"))

  /** shifted columns per table, each mapped to its key domain */
  private val keyCols: Map[String, Seq[(String, String)]] = Map(
    "region"     -> Seq.empty,
    "nation"     -> Seq.empty,
    "customer"   -> Seq("c_custkey" -> "custkey"),
    "supplier"   -> Seq("s_suppkey" -> "suppkey"),
    "part"       -> Seq("p_partkey" -> "partkey"),
    "orders"     -> Seq("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
    "lineitem"   -> Seq("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
                        "l_suppkey" -> "suppkey"),
    "events"     -> Seq("event_id" -> "eventid", "user_id" -> "userid"),
    "documents"  -> Seq("doc_id" -> "docid"),
    "embeddings" -> Seq("vec_id" -> "vecid"))

  /** max(key)+1 from the owning table; an empty (or all-NULL) owner yields
    * base 1, so replication of the referencing tables still terminates
    * instead of NPE-ing on a null max. */
  private def domainBase(spark: SparkSession, src: String,
      domain: String): Long = {
    val (table, keyCol) = domains(domain)
    val r = graft.core.Tables.table(spark, src, table).agg(max(col(keyCol))).head()
    if (r.isNullAt(0)) 1L else r.getLong(0) + 1L
  }

  /** K replicas of `df`, each key column shifted by replica·(its domain's
    * base) — replica 0 equals the original, replicas occupy disjoint key
    * ranges, and FK columns shift by the SAME base as the PK they point
    * at, so every replica's joins land inside that replica. */
  def replicate(spark: SparkSession, df: DataFrame,
      keys: Seq[(String, String)], bases: Map[String, Long], k: Int): DataFrame = {
    if (keys.isEmpty || k <= 1) return df
    val reps = spark.range(k.toLong).toDF("__rep")
    val shifted = keys.foldLeft(df.crossJoin(broadcast(reps))) {
      case (acc, (c, domain)) =>
        acc.withColumn(c, col(c) + col("__rep") * bases(domain))
    }
    shifted.drop("__rep")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcSfDir> <outDir> [k]")
    val (src, out) = (args(0), args(1))
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Session.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val bases = domains.keys.map(dm => dm -> domainBase(spark, src, dm)).toMap
    graft.core.Tables.all.foreach { t =>
      val df = graft.core.Tables.table(spark, src, t)
      val scaled = replicate(spark, df, keyCols(t), bases, k)
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t: ${df.count()} -> ${scaled.count()} rows")
    }
    spark.stop()
  }
}
