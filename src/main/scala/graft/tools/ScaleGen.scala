package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sensitivity harness: writes a K×-replicated copy of a test-data
  * scale factor (default 10× sf0.1 ≈ "sf1") so the bench can measure how
  * each query's runtime grows with data volume — the round-5 evidence
  * that no operator is super-linear (VERDICT round 4, next-step 6).
  *
  * Replication shifts every key column by replica·(max+1), preserving
  * join fan-outs and per-key row counts (each replica is a disjoint,
  * internally-consistent copy). Dimension tables with enumerated domains
  * (region, nation) are copied as-is — exactly how a 10× TPC-H scale-up
  * behaves. Text/embedding payloads repeat verbatim, which makes the
  * dedup family's work GROW (every doc gains 9 exact clones) — the
  * stress direction we want for dedup-at-scale evidence.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> [k]
  */
object ScaleGen {

  /** key columns shifted per replica, per table */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region"     -> Seq.empty,
    "nation"     -> Seq.empty,
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Shift bases come from the SOURCE table (max+1 per key), so replicas
    * occupy disjoint key ranges while replica 0 equals the original. */
  def replicate(spark: SparkSession, df: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    if (keys.isEmpty || k <= 1) return df
    val bases: Map[String, Long] = keys.map { c =>
      c -> (df.agg(max(col(c))).head().getLong(0) + 1L)
    }.toMap
    val reps = spark.range(k.toLong).toDF("__rep")
    val shifted = keys.foldLeft(df.crossJoin(broadcast(reps))) { (acc, c) =>
      acc.withColumn(c, col(c) + col("__rep") * bases(c))
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
    graft.core.Tables.all.foreach { t =>
      val df = graft.core.Tables.table(spark, src, t)
      val scaled = replicate(spark, df, keyCols(t), k)
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t: ${df.count()} -> ${scaled.count()} rows")
    }
    spark.stop()
  }
}
