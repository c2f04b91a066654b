package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Session.local(cpus.toInt, cpus.toInt)
    // noop sink: executes the complete plan and materializes every output
    // column (count() would let Catalyst prune projections and sorts —
    // projection-heavy queries would measure as bare scans).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Full untimed warmup pass (JMH-style): the first execution of each
    // operator pays JIT + codegen-class-loading + parquet footer reads
    // that say nothing about throughput — profiled at ~2 s on the
    // alphabetically-first query vs 0.7 s steady-state. The timed pass
    // below then measures steady-state plan execution.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // A failed query records -1 (visible in the JSON) and logs to stderr —
    // a silently-swallowed failure would read as an impossibly fast query.
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        run(fn)
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
