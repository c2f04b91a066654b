package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** CLI demo: streaming near-duplicate candidate detection over document
  * drops — the curation-pipeline twin of CdcMain. Documents (doc_id, text)
  * dropped as parquet under <inputDir> stream through map-side MinHash
  * signatures + LSH banding (streaming/NearDup.scala) into the keyed
  * keeper-state detector; candidate pairs land as JSONL under
  * <workDir>/out as they are discovered, across drops — a doc in today's
  * drop pairs with a keeper first seen last week, which is exactly the
  * cross-batch memory a batch dedup job re-derives from scratch each run.
  *
  * Usage: runMain graft.NearDupMain <inputDir> <workDir> [onceParquet]
  *
  * One-shot mode (3rd arg): runs the same pipeline over a single parquet
  * file as a static Dataset (flatMapGroupsWithState in batch mode: one
  * invocation per group with empty state) and writes candidates to
  * <workDir>/once — for smoke tests and backfills.
  */
object NearDupMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: NearDupMain <inputDir> <workDir> [onceParquet]")
    val Array(inputDir, workDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = graft.core.Session.local(cpus, cpus)
    if (args.length >= 3) {
      val docs = spark.read.parquet(args(2)).select("doc_id", "text")
      val out = graft.streaming.NearDup.candidates(docs)
      out.coalesce(1).write.mode("overwrite").json(s"$workDir/once")
      println(s"[neardup] candidates=${spark.read.json(s"$workDir/once").count()}")
    } else {
      // same wait-for-first-drop schema inference as CdcMain
      def inferSchema(dir: String): org.apache.spark.sql.types.StructType = {
        while (true) {
          try return spark.read.parquet(dir).schema
          catch {
            case _: Throwable =>
              println(s"[neardup] waiting for first document drop in $dir ...")
              Thread.sleep(1000L)
          }
        }
        throw new IllegalStateException("unreachable")
      }
      val stream = spark.readStream.schema(inferSchema(inputDir))
        .option("maxFilesPerTrigger", 1).parquet(inputDir)
      val q = graft.streaming.NearDup.candidates(stream.select("doc_id", "text"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$workDir/ckpt")
        .format("json").option("path", s"$workDir/out")
        .trigger(Trigger.ProcessingTime(1000L))
        .start()
      println(s"[neardup] monitoring $inputDir for document drops (Ctrl-C to stop)")
      q.awaitTermination()
    }
    spark.stop()
  }
}
