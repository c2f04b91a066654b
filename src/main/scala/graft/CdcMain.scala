package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.CdcPipeline

/** CLI entry point mirroring the reference daemon (main.go:13-49): monitor
  * a snapshot-drop directory and capture changes as JSONL envelopes.
  *
  * Usage: runMain graft.CdcMain <inputDir> <workDir> <tableName> [runOnceParquet]
  *
  * - Streaming mode (default): watches <inputDir> for new parquet snapshot
  *   drops every second (the reference's poll interval, duckdb_cdc.go:54)
  *   until interrupted — envelopes land in <workDir>/out, checksum history
  *   in <workDir>/meta, checkpoint in <workDir>/ckpt.
  * - One-shot mode (4th arg): processes a single parquet snapshot as one
  *   batch and exits — for smoke tests and backfills.
  */
object CdcMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: CdcMain <inputDir> <workDir> <tableName> [runOnceParquet]")
    val Array(inputDir, workDir, tableName) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = graft.core.Session.local(cpus, cpus)
    val cfg = CdcPipeline.Config(
      inputDir = inputDir, outputDir = s"$workDir/out",
      metadataDir = s"$workDir/meta", checkpointDir = s"$workDir/ckpt",
      tableName = tableName)
    if (args.length >= 4) {
      val batch = spark.read.parquet(args(3))
      val changed = CdcPipeline.processBatch(spark, batch, cfg, captureEmpty = true)
      println(s"[cdc] table=$tableName changed=$changed rows=${batch.count()}")
    } else {
      // Infer the table schema from the first snapshot drop; if the daemon
      // starts before any drop exists (the normal deploy order), wait for
      // one instead of crashing on UNABLE_TO_INFER_SCHEMA.
      def inferSchema(): org.apache.spark.sql.types.StructType = {
        while (true) {
          try return spark.read.parquet(inputDir).schema
          catch {
            case _: Throwable =>
              println(s"[cdc] waiting for first snapshot drop in $inputDir ...")
              Thread.sleep(cfg.triggerMs)
          }
        }
        throw new IllegalStateException("unreachable")
      }
      val q = CdcPipeline.start(spark, cfg, inferSchema())
      println(s"[cdc] monitoring $inputDir for table=$tableName (Ctrl-C to stop)")
      q.awaitTermination()
    }
    spark.stop()
  }
}
