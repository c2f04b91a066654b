package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.CdcPipeline

/** CLI entry point mirroring the reference daemon (main.go:13-49): monitor
  * snapshot-drop directories and capture changes as JSONL envelopes.
  *
  * Usage: runMain graft.CdcMain <inputDir> <workDir> <tables> [runOnceParquet]
  *
  * - Streaming mode (default): <tables> is a comma-separated list, like
  *   the reference's monitored-tables list (main.go:41). One table watches
  *   <inputDir> directly (backward-compatible); multiple tables each watch
  *   <inputDir>/<table> with per-table out/meta/ckpt dirs — one streaming
  *   query per table (CdcPipeline.startAll, R22): per-table failure
  *   isolation instead of the reference's sequential single-thread loop.
  *   New drops are discovered every second (the reference's poll interval,
  *   duckdb_cdc.go:54) until interrupted.
  * - One-shot mode (4th arg, single table): processes one parquet snapshot
  *   as one batch and exits — for smoke tests and backfills.
  */
object CdcMain {

  /** Graceful shutdown (R23): the reference traps SIGINT/SIGTERM, cancels
    * the poll loop and closes both DBs (main.go:30-38,47-48;
    * duckdb_cdc.go:296-301). JVM equivalent: stop every active streaming
    * query, then the session. Checkpoints already make a hard kill SAFE
    * (restart resumes without re-capture — CdcPipelineSpec); the hook
    * upgrades the common case from "safe crash" to "clean exit": streams
    * finish their in-flight micro-batch and commit instead of dying
    * mid-batch and replaying it on restart. */
  private[graft] def shutdown(spark: SparkSession, stopSession: Boolean): Unit = {
    spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Throwable => () }
    }
    if (stopSession) {
      try spark.stop() catch { case _: Throwable => () }
    }
  }

  /** Registers the Ctrl-C/SIGTERM hook; returns the thread so tests (or a
    * caller embedding the daemon) can deregister it. */
  private[graft] def installShutdownHook(spark: SparkSession): Thread = {
    val t = new Thread(() => shutdown(spark, stopSession = true),
      "graft-cdc-shutdown")
    Runtime.getRuntime.addShutdownHook(t)
    t
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: CdcMain <inputDir> <workDir> <tables> [runOnceParquet]")
    val Array(inputDir, workDir, tableArg) = args.take(3)
    val tables = tableArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = graft.core.Session.local(cpus, cpus)
    // GRAFT_CDC_MODE=diff + GRAFT_CDC_KEYS=<k1,k2> switch every monitored
    // table from full SNAPSHOT re-capture to row-level I/U/D envelopes
    // (CdcPipeline diff mode; the keys name each table's natural key).
    val mode = sys.env.getOrElse("GRAFT_CDC_MODE", "snapshot")
    val keys = sys.env.get("GRAFT_CDC_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(mode != "diff" || keys.nonEmpty,
      "GRAFT_CDC_MODE=diff requires GRAFT_CDC_KEYS")
    def cfgFor(table: String, in: String, sub: String) = CdcPipeline.Config(
      inputDir = in, outputDir = s"$workDir/$sub/out",
      metadataDir = s"$workDir/$sub/meta", checkpointDir = s"$workDir/$sub/ckpt",
      tableName = table, mode = mode, keyCols = keys)
    // Infer a table's schema from its first snapshot drop; if the daemon
    // starts before any drop exists (the normal deploy order), wait for
    // one instead of crashing on UNABLE_TO_INFER_SCHEMA.
    def inferSchema(dir: String): org.apache.spark.sql.types.StructType = {
      while (true) {
        try return spark.read.parquet(dir).schema
        catch {
          case _: Throwable =>
            println(s"[cdc] waiting for first snapshot drop in $dir ...")
            Thread.sleep(1000L)
        }
      }
      throw new IllegalStateException("unreachable")
    }
    if (args.length >= 4) {
      require(tables.size == 1, "one-shot mode takes a single table")
      val cfg = cfgFor(tables.head, inputDir, ".")
      val batch = spark.read.parquet(args(3))
      val changed = CdcPipeline.processBatch(spark, batch, cfg, captureEmpty = true)
      println(s"[cdc] table=${tables.head} changed=$changed rows=${batch.count()}")
    } else if (tables.size == 1) {
      val cfg = cfgFor(tables.head, inputDir, ".")
      val q = CdcPipeline.start(spark, cfg, inferSchema(inputDir))
      installShutdownHook(spark)
      println(s"[cdc] monitoring $inputDir for table=${tables.head} (Ctrl-C to stop)")
      q.awaitTermination()
    } else if (sys.env.get("GRAFT_CDC_CONSISTENT").contains("1")) {
      // Consistent-tick mode: ONE poll loop lists every table per tick and
      // stamps all captures with a shared snapshot epoch — the reference's
      // single-per-tick-copy semantics (duckdb_cdc.go:100-120). Trades the
      // per-table failure isolation of startAll for cross-table joinable
      // captures.
      val cfgs = tables.map(t => cfgFor(t, s"$inputDir/$t", t))
      CdcPipeline.startConsistent(spark, cfgs, s"$workDir/ckpt-consistent")
      installShutdownHook(spark)
      println(s"[cdc] consistent-tick monitoring of ${tables.size} tables " +
        s"under $inputDir (Ctrl-C to stop)")
      spark.streams.awaitAnyTermination()
    } else {
      val plans = tables.map { t =>
        val in = s"$inputDir/$t"
        (cfgFor(t, in, t), inferSchema(in))
      }
      CdcPipeline.startAll(spark, plans)
      installShutdownHook(spark)
      println(s"[cdc] monitoring ${tables.size} tables under $inputDir (Ctrl-C to stop)")
      spark.streams.awaitAnyTermination()
    }
    spark.stop()
  }
}
