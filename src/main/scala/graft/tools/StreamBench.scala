package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming throughput baseline (round-14 verdict #5): the north star
  * leads with "CDC via Structured Streaming", but BASELINE.md carried
  * zero streaming perf rows — every pipeline was parity-spec'd, none
  * was RATED. Two measurements, each a JSON line:
  *
  *  1. s_poll_pipeline END-TO-END: K pre-staged snapshot drops of the
  *     sf table (one file per drop, atomically moved in), processed
  *     drop→checksum→envelope→JSONL by CdcPipeline.start with
  *     maxFilesPerTrigger=1. rows/s = captured rows / (first-batch
  *     start → last-batch commit); per-batch p50/p99 come from each
  *     progress's triggerExecution duration (data batches only). The
  *     trigger is 50 ms so the measurement rates the PIPELINE, not the
  *     reference's 1 s poll floor (which would dominate by design).
  *
  *  2. s_stream_dedup admission gate: the same drops streamed through
  *     dropDuplicatesWithinWatermark on event_id (Stateful
  *     .dedupedStream) into a noop-equivalent memory count — the
  *     watermark-bounded keyed-state shuffle is the cost.
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StreamBench [K]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val drops = if (args.nonEmpty) args(0).toInt else 10
    val spark = graft.core.Session.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft-streambench").toString

    def fmt(v: Double): String =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0
      else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))

    // ---- stage K distinct customer drops (one part-file each) ----------
    val src = spark.read.parquet(s"$sfDir/customer.parquet")
    val nRows = src.count()
    val inDir = s"$work/in"; Files.createDirectories(Paths.get(inDir))
    (0 until drops).foreach { i =>
      val stage = s"$work/stage$i"
      // vary one column per drop so every drop's checksum CHANGES and
      // the capture path (not the no-change fast path) is what's rated
      src.withColumn("c_acctbal", col("c_acctbal") + i)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(s"$inDir/drop_$i.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }

    // ---- 1. s_poll_pipeline end-to-end ---------------------------------
    val cfg = graft.streaming.CdcPipeline.Config(
      inputDir = inDir, outputDir = s"$work/out",
      metadataDir = s"$work/meta", checkpointDir = s"$work/ckpt",
      tableName = "customer", triggerMs = 50L)
    // recentProgress is a bounded ring (default 100) — at a 50 ms trigger
    // the empty ticks would evict the data batches, so accumulate by
    // batchId in the poll loop instead of reading the ring once
    val prog = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    val t0 = System.nanoTime()
    val q = graft.streaming.CdcPipeline.start(spark, cfg, src.schema)
    val deadline = System.nanoTime() + 600L * 1000 * 1000 * 1000
    def harvest(query: org.apache.spark.sql.streaming.StreamingQuery,
        into: scala.collection.mutable.Map[Long, (Long, Double)]): Unit =
      query.recentProgress.filter(_.numInputRows > 0).foreach { pr =>
        into(pr.batchId) =
          (pr.numInputRows, pr.durationMs.get("triggerExecution").toDouble)
      }
    // exit on BATCH COUNT, not numInputRows: foreachBatch runs several
    // actions per batch (emptiness probe, checksum agg, envelope write),
    // and the file source's numInputRows counts each action's re-scan —
    // measured 2x inflation, which made a row-sum condition exit after
    // half the drops. One drop per batch is pinned by maxFilesPerTrigger.
    while ({ harvest(q, prog); prog.size < drops } &&
      System.nanoTime() < deadline) Thread.sleep(100)
    // the deadline must FAIL loudly, not fall through to stats over a
    // partial harvest (round-15 advice: lat.max on an empty seq throws
    // an unrelated error; a part-harvest prints rates as if complete)
    require(prog.size == drops,
      s"timed out: harvested ${prog.size}/$drops batches before the deadline")
    val sec = (System.nanoTime() - t0) / 1e9
    val lat = prog.values.map(_._2).toSeq
    q.stop()
    val captured = spark.read.json(s"$work/out").count()
    require(captured == nRows * drops,
      s"end-to-end loss: captured $captured of ${nRows * drops}")
    println(s"""{"metric":"s_poll_pipeline","drops":$drops,"rows_per_drop":$nRows,"rows_captured":$captured,"wall_sec":${fmt(sec)},"rows_per_sec":${fmt(captured / sec)},"batch_ms_p50":${fmt(pct(lat, 0.5))},"batch_ms_p99":${fmt(pct(lat, 0.99))},"batch_ms_max":${fmt(lat.max)},"sf":"$sfDir"}""")

    // ---- 2. s_stream_dedup admission gate over the same drops ----------
    // events-shaped input: give each customer row an event_id/ts; every
    // drop repeats the same ids, so the gate admits drop 0 and rejects
    // the K-1 duplicate waves — the worst case for the keyed-state store
    val dedupIn = s"$work/dedup_in"; Files.createDirectories(Paths.get(dedupIn))
    (0 until drops).foreach { i =>
      val stage = s"$work/dstage$i"
      src.select(col("c_custkey").as("event_id"),
          lit(new java.sql.Timestamp(1700000000000L)).as("ts"),
          col("c_name").as("payload"))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(s"$dedupIn/drop_$i.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val dSchema = spark.read.parquet(s"$dedupIn/drop_0.parquet").schema
    val admitted = new java.util.concurrent.atomic.AtomicLong(0)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val t1 = System.nanoTime()
    val dq = graft.streaming.Stateful.dedupedStream(
        spark.readStream.schema(dSchema).option("maxFilesPerTrigger", 1)
          .parquet(dedupIn))
      .writeStream.option("checkpointLocation", s"$work/dckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        admitted.addAndGet(b.count()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .start()
    val dProg = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    val dDeadline = System.nanoTime() + 600L * 1000 * 1000 * 1000
    while ({ harvest(dq, dProg); dProg.size < drops } &&
      System.nanoTime() < dDeadline) Thread.sleep(100)
    require(dProg.size == drops,
      s"timed out: harvested ${dProg.size}/$drops dedup batches before the deadline")
    val dSec = (System.nanoTime() - t1) / 1e9
    val dLat = dProg.values.map(_._2).toSeq
    dq.stop()
    seen.set(nRows * drops)
    require(admitted.get() == nRows,
      s"gate must admit exactly one wave: admitted ${admitted.get()} of $nRows")
    println(s"""{"metric":"s_stream_dedup","drops":$drops,"rows_in":${seen.get()},"rows_admitted":${admitted.get()},"wall_sec":${fmt(dSec)},"rows_per_sec":${fmt(seen.get() / dSec)},"batch_ms_p50":${fmt(pct(dLat, 0.5))},"batch_ms_p99":${fmt(pct(dLat, 0.99))},"batch_ms_max":${fmt(dLat.max)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
