package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentHashMap

/** Job/stage census for a named query's SERVE path — the instrument the
  * round-14 verdict asked for on the delta family ("nobody has counted
  * the jobs in these serve paths since the lazy-overlay rework"). The
  * lp-base lesson: an unmaterialized lazy view re-ran its roll 3×
  * inside a join and only a job count made it visible — wall time alone
  * reads as "co-tenant noise".
  *
  * Protocol: run the query once to WARM every ModelCache artifact
  * (train jobs must not pollute the serve census), then reset counters
  * and run it again. The second run's job/stage counts and per-job
  * descriptions are the serve cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobCount q_a q_b …
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Session.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val jobLog = new ConcurrentHashMap[Int, (Long, String)]()
    val jobDur = new ConcurrentHashMap[Int, Long]()
    val counting = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (counting.get) {
          jobs.incrementAndGet()
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobLog.put(j.jobId, (System.nanoTime(), desc.take(120)))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(jobLog.get(j.jobId)).foreach { case (t0, _) =>
          jobDur.put(j.jobId, System.nanoTime() - t0)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (counting.get) stages.incrementAndGet()
    })

    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm pass: trains artifacts, loads codegen classes
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      jobs.set(0); stages.set(0); jobLog.clear(); jobDur.clear()
      counting.set(true)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain before reading the counters
      Thread.sleep(300)
      counting.set(false)
      println(f"$name%-24s serve: ${jobs.get}%3d jobs ${stages.get}%4d stages $sec%7.3f s")
      import scala.jdk.CollectionConverters._
      jobDur.asScala.toSeq.sortBy(_._1).foreach { case (id, ns) =>
        val desc = Option(jobLog.get(id)).map(_._2).getOrElse("")
        println(f"    job $id%4d ${ns / 1e9}%7.3f s  $desc")
      }
    }
    spark.stop()
  }
}
