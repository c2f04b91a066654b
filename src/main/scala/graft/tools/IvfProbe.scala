package graft.tools

/** Stage-level timing probe for the IVF cold build (round-16 verdict
  * ask #5: the cold path pays codesOf + Lloyd + full assign + probe as
  * separate eager jobs; before fusing anything, measure which stage the
  * 9.6–11.8 s model_train actually goes to). Hooks the real path via
  * Similarity.ivfStageHook — measures what runs, not a replica. Two
  * passes: pass 1 includes JIT/codegen warmup, pass 2 is the steady
  * state a long-lived session sees.
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.IvfProbe
  * A/B the index-pass forms (round-17 verdict #3):
  *      SPARK_GRAFT_SF_DIR=<10x/30x dir> runMain graft.tools.IvfProbe ab
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Session.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("ab")) {
      graft.ops.Similarity.indexPassAB(spark, sfDir).foreach {
        case (form, pass, sec, bytes) =>
          println(f"[ivfprobe-ab] $sfDir pass$pass $form%-17s $sec%8.3f s " +
            f"pinned=${bytes / 1048576.0}%8.1f MiB")
      }
      spark.stop()
      return
    }
    // diagnosis knob: IVF_PROBE_NO_WSC=1 disables whole-stage codegen so
    // compile-vs-data cost separates in the stage timings
    if (sys.env.get("IVF_PROBE_NO_WSC").contains("1"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    graft.ops.Similarity.ivfStageHook =
      (n, ns) => println(f"[ivfprobe]   $n%-22s ${ns / 1e9}%8.3f s")
    (1 to 2).foreach { pass =>
      graft.core.ModelCache.clear()
      println(s"[ivfprobe] ---- pass $pass (${if (pass == 1) "cold JIT/codegen" else "warm JVM"}) ----")
      val t0 = System.nanoTime()
      graft.ops.Similarity.trainedParts(spark, sfDir)
      println(f"[ivfprobe]   total                  ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    graft.ops.Similarity.ivfStageHook = (_, _) => ()
    spark.stop()
  }
}
