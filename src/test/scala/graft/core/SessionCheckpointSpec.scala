package graft.core

import graft.SparkSuite

/** Session.truncate contract: with spark.graft.checkpointDir set, the
  * iterative fixpoints (connected components, BFS, dedup closure) route
  * lineage truncation through RELIABLE checkpoint()s — identical
  * results, and checkpoint data actually lands under the configured
  * dir (the cluster fault-tolerance option; default stays
  * localCheckpoint for bench parity). */
class SessionCheckpointSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("checkpointed fixpoints equal the localCheckpoint results, on disk") {
    val names = Seq("q_components", "q_reach_hops", "q_dedup_clusters")
    val base = names.map(n =>
      n -> graft.SparkEntry.queries(n)(spark, sf).collect().toSeq).toMap
    val dir = tmpDir("graft-ckpt")
    spark.conf.set(Session.CheckpointDirKey, dir)
    try {
      names.foreach { n =>
        val ck = graft.SparkEntry.queries(n)(spark, sf).collect().toSeq
        assert(ck == base(n), s"$n diverged under reliable-checkpoint mode")
      }
      // the checkpoints really went to the reliable dir, not executor
      // memory: rdd checkpoint part-files exist under dir/<context-uuid>/
      val walked = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val nFiles =
        try walked.filter(p => p.getFileName.toString.startsWith("part-")).count()
        finally walked.close()
      assert(nFiles > 0, "reliable-checkpoint mode must write checkpoint files")
    } finally spark.conf.unset(Session.CheckpointDirKey)
  }

  test("truncate defaults to localCheckpoint when the key is unset") {
    spark.conf.unset(Session.CheckpointDirKey)
    val df = Session.truncate(spark.range(10).toDF("v"))
    assert(df.count() == 10)
    // localCheckpoint plans read from an RDD scan, not a file source
    assert(df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }
}
