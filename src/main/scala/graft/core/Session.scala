package graft.core

import org.apache.spark.sql.SparkSession

/** One place for engine-level session settings so Verify, Bench, and the
  * test suites run identical configurations. */
object Session {
  /** Apply graft's required configs to a builder:
    *  - UTC session TZ (oracle parity, H5);
    *  - parquet ns-timestamps surface as LongType (events.ts; Spark 4
    *    refuses TIMESTAMP(NANOS) otherwise) — Tables.events normalizes;
    *  - ms/us parquet timestamps read as TIMESTAMP (LTZ), not NTZ, so
    *    epoch functions apply directly;
    *  - AQE on (runtime join re-planning + skew splitting — the local
    *    stand-in for what a real cluster would need at 100 TB).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")

  /** Config key: when set (non-empty), iterative fixpoints truncate
    * lineage with RELIABLE `checkpoint()`s under this directory instead
    * of `localCheckpoint()`. localCheckpoint blocks live in executor
    * memory/disk and die with the executor — fine at local[32], but on a
    * 1000-executor cluster a 30-round BFS losing one executor in round
    * 29 restarts from scratch. A reliable checkpoint survives executor
    * loss at the cost of a distributed-FS write per round. Default
    * (unset) stays local for bench parity; results are identical either
    * way (SessionCheckpointSpec pins it). Checkpoint data accumulates
    * under the dir unless spark.cleaner.referenceTracking.cleanCheckpoints
    * is enabled — point it at job-scoped scratch space. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  /** Truncate a fixpoint iteration's lineage — reliable `checkpoint()`
    * when [[CheckpointDirKey]] is set, `localCheckpoint()` otherwise.
    * The SparkContext checkpoint dir is installed on first use (Spark
    * appends a per-context UUID subdir, so repeated setCheckpointDir
    * calls would leak empty dirs). */
  def truncate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.sparkSession.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  def local(cores: Int, shufflePartitions: Int): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
