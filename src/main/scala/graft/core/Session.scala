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
    truncate(df, eager = true)

  /** `eager = false` variant for the probed-fixpoint shape ONLY (round-18
    * optimization, guide §1.2/§2.4): every round does
    * `lab = truncate(step); probe(lab)` — the convergence probe is the
    * sole consumer at materialization time, so a lazy checkpoint folds
    * the dedicated materialization job into the probe job (one driver
    * round trip per round instead of two) while the probe still pins the
    * data before the next round's multi-consumer reads hit the cache.
    * Do NOT use lazy for a checkpoint whose FIRST action has several
    * branches reading it (e.g. a self-join directly on the fresh frame):
    * concurrent stages would each compute the unpersisted RDD — the
    * duplicated work eager materialization exists to prevent. */
  def truncate(df: org.apache.spark.sql.DataFrame, eager: Boolean)
      : org.apache.spark.sql.DataFrame =
    df.sparkSession.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** Flatten an incrementally-grown union once its analyzed plan carries
    * more than `maxLegs` union branches (round-12 advice: refresh
    * closures store base ∪ delta WITHOUT materializing — the delta legs
    * are checkpointed but the union node stack grows one per generation,
    * so a long-lived session refreshing every few minutes accretes an
    * unbounded plan). Below the threshold the frame passes through
    * untouched (refresh stays delta-cost); crossing it pays ONE
    * truncate — O(artifact) every maxLegs generations, amortizing to a
    * fraction of a generation's delta cost while pinning plan depth.
    * Leg counting is a driver-side walk of the analyzed plan — no job. */
  def flattenWide(df: org.apache.spark.sql.DataFrame, maxLegs: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    val legs = df.queryExecution.analyzed.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u.children.size
    }.sum
    if (legs > maxLegs) truncate(df) else df
  }

  def local(cores: Int, shufflePartitions: Int): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Opt into RELIABLE fixpoint checkpointing for a whole Verify/Bench
    // run (round-12 verdict #4: prove the full gate, not just the unit
    // spec, under the cluster-fault-tolerant mode):
    //   SPARK_GRAFT_CHECKPOINT_DIR=/tmp/ckpt runMain graft.Verify ...
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
      .foreach(d => s.conf.set(CheckpointDirKey, d))
    s
  }
}
