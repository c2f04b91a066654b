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

  def local(cores: Int, shufflePartitions: Int): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
