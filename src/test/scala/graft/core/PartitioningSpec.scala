package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The storage-layout half of the 100 TB story: date/key-partitioned
  * sinks so downstream scans (and the per-bucket CDC checksums) touch
  * only relevant partitions. Asserts actual pruning via inputFiles, not
  * just result correctness. */
class PartitioningSpec extends SparkSuite {

  test("partitioned snapshot write + partition-pruned read") {
    val out = tmpDir("part")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").mode("overwrite").parquet(out)

    val day0 = spark.read.parquet(out).filter(col("day") === "2024-01-01")
    // the filter must prune at the scan — exactly one partition directory
    // selected, not all days filtered post-scan (inputFiles is
    // pre-pruning metadata, so inspect the physical scan node)
    val scan = day0.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == 1)
    assert(scan.metadata("PartitionFilters").contains("day"))
    assert(day0.count() ==
      events.filter(col("day") === "2024-01-01").count())
  }

  test("per-bucket checksums over the partition column localize changes") {
    import graft.streaming.CdcPipeline
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
    val base = CdcPipeline.partitionChecksums(events, col("day"))
    // perturb one day's rows only
    val mutated = events.withColumn("value",
      when(col("day") === "2024-01-01", col("value") + 1.0).otherwise(col("value")))
    val after = CdcPipeline.partitionChecksums(mutated, col("day"))
    val changed = CdcPipeline.changedBuckets(base, after).collect()
    assert(changed.length == 1)
    assert(changed.head.getDate(0).toString == "2024-01-01")
  }
}
