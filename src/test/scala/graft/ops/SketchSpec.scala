package graft.ops

import graft.SparkSuite

/** Value-level guarantees for the no-oracle (approximate/sampling)
  * operators: HLL estimates land within error bounds of the exact
  * distinct count; seeded sampling is deterministic and in the expected
  * fraction band. */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q_approx_distinct is within 5% of exact distinct counts") {
    val approx = graft.SparkEntry.queries("q_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("q_sample is deterministic for a fixed seed and ~1% of rows") {
    val a = graft.SparkEntry.queries("q_sample")(spark, sf).collect()
    val b = graft.SparkEntry.queries("q_sample")(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(a.length > total / 500 && a.length < total / 20)
  }
}
