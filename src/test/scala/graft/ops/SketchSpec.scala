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

  test("q_approx_quantiles lands within 5% relative of the exact discrete quantiles") {
    import org.apache.spark.sql.functions._
    val approx = graft.SparkEntry.queries("q_approx_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.core.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - e50) <= 0.05 * math.abs(e50) + 1e-9, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= 0.05 * math.abs(e90) + 1e-9, s"$k p90: $a90 vs $e90")
    }
  }

  test("q_heavy_hitters: CMS estimates bound the exact counts (never under, ≤ eps·N over)") {
    import org.apache.spark.sql.functions._
    val row = graft.SparkEntry.queries("q_heavy_hitters")(spark, sf).head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("sketch")))
    val n = row.getLong(1)
    val exact = graft.core.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().orderBy(desc("count"), col("token"))
      .limit(5).collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (tok, cnt) =>
      val est = sketch.estimateCount(tok)
      assert(est >= cnt, s"CMS underestimated $tok: $est < $cnt")
      assert(est <= cnt + (0.001 * n).toLong + 1, s"CMS overestimate too large for $tok")
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
