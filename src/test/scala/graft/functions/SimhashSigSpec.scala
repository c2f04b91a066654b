package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SimhashSigSpec extends SparkSuite {
  import spark.implicits._

  test("kernel matches the exploded 32-column majority-vote aggregation") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "one"), (3L, "ünïcode tökens here"))
      .toDF("doc_id", "text")
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
    val bitAggs = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1)).as(s"s$j"))
    val assembled = (0 until 32)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val viaAgg = toks.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), assembled.cast("long").as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaKernel = docs
      .select(col("doc_id"), SimhashSig.sig(spark, split(col("text"), " ")).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaKernel == viaAgg)
  }

  test("q_dedup_simhash plan is a pure map-side projection plus sort") {
    val df = graft.SparkEntry.queries("q_dedup_simhash")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("simhashsig"), p.take(400))
    assert(!p.contains("HashAggregate"), "the 32-way bit aggregate should be gone")
  }
}
