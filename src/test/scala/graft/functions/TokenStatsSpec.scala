package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TokenStatsSpec extends SparkSuite {
  import spark.implicits._

  test("kernel matches the explode + groupBy formulation on all four counters") {
    val stop = Seq("the", "and", "of")
    val docs = Seq((1L, "the cat and the hat"), (2L, "one"), (3L, "ünï ünï cödé"))
      .toDF("doc_id", "text")
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("n_uniq"),
        sum(length(col("tok"))).as("len_sum"),
        sum(when(col("tok").isin(stop: _*), 1L).otherwise(0L)).as("n_stop"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val viaKernel = docs
      .select(col("doc_id"), TokenStats.stats(spark, split(col("text"), " "), stop).as("st"))
      .select(col("doc_id"), col("st.n_tok"), col("st.n_uniq"), col("st.len_sum"), col("st.n_stop"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(viaKernel == viaAgg)
  }

  test("q_quality_score and q_lang_id plans have no token-level shuffle") {
    Seq("q_quality_score", "q_lang_id").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("HashAggregate"), s"$name: ${p.take(300)}")
      assert(!p.contains("Generate"), s"$name should not explode")
    }
  }
}
