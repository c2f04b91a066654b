package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class StringNgramsSpec extends SparkSuite {
  import spark.implicits._

  test("char_ngrams matches the transform(sequence) HOF formulation") {
    val df = Seq("parquet merge window", "ab", "abc", "", "sévère déjà vu")
      .toDF("s")
    val viaKernel = df.select(col("s"),
      StringNgrams.ngrams(spark, col("s"), 3).as("g")).collect()
    val viaHof = df.select(col("s"), expr(
      "CASE WHEN char_length(s) < 3 THEN array() " +
        "ELSE transform(sequence(1, char_length(s) - 2), i -> substr(s, i, 3)) END")
      .as("g")).collect()
    viaKernel.zip(viaHof).foreach { case (k, h) =>
      assert(k.getSeq[String](1) == h.getSeq[String](1), s"input '${k.getString(0)}'")
    }
  }

  test("short and empty strings yield empty arrays; n=1 yields every char") {
    val out = Seq(("ab", 1), ("", 1)).toDF("s", "junk")
      .select(StringNgrams.ngrams(spark, col("s"), 3).as("g3"),
        StringNgrams.ngrams(spark, col("s"), 1).as("g1"))
      .collect()
    assert(out(0).getSeq[String](0).isEmpty)
    assert(out(0).getSeq[String](1) == Seq("a", "b"))
    assert(out(1).getSeq[String](0).isEmpty && out(1).getSeq[String](1).isEmpty)
  }

  test("multi-byte characters slice by character, not byte (SQL substr semantics)") {
    val out = Seq("déjà").toDF("s")
      .select(StringNgrams.ngrams(spark, col("s"), 2).as("g")).collect()
    assert(out(0).getSeq[String](0) == Seq("dé", "éj", "jà"))
  }

  test("q_char_ngrams plan has no interpreted higher-order function") {
    val df = graft.SparkEntry.queries("q_char_ngrams")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("transform"), "HOF crept back into the hot path")
    assert(p.contains("char_ngrams") || p.contains("stringngrams") ||
      p.toLowerCase.contains("ngram"), p.take(400))
  }
}
