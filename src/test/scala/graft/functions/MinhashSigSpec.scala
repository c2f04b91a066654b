package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MinhashSigSpec extends SparkSuite {
  import spark.implicits._

  private val K = 8

  test("kernel matches the md5/conv SQL formulation hash-for-hash") {
    val docs = Seq("alpha beta gamma", "one", "répète répète accenté", "x y x y x")
      .toDF("text")
    def hofH(i: Int) =
      expr(s"""array_min(transform(split(text, ' '),
              |  t -> conv(substr(md5(t), 1, 12), 16, 10) +
              |       $i * conv(substr(md5(t), 13, 12), 16, 10)))""".stripMargin)
        .cast("long")
    val viaHof = docs.select(array((0 until K).map(hofH): _*).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val viaKernel = docs.select(
      MinhashSig.sig(spark, split(col("text"), " "), K).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(viaKernel.toSeq == viaHof.toSeq)
  }

  test("q_dedup_minhash plan is shuffle-free before the band census") {
    val df = graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString()
    // exactly two exchanges: the (band,bucket) census and the final sort
    // (round 1 had three: a token-level signature aggregate came first)
    assert("Exchange".r.findAllIn(p).size == 2, p.take(600))
    assert(p.contains("minhashsig"), "kernel should compute the signature map-side")
    assert("HashAggregate".r.findAllIn(p).size == 2, "only the census aggregate remains")
  }

  test("empty text degrades like the SQL form (one empty token, valid signature)") {
    val viaKernel = Seq("").toDF("text")
      .select(MinhashSig.sig(spark, split(col("text"), " "), K)).collect()
    val sig = viaKernel(0).getSeq[Long](0)
    assert(sig.length == K && sig.forall(_ >= 0L))
  }
}
