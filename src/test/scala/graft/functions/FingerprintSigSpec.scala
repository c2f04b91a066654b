package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.{Canonical => C}

class FingerprintSigSpec extends SparkSuite {
  import spark.implicits._

  test("kernel matches the posexplode + groupBy-sum formulation") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "one"),
      (3L, "répète ünïcode tökens"), (4L, "")).toDF("doc_id", "text")
    val viaAgg = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .groupBy("doc_id")
      .agg(sum(((col("pos") + 1) * C.md5LongHex(col("tok"), 10)) % C.DigestMod)
        .as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaKernel = docs
      .select(col("doc_id"), FingerprintSig.sig(spark, split(col("text"), " ")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaKernel == viaAgg)
  }

  test("order sensitivity survives (reordered tokens fingerprint differently)") {
    val out = Seq("a b c", "c b a").toDF("text")
      .select(FingerprintSig.sig(spark, split(col("text"), " ")).as("fp"))
      .collect().map(_.getLong(0))
    assert(out(0) != out(1))
  }

  test("q_fingerprint plan has no token-level aggregate") {
    val df = graft.SparkEntry.queries("q_fingerprint")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("fingerprintsig"), p.take(400))
    assert(!p.contains("HashAggregate"))
  }
}
