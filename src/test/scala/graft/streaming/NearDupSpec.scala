package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

class NearDupSpec extends SparkSuite {
  import spark.implicits._

  test("map-side band computation matches the batch minhash operator's buckets") {
    val sf = "/root/testdata/sf0.001"
    // batch operator output: (band, bucket, n, keeper) per LSH bucket
    val batch = graft.ops.Dedup.dedupMinhash.fn(spark, sf)
      .select(concat(col("band").cast("string"), lit(":"), col("bucket")).as("bucket"),
        col("n"), col("keeper"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // streaming-side band computation, aggregated the same way
    val stream = NearDup.bands(
      graft.core.Tables.documents(spark, sf).select("doc_id", "text"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch)
  }

  test("duplicate text arriving later pairs with the original across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = NearDup.candidates(docs)
      .writeStream.format("memory").queryName("nd")
      .outputMode(OutputMode.Append).start()
    in.addData((1L, "alpha beta gamma delta"), (2L, "totally different words here"))
    q.processAllAvailable()
    in.addData((3L, "alpha beta gamma delta"))   // exact dup of doc 1
    q.processAllAvailable()
    val rows = spark.table("nd").as[Stateful.DupCandidate].collect()
    q.stop()
    // doc 3 collides with doc 1 in ALL bands (identical signature)
    val pairs = rows.map(r => (r.doc_id, r.keeper)).distinct
    assert(pairs.toSeq == Seq((3L, 1L)))
    assert(rows.length == 4)   // one candidate per band
  }
}
