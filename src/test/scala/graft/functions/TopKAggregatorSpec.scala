package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The bounded-heap top-k aggregator must produce exactly the
  * window-function formulation's result on the real similarity workload. */
class TopKAggregatorSpec extends SparkSuite {
  import spark.implicits._

  test("TopKAggregator equals row_number window top-5 on real cosine scores") {
    val sf = "/root/testdata/sf0.001"
    // reuse the declared query's scored pairs before ranking
    val scored = graft.SparkEntry.queries("q_similarity_topk")(spark, sf)
    // window formulation result: (qid, vec_id) pairs per rank
    val windowed = scored.select($"qid", $"rn", $"vec_id", $"score")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap

    // aggregator formulation over the same (qid, vec_id, score) stream
    val raw = scored.select($"qid", $"vec_id", $"score")
      .as[(Long, Long, Double)]
    val agg = new TopKAggregator(5).toColumn
    val viaAgg = raw.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .collect().toMap

    assert(viaAgg.keySet == windowed.keySet)
    viaAgg.foreach { case (qid, topk) =>
      assert(topk == windowed(qid), s"qid=$qid")
    }
  }

  test("bounded buffer: reduce never holds more than k entries") {
    val a = new TopKAggregator(3)
    val buf = (1 to 100).foldLeft(a.zero)((b, i) => a.reduce(b, (i.toLong, i / 10.0)))
    assert(buf.size == 3)
    assert(buf.map(_._1) == Seq(100L, 99L, 98L))
  }
}
