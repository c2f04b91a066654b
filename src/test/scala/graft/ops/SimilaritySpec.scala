package graft.ops

import graft.SparkSuite

/** Quality + determinism guarantees for the trained-IVF path
  * (Similarity.similarityIvf): Lloyd's k-means over the int8 codes must
  * genuinely train (improve the k-means objective vs the round-4
  * lowest-vec_id stand-in) and must be run-to-run deterministic — the
  * property the cross-engine oracle replay depends on. */
class SimilaritySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("trained k-means centroids improve mean intra-cell cosine vs the vec_id<16 stand-in") {
    val trained = Similarity.trainedAssignment(spark, sf)._1
    val standin = Similarity.standinAssignment(spark, sf)
    val qTrained = Similarity.intraCellCosine(spark, sf, trained)
    val qStandin = Similarity.intraCellCosine(spark, sf, standin)
    assert(qTrained > qStandin,
      s"training must improve the k-means objective: trained=$qTrained standin=$qStandin")
  }

  test("trained assignment is run-to-run deterministic (exact-integer Lloyd rounds)") {
    def snap() = Similarity.trainedAssignment(spark, sf)._1
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap() == snap())
  }

  test("every probe query returns top-3 candidates from its own cell only") {
    val (assign, probe) = Similarity.trainedAssignment(spark, sf)
    val cells = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = probe.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, cand) = (r.getLong(0), r.getLong(2))
      assert(cells(qid) == cells(cand), s"candidate $cand outside query $qid's cell")
    }
  }
}
