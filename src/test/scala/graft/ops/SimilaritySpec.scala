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

  test("q_ann_recall is a valid recall and multi-probe never loses to single-probe") {
    val rows = graft.SparkEntry.queries("q_ann_recall")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(16L, 17L, 18L, 19L, 20L))
    rows.foreach { r =>
      val (h1, r1, h4, r4) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(h1 >= 0 && h1 <= 3 && h4 >= 0 && h4 <= 3)
      assert(r1 == h1 / 3.0 && r4 == h4 / 3.0)
      // nprobe=4 candidates are a superset of the own-cell candidates (a
      // query's own cell is its rank-1 cell), so recall cannot drop
      assert(h4 >= h1, s"multi-probe lost recall: qid=${r.getLong(0)} h1=$h1 h4=$h4")
    }
    assert(rows.map(_.getLong(3)).sum > rows.map(_.getLong(1)).sum,
      "nprobe=4 should strictly improve total recall on this corpus")
  }

  test("q_semdedup verdicts are internally consistent (keeper below, same cell, threshold respected)") {
    val out = graft.SparkEntry.queries("q_semdedup")(spark, sf).collect()
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dups = out.filter(_.getInt(3) == 1)
    assert(dups.nonEmpty, "sf0.001 corpus should contain within-cell near-identical pairs")
    dups.foreach { r =>
      val (v, keeper) = (r.getLong(0), r.getLong(2))
      assert(keeper >= 0 && keeper < v, "keeper must be a lower id")
      assert(cellOf(keeper) == cellOf(v), "keeper must share the trained cell")
    }
    out.filter(_.getInt(3) == 0).foreach(r => assert(r.getLong(2) == -1L))
    val p = graft.SparkEntry.queries("q_semdedup")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), "pair join must stay cell-local")
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
