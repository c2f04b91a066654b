package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product-quantization quality + determinism grading (the oracle gate
  * proves cross-engine equality; this spec proves the index is GOOD and
  * stable). */
class PqSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("training reduces quantization error below the seed codebook") {
    val parts = Pq.pqParts(spark, sf)
    val seedEnc = Pq.assignStep(spark, parts.sv, parts.cb0, "code")
    val seedErr = Pq.quantError(spark, parts.sv, seedEnc, parts.cb0)
    val trainedErr = Pq.quantError(spark, parts.sv, parts.enc, parts.cb)
    assert(trainedErr < seedErr,
      s"2 Lloyd rounds must beat raw seeds: trained=$trainedErr seed=$seedErr")
  }

  test("codebook: bounded size, integer-valued rounded means") {
    val cb = Pq.pqParts(spark, sf).cb.collect()
    assert(cb.length <= 8 * 32, s"at most M*K entries, got ${cb.length}")
    assert(cb.length >= 8 * 2, "training must retain multiple centroids per subspace")
    cb.foreach { r =>
      val m = r.getSeq[Double](r.fieldIndex("m"))
      assert(m.length == 8)
      m.foreach(x => assert(x == math.rint(x),
        s"centroid means must be integer-rounded (exact-ADC invariant): $x"))
    }
  }

  test("encode covers every vector with M codes drawn from the codebook") {
    val parts = Pq.pqParts(spark, sf)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(parts.enc.count() == n * 8)
    val valid = parts.cb.select(col("sub"), col("cid").as("code"))
    assert(parts.enc.join(valid, Seq("sub", "code"), "left_anti").count() == 0,
      "every emitted code must exist in the trained codebook")
  }

  test("training is deterministic: two independent builds produce identical codebooks and codes") {
    val a = Pq.pqParts(spark, sf)
    val b = Pq.pqParts(spark, sf)
    def cbSet(p: Pq.PqParts) = p.cb.collect()
      .map(r => (r.getInt(r.fieldIndex("sub")), r.getLong(r.fieldIndex("cid")),
        r.getSeq[Double](r.fieldIndex("m")).toList)).toSet
    assert(cbSet(a) == cbSet(b))
    def encSet(p: Pq.PqParts) = p.enc.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(encSet(a) == encSet(b))
  }

  test("re-ranked recall never loses to raw ADC recall (superset shortlist, exact scoring)") {
    val rows = graft.SparkEntry.queries("q_pq_adc_recall")(spark, sf).collect()
    assert(rows.length == 5, "queries 16..20")
    rows.foreach { r =>
      val adc = r.getDouble(r.fieldIndex("recall_adc"))
      val rr = r.getDouble(r.fieldIndex("recall_rr"))
      assert(rr >= adc,
        s"qid=${r.getLong(0)}: exact re-rank of an ADC-top-32 superset cannot underperform ADC-top-3 (rr=$rr adc=$adc)")
    }
    val meanRr = rows.map(_.getDouble(rows.head.fieldIndex("recall_rr"))).sum / 5
    assert(meanRr >= 0.5, s"re-ranked recall@3 should be usable, got $meanRr")
  }

  test("q_pq_encode_delta: delta encode equals the full encode's delta rows through codebook persist/reload") {
    // Retrain-rarely/encode-continuously only works if (a) encoding is a
    // pure per-row function of (subvector, codebook) — so a delta batch
    // encodes identically to the same rows inside a full encode — and
    // (b) the codebook survives the parquet round-trip a deployment
    // stores it through. Both are asserted against the declared operator.
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val split = 7L * n / 8L
    val declared = graft.SparkEntry.queries("q_pq_encode_delta")(spark, sf)
      .collect().map(_.mkString(",")).toSet
    assert(declared.nonEmpty)
    // independent base model: train on the same 7/8 base, persist, reload
    val parts = Pq.pqParts(spark, sf)
    val bsv = parts.sv.filter(col("vec_id") < split)
    val (_, cbBase) = Pq.trainCodebooks(spark, bsv, split)
    val dir = tmpDir("pqcb") + "/codebook"
    cbBase.write.mode("overwrite").parquet(dir)
    val cbReload = spark.read.parquet(dir)
    val dsv = parts.sv.filter(col("vec_id") >= split)
    val viaReload = Pq.assignStep(spark, dsv, cbReload, "code")
      .collect().map(_.mkString(",")).toSet
    assert(viaReload == declared,
      "delta encode against reloaded codebooks must match the operator")
    // full encode against the SAME frozen codebooks, restricted to delta
    val fullRestricted = Pq.assignStep(spark, parts.sv, cbReload, "code")
      .filter(col("vec_id") >= split)
      .collect().map(_.mkString(",")).toSet
    assert(fullRestricted == declared,
      "delta batch must be bit-identical to the delta rows of a full encode")
  }

  test("q_ivfpq_recall: composed index keeps the rr >= adc guarantee; rows per query") {
    val rows = graft.SparkEntry.queries("q_ivfpq_recall")(spark, sf).collect()
    assert(rows.length == 5, "queries 16..20")
    rows.foreach { r =>
      val adc = r.getDouble(r.fieldIndex("recall_adc"))
      val rr = r.getDouble(r.fieldIndex("recall_rr"))
      assert(rr >= adc,
        s"qid=${r.getLong(0)}: exact re-rank of the cell-local ADC shortlist cannot underperform its own top-3 (rr=$rr adc=$adc)")
    }
  }

  test("q_mrr_ivfpq: re-ranked reciprocal rank dominates raw ADC rank; stages agree on misses") {
    val rows = graft.SparkEntry.queries("q_mrr_ivfpq")(spark, sf).collect()
    assert(rows.length == 5, "queries 16..20")
    var recovered = 0
    rows.foreach { r =>
      val (rAdc, rrAdc) = (r.getLong(2), r.getLong(3))
      val (rRr, rrRr) = (r.getLong(4), r.getLong(5))
      assert(rrRr >= rrAdc,
        s"qid=${r.getLong(0)}: exact re-rank must not demote the truth (rr=$rrRr adc=$rrAdc)")
      // both stages rank the SAME shortlist: a miss is a miss in both,
      // and a shortlisted truth re-ranks to exactly position 1 (it is
      // the global exact minimum, present in the candidate set)
      assert((rAdc == 0) == (rRr == 0), "stages must agree on shortlist misses")
      if (rAdc > 0) assert(rRr == 1L,
        s"qid=${r.getLong(0)}: shortlisted truth must re-rank to 1, got $rRr")
      if (rAdc > 1) recovered += 1
    }
    // the fixture must exercise the interesting case: at least one query
    // where quantization mis-ranks the truth and the re-rank recovers it
    assert(recovered >= 1, "no query shows the ADC->re-rank recovery path")
  }
}
