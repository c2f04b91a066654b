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

  // ------------------------------------------------------------------
  // Round-6: corpus-derived sizing + capped pair joins + delta assign
  // ------------------------------------------------------------------

  test("sizing derivations: exact ceil(sqrt), growth with N, lsh bits bound bucket work") {
    for (n <- Seq(1L, 2L, 3L, 4L, 255L, 256L, 257L, 500L, 2000L, 20000L, 1L << 40)) {
      val c = Similarity.ceilSqrt(n)
      assert(c * c >= n && (c - 1) * (c - 1) < n, s"ceilSqrt($n)=$c")
    }
    assert(Similarity.kCellsOf(500) == 23 && Similarity.kCellsOf(5000) == 71)
    assert(Similarity.kCellsOf(100) == 16, "floor at 16")
    for (n <- Seq(500L, 2000L, 20000L, 1000000L)) {
      val r = Similarity.lshBitsOf(n)
      assert(r >= 4 && r <= 16)
      if (r < 16) assert((1L << r) * 64 >= n, "expected bucket population ≤ 64")
    }
  }

  test("q_semdedup pair-join buckets are capped by design under a SKEWED corpus") {
    // 600 exact clones force one oversized trained cell; the hash split
    // must bound every (cell, subcell) pair-join bucket at ~cap even then.
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = Array.fill(64)(rnd.nextFloat() * 1.2f - 0.6f)
    val rows = (0L until 600L).map(i => (i, base.toSeq)) ++
      (600L until 1000L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 1.2f - 0.6f).toSeq))
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val cap = Similarity.cellCapOf(1000)
    val groups = Similarity.semdedupSubcells(spark, dir).collect()
    val (maxBucket, nSplitCells) =
      (groups.map(_.getLong(2)).max, groups.groupBy(_.getLong(0)).count(_._2.length > 1))
    assert(nSplitCells >= 1, "the oversized clone cell must actually be split")
    // hash-mod split: expected bucket ≤ cap; 1.5× slack for mod imbalance
    assert(maxBucket <= (cap * 3) / 2,
      s"pair-join bucket $maxBucket exceeds cap=$cap (+50% hash slack)")
    // and the verdicts on the skewed corpus still mark the clones as dups —
    // each SUBCELL keeps its own lowest-id clone (the split's recall
    // trade), so non-dup clones number at most the subcell count (~5-8),
    // never a meaningful fraction of the 600 clones
    val verdicts = graft.SparkEntry.queries("q_semdedup")(spark, dir).collect()
    val clones = verdicts.filter(r => r.getLong(0) < 600 && r.getLong(0) > 0)
    val nKeepers = clones.length - clones.count(_.getInt(3) == 1)
    assert(nKeepers <= 16, s"at most one keeper per subcell expected, got $nKeepers")
  }

  test("derived sizing holds at 10× data (ScaleGen replicas): buckets stay ≤ cap + slack") {
    val src = "/root/testdata/sf0.01"
    val dir = java.nio.file.Files.createTempDirectory("graft-10x").toString
    val emb = graft.core.Tables.embeddings(spark, src)
    val bases = Map("vecid" ->
      (emb.agg(org.apache.spark.sql.functions.max("vec_id")).head().getLong(0) + 1L))
    graft.tools.ScaleGen.replicate(spark, emb, Seq("vec_id" -> "vecid"), bases, 10)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(n == 5000L)
    assert(Similarity.kCellsOf(n) > Similarity.kCellsOf(500),
      "KCells must grow with the corpus")
    val cap = Similarity.cellCapOf(n)
    val maxBucket = Similarity.semdedupSubcells(spark, dir)
      .agg(org.apache.spark.sql.functions.max("n")).head().getLong(0)
    assert(maxBucket <= (cap * 3) / 2,
      s"10× corpus: pair-join bucket $maxBucket exceeds cap=$cap (+50% hash slack)")
  }

  test("q_ivf_assign_delta: frozen-centroid delta assignment == full assignment (parquet round-trip)") {
    import org.apache.spark.sql.functions._
    val all = graft.core.Tables.embeddings(spark, sf)
    val nAll = all.count()
    val split = 7L * nAll / 8L
    val base = all.filter(col("vec_id") < split)
    val model = Similarity.trainOn(spark, base, base.count())
    // persist the trained centroids — the artifact a real deployment ships
    val dir = java.nio.file.Files.createTempDirectory("graft-cents").toString
    model.cents.write.mode("overwrite").parquet(dir)
    val frozen = spark.read.parquet(dir)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val deltaOnly = Similarity.assignWithFrozen(spark, all.filter(col("vec_id") >= split), frozen)
    val fullPass = Similarity.assignWithFrozen(spark, all, frozen)
      .filter(col("vec_id") >= split)
    assert(snap(deltaOnly) == snap(fullPass),
      "assignment must be a pure per-row function of (codes, frozen centroids)")
    assert(snap(deltaOnly).nonEmpty)
  }

  test("q_lsh_recall: valid recall; 4 bands never lose to 2 bands (OR-construction)") {
    val rows = graft.SparkEntry.queries("q_lsh_recall")(spark, sf)
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 4))
    rows.foreach { r =>
      val (nExact, nHit, recall) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nHit <= nExact, "candidates caught cannot exceed the exact pair set")
      assert(recall >= 0.0 && recall <= 1.0)
    }
    assert(rows(1).getLong(3) >= rows(0).getLong(3),
      "adding bands strictly widens the candidate set")
  }

  test("q_knn_graph: edges are bucket-local, ranked, self-free, and bucket-exact vs brute force") {
    import org.apache.spark.sql.functions._
    val edges = graft.SparkEntry.queries("q_knn_graph")(spark, sf).collect()
    assert(edges.nonEmpty)
    // per-vector: <= 3 edges, rn dense from 1, scores non-increasing,
    // tie-broken by neighbor id, no self loops
    edges.groupBy(_.getLong(0)).foreach { case (vid, es) =>
      val sorted = es.sortBy(_.getInt(1))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val keys = sorted.map(r => (-r.getDouble(3), r.getLong(2)))
      assert(keys.sortBy(identity).toSeq == keys.toSeq, s"vec $vid not ranked")
      assert(es.forall(_.getLong(2) != vid), s"vec $vid has a self edge")
    }
    // every edge joins two members of the same trained cell + subcell
    val n = graft.core.Tables.embeddings(spark, sf).count()
    val af = Similarity.subcellsOf(
        Similarity.trainedAssignment(spark, sf)._1, Similarity.cellCapOf(n))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    edges.foreach { r =>
      assert(af(r.getLong(0)) == af(r.getLong(2)),
        s"edge ${r.getLong(0)}->${r.getLong(2)} crosses buckets")
    }
    // bucket-exact: for each vector, the operator's neighbor set equals
    // the brute-force top-3 of its bucket (local cosine recompute)
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val byBucket = af.groupBy(_._2).map { case (k, m) => k -> m.keys.toSeq }
    val got = edges.groupBy(_.getLong(0))
      .map { case (v, es) => v -> es.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    af.foreach { case (vid, bucket) =>
      val expect = byBucket(bucket).filter(_ != vid)
        .map(u => (-cos(vecs(vid), vecs(u)), u)).sorted.take(3).map(_._2)
      assert(got.getOrElse(vid, Nil) == expect, s"vec $vid top-3 mismatch")
    }
  }

  test("q_ndcg_eval: graded weights are internally consistent and bounded") {
    val idcg = 3L * 1000000L + 2L * 630930L + 1L * 500000L
    val rows = graft.SparkEntry.queries("q_ndcg_eval")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (16L to 20L), "one row per eval query")
    rows.foreach { r =>
      val (nf, dcg, ndcg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nf >= 0 && nf <= 3, "at most the 3 graded truths")
      assert(ndcg == dcg * 1000000L / idcg, "ndcg is exactly dcg/idcg in ppm")
      assert(ndcg <= 1000000L, "a channel cannot beat the ideal ranking")
      // a found truth contributes at least grade·W(10); dcg 0 iff none found
      assert((dcg == 0L) == (nf == 0L))
      if (nf == 3L) assert(dcg >= 1L * 289065L + 2L * 289065L + 3L * 289065L)
    }
    // the fixture must exercise imperfect ranking (else the eval proves
    // nothing recall@k would not)
    assert(rows.exists(_.getLong(3) < 1000000L), "some query must rank imperfectly")
  }

  test("q_recall_curve: hits nest with k and the k=3 point IS q_ann_recall's single-probe count") {
    val rows = graft.SparkEntry.queries("q_recall_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 15, "5 queries x 3 cutoffs")
    rows.foreach { case (_, k, h, ppm) =>
      assert(h >= 0 && h <= k, "hits bounded by the cutoff")
      assert(ppm == h * 1000000L / k)
    }
    // channel and truth top-k lists NEST with k, so hit counts are
    // non-decreasing along each query's curve
    rows.groupBy(_._1).values.foreach { qr =>
      val byK = qr.sortBy(_._2).map(_._3)
      assert(byK.zip(byK.tail).forall { case (a, b) => b >= a })
    }
    // cross-operator anchor: recall@3 counts exactly what q_ann_recall's
    // nprobe=1 column counts (same frozen channel, same frozen truth)
    val ar = graft.SparkEntry.queries("q_ann_recall")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_._2 == 3L).foreach { case (qid, _, h, _) =>
      assert(h == ar(qid), s"recall@3 of $qid must equal ann_recall n_hits_1")
    }
  }

  test("q_embed_decontam: verdicts respect the split, the threshold, and the probed-channel bound") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q_embed_decontam")(spark, sf).collect()
    assert(out.nonEmpty, "sf0.001 corpus should contain train/eval semantic leaks at 0.3")
    out.foreach { r =>
      assert(r.getLong(0) % 50 != 0, "flagged rows must be TRAIN vectors")
      assert(r.getLong(3) % 50 == 0, "worst match must be an EVAL vector")
      assert(r.getLong(2) >= 1L, "a flagged row leaks at least one eval vector")
      assert(r.getDouble(4) >= 0.3, "reported score must reach the threshold")
    }
    // the removal list is a SUBSET of the brute-force one (the nprobe=4
    // recall trade can miss leaks, never invent them) and each reported
    // score matches the exact cosine bit-for-bit
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorOps.vecDot(spark, a, b)
    val brute = emb.filter(col("vec_id") % 50 =!= 0)
      .join(emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("eid"), col("embedding").as("ee")))
      .select(col("vec_id"), col("eid"),
        round(dot(col("embedding"), col("ee")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
           sqrt(dot(col("ee"), col("ee")))), 6).as("score"))
      .filter(col("score") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bruteTrain = brute.keys.map(_._1).toSet
    out.foreach { r =>
      assert(bruteTrain.contains(r.getLong(0)),
        s"flagged train ${r.getLong(0)} not in the brute-force removal list")
      assert(brute((r.getLong(0), r.getLong(3))) == r.getDouble(4),
        "reported worst-match score must equal the exact cosine")
    }
    assert(out.length * 2 >= bruteTrain.size,
      s"nprobe=4 channel should catch at least half the brute-force leaks: ${out.length}/${bruteTrain.size}")
  }
}
