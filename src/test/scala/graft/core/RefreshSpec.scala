package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Round-11 verdict #1: incremental artifact REFREEZE. For every
  * monoidal frozen base, `ModelCache.getOrRefresh` must produce — via
  * the base ⊕ delta merge, old corpus never re-read — a value
  * extensionally identical to a from-scratch retrain on the grown
  * corpus. Each test: train on corpus A, append files (corpus B),
  * access again (must take the REFRESH path), then clear the cache and
  * retrain on B outright; the two values must match row-for-row.
  */
class RefreshSpec extends SparkSuite {
  import spark.implicits._

  /** A small deterministic doc corpus: ids `range`, text drawn from a
    * tiny vocabulary so near-dup buckets and BM25 postings overlap. */
  private def docsOf(range: Range): org.apache.spark.sql.DataFrame =
    range.map { i =>
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta")
      val words = (0 until 6 + i % 5).map(j => vocab((i * 7 + j * 3) % vocab.size))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

  private def writeDocs(dir: String, range: Range): Unit =
    docsOf(range).coalesce(1).write.mode("append")
      .parquet(s"$dir/documents.parquet")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("dedup-base: refresh == retrain, and the refresh path actually runs") {
    val d = tmpDir("refresh-dedup")
    ModelCache.clear()
    writeDocs(d, 0 until 100)
    val (sp0, _) = graft.ops.Dedup.dedupBase(spark, d)
    assert(ModelCache.lastEvent("dedup-base", s"$d/documents.parquet")
      .contains("trained"))
    writeDocs(d, 100 until 160)
    val (sp1, agg1) = graft.ops.Dedup.dedupBase(spark, d)
    assert(ModelCache.lastEvent("dedup-base", s"$d/documents.parquet")
      .contains("refreshed"), "append-only growth must take the merge path")
    assert(sp1 > sp0, "the split must advance with the corpus")
    val refreshed = rowsOf(agg1)
    ModelCache.clear()
    val (spR, aggR) = graft.ops.Dedup.dedupBase(spark, d)
    assert(ModelCache.lastEvent("dedup-base", s"$d/documents.parquet")
      .contains("trained"))
    assert(spR == sp1)
    assert(rowsOf(aggR) == refreshed,
      "refreshed bucket summary must equal the from-scratch retrain")
  }

  test("dedup-base: a REWRITTEN file (non-append) falls back to retrain") {
    val d = tmpDir("refresh-dedup-rw")
    ModelCache.clear()
    writeDocs(d, 0 until 100)
    graft.ops.Dedup.dedupBase(spark, d)
    // overwrite = delete + rewrite: the old entries vanish, so the file
    // set is NOT a superset and the monoid merge would be wrong
    docsOf(0 until 80).coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    graft.ops.Dedup.dedupBase(spark, d)
    assert(ModelCache.lastEvent("dedup-base", s"$d/documents.parquet")
      .contains("trained"), "non-append change must retrain, never merge")
  }

  test("bm25-base: refresh == retrain across all four index tables") {
    val d = tmpDir("refresh-bm25")
    ModelCache.clear()
    writeDocs(d, 0 until 100)
    graft.ops.LlmPipeline.bm25Base(spark, d)
    assert(ModelCache.lastEvent("bm25-base", s"$d/documents.parquet")
      .contains("trained"))
    writeDocs(d, 100 until 160)
    val (sp1, tf1, dl1, df1, nd1) = graft.ops.LlmPipeline.bm25Base(spark, d)
    assert(ModelCache.lastEvent("bm25-base", s"$d/documents.parquet")
      .contains("refreshed"))
    val refreshed = Seq(tf1, dl1, df1, nd1).map(rowsOf)
    ModelCache.clear()
    val (spR, tfR, dlR, dfR, ndR) = graft.ops.LlmPipeline.bm25Base(spark, d)
    assert(spR == sp1)
    assert(Seq(tfR, dlR, dfR, ndR).map(rowsOf) == refreshed,
      "postings, doc lengths, dfs and census must all merge exactly")
  }

  test("bpe-hist-base: q_bpe_delta output identical via refresh and retrain") {
    val d = tmpDir("refresh-bpe")
    ModelCache.clear()
    writeDocs(d, 0 until 100)
    graft.SparkEntry.queries("q_bpe_delta")(spark, d).collect()
    assert(ModelCache.lastEvent("bpe-hist-base", s"$d/documents.parquet")
      .contains("trained"))
    writeDocs(d, 100 until 160)
    val viaRefresh = rowsOf(graft.SparkEntry.queries("q_bpe_delta")(spark, d))
    assert(ModelCache.lastEvent("bpe-hist-base", s"$d/documents.parquet")
      .contains("refreshed"))
    ModelCache.clear()
    val viaRetrain = rowsOf(graft.SparkEntry.queries("q_bpe_delta")(spark, d))
    assert(ModelCache.lastEvent("bpe-hist-base", s"$d/documents.parquet")
      .contains("trained"))
    assert(viaRefresh == viaRetrain)
  }

  // --- trade-graph fixtures for cc-base / pr-base ------------------------

  /** `nPairs` disjoint (customer, supplier) pairs, each with `rep`
    * orders in orderkey range starting at `k0`. Far-apart components so
    * a small delta's blast radius stays local (the pr roll-forward's
    * bounded path). */
  private def writeTrades(dir: String, k0: Long, pairs: Seq[(Long, Long)],
      rep: Int): Unit = {
    val rows = pairs.zipWithIndex.flatMap { case ((c, s), i) =>
      (0 until rep).map(r => (k0 + i * rep + r, c, s))
    }
    rows.map { case (k, c, _) => (k, c) }.toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("append").parquet(s"$dir/orders.parquet")
    rows.map { case (k, _, s) => (k, s) }.toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.mode("append").parquet(s"$dir/lineitem.parquet")
  }

  test("cc-base: q_components_delta identical via refresh and retrain") {
    val d = tmpDir("refresh-cc")
    ModelCache.clear()
    // state A: 30 disjoint durable pairs, orderkeys 0..179
    val pairsA = (0L until 30L).map(i => (i, 100L + i))
    writeTrades(d, 0L, pairsA, rep = 6)
    graft.SparkEntry.queries("q_components_delta")(spark, d).collect()
    assert(ModelCache.lastEvent("cc-base", d).contains("trained"))
    // state B: a bridging pair (merges components 0 and 1) plus a brand
    // new pair — newly-durable edges exist in the refresh slice
    writeTrades(d, 1000L, Seq((0L, 101L), (40L, 140L)), rep = 6)
    val viaRefresh = rowsOf(graft.SparkEntry.queries("q_components_delta")(spark, d))
    assert(ModelCache.lastEvent("cc-base", d).contains("refreshed"))
    ModelCache.clear()
    val viaRetrain = rowsOf(graft.SparkEntry.queries("q_components_delta")(spark, d))
    assert(ModelCache.lastEvent("cc-base", d).contains("trained"))
    assert(viaRefresh == viaRetrain)
    // and the refreshed-base result equals the full closure computed by
    // q_components on the same corpus — the delta query's own oracle
    // relationship, preserved across a refreeze
    ModelCache.clear()
    writeTrades(d, 2000L, Seq((41L, 141L)), rep = 6)
    graft.SparkEntry.queries("q_components_delta")(spark, d).collect()
    writeTrades(d, 3000L, Seq((0L, 102L)), rep = 6)
    val deltaOut = rowsOf(graft.SparkEntry.queries("q_components_delta")(spark, d))
    assert(ModelCache.lastEvent("cc-base", d).contains("refreshed"))
    val fullOut = rowsOf(graft.SparkEntry.queries("q_components")(spark, d))
    assert(deltaOut == fullOut)
  }

  test("tri-base: q_triangles_delta identical via refresh and retrain, with both threshold crossings") {
    val d = tmpDir("refresh-tri")
    ModelCache.clear()
    // state A: customers 1-3 each trade durably with suppliers 101+102
    // (pairwise w=2 → triangle {1,2,3}); customer 4 durable with 101
    // only (pairs (i,4) sit at w=1, just below the projection gate);
    // customer 5 has ONE order with 101 (below the durability gate)
    val pairsA = (1L to 3L).flatMap(c => Seq((c, 101L), (c, 102L))) ++
      Seq((4L, 101L))
    writeTrades(d, 0L, pairsA, rep = 2)
    writeTrades(d, 500L, Seq((5L, 101L)), rep = 1)
    graft.SparkEntry.queries("q_triangles_delta")(spark, d).collect()
    assert(ModelCache.lastEvent("tri-base", d).contains("trained"))
    // delta: (4,102) becomes durable → pairs (i,4) cross w 1→2 → three
    // new projection edges completing K4 (3 new triangles, each with 2
    // new edges); (5,101)'s second order crosses cnt 1→2 → newly-durable
    // edge whose pairs stay at w=1 (durability crossing, no projection)
    writeTrades(d, 1000L, Seq((4L, 102L)), rep = 2)
    writeTrades(d, 1100L, Seq((5L, 101L)), rep = 1)
    val viaRefresh = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d))
    assert(ModelCache.lastEvent("tri-base", d).contains("refreshed"),
      "append-only growth must take the merge path")
    ModelCache.clear()
    val viaRetrain = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d))
    assert(ModelCache.lastEvent("tri-base", d).contains("trained"))
    assert(viaRefresh == viaRetrain,
      "rolled-forward censuses and triangle count must equal the retrain")
    val fullOut = rowsOf(graft.SparkEntry.queries("q_triangles")(spark, d))
    assert(viaRefresh == fullOut,
      "incremental census must equal the full q_triangles on the grown corpus")
    val row = graft.SparkEntry.queries("q_triangles")(spark, d).head()
    assert(row.getLong(row.fieldIndex("n_triangles")) == 4L,
      "fixture sanity: K4 after the delta must hold 4 triangles")
  }

  test("tri-base: FLOOD branches — a dense tail and a bulk refreeze slice both fall back exactly") {
    // SERVE flood: edges concentrated in the top-1/8 keyspan, so the
    // serve tail holds far more than 1/4 of the merged edge set and the
    // serve path must rebuild the projection (frac = 4 probe)
    val d1 = tmpDir("refresh-tri-flood-serve")
    ModelCache.clear()
    // sparse prefix: 3 durable pairs spread over keys 0..5
    writeTrades(d1, 0L, Seq((1L, 101L), (2L, 101L), (1L, 102L)), rep = 2)
    // dense top: 15 pairs forming 5 triangles, keys 7000+ (past the
    // 7/8 split of maxkey ≈ 7030, so ALL of them serve from the tail)
    val dense = (0L until 5L).flatMap { i =>
      (1L to 3L).flatMap(c =>
        Seq((100 * (i + 1) + c, 700L + 2 * i), (100 * (i + 1) + c, 701L + 2 * i)))
    }
    writeTrades(d1, 7000L, dense, rep = 2)
    val deltaOut = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d1))
    val fullOut = rowsOf(graft.SparkEntry.queries("q_triangles")(spark, d1))
    assert(deltaOut == fullOut,
      "flooded serve must equal the full census exactly")
    val r1 = graft.SparkEntry.queries("q_triangles")(spark, d1).head()
    assert(r1.getLong(r1.fieldIndex("n_triangles")) == 5L,
      "fixture sanity: the five dense triangles")
    // prove the probe actually FIRES for this split (the branch isn't
    // taken on faith): rebuild the serve-time censuses and ask it
    locally {
      import org.apache.spark.sql.functions._
      val pairs = graft.core.Tables.orders(spark, d1)
        .join(graft.core.Tables.lineitem(spark, d1),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey").as("c"),
          col("l_suppkey").as("s"))
      val sp = 7L * pairs.agg(max(col("o_orderkey"))).head().getLong(0) / 8L
      val cen0 = pairs.filter(col("o_orderkey") < sp)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt"))
      val cenD = pairs.filter(col("o_orderkey") >= sp)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt"))
      val em = graft.ops.Graph.triEoNew(cen0, cenD)
      assert(graft.ops.Graph.triEdgeFlooded(em.eoNew.count(), em.eo0.count(), 4L),
        "fixture must genuinely flood the serve probe")
    }

    // REFRESH flood: delta pairs positioned INSIDE the next refreeze
    // slice (a far padding key drags the 7/8 split past them), so the
    // refreeze sees a bulk slice (> 1/16 of edges) and must take the
    // rebuild branch
    val d2 = tmpDir("refresh-tri-flood-refreeze")
    ModelCache.clear()
    writeTrades(d2, 0L, Seq((1L, 101L), (2L, 101L), (1L, 102L)), rep = 2)
    writeTrades(d2, 10000L, Seq((99L, 999L)), rep = 2) // pins sp ≈ 8750
    graft.SparkEntry.queries("q_triangles_delta")(spark, d2).collect()
    assert(ModelCache.lastEvent("tri-base", d2).contains("trained"))
    // bulk growth at keys 11000+ plus a far padding at 100000: the new
    // split ≈ 87500 swallows the whole bulk into the refreeze slice
    writeTrades(d2, 11000L, dense, rep = 2)
    writeTrades(d2, 100000L, Seq((98L, 998L)), rep = 2)
    val viaRefresh = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d2))
    assert(ModelCache.lastEvent("tri-base", d2).contains("refreshed"),
      "append-only growth must take the merge path even when flooded")
    ModelCache.clear()
    val viaRetrain = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d2))
    assert(viaRefresh == viaRetrain,
      "flooded refreeze must equal the retrain exactly")
    assert(viaRefresh ==
      rowsOf(graft.SparkEntry.queries("q_triangles")(spark, d2)))
    // prove the REFREEZE slice genuinely floods its probe (frac = 16)
    locally {
      import org.apache.spark.sql.functions._
      val pairs = graft.core.Tables.orders(spark, d2)
        .join(graft.core.Tables.lineitem(spark, d2),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey").as("c"),
          col("l_suppkey").as("s"))
      val sp0 = 8750L // 7/8 of the 10001 training max
      val sp1 = 7L * pairs.agg(max(col("o_orderkey"))).head().getLong(0) / 8L
      val cen0 = pairs.filter(col("o_orderkey") < sp0)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt"))
      val cenS = pairs
        .filter(col("o_orderkey") >= sp0 && col("o_orderkey") < sp1)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt"))
      val em = graft.ops.Graph.triEoNew(cen0, cenS)
      assert(graft.ops.Graph.triEdgeFlooded(em.eoNew.count(), em.eo0.count(), 16L),
        "fixture must genuinely flood the refreeze probe")
    }
  }

  test("tri-base: a LOCAL delta takes the incremental branch (refresh == retrain == full)") {
    val d = tmpDir("refresh-tri-local")
    ModelCache.clear()
    // 30 disjoint durable triangles (90 projection edges) — big enough
    // that the 3-edge delta below stays far under the 1/4 flood probe,
    // so the refreeze and serve take the inclusion–exclusion branch
    val pairsA = (0L until 30L).flatMap { i =>
      (1L to 3L).flatMap(c =>
        Seq((10 * i + c, 500L + 2 * i), (10 * i + c, 501L + 2 * i)))
    }
    writeTrades(d, 0L, pairsA, rep = 2)
    writeTrades(d, 5000L, Seq((4L, 500L)), rep = 2) // w=1 pairs to triple 0
    graft.SparkEntry.queries("q_triangles_delta")(spark, d).collect()
    assert(ModelCache.lastEvent("tri-base", d).contains("trained"))
    // delta: (4, 501) durable → pairs (i, 4) cross w 1→2 → K4 on the
    // first triple → exactly 3 new triangles via the delta joins
    writeTrades(d, 9000L, Seq((4L, 501L)), rep = 2)
    val viaRefresh = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d))
    assert(ModelCache.lastEvent("tri-base", d).contains("refreshed"))
    ModelCache.clear()
    val viaRetrain = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d))
    assert(viaRefresh == viaRetrain)
    val fullOut = rowsOf(graft.SparkEntry.queries("q_triangles")(spark, d))
    assert(viaRefresh == fullOut)
    val row = graft.SparkEntry.queries("q_triangles")(spark, d).head()
    assert(row.getLong(row.fieldIndex("n_triangles")) == 33L,
      "30 base triangles + the 3 K4 completions")
  }

  test("lp-base: q_label_prop and q_modularity identical via refresh and retrain (bounded path)") {
    val d = tmpDir("refresh-lp")
    ModelCache.clear()
    // state A: 40 disjoint strong pairs (rep=2 crosses the cnt>=2 gate)
    val pairsA = (0L until 40L).map(i => (i, 100L + i))
    writeTrades(d, 0L, pairsA, rep = 2)
    graft.SparkEntry.queries("q_label_prop")(spark, d).collect()
    assert(ModelCache.lastEvent("lp-base", d).contains("trained"))
    // delta: one bridge into an existing pair's component (labels there
    // must DROP to the bridged minimum) + one disjoint new pair — the
    // radius stays far below half of ~80 nodes, so the refresh takes the
    // per-round roll-forward, not the rebuild fallback
    writeTrades(d, 1000L, Seq((0L, 101L), (50L, 150L)), rep = 2)
    val viaRefresh = Seq("q_label_prop", "q_modularity")
      .map(q => rowsOf(graft.SparkEntry.queries(q)(spark, d)))
    assert(ModelCache.lastEvent("lp-base", d).contains("refreshed"),
      "append-only growth with a local delta must take the roll-forward")
    ModelCache.clear()
    val viaRetrain = Seq("q_label_prop", "q_modularity")
      .map(q => rowsOf(graft.SparkEntry.queries(q)(spark, d)))
    assert(ModelCache.lastEvent("lp-base", d).contains("trained"))
    assert(viaRefresh == viaRetrain,
      "rolled-forward labels must equal the from-scratch fixpoint")
    // the bridge must actually have moved a label: community of node 1
    // (pair (1,101)) now includes node 0's id via 0—101
    assert(viaRetrain.head.exists(_.contains("[0,")),
      "the merged community under label 0 must exist after the bridge")
  }

  test("pr-base: q_pagerank_delta identical via refresh and retrain (bounded path)") {
    val d = tmpDir("refresh-pr")
    ModelCache.clear()
    val pairsA = (0L until 40L).map(i => (i, 100L + i))
    writeTrades(d, 0L, pairsA, rep = 2)
    graft.SparkEntry.queries("q_pagerank_delta")(spark, d).collect()
    assert(ModelCache.lastEvent("pr-base", d).contains("trained"))
    // delta touches ONE existing component + adds one disjoint pair: the
    // blast radius stays far below half of ~80 nodes, so the refresh
    // takes the per-round roll-forward, not the rebuild fallback
    writeTrades(d, 1000L, Seq((0L, 101L), (50L, 150L)), rep = 2)
    val viaRefresh = rowsOf(graft.SparkEntry.queries("q_pagerank_delta")(spark, d))
    assert(ModelCache.lastEvent("pr-base", d).contains("refreshed"))
    ModelCache.clear()
    val viaRetrain = rowsOf(graft.SparkEntry.queries("q_pagerank_delta")(spark, d))
    assert(viaRefresh == viaRetrain)
    // the rolled-forward base must also keep the delta query equal to
    // the full unrolled PageRank — its oracle relationship
    val fullOut = rowsOf(graft.SparkEntry.queries("q_pagerank")(spark, d))
    assert(viaRetrain == fullOut)
  }

  test("truth-base / truth-l2-base: refresh == retrain over grown embeddings") {
    val d = tmpDir("refresh-truth")
    ModelCache.clear()
    def emb(i: Long): Array[Float] =
      Array.tabulate(8)(j => (((i * 31 + j * 17) % 13) - 6).toFloat / 7f)
    def write(r: Range): Unit =
      r.map(i => (i.toLong, emb(i))).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(s"$d/embeddings.parquet")
    write(0 until 40)
    graft.ops.Similarity.truthBase(spark, d)
    graft.ops.Pq.truthL2Base(spark, d)
    // new vectors arrive: the scored tables must gain exactly the delta
    // rows and the top-10 must re-derive from old-top ∪ delta
    write(40 until 64)
    val (exC, topC) = graft.ops.Similarity.truthBase(spark, d)
    assert(ModelCache.lastEvent("truth-base", s"$d/embeddings.parquet")
      .contains("refreshed"))
    val (exL, topL) = graft.ops.Pq.truthL2Base(spark, d)
    assert(ModelCache.lastEvent("truth-l2-base", s"$d/embeddings.parquet")
      .contains("refreshed"))
    val viaRefresh = Seq(exC, topC, exL, topL).map(rowsOf)
    ModelCache.clear()
    val (exC2, topC2) = graft.ops.Similarity.truthBase(spark, d)
    val (exL2, topL2) = graft.ops.Pq.truthL2Base(spark, d)
    assert(ModelCache.lastEvent("truth-base", s"$d/embeddings.parquet")
      .contains("trained"))
    assert(Seq(exC2, topC2, exL2, topL2).map(rowsOf) == viaRefresh,
      "refreshed truth tables must equal the from-scratch retrain")
  }

  test("lm-base: refreshed bigram/unigram censuses equal the retrain") {
    val d = tmpDir("refresh-lm")
    ModelCache.clear()
    writeDocs(d, 0 until 100)
    graft.ops.TextAnalysis.lmModel(spark, d)
    assert(ModelCache.lastEvent("lm-base", s"$d/documents.parquet")
      .contains("trained"))
    writeDocs(d, 100 until 160)
    val m1 = graft.ops.TextAnalysis.lmModel(spark, d)
    assert(ModelCache.lastEvent("lm-base", s"$d/documents.parquet")
      .contains("refreshed"))
    val viaRefresh = (rowsOf(m1.bc), rowsOf(m1.uc), m1.vocab)
    ModelCache.clear()
    val m2 = graft.ops.TextAnalysis.lmModel(spark, d)
    assert((rowsOf(m2.bc), rowsOf(m2.uc), m2.vocab) == viaRefresh)
  }

  test("layout-base: q_compact_plan_delta identical via refresh and retrain, and == the full planner") {
    val d = tmpDir("refresh-layout")
    ModelCache.clear()
    // events with event_type + multi-day spread so the census has many
    // (type, day) files and bins split across the 50k target
    def write(range: Range): Unit =
      spark.createDataFrame(range.map { i =>
        (i.toLong, (i % 7).toLong,
          new java.sql.Timestamp(1700000000000L + i.toLong * 3600_000L),
          s"t${i % 3}")
      }).toDF("event_id", "user_id", "ts", "event_type")
        .coalesce(1).write.mode("append").parquet(s"$d/events.parquet")
    def delta(): Seq[String] =
      rowsOf(graft.ops.Layout.compactPlanDelta.fn(spark, d))
    write(0 until 400)
    val a = delta()
    assert(ModelCache.lastEvent("layout-base", s"$d/events.parquet")
      .contains("trained"))
    assert(a == rowsOf(graft.ops.Layout.compactPlan.fn(spark, d)),
      "incremental plan must equal the from-scratch planner")
    // append a slice landing on EXISTING (type, day) files and new days:
    // the merge must add counts into frozen census rows, not just append
    write(400 until 520)
    val b = delta()
    assert(ModelCache.lastEvent("layout-base", s"$d/events.parquet")
      .contains("refreshed"), "append-only growth must take the merge path")
    assert(b == rowsOf(graft.ops.Layout.compactPlan.fn(spark, d)))
    ModelCache.clear()
    assert(delta() == b, "refreshed census must equal the retrain")
  }

  test("refresh chains: two successive appends refresh twice and stay exact") {
    val d = tmpDir("refresh-chain")
    ModelCache.clear()
    writeDocs(d, 0 until 100)
    graft.ops.Dedup.dedupBase(spark, d)
    writeDocs(d, 100 until 130)
    graft.ops.Dedup.dedupBase(spark, d)
    assert(ModelCache.lastEvent("dedup-base", s"$d/documents.parquet")
      .contains("refreshed"))
    writeDocs(d, 130 until 170)
    val (sp2, agg2) = graft.ops.Dedup.dedupBase(spark, d)
    assert(ModelCache.lastEvent("dedup-base", s"$d/documents.parquet")
      .contains("refreshed"))
    val chained = rowsOf(agg2)
    ModelCache.clear()
    val (spR, aggR) = graft.ops.Dedup.dedupBase(spark, d)
    assert(spR == sp2 && rowsOf(aggR) == chained,
      "a refresh of a refreshed base must still equal the retrain")
  }
  test("bm25-base: ten refresh generations keep the stored plan's union depth bounded (flattenWide) and values exact") {
    // Round-12 advice: each refresh stores base UNION delta lazily, so a
    // long-lived session grew one union leg per generation without
    // bound. Session.flattenWide truncates once the analyzed plan
    // crosses 8 legs — drive TEN generations and assert both halves:
    // the plan stays bounded AND the final value still equals a
    // from-scratch retrain.
    def unionLegs(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u.children.size
      }.sum
    val d = tmpDir("refresh-deep")
    ModelCache.clear()
    writeDocs(d, 0 until 60)
    graft.ops.LlmPipeline.bm25Base(spark, d)
    var refreshes = 0
    (1 to 10).foreach { g =>
      writeDocs(d, (60 + (g - 1) * 20) until (60 + g * 20))
      val (_, tf, dl, _, _) = graft.ops.LlmPipeline.bm25Base(spark, d)
      if (ModelCache.lastEvent("bm25-base", s"$d/documents.parquet")
          .contains("refreshed")) refreshes += 1
      assert(unionLegs(tf) <= 9,
        s"generation $g: tf plan grew to ${unionLegs(tf)} union legs")
      assert(unionLegs(dl) <= 9,
        s"generation $g: dl plan grew to ${unionLegs(dl)} union legs")
    }
    assert(refreshes == 10, s"every append must take the merge path: $refreshes")
    val (spC, tfC, dlC, dfC, ndC) = graft.ops.LlmPipeline.bm25Base(spark, d)
    val chained = (rowsOf(tfC), rowsOf(dlC), rowsOf(dfC), rowsOf(ndC))
    ModelCache.clear()
    val (spR, tfR, dlR, dfR, ndR) = graft.ops.LlmPipeline.bm25Base(spark, d)
    assert(spR == spC)
    assert((rowsOf(tfR), rowsOf(dlR), rowsOf(dfR), rowsOf(ndR)) == chained,
      "ten chained refreshes (with mid-chain flattens) must equal the retrain")
  }
  test("sess-base: q_sessionize_delta identical via refresh and retrain (straddle + new-user + chained appends)") {
    val d = tmpDir("refresh-sess")
    ModelCache.clear()
    def write(rows: Seq[(Long, Long, Long)]): Unit =
      spark.createDataFrame(rows.map { case (id, uid, tsSec) =>
        (id, uid, new java.sql.Timestamp(1700000000000L + tsSec * 1000L))
      }).toDF("event_id", "user_id", "ts")
        .coalesce(1).write.mode("append").parquet(s"$d/events.parquet")
    def result(): Seq[String] =
      rowsOf(graft.ops.Temporal.sessionizeDelta.fn(spark, d))
    def retrain(): Seq[String] = {
      ModelCache.clear()
      rowsOf(graft.ops.Temporal.sessionizeDelta.fn(spark, d))
    }
    // gen A: user 1 two sessions, users 2-3 one each
    write(Seq((0L, 1L, 0L), (1L, 1L, 60L), (2L, 1L, 120L),
      (3L, 1L, 7200L), (4L, 1L, 7260L),
      (5L, 2L, 100L), (6L, 2L, 160L), (7L, 3L, 50L)))
    assert(result() == retrain())
    // gen B: user 1 STRADDLES their open session (gap 140s) then opens a
    // new one; user 2 opens a new session; user 4 is brand new
    write(Seq((100L, 1L, 7400L), (101L, 1L, 20000L),
      (102L, 2L, 10000L), (103L, 4L, 500L), (104L, 4L, 560L)))
    val afterB = result()
    assert(ModelCache.lastEvent("sess-base", s"$d/events.parquet")
      .contains("refreshed"), "append-only growth must take the merge path")
    assert(afterB == retrain())
    // the straddled session must carry the merged count and span
    assert(afterB.exists(_.contains("[1,2,3,1700007200000000,200000000]")),
      s"user 1 session 2 must merge to 3 events over 200s: $afterB")
    // gen C with far-higher ids pushes gen B fully into the REFRESH slice
    write(Seq((800L, 1L, 30000L), (801L, 5L, 40000L)))
    val afterC = result()
    assert(ModelCache.lastEvent("sess-base", s"$d/events.parquet")
      .contains("refreshed"))
    assert(afterC == retrain(),
      "chained refresh (straddle + new user processed in-refresh) must equal retrain")
  }
  test("containment-base: refresh == retrain bit-identically, incl. shingles crossing the rare band") {
    // Round-13 ask #2 (tenth delta-family member): the per-shingle df
    // census is monoidal under append; rare membership changes only for
    // delta-touched shingles, and only OUTWARD. Docs of exactly 8
    // tokens carry exactly one shingle, so df is script-controlled.
    val d = tmpDir("refresh-contain")
    ModelCache.clear()
    val S1 = "a b c d e f g h"   // base df 8 (at the cap)
    val S2 = "i j k l m n o p"   // base df 1
    val S3 = "q r s t u v w x"   // base df 2
    val S4 = "a1 b1 c1 d1 e1 f1 g1 h1" // arrives only in the delta
    def write(rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(rows).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$d/documents.parquet")
    def snapshot(): (Long, Seq[String], Seq[String], Seq[String], Seq[String]) = {
      val b = graft.ops.Dedup.containmentBase(spark, d)
      (b.sp, rowsOf(b.full), rowsOf(b.df), rowsOf(b.rareIdx), rowsOf(b.sizes))
    }
    // gen A
    write((1L to 8L).map(i => (i, S1)) ++ Seq((9L, S2), (10L, S3), (11L, S3)))
    val genA = snapshot()
    assert(ModelCache.lastEvent("containment-base", s"$d/documents.parquet")
      .contains("trained"))
    assert(genA._4.count(_.contains(S1.take(5))) == 8, "S1 at the cap is still rare")
    // gen B: S1 crosses OUT (df 8→9); S2 gains its pair (1→2, stays in);
    // S4 arrives new (→ in); S3 grows inside the band (2→3)
    write(Seq((20L, S1), (21L, S2), (22L, S4), (23L, S3)))
    val viaRefresh = snapshot()
    assert(ModelCache.lastEvent("containment-base", s"$d/documents.parquet")
      .contains("refreshed"), "append-only growth must take the merge path")
    ModelCache.clear()
    val viaRetrain = snapshot()
    assert(viaRefresh == viaRetrain,
      s"refresh diverged from retrain:\n$viaRefresh\nvs\n$viaRetrain")
    // the crossing really happened — judged on the WHOLE-corpus serve
    // view (the artifact freezes only the 7/8 doc-id prefix; the newest
    // docs ride the live serve slice): S1's postings must be GONE from
    // the merged band, S4's present
    def servedRare(): Seq[String] = {
      val v = graft.ops.Dedup.containmentServe(spark, d)
      rowsOf(v.rareCand
        .join(v.df.filter(col("df") <= 8).select("shingle"), "shingle"))
    }
    val rareAfterB = servedRare()
    assert(!rareAfterB.exists(_.contains("a b c")), "df 9 must leave the band")
    assert(rareAfterB.exists(_.contains("a1 b1")), "new rare shingle must enter")
    // gen C chains another append on the refreshed artifact
    write(Seq((30L, S4), (31L, S2)))
    val genC = snapshot()
    assert(ModelCache.lastEvent("containment-base", s"$d/documents.parquet")
      .contains("refreshed"))
    ModelCache.clear()
    assert(genC == snapshot(), "chained refresh must equal retrain")
    // and the admission gate served from the refreshed base must equal
    // one served from a retrained base (same probe batch)
    val probe = spark.createDataFrame(Seq((100L, S2), (101L, S1)))
      .toDF("doc_id", "text")
    ModelCache.clear()
    val b1 = graft.ops.Dedup.containmentServe(spark, d)
    val vRetrain = rowsOf(graft.streaming.Stateful.containmentVerdictsBatch(probe, b1))
    write(Seq((40L, S3))) // force one more refresh generation
    val b2 = graft.ops.Dedup.containmentServe(spark, d)
    assert(ModelCache.lastEvent("containment-base", s"$d/documents.parquet")
      .contains("refreshed"))
    ModelCache.clear()
    val b3 = graft.ops.Dedup.containmentServe(spark, d)
    assert(rowsOf(graft.streaming.Stateful.containmentVerdictsBatch(probe, b2))
      == rowsOf(graft.streaming.Stateful.containmentVerdictsBatch(probe, b3)),
      "verdicts from refreshed and retrained bases must match")
    assert(vRetrain.nonEmpty)
  }

  test("sess-base: LATE delta arrivals route through per-user re-sessionize (refresh == retrain)") {
    // Round-13 advice: a delta event whose ts predates its user's frozen
    // tail can merge FROZEN history — e.g. bridge the 30-min gap between
    // a closed session and the tail — which the marker stitch cannot
    // reproduce from aggregates. Such users must take the full per-user
    // re-sessionize path and still equal the from-scratch oracle.
    val d = tmpDir("refresh-late")
    ModelCache.clear()
    def write(rows: Seq[(Long, Long, Long)]): Unit =
      spark.createDataFrame(rows.map { case (id, uid, tsSec) =>
        (id, uid, new java.sql.Timestamp(1700000000000L + tsSec * 1000L))
      }).toDF("event_id", "user_id", "ts")
        .coalesce(1).write.mode("append").parquet(s"$d/events.parquet")
    def result(): Seq[String] =
      rowsOf(graft.ops.Temporal.sessionizeDelta.fn(spark, d))
    def retrain(): Seq[String] = {
      ModelCache.clear()
      rowsOf(graft.ops.Temporal.sessionizeDelta.fn(spark, d))
    }
    // gen A: user 1 closed session [0..120] + tail [7200..7260];
    // user 2 tail [100..160]; user 3 single event
    write(Seq((0L, 1L, 0L), (1L, 1L, 60L), (2L, 1L, 120L),
      (3L, 1L, 7200L), (4L, 1L, 7260L),
      (5L, 2L, 100L), (6L, 2L, 160L), (7L, 3L, 50L)))
    assert(result() == retrain())
    // gen B: id 100 is LATE for user 1 (ts 1500 < tail last 7260) and
    // bridges the gap into the CLOSED session [0..120] (1500-120 < 1800);
    // id 101 is late INSIDE user 2's tail span; id 103 is an on-time
    // event for the same routed user 1; id 102 is an on-time normal
    // arrival for user 3 (must stay on the marker-stitch path)
    write(Seq((100L, 1L, 1500L), (101L, 2L, 150L),
      (102L, 3L, 4000L), (103L, 1L, 7400L)))
    val afterB = result()
    assert(afterB == retrain(), "late-arrival serve stitch must equal retrain")
    // the closed session must have absorbed the late bridge event
    assert(afterB.exists(_.contains("[1,1,4,1700000000000000,1500000000]")),
      s"user 1 session 1 must merge to 4 events over 1500s: $afterB")
    // gen C pushes the late events into the REFRESH slice (freeze path)
    write(Seq((800L, 1L, 30000L), (801L, 3L, 40000L)))
    val afterC = result()
    assert(ModelCache.lastEvent("sess-base", s"$d/events.parquet")
      .contains("refreshed"), "append-only growth must take the merge path")
    assert(afterC == retrain(),
      "late arrivals processed in-refresh must equal retrain")
    // the concurrency census composed on the same base must also agree
    ModelCache.clear()
    val viaDelta = rowsOf(graft.ops.Temporal.concurrencyDelta.fn(spark, d))
    val fromScratch = rowsOf(graft.ops.Temporal.concurrency.fn(spark, d))
    assert(viaDelta == fromScratch,
      "q_concurrency_delta over a late-arrival corpus must equal q_concurrency")
  }

  // --- BACKFILL guards (round-15 verdict #1) ----------------------------
  // An append whose ids land BELOW the frozen split is invisible to an
  // id-sliced delta scan: the monoid merge would silently under-count.
  // Each guarded base must probe the NEW FILES ONLY, decline the merge
  // (lifecycle event "retrained", distinct from "trained"/"refreshed"),
  // and still equal a from-scratch build on the full corpus.

  private def writeEvents(d: String, range: Range): Unit =
    spark.createDataFrame(range.map { i =>
      (i.toLong, (i % 7).toLong,
        new java.sql.Timestamp(1700000000000L + i.toLong * 3600_000L),
        s"t${i % 3}")
    }).toDF("event_id", "user_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(s"$d/events.parquet")

  test("layout-base: a BACKFILL append declines the merge (retrained) and stays exact") {
    val d = tmpDir("backfill-layout")
    ModelCache.clear()
    writeEvents(d, 100 until 400) // split freezes at 7*399/8 = 349
    graft.ops.Layout.compactPlanDelta.fn(spark, d).collect()
    assert(ModelCache.lastEvent("layout-base", s"$d/events.parquet")
      .contains("trained"))
    writeEvents(d, 0 until 50) // ids BELOW the frozen split
    val viaGuard = rowsOf(graft.ops.Layout.compactPlanDelta.fn(spark, d))
    assert(ModelCache.lastEvent("layout-base", s"$d/events.parquet")
      .contains("retrained"),
      "a below-split append must decline the merge and retrain")
    assert(viaGuard == rowsOf(graft.ops.Layout.compactPlan.fn(spark, d)),
      "post-backfill incremental plan must equal the from-scratch planner")
    ModelCache.clear()
    assert(viaGuard == rowsOf(graft.ops.Layout.compactPlanDelta.fn(spark, d)))
    // a subsequent MONOTONE append on the retrained base refreshes again
    writeEvents(d, 400 until 450)
    graft.ops.Layout.compactPlanDelta.fn(spark, d).collect()
    assert(ModelCache.lastEvent("layout-base", s"$d/events.parquet")
      .contains("refreshed"), "the guard must not poison later clean appends")
  }

  test("document bases (dedup/bm25/bpe-hist/lm): a backfill append retrains and stays exact") {
    val d = tmpDir("backfill-docs")
    ModelCache.clear()
    writeDocs(d, 100 until 300) // dedup/bm25/bpe split = 7*299/8 = 261
    val src = s"$d/documents.parquet"
    graft.ops.Dedup.dedupBase(spark, d)
    graft.ops.LlmPipeline.bm25Base(spark, d)
    graft.ops.TextAnalysis.bpeHistBase(spark, d)
    graft.ops.TextAnalysis.lmModel(spark, d)
    writeDocs(d, 0 until 50) // below every frozen split / high-water
    val (spG, aggG) = graft.ops.Dedup.dedupBase(spark, d)
    val bmG = graft.ops.LlmPipeline.bm25Base(spark, d)
    val bpeG = graft.ops.TextAnalysis.bpeHistBase(spark, d)
    val lmG = graft.ops.TextAnalysis.lmModel(spark, d)
    for (k <- Seq("dedup-base", "bm25-base", "bpe-hist-base", "lm-base"))
      assert(ModelCache.lastEvent(k, src).contains("retrained"),
        s"$k must decline the backfill merge and retrain")
    val guarded = (spG, rowsOf(aggG), rowsOf(bmG._2), rowsOf(bmG._3),
      rowsOf(bmG._4), rowsOf(bmG._5), bpeG._1, rowsOf(bpeG._2),
      rowsOf(lmG.bc), rowsOf(lmG.uc), lmG.vocab)
    ModelCache.clear()
    val (spR, aggR) = graft.ops.Dedup.dedupBase(spark, d)
    val bmR = graft.ops.LlmPipeline.bm25Base(spark, d)
    val bpeR = graft.ops.TextAnalysis.bpeHistBase(spark, d)
    val lmR = graft.ops.TextAnalysis.lmModel(spark, d)
    assert(guarded == (spR, rowsOf(aggR), rowsOf(bmR._2), rowsOf(bmR._3),
      rowsOf(bmR._4), rowsOf(bmR._5), bpeR._1, rowsOf(bpeR._2),
      rowsOf(lmR.bc), rowsOf(lmR.uc), lmR.vocab),
      "guard-retrained artifacts must equal a from-scratch build")
  }

  test("containment-base: the INCLUSIVE split's off-by-one — doc_id == sp0 is a backfill, sp0+1 is not") {
    val d = tmpDir("backfill-contain")
    ModelCache.clear()
    writeDocs(d, 0 until 100) // freezes doc_id <= sp0 = 7*99/8 = 86
    graft.ops.Dedup.containmentBase(spark, d)
    val src = s"$d/documents.parquet"
    // append AT the inclusive bound: inside the frozen prefix → retrain
    writeDocs(d, 86 until 87)
    graft.ops.Dedup.containmentBase(spark, d)
    assert(ModelCache.lastEvent("containment-base", src).contains("retrained"),
      "doc_id == sp0 sits inside the frozen (inclusive) prefix")
    // the retrain moved the split to 7*99/8 = 86 again; append ABOVE it
    writeDocs(d, 87 until 88)
    graft.ops.Dedup.containmentBase(spark, d)
    assert(ModelCache.lastEvent("containment-base", src).contains("refreshed"),
      "doc_id just above the inclusive bound is a clean delta")
    // and the served census still equals a cold rebuild
    val viaGuard = rowsOf(graft.ops.Dedup.dedupContainment.fn(spark, d))
    ModelCache.clear()
    assert(viaGuard == rowsOf(graft.ops.Dedup.dedupContainment.fn(spark, d)))
  }

  test("sess-base: an event_id backfill (orthogonal to late EVENT-TIME arrivals) retrains") {
    val d = tmpDir("backfill-sess")
    ModelCache.clear()
    def write(rows: Seq[(Long, Long, Long)]): Unit =
      spark.createDataFrame(rows.map { case (id, uid, tsSec) =>
        (id, uid, new java.sql.Timestamp(1700000000000L + tsSec * 1000L))
      }).toDF("event_id", "user_id", "ts")
        .coalesce(1).write.mode("append").parquet(s"$d/events.parquet")
    write((100L to 120L).map(i => (i, i % 3, i * 100)))
    graft.ops.Temporal.sessionizeDelta.fn(spark, d).collect()
    assert(ModelCache.lastEvent("sess-base", s"$d/events.parquet")
      .contains("trained"))
    // ids below the frozen split (~7*120/8 = 105): the stitch's late-ts
    // routing CANNOT see these (they never enter the delta slice)
    write(Seq((10L, 0L, 500L), (11L, 1L, 600L)))
    val viaGuard = rowsOf(graft.ops.Temporal.sessionizeDelta.fn(spark, d))
    assert(ModelCache.lastEvent("sess-base", s"$d/events.parquet")
      .contains("retrained"), "id backfill must decline the stitch")
    ModelCache.clear()
    assert(viaGuard == rowsOf(graft.ops.Temporal.sessionizeDelta.fn(spark, d)))
  }

  test("tri-base / cc-base / lp-base: a lineitem-only backfill under an OLD orderkey retrains") {
    val d = tmpDir("backfill-tri")
    ModelCache.clear()
    val pairsA = (1L to 3L).flatMap(c => Seq((c, 101L), (c, 102L)))
    writeTrades(d, 0L, pairsA, rep = 2)
    writeTrades(d, 1000L, Seq((9L, 109L)), rep = 2) // pins split at 875
    graft.SparkEntry.queries("q_triangles_delta")(spark, d).collect()
    graft.SparkEntry.queries("q_components_delta")(spark, d).collect()
    graft.SparkEntry.queries("q_label_prop")(spark, d).collect()
    // new LINEITEMS for an orderkey inside the frozen prefix — the order
    // side gains nothing, so only the l_orderkey probe can catch this
    Seq((3L, 103L)).map { case (k, s) => (k, s) }
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.mode("append").parquet(s"$d/lineitem.parquet")
    val triG = rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d))
    val ccG = rowsOf(graft.SparkEntry.queries("q_components_delta")(spark, d))
    val lpG = rowsOf(graft.SparkEntry.queries("q_label_prop")(spark, d))
    for (k <- Seq("tri-base", "cc-base", "lp-base"))
      assert(ModelCache.lastEvent(k, d).contains("retrained"),
        s"$k must catch the lineitem-side backfill")
    ModelCache.clear()
    assert(triG == rowsOf(graft.SparkEntry.queries("q_triangles_delta")(spark, d)))
    assert(ccG == rowsOf(graft.SparkEntry.queries("q_components_delta")(spark, d)))
    assert(lpG == rowsOf(graft.SparkEntry.queries("q_label_prop")(spark, d)))
  }

  test("truth bases: a vec_id backfill (which can change the query set itself) retrains") {
    val d = tmpDir("backfill-truth")
    ModelCache.clear()
    def emb(i: Long): Array[Float] =
      Array.tabulate(8)(j => (((i * 31 + j * 17) % 13) - 6).toFloat / 7f)
    def write(r: Range): Unit =
      r.map(i => (i.toLong, emb(i))).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(s"$d/embeddings.parquet")
    write(10 until 50)
    graft.ops.Similarity.truthBase(spark, d)
    graft.ops.Pq.truthL2Base(spark, d)
    write(0 until 5) // below the frozen high-water AND below the old min
    val (exG, topG) = graft.ops.Similarity.truthBase(spark, d)
    val (exL, topL) = graft.ops.Pq.truthL2Base(spark, d)
    assert(ModelCache.lastEvent("truth-base", s"$d/embeddings.parquet")
      .contains("retrained"))
    assert(ModelCache.lastEvent("truth-l2-base", s"$d/embeddings.parquet")
      .contains("retrained"))
    val guarded = Seq(exG, topG, exL, topL).map(rowsOf)
    ModelCache.clear()
    val (exR, topR) = graft.ops.Similarity.truthBase(spark, d)
    val (exL2, topL2) = graft.ops.Pq.truthL2Base(spark, d)
    assert(Seq(exR, topR, exL2, topL2).map(rowsOf) == guarded,
      "guard-retrained truth tables must equal the cold build")
  }

  test("novelty-base: refresh == retrain == the full census, and backfill (ownership theft) retrains") {
    // Round 16: the novelty member of the delta family. Frozen rows are
    // immutable only because new ids cannot steal first-ownership — the
    // exact property an id backfill breaks, so this member ships with
    // the guard from day one.
    val d = tmpDir("refresh-novelty")
    ModelCache.clear()
    // 10-token docs → 3 shingles each; overlapping windows across docs
    // share shingles, so ownership actually contends
    def text(i: Long): String =
      (0 until 10).map(j => s"w${(i * 2 + j) % 40}").mkString(" ")
    def write(r: Range): Unit =
      spark.createDataFrame(r.map(i => (i.toLong, text(i))))
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$d/documents.parquet")
    def full(): Seq[String] =
      rowsOf(graft.ops.Dedup.ngramNovelty.fn(spark, d))
    def delta(): Seq[String] =
      rowsOf(graft.ops.Dedup.noveltyDelta.fn(spark, d))
    val src = s"$d/documents.parquet"
    write(100 until 300) // split freezes at 7*299/8 = 261
    assert(delta() == full(), "incremental must equal the census (gen A)")
    assert(ModelCache.lastEvent("novelty-base", src).contains("trained"))
    // append: slice [261, 315) rolls into the base; the rest serves live
    write(300 until 360)
    val viaRefresh = delta()
    assert(ModelCache.lastEvent("novelty-base", src).contains("refreshed"),
      "append-only growth must take the merge path")
    assert(viaRefresh == full(), "incremental must equal the census (gen B)")
    ModelCache.clear()
    assert(delta() == viaRefresh, "refresh must equal the retrain")
    // backfill: doc ids BELOW the frozen split would steal ownership of
    // every shingle they saw first — the merge must decline
    write(0 until 40)
    val viaGuard = delta()
    assert(ModelCache.lastEvent("novelty-base", src).contains("retrained"),
      "a below-split append must decline the merge and retrain")
    assert(viaGuard == full(),
      "post-backfill incremental must equal the census (ownership re-derived)")
  }

  test("ivf: BIT-PARITY delta when k and the training sample are unchanged") {
    // Training is sample-capped at TrainCap=4096 ids and seeded by
    // ids < k, so a pure high-id append that moves neither k = ⌈√n⌉ nor
    // min(n, TrainCap) leaves every training input byte-identical — the
    // refresh must reuse the frozen centroids verbatim, assign ONLY the
    // delta, and still equal a cold retrain bit-for-bit.
    val d = tmpDir("refresh-ivf-delta")
    ModelCache.clear()
    def emb(i: Long): Array[Float] =
      Array.tabulate(64)(j => (((i * 31 + j * 17) % 29) - 14).toFloat / 15f)
    def write(r: Range): Unit =
      r.map(i => (i.toLong, emb(i))).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(s"$d/embeddings.parquet")
    // n0 = 4150 > TrainCap → sample = first 4096 ids, frozen; k = 65.
    // n1 = 4220 ≤ 65² = 4225 → k stays 65. Both invariants hold.
    write(0 until 4150)
    graft.ops.Similarity.trainedParts(spark, d)
    write(4150 until 4220)
    val (p1, probe1) = graft.ops.Similarity.trainedParts(spark, d)
    assert(ModelCache.lastEvent("ivf", s"$d/embeddings.parquet")
      .contains("refreshed"), "a sample-stable append must take the delta path")
    val viaDelta = (rowsOf(p1.assign.select("vec_id", "cid")),
      rowsOf(p1.cents.select("cid")), rowsOf(probe1))
    ModelCache.clear()
    val (p2, probe2) = graft.ops.Similarity.trainedParts(spark, d)
    assert(ModelCache.lastEvent("ivf", s"$d/embeddings.parquet")
      .contains("trained"))
    assert(viaDelta == (rowsOf(p2.assign.select("vec_id", "cid")),
      rowsOf(p2.cents.select("cid")), rowsOf(probe2)),
      "delta-refreshed assignment/cells/probe must equal the cold retrain bit-for-bit")
  }

  test("ivf: warm-start refresh — quality parity with retrain, full coverage, cells sane") {
    // Round-15 ask #5: Lloyd seeds from the frozen centroids on append
    // (1 round instead of Iters). Centroids are NOT monoidal, so the
    // contract is QUALITY parity, not bit parity: the warm index must
    // cover the grown corpus exactly once per vector and its k-means
    // objective (intraCellCosine) must not fall materially below the
    // cold retrain's on the same corpus.
    val d = tmpDir("refresh-ivf")
    ModelCache.clear()
    def emb(i: Long): Array[Float] =
      Array.tabulate(64)(j => (((i * 31 + j * 17) % 29) - 14).toFloat / 15f)
    def write(r: Range): Unit =
      r.map(i => (i.toLong, emb(i))).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(s"$d/embeddings.parquet")
    write(0 until 400)
    graft.ops.Similarity.trainedParts(spark, d)
    assert(ModelCache.lastEvent("ivf", s"$d/embeddings.parquet")
      .contains("trained"))
    // append: n grows 400 -> 640, so k = ceil(sqrt(n)) grows 20 -> 26 —
    // the warm path must TOP UP seeds beyond the frozen centroid set
    write(400 until 640)
    val (warmParts, warmProbe) = graft.ops.Similarity.trainedParts(spark, d)
    // round-16 advice: the warm branch must be DISTINGUISHABLE from the
    // bit-parity delta branch in the lifecycle event stream — a consumer
    // needing cold-train hash parity can't treat this generation as exact
    assert(ModelCache.lastEvent("ivf", s"$d/embeddings.parquet")
      .contains("refreshed-warm"),
      "k growth must take the warm path AND record the inexact event")
    val warmAssign = warmParts.assign.select("vec_id", "cid").collect()
    assert(warmAssign.length == 640, "every vector assigned exactly once")
    assert(warmAssign.map(_.getLong(0)).distinct.length == 640)
    val warmCells = warmParts.cents.count()
    assert(warmCells >= 16 && warmCells <= 26,
      s"cell count $warmCells outside [16, k=26]")
    assert(warmProbe.count() > 0, "probe must re-derive on the warm index")
    val warmQ = graft.ops.Similarity.intraCellCosine(spark, d,
      warmParts.assign.select("vec_id", "cid"))
    ModelCache.clear()
    val (coldParts, _) = graft.ops.Similarity.trainedParts(spark, d)
    assert(ModelCache.lastEvent("ivf", s"$d/embeddings.parquet")
      .contains("trained"))
    val coldQ = graft.ops.Similarity.intraCellCosine(spark, d,
      coldParts.assign.select("vec_id", "cid"))
    assert(warmQ >= coldQ - 0.02,
      s"warm-start objective $warmQ fell materially below cold retrain $coldQ")
  }

  test("pr-base: a backfill is ABSORBED by the edge-diff blast radius (documented why-not)") {
    // pr-base deliberately carries no guard: its refresh re-derives the
    // edge set from a full filtered scan, so backfilled keys surface as
    // new edges inside the radius. Prove the claim: backfill, then the
    // delta query must still equal the full PageRank.
    val d = tmpDir("backfill-pr")
    ModelCache.clear()
    val pairsA = (0L until 20L).map(i => (i, 100L + i))
    writeTrades(d, 100L, pairsA, rep = 2)
    writeTrades(d, 10000L, Seq((90L, 190L)), rep = 2) // pins split high
    graft.SparkEntry.queries("q_pagerank_delta")(spark, d).collect()
    assert(ModelCache.lastEvent("pr-base", d).contains("trained"))
    // backfill at keys 0..3: a brand-new durable pair BELOW the split
    writeTrades(d, 0L, Seq((50L, 150L)), rep = 2)
    val viaDelta = rowsOf(graft.SparkEntry.queries("q_pagerank_delta")(spark, d))
    assert(ModelCache.lastEvent("pr-base", d).contains("refreshed"),
      "pr-base takes the refresh path even on backfill — by design")
    val full = rowsOf(graft.SparkEntry.queries("q_pagerank")(spark, d))
    assert(viaDelta == full,
      "the refreshed pr-base must absorb the backfilled edge exactly")
  }
}
