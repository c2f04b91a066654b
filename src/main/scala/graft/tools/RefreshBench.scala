package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the refresh-vs-retrain economics of the monoidal frozen
  * bases (round-11 verdict #1's "measured refresh ≪ retrain at the 10×
  * dir" criterion): replicate the corpus K× into a working dir, train
  * each base, append ONE more replica (append-only growth, higher ids —
  * exactly how new data reaches a parquet lake), then time the registry
  * access that rolls the base forward against a cleared-cache full
  * retrain on the same grown corpus.
  *
  * Usage: runMain graft.tools.RefreshBench <srcSfDir> <workDir> [k]
  * Prints one JSON line per artifact: train / refresh / retrain seconds.
  */
object RefreshBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/refresh-bench")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Session.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(table: String, keyCols: Seq[String], reps: Range): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val maxKey = base.agg(max(col(keyCols.head))).head().getLong(0) + 1L
      // one job for the whole range: replica ids via a generated column
      val reped = base
        .withColumn("__r", explode(lit(reps.toArray)))
      keyCols.foldLeft(reped) { (df, c) =>
          df.withColumn(c, col(c) + col("__r") * lit(maxKey))
        }
        .drop("__r")
        .write.mode("append").parquet(s"$work/$table.parquet")
    }

    def timed(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    // Trade-table replicas for the graph-side artifact (lp-base):
    // per-replica offsets keep node spaces DISJOINT — customers shift by
    // 10M (far above the 1e6 supplier offset), suppliers by 10k (so
    // s + 1e6 never collides with any shifted custkey) — which makes the
    // growth a LOCAL delta (a disjoint new subgraph), the case the
    // blast-radius roll-forward exists for.
    def replicateTrades(reps: Range): Unit = {
      val o = spark.read.parquet(s"$src/orders.parquet")
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val maxOrd = o.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
      o.withColumn("__r", explode(lit(reps.toArray)))
        .withColumn("o_orderkey", col("o_orderkey") + col("__r") * lit(maxOrd))
        .withColumn("o_custkey", col("o_custkey") + col("__r") * lit(10000000L))
        .drop("__r")
        .write.mode("append").parquet(s"$work/orders.parquet")
      li.withColumn("__r", explode(lit(reps.toArray)))
        .withColumn("l_orderkey", col("l_orderkey") + col("__r") * lit(maxOrd))
        .withColumn("l_suppkey", col("l_suppkey") + col("__r") * lit(10000L))
        .drop("__r")
        .write.mode("append").parquet(s"$work/lineitem.parquet")
    }

    // base state: replicas 0..k-1; growth: replica k (higher ids).
    replicate("documents", Seq("doc_id"), 0 until k)
    // events: event_id AND user_id shift per replica — growth arrives as
    // new users with fresh ids (the id-monotone ingest contract)
    replicate("events", Seq("event_id", "user_id"), 0 until k)
    replicate("embeddings", Seq("vec_id"), 0 until k)
    replicateTrades(0 until k)

    val artifacts: Seq[(String, () => Any)] = Seq(
      // ivf is the warm-start member (round-15 ask #5): refresh seeds
      // Lloyd from the frozen centroids and runs ONE round instead of
      // Iters — quality-parity contract (RefreshSpec), economics here
      "ivf" -> (() => graft.ops.Similarity.trainedParts(spark, work)),
      "dedup-base" -> (() => graft.ops.Dedup.dedupBase(spark, work)),
      "novelty-base" -> (() => graft.ops.Dedup.noveltyBase(spark, work)),
      "bm25-base" -> (() => graft.ops.LlmPipeline.bm25Base(spark, work)),
      "bpe-hist-base" -> (() => graft.ops.TextAnalysis.bpeHistBase(spark, work)),
      "lp-base" -> (() => graft.ops.Graph.lpBase(spark, work)),
      "sess-base" -> (() => graft.ops.Temporal.sessBase(spark, work)),
      "layout-base" -> (() => graft.ops.Layout.layoutBase(spark, work)),
      "containment-base" -> (() => graft.ops.Dedup.containmentBase(spark, work)),
      "tri-base" -> (() => graft.ops.Graph.triBase(spark, work)))

    val tTrain = artifacts.map { case (name, f) => name -> timed(f()) }.toMap

    replicate("documents", Seq("doc_id"), k until k + 1)
    replicate("events", Seq("event_id", "user_id"), k until k + 1)
    replicate("embeddings", Seq("vec_id"), k until k + 1)
    replicateTrades(k until k + 1)

    val tRefresh = artifacts.map { case (name, f) =>
      val t = timed(f())
      val path = if (name.contains("dedup") || name.contains("bm25") ||
        name.contains("bpe") || name.contains("containment") ||
        name.contains("novelty"))
        s"$work/documents.parquet"
      else if (name.contains("sess") || name.contains("layout"))
        s"$work/events.parquet"
      else if (name == "ivf") s"$work/embeddings.parquet"
      else work
      require(graft.core.ModelCache.lastEvent(name, path).contains("refreshed"),
        s"$name did not take the refresh path")
      name -> t
    }.toMap

    graft.core.ModelCache.clear()
    val tRetrain = artifacts.map { case (name, f) => name -> timed(f()) }.toMap

    artifacts.foreach { case (name, _) =>
      println(s"""{"artifact":"$name","k":$k,"train_sec":${fmt(tTrain(name))},"refresh_sec":${fmt(tRefresh(name))},"retrain_sec":${fmt(tRetrain(name))},"speedup":${fmt(tRetrain(name) / math.max(tRefresh(name), 1e-9))}}""")
    }

    // ivf SMALL-DELTA (round-16): the +1-replica growth above moves
    // k = ⌈√n⌉, so the main ivf row measures the WARM branch. Production
    // appends are small relative to the corpus — append ~0.5% with high
    // ids, sized to keep k and the TrainCap sample unchanged, so the
    // BIT-PARITY delta branch (centroids reused verbatim, O(delta·K)
    // assignment) is what gets timed.
    {
      graft.ops.Similarity.trainedParts(spark, work) // live generation
      val emb = spark.read.parquet(s"$work/embeddings.parquet")
      val er = emb.agg(max(col("vec_id")), count(lit(1))).head()
      val (maxV, n) = (er.getLong(0), er.getLong(1))
      val s = math.round(math.sqrt(n.toDouble))
      val kc = math.max(16L,
        if ((s - 1) * (s - 1) >= n) s - 1 else if (s * s >= n) s else s + 1)
      val room = kc * kc - n
      val want = math.min(room, math.max(1L, n / 200L))
      if (room <= 0) println(s"""{"artifact":"ivf-smalldelta","k":$k,"skipped":"n=$n sits exactly at k^2"}""")
      else {
        spark.read.parquet(s"$src/embeddings.parquet")
          .orderBy("vec_id").limit(want.toInt)
          .withColumn("vec_id",
            org.apache.spark.sql.functions.row_number().over(
              org.apache.spark.sql.expressions.Window.orderBy("vec_id"))
              .cast("long") + lit(maxV))
          .write.mode("append").parquet(s"$work/embeddings.parquet")
        val tDelta = timed(graft.ops.Similarity.trainedParts(spark, work))
        require(graft.core.ModelCache
          .lastEvent("ivf", s"$work/embeddings.parquet").contains("refreshed"),
          "small high-id append must take the refresh path")
        graft.core.ModelCache.clear()
        val tRe = timed(graft.ops.Similarity.trainedParts(spark, work))
        println(s"""{"artifact":"ivf-smalldelta","k":$k,"delta_rows":$want,"refresh_sec":${fmt(tDelta)},"retrain_sec":${fmt(tRe)},"speedup":${fmt(tRe / math.max(tDelta, 1e-9))}}""")
      }
    }

    // Round-14 ask #6: a SKEWED delta for sess-base — one replica's worth
    // of events concentrated on 1% of the existing users (hot-user
    // append), timestamps shifted past every frozen tail so the delta
    // rides the stitch path (on-time arrival), not the late-routing
    // fallback. Refresh must stay O(delta): the per-user stitch window
    // partitions by user, so 15 hot users each own one partition of
    // delta/15 rows — no single-task degeneration.
    // ts dialect follows Tables.events: ns-long in some generations of
    // the fixtures, timestamp[us] in others — shift in micros either way
    val rawEv = spark.read.parquet(s"$work/events.parquet")
    val tsIsLong =
      rawEv.schema("ts").dataType == org.apache.spark.sql.types.LongType
    def tsUs(c: org.apache.spark.sql.Column) =
      if (tsIsLong) c / lit(1000L) cast "long" else unix_micros(c)
    val evAgg = rawEv
      .agg(max(col("event_id")), max(tsUs(col("ts"))), min(tsUs(col("ts"))))
      .head()
    val shiftUs = evAgg.getLong(1) - evAgg.getLong(2) + 7200L * 1000000L
    val shiftedTs =
      if (tsIsLong) col("ts") + lit(shiftUs * 1000L)
      else timestamp_micros(unix_micros(col("ts")) + lit(shiftUs))
    spark.read.parquet(s"$src/events.parquet")
      .withColumn("event_id", col("event_id") + lit(evAgg.getLong(0) + 1L))
      .withColumn("user_id", pmod(col("user_id"), lit(15L)) + lit(1L))
      .withColumn("ts", shiftedTs)
      .write.mode("append").parquet(s"$work/events.parquet")
    val tSkew = timed(graft.ops.Temporal.sessBase(spark, work))
    require(graft.core.ModelCache.lastEvent("sess-base", s"$work/events.parquet")
      .contains("refreshed"), "hot-user append must take the refresh path")
    graft.core.ModelCache.clear()
    val tSkewRetrain = timed(graft.ops.Temporal.sessBase(spark, work))
    println(s"""{"artifact":"sess-base-hotdelta","k":$k,"refresh_sec":${fmt(tSkew)},"retrain_sec":${fmt(tSkewRetrain)},"speedup":${fmt(tSkewRetrain / math.max(tSkew, 1e-9))}}""")

    // tri-base LOCAL delta: ~0.1% of one replica's orders, keys COMPACTED
    // to a dense range just above the corpus max (an uncompacted slice
    // would span the whole src keyspace and drag the 7/8 split — and
    // therefore the refreeze slice — across a bulk of the corpus),
    // customers/suppliers unshifted so the new trades attach to the
    // replica-0 subgraph. The refreeze slice is then O(slice span) and
    // the edge-axis flood probe keeps the inclusion–exclusion branch.
    {
      import org.apache.spark.sql.expressions.Window
      // re-establish a live tri-base generation (the hot-delta leg above
      // cleared the registry) so the local append can take the MERGE path
      graft.ops.Graph.triBase(spark, work)
      val maxO = spark.read.parquet(s"$work/orders.parquet")
        .agg(max(col("o_orderkey"))).head().getLong(0)
      val oS = spark.read.parquet(s"$src/orders.parquet")
        .filter(col("o_orderkey") % 997 === 0)
      val mapDf = oS.select(col("o_orderkey").as("old_k"))
        .withColumn("new_k",
          lit(maxO) + row_number().over(Window.orderBy("old_k")))
        .localCheckpoint()
      oS.join(mapDf, col("o_orderkey") === col("old_k"))
        .withColumn("o_orderkey", col("new_k")).drop("old_k", "new_k")
        .write.mode("append").parquet(s"$work/orders.parquet")
      spark.read.parquet(s"$src/lineitem.parquet")
        .join(mapDf, col("l_orderkey") === col("old_k"))
        .withColumn("l_orderkey", col("new_k")).drop("old_k", "new_k")
        .write.mode("append").parquet(s"$work/lineitem.parquet")
      val tTriLocal = timed(graft.ops.Graph.triBase(spark, work))
      require(graft.core.ModelCache.lastEvent("tri-base", work)
        .contains("refreshed"), "local trade append must take the refresh path")
      graft.core.ModelCache.clear()
      val tTriRetrain = timed(graft.ops.Graph.triBase(spark, work))
      println(s"""{"artifact":"tri-base-localdelta","k":$k,"refresh_sec":${fmt(tTriLocal)},"retrain_sec":${fmt(tTriRetrain)},"speedup":${fmt(tTriRetrain / math.max(tTriLocal, 1e-9))}}""")
    }
    System.out.flush()
    spark.stop()
  }
}
