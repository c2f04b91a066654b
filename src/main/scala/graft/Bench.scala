package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional name filter (comma-separated) for local iteration on a
    // single regressed query; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Cluster-shaped shuffle width (round-13 ask #5): SPARK_GRAFT_SHUFFLE
    // overrides the shuffle partition count (default = cpu count) so a
    // full bench pass can run at e.g. 200 partitions — plans that look
    // flat at 32 can hide small-partition fixed costs that explode at
    // cluster widths. The driver never sets it.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus).toInt
    val spark = graft.core.Session.local(cpus.toInt, shuffle)
    // The harness captures a bounded amount of output; round-2's JSON line
    // was truncated after WARN spam filled the buffer. Log only errors.
    spark.sparkContext.setLogLevel("ERROR")
    // noop sink: executes the complete plan and materializes every output
    // column (count() would let Catalyst prune projections and sorts —
    // projection-heavy queries would measure as bare scans).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Pass 1 is WARMUP (JIT + codegen class loading + parquet footer
    // reads — ~2 s vs 0.7 s steady-state on the first query); passes 2
    // and 3 are the MEASURED samples and the reported number is the
    // per-query MIN over every successful sample (warmup included — a
    // fast warmup is still a valid sample). A failed query records -1
    // (visible in the JSON) and logs to stderr — a silently-swallowed
    // failure would read as an impossibly fast query.
    //
    // Round-6 hardening: a min-of-two is not robust to a GC/co-tenant
    // spike spanning both passes (round 5 recorded a 4.9× outlier on
    // byte-identical code). The JSON now carries a per-query SPREAD =
    // second-lowest/lowest MEASURED sample — the reproducibility of the
    // reported min — and any query whose two measured passes disagree by
    // >1.5× (or failed one) gets a RETRY pass. Warmup is excluded from
    // the spread signal: comparing against pass 1 flagged 97/110 queries
    // purely on compile cost.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def timedPass(qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])
        : Map[String, Double] = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        run(fn)
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }.toMap
    // Warmup additionally records which query FIRST trains each
    // ModelCache kind — the trigger set the train-retry pass below
    // re-runs after a cache clear (round-19 verdict #5).
    val trainTrigger = scala.collection.mutable.LinkedHashMap[
      String, (SparkSession, String) => org.apache.spark.sql.DataFrame]()
    val warm: Map[String, Double] = ordered.map { case (name, fn) =>
      val kindsBefore = graft.core.ModelCache.buildCosts.keySet
      val t0 = System.nanoTime()
      val sec =
        try { run(fn); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      if ((graft.core.ModelCache.buildCosts.keySet -- kindsBefore).nonEmpty)
        trainTrigger(name) = fn
      name -> sec
    }.toMap
    val p2 = timedPass(ordered)
    val p3 = timedPass(ordered)
    // Round-11 tightening: 30/150 queries showed spread 1.3-1.6 in the
    // round-10 session, so the retry net widens from 1.5 to 1.25 — any
    // pair of measured passes disagreeing >1.25x earns a third sample,
    // making per-query deltas in like-for-like tables signal, not noise.
    val needRetry: Set[String] = ordered.map(_._1).filter { n =>
      val ok = Seq(p2(n), p3(n)).filter(_ >= 0)
      ok.size < 2 || ok.max / ok.min > 1.25
    }.toSet
    val p4 = timedPass(ordered.filter(t => needRetry(t._1)))
    val measured: Map[String, Seq[Double]] = ordered.map { case (n, _) =>
      n -> (Seq(p2(n), p3(n)) ++ p4.get(n)).filter(_ >= 0).sorted
    }.toMap
    // A warmup-only success must NOT mask a query that fails under steady
    // state: with zero successful MEASURED samples the query is failed
    // (-1), even if warmup happened to pass. Warmup still participates as
    // a valid min when at least one measured sample succeeded.
    val results = ordered.map { case (n, _) =>
      n -> (if (measured(n).isEmpty) -1.0
            else (measured(n) ++ Seq(warm(n)).filter(_ >= 0)).min)
    }.toMap
    // spread of the reported min over measured samples: 1.0 = perfectly
    // reproduced; one lone success (or none) has no spread → -1
    val spreads = ordered.map { case (n, _) =>
      n -> (measured(n) match {
        case s if s.size >= 2 && s.head > 0 => s(1) / s.head
        case _ => -1.0
      })
    }.toMap
    // 0.1 ms precision: full-precision doubles tripled the line length and
    // contributed to the round-2 mid-JSON truncation.
    def fmt(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // ---- host-drift anchor (round-12 verdict #1; re-pinned r15) --------
    // The 2× perf gate compares totals against BASELINE numbers recorded
    // in a different host window; two byte-identical runs already measured
    // a UNIFORM 1.20–1.32× apart, so growth + drift would eventually trip
    // the gate on a non-regression. The divisor: pinned queries whose
    // closing times are frozen below; their times in THIS run come from
    // the same session, same protocol, same passes as every other number
    // in this JSON. drift = MEDIAN of per-query now/close ratios — robust
    // to a handful of genuine per-query regressions or optimizations
    // polluting the host signal (the full ratio map is emitted so an
    // outlier is also VISIBLE). The anchor list is FROZEN: optimizing one
    // of these queries requires re-pinning its close value in the same
    // commit (BASELINE.md "drift anchor").
    //
    // Round-15 re-pin (verdict #1): the 20 round-12-era anchors diverged
    // ~15% from the 200-query bulk at the r14 close — none of the delta-
    // serve or artifact-serve shapes that now dominate the tail were
    // pinned. Re-selected by scripts/pin_anchors.py from the r15 run-A
    // full map: 33 anchors stratified over 9 shape families (graph-
    // iterative, delta-serve, artifact-serve, census, relational, text,
    // temporal, dedup-similarity, cdc), top-4 reproducible (spread
    // ≤1.15) runtimes ≥0.25 s per family. Old→new mapping recorded in
    // BASELINE.md "Drift anchor re-pin (r15)".
    val anchorClose: Map[String, Double] = Map(
      "q_ann_recall" -> 0.5321, "q_bigram_lm" -> 1.2842,
      "q_bm25" -> 0.9440, "q_bm25_delta" -> 0.7982,
      "q_bpe_delta" -> 1.7070, "q_cdc_diff" -> 0.5177,
      "q_char_ngrams" -> 1.6375, "q_components" -> 2.0954,
      "q_concurrency_delta" -> 2.1667, "q_cooccur_lift" -> 1.4054,
      "q_core_numbers" -> 1.9753, "q_corr_covar" -> 2.1540,
      "q_cube" -> 1.3253, "q_dedup_sweep" -> 0.9259,
      "q_funnel_latency" -> 0.4590, "q_gap_fill" -> 0.5800,
      "q_group_agg" -> 1.5310, "q_knn_graph" -> 0.9489,
      "q_mad" -> 2.5210, "q_neardup_pipeline" -> 0.7733,
      "q_partition_checksum" -> 2.0353, "q_pq_adc_recall" -> 0.7249,
      "q_random_walk" -> 4.3861, "q_recall_curve" -> 0.3989,
      "q_rollup" -> 0.8586, "q_salsa" -> 3.9634,
      "q_sessionize" -> 0.7688, "q_sessionize_delta" -> 1.3183,
      "q_twap" -> 0.5377, "q_unpivot" -> 1.7265,
      // Round-18 re-pin: q_vocab_growth was optimized (single corpus
      // explode, ~12% wall win reproduced in two ABAB stash pairs), so
      // its frozen value scales by the PAIRED ratio 2.55/2.90 — the
      // same-window estimate, not a cross-window normalization. The
      // seven other anchors touched in round 18 (components,
      // concurrency_delta, cooccur_lift, core_numbers, random_walk,
      // salsa, sessionize_delta) measured wall-NEUTRAL in their ABAB
      // pairs (their cuts were serve-job counts / scan counts, not
      // local wall), so their pins still represent them — see
      // BASELINE.md "Drift anchor re-pin (r18)".
      "q_vocab_growth" -> 1.9931, "q_window_rank" -> 0.5065,
      "q_winsorize" -> 2.1014)
    val anchorRatios: Seq[(String, Double)] = anchorClose.toSeq
      .flatMap { case (n, c) => results.get(n).filter(_ > 0).map(n -> _ / c) }
      .sortBy(_._1)
    val drift =
      if (anchorRatios.size < anchorClose.size / 2) -1.0 // filtered run: no signal
      else {
        val sorted = anchorRatios.map(_._2).sorted
        val k = sorted.size
        if (k % 2 == 1) sorted(k / 2) else (sorted(k / 2 - 1) + sorted(k / 2)) / 2
      }
    val anchorNow = anchorRatios.map { case (n, _) => results(n) }.sum
    val anchorAtClose = anchorRatios.map { case (n, _) => anchorClose(n) }.sum
    // ---- anchor self-check (round-15 verdict #2) -----------------------
    // r14 proved the anchor instrument can silently decay ~15% from the
    // bulk it claims to represent — and the divergence was found by a
    // judge, not by the tool. Every FULL bench now validates the anchors
    // against the whole query population: take the most recent
    // bench_history entry at the same sf with a full map, compute the
    // median now/prev ratio over (a) the anchor set and (b) ALL shared
    // queries, and report drift_gap = anchor/bulk − 1. Both medians share
    // one reference run, so genuine host drift cancels and the gap
    // isolates anchor-set decay. Past |3%| (the bar BASELINE.md
    // documents) the bench prints a LOUD stderr warning naming the fix
    // (scripts/pin_anchors.py re-pin). Filtered runs skip the check —
    // no population to validate against.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val k = s.size
      if (k == 0) -1.0
      else if (k % 2 == 1) s(k / 2) else (s(k / 2 - 1) + s(k / 2)) / 2
    }
    // Round-16 advice: a single most-recent reference run lets one
    // contaminated window (the documented maiden +4.3% firing) skew
    // drift_gap for every later run until a new full line lands, and a
    // silent regex miss used to disable the check without a trace. Now:
    // the gap is computed against EACH of the last ≤3 full same-sf maps
    // and the MEDIAN per-reference gap is reported (host drift still
    // cancels within each reference; one outlier reference is outvoted),
    // and an empty reference list is LOGGED to stderr.
    def lastFullHistories(minQ: Int, take: Int): Seq[Map[String, Double]] = {
      val p = java.nio.file.Paths.get("bench_history.jsonl")
      if (!java.nio.file.Files.exists(p)) return Seq.empty
      val qre = java.util.regex.Pattern.compile("\"queries\":\\{([^}]*)\\}")
      val kvre = java.util.regex.Pattern.compile("\"(q_\\w+)\":(-?[0-9.]+)")
      scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(p)).asScala
        .reverseIterator
        .filter(_.contains("\"sf\":\"" + sfDir + "\""))
        .flatMap { line =>
          val m = qre.matcher(line)
          if (!m.find()) None
          else {
            val b = Map.newBuilder[String, Double]
            val kv = kvre.matcher(m.group(1))
            while (kv.find()) b += kv.group(1) -> kv.group(2).toDouble
            Some(b.result()).filter(_.size >= minQ)
          }
        }
        .take(take).toSeq
    }
    val (driftGap, anchorDriftPrev, bulkDriftPrev) =
      if (only.nonEmpty) (-1.0, -1.0, -1.0)
      else {
        val refs = lastFullHistories(ordered.size / 2, 3)
        if (refs.isEmpty) {
          System.err.println(
            "[bench] anchor self-check SKIPPED: no full same-sf reference " +
              "entry in bench_history.jsonl (first run, shape change, or a " +
              "parse miss) — drift_gap reads -1, not 'clean'")
          (-1.0, -1.0, -1.0)
        } else {
          val perRef = refs.flatMap { prev =>
            def ratios(names: Iterable[String]): Seq[Double] = names.toSeq
              .flatMap(n => for {
                p <- prev.get(n); c <- results.get(n); if p > 0 && c > 0
              } yield c / p)
            val a = median(ratios(anchorClose.keys))
            val b = median(ratios(ordered.map(_._1)))
            if (a <= 0 || b <= 0) None else Some((a / b - 1.0, a, b))
          }
          if (perRef.isEmpty) {
            System.err.println(
              "[bench] anchor self-check SKIPPED: reference entries share " +
                "no usable queries with this run")
            (-1.0, -1.0, -1.0)
          } else {
            // median gap across references; report the a/b pair of the
            // reference whose gap IS that median (keeps the triple coherent)
            val byGap = perRef.sortBy(_._1)
            byGap(byGap.size / 2)
          }
        }
      }
    if (driftGap != -1.0 && math.abs(driftGap) > 0.03)
      System.err.println(
        f"[bench] WARNING: anchor drift (${anchorDriftPrev}%.4f vs last full run) " +
          f"diverges ${driftGap * 100}%.1f%% from the ${ordered.size}-query bulk " +
          f"(${bulkDriftPrev}%.4f) — past the 3%% bar. The anchor set no longer " +
          "represents the population: re-pin with scripts/pin_anchors.py and " +
          "update Bench.anchorClose + BASELINE.md in the same commit.")
    // ---- cold model-train costs (round-12 verdict #2) ------------------
    // ModelCache artifacts (ivf, pq, bpe, bm25, truth bases, …) train once
    // per session — the warmup pass pays, measured passes serve warm, so
    // per-query numbers are SERVE costs. The per-kind train seconds are
    // reported as their own lines so the gate grades real costs instead
    // of crediting whichever query happened to train first.
    //
    // Round-19 MEASUREMENT FIX (verdict #5, declared in
    // OPTIMIZATION_r19.md): the r18 driver window read pq-base at 49.4 s
    // against a 2.1–2.6 s band everywhere else — a single contended
    // window distorted 100+ s of model_train_total because each kind had
    // exactly ONE sample. Kinds now get the same retry/min protocol the
    // queries get: after the measured passes, the model cache is cleared
    // and the trigger queries recorded at warmup re-run once, giving
    // every kind a second independent build sample; "model_train" is the
    // per-kind MIN. The retry sample runs on a warm JVM, so the min
    // typically reads the JIT-warm build cost — the same bias the
    // per-query min already carries by protocol. The first-window
    // (pre-r19 semantics) numbers are KEPT: "model_train_first" in the
    // full map / history line, "model_train_first_total" in the
    // headline. Timed query passes are untouched.
    val trainFirstCosts = graft.core.ModelCache.buildCosts
    val trainRetryCosts: Map[String, Double] =
      if (trainTrigger.isEmpty) Map.empty
      else {
        graft.core.ModelCache.clear()
        trainTrigger.foreach { case (n, fn) =>
          try run(fn)
          catch {
            case e: Throwable => System.err.println(
              s"[bench] train-retry trigger $n FAILED: ${e.getMessage}")
          }
        }
        graft.core.ModelCache.buildCosts
      }
    val trainFirst = trainFirstCosts.toSeq.sortBy(_._1)
    val trainCosts = trainFirstCosts.keys.toSeq.sorted.map { k =>
      k -> math.min(trainFirstCosts(k),
        trainRetryCosts.getOrElse(k, Double.MaxValue))
    }
    val trainFirstTotal = trainFirst.map(_._2).sum
    val trainTotal = trainCosts.map(_._2).sum
    // The harness keeps only the TAIL of stdout (~2,000 chars); at 100+
    // queries the full per-query map alone exceeds that, so rounds 1-3 all
    // lost the headline to mid-line truncation. Emit the full map FIRST
    // (for humans / archives, and duplicated to a file), and END with one
    // bounded headline line — slowest 20 queries only, ~700 chars — that is
    // always fully inside the capture tail.
    val all = results.toSeq.sortBy(_._1)
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(all)},"spread":${jmap(spreads.toSeq.sortBy(_._1))},"drift":${fmt(drift)},"drift_gap":${fmt(driftGap)},"anchor_drift_prev":${fmt(anchorDriftPrev)},"bulk_drift_prev":${fmt(bulkDriftPrev)},"anchor_now":${fmt(anchorNow)},"anchor_close":${fmt(anchorAtClose)},"anchor_ratios":${jmap(anchorRatios)},"model_train":${jmap(trainCosts)},"model_train_total":${fmt(trainTotal)},"model_train_first":${jmap(trainFirst)},"model_train_first_total":${fmt(trainFirstTotal)},"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_queries.json"), fullLine)
    catch { case e: Throwable => System.err.println(s"[bench] file dump failed: ${e.getMessage}") }
    // Round-11 judge ask #6: bench_queries.json is overwritten per run, so
    // a round's full per-query map only survived if it happened to be the
    // last run before commit. Append every run (timestamped, sf-tagged) to
    // a history log that IS committed — any future round can diff any
    // query rN → rN+1 from repo artifacts alone, regardless of how many
    // local iterations overwrote the snapshot file.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_history.jsonl"),
      s"""{"ts":"${java.time.Instant.now()}","line":$fullLine}\n""",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Throwable => System.err.println(s"[bench] history append failed: ${e.getMessage}") }
    println(fullLine)
    val slowest = results.toSeq.sortBy(-_._2).take(20)
    // failures record -1 and would sort LAST — invisible in the only line
    // guaranteed to survive stdout-tail truncation. Surface them
    // explicitly: a count plus the failed names, always in the headline.
    val failed = results.toSeq.filter(_._2 < 0).map(_._1).sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // loose-spread queries (min reproduced worse than 1.5×) — the noise
    // flags the driver gate should consult before calling a regression
    val loose = spreads.toSeq.filter(_._2 > 1.5).sortBy(-_._2).take(10)
    val spreadMax = spreads.values.filter(_ > 0).maxOption.getOrElse(-1.0)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(slowest)},"sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"n_retried":${needRetry.size},"spread_max":${fmt(spreadMax)},"spread_gt15":${jmap(loose)},"drift":${fmt(drift)},"drift_gap":${fmt(driftGap)},"total_drift_adj":${fmt(if (drift > 0) total / drift else -1.0)},"model_train":${jmap(trainCosts)},"model_train_total":${fmt(trainTotal)},"model_train_first_total":${fmt(trainFirstTotal)},"queries_shown":"slowest20","full_map":"bench_queries.json"}""")
    System.out.flush()
    spark.stop()
  }
}
