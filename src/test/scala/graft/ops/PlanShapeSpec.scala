package graft.ops

import graft.SparkSuite

/** Regression tests for the physical-plan properties the operators are
  * designed around — a wrong plan can be value-correct at test scale and
  * catastrophic at 100 TB, so the shapes are asserted, not assumed. */
class PlanShapeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString() + "\n" +
      df.queryExecution.optimizedPlan.toString()
  }

  test("q_scan_project_filter pushes the predicate into the parquet scan") {
    val p = plan("q_scan_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p.take(600))
  }

  test("q_scan_project_filter prunes to the 4 needed columns") {
    val p = plan("q_scan_project_filter")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate:timestamp>"))
  }

  test("q_join_3way broadcasts every dimension (fact side never shuffles pre-agg)") {
    val p = plan("q_join_3way")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(400))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_topk plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_group_agg uses partial (map-side) aggregation") {
    val p = plan("q_group_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("partial_"))
  }

  test("q_table_checksum is a shuffle-free global aggregate (single exchange)") {
    val p = plan("q_table_checksum")
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(400))
  }

  test("q_repetition_filter is map-side kernel work; only the presentation sort shuffles") {
    val p = plan("q_repetition_filter")
    assert(p.contains("ngramrepeat(toks") ,
      "repetition stats must come from the codegen kernel, not explode+groupBy")
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(600))
    assert(!p.contains("Generate"), "no token explode on a per-row signal")
  }

  test("q_rarity_score pre-aggregates tf before the vocabulary join (no raw stream in the join)") {
    val p = plan("q_rarity_score")
    // the token-keyed join must consume the per-doc tf aggregate, not the
    // exploded stream: partial aggregation below both groupBys
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(600))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastExchange"), "the 1-row corpus total must broadcast")
  }

  test("q_chunk_docs is one Generate over one scan; only the presentation sort shuffles") {
    val p = plan("q_chunk_docs")
    assert("Generate".r.findAllIn(p).size >= 1, "chunk fan-out is the operator's output")
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(600))
    // FileScan appears only in the physical rendering; exactly one proves
    // the oracle's self-join shape was NOT replicated (single pipeline)
    assert("FileScan".r.findAllIn(p).size == 1, "one scan, no re-scan")
  }

  test("q_similarity_topk broadcasts the query side (nested-loop over one scan)") {
    val p = plan("q_similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_incremental_since pushes the timestamp bound to the scan") {
    val p = plan("q_incremental_since")
    // events.ts arrives as long nanos; the pushed filter is on that column
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), p.take(600))
  }

  test("q_dedup_minhash computes signatures map-side; census aggregates partially") {
    val p = plan("q_dedup_minhash")
    assert(p.contains("minhashsig"), "signature must come from the codegen kernel")
    assert(p.contains("partial_min"), "census keeper must pre-aggregate map-side")
  }

  test("q_embed_near_dup joins on the banded LSH bucket, never a cartesian product") {
    val p = plan("q_embed_near_dup")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("band"), "pair join must key on (band, bucket)")
    assert(p.contains("bucket"), "pair join must key on (band, bucket)")
  }

  test("q_embed_near_dup pair population is band-bucket-bounded (OR-construction, deduped)") {
    import org.apache.spark.sql.functions._
    // Candidate pairs must be ≤ Σ_buckets C(n_b, 2) over all bands (each
    // pair counted once — dedup across bands), i.e. strictly the banded
    // LSH bound, never all-pairs. The census IS the per-bucket population.
    val census = graft.SparkEntry.queries("q_similarity_lsh")(spark, sf)
      .select(col("n")).collect().map(_.getLong(0))
    val bound = census.map(n => n * (n - 1) / 2).sum
    val nVec = graft.core.Tables.embeddings(spark, sf).count()
    val allPairs = nVec * (nVec - 1) / 2
    assert(bound < allPairs, "banding must prune the all-pairs space")
    // the scored output is a subset of the (deduped) candidate set
    val scored = graft.SparkEntry.queries("q_embed_near_dup")(spark, sf).count()
    assert(scored <= bound, s"scored=$scored exceeds banded bound=$bound")
  }

  test("q_subquery_scalar broadcasts the 1-row aggregate (fact side never shuffles pre-sort)") {
    val p = plan("q_subquery_scalar")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
    assert(p.contains("partial_sum"), "scalar aggregate should be partial+final")
  }

  test("q_exists_correlated plans as a semi join, never a cartesian") {
    val p = plan("q_exists_correlated")
    assert(p.contains("LeftSemi"), p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_topk_per_group aggregates partially before the group shuffle (bounded buffers)") {
    val p = plan("q_topk_per_group")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(600))
  }

  test("q_cube is one Expand + aggregate pass (no per-grouping re-scan)") {
    val p = plan("q_cube")
    assert(p.contains("Expand"))
    assert("Scan parquet".r.findAllIn(p).size == 1, "cube must scan the fact once")
  }

  test("q_unpivot is one Expand over a single scan (no per-measure re-scan)") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"))
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(400))
  }

  test("q_range_join broadcasts the band table (fact never shuffles pre-sort)") {
    val p = plan("q_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("q_skew_salted salts deterministically and keeps both aggregate phases partial") {
    val p = plan("q_skew_salted")
    assert(p.contains("xxhash64"), "salt must be a deterministic hash, not rand()")
    assert("partial_".r.findAllIn(p).size >= 2, p.take(600))
  }

  test("q_join_bigbig pins the fact-fact sort-merge join (the 100 TB shape)") {
    val p = plan("q_join_bigbig")
    assert(p.contains("SortMergeJoin"), p.take(400))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("q_skew_salted_join: the census decides — balanced corpus keeps the plain-join plan") {
    // round-13 ask #7: salting is no longer unconditional. At sf0.01
    // user_id is balanced (150 users, top1 ≈ 8600 ppm), so
    // autoSaltedEquiJoin must decide n = 1 and leave the join
    // untouched: no salt column, no replication. (SkewSpec pins the
    // n > 1 path on hot-key data — including this same query's key at
    // sf0.001, where 15 users IS a hot distribution.)
    val df = graft.SparkEntry.queries("q_skew_salted_join")(spark, "/root/testdata/sf0.01")
    val p = df.queryExecution.executedPlan.toString() + "\n" +
      df.queryExecution.optimizedPlan.toString()
    assert(!p.contains("__salt"), "balanced key must not pay the salt column")
    assert(!p.contains("explode"), "balanced key must not replicate the small side")
  }

  test("q_mad has no PercentileDisc row buffer: partial aggregates below every percentile") {
    val p = plan("q_mad")
    assert(!p.contains("percentile_disc"),
      "q_mad must use the bounded grid path, not the PercentileDisc buffer")
    // both bucket censuses pre-aggregate map-side (discBucketed delegates
    // to the weighted-grid form, so the census is a partial SUM of 1s)
    assert(p.contains("partial_sum"), "bucket census must pre-aggregate map-side")
  }

  test("q_quantiles has no PercentileDisc row buffer: partial aggregates below every percentile") {
    val p = plan("q_quantiles")
    assert(!p.contains("percentile_disc"),
      "q_quantiles must use the bounded grid path, not the PercentileDisc buffer")
    assert(p.contains("partial_count"), "value grid / bucket census must pre-aggregate map-side")
  }

  test("q_contamination broadcasts the eval shingle set") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_tfidf joins tf to df post-aggregation (no raw text in the join)") {
    val p = plan("q_tfidf")
    assert(p.contains("partial_count"), "tf/df must pre-aggregate map-side")
  }

  test("q_partition_checksum aggregates partially; only bucket digests cross the exchange") {
    val p = plan("q_partition_checksum")
    assert(p.contains("partial_"), p.take(600))
    // one exchange for the bucket aggregate, one for the presentation sort
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(600))
  }

  test("re-digest of changed buckets prunes the scan to those buckets (O(changed partitions))") {
    import org.apache.spark.sql.functions._
    // the incremental path: re-checksum only buckets at/after a boundary
    val li = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("2024-03-01").cast("timestamp"))
    val df = graft.streaming.CdcPipeline.partitionChecksums(
      li, date_trunc("month", col("l_shipdate")))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate,"),
      p.take(600))
  }

  test("q_neardup_pipeline: kernel signatures, no cartesian, census pre-aggregates") {
    val p = plan("q_neardup_pipeline")
    assert(p.contains("minhashsig"), "candidate generation must use the codegen kernel")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_min"), "keeper census must pre-aggregate map-side")
  }

  test("q_incremental_agg: only the delta branch rescans new rows (bound reaches the scan)") {
    val p = plan("q_incremental_agg")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(ts), LessThanOrEqual(ts,"), p.take(800))
    assert(p.contains("partial_"), "partials must pre-aggregate map-side")
  }

  test("q_range_join_binned joins on the bin hash — no broadcast of the interval side") {
    val p = plan("q_range_join_binned")
    // the band join itself must be the repartitionable equi-join (the
    // 1-row domain-clamp crossJoin is a broadcast by design)
    assert(p.contains("ShuffledHashJoin [bin"), p.take(600))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_substring_dedup digests spans map-side (no text crosses an exchange)") {
    val df = graft.SparkEntry.queries("q_substring_dedup")(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val inputs = """\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]""".r
      .findAllMatchIn(formatted).map(_.group(1)).toSeq
    assert(inputs.nonEmpty, formatted.take(400))
    inputs.foreach(i => assert(!i.split(",\\s*").exists(c =>
      c.startsWith("text#") || c.startsWith("t#")),
      s"text/token column crosses an exchange: $i"))
    assert(df.queryExecution.executedPlan.toString().contains("partial_count"),
      "span census must pre-aggregate map-side")
  }

  test("q_ann_recall: exact side broadcasts the 5 query vectors; no cartesian anywhere") {
    val p = plan("q_ann_recall")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "brute-force exact side must broadcast the query vectors over one scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("s_stream_ivf_assign is a pure map: zero exchanges, zero joins, whole-stage codegen") {
    // The streaming assign stage must stay a per-row projection — the
    // frozen model is a plan literal, so any Exchange or join appearing
    // here means the zero-shuffle ingest contract broke. Applied to a
    // batch Dataset (the transform is source-agnostic) to read the plan.
    import spark.implicits._
    val model = Similarity.frozenModel(spark, sf)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .as[graft.streaming.Stateful.VecIn]
    val df = graft.streaming.Stateful.ivfAssignStream(vecs, model)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), p.take(600))
    assert(!p.contains("Join"), p.take(600))
    // codegen spans render as *(n) in simple mode; the scan + code/dot
    // projections must be inside one. The centroid fold itself is a
    // Catalyst HOF (aggregate) — expression-interpreted by Spark design,
    // but its hot kernel (doublevecdot) is the codegen'd expression.
    assert(p.contains("*("), p.take(600))
  }

  test("q_hybrid_rrf: no cartesian; dense side is a broadcast of the query vectors") {
    val p = plan("q_hybrid_rrf")
    assert(!p.contains("CartesianProduct"))
    // the cosine scan pairs each corpus vector with the 5 broadcast
    // queries — the q_similarity_topk shape, inherited
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("q_hybrid_rrf: the lexical probe never shuffles document text") {
    val df = graft.SparkEntry.queries("q_hybrid_rrf")(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val inputs = """\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]""".r
      .findAllMatchIn(formatted).map(_.group(1)).toSeq
    assert(inputs.nonEmpty, formatted.take(400))
    inputs.foreach(i => assert(!i.contains("text#"), s"text crosses an exchange: $i"))
  }

  test("q_filtered_ann: label predicate prunes candidates before any embedding is fetched") {
    // the filtered candidate list must be strictly smaller than the cell
    // co-member list whenever labels vary inside cells — the n_pass <
    // n_cell census rows are the evidence the pre-filter engaged
    val rows = graft.SparkEntry.queries("q_filtered_ann")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(r => r.getLong(5) < r.getLong(4)),
      "at least one query's cell must contain foreign labels (else the fixture proves nothing)")
    val p = plan("q_filtered_ann")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_bm25_delta: the frozen base index is served from checkpoint, not re-tokenized") {
    // force the base artifact into the session cache, then the plan of a
    // second call must scan the localCheckpointed postings (no split/
    // explode over the base docs — only the delta tokenization remains)
    graft.SparkEntry.queries("q_bm25_delta")(spark, sf).collect()
    val p = plan("q_bm25_delta")
    assert(p.contains("Scan ExistingRDD"),
      "base postings must come from the frozen localCheckpointed artifact")
  }

  test("q_curation reads the documents text column only map-side (no text in shuffles)") {
    // The shuffle payload is the Exchange's Input row in formatted explain
    // (a substring heuristic over the tree form would false-positive on a
    // map-side Project CONSUMING text directly below the exchange).
    val df = graft.SparkEntry.queries("q_curation")(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val inputs = """\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]""".r
      .findAllMatchIn(formatted).map(_.group(1)).toSeq
    assert(inputs.nonEmpty, formatted.take(400))
    inputs.foreach(i => assert(!i.contains("text#"), s"text crosses an exchange: $i"))
  }

  test("q_core_numbers: the h-index fixpoint serves from truncated state, zero file scans past the edge checkpoint") {
    // the Q closure checkpoints the symmetric edge list ONCE before the
    // loop and every round truncates lineage (Session.truncate), so the
    // returned census plan must contain no FileScan — a file scan here
    // would mean a round re-derived edges from orders ⋈ lineitem, the
    // exact repeated-scan shape the bpe round loop was flagged for in
    // round 10
    val p = plan("q_core_numbers")
    assert("FileScan".r.findAllIn(p).isEmpty,
      "a corpus re-scan leaked into the fixpoint:\n" + p.take(800))
    assert(p.contains("Scan ExistingRDD"),
      "the census must derive from the truncated fixpoint state")
  }

  test("q_bpe_merges round loop runs over the dictionary only: zero file scans, zero corpus explodes in the result plan") {
    // The round-10 verdict's weak plan rewrote the whole corpus per merge
    // round. The re-shape collapses the corpus ONCE to a localCheckpointed
    // (word, cnt) dictionary — so the returned DF's plan (everything the
    // round loop contributes) must hold NO FileScan (the corpus pass
    // happened at checkpoint time) and NO Generate (pair explodes were
    // materialized per-round over the dictionary).
    val p = plan("q_bpe_merges")
    assert("FileScan".r.findAllIn(p).isEmpty,
      "a corpus re-scan leaked into the round loop:\n" + p.take(800))
    assert(p.contains("Scan ExistingRDD"),
      "round rows must derive from the checkpointed dictionary")
  }

  test("q_modularity serves from the frozen lp-base artifact: zero file scans in the plan") {
    // the fixpoint runs once per corpus state (ModelCache "lp-base");
    // if a FileScan creeps back into the modularity plan, the operator
    // has silently stopped serving from the frozen labels and pays the
    // whole label-prop fold per run (the IvfParts.cents replay lesson)
    graft.SparkEntry.queries("q_label_prop")(spark, sf).collect() // freeze
    val p = plan("q_modularity")
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      "modularity must join the frozen edges/labels, not rescan the corpus:\n" +
        p.take(600))
    assert(p.contains("Scan ExistingRDD"),
      "inputs must be the localCheckpointed artifact members")
  }

  test("q_recall_curve serves entirely from frozen artifacts: zero file scans") {
    // channel candidates come from the frozen assignment, scores and the
    // truth ranking from the frozen truth-base — a FileScan appearing
    // here means an eval started re-reading (and re-scoring) the corpus
    // per run, the exact recurring cost the frozen eval family removed
    graft.SparkEntry.queries("q_ann_recall")(spark, sf).collect() // freeze
    val p = plan("q_recall_curve")
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      "recall curve must join frozen tables, not rescan the corpus:\n" +
        p.take(600))
    assert(p.contains("Scan ExistingRDD"),
      "inputs must be the localCheckpointed artifact members")
  }

  test("q_attribution resolves both models in ONE window pass; no join") {
    // a self-union formulation would evaluate the window subtree once
    // per model (two sorts over the user exchange); the explode-unpivot
    // keeps it at one
    val p = plan("q_attribution")
    assert("(?m)^\\s*[+:]?-?\\s*Window ".r.findAllIn(p).size <= 2, // physical + optimized rendering
      "both attribution models must share one Window operator:\n" + p.take(800))
    assert(!p.contains("Join"), "attribution is a window scan, never a join")
    assert("Generate".r.findAllIn(p).size >= 1, "the 2-model unpivot is a bounded explode")
  }

  test("q_split_churn is a pure map over documents: no join, no window, partial agg only") {
    val p = plan("q_split_churn")
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Generate"),
      "split assignment must be per-row CASE/md5 work:\n" + p.take(600))
    assert(p.contains("partial_count") || p.contains("partial_"),
      "the transition matrix must partial-aggregate map-side")
  }

  test("q_interval_join binned self-join is an equi-join on bucket, never a cartesian") {
    val p = plan("q_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the interval join must bin to an equi-join:\n" + p.take(800))
    assert(p.contains("Scan ExistingRDD"),
      "both sides must explode from the checkpointed session table")
  }

  test("q_image_tiles gathers tile rows map-side: no aggregation, only the presentation sort shuffles") {
    // The tile reassembly is a compile-time-unrolled concat of TileH
    // substring slices — if a groupBy/collect_list creeps back in, the
    // per-tile row set starts crossing an exchange and the stateless
    // streaming twin (s_stream_tiles) silently breaks.
    val p = plan("q_image_tiles")
    assert(!p.contains("HashAggregate") && !p.contains("ObjectHashAggregate") &&
      !p.contains("SortAggregate"),
      "tile reassembly must be unrolled map-side, not aggregated:\n" + p.take(600))
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(600))
    assert("Generate".r.findAllIn(p.linesIterator.filterNot(_.contains("Arguments"))
        .mkString("\n")).size <= 2,
      "only the bounded tile-index explode may generate rows:\n" + p.take(600))
  }
  test("q_concurrency never plans a cartesian or sort-merge pair join; carries broadcast") {
    val p = plan("q_concurrency")
    assert(!p.contains("CartesianProduct"), "census must stay pair-free")
    // the hour-axis carry and sweep tables are tiny: they must ship as
    // broadcasts, never shuffle the boundary-event stream again
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(600))
  }

  test("q_watermark_plan: lateness pass bucket-partitioned; no window grows with the corpus") {
    val df = graft.SparkEntry.queries("q_watermark_plan")(spark, sf)
    df.collect() // finalize AQE so the carry-join strategy is the runtime one
    val p = df.queryExecution.executedPlan.toString() + "\n" +
      df.queryExecution.optimizedPlan.toString()
    assert(!p.contains("CartesianProduct"))
    // the per-event window must be PARTITIONED (by id bucket) — a global
    // running max would read "Window" with an empty partition spec over
    // the event stream
    assert(p.contains("windowspecdefinition(bucket"), p.take(800))
    // round-13 weak retired: the bucket-axis prefix max must NOT be an
    // unpartitioned window over the N/8192-row carry table — the only
    // unpartitioned windows order by PrefixCarry's super-bucket axis
    // (N/8192² rows) or GridPercentile's bounded grid. An unpartitioned
    // window prints its order column right after the open paren.
    assert("windowspecdefinition\\(bucket#\\d+L? ASC".r.findFirstIn(p).isEmpty,
      "prefix max over raw buckets must go through PrefixCarry")
    assert(p.contains("__sb1"), "PrefixCarry super-bucket level missing")
    // the carry join carries no forced hint; AQE must still pick
    // broadcast at this scale
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p.take(600))
  }

  test("q_audience_overlap shuffles users once; pair expansion is broadcast x tiny census") {
    val p = plan("q_audience_overlap")
    assert(!p.contains("SortMergeJoin"), "census x pairs must never co-shuffle")
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r.findAllIn(p).nonEmpty, p.take(600))
  }
  test("q_dedup_containment: no cartesian, no nested-loop — every pair join is key-equi") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("CartesianProduct"), "candidate gen must stay equi-keyed")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the shingle relation must join on keys, never loop")
  }
  test("q_rfm: no global-order window — every quartile rides GlobalRank's range partitioning") {
    // round-14 audit: ntile(4) OVER (ORDER BY …) was the last remaining
    // single-task window over a data-sized axis. The plan must show only
    // __pid-partitioned windows (GlobalRank) — an unpartitioned window
    // prints its order column right after the open paren.
    val df = graft.SparkEntry.queries("q_rfm")(spark, sf)
    val p = df.queryExecution.executedPlan.toString() + "\n" +
      df.queryExecution.optimizedPlan.toString()
    Seq("recency_us", "freq", "monetary").foreach { c =>
      assert(s"windowspecdefinition\\($c#\\d+".r.findFirstIn(p).isEmpty,
        s"quartile over $c must not be a global-order window")
    }
    assert(p.contains("windowspecdefinition(__pid"),
      "GlobalRank's partitioned rank window missing")
  }

  test("q_containment_delta census plan reads only frozen/checkpointed state — zero live corpus scans") {
    // the serve view shingles the 1/8 doc-id tail ONCE into a checkpoint
    // (containmentServe); the census plan itself must touch nothing but
    // artifact legs and that checkpoint — no parquet scan, no cartesian
    graft.core.ModelCache.clear()
    val p = plan("q_containment_delta")
    assert(!p.contains("FileScan parquet"),
      "census must serve from the artifact + the checkpointed delta slice")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_triangles_delta census plan reads only frozen/checkpointed state — zero live corpus scans") {
    // the delta legs (order-tail census, merge, new-edge enumeration) are
    // checkpointed inside triMergeOf, so the census plan itself touches
    // nothing but artifact legs and those checkpoints — the containment
    // convention; the tail scans that BUILT them carry the pushed
    // o_orderkey >= split bound at materialization time
    graft.core.ModelCache.clear()
    val p = plan("q_triangles_delta")
    assert(!p.contains("FileScan parquet"),
      "census must serve from the artifact + the checkpointed delta legs")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_basket_rules: ONE basket shuffle, pairs expand map-side (no self-join of the item relation)") {
    val p = plan("q_basket_rules")
    assert(!p.contains("SortMergeJoin"),
      "pair expansion must be the in-array transform, never a co-shuffled self-join")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode"),
      "pairs must come from the map-side array expansion")
  }

  test("q_compact_plan_delta: the only live events scan is the id-sliced delta") {
    // the frozen layout census serves history; the serve plan may scan
    // events ONLY for the delta slice, with the split pushed to parquet
    val p = plan("q_compact_plan_delta")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 1, s"serve plan must scan events at most once, saw $scans")
    assert(p.contains("GreaterThanOrEqual(event_id"),
      "the delta slice's id bound must reach the parquet scan")
  }

  test("q_chisq_drift: both window scans push the ts cutoff, prune to 2 columns, scan once") {
    val p = plan("q_chisq_drift")
    assert(p.contains("LessThanOrEqual(ts,") && p.contains("GreaterThan(ts,"),
      "both window predicates must reach the parquet scan")
    assert(p.contains("ReadSchema: struct<ts:timestamp,event_type:string>"),
      "the scan must prune to the two needed columns")
    assert(p.contains("partial_count"),
      "window counts must partial-aggregate before the exchange")
    assert("FileScan parquet".r.findAllIn(p).size <= 2,
      "totals come from ONE unpartitioned window over the O(types) census " +
        "(one plan, no separate aggregate leg re-running the event scans)")
  }

  test("q_ngram_novelty: owner census partial-aggregates; no pair join anywhere") {
    val p = plan("q_ngram_novelty")
    assert(p.contains("partial_"),
      "the distinct-shingle and owner censuses must partial-aggregate")
    assert(!p.contains("CartesianProduct"), "novelty must never form pairs")
    // the shingle relation is checkpointed once and reused by both
    // consumers (sizes + owner census) — no second corpus scan
    assert("FileScan parquet".r.findAllIn(p).size == 0,
      "serve reads the checkpointed shingle relation, not parquet twice")
  }

  test("q_novelty_delta: serve plan never re-reads the frozen corpus") {
    graft.core.ModelCache.clear()
    val p = plan("q_novelty_delta")
    // every leg is either a frozen artifact or the checkpointed live
    // slice (whose doc_id >= split pushdown happened at checkpoint
    // materialization) — the serve-time plan touches NO parquet at all,
    // the lp-base zero-live-corpus-scan rule
    assert("FileScan parquet".r.findAllIn(p).size == 0,
      "serve must read frozen artifacts + checkpointed delta legs only")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_scene_cuts / q_keyframes: frame fan-out is a Generate; windows partition by asset") {
    for (name <- Seq("q_scene_cuts", "q_keyframes")) {
      val p = plan(name)
      assert("Generate".r.findAllIn(p).size >= 1,
        s"$name: the frame explode is the operator's input")
      // the lag/running-cut windows must be keyed by asset — a global
      // (unpartitioned) window would single-partition the frame stream
      assert(!p.contains("Window [") ||
        "partitionBy|PartitioningCollection|hashpartitioning\\(asset_id".r
          .findFirstIn(p).isDefined, s"$name: windows must key on asset_id")
      assert(p.contains("hashpartitioning(asset_id"),
        s"$name: frame windows must hash-partition by asset_id")
      assert(!p.contains("SinglePartition, Window") &&
        !p.contains("Window Partition: []"),
        s"$name: no global window over the frame stream")
    }
  }
}
