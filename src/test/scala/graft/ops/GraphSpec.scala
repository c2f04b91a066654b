package graft.ops

import graft.SparkSuite

/** Graph-module invariants the oracle compare can't express: rank
  * bounds, node-space disjointness, and the distributed plan shape of
  * the iteration step. */
class GraphSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Locally-collected trading pairs with >= minRepeats orders, suppliers
    * offset to the disjoint node space — the spec-side twin of the
    * operators' durable-edge derivation. */
  private def pairsWithRepeats(minRepeats: Int): Array[(Long, Long)] = {
    import org.apache.spark.sql.functions._
    graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= minRepeats)
      .select("c", "s").collect().map(r => (r.getLong(0), 1000000L + r.getLong(1)))
  }

  test("q_pagerank ranks respect the damping floor and node kinds are disjoint") {
    val rows = graft.SparkEntry.queries("q_pagerank")(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (node, rank, kind) = (r.getLong(0), r.getLong(1), r.getString(2))
      // every node receives at least the (1-d) teleport mass: 0.15 · 1e6
      assert(rank >= 150000L, s"node $node rank $rank below damping floor")
      assert(if (node >= 1000000L) kind == "supplier" else kind == "customer")
    }
    // descending, tie-broken by node — the presentation contract
    val ranks = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(ranks.sortBy { case (r, n) => (-r, n) }.toSeq == ranks.toSeq)
  }

  test("q_pagerank iteration joins never plan a cartesian product") {
    val df = graft.SparkEntry.queries("q_pagerank")(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("q_degree_hist mass balances: sum(degree · n_nodes) = 2 · |pairs|") {
    val hist = graft.SparkEntry.queries("q_degree_hist")(spark, sf).collect()
    val edgeEnds = hist.map(r => r.getLong(1) * r.getLong(2)).sum
    val pairs = {
      import org.apache.spark.sql.functions._
      graft.core.Tables.orders(spark, sf)
        .join(graft.core.Tables.lineitem(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    }
    assert(edgeEnds == 2 * pairs,
      s"directed edge ends $edgeEnds != 2 x $pairs distinct trading pairs")
  }

  test("q_label_prop: labels are component minima and sizes cover the node set") {
    val comm = graft.SparkEntry.queries("q_label_prop")(spark, sf).collect()
    // every community is labeled by its own smallest member
    comm.foreach { r =>
      assert(r.getLong(0) == r.getLong(2),
        s"community ${r.getLong(0)} labeled by non-minimum ${r.getLong(2)}")
    }
    // sizes are positive and the listing is (n_nodes desc, community) ordered
    val keys = comm.map(r => (r.getLong(1), r.getLong(0)))
    assert(keys.forall(_._1 >= 1))
    assert(keys.sortBy { case (n, c) => (-n, c) }.toSeq == keys.toSeq)
  }

  test("q_label_prop: one propagation round never increases a node's label") {
    // monotonicity of min-label propagation, recomputed locally on the
    // strong-edge subgraph the operator declares
    val eo = pairsWithRepeats(2)
    val adj = (eo ++ eo.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var lbl = adj.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      val next = lbl.map { case (n, l) =>
        n -> math.min(l, adj(n).map(lbl).foldLeft(Long.MaxValue)(math.min))
      }
      next.foreach { case (n, l) => assert(l <= lbl(n)) }
      lbl = next
    }
    // the operator's community census equals the local recompute
    val expect = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (c, n) => assert(expect(c) == n, s"community $c size") }
  }

  test("q_components equals a driver-side union-find on the durable-trade edges") {
    // exact truth for the FULL closure: classic union-find over the same
    // ≥4-repeat-order edge list, collected locally (sf0.001 is small).
    // This is what separates q_components from q_label_prop: label_prop
    // is k-hop-bounded; components must agree with the true partition
    // regardless of diameter.
    val eo = pairsWithRepeats(4)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    eo.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.toSeq.groupBy(find)
      .map { case (root, members) =>
        // component id = minimum member, the declared convention
        assert(root == members.min)
        root -> (members.size.toLong,
          members.count(_ < 1000000L).toLong,
          members.count(_ >= 1000000L).toLong)
      }
    val got = graft.SparkEntry.queries("q_components")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == truth, s"census mismatch: got ${got.size} components, " +
      s"truth ${truth.size}")
    // presentation order: (n_nodes desc, component)
    val keys = graft.SparkEntry.queries("q_components")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(0)))
    assert(keys.sortBy { case (n, c) => (-n, c) }.toSeq == keys.toSeq)
  }

  test("q_components_delta: quotient merge over newly-durable edges equals the full closure") {
    val full = graft.SparkEntry.queries("q_components")(spark, sf).collect()
      .map(_.mkString(",")).toSeq
    val delta = graft.SparkEntry.queries("q_components_delta")(spark, sf).collect()
      .map(_.mkString(",")).toSeq
    assert(delta == full,
      "incremental components must equal the full recompute, row for row")
    // the merge path must actually run: some pairs become durable only
    // with the delta orders (counts are monoidal, so newly-durable =
    // durable(union) minus durable(base))
    import org.apache.spark.sql.functions._
    val pairs = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey").as("c"), col("l_suppkey").as("s"))
    val maxKey = pairs.agg(max(col("o_orderkey"))).head().getLong(0)
    def durable(p: org.apache.spark.sql.DataFrame) = p.groupBy("c", "s")
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 4).select("c", "s")
    val nDelta = durable(pairs)
      .exceptAll(durable(pairs.filter(col("o_orderkey") < 7L * maxKey / 8L)))
      .count()
    assert(nDelta > 0, "fixture must exercise the merge, not a no-op delta")
  }

  test("q_reach_hops equals a driver-side BFS from the hub") {
    val eo = pairsWithRepeats(4)
    val adj = (eo ++ eo.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hub = adj.keys.min
    // textbook queue BFS
    val dist = scala.collection.mutable.Map(hub -> 0L)
    val queue = scala.collection.mutable.Queue(hub)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      adj(u).foreach { v =>
        if (!dist.contains(v)) { dist(v) = dist(u) + 1; queue.enqueue(v) }
      }
    }
    val truth = dist.toSeq.groupBy(_._2).map { case (h, ns) =>
      h -> (ns.size.toLong, ns.map(_._1).min, ns.map(_._1).max)
    }
    val got = graft.SparkEntry.queries("q_reach_hops")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == truth, s"hop census mismatch: got $got")
    // hop 0 is exactly the hub
    assert(got(0L) == ((1L, hub, hub)))
  }

  test("q_butterflies: both wedge sides yield the same butterfly count (local recompute)") {
    import org.apache.spark.sql.functions._
    val eo = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 4)
      .select("c", "s").collect().map(r => (r.getLong(0), r.getLong(1)))
    def choose2(n: Long) = n * (n - 1) / 2
    def butterfliesVia(group: ((Long, Long)) => Long,
        other: ((Long, Long)) => Long): Long =
      eo.groupBy(group).values
        .flatMap(_.map(other).toSeq.sorted.combinations(2))
        .toSeq.groupBy(identity).values.map(g => choose2(g.size.toLong)).sum
    val viaSuppliers = butterfliesVia(_._2, _._1) // customer pairs / supplier
    val viaCustomers = butterfliesVia(_._1, _._2) // supplier pairs / customer
    assert(viaSuppliers == viaCustomers, "the 4-cycle count is side-symmetric")
    val r = graft.SparkEntry.queries("q_butterflies")(spark, sf).head()
    assert(r.getLong(r.fieldIndex("n_edges")) == eo.length.toLong)
    assert(r.getLong(r.fieldIndex("n_wedges_supplier")) ==
      eo.groupBy(_._2).values.map(v => choose2(v.size.toLong)).sum)
    assert(r.getLong(r.fieldIndex("n_wedges_customer")) ==
      eo.groupBy(_._1).values.map(v => choose2(v.size.toLong)).sum)
    assert(r.getLong(r.fieldIndex("n_butterflies")) == viaSuppliers,
      "operator butterfly count must equal the local recompute")
  }

  test("q_pagerank_delta: bounded recompute equals the full PageRank") {
    val full = graft.SparkEntry.queries("q_pagerank")(spark, sf).collect().toSeq
    val delta = graft.SparkEntry.queries("q_pagerank_delta")(spark, sf)
      .collect().toSeq
    assert(delta == full,
      "incremental ranks must be bit-identical to the full recomputation")
    // the warm path (frozen base already trained) is also identical
    val warm = graft.SparkEntry.queries("q_pagerank_delta")(spark, sf)
      .collect().toSeq
    assert(warm == full)
    val (nNodes, nAffected, nDeltaEdges) = Graph.pagerankDeltaStats(spark, sf)
    assert(nDeltaEdges > 0, "fixture must actually exercise the delta path")
    assert(nAffected <= nNodes)
    info(s"nodes=$nNodes affected=$nAffected deltaEdges=$nDeltaEdges")
  }

  test("q_pagerank_delta: blast radius stays inside the touched community") {
    import spark.implicits._
    // two disconnected stars: supplier 1 ⋆ customers 1..20 (orders
    // 1..20, all below the 7/8 split) and supplier 11 ⋆ customers
    // 21..40 (orders 21..40 — the last 6 are the delta). The untouched
    // community's ranks must come from the frozen base verbatim, and
    // the affected set must not leak across the component boundary.
    val dir = tmpDir("prd")
    (1L to 40L).map(k => (k, k))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    (1L to 40L).map(k => (k, if (k <= 20) 1L else 11L))
      .toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val full = graft.SparkEntry.queries("q_pagerank")(spark, dir).collect().toSeq
    val delta = graft.SparkEntry.queries("q_pagerank_delta")(spark, dir)
      .collect().toSeq
    assert(delta == full)
    val (nNodes, nAffected, nDeltaEdges) = Graph.pagerankDeltaStats(spark, dir)
    assert(nNodes == 42 && nDeltaEdges == 6,
      s"fixture shape drifted: nodes=$nNodes deltaEdges=$nDeltaEdges")
    assert(nAffected == 21,
      s"affected must be exactly the touched star (21 nodes), got $nAffected")
  }

  test("empty trade graph: components/delta/reach census to zero rows, no NPE") {
    val dir = tmpDir("ccempty")
    graft.core.Tables.orders(spark, sf).limit(0)
      .write.parquet(s"$dir/orders.parquet")
    graft.core.Tables.lineitem(spark, sf).limit(0)
      .write.parquet(s"$dir/lineitem.parquet")
    // componentsDelta's base-split probe reads max(o_orderkey), which is
    // NULL here — it must short-circuit to the empty census like its
    // siblings, not throw
    assert(graft.SparkEntry.queries("q_components_delta")(spark, dir).isEmpty)
    assert(graft.SparkEntry.queries("q_components")(spark, dir).isEmpty)
    assert(graft.SparkEntry.queries("q_reach_hops")(spark, dir).isEmpty)
    assert(graft.SparkEntry.queries("q_butterflies")(spark, dir)
      .head().getLong(3) == 0L, "butterfly census of the empty graph is 0")
  }

  /** Brute-force butterfly count of a local (c, s) pair list. */
  private def bruteButterflies(eo: Seq[(Long, Long)]): Long = {
    def choose2(n: Long) = n * (n - 1) / 2
    eo.groupBy(_._2).values
      .flatMap(_.map(_._1).toSeq.sorted.combinations(2))
      .toSeq.groupBy(identity).values.map(g => choose2(g.size.toLong)).sum
  }

  test("q_butterflies: hub-skew graph engages the block split and stays exact") {
    import spark.implicits._
    // one hub supplier trading with 200 customers AND one hub customer
    // trading with 200 suppliers — the two wedge censuses tie, so the
    // supplier side is enumerated and its hub key MUST split; two small
    // suppliers add cross-hub shared pairs so the count is non-zero
    val eo = ((1L to 200L).map(c => (c, 1L)) ++
      (2L to 200L).map(s => (1L, s)) ++
      Seq((2L, 2L), (3L, 2L), (2L, 3L), (3L, 3L))).distinct
    val df = eo.toDF("c", "s")
    // the split must actually engage: the enumerated hub key carries
    // > 1 block, and no block exceeds a small multiple of the cap
    // (hash-mod balance, not an exact quota)
    val blocks = Graph.wedgeBlocks(df).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val perKey = blocks.groupBy(_._1._1)
    val hubBlocks = perKey.map { case (_, bs) => bs.length }.max
    assert(hubBlocks > 1, "hub key must be split into multiple blocks")
    val cap = Graph.wedgeCap(eo.length.toLong,
      eo.map(_._2).distinct.length.toLong)
    assert(blocks.map(_._2).max <= 4 * cap,
      s"block population must stay near the derived cap $cap")
    val got = Graph.butterflyCensus(df).head()
    assert(got.getLong(got.fieldIndex("n_butterflies")) == bruteButterflies(eo),
      "split-path census must equal the brute-force count")
    assert(got.getLong(got.fieldIndex("n_edges")) == eo.length.toLong)
  }

  test("q_butterflies: side choice — supplier-hub graph enumerates the flat side") {
    import spark.implicits._
    // one hub supplier with 300 customers, plus 40 two-customer
    // suppliers: supplier-side wedges ≈ C(300,2), customer-side ≈ 3/key
    // — the census must route enumeration through the cheap customer
    // side, and the count must still equal brute force (side-invariance)
    val eo = ((1L to 300L).map(c => (c, 1L)) ++
      (2L to 41L).flatMap(j => Seq((j, j), (j + 1, j)))).distinct
    val df = eo.toDF("c", "s")
    // cheaper side has max degree 3 < cap → nothing splits
    val blocks = Graph.wedgeBlocks(df).collect()
    assert(blocks.map(_.getLong(2)).max <= 3,
      "flat-side enumeration must see only per-customer adjacency")
    val got = Graph.butterflyCensus(df).head()
    assert(got.getLong(got.fieldIndex("n_butterflies")) == bruteButterflies(eo))
    // transposing the graph flips the chosen side; the census transposes
    val gotT = Graph.butterflyCensus(
      df.select($"s".as("c"), $"c".as("s"))).head()
    assert(gotT.getLong(gotT.fieldIndex("n_butterflies")) ==
      got.getLong(got.fieldIndex("n_butterflies")))
    assert(gotT.getLong(gotT.fieldIndex("n_wedges_supplier")) ==
      got.getLong(got.fieldIndex("n_wedges_customer")))
  }

  /** Brute-force triangle count of the co-trading projection of a local
    * (c, s) pair list: edges between customers sharing >= 2 suppliers,
    * triangles via adjacency-set intersection (each counted 3× by edge,
    * then divided). */
  private def bruteTriangles(eo: Seq[(Long, Long)]): (Long, Long, Long) = {
    val bySupplier = eo.groupBy(_._2).values.map(_.map(_._1).distinct.sorted)
    // NB: .collect on the Map with a tuple-valued function would rebuild
    // a Map and collapse pairs by first element — keySet avoids that
    val shared = bySupplier.flatMap(_.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = (shared.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val tri3 = shared.toSeq.map { case (u, v) => (adj(u) & adj(v)).size.toLong }.sum
    (adj.size.toLong, shared.size.toLong, tri3 / 3)
  }

  test("q_triangles: hand-checkable projection — one triangle, K4-minus") {
    import spark.implicits._
    // c1..c3 all share suppliers {1, 2} (pairwise w = 2 → triangle);
    // c4 shares only supplier 1 with each (w = 1 → no edge)
    val eo = (for (c <- 1L to 3L; s <- 1L to 2L) yield (c, s)) :+ (4L, 1L)
    val got = Graph.triangleCensus(eo.toDF("c", "s")).head()
    assert(got.getLong(got.fieldIndex("n_nodes")) == 3)
    assert(got.getLong(got.fieldIndex("n_edges")) == 3)
    assert(got.getLong(got.fieldIndex("n_wedges")) == 3)
    assert(got.getLong(got.fieldIndex("n_triangles")) == 1)
    assert(got.getLong(got.fieldIndex("ccoef_ppm")) == 1000000L,
      "a complete projection has clustering coefficient 1.0")
  }

  test("q_triangles: hub-skew projection engages the block split and stays exact") {
    import spark.implicits._
    // suppliers 1 and 2 each trade with customers 1..30 → K30 projection
    // (every pair shares both) → C(30,3) = 4060 triangles; 30 filler
    // suppliers with 2 customers each (disjoint id range, single shared
    // supplier → no projection edge) pull the derived cap below the hub
    // degree so the hub keys MUST split into blocks
    val eo = (for (c <- 1L to 30L; s <- 1L to 2L) yield (c, s)) ++
      (1L to 30L).flatMap(i => Seq((100L + 2 * i, 10L + i), (101L + 2 * i, 10L + i)))
    val cap = Graph.wedgeCap(eo.length.toLong, eo.map(_._2).distinct.length.toLong)
    assert(cap < 30, s"fixture must force a split: cap $cap vs hub degree 30")
    val got = Graph.triangleCensus(eo.toDF("c", "s")).head()
    val (bn, be, bt) = bruteTriangles(eo)
    assert(got.getLong(got.fieldIndex("n_nodes")) == bn)
    assert(got.getLong(got.fieldIndex("n_edges")) == be && be == 435L)
    assert(got.getLong(got.fieldIndex("n_triangles")) == bt && bt == 4060L,
      "split-path triangle count must equal brute force on K30")
    // degree orientation bound: max out-degree <= sqrt(2m)
    val m = got.getLong(got.fieldIndex("n_edges"))
    assert(got.getLong(got.fieldIndex("max_outdeg"))
      <= math.ceil(math.sqrt(2.0 * m)).toLong)
  }

  test("q_triangles on testdata equals the brute-force local recompute") {
    val eo = pairsWithRepeats(2).map { case (c, s) => (c, s - 1000000L) }
    val (bn, be, bt) = bruteTriangles(eo.toSeq)
    val r = graft.SparkEntry.queries("q_triangles")(spark, sf).head()
    assert(r.getLong(r.fieldIndex("n_nodes")) == bn)
    assert(r.getLong(r.fieldIndex("n_edges")) == be)
    assert(r.getLong(r.fieldIndex("n_triangles")) == bt)
    val m = r.getLong(r.fieldIndex("n_edges"))
    assert(r.getLong(r.fieldIndex("max_outdeg"))
      <= math.ceil(math.sqrt(2.0 * m)).toLong,
      "degree orientation must hold its sqrt(2m) out-degree bound")
    info(s"projection nodes=$bn edges=$be triangles=$bt")
  }

  test("q_triangles: empty projection yields a zero census") {
    import spark.implicits._
    // every customer pair shares at most one supplier → no edges
    val eo = Seq((1L, 1L), (2L, 1L), (3L, 2L))
    val got = Graph.triangleCensus(eo.toDF("c", "s")).head()
    assert((0 until 6).map(got.getLong).forall(_ == 0L),
      "all census fields must be zero on an edgeless projection")
  }

  test("triDeltaCount: inclusion–exclusion on 1-, 2- and 3-new-edge triangles") {
    import spark.implicits._
    // old edges close {1,2,3} except (2,3); {4,5,6} except (4,6),(5,6);
    // nothing of {7,8,9}. New edges complete all three triangles —
    // exactly one with 1 new edge, one with 2, one with 3 — plus a
    // no-triangle new edge (1,4) to prove non-closing edges count zero.
    val oldE = Seq((1L, 2L), (1L, 3L), (4L, 5L))
    val newE = Seq((2L, 3L), (4L, 6L), (5L, 6L), (7L, 8L), (7L, 9L),
      (8L, 9L), (1L, 4L))
    val all = (oldE ++ newE).toDF("u", "v")
    val d = Graph.triDeltaCount(newE.toDF("u", "v"), all).head().getLong(0)
    assert(d == 3L,
      s"Δ must be t1 + t2 + t3 = 3 (A−W2+T3 inclusion–exclusion), got $d")
    // and with NO new edges the delta is zero even on a triangle-rich graph
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Graph.triDeltaCount(none, all).head().getLong(0) == 0L)
  }

  test("q_triangles_delta on testdata equals the full q_triangles census") {
    graft.core.ModelCache.clear()
    val full = graft.SparkEntry.queries("q_triangles")(spark, sf)
      .collect().map(_.toString).toSeq
    val delta = graft.SparkEntry.queries("q_triangles_delta")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(delta == full,
      "artifact-served incremental census must equal the full recompute")
  }

  test("q_kcore matches a local iterative-peel recompute on the corpus") {
    val rows = graft.SparkEntry.queries("q_kcore")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to 4L))
    // local truth: the same peel over the collected durable edge list
    import org.apache.spark.sql.functions._
    var edges = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 4)
      .select("c", "s").collect()
      .flatMap(r => Seq((r.getLong(0), 1000000L + r.getLong(1)),
        (1000000L + r.getLong(1), r.getLong(0)))).toSet
    rows.foreach { case (round, nNodes, nEdges, nPeeled) =>
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val e2 = edges.filter(e => keep(e._1) && keep(e._2))
      assert((nNodes, nEdges, nPeeled) ==
        ((keep.size.toLong, e2.size.toLong, (deg.size - keep.size).toLong)),
        s"round $round")
      edges = e2
    }
    // node counts never increase; once converged, stays converged
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(1) <= w(0)))
    val peels = rows.map(_._4)
    assert(!peels.zip(peels.tail).exists { case (a, b) => a == 0L && b > 0L },
      "a converged peel cannot resume")
  }

  test("kcorePeel cascades one layer per round on a path graph") {
    import spark.implicits._
    // path 1-2-3-...-8 with k=2: each round peels BOTH endpoints (deg 1),
    // shrinking the path by two — the cascade the corpus never shows
    val n = 8L
    val eo = (1L until n).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val rows = Graph.kcorePeel(eo.toDF("src", "dst"), 2, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // survivors: 8→6→4→2→0 nodes; directed edges: 14→10→6→2→0
    assert(rows.toSeq == Seq(
      (1L, 6L, 10L, 2L), (2L, 4L, 6L, 2L), (3L, 2L, 2L, 2L),
      (4L, 0L, 0L, 2L)),
      s"path peel must cascade: ${rows.toSeq}")
  }

  /** Local sequential min-degree peel — the textbook core-number
    * algorithm, an INDEPENDENT formulation from the h-index fixpoint
    * the operator runs. */
  private def localCoreNumbers(sym: Set[(Long, Long)]): Map[Long, Long] = {
    var edges = sym
    var deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var k = 1L
    while (deg.nonEmpty) {
      var peeled = deg.filter(_._2 < k).keySet
      while (peeled.nonEmpty) {
        peeled.foreach(core(_) = k - 1)
        edges = edges.filter(e => !peeled(e._1) && !peeled(e._2))
        deg = (deg.keySet -- peeled)
          .map(n => n -> edges.count(_._1 == n).toLong).toMap
        peeled = deg.filter(_._2 < k).keySet
      }
      k += 1
    }
    core.toMap
  }

  test("q_core_numbers equals a sequential min-degree peel on the corpus") {
    val census = graft.SparkEntry.queries("q_core_numbers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sym = pairsWithRepeats(4).flatMap { case (c, s) => Seq((c, s), (s, c)) }.toSet
    val truth = localCoreNumbers(sym)
    val truthCensus = truth.groupBy(_._2).map { case (core, m) =>
      (core, m.size.toLong,
        m.count(_._1 < 1000000L).toLong, m.count(_._1 >= 1000000L).toLong)
    }.toSeq.sortBy(_._1)
    assert(census.toSeq == truthCensus,
      s"h-index fixpoint census ${census.toSeq} != peel census $truthCensus")
  }

  test("core-number h-index fixpoint: exact per-node cores on a crafted graph") {
    import spark.implicits._
    // path(8) ⊎ triangle ⊎ K4: cores 1 / 2 / 3 — three strata, cascade
    // plus two cliques, hand-checkable
    val eo = (1L until 8L).map(i => (i, i + 1)) ++
      Seq((10L, 11L), (11L, 12L), (10L, 12L)) ++
      (for (a <- 20L to 23L; b <- 20L to 23L if a < b) yield (a, b))
    val sym = eo.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val (h, _) = Graph.coreNumbersWithRounds(sym.toDF("src", "dst"))
    val got = h.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = ((1L to 8L).map(_ -> 1L) ++ (10L to 12L).map(_ -> 2L) ++
      (20L to 23L).map(_ -> 3L)).toMap
    assert(got == want, s"got $got")
  }

  test("core-number fixpoint cascades past depth 4 on a long path") {
    import spark.implicits._
    // h-index convergence on a path propagates one layer per round from
    // the endpoints inward — a 16-node path needs ~7 rounds, proving the
    // loop is convergence-driven (a fixed-4-round unroll would stop
    // early with wrong interior values)
    val n = 16L
    val sym = (1L until n).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val (h, rounds) = Graph.coreNumbersWithRounds(sym.toDF("src", "dst"))
    assert(rounds > 4, s"path cascade must exceed 4 rounds, took $rounds")
    assert(h.collect().forall(_.getLong(1) == 1L), "a path is 1-degenerate")
  }

  test("q_assortativity matches a local Pearson recompute and stays inside int64 headroom") {
    val edges = pairsWithRepeats(4).flatMap(p => Seq(p, (p._2, p._1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = edges.length.toLong
    val sumD = edges.map(e => deg(e._1)).sum
    val sumDudv = edges.map(e => deg(e._1) * deg(e._2)).sum
    val sumD2 = edges.map(e => deg(e._1) * deg(e._1)).sum
    val num = m * sumDudv - sumD * sumD
    val den = m * sumD2 - sumD * sumD
    val r = graft.SparkEntry.queries("q_assortativity")(spark, sf).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((m, sumD, sumDudv, sumD2)))
    assert(r.getLong(4) == num && r.getLong(5) == den)
    assert(r.getLong(6) == (BigInt(num) * 1000000 / BigInt(den)).toLong)
    // float cross-check: the exact rational vs the textbook Pearson
    val rF = num.toDouble / den.toDouble
    assert(math.abs(r.getLong(6) / 1e6 - rF) < 1e-6)
    // the documented int64 bound: every retained term and the oracle's
    // pre-division products must clear int64 with the measured moments
    assert(BigInt(m) * BigInt(sumDudv) < BigInt(Long.MaxValue))
    assert(BigInt(sumD) * BigInt(sumD) < BigInt(Long.MaxValue))
    // bipartite hub-to-leaf trade graph: disassortative by nature
    assert(r.getLong(6) < 0, "the durable trade graph should measure r < 0")
  }

  test("q_modularity matches a local label-prop + modularity recompute (multi-community fixture)") {
    import org.apache.spark.sql.functions._
    // sf0.01: the sf0.001 strong graph collapses to ONE community, which
    // would vacuously pass — the larger corpus gives 25+ with a negative
    // global Q (the eval exposing that 3-round truncated label prop is a
    // weak community detector — that honesty is the point of the op)
    val sf01 = "/root/testdata/sf0.01"
    val edges = graft.core.Tables.orders(spark, sf01)
      .join(graft.core.Tables.lineitem(spark, sf01),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
      .select("c", "s").collect()
      .flatMap(r => Seq((r.getLong(0), 1000000L + r.getLong(1)),
        (1000000L + r.getLong(1), r.getLong(0))))
    // local 3-round min-label propagation
    val adjIn = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lbl = edges.map(_._1).distinct.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      lbl = lbl.map { case (n, l) =>
        n -> math.min(l, adjIn.getOrElse(n, Array.empty[Long])
          .map(lbl).foldLeft(Long.MaxValue)(math.min))
      }
    }
    val m = edges.length.toLong
    val degMass = edges.groupBy(e => lbl(e._1)).view.mapValues(_.size.toLong).toMap
    val intra = edges.filter(e => lbl(e._1) == lbl(e._2))
      .groupBy(e => lbl(e._1)).view.mapValues(_.size.toLong).toMap
    val num = degMass.map { case (c, dm) =>
      m * intra.getOrElse(c, 0L) - dm * dm }.sum
    val qPpm = if (num >= 0) num * 1000000L / (m * m)
               else -((-num) * 1000000L / (m * m))
    val rows = graft.SparkEntry.queries("q_modularity")(spark, sf01).collect()
    assert(rows.length > 1, "fixture must yield multiple communities")
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(1) == lbl.values.count(_ == c).toLong, s"n_nodes of $c")
      assert(r.getLong(2) == intra.getOrElse(c, 0L), s"intra of $c")
      assert(r.getLong(3) == degMass(c), s"deg_mass of $c")
      assert(r.getLong(4) == m * intra.getOrElse(c, 0L) - degMass(c) * degMass(c))
      assert(r.getLong(5) == m && r.getLong(6) == qPpm)
    }
    assert(qPpm < 0, "the truncated label prop should measure NEGATIVE here " +
      "(communities are k-hop min-label boundaries, not modularity optima)")
  }
}
