package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Graph analytics over a derived trade graph (north-star breadth: the
  * dedup family already ships transitive closure / connected components
  * via pointer jumping, Dedup.scala; this module adds iterative rank
  * propagation and degree profiling on an explicit edge list).
  *
  * The graph: customers and suppliers are nodes (supplier ids offset to
  * a disjoint range), one undirected edge per distinct (customer,
  * supplier) trading pair from orders ⋈ lineitem — stored as two
  * directed edges, so every node has out-degree ≥ 1 and the rank
  * recursion has no dangling-node term.
  *
  * All rank arithmetic is EXACT-INTEGER (ranks are scaled by 1e6; the
  * damping step is ·85 then integer-div 100; contributions floor-divide
  * by out-degree), so Spark and DuckDB agree bit-for-bit — the same
  * cross-engine determinism recipe as the k-means/PQ oracles, with the
  * DuckDB side as fully unrolled CTE iterations. */
object Graph {

  private val Iters = 3
  private val SuppOffset = 1000000L

  /** ONE depth bound for q_reach_hops, used by BOTH engines: the Spark
    * BFS aborts loudly past it, and the oracle's recursive closure stops
    * expanding at the same depth — a single constant, so raising it can
    * never turn the loud abort into a silent cross-engine mismatch on a
    * diameter ≥ bound graph. */
  private val MaxHops = 64

  /** Shared edge-list SQL: `eo` = distinct trading pairs, `e` = the
    * symmetric directed edge list, `deg` = out-degrees. */
  private val edgeCtesSql =
    s"""eo AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT c AS src, $SuppOffset + s AS dst FROM eo
       |      UNION ALL SELECT $SuppOffset + s AS src, c AS dst FROM eo),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)""".stripMargin

  private def edgesOf(s: org.apache.spark.sql.SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    // the orders ⋈ lineitem pair derivation feeds BOTH union branches of
    // e AND (through e) deg AND the per-round join — materialize the
    // distinct pair list once instead of re-running the fact join 4×
    val eo = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .localCheckpoint()
    val e = eo.select(col("c").as("src"), (col("s") + SuppOffset).as("dst"))
      .unionAll(eo.select((col("s") + SuppOffset).as("src"), col("c").as("dst")))
    (e, e.groupBy("src").agg(count(lit(1)).as("d")))
  }

  /** PageRank, `Iters` unrolled rounds, exact-integer: r0 = 1e6 for every
    * node; r_{i+1}(v) = 150000 + (85 · Σ_{u→v} (r_i(u) div deg(u))) div 100.
    *
    * Scale shape: each round is one (edge ⋈ rank) shuffle on src plus one
    * partial-aggregating shuffle on dst — the textbook distributed
    * PageRank step, no driver-side state, no window. The edge list and
    * degree table are built once; rounds reuse them. Top 25 nodes keep
    * the output bounded (a full rank table is the non-presentation form).
    * Reference has no graph surface; this is north-star breadth. */
  /** The unrolled exact-integer PageRank closure — shared verbatim by
    * q_pagerank and q_pagerank_delta: the oracle for BOTH is the full
    * recomputation over the complete current edge list, which is exactly
    * the claim the incremental variant must live up to (the same
    * oracle-sharing convention as componentsClosureSql). */
  private lazy val pagerankSql: String =
    s"""WITH $edgeCtesSql,
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
       |${(1 to Iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
         |  CAST(150000 + (85 * SUM(r.r // deg.d)) // 100 AS BIGINT) AS r
         |  FROM e JOIN deg ON deg.src = e.src
         |  JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")}
       |SELECT node, r AS rank_scaled,
       |  CASE WHEN node >= $SuppOffset THEN 'supplier' ELSE 'customer' END AS kind
       |FROM r$Iters ORDER BY rank_scaled DESC, node LIMIT 25""".stripMargin

  val pagerank: Q = Q("q_pagerank", pagerankSql) { (s, d) =>
    val (e, deg0) = edgesOf(s, d)
    // Round-18: checkpoint the degree table once — it feeds BOTH the
    // ed join and r0, which previously each re-ran the union+aggregate
    // over the cached pair list. ed itself checkpoints lazily: its first
    // consumer is the single round-1 join, which materializes it; later
    // rounds read the cache (guide §2.4).
    val deg = deg0.localCheckpoint()
    val ed = e.join(deg, "src").localCheckpoint(false)
    val r0 = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    val rFinal = (1 to Iters).foldLeft(r0) { case (r, _) =>
      ed.join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div d").as("contrib"))
        .groupBy("dst")
        .agg((lit(150000L) + expr("(85 * sum(contrib)) div 100")).as("r"))
        .select(col("dst").as("node"), col("r"))
    }
    rFinal
      .select(col("node"), col("r").as("rank_scaled"),
        when(col("node") >= SuppOffset, "supplier").otherwise("customer").as("kind"))
      .orderBy(col("rank_scaled").desc, col("node"))
      .limit(25)
  }

  /** Degree distribution of the trade graph: how many nodes have k
    * trading partners, per node kind — the profiling query that sizes
    * every downstream graph job (a heavy-hitter degree means a skewed
    * join; q_skew_salted is the mitigation). One edge aggregation, one
    * tiny re-aggregation. */
  val degreeHist: Q = Q(
    "q_degree_hist",
    s"""WITH $edgeCtesSql
       |SELECT CASE WHEN src >= $SuppOffset THEN 'supplier' ELSE 'customer' END AS kind,
       |  d AS degree, count(*) AS n_nodes
       |FROM deg GROUP BY 1, 2 ORDER BY kind, degree""".stripMargin
  ) { (s, d) =>
    val (_, deg) = edgesOf(s, d)
    deg
      .groupBy(
        when(col("src") >= SuppOffset, "supplier").otherwise("customer").as("kind"),
        col("d").as("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("kind", "degree")
  }

  /** Community detection by min-label propagation, `Iters` unrolled
    * rounds: l0(v) = v; l_{i+1}(v) = min(l_i(v), min over in-neighbors
    * l_i(u)). After k rounds every node carries the smallest node id
    * within k hops — the k-bounded prefix of connected components, fully
    * deterministic (min is order-free, no float, no tie-break needed).
    *
    * Runs on the STRONG-edge subgraph (trading pairs with ≥ 2 orders):
    * community detection on a one-off-interaction graph floods to a
    * single giant component within a hop or two, so the standard move is
    * to drop noise edges first — the repeat-trade filter is one HAVING
    * on the pair census the edge derivation already performs.
    *
    * Scale shape: identical to a PageRank round — one (edge ⋈ label)
    * shuffle on src, one min-aggregating shuffle on dst (min is
    * partial-aggregable, so the map side collapses before the exchange),
    * plus a union with the node's own label so isolated-in-round nodes
    * keep theirs. Dedup's pointer-jumping closure (Dedup.scala) converges
    * in O(log diameter) rounds when FULL components are needed; this is
    * the fixed-round streaming-friendly variant profiled here as the
    * community-size census. */
  /** The label-propagation CTE chain (strong-edge subgraph + `Iters`
    * min-label rounds ending at `l$Iters`), shared verbatim by
    * q_label_prop and q_modularity so the communities the two operators
    * see are identical BY CONSTRUCTION, not by parallel maintenance.
    * The round CTEs are AS MATERIALIZED (the q_kcore convention — the
    * SQL twin of the Spark side's localCheckpoint): each l_i is
    * referenced twice per round (join + union) and l$Iters up to three
    * more times downstream, so the inlined form re-expands
    * multiplicatively — q_modularity's first 10× oracle run was killed
    * at 54 GB / 2 CPU-hours; materialized it runs in seconds. */
  private val lpCtesSql: String =
    s"""eo AS MATERIALIZED (SELECT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT c AS src, $SuppOffset + s AS dst FROM eo
       |      UNION ALL SELECT $SuppOffset + s AS src, c AS dst FROM eo),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |l0 AS MATERIALIZED (SELECT src AS node, src AS lbl FROM deg),
       |${(1 to Iters).map { i =>
      s"""l$i AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM (
         |  SELECT e.dst AS node, l.lbl FROM e
         |  JOIN l${i - 1} l ON l.node = e.src
         |  UNION ALL SELECT node, lbl FROM l${i - 1}) GROUP BY node)""".stripMargin
    }.mkString(",\n")}""".stripMargin

  /** The same chain on the Spark side: (directed edges, final node→lbl
    * table), both localCheckpointed — the labels feed three downstream
    * references in q_modularity and the fold must run once. Frozen as a
    * ModelCache artifact ("lp-base", the pr-base/cc-base convention) so
    * q_label_prop and q_modularity share ONE fixpoint run per corpus
    * state, with an incremental REFREEZE (the 8th refresh-family member,
    * see below) rolling the rounds forward on append-only growth. */
  private def lpLabels(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (_, _, ed, _, _, lf) = lpBase(s, d)
    (ed, lf)
  }

  private def lpPairs(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey").as("c"), col("l_suppkey").as("s"))

  private def lpEdgesOf(eo: DataFrame): DataFrame =
    eo.select(col("c").as("src"), (col("s") + SuppOffset).as("dst"))
      .unionAll(eo.select((col("s") + SuppOffset).as("src"), col("c").as("dst")))

  /** Full train: (max orderkey, pair census, edges, l1, l2, l`Iters`) —
    * per-round label tables retained because the refresh's bounded
    * recompute needs boundary values at every depth (the pr-base
    * argument, with min in place of the rank sum). */
  private def lpTrain(s: SparkSession, d: String)
      : (Long, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val pairs = lpPairs(s, d)
    val maxRow = pairs.agg(max(col("o_orderkey"))).head()
    val max0 = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val cen = pairs.groupBy("c", "s").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val ed = lpEdgesOf(cen.filter(col("cnt") >= 2).select("c", "s"))
      .localCheckpoint()
    var l = ed.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    val rounds = Seq.newBuilder[DataFrame]
    for (_ <- 1 to Iters) {
      l = ed.join(l.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("lbl"))
        .unionAll(l)
        .groupBy("node")
        .agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      rounds += l
    }
    val Seq(l1, l2, lf) = rounds.result()
    (max0, cen, ed, l1, l2, lf)
  }

  /** lp-base with incremental refreeze — the 8th refresh-family member.
    * Min-label rounds admit the SAME blast-radius exactness argument as
    * pr-base (l_i(v) depends only on v's i-hop in-neighborhood; edges
    * only appear, because the pair census is a count monoid and the
    * cnt ≥ 2 gate is monotone under growth), and min makes the merge
    * even cleaner than ranks: labels only DECREASE, and only inside the
    * radius of newly-strong pairs. Refresh: merge the monoidal census
    * with the delta slice (old corpus never re-read), re-derive strong
    * edges, expand the new-edge endpoints `Iters` hops with the per-hop
    * flood probe (uniform corpora flood → full retrain, the documented
    * worst case), then per round recompute ONLY edges into the radius,
    * sources outside it reading their frozen round-(i−1) label; outside
    * nodes keep frozen labels verbatim. RefreshSpec pins
    * refresh == retrain on a bounded-radius fixture. */
  private[graft] def lpBase(s: SparkSession, d: String)
      : (Long, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) =
    graft.core.ModelCache.getOrRefreshGuarded(s, "lp-base", d) {
      lpTrain(s, d)
    } { case ((max0, cen0, ed0, b1, b2, bf), newFiles) =>
      // Backfill guard (round-15 verdict #1): the delta census below
      // filters BOTH join sides to keys > max0, so an appended file
      // carrying an order key (or a lineitem of an old order) at or
      // below the frozen high-water is invisible to it — decline the
      // merge, ModelCache retrains. Both tables are probed because a new
      // lineitem under an OLD orderkey changes the pair census exactly
      // like a backfilled order does.
      if (tradeBackfilled(s, newFiles, max0 + 1)) None
      else Some {
      // the delta census never touches the old corpus: both scan sides
      // carry the key predicate (parquet row-group pruning skips the
      // base slice) and only the DELTA rows meet in the join — without
      // this the refresh paid a full orders ⋈ lineitem pass just to
      // advance the split, which RefreshBench measured at ~80% of the
      // retrain it was supposed to beat. Key-aligned arrival (an order
      // and its lineitems land in the same slice) is the delta family's
      // stated corpus contract (cc-base/pr-base rely on it identically).
      val maxRow = T.orders(s, d).agg(max(col("o_orderkey"))).head()
      val max1 = math.max(if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0), max0)
      val cenD = T.orders(s, d).filter(col("o_orderkey") > max0)
        .join(T.lineitem(s, d).filter(col("l_orderkey") > max0),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      // Roll census and edges forward with DELTA-SIZED writes only (the
      // sess-base lesson, which RefreshBench caught here at the 40×
      // corpus: the old full re-agg + full-census/full-edge checkpoints
      // made refresh cost scale with the BASE). A pair's count can only
      // change if the delta touched its key, and edges only APPEAR
      // (cnt ≥ 2 is monotone under growth): merge counts for delta keys
      // alone (base counts fetched by broadcast key lookup — a scan of
      // the frozen census blocks, never a base-sized shuffle or write),
      // keep every other stored row verbatim behind a lazy anti-join,
      // and append only the newly-strong pairs' edges. flattenWide
      // bounds the stored unions' depth across generations.
      val dKeys = broadcast(cenD.select("c", "s"))
      val oldD = cen0.join(dKeys, Seq("c", "s"), "left_semi")
      val mergedD = cenD.unionAll(oldD)
        .groupBy("c", "s").agg(sum(col("cnt")).as("cnt"))
        .localCheckpoint()
      val cen1 = graft.core.Session.flattenWide(
        cen0.join(dKeys, Seq("c", "s"), "left_anti").unionAll(mergedD))
      val newEo = mergedD.filter(col("cnt") >= 2).select("c", "s")
        .exceptAll(oldD.filter(col("cnt") >= 2).select("c", "s"))
        .localCheckpoint()
      val ed1 = graft.core.Session.flattenWide(
        ed0.unionAll(lpEdgesOf(newEo)))
      var affected = newEo.select(col("c").as("node"))
        .unionAll(newEo.select((col("s") + SuppOffset).as("node")))
        .distinct().localCheckpoint()
      val nNodes = ed1.select("src").distinct().count()
      var flooded = 2L * affected.count() > nNodes
      var hops = 0
      while (!flooded && hops < Iters) {
        affected = graft.core.Session.truncate(
          affected.unionAll(
              ed1.join(affected.withColumnRenamed("node", "src"), "src")
                .select(col("dst").as("node")))
            .distinct(), eager = false) // count() probe below materializes
        hops += 1
        flooded = 2L * affected.count() > nNodes
      }
      if (flooded) lpTrain(s, d)
      else {
        val baseRs = Seq(b1, b2, bf)
        var lDelta: DataFrame = null
        val merged = Seq.newBuilder[DataFrame]
        for (i <- 1 to Iters) {
          val inE = ed1.join(affected.withColumnRenamed("node", "dst"), "dst")
          // neighbor term: the source's round-(i−1) label — delta overlay
          // wins, frozen fills the rest; round 0 is the identity labeling
          val nbr =
            if (i == 1) inE.select(col("dst").as("node"), col("src").as("lbl"))
            else inE
              .join(lDelta.select(col("node").as("src"), col("lbl").as("ld")),
                Seq("src"), "left")
              .join(baseRs(i - 2).select(col("node").as("src"), col("lbl").as("lb")),
                Seq("src"), "left")
              .select(col("dst").as("node"),
                coalesce(col("ld"), col("lb"), col("src")).as("lbl"))
          // own term: every affected node keeps its round-(i−1) label even
          // with no in-edge in the radius (the union-with-own in the full
          // round), including brand-new nodes (round 0 = own id)
          val own =
            if (i == 1) affected.select(col("node"), col("node").as("lbl"))
            else affected
              .join(lDelta.select(col("node"), col("lbl").as("ld")),
                Seq("node"), "left")
              .join(baseRs(i - 2).select(col("node"), col("lbl").as("lb")),
                Seq("node"), "left")
              .select(col("node"),
                coalesce(col("ld"), col("lb"), col("node")).as("lbl"))
          lDelta = graft.core.Session.truncate(
            nbr.unionAll(own).groupBy("node").agg(min(col("lbl")).as("lbl")))
          // lDelta is already truncated; keep the stored round LAZY
          // (anti-join over the frozen base leg ∪ the delta labels) —
          // checkpointing the full label table per round per refresh was
          // the third O(base)-write term
          merged += graft.core.Session.flattenWide(
            baseRs(i - 1).join(affected, Seq("node"), "left_anti")
              .unionAll(lDelta))
        }
        val Seq(m1, m2, mf) = merged.result()
        (max1, cen1, ed1, m1, m2, mf)
      }
      }
    }

  /** Shared backfill probe for the trade-graph bases (lp/cc/tri): true
    * when any appended orders file carries o_orderkey, or any appended
    * lineitem file carries l_orderkey, below `split` — the frozen prefix
    * their [key-sliced] delta censuses never rescan. pr-base needs NO
    * guard: its refresh re-derives the edge set from a full filtered
    * scan of the current corpus and seeds the blast radius from the
    * edge DIFF against the frozen base, so backfilled keys surface as
    * new edges and are recomputed inside the radius (or flood to a full
    * retrain) — correct either way by the same argument as any other
    * delta. */
  private def tradeBackfilled(s: SparkSession, newFiles: Seq[String],
      split: Long): Boolean =
    graft.core.Backfill.below(s,
      graft.core.Backfill.tableFiles(newFiles, "orders"), "o_orderkey", split) ||
    graft.core.Backfill.below(s,
      graft.core.Backfill.tableFiles(newFiles, "lineitem"), "l_orderkey", split)

  val labelProp: Q = Q(
    "q_label_prop",
    s"""WITH $lpCtesSql
       |SELECT lbl AS community, count(*) AS n_nodes,
       |  CAST(min(node) AS BIGINT) AS min_node,
       |  CAST(max(node) AS BIGINT) AS max_node
       |FROM l$Iters GROUP BY lbl
       |ORDER BY n_nodes DESC, community LIMIT 25""".stripMargin
  ) { (s, d) =>
    val (_, lFinal) = lpLabels(s, d)
    lFinal
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_node"),
        max(col("node")).as("max_node"))
      .orderBy(col("n_nodes").desc, col("community"))
      .limit(25)
  }

  /** Modularity of the label-propagation communities — the quality eval
    * the clustering family lacked: community detection without a quality
    * number is unfalsifiable, and modularity is THE standard one
    * (fraction of edges inside communities minus the fraction a
    * degree-preserving random graph would put there). Computed
    * EXACT-INTEGER: with M the directed edge count, a_c the directed
    * intra-community edge count and d_c the community's degree mass,
    * M²·Q = Σ_c (M·a_c − d_c²) — every term a BIGINT, so both engines
    * agree bit-for-bit and the only division is the final ppm rendering
    * (truncation-toward-zero spelled as an explicit CASE in BOTH
    * dialects, because Spark's `div` truncates while DuckDB's `//`
    * floors — they differ exactly on the negative-Q case this eval
    * exists to catch). Communities and graph come from the SHARED
    * lpCtesSql/lpLabels chain, so this grades exactly what q_label_prop
    * reports. Output: the top-25 communities (the q_label_prop
    * presentation) with their exact census and contribution numerator,
    * plus the GLOBAL (all-community) modularity ppm repeated per row —
    * the dq_audit convention for global context columns.
    *
    * Scale shape: labels join the edge list twice (src, dst) — the same
    * two shuffles a PageRank round pays, on keys the fixpoint already
    * shuffled on — then everything is partial-aggregated censuses:
    * O(communities) rows into the final window-free arithmetic. The
    * BIGINT headroom is census-checked by spec (M²·1e6 < 2^63 up to
    * ~3·10^6 directed edges per corpus; past that the ppm rendering
    * moves to DECIMAL(38), the numerators stay BIGINT-exact far longer). */
  val modularity: Q = Q(
    "q_modularity",
    s"""WITH $lpCtesSql,
       |lbl AS (SELECT node, lbl FROM l$Iters),
       |el AS (SELECT ls.lbl AS cs, ld.lbl AS cd FROM e
       |  JOIN lbl ls ON ls.node = e.src
       |  JOIN lbl ld ON ld.node = e.dst),
       |per AS (SELECT cs AS community,
       |    CAST(count(*) AS BIGINT) AS deg_mass,
       |    CAST(sum(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS BIGINT) AS intra
       |  FROM el GROUP BY cs),
       |nn AS (SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM lbl GROUP BY lbl),
       |contrib AS (SELECT p.community, p.deg_mass, p.intra,
       |    g.m * p.intra - p.deg_mass * p.deg_mass AS contrib_num
       |  FROM per p CROSS JOIN (SELECT CAST(sum(deg_mass) AS BIGINT) AS m
       |                         FROM per) g),
       |q AS (SELECT
       |    (SELECT CAST(sum(deg_mass) AS BIGINT) FROM per) AS m,
       |    CAST(sum(contrib_num) AS BIGINT) AS num
       |  FROM contrib)
       |SELECT c.community, n.n_nodes, c.intra, c.deg_mass, c.contrib_num,
       |  q.m AS m_directed,
       |  CASE WHEN q.num >= 0 THEN q.num * 1000000 // (q.m * q.m)
       |       ELSE -((-q.num) * 1000000 // (q.m * q.m)) END AS q_ppm
       |FROM contrib c JOIN nn n USING (community) CROSS JOIN q
       |ORDER BY n.n_nodes DESC, c.community LIMIT 25""".stripMargin
  ) { (s, d) =>
    val (ed, lFinal) = lpLabels(s, d)
    val el = ed
      .join(lFinal.select(col("node").as("src"), col("lbl").as("cs")), "src")
      .join(lFinal.select(col("node").as("dst"), col("lbl").as("cd")), "dst")
      .select("cs", "cd")
    val per = el.groupBy(col("cs").as("community"))
      .agg(count(lit(1)).as("deg_mass"),
        sum(when(col("cs") === col("cd"), 1L).otherwise(0L)).as("intra"))
      .localCheckpoint() // referenced by the global census AND the rows
    val nn = lFinal.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
    val m = per.agg(sum(col("deg_mass")).as("m"))
    val contrib = per.crossJoin(broadcast(m))
      .withColumn("contrib_num",
        col("m") * col("intra") - col("deg_mass") * col("deg_mass"))
    val q = contrib.agg(max(col("m")).as("m"),
      sum(col("contrib_num")).as("num"))
      .select(col("m"),
        when(col("num") >= 0, expr("num * 1000000 div (m * m)"))
          .otherwise(-expr("(-num) * 1000000 div (m * m)")).as("q_ppm"))
    contrib.drop("m").join(nn, Seq("community"))
      .crossJoin(broadcast(q))
      .select(col("community"), col("n_nodes"), col("intra"), col("deg_mass"),
        col("contrib_num"), col("m").as("m_directed"), col("q_ppm"))
      .orderBy(col("n_nodes").desc, col("community"))
      .limit(25)
  }

  /** Durable-trade subgraph: trading pairs with >= MinRepeats repeat
    * orders. Shared by q_components / q_reach_hops / q_butterflies —
    * one derivation, one gate constant, in BOTH dialects. */
  private val MinRepeats = 4

  private val durableEoSql =
    s"""eo AS (SELECT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2 HAVING count(*) >= $MinRepeats)""".stripMargin

  private val durableESql =
    s"""e AS (SELECT c AS src, $SuppOffset + s AS dst FROM eo
       |      UNION ALL SELECT $SuppOffset + s AS src, c AS dst FROM eo)""".stripMargin

  /** Distinct durable (customer, supplier) pairs. */
  private[graft] def durablePairs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= MinRepeats)
      .select("c", "s")

  /** Symmetric directed edge list over the disjoint node spaces. */
  private[graft] def symmetricEdges(eo: DataFrame): DataFrame =
    eo.select(col("c").as("src"), (col("s") + SuppOffset).as("dst"))
      .unionAll(eo.select((col("s") + SuppOffset).as("src"), col("c").as("dst")))

  /** FULL connected components of the durable-trade graph — the exact
    * closure q_label_prop deliberately truncates at k hops. Runs on the
    * ≥4-repeat-order subgraph (durable trading relationships): at gate
    * scale that graph has real multi-component structure, where the ≥2
    * graph floods into one giant component and the census is a single
    * row. Component id = the component's minimum node id — deterministic,
    * no tie-break, same convention as the dedup clusters.
    *
    * Spark side is min-label propagation PLUS pointer jumping per round
    * (label := min(label, labels of in-neighbors), then label := label's
    * label): jumping halves label-chain depth each round, so convergence
    * is O(log diameter) rounds, not O(diameter) — the same fixpoint
    * shape as Dedup.rootsOf, generalized from a keeper forest to an
    * arbitrary undirected graph. Each round is one edge⋈label shuffle +
    * one partial-aggregating min shuffle + one label⋈label self-join; the
    * driver probes a 1-row monotone convergence aggregate (labels only
    * decrease, so an unchanged sum IS the fixpoint — and at the fixpoint
    * every label equals its component minimum). localCheckpoint truncates
    * the iterative lineage. The oracle is a DuckDB RECURSIVE CTE walking
    * the same closure — two unrelated fixpoint engines agreeing, as with
    * q_dedup_clusters. */
  /** The full-closure census SQL, shared verbatim by q_components and
    * q_components_delta: the oracle for BOTH is the complete RECURSIVE
    * closure over all durable edges — which is exactly the claim the
    * incremental variant must live up to. */
  private lazy val componentsClosureSql: String =
    s"""WITH RECURSIVE $durableEoSql,
       |$durableESql,
       |reach AS (
       |  SELECT src AS node, dst AS r FROM e
       |  UNION
       |  SELECT re.node, e2.dst FROM reach re JOIN e e2 ON re.r = e2.src),
       |comp AS (SELECT node, least(node, min(r)) AS root
       |  FROM reach GROUP BY node)
       |SELECT root AS component, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(CASE WHEN node < $SuppOffset THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_customers,
       |  CAST(sum(CASE WHEN node >= $SuppOffset THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_suppliers
       |FROM comp GROUP BY root ORDER BY n_nodes DESC, component""".stripMargin

  val components: Q = Q("q_components", componentsClosureSql) { (s, d) =>
    componentCensus(ccFixpoint(
      symmetricEdges(durablePairs(s, d)).localCheckpoint()))
  }

  /** Incremental connected-components maintenance — the graph member of
    * the delta family (q_ivf_assign_delta, q_pq_encode_delta): the
    * closure over yesterday's corpus (orders below the 7/8 orderkey
    * split) is treated as the FROZEN base artifact, and only the edges
    * that became durable with today's orders are merged in. The merge
    * runs on the QUOTIENT graph: delta-edge endpoints map to their base
    * component minima (or themselves when new), the tiny quotient runs
    * the same pointer-jumping fixpoint, and base labels relabel through
    * the quotient roots — O(delta) work instead of O(graph), the
    * standard incremental-CC shape. Durability counts are monoidal, so
    * the newly-durable edge set is itself an incremental view
    * (durable(base) ⊆ durable(union)).
    *
    * The ORACLE is the full closure over ALL durable edges — identical
    * text to q_components — so the hash gate proves incremental == full
    * across two unrelated engines; GraphSpec additionally pins delta ==
    * q_components within Spark and that the delta edge set is nonempty
    * (the merge path actually runs). */
  val componentsDelta: Q = Q("q_components_delta", componentsClosureSql) { (s, d) =>
    val pairs = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey").as("c"), col("l_suppkey").as("s"))
    def durable(p: DataFrame) = p.groupBy("c", "s")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= MinRepeats).select("c", "s")
    // the frozen base artifact (yesterday's closure): built once per
    // (session, corpus state) via the model registry — the same
    // train-rarely economics as ivf-base/pq-base, so the per-run cost is
    // the quotient merge, not the base fixpoint. The artifact carries the
    // PRE-FILTER pair census alongside the durable edges and labels:
    // durability (count >= MinRepeats) is not monotone under slice
    // growth, but the COUNTS are monoidal — so the refresh path below can
    // re-derive the durable set from merged counts without re-scanning
    // the old corpus (round-11 verdict #1).
    val (split, _, baseEo, baseLab) = graft.core.ModelCache.getOrRefreshGuarded(
      s, "cc-base", d) {
      // empty orders ⋈ lineitem → max is NULL: fall back to split 0, so
      // the base is the empty labeling and the merge path handles
      // everything (an empty graph must census to zero rows, not NPE —
      // the same explicit empty-case handling as reachHops' hub probe)
      val maxRow = pairs.agg(max(col("o_orderkey"))).head()
      val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp = 7L * maxKey / 8L
      val cen = pairs.filter(col("o_orderkey") < sp)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt")).localCheckpoint()
      val eo = cen.filter(col("cnt") >= MinRepeats).select("c", "s")
        .localCheckpoint()
      (sp, cen, eo,
        ccFixpoint(symmetricEdges(eo).localCheckpoint()).localCheckpoint())
    } { case ((sp0, cen0, eo0, lab0), newFiles) =>
      // REFREEZE: merge the monoidal pair counts with the [sp0, sp1)
      // slice, re-derive durable edges, and roll the labeling forward
      // with the SAME quotient merge the serve path runs — the base
      // fixpoint never re-runs on the old graph. RefreshSpec pins
      // refresh == retrain (labels are canonical component minima).
      // Backfill guard (round-15 verdict #1): keys below sp0 in a new
      // file never enter the slice census — decline, retrain.
      if (tradeBackfilled(s, newFiles, sp0)) None
      else Some {
      val maxRow = pairs.agg(max(col("o_orderkey"))).head()
      val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp1 = math.max(7L * maxKey / 8L, sp0) // monotone, now CHECKED
      val cenS = pairs
        .filter(col("o_orderkey") >= sp0 && col("o_orderkey") < sp1)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt"))
      val cen1 = cen0.unionAll(cenS)
        .groupBy("c", "s").agg(sum(col("cnt")).as("cnt")).localCheckpoint()
      val eo1 = cen1.filter(col("cnt") >= MinRepeats).select("c", "s")
        .localCheckpoint()
      val newE = eo1.exceptAll(eo0)
      (sp1, cen1, eo1,
        mergeDelta(lab0, symmetricEdges(newE).localCheckpoint())
          .localCheckpoint())
      }
    }
    val deltaEo = durable(pairs).exceptAll(baseEo) // newly-durable pairs
    componentCensus(mergeDelta(baseLab, symmetricEdges(deltaEo)))
  }

  /** Incremental PageRank maintenance — the rank member of the delta
    * family, completing the incremental-graph story q_components_delta
    * started. The FROZEN base artifact (yesterday's graph, orders below
    * the 7/8 orderkey split) holds the symmetric edge list plus the
    * PER-ROUND rank tables r1..r`Iters` — not just the final ranks,
    * because a bounded recompute needs boundary values at every depth.
    *
    * The exactness argument for the unrolled `Iters`-round recursion:
    * r_i(v) depends only on v's i-hop in-neighborhood (initial ranks are
    * constant, contributions flow one hop per round). Edge additions are
    * the only change (trading pairs are monotone), so r_i(v) differs
    * from the frozen r_i(v) ONLY if v is within i hops of an endpoint of
    * an added edge. The delta recompute therefore: (1) seeds the
    * affected set with the added pairs' endpoints and expands it
    * `Iters` hops — the BLAST RADIUS; (2) recomputes every round only
    * over edges INTO the radius, reading each source's round-(i-1)
    * rank as coalesce(delta, frozen base) — sources outside the radius
    * are exactly the nodes whose frozen rank is still valid (a fixed
    * superset of the per-round minimal set is still exact: recomputed
    * values equal true values wherever computed); (3) merges: radius
    * nodes take the recomputed ranks, every other node keeps frozen
    * r`Iters` verbatim. Degrees are always CURRENT (they changed only
    * at delta endpoints, inside the radius).
    *
    * FLOOD FALLBACK: the radius is counted (one control-plane read)
    * BEFORE any rank work — when it covers more than half the graph
    * (a uniformly-spread delta on a small-world graph floods in 2–3
    * hops), the overlay bookkeeping would cost more than it saves, so
    * the operator rebuilds outright; the frozen artifact stays for the
    * next, smaller delta. Incremental maintenance pays when the delta
    * is LOCAL; the probe caps the worst case at ~rebuild cost.
    *
    * Scale shape: on a local delta the per-round shuffles carry
    * O(edges-into-radius) rows instead of O(edges) — at 100 TB with a
    * daily delta, serving cost is proportional to the blast radius,
    * not the corpus. The ORACLE is the full unrolled closure
    * over ALL current edges (pagerankSql, shared with q_pagerank), so
    * the hash gate proves incremental == full across two engines;
    * GraphSpec additionally pins delta == q_pagerank within Spark, on
    * both sides of the flood probe (a two-community fixture for the
    * restricted path, the sf corpus for the fallback). */
  /** One exact-integer rank round over an (src, dst, d) edge+degree
    * table: r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div d(u))) div 100.
    * Shared by q_pagerank-shaped full rounds (base training, flood
    * fallback) and the restricted delta rounds. */
  private def prRound(ed: DataFrame, r: DataFrame): DataFrame =
    ed.join(r.withColumnRenamed("node", "src"), "src")
      .select(col("dst"), expr("r div d").as("contrib"))
      .groupBy("dst")
      .agg((lit(150000L) + expr("(85 * sum(contrib)) div 100")).as("r"))
      .select(col("dst").as("node"), col("r"))

  /** Top-25 presentation over a final (node, r) rank table. */
  private def prPresent(r: DataFrame): DataFrame =
    r.select(col("node"), col("r").as("rank_scaled"),
        when(col("node") >= SuppOffset, "supplier").otherwise("customer").as("kind"))
      .orderBy(col("rank_scaled").desc, col("node"))
      .limit(25)

  val pagerankDelta: Q = Q("q_pagerank_delta", pagerankSql) { (s, d) =>
    val pairsAll = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey").as("c"), col("l_suppkey").as("s"))
    def eoOf(p: DataFrame) = p.select("c", "s").distinct()
    // frozen base: yesterday's pair list + PER-ROUND rank tables
    // (train-once via the model registry, the cc-base/ivf-base economics)
    def trainBase(sp: Long): (DataFrame, DataFrame, DataFrame, DataFrame) = {
      val eoB = eoOf(pairsAll.filter(col("o_orderkey") < sp)).localCheckpoint()
      val eB = symmetricEdges(eoB)
      val edB = eB.join(eB.groupBy("src").agg(count(lit(1)).as("d")), "src")
        .localCheckpoint()
      var r = edB.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("r"))
      val rounds = Seq.newBuilder[DataFrame]
      for (_ <- 1 to Iters) {
        r = prRound(edB, r).localCheckpoint()
        rounds += r
      }
      val Seq(r1, r2, rf) = rounds.result()
      (eoB, r1, r2, rf)
    }
    def splitOf: Long = {
      val maxRow = pairsAll.agg(max(col("o_orderkey"))).head()
      val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      7L * maxKey / 8L
    }
    val (baseEo, baseR1, baseR2, baseRF) = graft.core.ModelCache.getOrRefresh(
      s, "pr-base", d) {
      trainBase(splitOf)
    } { case (eo0, b1, b2, bf) =>
      // NO backfill guard here, deliberately (round-15 verdict #1 sweep):
      // unlike the monoid-merge bases, this refresh re-derives eo1 from
      // a FULL filtered scan of the current corpus (below) and seeds the
      // blast radius from the edge diff eo1 \ eo0 — a backfilled key
      // surfaces as a new edge and is recomputed inside the radius (or
      // floods to trainBase), correct either way. A backfilled pair that
      // only raises an already-durable edge's count changes neither the
      // edge set nor the degrees' derivation from it. See
      // [[tradeBackfilled]].
      // REFREEZE (round-11 verdict #1): ranks are NOT a simple monoid —
      // r_i(v) couples v to its i-hop in-neighborhood — but the SAME
      // blast-radius argument the serve path proves hash-green applies
      // per round: after growth, r_i differs from the frozen r_i only
      // inside the radius of the added pairs, so the next frozen base is
      // frozen-outside ∪ recomputed-inside for EVERY round. When the
      // radius floods (> half the graph — the uniform-corpus worst case)
      // the roll-forward devolves to the rebuild it would no longer beat,
      // exactly like the serve path's fallback.
      val sp1 = splitOf
      val eo1 = eoOf(pairsAll.filter(col("o_orderkey") < sp1)).localCheckpoint()
      val e1 = symmetricEdges(eo1)
      val deg1 = e1.groupBy("src").agg(count(lit(1)).as("d"))
      val ed1 = e1.join(deg1, "src").localCheckpoint()
      val dEo = eo1.join(eo0, Seq("c", "s"), "left_anti")
      var affected = dEo.select(col("c").as("node"))
        .unionAll(dEo.select((col("s") + SuppOffset).as("node")))
        .distinct().localCheckpoint()
      val nNodes = deg1.count()
      var flooded = 2L * affected.count() > nNodes
      var hops = 0
      while (!flooded && hops < Iters) {
        affected = graft.core.Session.truncate(
          affected.unionAll(
              e1.join(affected.withColumnRenamed("node", "src"), "src")
                .select(col("dst").as("node")))
            .distinct(), eager = false) // count() probe below materializes
        hops += 1
        flooded = 2L * affected.count() > nNodes
      }
      if (flooded) trainBase(sp1)
      else {
        val baseRs0 = Seq(b1, b2, bf)
        var rDelta: DataFrame = null
        val merged = Seq.newBuilder[DataFrame]
        for (i <- 1 to Iters) {
          val inE = ed1.join(affected.withColumnRenamed("node", "dst"), "dst")
          val withSrcRank =
            if (i == 1) inE.withColumn("rsrc", lit(1000000L))
            else inE
              .join(rDelta.select(col("node").as("src"), col("r").as("rd")),
                Seq("src"), "left")
              .join(baseRs0(i - 2).select(col("node").as("src"), col("r").as("rb")),
                Seq("src"), "left")
              .withColumn("rsrc", coalesce(col("rd"), col("rb")))
          rDelta = graft.core.Session.truncate(
            withSrcRank.select(col("dst"), expr("rsrc div d").as("contrib"))
              .groupBy("dst")
              .agg((lit(150000L) + expr("(85 * sum(contrib)) div 100")).as("r"))
              .select(col("dst").as("node"), col("r")),
            eager = false) // single consumer per round — next round (or the final union) materializes
          merged += baseRs0(i - 1).join(affected, Seq("node"), "left_anti")
            .unionAll(rDelta).localCheckpoint()
        }
        val Seq(m1, m2, mf) = merged.result()
        (eo1, m1, m2, mf)
      }
    }
    val baseRs = Seq(baseR1, baseR2, baseRF)
    val eo = eoOf(pairsAll).localCheckpoint()
    val e = symmetricEdges(eo)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val ed = e.join(deg, "src").localCheckpoint()
    // A₀ = endpoints of pairs added since the base, then Iters frontier
    // expansions (rank changes propagate one hop per round) — the blast
    // radius, computed BEFORE any rank work because it also decides the
    // execution path below
    val deltaEo = eo.join(baseEo, Seq("c", "s"), "left_anti")
    var affected = deltaEo.select(col("c").as("node"))
      .unionAll(deltaEo.select((col("s") + SuppOffset).as("node")))
      .distinct().localCheckpoint()
    // per-hop 1-row control-plane reads pick the path: when the radius
    // covers more than half the graph (a uniformly-spread delta on a
    // small-world graph floods in 2–3 hops), the overlay bookkeeping
    // costs more than it saves — rebuild outright; the frozen artifact
    // stays for the next, smaller delta. The radius only grows, so the
    // expansion ABORTS at the first flooded hop instead of paying the
    // remaining ones — the probe is what keeps the operator never much
    // worse than the rebuild it replaces, and nearly free on the local
    // deltas it exists for.
    val nNodes = deg.count()
    var flooded = 2L * affected.count() > nNodes
    var hops = 0
    while (!flooded && hops < Iters) {
      affected = graft.core.Session.truncate(
        affected.unionAll(
            e.join(affected.withColumnRenamed("node", "src"), "src")
              .select(col("dst").as("node")))
          .distinct(), eager = false) // count() probe below materializes
      hops += 1
      flooded = 2L * affected.count() > nNodes
    }
    if (flooded) {
      var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      for (_ <- 1 to Iters) r = prRound(ed, r)
      prPresent(r)
    } else {
      // restricted rounds: every round recomputes over edges INTO the
      // (fixed) blast radius; sources outside it read their FROZEN
      // round-(i-1) rank — exactly the nodes whose rank is still valid
      var rDelta: DataFrame = null
      for (i <- 1 to Iters) {
        val inE = ed.join(affected.withColumnRenamed("node", "dst"), "dst")
        val withSrcRank =
          if (i == 1) inE.withColumn("rsrc", lit(1000000L)) // r0 is constant
          else inE
            .join(rDelta.select(col("node").as("src"), col("r").as("rd")),
              Seq("src"), "left")
            .join(baseRs(i - 2).select(col("node").as("src"), col("r").as("rb")),
              Seq("src"), "left")
            // delta overlay wins; a source with neither is impossible (a
            // node absent from the base is new, hence inside the radius)
            .withColumn("rsrc", coalesce(col("rd"), col("rb")))
        rDelta = graft.core.Session.truncate(
          withSrcRank.select(col("dst"), expr("rsrc div d").as("contrib"))
            .groupBy("dst")
            .agg((lit(150000L) + expr("(85 * sum(contrib)) div 100")).as("r"))
            .select(col("dst").as("node"), col("r")),
          eager = false) // single consumer per round — the final union materializes
      }
      prPresent(baseRF.join(affected, Seq("node"), "left_anti")
        .unionAll(rDelta))
    }
  }

  /** (total current nodes, affected after `Iters` expansions, delta
    * edges) — the observability triple GraphSpec uses to prove the
    * bounded path engages (affected ⊊ nodes on a real delta). */
  private[graft] def pagerankDeltaStats(s: org.apache.spark.sql.SparkSession,
      d: String): (Long, Long, Long) = {
    val pairsAll = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey").as("c"), col("l_suppkey").as("s"))
    val maxRow = pairsAll.agg(max(col("o_orderkey"))).head()
    val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val sp = 7L * maxKey / 8L
    def symE(p: DataFrame) = symmetricEdges(p.select("c", "s").distinct())
    val e = symE(pairsAll).localCheckpoint()
    val eB = symE(pairsAll.filter(col("o_orderkey") < sp))
    val eDelta = e.exceptAll(eB).localCheckpoint()
    var affected = eDelta.select(col("src").as("node")).distinct()
    for (_ <- 1 to Iters)
      affected = affected.unionAll(
          e.join(affected.withColumnRenamed("node", "src"), "src")
            .select(col("dst").as("node")))
        .distinct().localCheckpoint()
    (e.select("src").distinct().count(), affected.count(), eDelta.count() / 2)
  }

  /** Merge a SYMMETRIC delta edge list into an existing (node, lbl)
    * labeling via the quotient graph: delta endpoints map to their
    * component minima (or themselves when new), the tiny quotient runs
    * the pointer-jumping fixpoint, and old labels relabel through the
    * quotient roots — O(delta) work. Shared by q_components_delta and
    * the streaming incremental-CC pipeline. */
  private[graft] def mergeDelta(baseLab: DataFrame, dE: DataFrame): DataFrame = {
    val repS = baseLab.select(col("node").as("src"), col("lbl").as("rs"))
    val repD = baseLab.select(col("node").as("dst"), col("lbl").as("rd"))
    val quotientE = dE.join(repS, Seq("src"), "left").join(repD, Seq("dst"), "left")
      .select(coalesce(col("rs"), col("src")).as("src"),
        coalesce(col("rd"), col("dst")).as("dst"))
      .localCheckpoint()
    val qLab = ccFixpoint(quotientE).localCheckpoint()
    // relabel old nodes through the quotient; untouched components keep
    // their label (left join misses)
    val qMap = qLab.select(col("node").as("lbl"), col("lbl").as("qroot"))
    val merged = baseLab.join(qMap, Seq("lbl"), "left")
      .select(col("node"), coalesce(col("qroot"), col("lbl")).as("lbl"))
    // nodes that exist only in the delta enter via the quotient
    val newNodes = qLab.join(baseLab.select("node"), Seq("node"), "left_anti")
    merged.unionAll(newNodes)
  }

  /** Pointer-jumping min-label fixpoint over a symmetric edge list:
    * (node, lbl = component minimum). Factored out of q_components for
    * reuse by the incremental variants. */
  private[graft] def ccFixpoint(e: DataFrame): DataFrame = {
    // per-round truncation via Session.truncate: localCheckpoint by
    // default; reliable checkpoint() when spark.graft.checkpointDir is
    // set (cluster-grade — a lost executor must not restart a 30-round
    // fixpoint from scratch)
    var lab = graft.core.Session.truncate(
      e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl")))
    var prevSum = -1L
    var iter = 0
    var converged = false
    while (!converged && iter < 32) {
      val viaEdges = e.join(lab.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("lbl"))
      val stepped = viaEdges.unionAll(lab)
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
      val parents = stepped
        .select(col("node").as("p_node"), col("lbl").as("p_lbl"))
      lab = graft.core.Session.truncate(
        stepped.join(parents, col("lbl") === col("p_node"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("p_lbl"), col("lbl"))).as("lbl")),
        eager = false) // probed next line — the probe job materializes
      // labels only decrease; an unchanged sum IS the fixpoint (coalesce:
      // an edgeless graph must converge on the empty frame, not throw)
      val labSum = lab.agg(coalesce(sum(col("lbl")), lit(0L))).head().getLong(0)
      converged = labSum == prevSum
      prevSum = labSum
      iter += 1
    }
    require(converged,
      s"connected components did not converge in $iter pointer-jumping rounds")
    lab
  }

  /** (component, n_nodes, n_customers, n_suppliers) presentation census
    * over a (node, lbl) labeling. */
  private def componentCensus(lab: DataFrame): DataFrame =
    lab
      .groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node") < SuppOffset, 1L).otherwise(0L)).as("n_customers"),
        sum(when(col("node") >= SuppOffset, 1L).otherwise(0L)).as("n_suppliers"))
      .orderBy(col("n_nodes").desc, col("component"))

  /** BFS reachability census on the durable-trade graph: minimum hop
    * count from a deterministic hub (the smallest node id — always a
    * customer) to every reachable node, reported as one row per hop
    * level. The graph family's reachability member next to
    * q_components' partition: "how FAR is everything from the hub", vs
    * "what is connected at all".
    *
    * Spark side is frontier-free min-distance propagation: d(v) :=
    * min(d(v), min over in-neighbors d(u) + 1) per round — O(diameter)
    * rounds (hop metrics admit no pointer-jump shortcut), each one
    * edge⋈dist shuffle + one partial-aggregating min shuffle, converged
    * when the (monotone-decreasing) distance sum stabilizes; unreachable
    * nodes never enter the table. The oracle walks the same closure as a
    * DuckDB RECURSIVE CTE over (node, depth) pairs with a depth cap far
    * above any real diameter. */
  val reachHops: Q = Q(
    "q_reach_hops",
    s"""WITH RECURSIVE $durableEoSql,
       |$durableESql,
       |hub AS (SELECT min(src) AS h FROM e),
       |reach AS (
       |  SELECT h AS node, 0 AS d FROM hub WHERE h IS NOT NULL
       |  UNION
       |  SELECT e.dst, re.d + 1 FROM reach re
       |  JOIN e ON e.src = re.node WHERE re.d < $MaxHops),
       |dist AS (SELECT node, min(d) AS hops FROM reach GROUP BY node)
       |SELECT CAST(hops AS BIGINT) AS hops,
       |  CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(min(node) AS BIGINT) AS min_node,
       |  CAST(max(node) AS BIGINT) AS max_node
       |FROM dist GROUP BY hops ORDER BY hops""".stripMargin
  ) { (s, d) =>
    val e = symmetricEdges(durablePairs(s, d)).localCheckpoint()
    val hub = e.agg(min(col("src"))).head()
    if (hub.isNullAt(0)) {
      // edgeless graph: empty census, same as the oracle's empty closure
      e.select(col("src").as("hops"), col("src").as("n_nodes"),
        col("src").as("min_node"), col("src").as("max_node")).limit(0)
    } else {
      var dist = graft.core.Session.truncate(
        e.sparkSession.range(1)
          .select(lit(hub.getLong(0)).as("node"), lit(0L).as("d")))
      var (prevCnt, prevSum) = (-1L, -1L)
      var iter = 0
      var converged = false
      while (!converged && iter < MaxHops) {
        val stepped = e.join(dist.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), (col("d") + 1L).as("d"))
          .unionAll(dist)
          .groupBy("node").agg(min(col("d")).as("d"))
        dist = graft.core.Session.truncate(stepped, eager = false) // probe below materializes
        // the reachable set only grows and distances only decrease, so an
        // unchanged (count, sum) pair IS the fixpoint
        val probe = dist.agg(count(lit(1)), coalesce(sum(col("d")), lit(0L))).head()
        converged = probe.getLong(0) == prevCnt && probe.getLong(1) == prevSum
        prevCnt = probe.getLong(0)
        prevSum = probe.getLong(1)
        iter += 1
      }
      require(converged, s"BFS did not converge in $iter rounds")
      dist
        .groupBy(col("d").as("hops"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("node")).as("min_node"),
          max(col("node")).as("max_node"))
        .orderBy("hops")
    }
  }

  /** Derived per-hub-key wedge cap: 4× the average hub-side degree —
    * the semdedup subcell recipe (Similarity.subcellsOf). Keys at or
    * under the cap keep a single block (zero replication, the plan is
    * identical to the unsplit pair join); only hub keys pay the split. */
  private[graft] def wedgeCap(nEdges: Long, nKeys: Long): Long =
    math.max(2L, 4L * ((nEdges + math.max(nKeys, 1L) - 1) / math.max(nKeys, 1L)))

  /** 1-row control-plane census of one bipartite side: (distinct keys,
    * edges, Σ C(deg, 2)). The wedge sum IS the pair-join row count, so
    * reading it first makes the enumeration-side choice free. */
  private def sideCensus(eo: DataFrame, side: String): (Long, Long, Long) = {
    val r = eo.groupBy(col(side)).agg(count(lit(1)).as("d"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("d")), lit(0L)).as("n_edges"),
        coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("w"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Hash-split of the hub side into capped blocks: nblk =
    * ceil(deg/cap), block = multiplicative hash of the spoke id mod
    * nblk (the exact-integer recipe shared with semdedup's subcells —
    * both engines could replay it bit-for-bit, though the butterfly
    * count is split-invariant so the oracle never needs to). */
  private def wedgeBlocked(kv: DataFrame, cap: Long): DataFrame = {
    val deg = kv.groupBy("k").agg(count(lit(1)).as("hd"))
    kv.join(deg, "k")
      .withColumn("nblk", expr(s"(hd + ${cap - 1}) div $cap"))
      .withColumn("blk", ((col("v") % lit(1048573L)) * lit(2654435761L)) % col("nblk"))
      .select("k", "v", "blk", "nblk")
  }

  /** (hub key, block) → population, on the side the census picks — the
    * observability twin GraphSpec grades the per-key bound against. */
  private[graft] def wedgeBlocks(eo: DataFrame): DataFrame = {
    val (sKeys, nEdges, wS) = sideCensus(eo, "s")
    val (cKeys, _, wC) = sideCensus(eo, "c")
    val (hub, spoke, keys) = if (wS <= wC) ("s", "c", sKeys) else ("c", "s", cKeys)
    wedgeBlocked(eo.select(col(hub).as("k"), col(spoke).as("v")),
        wedgeCap(nEdges, keys))
      .groupBy("k", "blk").agg(count(lit(1)).as("n"))
  }

  /** Bounded butterfly census over an arbitrary bipartite pair list
    * (columns `c`, `s`) — factored so GraphSpec can drive synthetic
    * hub-skew graphs through the exact production plan.
    *
    * Two bounds, both derived from 1-row censuses read BEFORE the pair
    * join is paid for:
    *  1. SIDE CHOICE — wedges are enumerated from whichever side has the
    *     smaller Σ C(deg, 2); that sum is exactly the pair-join row
    *     count, so the choice minimizes total shuffle volume (a graph
    *     with hub suppliers but flat customers enumerates supplier pairs
    *     per customer, and vice versa).
    *  2. HUB SPLIT — on the chosen side, each key's adjacency is
    *     hash-split into ceil(deg/cap) blocks (cap = 4× average degree,
    *     the semdedup subcell recipe). Within-block pairs join on
    *     (k, blk); cross-block pairs join on (k, i, j) with each edge
    *     replicated to its ceil(deg/cap)−1 partner blocks — so the
    *     worst single join key carries ~cap² rows no matter how big the
    *     hub, instead of C(deg_hub, 2) on one key. Non-hub keys have
    *     nblk = 1: zero replication, no cross side, the exact original
    *     plan. Unlike semdedup's subcells the cross-block pairs ARE
    *     enumerated — the census must stay exact, and the split is pure
    *     skew-spreading, not approximation.
    *
    * The butterfly count is mathematically side- and split-invariant
    * (every unordered spoke pair is produced exactly once: same block →
    * within with v1 < v2; different blocks i < j → one (k, i, j) key),
    * so the oracle keeps the supplier-side enumeration; GraphSpec
    * asserts the side identity by local recompute and drives a hub-skew
    * graph through the split path. */
  /** All unordered spoke pairs {v1 < v2} sharing a hub key, one row per
    * shared key, enumerated through the hub-split blocks (within-block +
    * cross-block) — the bounded pair join factored out of the butterfly
    * census for reuse by the co-trading projection (q_triangles). `kv`
    * has columns (k = hub key, v = spoke). */
  private def blockedSpokePairs(kv: DataFrame, cap: Long): DataFrame = {
    val blocked = wedgeBlocked(kv, cap)
      .localCheckpoint() // feeds the within join (2×) and both cross sides
    val within = blocked.as("a").join(blocked.as("b"),
        col("a.k") === col("b.k") && col("a.blk") === col("b.blk")
          && col("a.v") < col("b.v"))
      .select(col("a.v").as("v1"), col("b.v").as("v2"))
    // cross-block: edge in block i is the LEFT of every (i, j>i) pair
    // key, edge in block j the RIGHT of every (i<j, j) — replication is
    // nblk−1 per edge, zero when nblk = 1
    val lo = blocked.select(col("k"), col("v"), col("blk").as("i"),
      explode(when(col("blk") < col("nblk") - 1,
          sequence(col("blk") + 1, col("nblk") - 1))
        .otherwise(array().cast("array<bigint>"))).as("j"))
    val hi = blocked.select(col("k"), col("v"), col("blk").as("j"),
      explode(when(col("blk") > 0, sequence(lit(0L), col("blk") - 1))
        .otherwise(array().cast("array<bigint>"))).as("i"))
    val cross = lo.as("a").join(hi.as("b"),
        col("a.k") === col("b.k") && col("a.i") === col("b.i")
          && col("a.j") === col("b.j"))
      .select(least(col("a.v"), col("b.v")).as("v1"),
        greatest(col("a.v"), col("b.v")).as("v2"))
    within.unionAll(cross)
  }

  private[graft] def butterflyCensus(eo: DataFrame): DataFrame = {
    val (sKeys, nEdges, wS) = sideCensus(eo, "s")
    val (cKeys, _, wC) = sideCensus(eo, "c")
    val (hub, spoke, keys) = if (wS <= wC) ("s", "c", sKeys) else ("c", "s", cKeys)
    val cap = wedgeCap(nEdges, keys)
    blockedSpokePairs(eo.select(col(hub).as("k"), col(spoke).as("v")), cap)
      .groupBy("v1", "v2").agg(count(lit(1)).as("w"))
      .agg(coalesce(sum(expr("w * (w - 1) div 2")), lit(0L)).as("n_butterflies"))
      .select(lit(nEdges).as("n_edges"), lit(wS).as("n_wedges_supplier"),
        lit(wC).as("n_wedges_customer"), col("n_butterflies"))
  }

  /** Butterfly (2×2 biclique) census of the durable-trade graph — the
    * clustering metric that is actually meaningful on a bipartite graph:
    * triangles cannot exist (no odd cycles), so cohesion is measured by
    * 4-cycles — two customers sharing two suppliers. Reports edge count,
    * wedge counts from BOTH sides (customer pairs through a shared
    * supplier = Σ C(deg_s, 2); supplier pairs through a shared customer
    * = Σ C(deg_c, 2)) and the butterfly count Σ_pairs C(shared, 2).
    * Plan bounds (side choice + hub split): see butterflyCensus. */
  val butterflies: Q = Q(
    "q_butterflies",
    s"""WITH $durableEoSql,
       |sdeg AS (SELECT s, count(*) AS d FROM eo GROUP BY s),
       |cdeg AS (SELECT c, count(*) AS d FROM eo GROUP BY c),
       |cp AS (SELECT a.c AS c1, b.c AS c2, count(*) AS w
       |  FROM eo a JOIN eo b ON a.s = b.s AND a.c < b.c GROUP BY 1, 2)
       |SELECT (SELECT count(*) FROM eo) AS n_edges,
       |  (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) FROM sdeg)
       |    AS n_wedges_supplier,
       |  (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) FROM cdeg)
       |    AS n_wedges_customer,
       |  (SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) AS BIGINT) FROM cp)
       |    AS n_butterflies""".stripMargin
  ) { (s, d) =>
    butterflyCensus(durablePairs(s, d).localCheckpoint())
  }

  // ---------------------------------------------------------------------
  // Triangle census over the co-trading projection
  // ---------------------------------------------------------------------

  /** Projection thresholds: pairs with ≥2 repeat orders (the ≥4 durable
    * graph thins to nothing past sf0.01), projected customer pairs must
    * share ≥2 such suppliers (a single shared supplier floods the
    * projection — measured 358k edges vs 94k at sf0.01). */
  private[graft] val TriMinRepeats = 2
  private[graft] val TriMinShared = 2

  private val triEoSql =
    s"""eo AS (SELECT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2 HAVING count(*) >= $TriMinRepeats)""".stripMargin

  /** Bounded triangle census over an arbitrary bipartite pair list
    * (columns `c`, `s`) — factored so GraphSpec can drive tiny
    * hand-checkable graphs through the exact production plan.
    *
    * Two bounded quadratic steps, nothing else:
    *  1. the PROJECTION pair join (customer pairs through a shared
    *     supplier) reuses the butterfly machinery — hub keys split into
    *     capped blocks, so no supplier explodes one shuffle key;
    *  2. the TRIANGLE join runs on DEGREE-ORIENTED edges (each edge
    *     points from its (degree, id)-smaller endpoint to the larger):
    *     if some out-degree exceeded √(2m), that vertex would have
    *     > √(2m) neighbors of degree ≥ its own, i.e. degree sum > 2m —
    *     impossible. So every oriented adjacency list is ≤ √(2m), the
    *     per-key wedge work is ≤ 2m rows, and the total is the classic
    *     O(m^1.5) — the orientation IS the cap (measured: max_outdeg 123
    *     vs the 434 bound at sf0.01). Each triangle is counted exactly
    *     once: its (degree, id)-minimal vertex emits the unordered wedge
    *     whose closing edge is oriented (middle → top). */
  private[graft] def triangleCensus(eo: DataFrame): DataFrame = {
    val (sKeys, nEdges, _) = sideCensus(eo, "s")
    val cap = wedgeCap(nEdges, sKeys)
    val ce = blockedSpokePairs(eo.select(col("s").as("k"), col("c").as("v")), cap)
      .groupBy("v1", "v2").agg(count(lit(1)).as("w"))
      .filter(col("w") >= TriMinShared)
      .select(col("v1").as("u"), col("v2").as("v"))
      .localCheckpoint() // feeds sym (2×) which feeds deg + oe
    val sym = ce.select(col("u").as("x"), col("v").as("y"))
      .unionAll(ce.select(col("v").as("x"), col("u").as("y")))
    val deg = sym.groupBy("x").agg(count(lit(1)).as("dg"))
    val oe = sym
      .join(deg.select(col("x"), col("dg").as("dx")), "x")
      .join(deg.select(col("x").as("y"), col("dg").as("dy")), "y")
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("x").as("src"), col("y").as("dst"))
      .localCheckpoint() // feeds the wedge join (2×) + the closing join
    val wedges = oe.as("a").join(oe.as("b"),
        col("a.src") === col("b.src") && col("a.dst") =!= col("b.dst"))
      .select(col("a.dst").as("p"), col("b.dst").as("q"))
    val tri = wedges.join(oe.as("cl"),
        col("p") === col("cl.src") && col("q") === col("cl.dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("dg * (dg - 1) div 2")), lit(0L)).as("n_wedges"))
    val edges = ce.agg(count(lit(1)).as("n_edges"))
    val od = oe.groupBy("src").agg(count(lit(1)).as("od"))
      .agg(coalesce(max(col("od")), lit(0L)).as("max_outdeg"))
    nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(od))
      .crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("max_outdeg"), col("n_triangles"),
        when(col("n_wedges") === 0L, 0L)
          .otherwise(expr("(3 * n_triangles * 1000000) div n_wedges"))
          .as("ccoef_ppm"))
  }

  /** Triangle census of the CO-TRADING graph: customers are adjacent when
    * they share ≥2 repeat-trade suppliers (the one-mode projection of the
    * trade graph — the bipartite graph itself has no odd cycles, so
    * q_butterflies measures ITS cohesion and this op measures the
    * projection's). Reports the projection size, the open-wedge count,
    * the oriented max out-degree (the evidence the √(2m) bound held),
    * the exact triangle count, and the global clustering coefficient
    * 3·triangles/wedges in exact-integer ppm. Plan bounds: see
    * triangleCensus. */
  val triangles: Q = Q(
    "q_triangles",
    // Every CTE is MATERIALIZED (round-15 ask #4): the headline SELECT
    // reads the chain through SIX scalar subqueries, and DuckDB's
    // default CTE inlining re-planned the whole quadratic pipeline once
    // per subquery — at the 10× dir that compounded into the temp-disk
    // abort that put this oracle on the exception list. Materialized,
    // each step runs once (measured: the full chain is ~8 s at 10×) and
    // the 10× gate turns green. Pure evaluation hint, zero semantics.
    s"""WITH ${triEoSql.replaceFirst("eo AS \\(", "eo AS MATERIALIZED (")},
       |cp AS MATERIALIZED (SELECT a.c AS u, b.c AS v, count(*) AS w
       |  FROM eo a JOIN eo b ON a.s = b.s AND a.c < b.c GROUP BY 1, 2),
       |ce AS MATERIALIZED (SELECT u, v FROM cp WHERE w >= $TriMinShared),
       |sym AS MATERIALIZED (SELECT u AS x, v AS y FROM ce UNION ALL SELECT v AS x, u AS y FROM ce),
       |deg AS MATERIALIZED (SELECT x, count(*) AS dg FROM sym GROUP BY x),
       |oe AS MATERIALIZED (SELECT s.x AS src, s.y AS dst FROM sym s
       |  JOIN deg da ON da.x = s.x JOIN deg db ON db.x = s.y
       |  WHERE (da.dg, s.x) < (db.dg, s.y)),
       |tri AS MATERIALIZED (SELECT count(*) AS t FROM oe a
       |  JOIN oe b ON b.src = a.src AND b.dst != a.dst
       |  JOIN oe cl ON cl.src = a.dst AND cl.dst = b.dst),
       |wsum AS MATERIALIZED (SELECT coalesce(sum(dg * (dg - 1) // 2), 0) AS nw FROM deg)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ce) AS n_edges,
       |  (SELECT CAST(nw AS BIGINT) FROM wsum) AS n_wedges,
       |  (SELECT CAST(coalesce(max(od), 0) AS BIGINT)
       |   FROM (SELECT src, count(*) AS od FROM oe GROUP BY src)) AS max_outdeg,
       |  (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
       |  CAST(CASE WHEN (SELECT nw FROM wsum) = 0 THEN 0
       |    ELSE (3 * (SELECT t FROM tri) * 1000000) // (SELECT nw FROM wsum)
       |  END AS BIGINT) AS ccoef_ppm""".stripMargin
  ) { (s, d) =>
    triangleCensus(
      T.orders(s, d)
        .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= TriMinRepeats)
        .select("c", "s")
        .localCheckpoint())
  }

  // ---------------------------------------------------------------------
  // Incremental triangle census (tri-base + q_triangles_delta)
  // ---------------------------------------------------------------------

  /** Unfiltered co-trading pair census (u < v, w = shared suppliers)
    * over a durable edge list — the q_triangles projection join WITHOUT
    * the w ≥ TriMinShared gate, because the tri-base artifact must see
    * w = 1 pairs to detect their crossing INTO the projection when a
    * delta lifts them (the containment-base df-band lesson: store the
    * sub-threshold census, it is what makes thresholds refreshable). */
  private[graft] def triPairCensus(eo: DataFrame): DataFrame = {
    val (sKeys, nEdges, _) = sideCensus(eo, "s")
    val cap = wedgeCap(nEdges, sKeys)
    blockedSpokePairs(eo.select(col("s").as("k"), col("c").as("v")), cap)
      .groupBy("v1", "v2").agg(count(lit(1)).as("w"))
      .select(col("v1").as("u"), col("v2").as("v"), col("w"))
  }

  /** Exact triangle count of a canonical (u < v) edge list — the
    * degree-oriented O(m^1.5) wedge join, i.e. the q_triangles plan from
    * `ce` down, returned as a 1-row DataFrame. Paid only when tri-base
    * TRAINS; the refresh and serve paths count triangles incrementally
    * ([[triDeltaCount]]) and never run this on the full graph again. */
  private[graft] def triCount(ce: DataFrame): DataFrame = {
    val sym = ce.select(col("u").as("x"), col("v").as("y"))
      .unionAll(ce.select(col("v").as("x"), col("u").as("y")))
    val deg = sym.groupBy("x").agg(count(lit(1)).as("dg"))
    val oe = sym
      .join(deg.select(col("x"), col("dg").as("dx")), "x")
      .join(deg.select(col("x").as("y"), col("dg").as("dy")), "y")
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("x").as("src"), col("y").as("dst"))
      .localCheckpoint() // feeds the wedge join (2×) + the closing join
    val wedges = oe.as("a").join(oe.as("b"),
        col("a.src") === col("b.src") && col("a.dst") =!= col("b.dst"))
      .select(col("a.dst").as("p"), col("b.dst").as("q"))
    wedges.join(oe.as("cl"),
        col("p") === col("cl.src") && col("q") === col("cl.dst"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** The base ⊕ delta merge legs shared by the q_triangles_delta serve
    * path and the tri-base refreeze — one algebra, two callers (the
    * containmentServe convention, so RefreshSpec's bit-parity proof
    * covers the serve path too).
    *
    * Everything here is delta-proportional: under append-only growth
    * the (c, s) order counts and the pair weights w only GROW, so
    * durable edges and projection edges only APPEAR — `eoNew` is the
    * newly-durable edge set (merged cnt crosses TriMinRepeats,
    * restricted to delta-touched keys via a broadcast semi-join),
    * `dw` enumerates ONLY pairs with ≥ 1 new endpoint edge (per
    * supplier: new×old ∪ new×new, each pair once — Σ|N_s|·|A_s| rows,
    * never the full Σ C(deg, 2) pair join), and `ceNew` is the pairs
    * whose merged weight crosses TriMinShared. */
  private[graft] final case class TriMerge(eoNew: DataFrame, dw: DataFrame,
      ceNew: DataFrame, ceAll: DataFrame)

  /** The pre-pair-join half of [[triMergeOf]]: the newly-durable edges
    * (checkpointed) and the base durable edges — cheap (no pair join),
    * so the flood probe can read |eoNew| BEFORE any quadratic work.
    * No broadcast hint on the delta keys: a streaming tick's delta is
    * tiny (AQE broadcasts it), but a refreeze delta can be a whole
    * day's corpus — forcing the hint there measured SLOWER than
    * retrain (19.8 s vs 12.8 s at the k=10 replica board) before this
    * was left to AQE. */
  private[graft] final case class TriEdges(eoNew: DataFrame, eo0: DataFrame,
      cenTouched: DataFrame, dKeys: DataFrame)

  private[graft] def triEoNew(cen0: DataFrame, cenD: DataFrame): TriEdges = {
    val dKeys = cenD.select("c", "s")
    val mergedTouched = cen0.join(dKeys, Seq("c", "s"), "left_semi")
      .unionAll(cenD)
      .groupBy("c", "s").agg(sum(col("cnt")).as("cnt"))
    val base0 = cen0.join(dKeys, Seq("c", "s"), "left_semi")
      .select(col("c"), col("s"), col("cnt").as("cnt0"))
    val eoNew = mergedTouched.join(base0, Seq("c", "s"), "left")
      .filter(col("cnt") >= TriMinRepeats &&
        coalesce(col("cnt0"), lit(0L)) < TriMinRepeats)
      .select("c", "s")
      // LAZY (round-19, guide §1.2/§2.4): every caller's FIRST action is
      // the flood probe's count() — the probed-fixpoint shape — which
      // materializes the cache before the fan-out consumers (new×old,
      // new×new ×2, eoAll) read it. Eager bought a dedicated job.
      .localCheckpoint(false)
    TriEdges(eoNew, cen0.filter(col("cnt") >= TriMinRepeats).select("c", "s"),
      mergedTouched, dKeys)
  }

  /** Flood probe on the DURABLE-EDGE axis — readable before any pair
    * join is paid, and it bounds everything downstream (dw rows ≤
    * Σ_s |N_s|·|A_s|, ceNew ≤ dw): when the newly-durable edges exceed
    * 1/`frac` of the merged edge set, the per-new-edge delta joins
    * would cost more than rebuilding the projection through the bounded
    * machinery — the q_pagerank_delta flood-fallback convention. The
    * callers pass MEASURED thresholds, not guesses (k=10 replica
    * board): the REFREEZE uses frac=16 — a 9%-of-edges bulk slice
    * through the unoriented delta joins plus the census rolls ran 0.79×
    * of retrain, the 0.1% local slice 1.6×, so 1/16 sits between them —
    * while the SERVE path uses frac=4: it pays no census rolls, and its
    * structural 1/8 tail ran 3.5 s incremental vs 4.7 s rebuilt at
    * sf0.1. Round-19: takes COUNTS, not frames — |eo0| is frozen in the
    * tri-base artifact (rolled forward arithmetically: durable edges
    * only appear under append) and |eoNew| is the count that
    * materializes the lazy eoNew checkpoint, so the probe itself costs
    * zero jobs beyond that one materialization. */
  private[graft] def triEdgeFlooded(nNew: Long, nEo0: Long,
      frac: Long): Boolean =
    nNew > 0L && frac * nNew > nEo0 + nNew

  private[graft] def triMergeOf(cen0: DataFrame, cp0: DataFrame,
      cenD: DataFrame): TriMerge = {
    val em = triEoNew(cen0, cenD)
    triMergeFrom(em.eoNew, em.eo0, cp0)
  }

  private[graft] def triMergeFrom(eoNew: DataFrame, eo0: DataFrame,
      cp0: DataFrame): TriMerge = {
    // per supplier: every pair with ≥ 1 new endpoint, exactly once
    // (N_s and O_s are disjoint for a fixed s: an edge is old xor new)
    val newBy = eoNew.select(col("s").as("k"), col("c").as("nv"))
    val oldBy = eo0.select(col("s").as("k"), col("c").as("ov"))
    val no = newBy.join(oldBy, "k")
      .select(least(col("nv"), col("ov")).as("u"),
        greatest(col("nv"), col("ov")).as("v"))
    val nn = newBy.as("a").join(newBy.as("b"),
        col("a.k") === col("b.k") && col("a.nv") < col("b.nv"))
      .select(col("a.nv").as("u"), col("b.nv").as("v"))
    val dw = no.unionAll(nn).groupBy("u", "v")
      .agg(count(lit(1)).as("dw"))
      // LAZY (round-19): the first consumer is ceNew's EAGER checkpoint
      // job just below — single consumer at materialization time, and it
      // pins the cache for the refreeze's cp roll-forward reads.
      .localCheckpoint(false)
    val ceNew = dw
      .join(cp0.select(col("u"), col("v"), col("w").as("w0")),
        Seq("u", "v"), "left")
      .filter(coalesce(col("w0"), lit(0L)) < TriMinShared &&
        coalesce(col("w0"), lit(0L)) + col("dw") >= TriMinShared)
      .select("u", "v")
      .localCheckpoint() // feeds A (2× via symNew), W2, T3 (3×)
    // NO checkpoint (round-19, the q_kcore keep-filter lesson): ceAll is
    // a narrow filter of the checkpointed cp0 unioned with the
    // checkpointed ceNew — each consumer (symAll ×2, W2 close,
    // presentation) re-derives it map-side from cache for free, so its
    // eager checkpoint bought nothing but a serve job and a barrier.
    val ceAll = cp0.filter(col("w") >= TriMinShared).select("u", "v")
      .unionAll(ceNew)
    TriMerge(eoNew, dw, ceNew, ceAll)
  }

  /** Δtriangles by inclusion–exclusion over how many of a triangle's
    * edges are new. Projection edges only appear under append (weights
    * only grow), so every triangle of the merged graph that is absent
    * from the base contains ≥ 1 new edge, and with
    * t_k = #triangles with exactly k new edges:
    *   A  = Σ_{new edge (u,v)} |N_all(u) ∩ N_all(v)| = t1 + 2·t2 + 3·t3
    *   W2 = #(unordered new-edge wedges closed by any merged edge)
    *      = t2 + 3·t3
    *   T3 = #all-new triangles (counted once via u < v < w ordering) = t3
    *   Δ  = A − W2 + T3 = t1 + t2 + t3.
    * Every join is anchored on `ceNew` — O(Σ_{new edge} deg_all) rows.
    * These joins are UNORIENTED (per-new-edge adjacency, not the √(2m)-
    * capped oriented form), so they are delta-proportional for a LOCAL
    * delta but degrade toward O(Σ deg²) when the delta is a large
    * fraction of the graph — which is why every caller runs
    * [[triFlooded]] first and falls back to the oriented full count
    * (the q_pagerank_delta flood-probe convention; measured at the
    * k=10 replica board: a whole-replica delta through these joins was
    * 0.7× retrain, through the fallback ≈ retrain, never worse). */
  private[graft] def triDeltaCount(ceNew: DataFrame, ceAll: DataFrame): DataFrame = {
    val symAll = ceAll.select(col("u").as("x"), col("v").as("y"))
      .unionAll(ceAll.select(col("v").as("x"), col("u").as("y")))
    val a = ceNew.as("e")
      .join(symAll.as("na"), col("na.x") === col("e.u"))
      .join(symAll.as("nb"),
        col("nb.x") === col("e.v") && col("nb.y") === col("na.y"))
      .agg(count(lit(1)).as("a1"))
    val symNew = ceNew.select(col("u").as("x"), col("v").as("y"))
      .unionAll(ceNew.select(col("v").as("x"), col("u").as("y")))
    val wedges = symNew.as("a").join(symNew.as("b"),
        col("a.x") === col("b.x") && col("a.y") < col("b.y"))
      .select(col("a.y").as("u"), col("b.y").as("v"))
    val w2 = wedges.join(ceAll, Seq("u", "v")).agg(count(lit(1)).as("w2"))
    val t3 = ceNew.as("e1")
      .join(ceNew.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(ceNew.as("e3"),
        col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .agg(count(lit(1)).as("t3"))
    a.crossJoin(broadcast(w2)).crossJoin(broadcast(t3))
      .select((col("a1") - col("w2") + col("t3")).as("d_tri"))
  }


  /** The frozen incremental-triangle artifact — tri-base, the TWELFTH
    * delta-family member: (split orderkey, pre-filter (c, s, cnt) order
    * census, UNFILTERED pair census (u, v, w), frozen triangle count)
    * over orders below the 7/8 split. Both censuses are monoidal under
    * append, so the refreeze rolls them forward with delta-sized writes
    * and counts only the NEW triangles (triDeltaCount) — the O(m^1.5)
    * wedge join runs once at train and never again (bulk slices: the
    * triEdgeFlooded fallback).
    *
    * ARTIFACT SIZE, stated plainly: the unfiltered pair census holds
    * every co-trading pair with w ≥ 1 — O(Σ_s C(deg_s, 2)) distinct
    * pairs, the quadratic term of the projection itself. That is the
    * price of threshold refreshability (a w = 1 pair must be findable
    * when a delta lifts it to 2), and it is the SAME magnitude the full
    * recompute shuffles transiently on every run — the artifact pays it
    * once in storage instead of per query. A deployment that cannot
    * afford it bounds the projection the way q_dedup_containment bounds
    * shingles (a supplier-degree cap excludes hub suppliers from pair
    * evidence — a semantic change that must then live in the oracle
    * too), or retrains on a cadence instead of refreshing. */
  private[graft] def triBase(s: SparkSession, d: String)
      : (Long, DataFrame, DataFrame, Long, Long) = {
    def pairsOf = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey").as("c"),
        col("l_suppkey").as("s"))
    graft.core.ModelCache.getOrRefreshGuarded(s, "tri-base", d) {
      val pairs = pairsOf
      val maxRow = pairs.agg(max(col("o_orderkey"))).head()
      val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp = 7L * maxKey / 8L
      val cen = pairs.filter(col("o_orderkey") < sp)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt")).localCheckpoint()
      val eo = cen.filter(col("cnt") >= TriMinRepeats).select("c", "s")
      val cp = triPairCensus(eo).localCheckpoint()
      val ce = cp.filter(col("w") >= TriMinShared).select("u", "v")
      // |eo| is FROZEN into the artifact (round-19 verdict ask #4): the
      // serve path's flood probe read it with a count() over the cached
      // census on EVERY serve — a count the artifact already knows. Paid
      // once here (train-side), rolled forward arithmetically below
      // (durable edges only appear under append: |eo'| = |eo| + |eoNew|).
      (sp, cen, cp, triCount(ce).head().getLong(0), eo.count())
    } { case ((sp0, cen0, cp0, tri0, nEo0), newFiles) =>
      // REFREEZE: merge the monoidal censuses with the [sp0, sp1) slice
      // and roll the triangle count forward with the SAME delta algebra
      // the serve path runs — the old graph's pair join never re-runs.
      // RefreshSpec pins refresh == retrain bit-identically, including
      // cnt and w threshold crossings caused by the slice.
      // Backfill guard (round-15 verdict #1): keys below sp0 in a new
      // file never enter the slice census — decline, retrain.
      if (tradeBackfilled(s, newFiles, sp0)) None
      else Some {
      val pairs = pairsOf
      val maxRow = pairs.agg(max(col("o_orderkey"))).head()
      val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp1 = math.max(7L * maxKey / 8L, sp0) // keys are monotone
      val cenS = pairs
        .filter(col("o_orderkey") >= sp0 && col("o_orderkey") < sp1)
        .groupBy("c", "s").agg(count(lit(1)).as("cnt"))
        // eager pin — same differently-pruned-consumers rationale as the
        // serve path's cenD (and em.dKeys feeds the cen1 anti-join too)
        .localCheckpoint()
      val em = triEoNew(cen0, cenS)
      // the containment-base roll shape: checkpoint only the TOUCHED
      // slice, keep the stored census a lazy anti-join ∪ overlay view
      // (flattenWide bounds the union depth across generations) — a
      // full-census groupBy+checkpoint per refreeze measured as the
      // dominant refresh cost (the pair census is the largest artifact)
      val cenTouched = em.cenTouched.localCheckpoint()
      val cen1 = graft.core.Session.flattenWide(
        cen0.join(em.dKeys, Seq("c", "s"), "left_anti").unionAll(cenTouched))
      val nNew = em.eoNew.count() // materializes the lazy eoNew checkpoint
      if (triEdgeFlooded(nNew, nEo0, frac = 16L)) {
        // bulk slice: rebuild the projection through the bounded
        // (blocked + oriented) machinery — only the old ORDER SCAN is
        // saved (cen rolls forward); refresh ≈ retrain, never worse.
        // eo1 is CHECKPOINTED first: cen1 is a lazy anti-join ∪ overlay
        // view, and the pair machinery scans its edge input 3× (side
        // census, degree, kv join) — unmaterialized, each scan re-runs
        // the roll (measured 25 s vs retrain's 12 s before this)
        val eo1 = cen1.filter(col("cnt") >= TriMinRepeats).select("c", "s")
          .localCheckpoint()
        val cp1 = triPairCensus(eo1).localCheckpoint()
        val ce1 = cp1.filter(col("w") >= TriMinShared).select("u", "v")
        (sp1, cen1, cp1, triCount(ce1).head().getLong(0), eo1.count())
      } else {
        val m = triMergeFrom(em.eoNew, em.eo0, cp0)
        val dwK = m.dw.select("u", "v")
        val cpTouched = m.dw.select(col("u"), col("v"), col("dw").as("w"))
          .unionAll(cp0.join(dwK, Seq("u", "v"), "left_semi"))
          .groupBy("u", "v").agg(sum(col("w")).as("w")).localCheckpoint()
        val cp1 = graft.core.Session.flattenWide(
          cp0.join(dwK, Seq("u", "v"), "left_anti").unionAll(cpTouched))
        (sp1, cen1, cp1,
          tri0 + triDeltaCount(m.ceNew, m.ceAll).head().getLong(0),
          nEo0 + nNew)
      }
      }
    }
  }

  /** Incremental triangle census — the TWELFTH delta-family member,
    * extending the incremental-graph story (q_components_delta labels,
    * q_pagerank_delta ranks) to the projection's TRIANGLE structure:
    * the SAME census as q_triangles, produced WITHOUT re-running either
    * quadratic step on the frozen corpus. The tri-base artifact supplies
    * the 7/8-orderkey-prefix order census, pair census, and triangle
    * count; serve-time aggregates ONLY the order tail, derives the
    * newly-durable edges and newly-projected pairs from the merged
    * monoidal censuses (the merge leg is LIVE in every oracle run), and
    * counts new triangles by inclusion–exclusion anchored on the new
    * edges (triDeltaCount) — behind the edge-axis FLOOD PROBE
    * (triEdgeFlooded): a tail holding more than a quarter of the merged
    * edges recomputes the projection through the bounded machinery
    * instead, so the serve cost is min(delta-proportional, rebuild),
    * never worse than either. The presentation censuses (degrees,
    * wedges, orientation max-outdeg) are linear passes over the merged
    * edge list. Oracle: q_triangles' SQL VERBATIM, so the hash gate
    * proves incremental == full across two engines; GraphSpec pins the
    * inclusion–exclusion on a hand-built graph with 1-, 2- and
    * 3-new-edge triangles; RefreshSpec covers BOTH probe branches. */
  val trianglesDelta: Q = Q("q_triangles_delta", triangles.oracle.get) { (s, d) =>
    val (sp, cen0, cp0, tri0, nEo0) = triBase(s, d)
    val cenD = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderkey") >= sp)
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt"))
      // EAGER pin (round-19, the vocab_growth/cooccur_lift lesson): the
      // two triEoNew legs consume cenD under DIFFERENT projections
      // (mergedTouched keeps cnt, dKeys prunes to (c, s) — column
      // pruning rewrites the aggregate), so their canonical plans differ
      // and runtime exchange reuse cannot dedupe them: the order-tail
      // scan + delta census ran twice per serve. One O(delta) checkpoint
      // runs it once — the same pin the streaming gate already carries.
      .localCheckpoint()
    val em = triEoNew(cen0, cenD)
    val (eoNew, eo0) = (em.eoNew, em.eo0)
    val nNew = eoNew.count() // materializes the lazy eoNew checkpoint
    val (ceAll, nTri) =
      if (triEdgeFlooded(nNew, nEo0, frac = 4L)) {
        // bulk tail (e.g. a long no-refreeze period): recompute the
        // projection through the bounded machinery rather than the
        // per-new-edge delta joins — the flood-fallback convention
        val cpAll = triPairCensus(eo0.unionAll(eoNew).localCheckpoint())
        val ce = cpAll.filter(col("w") >= TriMinShared).select("u", "v")
          .localCheckpoint()
        (ce, triCount(ce))
      } else {
        val m = triMergeFrom(eoNew, eo0, cp0)
        (m.ceAll, triDeltaCount(m.ceNew, m.ceAll)
          .select((lit(tri0) + col("d_tri")).as("n_triangles")))
      }
    val sym = ceAll.select(col("u").as("x"), col("v").as("y"))
      .unionAll(ceAll.select(col("v").as("x"), col("u").as("y")))
    val deg = sym.groupBy("x").agg(count(lit(1)).as("dg"))
    val oe = sym
      .join(deg.select(col("x"), col("dg").as("dx")), "x")
      .join(deg.select(col("x").as("y"), col("dg").as("dy")), "y")
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("x").as("src"), col("y").as("dst"))
    val od = oe.groupBy("src").agg(count(lit(1)).as("odg"))
      .agg(coalesce(max(col("odg")), lit(0L)).as("max_outdeg"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("dg * (dg - 1) div 2")), lit(0L)).as("n_wedges"))
    val edges = ceAll.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(od))
      .crossJoin(broadcast(nTri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("max_outdeg"), col("n_triangles"),
        when(col("n_wedges") === 0L, 0L)
          .otherwise(expr("(3 * n_triangles * 1000000) div n_wedges"))
          .as("ccoef_ppm"))
  }

  private val KCoreK = 2
  private val KCoreRounds = 4

  /** k-core peeling over the durable-trade graph — the degeneracy-based
    * graph-curation primitive (keep only nodes embedded in a subgraph
    * where everyone has ≥ k durable partners; the standard spam/fringe
    * filter before graph features feed a model). The peel loop — drop
    * every node with degree < k, recompute, repeat — is unrolled to a
    * FIXED `KCoreRounds` rounds (the q_pagerank convention: both engines
    * run the identical bounded rounds, no convergence probe crosses
    * engines), emitting per round the surviving node/edge counts and the
    * number peeled; `n_peeled = 0` rows are the in-result convergence
    * evidence. Exact integer math throughout.
    *
    * Scale shape per round: one partial-aggregating degree census + two
    * semi-joins of the edge state against the O(nodes) keep set —
    * shuffles keyed on node id, never wider than the edge list, with the
    * edge state localCheckpointed per round (flat lineage, the bpeTrain
    * pattern). Peeling strictly shrinks the state, so later rounds get
    * cheaper; real degeneracy orders run this same loop to fixpoint. */
  val kcore: Q = {
    // AS MATERIALIZED (oracle-only dialect): d_i/k_i/e_i are each
    // referenced 2-3 times per round — left to the inliner the chain
    // re-expands multiplicatively per round and the 10x-dir oracle runs
    // out of memory; materialization makes each round evaluate once,
    // exactly like the Spark side's per-round localCheckpoint
    def kr(i: Int): String =
      s"""d$i AS MATERIALIZED (SELECT src, count(*) AS deg FROM e${i - 1} GROUP BY src),
         |k$i AS MATERIALIZED (SELECT src AS node FROM d$i WHERE deg >= $KCoreK),
         |e$i AS MATERIALIZED (SELECT t.src, t.dst FROM e${i - 1} t
         |        JOIN k$i a ON a.node = t.src JOIN k$i b ON b.node = t.dst),
         |r$i AS (SELECT CAST($i AS BIGINT) AS round,
         |  (SELECT CAST(count(*) AS BIGINT) FROM k$i) AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e$i) AS n_edges,
         |  (SELECT CAST(count(*) AS BIGINT) FROM d$i)
         |    - (SELECT CAST(count(*) AS BIGINT) FROM k$i) AS n_peeled)""".stripMargin
    Q(
      "q_kcore",
      s"""WITH $durableEoSql,
         |e AS MATERIALIZED (SELECT c AS src, $SuppOffset + s AS dst FROM eo
         |      UNION ALL SELECT $SuppOffset + s AS src, c AS dst FROM eo),
         |e0 AS (SELECT src, dst FROM e),
         |${(1 to KCoreRounds).map(kr).mkString(",\n")}
         |SELECT * FROM (
         |${(1 to KCoreRounds).map(i => s"  SELECT * FROM r$i")
        .mkString("\n  UNION ALL\n")}
         |) ORDER BY round""".stripMargin
    ) { (s, d) =>
      kcorePeel(symmetricEdges(durablePairs(s, d)).localCheckpoint(),
        KCoreK, KCoreRounds)
    }
  }

  /** The peel loop itself, factored off the Q closure so GraphSpec can
    * drive it over crafted graphs (the uniform synthetic corpus peels in
    * one round; a path graph cascades one layer per round — the behavior
    * the bounded-rounds design exists for). `e0` must be a SYMMETRIC
    * directed edge list. */
  private[graft] def kcorePeel(e0: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = e0
    var out: DataFrame = null
    for (i <- 1 to rounds) {
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      // keep is a narrow filter of the ALREADY-checkpointed deg — each
      // consumer re-filters the cached rows map-side for free, so its own
      // checkpoint bought nothing but a job per round (round-18, §2.4)
      val keep = deg.filter(col("deg") >= k)
        .select(col("src").as("node"))
      val e2 = e
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst").localCheckpoint()
      val row = deg.agg(count(lit(1)).as("n_prev"))
        .crossJoin(keep.agg(count(lit(1)).as("n_nodes")))
        .crossJoin(e2.agg(count(lit(1)).as("n_edges")))
        .select(lit(i.toLong).as("round"), col("n_nodes"), col("n_edges"),
          (col("n_prev") - col("n_nodes")).as("n_peeled"))
      out = if (out == null) row else out.unionAll(row)
      e = e2
    }
    out.orderBy("round")
  }

  /** Full k-core DECOMPOSITION (core numbers) — the convergence-driven
    * completion of q_kcore's bounded peel: q_kcore answers "who survives
    * k=2 after 4 rounds"; a degeneracy user (graph curation, spam-rim
    * trimming, feature engineering) needs each node's LARGEST k. The
    * algorithm is the H-INDEX FIXPOINT of Lü/Chen/Ren/Zhang/Zhou/
    * Stanley, "The H-index of a network node and its relation to degree
    * and coreness" (Nature Communications 7:10168, 2016 — public
    * result): h_0(v) = deg(v); h_{t+1}(v) = H-index of v's neighbors'
    * h_t values (the largest r such that ≥ r neighbors have h_t ≥ r);
    * the sequence is monotonically non-increasing and its fixpoint is
    * exactly coreness(v). Unlike the sequential min-degree peel, every
    * update is a LOCAL aggregate over neighbors — embarrassingly
    * data-parallel, the right 100 TB shape (one edges ⋈ h join + one
    * per-node window + one partial agg per round, state O(nodes),
    * lineage truncated per round via Session.truncate exactly like
    * ccFixpoint). Convergence is detected by the sum probe (values only
    * decrease ⇒ unchanged sum IS the fixpoint — the ccFixpoint recipe),
    * so depth adapts to the graph: the uniform corpus converges in 2-3
    * rounds while GraphSpec's path fixture cascades one layer per round
    * past depth 4. The ORACLE runs the IDENTICAL iteration as a DuckDB
    * RECURSIVE CTE terminating on its own no-change probe (a window-max
    * over per-node change flags gates the next iteration) — two
    * unrelated fixpoint engines, same integers, the q_components
    * precedent. H-index of a desc-sorted multiset = max(least(rank,
    * value)) — rank ties are value-equal, so any tie order yields the
    * same max. */
  private[graft] def coreNumbersWithRounds(e: DataFrame): (DataFrame, Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("node").orderBy(col("nh").desc)
    var h = graft.core.Session.truncate(
      e.groupBy("src").agg(count(lit(1)).as("h"))
        .select(col("src").as("node"), col("h")),
      eager = false) // the round-cap sum probe below materializes
    // Graph-derived round cap (round-12 advice: a fixed 64 fails a
    // long-chain peel cascade the DuckDB oracle would iterate through).
    // Values are monotone non-increasing and a non-converged round
    // strictly decreases the sum by ≥1, so Σ initial degrees PROVABLY
    // bounds the rounds — the cap can only fire on a monotonicity bug,
    // which is exactly what the require below is for. Real graphs exit
    // on the sum probe within a handful of rounds.
    var prevSum = -1L
    var iter = 0
    var converged = false
    val cap = math.max(64L,
      h.agg(coalesce(sum(col("h")), lit(0L))).head().getLong(0) + 1L)
    while (!converged && iter < cap) {
      val nbr = e.join(h.select(col("node").as("dst"), col("h").as("nh")), "dst")
        .select(col("src").as("node"), col("nh"))
      h = graft.core.Session.truncate(
        nbr.withColumn("rk", row_number().over(w).cast("long"))
          .groupBy("node").agg(max(least(col("rk"), col("nh"))).as("h")),
        eager = false) // probed next line
      // h is monotonically non-increasing per node (Lü et al. thm 1), so
      // an unchanged sum IS the fixpoint (coalesce: empty graph converges
      // on the empty frame instead of throwing)
      val hSum = h.agg(coalesce(sum(col("h")), lit(0L))).head().getLong(0)
      converged = hSum == prevSum
      prevSum = hSum
      iter += 1
    }
    require(converged,
      s"core-number h-index fixpoint did not converge in $iter rounds")
    (h, iter)
  }

  val coreNumbers: Q = Q(
    "q_core_numbers",
    s"""WITH RECURSIVE $durableEoSql,
       |$durableESql,
       |hs AS (
       |  SELECT 0 AS it, src AS node, CAST(count(*) AS BIGINT) AS h
       |  FROM e GROUP BY src
       |  UNION ALL
       |  SELECT it, node, h FROM (
       |    SELECT nx.it, nx.node, nx.h,
       |      max(CASE WHEN nx.h <> pv.h THEN 1 ELSE 0 END) OVER () AS any_chg
       |    FROM (
       |      SELECT r.it, r.node, max(least(r.rk, r.nh)) AS h
       |      FROM (
       |        SELECT nb.it + 1 AS it, e2.src AS node, nb.h AS nh,
       |          CAST(row_number() OVER (
       |            PARTITION BY e2.src ORDER BY nb.h DESC) AS BIGINT) AS rk
       |        FROM e e2 JOIN hs nb ON nb.node = e2.dst
       |      ) r GROUP BY r.it, r.node
       |    ) nx JOIN hs pv ON pv.node = nx.node
       |  ) WHERE any_chg = 1
       |),
       |fin AS (SELECT node, h AS core FROM hs
       |        WHERE it = (SELECT max(it) FROM hs))
       |SELECT core, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(CASE WHEN node < $SuppOffset THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_customers,
       |  CAST(sum(CASE WHEN node >= $SuppOffset THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_suppliers
       |FROM fin GROUP BY core ORDER BY core""".stripMargin
  ) { (s, d) =>
    val (h, _) = coreNumbersWithRounds(
      symmetricEdges(durablePairs(s, d)).localCheckpoint())
    h.groupBy(col("h").as("core"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node") < SuppOffset, 1L).otherwise(0L)).as("n_customers"),
        sum(when(col("node") >= SuppOffset, 1L).otherwise(0L)).as("n_suppliers"))
      .orderBy("core")
  }

  /** Degree assortativity of the durable trade graph — the one-number
    * census that says whether hubs trade with hubs (r > 0) or hubs fan
    * out to leaves (r < 0, the expected shape for a bipartite
    * customer-supplier graph): the Pearson correlation of endpoint
    * degrees over edges. On the directed-both-ways edge list the two
    * endpoint marginals are IDENTICAL by construction, so the usual
    * sqrt-denominator collapses to one integer term and the whole
    * statistic is an exact rational: r = num/den with
    * num = M·Σ(d_u·d_v) − (Σd_u)², den = M·Σd_u² − (Σd_u)² (sums over
    * directed edges) — every term BIGINT at any realistic degree census
    * (the spec checks the headroom from the measured moments). Only the
    * final ppm rendering needs 128-bit (num·10⁶ overflows int64 at the
    * 10× dir): the oracle divides in HUGEINT, the Spark side reads the
    * ONE census row and scales in BigInt on the driver (the
    * z-order-census precedent — a 1-row control read, not data-plane
    * compute), both truncating toward zero sign-explicitly.
    *
    * Scale shape: the degree table is one partial-agg census; joining it
    * back on src and dst is the same two shuffles every rank round pays;
    * then a single 1-row global aggregate. O(edges) once, no iteration. */
  val assortativity: Q = Q(
    "q_assortativity",
    s"""WITH $durableEoSql,
       |$durableESql,
       |deg AS (SELECT src, count(*) AS dd FROM e GROUP BY src),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(a.dd) AS BIGINT) AS sum_d,
       |    CAST(sum(a.dd * b.dd) AS BIGINT) AS sum_dudv,
       |    CAST(sum(a.dd * a.dd) AS BIGINT) AS sum_d2
       |  FROM e JOIN deg a ON a.src = e.src JOIN deg b ON b.src = e.dst)
       |SELECT m, sum_d, sum_dudv, sum_d2,
       |  m * sum_dudv - sum_d * sum_d AS num,
       |  m * sum_d2 - sum_d * sum_d AS den,
       |  CAST(CASE WHEN m * sum_d2 - sum_d * sum_d = 0 THEN 0
       |    WHEN m * sum_dudv - sum_d * sum_d >= 0
       |    THEN CAST(m * sum_dudv - sum_d * sum_d AS HUGEINT) * 1000000
       |      // (m * sum_d2 - sum_d * sum_d)
       |    ELSE -(CAST(-(m * sum_dudv - sum_d * sum_d) AS HUGEINT) * 1000000
       |      // (m * sum_d2 - sum_d * sum_d)) END AS BIGINT) AS r_ppm
       |FROM m""".stripMargin
  ) { (s, d) =>
    val e = symmetricEdges(durablePairs(s, d)).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("dd"))
    val row = e
      .join(deg.select(col("src"), col("dd").as("du")), "src")
      .join(deg.select(col("src").as("dst"), col("dd").as("dv")), "dst")
      .agg(count(lit(1)).as("m"), sum(col("du")).as("sum_d"),
        sum(col("du") * col("dv")).as("sum_dudv"),
        sum(col("du") * col("du")).as("sum_d2"))
      .head()
    val (m, sumD, sumDudv, sumD2) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val num = m * sumDudv - sumD * sumD
    val den = m * sumD2 - sumD * sumD
    // the 128-bit ppm scaling, exact and sign-explicit (BigInt truncates
    // toward zero for both operand signs, matching the oracle's CASE)
    val rPpm =
      if (den == 0L) 0L
      else (BigInt(num) * 1000000 / BigInt(den)).toLong
    import s.implicits._
    Seq((m, sumD, sumDudv, sumD2, num, den, rPpm))
      .toDF("m", "sum_d", "sum_dudv", "sum_d2", "num", "den", "r_ppm")
  }

  /** Shared projection-graph CTE chain (oracle dialect) for the
    * projection-analytics ops below: `ce` = the co-trading projection
    * edges (u < v, customers sharing ≥ TriMinShared qualifying
    * suppliers — the exact q_triangles projection), `sym`/`deg` its
    * symmetric adjacency and degrees. AS MATERIALIZED (the q_kcore
    * lesson): each is referenced 2–4 times downstream, and the inlined
    * chain re-expands multiplicatively at the 10× dir. */
  private val projCtesSql =
    s"""$triEoSql,
       |cp AS (SELECT a.c AS u, b.c AS v, count(*) AS w
       |  FROM eo a JOIN eo b ON a.s = b.s AND a.c < b.c GROUP BY 1, 2),
       |ce AS MATERIALIZED (SELECT u, v FROM cp WHERE w >= $TriMinShared),
       |sym AS MATERIALIZED (SELECT u AS x, v AS y FROM ce
       |      UNION ALL SELECT v AS x, u AS y FROM ce),
       |deg AS MATERIALIZED (SELECT x, CAST(count(*) AS BIGINT) AS dg
       |  FROM sym GROUP BY x)""".stripMargin

  /** Co-trading projection edges (the first half of triangleCensus,
    * factored for reuse): customer pairs sharing ≥ TriMinShared
    * suppliers, built through the capped hub-split spoke-pair machinery
    * so no hub supplier explodes a shuffle key. Emits u < v. */
  private def projectionEdges(s: SparkSession, d: String): DataFrame = {
    val eo = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= TriMinRepeats)
      .select("c", "s")
      .localCheckpoint() // feeds the census read + the pair join
    val (sKeys, nEdges, _) = sideCensus(eo, "s")
    blockedSpokePairs(eo.select(col("s").as("k"), col("c").as("v")),
        wedgeCap(nEdges, sKeys))
      .groupBy("v1", "v2").agg(count(lit(1)).as("w"))
      .filter(col("w") >= TriMinShared)
      .select(col("v1").as("u"), col("v2").as("v"))
  }

  /** Common-neighbor link prediction on the co-trading projection — the
    * graph-completion primitive (recommend a not-yet-observed pairing
    * from shared structure; in a curation pipeline, the "these two
    * sources behave alike" signal). For every NON-adjacent customer
    * pair sharing ≥1 neighbor: the common-neighbor count and the exact
    * integer Jaccard of their neighborhoods, top 25 under a total
    * order. A predicted link must out-score existing structure to be
    * actionable, so both endpoint degrees ship with each row.
    *
    * Scale shape: candidate pairs are enumerated per MID-node adjacency
    * through the same capped hub-split machinery as the butterfly /
    * triangle censuses (blockedSpokePairs — a hub's C(deg,2) pair work
    * is spread across ~cap²-sized blocks, never one shuffle key); the
    * total is the projection's open-wedge count, the same Σ C(deg,2)
    * budget q_triangles reports as n_wedges. Non-adjacency is one
    * left_anti join against the edge list; everything else is
    * partial-agg + broadcast-sized joins on node ids. */
  val linkPredict: Q = Q(
    "q_link_predict",
    s"""WITH $projCtesSql,
       |wp AS MATERIALIZED (SELECT a.y AS u, b.y AS v,
       |    CAST(count(*) AS BIGINT) AS cn
       |  FROM sym a JOIN sym b ON a.x = b.x AND a.y < b.y GROUP BY 1, 2),
       |cand AS (SELECT wp.u, wp.v, wp.cn FROM wp
       |  WHERE NOT EXISTS (SELECT 1 FROM ce WHERE ce.u = wp.u AND ce.v = wp.v))
       |SELECT c.u, c.v, c.cn, du.dg AS deg_u, dv.dg AS deg_v,
       |  CAST(c.cn * 1000000 // (du.dg + dv.dg - c.cn) AS BIGINT) AS jaccard_ppm
       |FROM cand c JOIN deg du ON du.x = c.u JOIN deg dv ON dv.x = c.v
       |ORDER BY jaccard_ppm DESC, cn DESC, u, v LIMIT 25""".stripMargin
  ) { (s, d) =>
    val ce = projectionEdges(s, d).localCheckpoint() // sym (2×) + anti join
    val sym = ce.select(col("u").as("x"), col("v").as("y"))
      .unionAll(ce.select(col("v").as("x"), col("u").as("y")))
      .localCheckpoint() // feeds deg + the wedge enumeration
    val deg = sym.groupBy("x").agg(count(lit(1)).as("dg")).localCheckpoint()
    val r = deg.agg(count(lit(1)), coalesce(sum(col("dg")), lit(0L))).head()
    val wp = blockedSpokePairs(sym.select(col("x").as("k"), col("y").as("v")),
        wedgeCap(nEdges = r.getLong(1), nKeys = r.getLong(0)))
      .groupBy("v1", "v2").agg(count(lit(1)).as("cn"))
    wp.join(ce, wp("v1") === ce("u") && wp("v2") === ce("v"), "left_anti")
      .join(deg.select(col("x").as("v1"), col("dg").as("deg_u")), "v1")
      .join(deg.select(col("x").as("v2"), col("dg").as("deg_v")), "v2")
      .select(col("v1").as("u"), col("v2").as("v"), col("cn"),
        col("deg_u"), col("deg_v"),
        expr("cn * 1000000 div (deg_u + deg_v - cn)").as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("cn").desc, col("u"), col("v"))
      .limit(25)
  }

  /** Per-node clustering-coefficient census of the co-trading
    * projection — the LOCAL breakdown of q_triangles' single global
    * coefficient (a spam/bot-farm signature is exactly "high degree,
    * near-zero local clustering", invisible in the global number).
    * Buckets nodes by cc_ppm deciles (bucket −1 = degree-1 nodes with
    * no wedge to close); per bucket the node count, total triangle
    * participations, and the degree range — the shape a curation gate
    * thresholds on. Exact integer math; Σ sum_tri = 3 · n_triangles
    * (every triangle counted at each of its three corners, the spec's
    * cross-anchor to q_triangles).
    *
    * Scale shape: identical bounds to triangleCensus — the oriented
    * wedge join's per-key work is capped at √(2m) by the
    * degree-orientation argument — plus one explode-free 3-way union of
    * the triangle rows (localCheckpointed once) and an O(nodes)
    * partial-agg. */
  val localClustering: Q = Q(
    "q_local_clustering",
    s"""WITH $projCtesSql,
       |oe AS MATERIALIZED (SELECT s.x AS src, s.y AS dst FROM sym s
       |  JOIN deg da ON da.x = s.x JOIN deg db ON db.x = s.y
       |  WHERE (da.dg, s.x) < (db.dg, s.y)),
       |tr AS MATERIALIZED (SELECT a.src AS n1, cl.src AS n2, cl.dst AS n3
       |  FROM oe a JOIN oe b ON b.src = a.src AND b.dst != a.dst
       |  JOIN oe cl ON cl.src = a.dst AND cl.dst = b.dst),
       |tn AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM (
       |    SELECT n1 AS n FROM tr UNION ALL SELECT n2 FROM tr
       |    UNION ALL SELECT n3 FROM tr) GROUP BY n),
       |pc AS (SELECT d.x AS node, d.dg, coalesce(tn.t, 0) AS t,
       |    CASE WHEN d.dg < 2 THEN -1
       |      ELSE CAST(coalesce(tn.t, 0) * 1000000
       |        // (d.dg * (d.dg - 1) // 2) AS BIGINT) END AS cc_ppm
       |  FROM deg d LEFT JOIN tn ON tn.n = d.x)
       |SELECT CAST(CASE WHEN cc_ppm < 0 THEN -1
       |    ELSE cc_ppm // 100000 END AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_nodes, CAST(sum(t) AS BIGINT) AS sum_tri,
       |  CAST(min(dg) AS BIGINT) AS min_deg, CAST(max(dg) AS BIGINT) AS max_deg
       |FROM pc GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    val ce = projectionEdges(s, d).localCheckpoint()
    val sym = ce.select(col("u").as("x"), col("v").as("y"))
      .unionAll(ce.select(col("v").as("x"), col("u").as("y")))
    val deg = sym.groupBy("x").agg(count(lit(1)).as("dg")).localCheckpoint()
    val oe = sym
      .join(deg.select(col("x"), col("dg").as("dx")), "x")
      .join(deg.select(col("x").as("y"), col("dg").as("dy")), "y")
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("x").as("src"), col("y").as("dst"))
      .localCheckpoint() // wedge join (2×) + the closing join
    val tr = oe.as("a").join(oe.as("b"),
        col("a.src") === col("b.src") && col("a.dst") =!= col("b.dst"))
      .select(col("a.src").as("n1"), col("a.dst").as("p"), col("b.dst").as("q"))
      .join(oe.as("cl"), col("p") === col("cl.src") && col("q") === col("cl.dst"))
      .select(col("n1"), col("p").as("n2"), col("q").as("n3"))
      .localCheckpoint() // the 3-way corner union reads it three times
    val tn = tr.select(col("n1").as("n"))
      .unionAll(tr.select(col("n2").as("n")))
      .unionAll(tr.select(col("n3").as("n")))
      .groupBy("n").agg(count(lit(1)).as("t"))
    deg.join(tn, col("x") === col("n"), "left")
      .select(col("dg"), coalesce(col("t"), lit(0L)).as("t"))
      .withColumn("cc_ppm", when(col("dg") < 2, lit(-1L))
        .otherwise(expr("t * 1000000 div (dg * (dg - 1) div 2)")))
      .groupBy(when(col("cc_ppm") < 0, lit(-1L))
        .otherwise(expr("cc_ppm div 100000")).as("bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("t")).as("sum_tri"),
        min(col("dg")).as("min_deg"), max(col("dg")).as("max_deg"))
      .orderBy("bucket")
  }

  /** SALSA hub/authority scoring on the bipartite trade graph (Lempel &
    * Moran 2000) — the degree-normalized HITS variant, and the natural
    * exact-integer one: classic HITS rescales by a max/norm each round
    * (a 1e6-scaled multiply that overflows int64 once a hub's raw score
    * passes ~9e12 — reachable at the 100 TB corpus this is designed
    * for), while SALSA's random-walk update `a(s) = Σ_c h(c) div deg(c)`
    * / `h(c) = Σ_s a(s) div deg(s)` only ever floor-divides before
    * summing, so scores stay bounded by the initial mass (n·1e6) with no
    * rescale step — the exact q_pagerank damping-arithmetic recipe on
    * the UNPROJECTED bipartite structure. Customers are hubs (they point
    * at what they buy), suppliers are authorities; `Iters` unrolled
    * alternating half-rounds; top 15 per role under a total order.
    *
    * Scale shape: per half-round one (pairs ⋈ score) shuffle on the
    * sending side's key plus one partial-aggregating shuffle on the
    * receiving side's — identical bounds to a q_pagerank round. The
    * degree-annotated pair list is built once (localCheckpoint) and
    * reused by all 2·Iters half-rounds; no window, no driver state, and
    * the final top-15s are partial TakeOrdered, never a global sort. */
  val salsa: Q = Q(
    "q_salsa",
    s"""WITH eo AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |dc AS MATERIALIZED (SELECT c, CAST(count(*) AS BIGINT) AS d FROM eo GROUP BY c),
       |ds AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS d FROM eo GROUP BY s),
       |h0 AS (SELECT c AS node, CAST(1000000 AS BIGINT) AS v FROM dc),
       |${(1 to Iters).map { i =>
      s"""a$i AS MATERIALIZED (SELECT eo.s AS node, CAST(sum(h.v // dc.d) AS BIGINT) AS v
         |  FROM eo JOIN dc ON dc.c = eo.c JOIN h${i - 1} h ON h.node = eo.c
         |  GROUP BY eo.s),
         |h$i AS MATERIALIZED (SELECT eo.c AS node, CAST(sum(a.v // ds.d) AS BIGINT) AS v
         |  FROM eo JOIN ds ON ds.s = eo.s JOIN a$i a ON a.node = eo.s
         |  GROUP BY eo.c)""".stripMargin
    }.mkString(",\n")}
       |SELECT role, node, score FROM (
       |  SELECT 'authority' AS role, node, v AS score FROM
       |    (SELECT node, v FROM a$Iters ORDER BY v DESC, node LIMIT 15)
       |  UNION ALL
       |  SELECT 'hub' AS role, node, v AS score FROM
       |    (SELECT node, v FROM h$Iters ORDER BY v DESC, node LIMIT 15))
       |ORDER BY role, score DESC, node""".stripMargin
  ) { (s, d) =>
    val eo = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .localCheckpoint() // feeds both degree censuses + every half-round
    // degree normalization stays NODE-level (h div deg joined on the
    // score table, O(nodes) rows) rather than widening every pair row
    // with both degrees — the pair-level join per half-round then ships
    // only (key, contribution). Eager checkpoints: dc feeds h0 AND every
    // a-round's normalization join (ds every h-round's) — with the chain
    // below unmaterialized those are concurrent consumers inside ONE
    // job, and a lazy checkpoint would let each leg recompute the
    // aggregate before any of them persists it.
    val dc = eo.groupBy("c").agg(count(lit(1)).as("cd")).localCheckpoint()
    val ds = eo.groupBy("s").agg(count(lit(1)).as("sd")).localCheckpoint()
    val h0 = dc.select(col("c"), lit(1000000L).as("hv"))
    // Checkpoint EACH half-round (the round-17 shape, re-instated in
    // round 19): round 18 dematerialized the single-consumer chain and
    // truncated only the final authority fan-out (46 → 28-30 serve
    // jobs), but the driver bench regressed 0.82× and a round-19
    // order-balanced A/B (4 runs per shape, one binary, env-switched,
    // normalized by two code-identical control queries in the same
    // filtered runs) reproduced it: dematerialized 5.58-6.20 s vs
    // per-half-round 4.72-5.59 s — 3 of 4 normalized pairs lose outside
    // the window noise. Fewer driver round trips did NOT buy wall here;
    // the paired-measurement rule (BASELINE.md) says the wall evidence
    // wins, so the checkpoints stay.
    val (aF, hF) = (1 to Iters).foldLeft((null: DataFrame, h0)) {
      case ((_, h), _) =>
        val a = graft.core.Session.truncate(
          eo.join(h.join(dc, "c").select(col("c"), expr("hv div cd").as("hc")), "c")
            .groupBy("s").agg(sum(col("hc")).as("av")))
        val hn = graft.core.Session.truncate(
          eo.join(a.join(ds, "s").select(col("s"), expr("av div sd").as("ac")), "s")
            .groupBy("c").agg(sum(col("ac")).as("hv")))
        (a, hn)
    }
    aF.orderBy(col("av").desc, col("s")).limit(15)
      .select(lit("authority").as("role"), col("s").as("node"), col("av").as("score"))
      .unionAll(hF.orderBy(col("hv").desc, col("c")).limit(15)
        .select(lit("hub").as("role"), col("c").as("node"), col("hv").as("score")))
      .orderBy(col("role"), col("score").desc, col("node"))
  }

  /** Walk-step budget and start-set size for q_random_walk — one
    * constant pair shared by both engines (the MaxHops convention). */
  private val WalkSteps = 6
  private val WalkStarts = 8

  /** Deterministic pseudo-random walks over the symmetric trade graph —
    * the sampling stage of DeepWalk/node2vec-style embedding training
    * made reproducible: from each of the `WalkStarts` highest-degree
    * nodes, walk `WalkSteps` steps, choosing the next neighbor by a pure
    * integer hash of (current node, step) modulo the degree — both
    * engines evaluate the identical multiply/add/mod chain over int64
    * (node·2654435761 stays < 2^63 for node ids < ~3.4e9, ~2 orders
    * beyond the 100 TB customer count), so the full traces agree
    * bit-for-bit with no RNG state to ship. Neighbor index → neighbor is
    * resolved through a rank-annotated adjacency (row_number over dst
    * within src), the same per-key bounded window as q_window_rank.
    * Emits the complete traces: (walk_id = start node, step, node).
    *
    * Scale shape: the adjacency ranking is ONE window shuffle on src
    * (per-key work bounded by max degree), checkpointed and reused by
    * all steps; each step then joins an O(WalkStarts)-row frontier
    * against it — Spark broadcasts the frontier, so a step is one
    * broadcast-hash probe over the adjacency, no shuffle. Walks never
    * terminate early: the symmetric edge list gives every node
    * out-degree ≥ 1. */
  val randomWalk: Q = Q(
    "q_random_walk",
    s"""WITH $edgeCtesSql,
       |adj AS MATERIALIZED (SELECT src, dst,
       |    row_number() OVER (PARTITION BY src ORDER BY dst) AS rn,
       |    CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS d
       |  FROM e),
       |starts AS (SELECT src AS node FROM deg ORDER BY d DESC, src LIMIT $WalkStarts),
       |w0 AS (SELECT node AS walk_id, CAST(0 AS BIGINT) AS step, node FROM starts),
       |${(1 to WalkSteps).map { t =>
      s"""w$t AS MATERIALIZED (SELECT w.walk_id, CAST($t AS BIGINT) AS step,
         |  a.dst AS node FROM w${t - 1} w JOIN adj a ON a.src = w.node
         |  AND a.rn = 1 + (w.node * 2654435761 + $t * 40503) % a.d)""".stripMargin
    }.mkString(",\n")}
       |SELECT walk_id, step, node FROM (
       |  ${(0 to WalkSteps).map(t => s"SELECT * FROM w$t").mkString(" UNION ALL ")})
       |ORDER BY walk_id, step""".stripMargin
  ) { (s, d) =>
    val (e, _) = edgesOf(s, d)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
    // Round-18 optimization (guide §2.4): degree as a SECOND window over
    // the same partitioning instead of the deg-aggregate join — the
    // count window needs only src-clustering, which the row_number sort
    // on (src, dst) already provides, so Catalyst plans both WindowExecs
    // over ONE exchange and ONE sort. The previous shape paid a separate
    // full aggregation pass over e plus a join to re-attach d.
    val adj = e
      .withColumn("rn", row_number().over(w.orderBy("dst")).cast("long"))
      .withColumn("d", count(lit(1)).over(w))
      .localCheckpoint() // every step probes it
    // top-degree starts read the checkpointed adjacency (rn = 1 picks one
    // row per src) instead of re-aggregating e
    val starts = adj.filter(col("rn") === 1L)
      .orderBy(col("d").desc, col("src")).limit(WalkStarts)
      .select(col("src").as("node"))
    val w0 = starts.select(col("node").as("walk_id"), lit(0L).as("step"), col("node"))
    // checkpoint each frontier: the final union evaluates every step
    // independently, so an unmaterialized step t would replay steps 1..t
    // (21 probes instead of 6 for the 7-member union)
    val trace = (1 to WalkSteps).scanLeft(w0) { case (front, t) =>
      graft.core.Session.truncate(
        broadcast(front.select(col("walk_id"), col("node").as("cur")))
          .join(adj, col("cur") === col("src") &&
            col("rn") === lit(1L) + (col("cur") * 2654435761L + t * 40503L) % col("d"))
          .select(col("walk_id"), lit(t.toLong).as("step"), col("dst").as("node")))
    }
    trace.reduce(_ unionAll _).orderBy("walk_id", "step")
  }

  /** Hub count for q_percolation — one constant for both engines (the
    * MaxHops convention). 3 keeps the after-graph nonempty even at
    * sf0.001, where the durable graph has only ~10 suppliers. */
  private val PercK = 3

  /** Targeted-attack percolation census: remove the `PercK` highest-
    * degree nodes from the durable trade graph and re-run the full
    * connected-components closure — does the structure hinge on a few
    * hubs (giant component collapses, nodes strand) or survive
    * (robustness)? For a dedup/near-dup cluster graph this is the "is
    * our cluster structure one hub document away from dissolving" audit;
    * q_components says what is connected, this says how FRAGILE that
    * connectivity is. Emits one row per phase (before/after): node,
    * edge, component counts, the giant component's size, and the nodes
    * STRANDED by the removal (every edge they had went to a removed
    * hub — they leave the edge-list graph entirely, the direct victims
    * of the attack).
    *
    * Scale shape: both phases run the identical pointer-jumping fixpoint
    * machinery as q_components (O(log diameter) rounds of edge⋈label +
    * min partial-agg); hub removal is two broadcast anti-joins against a
    * PercK-row list; the summaries are 1-row control reads (the
    * q_assortativity convention). The oracle re-walks both closures as
    * RECURSIVE CTEs — two unrelated fixpoint engines agreeing twice. */
  val percolation: Q = Q(
    "q_percolation",
    s"""WITH RECURSIVE $durableEoSql,
       |$durableESql,
       |deg AS (SELECT src, count(*) AS dd FROM e GROUP BY src),
       |hubs AS MATERIALIZED (SELECT src AS h FROM deg
       |  ORDER BY dd DESC, src LIMIT $PercK),
       |e2 AS MATERIALIZED (SELECT src, dst FROM e
       |  WHERE src NOT IN (SELECT h FROM hubs)
       |    AND dst NOT IN (SELECT h FROM hubs)),
       |reach AS (
       |  SELECT src AS node, dst AS r FROM e
       |  UNION
       |  SELECT re.node, x.dst FROM reach re JOIN e x ON re.r = x.src),
       |comp AS MATERIALIZED (SELECT node, least(node, min(r)) AS root
       |  FROM reach GROUP BY node),
       |reach2 AS (
       |  SELECT src AS node, dst AS r FROM e2
       |  UNION
       |  SELECT re.node, x.dst FROM reach2 re JOIN e2 x ON re.r = x.src),
       |comp2 AS MATERIALIZED (SELECT node, least(node, min(r)) AS root
       |  FROM reach2 GROUP BY node)
       |SELECT phase, n_nodes, n_edges, n_components, giant_size, n_stranded
       |FROM (
       |  SELECT 'after' AS phase,
       |    CAST(coalesce((SELECT count(*) FROM comp2), 0) AS BIGINT) AS n_nodes,
       |    CAST((SELECT count(*) FROM e2) AS BIGINT) AS n_edges,
       |    CAST(coalesce((SELECT count(DISTINCT root) FROM comp2), 0) AS BIGINT)
       |      AS n_components,
       |    CAST(coalesce((SELECT max(n) FROM
       |      (SELECT count(*) AS n FROM comp2 GROUP BY root)), 0) AS BIGINT)
       |      AS giant_size,
       |    CAST((SELECT count(*) FROM comp) - $PercK
       |      - coalesce((SELECT count(*) FROM comp2), 0) AS BIGINT) AS n_stranded
       |  UNION ALL
       |  SELECT 'before',
       |    CAST((SELECT count(*) FROM comp) AS BIGINT),
       |    CAST((SELECT count(*) FROM e) AS BIGINT),
       |    CAST((SELECT count(DISTINCT root) FROM comp) AS BIGINT),
       |    CAST((SELECT max(n) FROM
       |      (SELECT count(*) AS n FROM comp GROUP BY root)) AS BIGINT),
       |    CAST(0 AS BIGINT))
       |ORDER BY phase""".stripMargin
  ) { (s, d) =>
    val e = symmetricEdges(durablePairs(s, d)).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("dd"))
    val hubs = deg.orderBy(col("dd").desc, col("src")).limit(PercK)
      .select(col("src").as("h")).localCheckpoint() // both anti-joins read it
    val e2 = e
      .join(broadcast(hubs), col("src") === col("h"), "left_anti")
      .join(broadcast(hubs), col("dst") === col("h"), "left_anti")
      .localCheckpoint()
    // (n_nodes, n_edges, n_components, giant) via two 1-row control reads
    def summary(edges: DataFrame): (Long, Long, Long, Long) = {
      val nEdges = edges.count()
      if (nEdges == 0L) (0L, 0L, 0L, 0L)
      else {
        val lab = ccFixpoint(edges)
        val sizes = lab.groupBy("lbl").agg(count(lit(1)).as("n"))
        val r = sizes.agg(coalesce(sum(col("n")), lit(0L)),
          count(lit(1)), coalesce(max(col("n")), lit(0L))).head()
        (r.getLong(0), nEdges, r.getLong(1), r.getLong(2))
      }
    }
    // Round-18 optimization (guide §2.6): the before/after closures are
    // INDEPENDENT fixpoints over already-checkpointed edge lists — run
    // them as concurrent driver threads so the after-graph's rounds
    // back-fill cores idled by the before-graph's convergence tail.
    // Results are unchanged (each fixpoint is deterministic and touches
    // only its own frames); Spark's scheduler interleaves the two job
    // streams, FIFO.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fb = Future(summary(e))
    val fa = Future(summary(e2))
    val (nb, eb, cb, gb) = Await.result(fb, Duration.Inf)
    val (na, ea, ca, ga) = Await.result(fa, Duration.Inf)
    import s.implicits._
    Seq(("after", na, ea, ca, ga, nb - PercK - na),
      ("before", nb, eb, cb, gb, 0L))
      .toDF("phase", "n_nodes", "n_edges", "n_components", "giant_size",
        "n_stranded")
      .orderBy("phase")
  }

  val all: Seq[Q] =
    Seq(pagerank, pagerankDelta, degreeHist, labelProp, modularity,
      components, componentsDelta, reachHops, butterflies, triangles,
      trianglesDelta,
      kcore, coreNumbers, assortativity, linkPredict, localClustering,
      salsa, randomWalk, percolation)
}
