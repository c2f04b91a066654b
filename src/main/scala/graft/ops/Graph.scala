package graft.ops

import org.apache.spark.sql.DataFrame
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
  val pagerank: Q = Q(
    "q_pagerank",
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
  ) { (s, d) =>
    val (e, deg) = edgesOf(s, d)
    // edges + degrees feed every round: materialize once, not per round
    val ed = e.join(deg, "src").localCheckpoint()
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
  val labelProp: Q = Q(
    "q_label_prop",
    s"""WITH eo AS (SELECT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS (SELECT c AS src, $SuppOffset + s AS dst FROM eo
       |      UNION ALL SELECT $SuppOffset + s AS src, c AS dst FROM eo),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |l0 AS (SELECT src AS node, src AS lbl FROM deg),
       |${(1 to Iters).map { i =>
      s"""l$i AS (SELECT node, min(lbl) AS lbl FROM (
         |  SELECT e.dst AS node, l.lbl FROM e
         |  JOIN l${i - 1} l ON l.node = e.src
         |  UNION ALL SELECT node, lbl FROM l${i - 1}) GROUP BY node)""".stripMargin
    }.mkString(",\n")}
       |SELECT lbl AS community, count(*) AS n_nodes,
       |  CAST(min(node) AS BIGINT) AS min_node,
       |  CAST(max(node) AS BIGINT) AS max_node
       |FROM l$Iters GROUP BY lbl
       |ORDER BY n_nodes DESC, community LIMIT 25""".stripMargin
  ) { (s, d) =>
    val eo = T.orders(s, d)
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select("c", "s")
    val e = eo.select(col("c").as("src"), (col("s") + SuppOffset).as("dst"))
      .unionAll(eo.select((col("s") + SuppOffset).as("src"), col("c").as("dst")))
    val ed = e.localCheckpoint()
    val l0 = ed.groupBy("src").agg(count(lit(1)).as("d"))
      .select(col("src").as("node"), col("src").as("lbl"))
    val lFinal = (1 to Iters).foldLeft(l0) { case (l, _) =>
      ed.join(l.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("lbl"))
        .unionAll(l)
        .groupBy("node")
        .agg(min(col("lbl")).as("lbl"))
    }
    lFinal
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_node"),
        max(col("node")).as("max_node"))
      .orderBy(col("n_nodes").desc, col("community"))
      .limit(25)
  }

  val all: Seq[Q] = Seq(pagerank, degreeHist, labelProp)
}
