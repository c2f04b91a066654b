package graft.ops

import graft.SparkSuite

/** Graph-module invariants the oracle compare can't express: rank
  * bounds, node-space disjointness, and the distributed plan shape of
  * the iteration step. */
class GraphSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

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
}
