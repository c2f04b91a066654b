package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Round-19 verdict ask #7: q_percolation runs its before/after
  * component closures from TWO concurrent driver threads (Future/Await —
  * guide §2.6 job overlap). Deterministic by construction TODAY because
  * the two fixpoints touch only their own frames — but nothing pinned
  * that, so a future edit adding shared mutable state would break
  * silently. This spec pins it three ways: the threaded query's output
  * equals a SEQUENTIALLY recomputed census over the same machinery,
  * repeated runs are bit-identical, and the fixture exercises a
  * non-trivial attack (hub removal strands nodes and splits a
  * component). */
class PercolationConcurrencySpec extends SparkSuite {
  import spark.implicits._

  /** Write orders+lineitem so the durable graph (pair count ≥ 4) is a
    * hub-and-spoke plus a separate chain: removing the PercK=3 highest-
    * degree nodes strands spokes and changes component structure. Every
    * (order, supplier) pair repeats 4× via 4 line items on one order. */
  private def writeTrade(dir: String): Unit = {
    // durable pairs (c, s): hub customer 1 trades suppliers 10..15;
    // chain: c2-s10, c3-s11, c4-s16; c5-s16 (attack survivor pair)
    val pairs = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L), (1L, 15L),
      (2L, 10L), (3L, 11L), (4L, 16L), (5L, 16L))
    val orders = pairs.zipWithIndex.map { case ((c, _), i) =>
      (100L + i, c)
    }.toDF("o_orderkey", "o_custkey")
    val lineitem = pairs.zipWithIndex.flatMap { case ((_, s), i) =>
      (0 until 4).map(_ => (100L + i, s))
    }.toDF("l_orderkey", "l_suppkey")
    orders.coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lineitem.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("two-thread percolation == sequential recompute, and reruns are bit-identical") {
    val d = tmpDir("percolation-conc")
    writeTrade(d)
    val threaded = rows(Graph.percolation.fn(spark, d))

    // sequential recompute through the same building blocks, one phase
    // at a time on this thread — the pre-round-18 execution order
    val e = Graph.symmetricEdges(Graph.durablePairs(spark, d)).localCheckpoint()
    val hubs = e.groupBy("src").agg(count(lit(1)).as("dd"))
      .orderBy(col("dd").desc, col("src")).limit(3)
      .select(col("src").as("h")).localCheckpoint()
    val e2 = e
      .join(broadcast(hubs), col("src") === col("h"), "left_anti")
      .join(broadcast(hubs), col("dst") === col("h"), "left_anti")
      .localCheckpoint()
    def summary(edges: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
      val nEdges = edges.count()
      if (nEdges == 0L) (0L, 0L, 0L, 0L)
      else {
        val lab = Graph.ccFixpoint(edges)
        val sizes = lab.groupBy("lbl").agg(count(lit(1)).as("n"))
        val r = sizes.agg(coalesce(sum(col("n")), lit(0L)),
          count(lit(1)), coalesce(max(col("n")), lit(0L))).head()
        (r.getLong(0), nEdges, r.getLong(1), r.getLong(2))
      }
    }
    val (nb, eb, cb, gb) = summary(e)
    val (na, ea, ca, ga) = summary(e2)
    val expected = rows(Seq(
      ("after", na, ea, ca, ga, nb - 3 - na),
      ("before", nb, eb, cb, gb, 0L))
      .toDF("phase", "n_nodes", "n_edges", "n_components", "giant_size",
        "n_stranded")
      .orderBy("phase"))

    assert(threaded == expected,
      s"threaded percolation diverged from sequential: $threaded vs $expected")
    // the attack must do something, or the concurrency pin is vacuous
    assert(nb - 3 - na > 0, "fixture must strand at least one node")
    assert(na > 0, "after-graph must stay nonempty")
    // repeated threaded runs are bit-identical (no cross-thread state)
    (1 to 2).foreach { i =>
      assert(rows(Graph.percolation.fn(spark, d)) == threaded,
        s"rerun $i diverged — nondeterminism under concurrent driver threads")
    }
  }
}
