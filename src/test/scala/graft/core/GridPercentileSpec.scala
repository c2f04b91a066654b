package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** GridPercentile must equal Spark's PercentileDisc (and therefore the
  * DuckDB oracle, which the q_quantiles/q_mad gates pin) on ARBITRARY
  * distributions — not just the lineitem grids the oracle exercises.
  * Randomized but seeded: negatives, money grids, heavy ties, singleton
  * groups, sparse nulls, and bucket steps that are both coarser and finer
  * than the data spread. */
class GridPercentileSpec extends SparkSuite {
  import spark.implicits._

  private val ps = Seq(0.01, 0.5, 0.9, 0.99)

  private def refDisc(df: org.apache.spark.sql.DataFrame, p: Double): Map[String, Double] =
    df.groupBy("g")
      .agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").as("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def randomDf(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val groups = Seq("a", "b", "c", "singleton")
    val rows = groups.flatMap { g =>
      val n = if (g == "singleton") 1 else 1 + rnd.nextInt(400)
      (0 until n).map { _ =>
        val v: java.lang.Double = rnd.nextInt(4) match {
          case 0 => math.round(rnd.nextGaussian() * 5000) / 100.0 // money grid, negatives
          case 1 => rnd.nextInt(10).toDouble                      // heavy ties
          case 2 => rnd.nextDouble() * 1e6 - 5e5                  // wide continuous
          case _ => if (rnd.nextInt(20) == 0) null else rnd.nextInt(1000).toDouble
        }
        (g, v)
      }
    }
    rnd.shuffle(rows).toDF("g", "v")
  }

  test("disc (flat grid) equals PercentileDisc on random distributions") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val df = randomDf(seed)
      for (p <- ps) {
        val got = GridPercentile.disc(df, Seq("g"), "v", Seq("x" -> p))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got == refDisc(df, p), s"seed=$seed p=$p")
      }
    }
  }

  test("discBucketed equals PercentileDisc for coarse, fine, and mismatched steps") {
    for (seed <- Seq(3L, 11L); step <- Seq(0.07, 16.0, 100000.0)) {
      val df = randomDf(seed)
      for (p <- ps) {
        val got = GridPercentile
          .discBucketed(df, Seq("g"), "v", step, "x", p)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got == refDisc(df, p), s"seed=$seed step=$step p=$p")
      }
    }
  }

  test("discBucketedOnGrid on a real weighted grid equals discBucketed on the expanded rows") {
    for (seed <- Seq(5L, 13L); p <- ps) {
      val df = randomDf(seed).where(col("v").isNotNull)
      val grid = df.groupBy("g", "v").agg(count(lit(1)).as("w"))
      val viaGrid = GridPercentile
        .discBucketedOnGrid(grid, Seq("g"), "v", "w", 16.0, "x", p, Some("n"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      val viaRows = GridPercentile
        .discBucketed(df, Seq("g"), "v", 16.0, "x", p, Some("n"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      assert(viaGrid == viaRows, s"seed=$seed p=$p")
    }
  }

  test("disc keeps a group whose values are ALL NULL (NULL percentile, count 0)") {
    import spark.implicits._
    val df = Seq(("a", java.lang.Double.valueOf(1.0)),
      ("a", java.lang.Double.valueOf(3.0)),
      ("dead", null.asInstanceOf[java.lang.Double]),
      ("dead", null.asInstanceOf[java.lang.Double])).toDF("g", "v")
    val out = GridPercentile.disc(df, Seq("g"), "v", Seq("x" -> 0.5), Some("n"))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getLong(2))).toMap
    // ANSI/DuckDB: NULL inputs are ignored but the group still appears
    assert(out == Map("a" -> ((Some(1.0), 2L)), "dead" -> ((None, 0L))))
  }

  test("countName reports the non-null row count per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)).toDF("g", "v")
      .union(Seq(("b", null.asInstanceOf[java.lang.Double])).toDF("g", "v"))
    val flat = GridPercentile.disc(df, Seq("g"), "v", Seq("x" -> 0.5), Some("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(flat == Map("a" -> ((2.0, 3L)), "b" -> ((5.0, 1L))))
    val bkt = GridPercentile.discBucketed(df, Seq("g"), "v", 2.0, "x", 0.5, Some("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(bkt == flat)
  }
}
