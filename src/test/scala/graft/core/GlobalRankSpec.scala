package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** GlobalRank must be bit-identical to the single-task window forms it
  * replaces — the decomposition exists for scale, never for semantics. */
class GlobalRankSpec extends SparkSuite {
  import spark.implicits._

  test("withRank == row_number over the global window (duplicates in the value, unique tiebreak)") {
    val df = (0 until 5000)
      .map(i => ((i * 2654435761L) % 97L, i.toLong)) // heavy value ties
      .toDF("v", "id")
    val naive = df
      .withColumn("r", row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "r").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val got = GlobalRank.withRank(df, "r", col("v"), col("id"))
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 5000)
    got.foreach { case (id, r) =>
      assert(r == naive(id).toLong, s"id $id: got $r want ${naive(id)}")
    }
  }

  test("withNtile == window ntile across n × k — boundary sizes, n < k, n = 0") {
    for (n <- Seq(0, 1, 2, 3, 4, 5, 7, 8, 9, 16, 40, 41, 42, 43, 100);
         k <- Seq(1, 2, 3, 4, 7)) {
      val df = (0 until n).map(i => ((i * 31L) % 11L, i.toLong)).toDF("v", "id")
      val naive = df
        .withColumn("t", ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val got = GlobalRank.withNtile(df, "t", k, col("v"), col("id"))
        .select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(got.length == n, s"n=$n k=$k lost rows")
      got.foreach { case (id, t) =>
        assert(t == naive(id), s"n=$n k=$k id=$id: got $t want ${naive(id)}")
      }
    }
  }

  test("withNtiles == per-key window ntiles — batched census, multiple orders, ties") {
    for (n <- Seq(0, 1, 3, 7, 41, 500, 5000)) {
      val df = (0 until n).map { i =>
        ((i * 2654435761L) % 97L, (i * 31L) % 11L, i * 0.5, i.toLong)
      }.toDF("a", "b", "c", "id")
      val naive = df
        .withColumn("ta", ntile(4).over(Window.orderBy(col("a"), col("id"))))
        .withColumn("tb", ntile(3).over(Window.orderBy(col("b"), col("id"))))
        .withColumn("tc", ntile(7).over(Window.orderBy(col("c"), col("id"))))
        .select("id", "ta", "tb", "tc").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
      val got = GlobalRank.withNtiles(df, Seq("id"), Seq(
        ("ta", 4, Seq(col("a"), col("id"))),
        ("tb", 3, Seq(col("b"), col("id"))),
        ("tc", 7, Seq(col("c"), col("id")))))
        .select("id", "ta", "tb", "tc").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3))))
      assert(got.length == n, s"n=$n lost rows")
      got.foreach { case (id, t) =>
        assert(t == naive(id), s"n=$n id=$id: got $t want ${naive(id)}")
      }
    }
  }
}
