package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PrefixCarry must equal the naive global prefix-max at every recursion
  * depth — the decomposition exists for scale, never for semantics. */
class PrefixCarrySpec extends SparkSuite {
  import spark.implicits._

  private def naive(bm: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Long])] = {
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bm.withColumn("carry", max(col("vmax")).over(w))
      .select("bucket", "carry").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1).toSeq
  }

  private def viaCarry(bm: org.apache.spark.sql.DataFrame, levels: Int) =
    PrefixCarry.carry(bm, "bucket", "vmax", "carry", levels).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1).toSeq

  test("carry == naive prefix max at levels 0, 1, 2 — dense, sparse, and adversarial orders") {
    // deterministic pseudo-random values; SPARSE buckets (gaps, including
    // across super-bucket boundaries at the test's tiny fanout scale)
    val rows = (0 until 3000).collect {
      case i if i % 7 != 3 => (i.toLong * 11L % 50000L, (i.toLong * 2654435761L) % 100000L)
    }
    val bm = rows.toDF("bucket", "vmax")
      .groupBy("bucket").agg(max(col("vmax")).as("vmax"))
    val want = naive(bm)
    assert(want.nonEmpty && want.head._2.isEmpty, "first bucket carries null")
    (0 to 2).foreach { lv =>
      assert(viaCarry(bm, lv) == want, s"levels=$lv diverged from the naive window")
    }
  }

  test("single bucket and empty input degenerate correctly") {
    val one = Seq((42L, 7L)).toDF("bucket", "vmax")
    assert(viaCarry(one, 1) == Seq((42L, None)))
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "vmax")
    assert(viaCarry(empty, 1).isEmpty)
  }
}
