package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL rank / ntile over a total order with no window whose
  * partition grows with the data.
  *
  * `row_number()/ntile() OVER (ORDER BY …)` moves every row through ONE
  * window task — the same single-partition funnel PrefixCarry retires
  * for prefix aggregates, here for total-order ranking (q_rfm's quartile
  * assignment was the last such site in the tree). The scalable shape is
  * the classic distributed rank: range-repartition on the sort key
  * (Spark's range exchange — a distributed sort), rank WITHIN each
  * partition, then add each partition's prefix row-count offset. The
  * offsets are one bounded control read (P = shuffle-partition rows),
  * the established pattern for O(partitions) state.
  *
  * The sort key must be a TOTAL order (append a unique tiebreak column —
  * the H6 rule every total-order operator already follows): range
  * boundaries can split equal keys across partitions, so only a
  * tie-free key makes rank reproducible.
  */
object GlobalRank {

  /** `df` plus `out` = exact 1-based global rank by `keys`. Internally
    * localCheckpoints the range-partitioned frame: the offset census and
    * the ranked output must see the SAME sampled range boundaries (the
    * range exchange samples its bounds; two recomputations could split
    * rows differently). */
  def withRank(df: DataFrame, out: String, keys: Column*): DataFrame =
    rankedWithTotal(df, out, keys: _*)._1

  /** (ranked frame, total row count) — the count rides the offset census
    * for free, so ntile never pays a second job. */
  private def rankedWithTotal(df: DataFrame, out: String, keys: Column*)
      : (DataFrame, Long) = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(p, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = (pid, acc); acc += n; o
    }
    val s = df.sparkSession
    import s.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
    val out0 = parted.join(broadcast(offDf), "__pid")
      .withColumn(out, col("__off") + row_number().over(w))
      .drop("__pid", "__off")
    (out0, acc)
  }

  /** `df` plus `out` = exact `ntile(k)` over the total order `keys` —
    * SQL ntile semantics (bucket sizes differ by at most one, larger
    * buckets first), derived in closed form from the global rank and
    * the total count, identical to Spark's and DuckDB's window ntile. */
  def withNtile(df: DataFrame, out: String, k: Int, keys: Column*): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    val rankCol = s"__rank_$out"
    val (ranked, n) = rankedWithTotal(df, rankCol, keys: _*)
    val small = n / k
    val m = n % k
    val tile =
      if (n == 0L) lit(null).cast("int")
      else if (small == 0L) col(rankCol) // n < k: one row per leading bucket
      else {
        val bigSpan = m * (small + 1)
        when(col(rankCol) <= bigSpan,
          expr(s"($rankCol - 1) div ${small + 1} + 1"))
          .otherwise(expr(s"$m + ($rankCol - 1 - $bigSpan) div $small + 1"))
      }
    ranked.withColumn(out, tile.cast("int")).drop(rankCol)
  }
}
