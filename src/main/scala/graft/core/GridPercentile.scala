package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact ANSI `percentile_disc` computed from a pre-aggregated
  * (group, value) count grid instead of Spark's PercentileDisc aggregate.
  *
  * Why: PercentileDisc buffers EVERY input row per group in the aggregate
  * state — at 100 TB a 3-group percentile over a fact table is a multi-GB
  * single-task buffer (the round-4 verdict's q_mad scale-killer). The
  * value GRID, by contrast, is bounded by the number of distinct values
  * (money/quantity grids are finite), so this path is:
  *
  *   grid      = groupBy(group, value).count()     — partial map-side agg;
  *               the shuffle carries one row per distinct (group, value)
  *   cum/tot   = one window pass over the tiny grid
  *   disc(p)   = min value whose cume_dist = cum/tot ≥ p  (ANSI definition)
  *
  * Determinism: cum and tot are exact BIGINTs; cum/tot is one double
  * division with identical operands in any engine, so the ≥ p compare is
  * reproducible (verified equal to DuckDB's percentile_disc at every sf —
  * the q_quantiles/q_mad oracles still use the built-in). */
object GridPercentile {

  /** disc percentiles of `valCol` per `groupCols`, one output column per
    * (name, p); `countName` optionally emits the per-group non-null count.
    * A group whose values are ALL NULL is kept with a NULL percentile (and
    * count 0) — the ANSI / DuckDB behavior: NULL inputs are ignored but
    * the group itself still appears. */
  def disc(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      ps: Seq[(String, Double)],
      countName: Option[String] = None): DataFrame =
    discOnGrid(
      // NULL values stay IN the grid (they keep all-NULL groups alive);
      // discOnGrid excludes them from the rank arithmetic.
      df.groupBy((groupCols :+ valCol).map(col): _*).agg(count(lit(1)).as("__c")),
      groupCols, valCol, "__c", ps, countName)

  /** The same percentile over an ALREADY-aggregated grid carrying a weight
    * column — lets a caller derive several percentile passes from one
    * grid build (q_mad computes the deviation grid FROM the price grid,
    * so the fact table is scanned once, not per median). Grid rows with a
    * NULL `valCol` contribute nothing to the rank arithmetic but keep
    * their group in the output (NULL percentile, count 0). */
  def discOnGrid(
      grid: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      cntCol: String,
      ps: Seq[(String, Double)],
      countName: Option[String] = None): DataFrame = {
    val gCols: Seq[Column] = groupCols.map(col)
    // nulls_first pins NULL grid rows ahead of every real value, so the
    // running sum at each non-null row covers exactly the non-null rows at
    // or below it in either engine's ordering convention.
    val wOrd = Window.partitionBy(gCols: _*).orderBy(col(valCol).asc_nulls_first)
    val wAll = Window.partitionBy(gCols: _*)
    val liveCnt = when(col(valCol).isNotNull, col(cntCol))
    val withCum = grid
      .withColumn("__cum", sum(liveCnt).over(wOrd))
      .withColumn("__tot", sum(liveCnt).over(wAll))
    val aggs = ps.map { case (name, p) =>
      // all-NULL group: __tot is NULL → the ratio is NULL → min over an
      // empty filtered set → NULL percentile, group row preserved
      min(when(col("__cum").cast(DoubleType) / col("__tot") >= p, col(valCol)))
        .as(name)
    } ++ countName.map(n => coalesce(sum(liveCnt), lit(0L)).as(n))
    withCum.groupBy(gCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Two-phase bucketed disc percentile for HIGH-cardinality value columns
    * (e.g. a money column with ~1 distinct value per row, where the flat
    * grid compresses nothing and its shuffle+sort is the cost):
    *
    *   phase A: census of floor(value/step) buckets — partial map-side agg,
    *            the shuffle carries ≤ #buckets rows per task; a window over
    *            the TINY census finds each group's target bucket and the
    *            cumulative count below it;
    *   phase B: re-scan filtered to the one target bucket per group
    *            (a broadcast semi-filter), exact grid+cumsum inside it.
    *
    * `step` tunes performance only, NEVER correctness: the target bucket
    * provably contains the ANSI disc value, and phase B applies the exact
    * rank test (cumBelow + cumWithin)/total ≥ p inside it. State is
    * O(#buckets + rows-in-one-bucket) — both bounded knobs at 100 TB,
    * where the flat per-group sort of an uncompressed grid (or Spark's
    * PercentileDisc row buffer) is not.
    *
    * Dropped-group caveat (differs from [[disc]]): a group whose values
    * are ALL NULL produces no census row and silently disappears from the
    * output. Callers on this path percentile NOT-NULL measures (prices,
    * derived deviations); use [[disc]] when all-NULL groups must surface. */
  def discBucketed(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      step: Double,
      name: String,
      p: Double,
      countName: Option[String] = None): DataFrame =
    discBucketedOnGrid(
      df.select((groupCols :+ valCol).map(col): _*).withColumn("__w", lit(1L)),
      groupCols, valCol, "__w", step, name, p, countName)

  /** [[discBucketed]] over an ALREADY-aggregated weighted grid — the rank
    * arithmetic runs on exact BIGINT weight sums, so a (group, value,
    * count) grid built once upstream feeds several bucketed percentile
    * passes without touching the fact table again (q_mad derives both its
    * medians from one price grid). Same dropped-group caveat as
    * [[discBucketed]]. */
  def discBucketedOnGrid(
      grid: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      cntCol: String,
      step: Double,
      name: String,
      p: Double,
      countName: Option[String] = None): DataFrame = {
    val gCols: Seq[Column] = groupCols.map(col)
    val withB = grid.where(col(valCol).isNotNull)
      .withColumn("__b", floor(col(valCol) / step))
    val census = withB.groupBy((gCols :+ col("__b")): _*).agg(sum(cntCol).as("__c"))
    val wOrd = Window.partitionBy(gCols: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(gCols: _*)
    // min-struct beats a row_number window: one aggregate, no extra sort
    // (the struct's leading __b field drives the ordering)
    val target = census
      .withColumn("__cum", sum("__c").over(wOrd))
      .withColumn("__tot", sum("__c").over(wAll))
      .filter(col("__cum").cast(DoubleType) / col("__tot") >= p)
      .groupBy(gCols: _*)
      .agg(min(struct(col("__b"), (col("__cum") - col("__c")).as("__below"),
        col("__tot"))).as("__t"))
      .select((gCols :+ col("__t.__b").as("__tb") :+
        col("__t.__below").as("__below") :+ col("__t.__tot").as("__tot")): _*)
    val inBucket = withB
      .join(broadcast(target), groupCols)
      .filter(col("__b") === col("__tb"))
    val grid2 = inBucket
      .groupBy((gCols :+ col("__below") :+ col("__tot") :+ col(valCol)): _*)
      .agg(sum(cntCol).as("__c"))
    val wOrd2 = Window.partitionBy(gCols: _*).orderBy(col(valCol))
    val aggs = Seq(
      min(when((col("__below") + col("__cum2")).cast(DoubleType) / col("__tot") >= p,
        col(valCol))).as(name)) ++
      countName.map(n => min(col("__tot")).as(n))
    grid2.withColumn("__cum2", sum("__c").over(wOrd2))
      .groupBy(gCols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
