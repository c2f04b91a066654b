package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, min}

/** Backfill probe for id-slice frozen bases (round-15 verdict #1).
  *
  * Every delta-family artifact freezes a prefix of the corpus below an
  * id split and rolls forward by scanning only ids at-or-above it —
  * exact under the ingest contract that ids are assigned monotonically
  * (the contract q_dedup_delta and the streaming admission gates state).
  * A BACKFILL append breaks it silently: new files carrying ids below
  * the frozen split are invisible to both the frozen census (built
  * before they existed) and the id-sliced delta scan, so the merged
  * artifact under-counts with no error. The guard makes the contract
  * CHECKED instead of assumed: before merging, probe the minimum id over
  * ONLY the newly-appended files ([[ModelCache.getOrRefreshGuarded]]
  * hands the refresh closure exactly that file set) and decline the
  * merge when it lands below the split — ModelCache then falls back to
  * a from-scratch retrain, which re-censuses the whole corpus and is
  * always correct (the sessionize_delta late-arrival precedent,
  * ops/Temporal.scala stitch, applied family-wide at the lifecycle
  * layer).
  *
  * Cost: one Spark job over the delta files alone, column-pruned to the
  * id column — O(delta), never O(corpus), and zero extra cost on the
  * happy path beyond that one aggregate.
  */
object Backfill {

  /** Minimum value of `idCol` across the parquet files at `paths`
    * (typically the newly-appended part files a guarded refresh
    * receives). None when `paths` is empty or holds no rows. */
  def minId(spark: SparkSession, paths: Seq[String], idCol: String): Option[Long] = {
    if (paths.isEmpty) return None
    val r = spark.read.parquet(paths: _*).agg(min(col(idCol))).head()
    if (r.isNullAt(0)) None else Some(r.getAs[Number](0).longValue)
  }

  /** True when any row in the appended files carries `idCol` below
    * `split` — i.e. inside the frozen prefix an id-sliced refresh would
    * never rescan. `split` is the exclusive upper bound of the frozen
    * region (frozen = ids < split); bases freezing an INCLUSIVE prefix
    * (ids <= sp) pass `sp + 1`. */
  def below(spark: SparkSession, paths: Seq[String], idCol: String,
      split: Long): Boolean =
    minId(spark, paths, idCol).exists(_ < split)

  /** Restrict a guarded-refresh file list to one table's part files —
    * for bases keyed on a whole corpus DIRECTORY (the graph bases'
    * `d`), whose appends may touch several tables. Matches both the
    * directory-of-parts layout (`.../orders.parquet/part-*.parquet`)
    * and a single-file table (`.../orders.parquet`). */
  def tableFiles(paths: Seq[String], table: String): Seq[String] =
    paths.filter(_.contains(s"/$table.parquet"))
}
