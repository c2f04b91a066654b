package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Q
import graft.ops.{Analytic, Cdc, Curation, Dedup, Graph, Layout, LlmPipeline, Multimodal, Pq, Relational, Similarity, Sketch, Statistical, Temporal, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Operator inventory lives in graft.ops.*; each module exposes `all: Seq[Q]`
  * pairing the Spark plan with its DuckDB oracle SQL (column names aligned —
  * the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** All declared operators, in SURVEY.md §2B order. */
  def declared: Seq[Q] =
    Cdc.all ++ Relational.all ++ Analytic.all ++ Statistical.all ++
      Temporal.all ++ LlmPipeline.all ++ Dedup.all ++ Similarity.all ++
      Pq.all ++ TextAnalysis.all ++ Multimodal.all ++ Sketch.all ++
      Curation.all ++ Graph.all ++ Layout.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Cdc.snapshotEnvelope.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
