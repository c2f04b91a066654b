package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.{Q, Tables => T}

/** End-to-end corpus curation — the composition the individual operators
  * exist for: near-dup removal (multiset-digest keepers) → quality floor
  * (length + type-token ratio, integer-math thresholds) → per-doc stats,
  * as ONE declarative plan.
  *
  * Scale shape: digest and both metrics are computed map-side from the
  * split array (size / array_distinct — no explode, no token-level
  * shuffle), then keeper selection is a single window over digest. The
  * only exchange carries (doc_id, digest, lang, source, two longs) per
  * document — the text itself never crosses a shuffle, so at 100 TB the
  * shuffle volume is O(docs), not O(tokens).
  */
object Curation {

  /** Keep one doc per token-multiset digest (min doc_id), require ≥20
    * tokens and type-token ratio ≥ 0.3 (spelled n_uniq·10 ≥ n_tok·3 so no
    * float compare crosses engines), and emit the curation metrics.
    * Keeper selection runs BEFORE the quality floor: a group whose keeper
    * fails quality contributes nothing (no promotion of the next doc). */
  val curate: Q = Q(
    "q_curation",
    """WITH scored AS (
      |  SELECT doc_id, lang, source,
      |    md5(array_to_string(list_sort(string_split(lower(text), ' ')), ',')) AS digest,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq
      |  FROM documents
      |), kept AS (
      |  SELECT * FROM scored
      |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY digest)
      |)
      |SELECT doc_id, lang, source, n_tok, n_uniq, n_uniq / n_tok AS ttr
      |FROM kept
      |WHERE n_tok >= 20 AND n_uniq * 10 >= n_tok * 3
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val scored = T.documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      md5(concat_ws(",", sort_array(split(lower(col("text")), " ")))).as("digest"),
      size(toks).cast(LongType).as("n_tok"),
      size(array_distinct(toks)).cast(LongType).as("n_uniq"))
    scored
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("keeper") &&
        col("n_tok") >= 20 && col("n_uniq") * 10 >= col("n_tok") * 3)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("n_uniq"), (col("n_uniq") / col("n_tok")).as("ttr"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(curate)
}
