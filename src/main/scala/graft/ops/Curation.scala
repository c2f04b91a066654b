package graft.ops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** End-to-end corpus curation — the composition the individual operators
  * exist for: near-dup removal (multiset-digest keepers) → quality floor
  * (length + type-token ratio, integer-math thresholds) → per-doc stats,
  * as ONE declarative plan. At 100 TB this whole pipeline is two shuffles
  * (the digest group and the metrics group, both on doc-granularity keys)
  * and the documents themselves stream through map-side only.
  */
object Curation {

  /** Keep one doc per token-multiset digest, require ≥20 tokens and
    * type-token ratio ≥ 0.3 (spelled n_uniq·10 ≥ n_tok·3 so no float
    * compare crosses engines), and emit the curation metrics. */
  val curate: Q = Q(
    "q_curation",
    """WITH digests AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(string_split(lower(text), ' ')), ',')) AS digest
      |  FROM documents
      |), keepers AS (
      |  SELECT min(doc_id) AS doc_id FROM digests GROUP BY digest
      |), metrics AS (
      |  SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id
      |)
      |SELECT d.doc_id, d.lang, d.source, m.n_tok, m.n_uniq,
      |  m.n_uniq / m.n_tok AS ttr
      |FROM documents d
      |JOIN keepers k ON k.doc_id = d.doc_id
      |JOIN metrics m ON m.doc_id = d.doc_id
      |WHERE m.n_tok >= 20 AND m.n_uniq * 10 >= m.n_tok * 3
      |ORDER BY d.doc_id""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val keepers = docs
      .select(col("doc_id"),
        md5(concat_ws(",", sort_array(split(lower(col("text")), " ")))).as("digest"))
      .groupBy("digest").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val metrics = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("n_uniq"))
    docs.join(keepers, Seq("doc_id"))
      .join(metrics, Seq("doc_id"))
      .filter(col("n_tok") >= 20 && col("n_uniq") * 10 >= col("n_tok") * 3)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("n_uniq"), (col("n_uniq") / col("n_tok")).as("ttr"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(curate)
}
