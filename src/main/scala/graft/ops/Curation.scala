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

  /** Importance-weighted data selection — the DSIR-class curation step
    * (importance resampling toward a target distribution, public in the
    * data-selection literature): score every document by how much its
    * token distribution resembles a target subset (here lang='en', the
    * stand-in for "looks like the reference corpus"). True DSIR weights
    * are log-ratios of hashed n-gram LM probabilities; ln() fold order
    * differs across engines, so the signal here is the log-free
    * per-token target-affinity ratio in exact-integer ppm with add-one
    * smoothing — aff(t) = (cnt_target+1)·1e6 div (cnt_corpus+1) — and a
    * document's weight is its tf-weighted affinity mean. Selection is an
    * integer compare (weight·2 ≥ 1e6, i.e. affinity ≥ 0.5).
    *
    * Scale shape: the q_tfidf/q_rarity_score class — the token stream
    * collapses to per-doc tf first (one partial-aggregated shuffle), the
    * affinity table is one token-keyed aggregation with BOTH counts as
    * conditional sums of the same pass (no second scan for the target),
    * and the Zipf-skewed tf⋈aff join carries distinct (doc, token) pairs
    * only. Products stay < 2^53: tf ≤ doc length, aff ≤ 1e6. */
  /** The trainable artifact of q_importance_weight: per-token target
    * affinity in exact-integer ppm. Exposed separately so the streaming
    * gate (Stateful.importanceGate) can freeze it as a plan literal —
    * the same train-rarely/score-continuously split as ivfAssignStream. */
  def affinityTable(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val tok = T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    tok.groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("tf"))
      .groupBy("token")
      .agg(sum(col("tf")).as("cnt_all"),
        sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("cnt_tgt"))
      .select(col("token"),
        expr("((cnt_tgt + 1) * 1000000) div (cnt_all + 1)").as("aff_ppm"))
  }

  val importanceWeight: Q = Q(
    "q_importance_weight",
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, lang, token, count(*) AS tf FROM tok
      |       WHERE token <> '' GROUP BY 1, 2, 3),
      |cf AS (SELECT token,
      |    CAST(sum(tf) AS BIGINT) AS cnt_all,
      |    CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS cnt_tgt
      |  FROM tf GROUP BY 1),
      |aff AS (SELECT token,
      |    ((cnt_tgt + 1) * 1000000) // (cnt_all + 1) AS aff_ppm FROM cf)
      |SELECT tf.doc_id, tf.lang,
      |  CAST(sum(tf.tf) AS BIGINT) AS n_tok,
      |  CAST(sum(tf.tf * aff.aff_ppm) AS BIGINT) AS weight_sum,
      |  CAST(sum(tf.tf * aff.aff_ppm) // sum(tf.tf) AS BIGINT) AS weight_avg_ppm,
      |  CAST(CASE WHEN sum(tf.tf * aff.aff_ppm) * 2 >= sum(tf.tf) * 1000000
      |       THEN 1 ELSE 0 END AS BIGINT) AS selected
      |FROM tf JOIN aff USING (token)
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val tok = T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("tf"))
    val aff = tf.groupBy("token")
      .agg(sum(col("tf")).as("cnt_all"),
        sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("cnt_tgt"))
      .select(col("token"),
        expr("((cnt_tgt + 1) * 1000000) div (cnt_all + 1)").as("aff_ppm"))
    tf.join(aff, "token")
      .groupBy("doc_id", "lang")
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("aff_ppm")).as("weight_sum"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("weight_sum"),
        expr("weight_sum div n_tok").as("weight_avg_ppm"),
        when(col("weight_sum") * 2 >= col("n_tok") * 1000000L, 1L)
          .otherwise(0L).as("selected"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(curate, importanceWeight)
}
