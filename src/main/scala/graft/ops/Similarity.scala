package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables => T}

/** Approximate-nearest-neighbor building blocks over the embeddings table
  * (brute-force top-k lives in LlmPipeline.similarityTopK).
  *
  * The scale path is sign-LSH (random-hyperplane LSH with axis-aligned
  * planes, deterministic so both engines agree): an 8-bit signature from
  * the signs of the first 8 dimensions partitions the corpus into ≤256
  * buckets; candidate pairs are generated within buckets only. At 100 TB
  * the signature becomes the shuffle/bucketing key — each bucket's
  * pairwise work is local to a partition, and the signature computation
  * itself is a narrow per-row map over the vector column.
  */
object Similarity {

  private val SigBits = 8

  /** Sign signature over dims 1..8 (1-based), as an INTEGER 0..255. */
  private def sigCol: Column =
    (1 to SigBits).map(j =>
      when(element_at(col("embedding"), j) >= 0f, lit(1 << (j - 1))).otherwise(lit(0)))
      .reduce(_ + _)

  private val sigSql: String =
    (1 to SigBits).map(j =>
      s"CASE WHEN embedding[$j] >= 0 THEN ${1 << (j - 1)} ELSE 0 END").mkString(" + ")

  /** LSH bucket census: signature → population + keeper. The census is
    * what a planner uses to size per-bucket work / detect skewed buckets. */
  val similarityLsh: Q = Q(
    "q_similarity_lsh",
    s"""SELECT $sigSql AS sig, count(*) AS n, min(vec_id) AS keeper
       |FROM embeddings GROUP BY 1 ORDER BY sig""".stripMargin
  ) { (s, d) =>
    T.embeddings(s, d)
      .groupBy(sigCol.as("sig"))
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("keeper"))
      .orderBy("sig")
  }

  /** Embedding-cosine near-dup candidates: pairs sharing an LSH bucket
    * with cosine ≥ 0.25 (same-bucket vectors are sign-correlated, so the
    * threshold fires often enough to exercise the path). Pairwise work is
    * bucket-local — the O(n²) never materializes across buckets. */
  val embedNearDup: Q = Q(
    "q_embed_near_dup",
    """WITH v AS (
      |  SELECT vec_id,
      |    CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END +
      |    CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END +
      |    CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END +
      |    CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END + CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END AS sig,
      |    embedding::DOUBLE[] AS e
      |  FROM embeddings)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_inner_product(a.e, b.e) /
      |        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4) AS score
      |FROM v a JOIN v b ON a.sig = b.sig AND a.vec_id < b.vec_id
      |WHERE round(list_inner_product(a.e, b.e) /
      |      (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4) >= 0.25
      |ORDER BY a_id, b_id""".stripMargin
  ) { (s, d) =>
    // Codegen'd native dot product (graft.functions.FloatVecDot) — same
    // left-to-right double fold as the higher-order-function form.
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorOps.vecDot(s, a, b)
    // Norms are computed once per vector BEFORE the pair join (linear
    // work), so each of the O(pairs) rows evaluates one dot product, not
    // three. Numerically identical to the per-pair form — sqrt(dot(e,e))
    // on the same doubles — so oracle parity holds.
    val v = T.embeddings(s, d)
      .select(col("vec_id"), sigCol.as("sig"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val a = v.select(col("vec_id").as("a_id"), col("sig"),
      col("embedding").as("ea"), col("nrm").as("nrm_a"))
    val b = v.select(col("vec_id").as("b_id"), col("sig").as("sigb"),
      col("embedding").as("eb"), col("nrm").as("nrm_b"))
    a.join(b, col("sig") === col("sigb") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("ea"), col("eb")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
      .filter(col("score") >= 0.25)
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(similarityLsh, embedNearDup)
}
