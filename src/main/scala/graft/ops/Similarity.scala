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

  /** IVF (inverted-file) ANN probe: vectors are assigned to the nearest
    * of 16 centroids (here the 16 lowest vec_ids — a deterministic
    * stand-in for trained k-means centroids); a query searches only its
    * own cell. Assignment is a broadcast of the tiny centroid set against
    * one streaming scan (50k×16 codegen'd dot products at bench scale);
    * probe work is cell-local. At 100 TB the cell id becomes the
    * partition/bucketing key and probes touch one partition per query.
    * Cosines are rounded to 6 dp before ranking so both engines order
    * identically. */
  val similarityIvf: Q = Q(
    "q_similarity_ivf",
    """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
      |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
      |  FROM embeddings WHERE vec_id < 16),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
      |  FROM embeddings),
      |scored AS (SELECT v.vec_id, c.cid,
      |    round(list_inner_product(e, ce) / (vn * cn), 6) AS cos FROM v, c),
      |assign AS (SELECT vec_id, cid FROM (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
      |  FROM scored) WHERE rn = 1),
      |qa AS (SELECT vec_id AS qid, cid FROM assign WHERE vec_id BETWEEN 16 AND 20),
      |cand AS (SELECT qa.qid, a.vec_id AS cand_id
      |  FROM qa JOIN assign a ON a.cid = qa.cid AND a.vec_id != qa.qid),
      |cscore AS (SELECT qid, cand_id,
      |    round(list_inner_product(vq.e, vc.e) / (vq.vn * vc.vn), 6) AS score
      |  FROM cand
      |  JOIN v vq ON vq.vec_id = qid
      |  JOIN v vc ON vc.vec_id = cand_id)
      |SELECT qid, CAST(rn AS INTEGER) AS rn, cand_id AS vec_id, score FROM (
      |  SELECT qid, cand_id, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cand_id) AS rn
      |  FROM cscore)
      |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  ) { (s, d) =>
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorOps.vecDot(s, a, b)
    val base = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val cents = base.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val scored = base.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")), 6).as("cos"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("cid").asc)
    // assign is referenced on both sides of the probe self-join; without
    // persistence Spark would run the 16-way assignment scan (the
    // expensive part) twice. localCheckpoint (not cache) so the blocks
    // are released by the ContextCleaner when the plan is GC'd — cache()
    // entries would accumulate in the CacheManager across invocations in
    // a long-lived session.
    val assign = scored.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1).select(col("vec_id"), col("cid"))
      .localCheckpoint()
    val qa = assign.filter(col("vec_id").between(16, 20))
      .select(col("vec_id").as("qid"), col("cid"))
    val cand = qa.join(assign.select(col("vec_id").as("cand_id"), col("cid")), Seq("cid"))
      .filter(col("cand_id") =!= col("qid"))
    val vq = base.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val vc = base.select(col("vec_id").as("cand_id"), col("embedding").as("cande"), col("nrm").as("candn"))
    val cscore = cand.join(vq, Seq("qid")).join(vc, Seq("cand_id"))
      .select(col("qid"), col("cand_id"),
        round(dot(col("qe"), col("cande")) / (col("qn") * col("candn")), 6).as("score"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("cand_id").asc)
    cscore.withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("rn"), col("cand_id").as("vec_id"), col("score"))
      .orderBy("qid", "rn")
  }

  /** Int8 scalar quantization of the embedding column — the compression
    * step a 100 TB vector corpus applies before ANN serving (4× smaller
    * than float32, dot products in integer SIMD). Per-vector min/max
    * affine quantization to [-127, 127]; output is the quantized-code
    * digest plus exact integer checksums, so the oracle compares the
    * codes themselves, not a float reconstruction. All arithmetic is
    * double with an identical expression shape in both engines; the final
    * cast happens on an already-rounded integral double (casting a raw
    * double would trip the truncate-vs-round divergence, §2D). Pure
    * per-row map — no shuffle but the presentation sort. */
  val embedQuantize: Q = Q(
    "q_embed_quantize",
    """WITH v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e,
      |    list_min(embedding::DOUBLE[]) AS vmin,
      |    list_max(embedding::DOUBLE[]) AS vmax
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, vmin, vmax,
      |    CASE WHEN vmax = vmin THEN list_transform(e, x -> 0)
      |      ELSE list_transform(e, x ->
      |        CAST(round(((x - vmin) * 254) / (vmax - vmin)) AS INTEGER) - 127)
      |    END AS codes
      |  FROM v)
      |SELECT vec_id, vmin, vmax,
      |  md5(array_to_string(codes, ',')) AS code_digest,
      |  CAST(list_sum(codes) AS BIGINT) AS code_sum
      |FROM q ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    val e = col("embedding").cast(ArrayType(DoubleType))
    val v = T.embeddings(s, d).select(
      col("vec_id"), e.as("e"),
      array_min(e).as("vmin"), array_max(e).as("vmax"))
    val codes = when(col("vmax") === col("vmin"),
      transform(col("e"), _ => lit(0)))
      .otherwise(transform(col("e"), x =>
        round(((x - col("vmin")) * 254) / (col("vmax") - col("vmin")), 0)
          .cast(IntegerType) - 127))
    v.select(col("vec_id"), col("vmin"), col("vmax"), codes.as("codes"))
      .select(col("vec_id"), col("vmin"), col("vmax"),
        md5(concat_ws(",", transform(col("codes"), _.cast(StringType)))).as("code_digest"),
        aggregate(col("codes"), lit(0L), (acc, x) => acc + x).as("code_sum"))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(similarityLsh, embedNearDup, similarityIvf, embedQuantize)
}
