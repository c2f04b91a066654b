package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables => T}

/** Approximate-nearest-neighbor building blocks over the embeddings table
  * (brute-force top-k lives in LlmPipeline.similarityTopK).
  *
  * The scale path is banded sign-LSH (random-hyperplane LSH with
  * axis-aligned planes, deterministic so both engines agree): `Bands`
  * independent bands of `BitsPerBand` sign bits each, mirroring the
  * MinHash banding in Dedup (Dedup.sigBandsCteSql). Two vectors are
  * candidates iff they collide in AT LEAST ONE band — the standard
  * b×r LSH OR-construction. At 100 TB the knobs are exactly these two
  * constants: raising BitsPerBand shrinks expected bucket population
  * (2^r buckets per band, so ~N/2^r per bucket — the within-bucket
  * pair work is O(N²/2^r) per band, bounded by choosing r ≈ log2(N/B)
  * for a target bucket size B), while raising Bands restores recall.
  * The fixed single 8-bit band this replaces had an irreducible
  * O(N²/256) pair stage — quadratic with a small constant; the banded
  * form keeps the quadratic term tunable to O(N·B) total.
  */
object Similarity {

  private val Bands = 4       // LSH bands (OR-construction: ≥1 shared band → candidate)
  private val BitsPerBand = 8 // sign bits per band; band b uses dims b*r+1 .. (b+1)*r

  /** Band-b bucket id: integer from the signs of that band's dims (1-based). */
  private def bucketCol(b: Int): Column =
    (0 until BitsPerBand).map(j =>
      when(element_at(col("embedding"), b * BitsPerBand + j + 1) >= 0f,
        lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  private def bucketSql(b: Int): String =
    (0 until BitsPerBand).map(j =>
      s"CASE WHEN embedding[${b * BitsPerBand + j + 1}] >= 0 THEN ${1 << j} ELSE 0 END")
      .mkString(" + ")

  /** The (vec_id, band, bucket) exploded banding — ONE definition shared
    * by the census and the near-dup candidate stage, as DuckDB CTE text
    * and as a Spark plan, so a change to Bands/BitsPerBand cannot
    * desynchronize them (same pattern as Dedup.sigBandsCteSql). */
  private val bandsCteSql: String = {
    val cases = (0 until Bands).map(b => s"WHEN $b THEN ${bucketSql(b)}").mkString(" ")
    s"""bands AS (
       |  SELECT vec_id, band, CASE band $cases END AS bucket
       |  FROM embeddings, (SELECT unnest([${(0 until Bands).mkString(", ")}]) AS band)
       |)""".stripMargin
  }

  /** Spark twin of bandsCteSql: all band buckets computed in one narrow
    * projection over the scan, then posexploded — the signature work is
    * map-side; the FIRST shuffle is already on the (band, bucket) key. */
  private def bandsOf(s: SparkSession, d: String): DataFrame = {
    val buckets = (0 until Bands).map(bucketCol)
    T.embeddings(s, d)
      .select(col("vec_id"), posexplode(array(buckets: _*)).as(Seq("band", "bucket")))
  }

  /** LSH bucket census: (band, bucket) → population + keeper. The census
    * is what a planner uses to size per-band bucket work / detect skewed
    * buckets before committing to the pair stage. */
  val similarityLsh: Q = Q(
    "q_similarity_lsh",
    s"""WITH $bandsCteSql
       |SELECT band, bucket, count(*) AS n, min(vec_id) AS keeper
       |FROM bands GROUP BY band, bucket ORDER BY band, bucket""".stripMargin
  ) { (s, d) =>
    bandsOf(s, d)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("keeper"))
      .orderBy("band", "bucket")
  }

  /** Embedding-cosine near-dup: candidate pairs share ≥1 (band, bucket);
    * verified pairs have cosine ≥ 0.25. Pair generation is strictly
    * band-bucket-local (no cartesian), deduplicated across bands BEFORE
    * the vector join — each surviving pair fetches its two vectors and
    * evaluates exactly one dot product, so verify work is O(distinct
    * candidates), not O(band collisions). Norms are computed once per
    * vector (linear pre-pass), not per pair. */
  val embedNearDup: Q = Q(
    "q_embed_near_dup",
    s"""WITH $bandsCteSql,
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |), v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS e,
       |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings)
       |SELECT p.a_id, p.b_id,
       |  round(list_inner_product(x.e, y.e) / (x.nrm * y.nrm), 4) AS score
       |FROM pairs p JOIN v x ON x.vec_id = p.a_id JOIN v y ON y.vec_id = p.b_id
       |WHERE round(list_inner_product(x.e, y.e) / (x.nrm * y.nrm), 4) >= 0.25
       |ORDER BY a_id, b_id""".stripMargin
  ) { (s, d) =>
    // Codegen'd native dot product (graft.functions.FloatVecDot) — same
    // left-to-right double fold as DuckDB's list_inner_product.
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorOps.vecDot(s, a, b)
    val bands = bandsOf(s, d)
    val pairs = bands.select(col("vec_id").as("a_id"), col("band"), col("bucket"))
      .join(bands.select(col("vec_id").as("b_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val v = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    pairs
      .join(v.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("nrm").as("nrm_a")), "a_id")
      .join(v.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nrm").as("nrm_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(dot(col("ea"), col("eb")) / (col("nrm_a") * col("nrm_b")), 4)
          .as("score"))
      .filter(col("score") >= 0.25)
      .orderBy("a_id", "b_id")
  }

  // ---------------------------------------------------------------------
  // IVF with TRAINED centroids (deterministic Lloyd's k-means)
  // ---------------------------------------------------------------------

  private val KCells = 16   // centroid count; at 100 TB scale ≈ sqrt(N) cells
  private val Iters  = 2    // Lloyd rounds (unrolled identically in the oracle SQL)
  private val Scale  = 2048 // uniform code scale: code = round(x * Scale)

  /** Exact double dot product via a left-to-right fold. Over the integer-
    * valued code vectors every product and partial sum is an exact
    * integer < 2^53, so the result is bit-identical in any engine and
    * any summation order — this is what makes distributed k-means
    * deterministic here (float centroid means would be partition-order
    * dependent). The HOF form is the readable reference; hot paths use
    * the codegen'd DoubleVecDot kernel (same fold — DoubleVecDotSpec
    * asserts bitwise parity). */
  private[ops] def dotDHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** IVF (inverted-file) ANN probe with centroids trained by Lloyd's
    * (spherical) k-means, made cross-engine deterministic by running the
    * iterations over uniformly-scaled integer codes:
    *
    *  - code(x) = round(x · Scale) per dimension — a UNIFORM scale (no
    *    per-vector shift), so code-space cosine equals raw cosine up to
    *    ~1/Scale rounding, and every code is an exact small integer;
    *  - seeds: the KCells lowest vec_ids — exactly the round-4 stand-in
    *    centroids, so training is provably "stand-in + Lloyd rounds" and
    *    the objective improves monotonically from that baseline
    *    (SimilaritySpec asserts it);
    *  - a centroid is its members' un-normalized code SUM (exact integer
    *    per dim, associative → partition-order-independent, unlike a
    *    float mean), which has the same direction as the mean, so cosine
    *    assignment is identical and fully deterministic;
    *  - assignment = argmax cosine, rounded to 6 dp, ties broken by cid.
    *
    * The oracle replays the identical unrolled iterations in DuckDB SQL —
    * two unrelated engines running Lloyd's agree bit-for-bit because all
    * products and partial sums are exact integers < 2^53 (|code| ≤ ~1.2k
    * at |x| ≤ 0.6, so a cell of up to ~50k members stays inside the
    * budget; at larger corpora KCells grows ≈ sqrt(N), which bounds cell
    * population — the same knob that bounds probe cost). Assignment is a
    * broadcast of the tiny centroid set against one streaming scan; probe
    * work is cell-local. At 100 TB the cell id becomes the partition/
    * bucketing key and probes touch one cell per query. */
  private val AFinal = s"a$Iters"

  /** ALL the Lloyd-round CTEs through the final assignment `AFinal`, plus
    * the raw-vector view `v` — ONE definition shared by q_similarity_ivf,
    * q_ann_recall, and q_semdedup, so the trained cells those three
    * queries reason about are definitionally the same (the Dedup
    * sigBandsCteSql pattern). */
  /** code-space cosine of vector alias `q` against centroid alias `c`,
    * with zero-norm guard — used by assignment AND multi-probe cell
    * ranking. */
  private def cosSql(q: String, c: String): String =
    s"""CASE WHEN $q.n2 = 0 OR $c.cn2 = 0 THEN -2.0
       |ELSE round(list_inner_product($q.cd, $c.cd) / (sqrt($q.n2) * sqrt($c.cn2)), 6) END"""
      .stripMargin.replace("\n", " ")

  private val ivfCtesSql: String = {
    val dims = 1 to 64 // embeddings are 64-dim (TESTDATA.md)
    val centroidSumsSql = dims.map(i => s"sum(q.cd[$i])").mkString("[", ", ", "]")
    def assignSql(name: String, cents: String) =
      s"""$name AS (SELECT vec_id, cid FROM (
         |  SELECT q.vec_id, c.cid, row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${cosSql("q", "c")} DESC, c.cid) AS rn
         |  FROM qc q, $cents c) WHERE rn = 1)""".stripMargin
    def updateSql(name: String, assign: String) =
      s"""$name AS (SELECT cid, cd, list_inner_product(cd, cd) AS cn2 FROM (
         |  SELECT a.cid, $centroidSumsSql AS cd
         |  FROM $assign a JOIN qc q ON q.vec_id = a.vec_id GROUP BY a.cid))""".stripMargin
    val lloydCtes = (1 to Iters).map(i =>
      s"${updateSql(s"c$i", s"a${i - 1}")},\n${assignSql(s"a$i", s"c$i")}").mkString(",\n")
    s"""qc AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> round(x * $Scale)) AS cd,
       |    list_inner_product(list_transform(embedding::DOUBLE[], x -> round(x * $Scale)),
       |                       list_transform(embedding::DOUBLE[], x -> round(x * $Scale))) AS n2
       |  FROM embeddings),
       |s0 AS (SELECT vec_id AS cid, cd, n2 AS cn2 FROM qc WHERE vec_id < $KCells),
       |${assignSql("a0", "s0")},
       |$lloydCtes,
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
       |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
       |  FROM embeddings)""".stripMargin
  }

  /** The IVF probe stage (queries 16..20 against their own cell), shared
    * by q_similarity_ivf and q_ann_recall. */
  private val probeCtesSql: String =
    s"""qa AS (SELECT vec_id AS qid, cid FROM $AFinal WHERE vec_id BETWEEN 16 AND 20),
       |cand AS (SELECT qa.qid, a.vec_id AS cand_id
       |  FROM qa JOIN $AFinal a ON a.cid = qa.cid AND a.vec_id != qa.qid),
       |cscore AS (SELECT qid, cand_id,
       |    round(list_inner_product(vq.e, vc.e) / (vq.vn * vc.vn), 6) AS score
       |  FROM cand
       |  JOIN v vq ON vq.vec_id = qid
       |  JOIN v vc ON vc.vec_id = cand_id)""".stripMargin

  val similarityIvf: Q = Q(
    "q_similarity_ivf",
    s"""WITH $ivfCtesSql,
       |$probeCtesSql
       |SELECT qid, CAST(rn AS INTEGER) AS rn, cand_id AS vec_id, score FROM (
       |  SELECT qid, cand_id, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cand_id) AS rn
       |  FROM cscore)
       |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  ) { (s, d) => trainedAssignment(s, d)._2 }

  /** ANN quality evaluation: recall@3 of the IVF probe against the exact
    * brute-force top-3 over the whole corpus — the number an ANN
    * deployment is actually judged by — at BOTH nprobe=1 (own cell only)
    * and nprobe=NProbe (cells ranked by the same code-space centroid
    * cosine the assignment uses). The two columns side by side are the
    * recall/cost knob: searching NProbe cells costs NProbe/KCells of the
    * corpus per query and strictly widens the candidate set. The exact
    * side is a broadcast of the 5 query vectors against one streaming
    * scan (the q_similarity_topk shape). At 100 TB this is the recurring
    * eval job run on a sampled query set after each re-train. */
  private val NProbe = 4 // cells searched by the multi-probe variant

  val annRecall: Q = Q(
    "q_ann_recall",
    s"""WITH $ivfCtesSql,
       |$probeCtesSql,
       |ivf3 AS (SELECT qid, cand_id FROM (
       |  SELECT qid, cand_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cand_id) AS rn
       |  FROM cscore) WHERE rn <= 3),
       |qs AS (SELECT vec_id, cd, n2 FROM qc WHERE vec_id BETWEEN 16 AND 20),
       |qmp AS (SELECT vec_id AS qid, cid FROM (
       |  SELECT q.vec_id, c.cid, row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY ${cosSql("q", "c")} DESC, c.cid) AS rn
       |  FROM qs q, c$Iters c) WHERE rn <= $NProbe),
       |candmp AS (SELECT qmp.qid, a.vec_id AS cand_id
       |  FROM qmp JOIN $AFinal a ON a.cid = qmp.cid AND a.vec_id != qmp.qid),
       |cmps AS (SELECT qid, cand_id,
       |    round(list_inner_product(vq.e, vc.e) / (vq.vn * vc.vn), 6) AS score
       |  FROM candmp JOIN v vq ON vq.vec_id = qid JOIN v vc ON vc.vec_id = cand_id),
       |ivf3mp AS (SELECT qid, cand_id FROM (
       |  SELECT qid, cand_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cand_id) AS rn
       |  FROM cmps) WHERE rn <= 3),
       |ex AS (SELECT q.vec_id AS qid, b.vec_id AS cand_id,
       |    round(list_inner_product(q.e, b.e) / (q.vn * b.vn), 6) AS score
       |  FROM v q JOIN v b ON b.vec_id != q.vec_id
       |  WHERE q.vec_id BETWEEN 16 AND 20),
       |ex3 AS (SELECT qid, cand_id FROM (
       |  SELECT qid, cand_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cand_id) AS rn
       |  FROM ex) WHERE rn <= 3),
       |hits1 AS (SELECT i.qid, count(*) AS n_hits FROM ivf3 i
       |  JOIN ex3 e ON e.qid = i.qid AND e.cand_id = i.cand_id GROUP BY i.qid),
       |hits$NProbe AS (SELECT i.qid, count(*) AS n_hits FROM ivf3mp i
       |  JOIN ex3 e ON e.qid = i.qid AND e.cand_id = i.cand_id GROUP BY i.qid)
       |SELECT q.qid,
       |  coalesce(h1.n_hits, 0) AS n_hits_1,
       |  coalesce(h1.n_hits, 0) / 3.0 AS recall_1,
       |  coalesce(h$NProbe.n_hits, 0) AS n_hits_$NProbe,
       |  coalesce(h$NProbe.n_hits, 0) / 3.0 AS recall_$NProbe
       |FROM (SELECT DISTINCT qid FROM ivf3) q
       |LEFT JOIN hits1 h1 ON h1.qid = q.qid
       |LEFT JOIN hits$NProbe h$NProbe ON h$NProbe.qid = q.qid
       |ORDER BY q.qid""".stripMargin
  ) { (s, d) =>
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorOps.vecDot(s, a, b)
    val (parts, probe) = trainedParts(s, d)
    val ivf3 = probe.select(col("qid"), col("vec_id").as("cand_id"))
      .localCheckpoint() // referenced by the hits join AND the qid spine
    val base = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    // exact top-3: broadcast the 5 queries against one streaming scan
    val q = base.filter(col("vec_id").between(16, 20))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val ex = base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand_id"),
        round(dot(col("embedding"), col("qe")) / (col("nrm") * col("qn")), 6).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cand_id").asc)
    val ex3 = ex.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("qid", "cand_id")
      .localCheckpoint() // joined against both probe variants
    // multi-probe: rank cells per query by the SAME code-space cosine the
    // assignment uses, search the top NProbe cells
    val qs = parts.qc.filter(col("vec_id").between(16, 20))
    val qmp = qs.crossJoin(broadcast(parts.cents))
      .withColumn("cos", parts.cosExpr)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rn") <= NProbe)
      .select(col("vec_id").as("qid"), col("cid"))
    val candmp = qmp
      .join(parts.assign.select(col("vec_id").as("cand_id"), col("cid")), Seq("cid"))
      .filter(col("cand_id") =!= col("qid"))
    val cmps = candmp
      .join(base.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn")), Seq("qid"))
      .join(base.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("nrm").as("cn")), Seq("cand_id"))
      .select(col("qid"), col("cand_id"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6).as("score"))
    val ivf3mp = cmps.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("qid", "cand_id")
    def hitsOf(sel: DataFrame, name: String): DataFrame =
      sel.join(ex3, Seq("qid", "cand_id")).groupBy("qid")
        .agg(count(lit(1)).as(name))
    ivf3.select("qid").distinct()
      .join(hitsOf(ivf3, "h1"), Seq("qid"), "left")
      .join(hitsOf(ivf3mp, "h4"), Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("h1"), lit(0L)).as("n_hits_1"),
        (coalesce(col("h1"), lit(0L)) / lit(3.0d)).as("recall_1"),
        coalesce(col("h4"), lit(0L)).as(s"n_hits_$NProbe"),
        (coalesce(col("h4"), lit(0L)) / lit(3.0d)).as(s"recall_$NProbe"))
      .orderBy("qid")
  }

  /** Semantic dedup over the trained cells (the SemDeDup shape: cluster,
    * then prune within-cluster near-identical pairs): a vector is a dup
    * if a LOWER-id vector in the same trained cell has cosine ≥ 0.4 with
    * it; the keeper is the lowest such id. The pair join is strictly
    * cell-local — the same bounded-bucket discipline as the LSH pipeline,
    * with cell population controlled by KCells ≈ sqrt(N) at scale. Output
    * is the full per-vector verdict table a curation pipeline joins
    * against. */
  val semDedup: Q = Q(
    "q_semdedup",
    s"""WITH $ivfCtesSql,
       |cand AS (SELECT sb.vec_id, min(sa.vec_id) AS keeper
       |  FROM $AFinal sa JOIN $AFinal sb ON sa.cid = sb.cid AND sa.vec_id < sb.vec_id
       |  JOIN v a ON a.vec_id = sa.vec_id
       |  JOIN v b ON b.vec_id = sb.vec_id
       |  WHERE round(list_inner_product(a.e, b.e) / (a.vn * b.vn), 6) >= 0.4
       |  GROUP BY sb.vec_id)
       |SELECT f.vec_id, f.cid AS cell,
       |  coalesce(c.keeper, -1) AS keeper,
       |  CASE WHEN c.keeper IS NULL THEN 0 ELSE 1 END AS is_dup
       |FROM $AFinal f LEFT JOIN cand c ON c.vec_id = f.vec_id
       |ORDER BY f.vec_id""".stripMargin
  ) { (s, d) =>
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorOps.vecDot(s, a, b)
    val (a2, _) = trainedAssignment(s, d)
    val base = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val pa = a2.select(col("vec_id").as("a_id"), col("cid"))
    val pb = a2.select(col("vec_id").as("b_id"), col("cid"))
    val cand = pa.join(pb, "cid").filter(col("a_id") < col("b_id"))
      .join(base.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("nrm").as("na")), "a_id")
      .join(base.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nrm").as("nb")), "b_id")
      .filter(round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6) >= 0.4)
      .groupBy("b_id").agg(min(col("a_id")).as("keeper"))
    a2.join(cand.withColumnRenamed("b_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").as("cell"),
        coalesce(col("keeper"), lit(-1L)).as("keeper"),
        when(col("keeper").isNull, lit(0)).otherwise(lit(1)).as("is_dup"))
      .orderBy("vec_id")
  }

  /** Everything the trained-IVF queries build on: the code table `qc`
    * (vec_id, cd, n2), the final cell assignment, the final centroid
    * table, and the code-space cosine used for assignment. */
  private[ops] final case class IvfParts(
      qc: DataFrame, assign: DataFrame, cents: DataFrame, cosExpr: Column)

  /** The trained-k-means cell assignment (vec_id, cid) plus the probe
    * result — factored so the spec can grade the assignment quality. */
  private[ops] def trainedAssignment(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (parts, probe) = trainedParts(s, d)
    (parts.assign, probe)
  }

  /** Full training output incl. the final centroids (multi-probe needs
    * them to rank cells per query). */
  private[ops] def trainedParts(s: SparkSession, d: String): (IvfParts, DataFrame) = {
    def dotD(a: Column, b: Column): Column = graft.functions.VectorOps.vecDotD(s, a, b)
    val dims = 1 to 64
    val e = col("embedding").cast(ArrayType(DoubleType))
    val codes = transform(e, x => round(x * Scale, 0))
    val qc = T.embeddings(s, d).select(col("vec_id"), codes.as("cd"))
      .withColumn("n2", dotD(col("cd"), col("cd")))
      // qc feeds every Lloyd round + the final probe; localCheckpoint (not
      // cache) so blocks are released when the plan is GC'd.
      .localCheckpoint()
    val seeds = qc.filter(col("vec_id") < KCells)
      .select(col("vec_id").as("cid"), col("cd").as("ccd"), col("n2").as("cn2"))
    def assign(cents: DataFrame): DataFrame = {
      val cos = when(col("n2") === 0.0d || col("cn2") === 0.0d, lit(-2.0d))
        .otherwise(round(dotD(col("cd"), col("ccd")) / (sqrt(col("n2")) * sqrt(col("cn2"))), 6))
      // argmax(cos DESC, cid ASC) as a hash-aggregate max over
      // struct(cos, -cid): same pick as the oracle's row_number()=1, but a
      // partial-aggregating shuffle with no per-round sort — one less
      // stage per Lloyd round than a window formulation.
      qc.crossJoin(broadcast(cents))
        .withColumn("cos", cos)
        .groupBy("vec_id")
        .agg(max(struct(col("cos"), (-col("cid")).as("negcid"))).as("__m"))
        .select(col("vec_id"), (-col("__m.negcid")).as("cid"))
    }
    def update(a: DataFrame): DataFrame = {
      // 64 per-dim SUM columns: native partial (map-side) aggregation, no
      // explode — each partition ships one 64-long vector per cell.
      val sums = dims.map(i => sum(element_at(col("cd"), i)).as(s"s$i"))
      a.join(qc.select("vec_id", "cd"), "vec_id")
        .groupBy("cid").agg(sums.head, sums.tail: _*)
        .select(col("cid"), array(dims.map(i => col(s"s$i")): _*).as("ccd"))
        .withColumn("cn2", dotD(col("ccd"), col("ccd")))
    }
    val (trained, cFinal) = (1 to Iters)
      .foldLeft((assign(seeds), seeds)) { case ((a, _), _) =>
        val c = update(a); (assign(c), c)
      }
    // assignment is referenced on both sides of the probe self-join;
    // localCheckpoint so the Lloyd rounds run once, not twice.
    val a2 = trained.localCheckpoint()
    val cosToCent = when(col("n2") === 0.0d || col("cn2") === 0.0d, lit(-2.0d))
      .otherwise(round(dotD(col("cd"), col("ccd")) / (sqrt(col("n2")) * sqrt(col("cn2"))), 6))
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorOps.vecDot(s, a, b)
    val base = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val qa = a2.filter(col("vec_id").between(16, 20))
      .select(col("vec_id").as("qid"), col("cid"))
    val cand = qa.join(a2.select(col("vec_id").as("cand_id"), col("cid")), Seq("cid"))
      .filter(col("cand_id") =!= col("qid"))
    val vq = base.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val vc = base.select(col("vec_id").as("cand_id"), col("embedding").as("cande"), col("nrm").as("candn"))
    val cscore = cand.join(vq, Seq("qid")).join(vc, Seq("cand_id"))
      .select(col("qid"), col("cand_id"),
        round(dot(col("qe"), col("cande")) / (col("qn") * col("candn")), 6).as("score"))
    val wRank = Window.partitionBy("qid").orderBy(col("score").desc, col("cand_id").asc)
    val probe = cscore.withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("rn"), col("cand_id").as("vec_id"), col("score"))
      .orderBy("qid", "rn")
    (IvfParts(qc, a2, cFinal, cosToCent), probe)
  }

  /** The round-4 stand-in assignment (16 lowest vec_ids as centroids) —
    * kept only as the quality baseline for SimilaritySpec. */
  private[ops] def standinAssignment(s: SparkSession, d: String): DataFrame = {
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorOps.vecDot(s, a, b)
    val base = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val cents = base.filter(col("vec_id") < KCells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid").asc)
    base.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("vec_id", "cid")
  }

  /** Mean cosine of each vector to its cell's (sum-)centroid — the
    * k-means objective the spec grades trained-vs-standin on. */
  private[ops] def intraCellCosine(s: SparkSession, d: String, assign: DataFrame): Double = {
    def dotD(a: Column, b: Column): Column = graft.functions.VectorOps.vecDotD(s, a, b)
    val dims = 1 to 64
    val e = col("embedding").cast(ArrayType(DoubleType))
    val v = T.embeddings(s, d).select(col("vec_id"), e.as("e"))
    val sums = dims.map(i => sum(element_at(col("e"), i)).as(s"s$i"))
    val cents = assign.join(v, "vec_id").groupBy("cid")
      .agg(sums.head, sums.tail: _*)
      .select(col("cid"), array(dims.map(i => col(s"s$i")): _*).as("ce"))
    val scored = assign.join(v, "vec_id").join(broadcast(cents), "cid")
      .select((dotD(col("e"), col("ce")) /
        (sqrt(dotD(col("e"), col("e"))) * sqrt(dotD(col("ce"), col("ce"))))).as("cos"))
    scored.agg(avg("cos")).head().getDouble(0)
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

  val all: Seq[Q] = Seq(similarityLsh, embedNearDup, similarityIvf,
    annRecall, semDedup, embedQuantize)
}
