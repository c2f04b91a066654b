package graft.core

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Round-19 census-digest switch (guide §2.3 "narrower types"): the
  * shingle/bigram census families may key their exchanges on xxhash64
  * fingerprints instead of the strings. The pin: results are
  * bit-identical with the switch ON and OFF for every query that rides
  * it — the digest sits strictly below the declared aggregation, so it
  * may never change what a query computes. */
class CensusDigestSpec extends SparkSuite {
  import spark.implicits._

  /** Docs with 10–16 tokens (≥ 8 so every doc shingles), heavy overlap
    * so the containment/novelty censuses are non-trivially populated —
    * including exact prefix-engulfment pairs. */
  private def writeDocs(dir: String): Unit = {
    // per pair i: a 12-token doc and a 9-token PREFIX doc — the prefix's
    // 2 shingles are both inside the long doc (cont 100%), each shared
    // shingle has df = 2 (inside the rare 2..8 band), and every pair's
    // tokens are disjoint from other pairs' so nothing turns boilerplate
    (0 until 20).flatMap { i =>
      val toks = (0 until 12).map(j => s"t${i}w$j")
      Seq((2L * i, toks.mkString(" ")),
        (2L * i + 1, toks.take(9).mkString(" ")))
    }.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private val queries = Seq("q_dedup_containment", "q_containment_delta",
    "q_ngram_novelty", "q_novelty_delta", "q_bigram_lm")

  private def runAll(d: String): Map[String, Seq[String]] =
    queries.map { q =>
      q -> graft.SparkEntry.queries(q)(spark, d)
        .collect().map(_.toString).toSeq
    }.toMap

  test("digest ON == digest OFF for every census-family query") {
    val d = tmpDir("census-digest")
    writeDocs(d)
    ModelCache.clear() // artifacts must not leak across digest states
    spark.conf.set("spark.graft.censusDigest", "off")
    val off = runAll(d)
    ModelCache.clear()
    spark.conf.set("spark.graft.censusDigest", "on")
    val on =
      try runAll(d)
      finally { spark.conf.unset("spark.graft.censusDigest"); ModelCache.clear() }
    queries.foreach { q =>
      assert(on(q) == off(q), s"$q differs between digest states")
      assert(off(q).nonEmpty, s"$q fixture produced an empty result — vacuous")
    }
  }

  test("digest changes the shingle key dtype, not the relation") {
    val docs = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val s0 = graft.ops.Dedup.shinglesOf(docs)
    val s1 = graft.ops.Dedup.shinglesOf(docs, digest = true)
    assert(s0.schema("shingle").dataType == StringType)
    assert(s1.schema("shingle").dataType == LongType)
    assert(s0.count() == s1.count(), "digest must not change shingle counts")
  }

  test("auto mode resolves OFF below the size bar, explicit on/off win") {
    val d = tmpDir("census-digest-auto")
    writeDocs(d) // tiny: far below the 2 MB auto bar
    spark.conf.unset("spark.graft.censusDigest")
    assert(!graft.ops.Dedup.censusDigest(spark, d), "tiny dir must stay off")
    spark.conf.set("spark.graft.censusDigest", "on")
    try assert(graft.ops.Dedup.censusDigest(spark, d))
    finally spark.conf.unset("spark.graft.censusDigest")
  }
}
