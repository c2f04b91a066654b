package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSuite

/** The model registry must be a pure memoizer: identical corpus state →
  * the SAME trained artifact (no retrain); changed corpus state → a
  * fresh train. Correctness of what is cached is graded by
  * SimilaritySpec/PqSpec — this suite grades the cache contract. */
class ModelCacheSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("second trainedParts call is a cache hit returning the same artifact") {
    val first = graft.ops.Similarity.trainedParts(spark, sf)
    val second = graft.ops.Similarity.trainedParts(spark, sf)
    assert(first.eq(second), "same session + same corpus must not retrain")
  }

  test("fingerprint tracks content state, not path existence alone") {
    val dir = tmpDir("mc")
    val src = Paths.get(s"$sf/embeddings.parquet")
    val dst = Paths.get(s"$dir/embeddings.parquet")
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    val f1 = ModelCache.fingerprint(spark, dst.toString)
    assert(f1 == ModelCache.fingerprint(spark, dst.toString))
    // a new snapshot drop = different (length, mtime) → different key
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    assert(f1 != ModelCache.fingerprint(spark, dst.toString))
    assert(ModelCache.fingerprint(spark, s"$dir/nope.parquet") == "absent")
  }

  test("a changed corpus retrains instead of serving the stale model") {
    val dir = tmpDir("mc")
    val dst = Paths.get(s"$dir/embeddings.parquet")
    Files.copy(Paths.get(s"$sf/embeddings.parquet"), dst,
      StandardCopyOption.REPLACE_EXISTING)
    val first = graft.ops.Similarity.trainedParts(spark, dir)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    val second = graft.ops.Similarity.trainedParts(spark, dir)
    assert(!first.eq(second), "changed corpus state must invalidate the model")
    // same bytes → same deterministic training result either way
    assert(first._1.assign.collect().toSeq == second._1.assign.collect().toSeq)
  }
}
