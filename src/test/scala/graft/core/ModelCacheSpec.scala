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

  test("fingerprint invalidates a same-length rewrite when mtime moves") {
    // The round-8 digest upgrade exists so content state is keyed by a
    // wide digest of (name, len, mtime) — a rewrite that keeps the byte
    // length identical but lands at a different mtime MUST change the key.
    val dir = tmpDir("mc")
    val dst = Paths.get(s"$dir/embeddings.parquet")
    Files.copy(Paths.get(s"$sf/embeddings.parquet"), dst,
      StandardCopyOption.REPLACE_EXISTING)
    val before = ModelCache.fingerprint(spark, dir)
    // simulate an in-place same-length rewrite: same bytes, new mtime
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(dst).toMillis + 1))
    val after = ModelCache.fingerprint(spark, dir)
    assert(before != after, "same-length rewrite with a new mtime must invalidate")
    assert(before.length == 64 && after.length == 64, "SHA-256 hex digest expected")
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

  test("a model trained concurrently with clear() does not survive it") {
    // clear() is a hard barrier: getOrTrain publishes only through the
    // currently-registered per-session map, so a train that was in flight
    // when clear() ran must be thrown away and re-trained fresh.
    ModelCache.clear()
    val started = new java.util.concurrent.CountDownLatch(1)
    val proceed = new java.util.concurrent.CountDownLatch(1)
    val trains = new java.util.concurrent.atomic.AtomicInteger(0)
    val dir = tmpDir("race") + "/absent-corpus"
    val fut = scala.concurrent.Future {
      ModelCache.getOrTrain(spark, "race", dir) {
        trains.incrementAndGet()
        started.countDown()
        proceed.await()
        new Object
      }
    }(scala.concurrent.ExecutionContext.global)
    started.await()
    ModelCache.clear() // detaches the trainer's inner map mid-train
    proceed.countDown()
    val v = scala.concurrent.Await.result(fut,
      scala.concurrent.duration.Duration(30, "s"))
    assert(trains.get() == 2,
      "the detached-map train must be discarded and re-run post-clear")
    // the re-trained model is the one the registry now serves
    val again = ModelCache.getOrTrain(spark, "race", dir)(new Object)
    assert(again.eq(v) && trains.get() == 2)
  }
}
