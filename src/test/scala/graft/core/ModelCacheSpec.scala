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

  test("unrelated keys do not serialize behind an in-flight train") {
    // training runs outside the map (holder lazy val, a per-key
    // monitor) — a multi-second train on one key must not block
    // getOrTrain on another (computeIfAbsent held the bin lock).
    ModelCache.clear()
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val dir = tmpDir("par") + "/absent-corpus"
    val slow = scala.concurrent.Future {
      ModelCache.getOrTrain(spark, "par-slow", dir) {
        started.countDown(); release.await(); new Object
      }
    }(scala.concurrent.ExecutionContext.global)
    started.await()
    val t0 = System.nanoTime()
    val fast = ModelCache.getOrTrain(spark, "par-fast", dir)(new Object)
    val ms = (System.nanoTime() - t0) / 1e6
    release.countDown()
    scala.concurrent.Await.result(slow,
      scala.concurrent.duration.Duration(30, "s"))
    assert(fast != null)
    assert(ms < 5000, s"independent key blocked $ms ms behind a train")
  }

  test("a train may itself call getOrTrain on another key of the same session") {
    // the composed-model shape (e.g. an IVFPQ artifact built from the
    // frozen IVF one): under computeIfAbsent this was a recursive map
    // update — forbidden by contract; with holders it must just work.
    ModelCache.clear()
    val dir = tmpDir("nest") + "/absent-corpus"
    val inner = new Object
    val outer = ModelCache.getOrTrain(spark, "nest-outer", dir) {
      val i = ModelCache.getOrTrain(spark, "nest-inner", dir)(inner)
      (i, new Object)
    }
    assert(outer._1.eq(inner))
    assert(ModelCache.getOrTrain(spark, "nest-inner", dir)(new Object).eq(inner),
      "the inner model trained inside an outer train must be memoized")
  }

  test("a model discarded by the clear() race is unpersisted") {
    ModelCache.clear()
    val started = new java.util.concurrent.CountDownLatch(1)
    val proceed = new java.util.concurrent.CountDownLatch(1)
    val dfs = new java.util.concurrent.CopyOnWriteArrayList[
      org.apache.spark.sql.DataFrame]()
    val dir = tmpDir("rel") + "/absent-corpus"
    val fut = scala.concurrent.Future {
      ModelCache.getOrTrain(spark, "rel", dir) {
        // each train builds a DISTINCT plan (the gen column): storageLevel
        // resolves through the cache manager by plan equality, so two
        // identical plans would make the discarded frame report the
        // survivor's cache entry and mask the unpersist under test
        val df = spark.range(10).toDF("v")
          .withColumn("gen", org.apache.spark.sql.functions.lit(dfs.size()))
          .cache()
        df.count()
        dfs.add(df)
        started.countDown(); proceed.await()
        Tuple1(df) // Product wrap: the discard walk must find the frame
      }
    }(scala.concurrent.ExecutionContext.global)
    started.await()
    ModelCache.clear() // detaches the trainer's inner map mid-train
    proceed.countDown()
    val served = scala.concurrent.Await.result(fut,
      scala.concurrent.duration.Duration(30, "s"))
    assert(dfs.size == 2, "discard must retrain")
    assert(dfs.get(0).storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "the discarded model's cached blocks must be unpersisted")
    assert(dfs.get(1).storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "the served model must keep its blocks")
    assert(served._1.eq(dfs.get(1)))
  }
  test("getOrRefresh publish is monotone: a straggler's older generation cannot regress `latest`") {
    // Round-12 advice: two callers straddling a corpus append could
    // publish generations out of order — last-writer-wins would point
    // `latest` back at the OLDER fingerprint, and the next refresh
    // would derive its delta from a base that already lost a merge.
    // The straggler (thread A) lists gen-1, blocks inside its train;
    // the main thread appends a file and completes a gen-2 train; A
    // then finishes — its publish must be REFUSED (gen-1's files are
    // not a superset of gen-2's, nor newer). Proof is behavioral: a
    // THIRD generation must refresh from the gen-2 artifact.
    ModelCache.clear()
    val dir = tmpDir("mono")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/corpus"))
    def drop(n: Int): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/corpus/part-$n"),
        s"data$n".getBytes("UTF-8"))
      // strictly increasing mtimes so "newer rewrite" can never be the
      // reason the straggler wins
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$dir/corpus/part-$n"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + n * 1000L))
    }
    def files(): Int =
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/corpus"))
        .count().toInt
    drop(1)
    val listed = new java.util.concurrent.CountDownLatch(1)
    val go = new java.util.concurrent.CountDownLatch(1)
    val straggler = scala.concurrent.Future {
      ModelCache.getOrRefresh(spark, "mono", s"$dir/corpus") {
        val seen = s"base:${files()}"
        listed.countDown(); go.await()
        seen
      }(prev => s"$prev+delta")
    }(scala.concurrent.ExecutionContext.global)
    listed.await() // A's listing (gen 1) is pinned; its train is in flight
    drop(2)
    val gen2 = ModelCache.getOrRefresh(spark, "mono", s"$dir/corpus") {
      s"base:${files()}"
    }(prev => s"$prev+delta")
    assert(gen2 == "base:2", "main thread trains gen 2 fresh (no latest yet)")
    go.countDown()
    val gen1 = scala.concurrent.Await.result(straggler,
      scala.concurrent.duration.Duration(30, "s"))
    assert(gen1 == "base:1", "the straggler still gets ITS generation's value")
    // third generation: the refresh must roll forward from gen 2
    drop(3)
    val gen3 = ModelCache.getOrRefresh(spark, "mono", s"$dir/corpus") {
      s"base:${files()}"
    }(prev => s"$prev+delta")
    assert(gen3 == "base:2+delta",
      s"latest regressed to the straggler's generation: refresh produced $gen3")
  }

  test("getOrRefresh publish: a same-mtime non-append rewrite still publishes (coarse-mtime tiebreak)") {
    // Round-13 advice: filesystem mtime is coarse, so a rewrite can land
    // in the SAME tick as the generation it replaces. Monotone publish
    // must not refuse it — ">" alone would pin `latest` to the old
    // generation forever, and every later generation would retrain
    // instead of refresh. The append-straggler hazard needs my-files ⊂
    // stored-files, which a rewrite (disjoint file sets) never is.
    ModelCache.clear()
    val dir = tmpDir("tie")
    val corpus = java.nio.file.Paths.get(s"$dir/corpus")
    java.nio.file.Files.createDirectories(corpus)
    val tick = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    def put(name: String, mtime: java.nio.file.attribute.FileTime): Unit = {
      val p = corpus.resolve(name)
      java.nio.file.Files.write(p, s"data-$name".getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(p, mtime)
    }
    put("part-a", tick)
    val gen1 = ModelCache.getOrRefresh(spark, "tie", s"$dir/corpus") {
      "base:a"
    }(prev => s"$prev+delta")
    assert(gen1 == "base:a")
    // rewrite in the same mtime tick: part-a replaced by part-b
    java.nio.file.Files.delete(corpus.resolve("part-a"))
    put("part-b", tick)
    val gen2 = ModelCache.getOrRefresh(spark, "tie", s"$dir/corpus") {
      "base:b"
    }(prev => s"$prev+delta")
    assert(gen2 == "base:b", "a rewrite is a retrain, never a refresh")
    // third generation appends — its refresh must roll forward from the
    // REWRITTEN base, proving the same-tick publish was accepted
    put("part-c", java.nio.file.attribute.FileTime.fromMillis(1700000001000L))
    val gen3 = ModelCache.getOrRefresh(spark, "tie", s"$dir/corpus") {
      "base:unexpected-retrain"
    }(prev => s"$prev+delta")
    assert(gen3 == "base:b+delta",
      s"same-tick rewrite publish was refused: gen3 = $gen3")
  }

  test("buildCosts ledger: train and refresh seconds accumulate per kind; clear resets") {
    ModelCache.clear()
    assert(ModelCache.buildCosts.isEmpty)
    val dir = tmpDir("costs")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/c"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/c/p1"), "x".getBytes)
    ModelCache.getOrTrain(spark, "cost-kind", s"$dir/c") {
      Thread.sleep(30); new Object
    }
    val afterTrain = ModelCache.buildCosts("cost-kind")
    assert(afterTrain >= 0.025, s"train wall time must be recorded: $afterTrain")
    // cache hit: no additional cost
    ModelCache.getOrTrain(spark, "cost-kind", s"$dir/c")(new Object)
    assert(ModelCache.buildCosts("cost-kind") == afterTrain)
    // a refresh on another kind records under ITS kind
    ModelCache.getOrRefresh(spark, "cost-kind2", s"$dir/c") {
      Thread.sleep(10); "v1"
    }(p => p + "+d")
    assert(ModelCache.buildCosts.contains("cost-kind2"))
    ModelCache.clear()
    assert(ModelCache.buildCosts.isEmpty)
  }

  test("getOrRefreshGuarded: refresh receives EXACTLY the appended files; None falls back to retrain as 'retrained'") {
    // the backfill guards' whole contract hangs on `newFiles` being the
    // precise listing diff — a missed file means a missed backfill, an
    // extra one means a spurious O(old-corpus) probe
    val dir = tmpDir("mc-guard")
    java.nio.file.Files.createDirectories(Paths.get(s"$dir/t"))
    java.nio.file.Files.write(Paths.get(s"$dir/t/p1.parquet"), "a".getBytes)
    var seen: Seq[String] = null
    var trains = 0
    def access(decline: Boolean): String =
      ModelCache.getOrRefreshGuarded(spark, "guard-kind", s"$dir/t") {
        trains += 1; s"train$trains"
      } { (prev, newFiles) =>
        seen = newFiles
        if (decline) None else Some(prev + "+d")
      }
    assert(access(decline = false) == "train1")
    assert(ModelCache.lastEvent("guard-kind", s"$dir/t").contains("trained"))
    // append two files → refresh sees exactly those two, full paths
    java.nio.file.Files.write(Paths.get(s"$dir/t/p2.parquet"), "bb".getBytes)
    java.nio.file.Files.write(Paths.get(s"$dir/t/p3.parquet"), "ccc".getBytes)
    assert(access(decline = false) == "train1+d")
    assert(ModelCache.lastEvent("guard-kind", s"$dir/t").contains("refreshed"))
    assert(seen != null && seen.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
      == Seq("p2.parquet", "p3.parquet"),
      s"newFiles must be exactly the listing diff: $seen")
    assert(seen.forall(_.contains(s"t/p")), "paths must be full, resolvable paths")
    // append one more but DECLINE → from-scratch retrain, event 'retrained'
    java.nio.file.Files.write(Paths.get(s"$dir/t/p4.parquet"), "dddd".getBytes)
    assert(access(decline = true) == "train2",
      "a declined merge must rebuild from scratch")
    assert(ModelCache.lastEvent("guard-kind", s"$dir/t").contains("retrained"),
      "the guard fallback must be observable as its own lifecycle event")
    // and the NEXT clean append refreshes off the retrained generation
    java.nio.file.Files.write(Paths.get(s"$dir/t/p5.parquet"), "e".getBytes)
    assert(access(decline = false) == "train2+d")
    assert(seen.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("p5.parquet"),
      "the diff must be against the retrained generation, not the original")
    ModelCache.clear()
  }

  test("markWarmRefresh is nesting-safe: an inner refresh cannot wipe the outer mark") {
    // Round-17 advice: the warm mark was a ThreadLocal cleared
    // unconditionally on refresh entry, so an outer closure that marks
    // warm and THEN transitively enters another getOrRefreshGuarded had
    // its mark erased by the nested call — the outer generation recorded
    // "refreshed" for a quality-parity-only merge. Save/restore around
    // the closure body fixes it; this pins the contract.
    val dir = tmpDir("mc-warm-nest")
    for (t <- Seq("outer", "inner"))
      java.nio.file.Files.createDirectories(Paths.get(s"$dir/$t"))
    def seed(t: String, f: String): Unit =
      java.nio.file.Files.write(Paths.get(s"$dir/$t/$f"), f.getBytes)
    def accessInner(): String =
      ModelCache.getOrRefreshGuarded(spark, "nest-inner", s"$dir/inner") {
        "inner-train"
      } { (prev, _) => Some(prev + "+d") } // exact merge: no warm mark
    def accessOuter(): String =
      ModelCache.getOrRefreshGuarded(spark, "nest-outer", s"$dir/outer") {
        "outer-train"
      } { (prev, _) =>
        ModelCache.markWarmRefresh() // outer merge is quality-parity only
        accessInner()                // nested refresh on the SAME thread
        Some(prev + "+w")
      }
    seed("outer", "p1.parquet"); seed("inner", "p1.parquet")
    assert(accessOuter() == "outer-train" && accessInner() == "inner-train")
    seed("outer", "p2.parquet"); seed("inner", "p2.parquet")
    assert(accessOuter() == "outer-train+w")
    assert(ModelCache.lastEvent("nest-inner", s"$dir/inner").contains("refreshed")
      && !ModelCache.lastEvent("nest-inner", s"$dir/inner").contains("refreshed-warm"),
      "the unmarked inner merge must stay a plain 'refreshed'")
    assert(ModelCache.lastEvent("nest-outer", s"$dir/outer").contains("refreshed-warm"),
      "the outer mark must survive a nested refresh on the same thread")
    ModelCache.clear()
  }
}
