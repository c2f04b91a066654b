package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Compaction must change the file layout and NOTHING else: row count and
  * the order-independent content digest are asserted identical across the
  * rewrite. */
class MaintenanceSpec extends SparkSuite {

  private def digest(dir: String): Long = {
    val df = spark.read.parquet(dir)
    df.agg(coalesce(sum(Canonical.rowDigestExact(df)), lit(0L))).head().getLong(0)
  }

  test("compact bin-packs small files without changing content") {
    val dir = tmpDir("compact") + "/events"
    val src = Tables.events(spark, "/root/testdata/sf0.001")
    src.repartition(20).write.mode("overwrite").parquet(dir)
    val before = digest(dir)
    val n = spark.read.parquet(dir).count()
    val (filesBefore, filesAfter) = Maintenance.compact(spark, dir)
    assert(filesBefore == 20)
    assert(filesAfter == 1, s"tiny table should pack to one file, got $filesAfter")
    assert(spark.read.parquet(dir).count() == n)
    assert(digest(dir) == before, "content digest changed across compaction")
  }

  test("compactZOrder keeps content identical and makes point predicates prune files") {
    // The write-side half of q_zorder_layout: after the z-clustered
    // rewrite, per-file min/max stats must be tight enough in BOTH
    // dimensions that a `user_id = k` reader can skip most files, where
    // the time-ordered layout forces it to touch every file. Measured
    // from the REAL parquet footers of the rewritten files via the same
    // min/max-contains-k rule every stats-pruning reader applies.
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val timeDir = tmpDir("zorder") + "/time"
    val zDir = tmpDir("zorder") + "/z"
    // the naive layout a streaming sink produces: files ordered by arrival
    ev.repartitionByRange(64, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(timeDir)
    ev.repartitionByRange(64, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(zDir)
    val before = digest(zDir)
    val (_, filesAfter) = Maintenance.compactZOrder(spark, zDir,
      "user_id", "unix_micros(ts) div 3600000000", nFiles = 64)
    assert(filesAfter == 64)
    assert(digest(zDir) == before, "z-order rewrite must not change content")

    // per-file stats as a pruning reader sees them: file is a candidate
    // for user_id = k iff min ≤ k ≤ max
    def stats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"),
        count(lit(1)).as("rows"))
      .collect()
    val k = 42L
    def candidates(rows: Array[org.apache.spark.sql.Row]) =
      rows.filter(r => r.getLong(1) <= k && k <= r.getLong(2))
    val (tAll, zAll) = (stats(timeDir), stats(zDir))
    val (tCand, zCand) = (candidates(tAll), candidates(zAll))
    // time layout: every file spans ~the whole user domain → no skipping
    assert(tCand.length >= tAll.length * 9 / 10,
      s"time layout should be unprunable, ${tCand.length}/${tAll.length}")
    // z layout: only the z-bands whose x-range covers k remain
    assert(zCand.length * 4 <= tCand.length,
      s"z-order must prune ≥4× more files: ${zCand.length} vs ${tCand.length}")
    val (tRows, zRows) = (tCand.map(_.getLong(3)).sum, zCand.map(_.getLong(3)).sum)
    assert(zRows * 3 <= tRows,
      s"z-order must cut scanned rows ≥3×: $zRows vs $tRows")
    // record the measured ratios for BASELINE.md (read from test output)
    info(s"zorder pruning: files ${zCand.length}/${zAll.length} vs " +
      s"time ${tCand.length}/${tAll.length}; rows $zRows vs $tRows")
  }

  test("compactZOrder default sizes output from data volume, not a fixed band count") {
    // a small dir must COMPACT (like compact()) while clustering — the
    // fixed-64-bands shape is an explicit override, not the default
    val dir = tmpDir("zauto") + "/events"
    Tables.events(spark, "/root/testdata/sf0.001").repartition(8)
      .write.mode("overwrite").parquet(dir)
    val before = digest(dir)
    val (filesBefore, filesAfter) = Maintenance.compactZOrder(spark, dir,
      "user_id", "unix_micros(ts) div 3600000000")
    assert(filesBefore == 8)
    assert(filesAfter == 1, s"a tiny dir should pack to one file, got $filesAfter")
    assert(digest(dir) == before, "auto-sized z rewrite must not change content")
  }

  test("compact refuses a directory of partition subdirs instead of flattening it") {
    val dir = tmpDir("compactguard") + "/state"
    Tables.events(spark, "/root/testdata/sf0.001").limit(5)
      .write.mode("overwrite").parquet(s"$dir/v=0")
    val e = intercept[IllegalArgumentException](Maintenance.compact(spark, dir))
    assert(e.getMessage.contains("leaf"))
    // the versioned layout is untouched
    assert(Files.exists(Paths.get(s"$dir/v=0")))
  }

  test("pruneVersions keeps the newest versions and reports the dropped ones") {
    val dir = tmpDir("prune") + "/state"
    (0L to 4L).foreach { v =>
      Files.createDirectories(Paths.get(s"$dir/v=$v"))
      Files.writeString(Paths.get(s"$dir/v=$v/marker"), v.toString)
    }
    val dropped = Maintenance.pruneVersions(spark, dir, keep = 2)
    assert(dropped == Seq(0L, 1L, 2L))
    assert(Files.exists(Paths.get(s"$dir/v=3")) && Files.exists(Paths.get(s"$dir/v=4")))
    assert(!Files.exists(Paths.get(s"$dir/v=0")))
    // pruning a missing dir is a no-op, not an error
    assert(Maintenance.pruneVersions(spark, s"$dir/nope", keep = 1).isEmpty)
  }

  test("diff-mode state stays readable after pruning old versions") {
    import spark.implicits._
    val base = tmpDir("prunecdc")
    val cfg = graft.streaming.CdcPipeline.Config(
      inputDir = s"$base/in", outputDir = s"$base/out",
      metadataDir = s"$base/meta", checkpointDir = s"$base/ckpt",
      tableName = "users", mode = "diff", keyCols = Seq("id"))
    val t0 = java.sql.Timestamp.valueOf("2024-12-20 10:00:00")
    val v1 = Seq((1, "a", t0), (2, "b", t0)).toDF("id", "v", "ts")
    val v2 = Seq((1, "a", t0), (2, "B", t0)).toDF("id", "v", "ts")
    val v3 = Seq((1, "a", t0), (2, "B", t0), (3, "c", t0)).toDF("id", "v", "ts")
    assert(graft.streaming.CdcPipeline.processBatch(spark, v1, cfg))
    assert(graft.streaming.CdcPipeline.processBatch(spark, v2, cfg))
    assert(graft.streaming.CdcPipeline.processBatch(spark, v3, cfg))
    val stateRoot = s"${cfg.metadataDir}/state/table_name=users"
    Maintenance.pruneVersions(spark, stateRoot, keep = 1)
    // next diff must run against the surviving latest version
    val v4 = Seq((1, "a", t0), (3, "c", t0)).toDF("id", "v", "ts")
    assert(graft.streaming.CdcPipeline.processBatch(spark, v4, cfg))
    val lines = Files.walk(Paths.get(cfg.outputDir)).iterator()
    val deletes = scala.jdk.CollectionConverters.IteratorHasAsScala(lines).asScala
      .filter(p => p.toString.endsWith(".json"))
      .flatMap(p => scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(p)).asScala)
      .count(_.contains("\"operation\":\"DELETE\""))
    assert(deletes == 1, "the id=2 delete must be diffed against the pruned-to state")
  }

  test("prunePins drops only listing pins below the committed floor") {
    val dir = tmpDir("pins")
    val p = Paths.get(dir)
    (0L to 5L).foreach(e => Files.write(p.resolve(s"epoch-$e"),
      s"#ts\t$e\nusers\t/drop-$e\n".getBytes("UTF-8")))
    Files.write(p.resolve("not-a-pin"), "x".getBytes("UTF-8"))
    // crash debris: a tmp that never got renamed (old epoch) and one that
    // is still replayable (at the floor) — only the old one is reclaimed
    Files.write(p.resolve(".epoch-2.tmp"), "partial".getBytes("UTF-8"))
    Files.write(p.resolve(".epoch-5.tmp"), "partial".getBytes("UTF-8"))
    val pruned = Maintenance.prunePins(spark, dir, keepFrom = 4L)
    assert(pruned == Seq(0L, 1L, 2L, 3L))
    val left = Files.list(p).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(left)
      .asScala.map(_.getFileName.toString).toSet
    assert(names == Set("epoch-4", "epoch-5", ".epoch-5.tmp", "not-a-pin"),
      s"replayable pins and foreign files must survive: $names")
    assert(Maintenance.prunePins(spark, s"$dir/missing", 10L).isEmpty)
  }

  test("prunes tolerate non-numeric foreign names instead of aborting") {
    // prunePins: `epoch-backup` (and a non-numeric tmp) must be skipped,
    // not throw NumberFormatException and abort the whole prune
    val dir = tmpDir("foreignpins")
    val p = Paths.get(dir)
    Files.write(p.resolve("epoch-0"), "#ts\t0\n".getBytes("UTF-8"))
    Files.write(p.resolve("epoch-backup"), "x".getBytes("UTF-8"))
    Files.write(p.resolve(".epoch-old.tmp"), "x".getBytes("UTF-8"))
    assert(Maintenance.prunePins(spark, dir, keepFrom = 5L) == Seq(0L))
    assert(Files.exists(p.resolve("epoch-backup")))
    assert(Files.exists(p.resolve(".epoch-old.tmp")))
    // pruneVersions: `v=backup` alongside numeric versions
    val vdir = tmpDir("foreignvers") + "/state"
    (0L to 2L).foreach(v => Files.createDirectories(Paths.get(s"$vdir/v=$v")))
    Files.createDirectories(Paths.get(s"$vdir/v=backup"))
    assert(Maintenance.pruneVersions(spark, vdir, keep = 1) == Seq(0L, 1L))
    assert(Files.exists(Paths.get(s"$vdir/v=backup")))
  }

  test("recoverSwapDebris: each interrupted-swap state restores the leaf intact") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("swapdebris") + "/state"
    def mkLeaf(name: String): String = {
      val leaf = s"$root/$name"
      spark.range(5).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(leaf)
      leaf
    }
    def rows(leaf: String): Set[Long] =
      spark.read.parquet(leaf).collect().map(_.getLong(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // state A: crash between the two renames — data only at __compact_old
    val a = mkLeaf("v=1")
    fs.rename(new org.apache.hadoop.fs.Path(a),
      new org.apache.hadoop.fs.Path(a + "__compact_old"))
    Files.createDirectories(Paths.get(a + "__compact_tmp"))
    assert(Maintenance.recoverSwapDebris(spark, a), "debris must be detected")
    assert(rows(a) == (0L until 5L).toSet, "original content restored at path")
    assert(!Files.exists(Paths.get(a + "__compact_old")))
    assert(!Files.exists(Paths.get(a + "__compact_tmp")))

    // state B: swap completed, cleanup crashed — path + old both present
    val b = mkLeaf("v=2")
    Files.createDirectories(Paths.get(b + "__compact_old"))
    assert(Maintenance.recoverSwapDebris(spark, b))
    assert(rows(b) == (0L until 5L).toSet)
    assert(!Files.exists(Paths.get(b + "__compact_old")))

    // state C: crash before the swap — path + tmp
    val c = mkLeaf("v=3")
    Files.createDirectories(Paths.get(c + "__compact_tmp"))
    assert(Maintenance.recoverSwapDebris(spark, c))
    assert(rows(c) == (0L until 5L).toSet)
    assert(!Files.exists(Paths.get(c + "__compact_tmp")))

    // clean leaf: nothing to do
    assert(!Maintenance.recoverSwapDebris(spark, c))

    // parent sweep finds and recovers a debris leaf among clean ones
    val d = mkLeaf("v=4")
    fs.rename(new org.apache.hadoop.fs.Path(d),
      new org.apache.hadoop.fs.Path(d + "__compact_old"))
    val recovered = Maintenance.recoverAllSwapDebris(spark, root)
    assert(recovered == Seq(d), s"sweep must recover exactly the debris leaf: $recovered")
    assert(rows(d) == (0L until 5L).toSet)
  }
}
