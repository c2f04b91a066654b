package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance utilities — the operational half of running the
  * engine's sinks for months: streaming captures (CdcPipeline writes one
  * directory per micro-batch) accrete small files, and diff-mode state
  * accretes versions. At 100 TB scan efficiency dies by per-file open
  * overhead and undersized row groups long before raw bytes matter, so
  * compaction is part of the engine, not an afterthought.
  */
object Maintenance {

  /** Crash recovery for [[rewriteSwap]]'s two-rename window: a crash (or
    * a streaming-query stop interrupting the maintenance hook) between
    * `rename(path → old)` and `rename(tmp → path)` leaves the data
    * intact but NOT AT ITS PATH — the original survives at
    * `<dir>__compact_old`. Every swap site calls this first, and state
    * READERS may call it before listing versions, so a replayed batch
    * sees the restored dir rather than silently reading an older
    * version. Rules (each debris state maps to exactly one):
    *  - path missing, old present  → the swap was interrupted mid-window:
    *    restore the original (rename old → path), drop any tmp;
    *  - path present, old present  → the swap completed but the cleanup
    *    crashed: drop old;
    *  - path present, tmp present  → the crash predates the swap: drop tmp.
    * Returns true when any debris was found and handled. */
  def recoverSwapDebris(spark: SparkSession, dir: String): Boolean = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compact_tmp")
    val old = new Path(dir + "__compact_old")
    val (hasPath, hasOld, hasTmp) = (fs.exists(path), fs.exists(old), fs.exists(tmp))
    if (!hasPath && hasOld) {
      require(fs.rename(old, path), s"debris recovery: rename $old -> $path failed")
      if (hasTmp) fs.delete(tmp, true)
      true
    } else if (hasPath && hasOld) {
      fs.delete(old, true); if (hasTmp) fs.delete(tmp, true); true
    } else if (hasPath && hasTmp) {
      fs.delete(tmp, true); true
    } else false
  }

  /** Sweep a PARENT dir (e.g. a diff-state root of `v=N` leaves) for
    * interrupted-swap debris and recover each affected leaf — called by
    * the CDC tick BEFORE it reads state, so a crash mid-compact can
    * never make a replayed diff silently read an older version. Returns
    * the recovered leaf paths.
    *
    * Per-leaf failures do NOT abort the sweep: one stuck leaf (a failed
    * restore rename — permissions, a concurrent writer) must not block
    * recovery of every later leaf before state is read. Failures are
    * collected and rethrown AFTER the sweep, naming every stuck leaf, so
    * the tick still refuses to run against unrecovered state but the
    * operator sees the full damage report and the recoverable leaves are
    * already recovered. */
  def recoverAllSwapDebris(spark: SparkSession, parentDir: String): Seq[String] = {
    val p = new Path(parentDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val suffix = "(__compact_old|__compact_tmp)$".r
    val leaves = fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap(n => suffix.findFirstIn(n).map(sfx => n.stripSuffix(sfx)))
      .distinct
    val attempts = leaves.map { base =>
      val leaf = s"$parentDir/$base"
      leaf -> scala.util.Try(recoverSwapDebris(spark, leaf))
    }
    val failed = attempts.collect { case (leaf, scala.util.Failure(e)) =>
      s"$leaf (${e.getMessage})" }
    if (failed.nonEmpty) throw new IllegalStateException(
      s"swap-debris recovery failed for ${failed.size} leaf(s): " +
        failed.mkString("; "))
    attempts.collect { case (leaf, scala.util.Success(true)) => leaf }
  }

  /** Shared rewrite-and-swap: reshape a LEAF parquet dir through `build`
    * into a sibling tmp dir, then swap via two renames (the window where
    * neither dir exists is the same one every non-transactional rewriter
    * has; a crashed swap leaves the data intact at a debris path —
    * [[recoverSwapDebris]], called here first, restores it). Returns
    * (filesBefore, filesAfter). */
  private def rewriteSwap(spark: SparkSession, dir: String)(
      build: (org.apache.spark.sql.DataFrame, Long) => org.apache.spark.sql.DataFrame)
      : (Int, Int) = {
    recoverSwapDebris(spark, dir)
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(path).toSeq
      .filterNot(_.getPath.getName.startsWith("_"))
    // LEAF directories only: a dir of partition subdirs (batch=N, v=N,
    // day=X) would read the subdir name as a partition column and flatten
    // the structure into one file — e.g. compacting a diff-state root
    // would silently destroy every version and the next tick would
    // re-bootstrap. Refuse instead of corrupting.
    val subDirs = entries.filter(_.isDirectory)
    require(subDirs.isEmpty,
      s"rewrite packs leaf directories; $dir contains subdirectories " +
        s"(${subDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "rewrite each leaf instead")
    val dataFiles = entries.filter(_.isFile)
    val totalBytes = dataFiles.map(_.getLen).sum
    val tmp = new Path(dir + "__compact_tmp")
    val old = new Path(dir + "__compact_old")
    build(spark.read.parquet(dir), totalBytes)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(path, old), s"rename $path -> $old failed")
    require(fs.rename(tmp, path), s"rename $tmp -> $path failed")
    fs.delete(old, true)
    val after = fs.listStatus(path).toSeq
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    (dataFiles.size, after)
  }

  /** Bin-pack a parquet directory toward `targetBytes` per file.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    rewriteSwap(spark, dir) { (df, totalBytes) =>
      df.repartition(
        math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt))
    }

  /** Z-order mode of [[compact]]: digest-identical rewrite of a leaf
    * parquet dir, clustered on the z-interleave of two integer
    * expressions (e.g. `"user_id"`, `"unix_micros(ts) div 3600000000"`)
    * so file-level min/max stats stay TIGHT in BOTH dimensions and a
    * point/range predicate on either column skips most files — the
    * write-side application of the q_zorder_layout planning query
    * (which predicts exactly this effect; MaintenanceSpec measures it on
    * the rewritten files). Range-partitioned on z, then sorted by z
    * within each file, so each output file owns one contiguous z band.
    * `nFiles <= 0` (the default) sizes the output from the data like
    * [[compact]] — a small dir must not shatter into tiny files just to
    * be clustered; pass an explicit count to control band granularity.
    * Returns (filesBefore, filesAfter). */
  def compactZOrder(spark: SparkSession, dir: String,
      xExpr: String, yExpr: String, nFiles: Int = 0,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    rewriteSwap(spark, dir) { (df, totalBytes) =>
      import org.apache.spark.sql.functions.col
      val n =
        if (nFiles > 0) nFiles
        else math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      graft.ops.Layout.withZ(df, xExpr, yExpr)
        .repartitionByRange(n, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    }

  /** Drop all but the newest `keep` versioned subdirectories
    * (`<prefix><n>`) of `dir` — retention for CdcPipeline's diff-mode
    * state (state/v=N accretes one version per changed batch; only the
    * latest is read, older ones exist for crash re-runs). Returns the
    * deleted version numbers. */
  def pruneVersions(spark: SparkSession, dir: String, keep: Int,
      prefix: String = "v="): Seq[Long] = {
    require(keep >= 1, "keep must be >= 1")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    // numeric-suffix match only: a foreign dir like `v=backup` must be
    // ignored, not crash the prune with NumberFormatException
    val versionRe = (java.util.regex.Pattern.quote(prefix) + "(\\d+)").r
    val versions = fs.listStatus(path).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case versionRe(n) => n.toLong }
      .sorted
    val doomed = versions.dropRight(keep)
    doomed.foreach(v => fs.delete(new Path(path, s"$prefix$v"), true))
    doomed
  }

  /** Drop consistent-tick listing pins (`epoch-N` files in the
    * `<checkpoint>-listing` dir CdcPipeline.startConsistent maintains)
    * for epochs below `keepFrom`. A pin is only needed while its epoch
    * can still be replayed — Structured Streaming replays at most the
    * batches at or after the last commit, so the safe floor is the
    * checkpoint's last committed batch id (pass anything ≤ that).
    * Returns the pruned epoch numbers. */
  def prunePins(spark: SparkSession, listingDir: String, keepFrom: Long): Seq[Long] = {
    val path = new Path(listingDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    // numeric-suffix match only: a foreign file like `epoch-backup` in the
    // listing dir must be skipped, not abort the prune
    val pinRe = "epoch-(\\d+)".r
    val tmpRe = "\\.epoch-(\\d+)\\.tmp".r
    val names = fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath.getName)
    val doomed = names
      .collect { case pinRe(n) => n.toLong }
      .filter(_ < keepFrom).sorted
    doomed.foreach(e => fs.delete(new Path(path, s"epoch-$e"), false))
    // orphaned write-then-rename debris (crash between create and rename)
    names.collect { case n @ tmpRe(e) => e.toLong -> n }
      .collect { case (e, n) if e < keepFrom => fs.delete(new Path(path, n), false) }
    doomed
  }
}
