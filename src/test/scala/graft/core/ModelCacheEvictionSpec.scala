package graft.core

import graft.SparkSuite

/** Isolated in its OWN suite because the eviction case stops the shared
  * SparkContext: any test running after it in the same suite would hold
  * the dead session through the suite's initialized lazy `spark`. Later
  * SUITES are safe — SparkSuite.session transparently rebuilds a stopped
  * context, and suites execute sequentially (Test / fork := true). Do
  * not add further tests below the eviction case. */
class ModelCacheEvictionSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("live sessions are isolated; stopped sessions are evicted") {
    ModelCache.clear()
    val a = spark
    val b = a.newSession()
    val pa = graft.ops.Similarity.trainedParts(a, sf)
    val pb = graft.ops.Similarity.trainedParts(b, sf)
    // Isolation: a session never serves another session's model (a
    // localCheckpointed DataFrame is only valid through the session that
    // built it), even when the corpus state is identical.
    assert(!pa.eq(pb), "distinct live sessions must hold distinct entries")
    assert(ModelCache.liveSessionCount == 2)
    // Hit-identity still holds per session after the isolation.
    assert(graft.ops.Similarity.trainedParts(a, sf).eq(pa))
    assert(graft.ops.Similarity.trainedParts(b, sf).eq(pb))
    // Stopping the context is the only death a session can have (clones
    // share their parent's context — Spark has no finer liveness signal,
    // and localCheckpoint blocks die with the context's executors). Both
    // entries must be swept, observably: no WeakHashMap wishful thinking.
    a.stop()
    assert(ModelCache.liveSessionCount == 0,
      "stopped sessions must be evicted, not retained via cached DataFrames")
    // A fresh session trains fresh and is tracked again.
    val c = SparkSuite.session
    val pc = graft.ops.Similarity.trainedParts(c, sf)
    assert(!pc.eq(pa) && !pc.eq(pb))
    assert(ModelCache.liveSessionCount == 1)
  }
}
