package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The native as-of operator: correctness against hand-built fixtures and
  * the window formulation, plus the plan properties it exists for. */
class AsOfJoinSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def fixture = {
    import spark.implicits._
    // trades (key, t) / quotes (qkey, qt, px)
    val trades = Seq(
      (1L, 100L), (1L, 205L), (1L, 300L),
      (2L, 50L),             // before any quote for key 2
      (3L, 10L)              // key with no quotes at all
    ).toDF("k", "t")
    val quotes = Seq(
      (1L, 100L, "a"),       // equal timestamp: inclusive match
      (1L, 200L, "b"), (1L, 250L, "c"),
      (2L, 60L, "x")
    ).toDF("qk", "qt", "px")
    (trades, quotes)
  }

  test("backward as-of picks the latest at-or-before quote, nulls when none") {
    val (trades, quotes) = fixture
    val out = AsOf.backward(trades, quotes, "k", "t", "qk", "qt")
      .orderBy("k", "t").collect().toSeq
    assert(out == Seq(
      Row(1L, 100L, 1L, 100L, "a"),   // inclusive >= bound
      Row(1L, 205L, 1L, 200L, "b"),   // latest of {100, 200}
      Row(1L, 300L, 1L, 250L, "c"),
      Row(2L, 50L, null, null, null), // quote exists but only later
      Row(3L, 10L, null, null, null)  // key never quoted
    ))
  }

  test("inner as-of drops unmatched and null-key/time lefts") {
    val (trades, quotes) = fixture
    val out = AsOf.backward(trades, quotes, "k", "t", "qk", "qt", inner = true)
      .orderBy("k", "t").collect().toSeq
    assert(out == Seq(
      Row(1L, 100L, 1L, 100L, "a"),
      Row(1L, 205L, 1L, 200L, "b"),
      Row(1L, 300L, 1L, 250L, "c")
      // key 2 (quote only later) and key 3 (never quoted) are gone
    ))
    // inner + tolerance: a match older than the bound is dropped, not nulled
    val tight = AsOf.backward(trades, quotes, "k", "t", "qk", "qt",
      toleranceMicros = Some(5L), inner = true)
      .orderBy("k", "t").collect().toSeq
    assert(tight == Seq(Row(1L, 100L, 1L, 100L, "a"), Row(1L, 205L, 1L, 200L, "b")))
  }

  test("composite keys: both key columns must match (RowOrdering over multi-col keys)") {
    import spark.implicits._
    val l = Seq((1L, "x", 100L), (1L, "y", 100L), (2L, "x", 100L))
      .toDF("k1", "k2", "t")
    val r = Seq((1L, "x", 90L, "only-1x"), (2L, "y", 80L, "only-2y"))
      .toDF("rk1", "rk2", "rt", "v")
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val out = org.apache.spark.sql.GraftBridge.ofRows(spark, AsOfJoin(
      lp, rp,
      Seq(attr(lp, "k1"), attr(lp, "k2")), Seq(attr(rp, "rk1"), attr(rp, "rk2")),
      attr(lp, "t"), attr(rp, "rt")))
      .orderBy("k1", "k2").collect().toSeq
    assert(out == Seq(
      Row(1L, "x", 100L, 1L, "x", 90L, "only-1x"),   // both key cols equal
      Row(1L, "y", 100L, null, null, null, null),     // k2 differs → no match
      Row(2L, "x", 100L, null, null, null, null)      // k1 pairs exist only for k2=y
    ))
  }

  test("null keys and null times never match") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L)), (None, Some(100L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(50L), "m"), (None.asInstanceOf[Option[Long]], Some(10L), "n"))
      .toDF("qk", "qt", "px")
    val out = AsOf.backward(l, r, "k", "t", "qk", "qt")
      .orderBy(col("k").asc_nulls_first, col("t").asc_nulls_first).collect().toSeq
    assert(out == Seq(
      Row(null, 100L, null, null, null),
      Row(1L, null, null, null, null),
      Row(1L, 100L, 1L, 50L, "m")))
  }

  test("self-as-of (both sides from one scan) resolves without ambiguity") {
    val (trades, _) = fixture
    val l = trades
    val r = trades.select(col("k").as("qk"), col("t").as("qt"))
    // every row matches itself (inclusive bound)
    val out = AsOf.backward(l, r, "k", "t", "qk", "qt")
      .filter(col("t") === col("qt")).count()
    assert(out == 5)
  }

  test("plans as AsOfJoinExec — no window, no cartesian, both sides sorted once") {
    val (trades, quotes) = fixture
    val p = AsOf.backward(trades, quotes, "k", "t", "qk", "qt")
      .queryExecution.executedPlan.toString()
    assert(p.contains("AsOfJoin ["), p.take(500)) // nodeName strips the Exec suffix
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("strategy is injected by Session.tune extensions (no experimental fallback needed)") {
    assert(spark.sessionState.planner.strategies.exists(_ eq AsOfJoinStrategy) ||
      spark.sessionState.experimentalMethods.extraStrategies.exists(_ eq AsOfJoinStrategy))
  }

  test("all graft kernels are callable from plain SQL text via the extension") {
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |  char_ngrams('abcd', 2) AS grams,
        |  size(minhash_sig(array('a','b'), 8)) AS mk,
        |  simhash_sig(array('a','b')) AS sh,
        |  fingerprint_sig(array('a','b')) AS fp""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[String](1) == Seq("ab", "bc", "cd"))
    assert(r.getInt(2) == 8)
    assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L)
  }

  test("matches the window formulation on real events data") {
    val viaWindow = graft.ops.Temporal.asofJoin.fn(spark, sf).collect().toSeq
    val viaNative = graft.ops.Temporal.asofNative.fn(spark, sf).collect().toSeq
    assert(viaNative == viaWindow)
  }

  test("tolerance bounds the match age (backward) and lead (forward)") {
    val (trades, quotes) = fixture
    // backward with tolerance 10: only matches within 10 time units
    val back = AsOf.backward(trades, quotes, "k", "t", "qk", "qt", Some(10L))
      .orderBy("k", "t").collect().toSeq
    assert(back == Seq(
      Row(1L, 100L, 1L, 100L, "a"),    // gap 0 ≤ 10
      Row(1L, 205L, 1L, 200L, "b"),    // gap 5 ≤ 10
      Row(1L, 300L, null, null, null), // latest is 250: gap 50 > 10
      Row(2L, 50L, null, null, null),
      Row(3L, 10L, null, null, null)))
    // forward with tolerance 5: quote at 60 is 10 ahead of trade at 50 → null
    val fwd = AsOf.forward(trades, quotes, "k", "t", "qk", "qt", Some(5L))
      .filter("k = 2").collect().toSeq
    assert(fwd == Seq(Row(2L, 50L, null, null, null)))
    // tolerance demands long-backed time columns
    import spark.implicits._
    val bad = Seq((1L, 1.5)).toDF("k2", "t2")
    intercept[IllegalArgumentException] {
      AsOf.backward(bad, bad.select(col("k2").as("k3"), col("t2").as("t3")),
        "k2", "t2", "k3", "t3", Some(1L))
    }
  }

  test("forward as-of picks the earliest at-or-after quote") {
    val (trades, quotes) = fixture
    val out = AsOf.forward(trades, quotes, "k", "t", "qk", "qt")
      .orderBy("k", "t").collect().toSeq
    assert(out == Seq(
      Row(1L, 100L, 1L, 100L, "a"),   // inclusive >= bound
      Row(1L, 205L, 1L, 250L, "c"),   // earliest of {250}
      Row(1L, 300L, null, null, null),
      Row(2L, 50L, 2L, 60L, "x"),
      Row(3L, 10L, null, null, null)))
  }

  test("output survives a downstream shuffle (rows are Unsafe)") {
    val (trades, quotes) = fixture
    val n = AsOf.backward(trades, quotes, "k", "t", "qk", "qt")
      .groupBy("px").count().collect().length
    assert(n == 4) // a, b, c, null
  }
}
