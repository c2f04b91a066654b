package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Salting must be a pure shuffle-layout change: the salted join's result
  * is row-identical to the plain join, and the hot key's rows really do
  * spread across multiple salt values. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of rows share user_id 7
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("user_id", "payload")
    val small = Seq((7L, "hot"), (10L, "cold"), (20L, "cold"))
      .toDF("user_id", "tag")
    val plain = big.join(small, Seq("user_id"))
    val salted = Skew.saltedEquiJoin(big, small, "user_id", n = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("the hot key actually fans out across salts") {
    val big = (1 to 1000).map(i => (7L, i)).toDF("user_id", "payload")
    val saltDistinct = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(saltDistinct == 8)
  }

  test("saltFactor: only a dominant-key imbalance salts; hash-collision imbalance stays 1") {
    // balanced: heaviest partition ≈ ideal (31250 ppm at 32 partitions)
    assert(Skew.saltFactor(top1Ppm = 8600, maxpartPpm = 36900) == 1)
    // heavy partition but NO dominant key (collision pile-up): AQE's
    // skew split handles it; salting would tax every balanced key
    assert(Skew.saltFactor(top1Ppm = 10000, maxpartPpm = 200000) == 1)
    // one key owns half the table: spread it over ceil(top1/ideal)
    assert(Skew.saltFactor(top1Ppm = 500000, maxpartPpm = 510000) == 16)
    // the factor is capped
    assert(Skew.saltFactor(top1Ppm = 1000000, maxpartPpm = 1000000) == 32)
  }

  test("census decision on the real corpus: balanced user_id → 1, coarse event_type → > 1") {
    // sf0.01: 150 users, top1_ppm ≈ 8600 — balanced. (At sf0.001 there
    // are only ~15 users, the top one owns ~3 ideal loads, and the
    // decision correctly flips to salt — the decision is data-driven.)
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
    assert(Skew.saltFactorFor(ev, "user_id") == 1,
      "user_id is balanced at sf0.01 — the plan must stay untouched")
    val coarse = Skew.saltFactorFor(ev, "event_type")
    assert(coarse > 1, s"a 5-value key must trip the salt decision: $coarse")
    assert(Skew.saltFactorFor(
      graft.core.Tables.events(spark, "/root/testdata/sf0.001"), "user_id") > 1,
      "15 users at sf0.001 IS a hot-key distribution — must salt")
  }

  test("autoSaltedEquiJoin: n = 1 leaves the plain-join plan bit-identical; hot key salts") {
    val balanced = (1 to 2000).map(i => (i.toLong % 500, i)).toDF("user_id", "payload")
    val small = Seq((7L, "hot"), (10L, "cold"), (20L, "cold")).toDF("user_id", "tag")
    val auto = Skew.autoSaltedEquiJoin(balanced, small, "user_id")
    val plain = balanced.join(small, Seq("user_id"))
    assert(auto.queryExecution.optimizedPlan.toString ==
      plain.queryExecution.optimizedPlan.toString,
      "no-skew decision must not change the plan")
    // 90% of rows on key 7: the decision must salt, and stay row-identical
    val hot = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("user_id", "payload")
    val salted = Skew.autoSaltedEquiJoin(hot, small, "user_id")
    assert(salted.queryExecution.optimizedPlan.toString.contains("__salt"),
      "hot-key decision must take the salted path")
    val ref = hot.join(small, Seq("user_id"))
    assert(salted.count() == ref.count())
    assert(salted.except(ref).isEmpty && ref.except(salted).isEmpty)
  }
}
