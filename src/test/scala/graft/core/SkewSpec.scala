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
}
