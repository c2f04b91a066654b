package graft.ops

import graft.SparkSuite

/** H6 enforcement under physical-layout change: every declared query must
  * return IDENTICAL rows in IDENTICAL order when the shuffle partition
  * count changes. This is the property that makes results stable across
  * cluster sizes — a query that passes the oracle at one layout but
  * reorders under another would silently flap on a real cluster (and on
  * the driver's gate, whose session config we don't control). Catches
  * accidental order-dependence: missing sort keys, float-sum order leaks,
  * nondeterministic row picks. */
class DeterminismSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("every declared query is layout-invariant (3 vs 16 shuffle partitions)") {
    val conf = spark.conf
    val original = conf.get("spark.sql.shuffle.partitions")
    def runAll(parts: String): Map[String, Seq[String]] = {
      conf.set("spark.sql.shuffle.partitions", parts)
      graft.SparkEntry.queries.map { case (name, fn) =>
        // canonical row text; NaN-safe via toString; binary columns by
        // CONTENT (Array[Byte].toString is the object reference, which
        // would flag every sketch-emitting query as layout-dependent)
        name -> fn(spark, sf).collect().toSeq.map { r =>
          (0 until r.length).map { i =>
            r.get(i) match {
              case b: Array[Byte] => java.util.Arrays.toString(b)
              case v              => String.valueOf(v)
            }
          }.mkString("|")
        }
      }
    }
    try {
      val a = runAll("3")
      val b = runAll("16")
      val diffs = a.keys.filter(k => a(k) != b(k))
      assert(diffs.isEmpty, s"layout-dependent queries: ${diffs.mkString(", ")}")
    } finally conf.set("spark.sql.shuffle.partitions", original)
  }
}
