package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite
import graft.streaming.CdcPipeline

/** Properties the reference's change detector relies on (SUM-combined row
  * digests, duckdb_cdc.go:175-183): order invariance and change
  * sensitivity — plus the B1 collision fix (NULL vs empty, embedded
  * separators). ScalaCheck generators are sampled with fixed seeds (the
  * scalatestplus property-check bridge is not on the offline classpath). */
class ChecksumSpec extends SparkSuite {
  import spark.implicits._

  private val rowsGen = Gen.nonEmptyListOf(
    for {
      id <- Gen.choose(0, 1000)
      name <- Gen.alphaNumStr.map(_.take(8))
      bal <- Gen.choose(-99999L, 99999L).map(_ / 100.0)
    } yield (id, name, bal))

  private def samples(n: Int): Seq[List[(Int, String, Double)]] =
    (1 to n).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("checksum is invariant under row order (SUM combination)") {
    samples(5).foreach { rows =>
      val a = rows.toDF("id", "name", "bal")
      val b = new scala.util.Random(42).shuffle(rows).toDF("id", "name", "bal")
      assert(CdcPipeline.batchChecksum(a) == CdcPipeline.batchChecksum(b))
    }
  }

  test("checksum changes when any row's value changes") {
    samples(5).foreach { rows =>
      val a = rows.toDF("id", "name", "bal")
      val mutated = rows.updated(0,
        rows.head.copy(_3 = rows.head._3 + 0.01)).toDF("id", "name", "bal")
      assert(CdcPipeline.batchChecksum(a) != CdcPipeline.batchChecksum(mutated))
    }
  }

  test("B1 fix: NULL, empty string, and embedded separators do not collide") {
    val withNull = Seq((1, null.asInstanceOf[String]), (2, "x")).toDF("id", "s")
    val withEmpty = Seq((1, ""), (2, "x")).toDF("id", "s")
    assert(CdcPipeline.batchChecksum(withNull) != CdcPipeline.batchChecksum(withEmpty))
    // ('a,b','') vs ('a','b') — the reference's comma-join collision
    val ab = Seq(("a,b", "")).toDF("x", "y")
    val a_b = Seq(("a", "b")).toDF("x", "y")
    assert(CdcPipeline.batchChecksum(ab) != CdcPipeline.batchChecksum(a_b))
  }

  test("count is part of the digest (empty vs non-empty differ)") {
    val empty = Seq.empty[(Int, String)].toDF("id", "s")
    val one = Seq((1, "x")).toDF("id", "s")
    assert(CdcPipeline.batchChecksum(empty) != CdcPipeline.batchChecksum(one))
  }

  test("double canonicalization is lossless: sub-0.01 deltas are detected") {
    val a = Seq((1, 1.0000001), (2, 2.5)).toDF("id", "v")
    val b = Seq((1, 1.0000002), (2, 2.5)).toDF("id", "v")
    assert(CdcPipeline.batchChecksum(a) != CdcPipeline.batchChecksum(b))
  }

  test("doubles beyond DECIMAL(18,2) range digest without error") {
    // 1e17 overflows CAST(x AS DECIMAL(18,2)) — ANSI error in the grid
    // form; the exact form must handle it (and NaN/Infinity) cleanly.
    val big = Seq((1, 1.0e17), (2, Double.NaN),
      (3, Double.PositiveInfinity)).toDF("id", "v")
    val big2 = Seq((1, 1.0e17 + 32.0), (2, Double.NaN),
      (3, Double.PositiveInfinity)).toDF("id", "v")
    assert(CdcPipeline.batchChecksum(big) != CdcPipeline.batchChecksum(big2))
  }
}
