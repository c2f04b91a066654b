package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins.
  *
  * AQE's skew-join split (on by default in Session.tune) handles most
  * cases at runtime; explicit salting is the deterministic fallback when
  * a single hot key overwhelms even split partitions — e.g. a null-ish
  * default user_id owning 10% of a 100 TB events table.
  *
  * Mechanics: the skewed (big) side gets a salt in [0, n) derived from a
  * hash of the whole row — deterministic, no rand() — widening the hot
  * key into n shuffle partitions; the small side is replicated n times so
  * every (key, salt) pair still meets its match. Join output is
  * row-identical to the unsalted join; only the shuffle layout changes.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `n` ways on the big side. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(n)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
