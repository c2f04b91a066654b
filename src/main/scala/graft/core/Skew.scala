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

  /** Equi-join `big ⋈ small` on `key`, salted `n` ways on the big side.
    * `n == 1` degenerates to the plain join (one salt value carries
    * nothing), so callers can pass [[saltFactor]]'s decision directly. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    if (n == 1) return big.join(small, Seq(key))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(n)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The q_join_skew_diag census row → salt factor (the decision the
    * census exists to feed). Salting helps exactly when ONE key drives
    * the imbalance: `top1_ppm ≈ maxpart_ppm ≫ ideal` (= 10⁶/partitions).
    * A heavy partition WITHOUT a dominant key is hash-collision
    * imbalance — AQE's skew split or a wider shuffle fixes that, and
    * salting would only tax every balanced key with replication. So:
    * return 1 (leave the plan untouched) unless the heaviest partition
    * carries ≥ 2 ideal loads AND the top key owns at least half of it;
    * otherwise spread the hot key over ceil(top1_ppm / ideal) salt
    * values, capped at `maxSalt`. */
  def saltFactor(top1Ppm: Long, maxpartPpm: Long,
      partitions: Int = 32, maxSalt: Int = 32): Int = {
    require(partitions > 0 && maxSalt > 0, "positive partition/salt caps")
    val ideal = 1000000L / partitions
    if (maxpartPpm < 2 * ideal || 2 * top1Ppm < maxpartPpm) 1
    else math.min(maxSalt.toLong, math.max(1L, (top1Ppm + ideal - 1) / ideal)).toInt
  }

  /** One-pass census of `df.key` feeding [[saltFactor]]: the
    * q_join_skew_diag census narrowed to the single join key the caller
    * is about to shuffle on — the same partial-agg shuffle the join
    * itself pays, at one count column of width, collected as one row.
    * The partition model is xxhash64 mod `partitions` (a balanced hash
    * family member, type-agnostic — same family the salt itself uses). */
  def saltFactorFor(df: DataFrame, key: String,
      partitions: Int = 32, maxSalt: Int = 32): Int = {
    val kc = df.groupBy(col(key).as("__k")).agg(count(lit(1)).as("__n"))
      .localCheckpoint() // feeds both the totals and the partition model
    val tot = kc.agg(sum(col("__n")).as("rows"), max(col("__n")).as("maxn"))
    val part = kc
      .groupBy(pmod(xxhash64(col("__k")), lit(partitions)).as("__p"))
      .agg(sum(col("__n")).as("pn"))
      .agg(max(col("pn")).as("maxpart"))
    val r = tot.crossJoin(part).head() // 1×1 rows — a bounded control read
    if (r.isNullAt(0) || r.getLong(0) == 0L) 1
    else saltFactor(1000000L * r.getLong(1) / r.getLong(0),
      1000000L * r.getLong(2) / r.getLong(0), partitions, maxSalt)
  }

  /** [[saltedEquiJoin]] with the fan-out decided by the census: the
    * no-skew path costs one key census and keeps the plain join's plan
    * bit-identical (n = 1 adds no salt column, no replication). */
  def autoSaltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      partitions: Int = 32, maxSalt: Int = 32): DataFrame =
    saltedEquiJoin(big, small, key, saltFactorFor(big, key, partitions, maxSalt))
}
