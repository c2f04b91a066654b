package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL rank / ntile over a total order with no window whose
  * partition grows with the data.
  *
  * `row_number()/ntile() OVER (ORDER BY …)` moves every row through ONE
  * window task — the same single-partition funnel PrefixCarry retires
  * for prefix aggregates, here for total-order ranking (q_rfm's quartile
  * assignment was the last such site in the tree). The scalable shape is
  * the classic distributed rank: range-repartition on the sort key
  * (Spark's range exchange — a distributed sort), rank WITHIN each
  * partition, then add each partition's prefix row-count offset. The
  * offsets are one bounded control read (P = shuffle-partition rows),
  * the established pattern for O(partitions) state.
  *
  * The sort key must be a TOTAL order (append a unique tiebreak column —
  * the H6 rule every total-order operator already follows): range
  * boundaries can split equal keys across partitions, so only a
  * tie-free key makes rank reproducible.
  */
object GlobalRank {

  /** `df` plus `out` = exact 1-based global rank by `keys`. Internally
    * localCheckpoints the range-partitioned frame: the offset census and
    * the ranked output must see the SAME sampled range boundaries (the
    * range exchange samples its bounds; two recomputations could split
    * rows differently). */
  def withRank(df: DataFrame, out: String, keys: Column*): DataFrame =
    rankedWithTotal(df, out, keys: _*)._1

  /** (ranked frame, total row count) — the count rides the offset census
    * for free, so ntile never pays a second job. */
  private def rankedWithTotal(df: DataFrame, out: String, keys: Column*)
      : (DataFrame, Long) = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(p, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = (pid, acc); acc += n; o
    }
    val s = df.sparkSession
    import s.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
    val out0 = parted.join(broadcast(offDf), "__pid")
      .withColumn(out, col("__off") + row_number().over(w))
      .drop("__pid", "__off")
    (out0, acc)
  }

  /** Closed-form SQL ntile from (1-based global rank, total count) —
    * bucket sizes differ by at most one, larger buckets first, identical
    * to Spark's and DuckDB's window ntile (GlobalRankSpec sweeps n × k). */
  private def tileExpr(rankCol: String, n: Long, k: Int): Column = {
    val small = n / k
    val m = n % k
    if (n == 0L) lit(null).cast("int")
    else if (small == 0L) col(rankCol) // n < k: one row per leading bucket
    else {
      val bigSpan = m * (small + 1)
      when(col(rankCol) <= bigSpan,
        expr(s"(`$rankCol` - 1) div ${small + 1} + 1"))
        .otherwise(expr(s"$m + (`$rankCol` - 1 - $bigSpan) div $small + 1"))
    }
  }

  /** `df` plus `out` = exact `ntile(k)` over the total order `keys`. */
  def withNtile(df: DataFrame, out: String, k: Int, keys: Column*): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    val rankCol = s"__rank_$out"
    val (ranked, n) = rankedWithTotal(df, rankCol, keys: _*)
    ranked.withColumn(out, tileExpr(rankCol, n, k).cast("int")).drop(rankCol)
  }

  /** BATCHED multi-key ntile — `df` plus one exact `ntile(k)` column per
    * spec `(out, k, keys)`, each over its own total order, in ONE range
    * exchange + ONE offset-census action + ONE pivot aggregate,
    * regardless of how many keys are ranked. q_rfm's three sequential
    * `withNtile` calls paid the per-key fixed cost 3× (3 eager
    * checkpoints + 3 synchronous control reads + 3 range-sampling jobs
    * for a 10k-row census: 0.56 → 2.19 s at sf0.1, round-14 verdict #2).
    *
    * The offset census is a DRIVER COLLECT of P rows (one per shuffle
    * partition) — the established O(partitions) control-read pattern —
    * kept deliberately over the zero-round-trip alternative: an in-plan
    * variant (offsets via a bounded window over the pid census,
    * broadcast-joined back) was built and A/B'd at r15 — same-window
    * solo benches read collect 1.25/1.26 s vs in-plan 1.44/1.45 s at
    * sf0.1; the computed-broadcast leg costs more in scheduling than
    * the 32-row driver round-trip it removes, and at cluster scale a
    * P-row collect stays O(partitions), never O(data).
    *
    * Shape: the input is exploded TALL — one copy per spec, tagged with
    * the spec index, payload columns carried only on tag 0 — and every
    * spec's sort key is normalized into shared (long, double) slot
    * pairs: an integral key fills the long slot (double slot constant
    * 0), a floating key the double slot (long slot constant 0), so
    * lexicographic order on (tag, slots…) restricted to one tag IS that
    * spec's key order, exactly. One `repartitionByRange` over the tall
    * frame (lazily checkpointed — census and rank reads must see the
    * same sampled bounds; checkpoint materialization truncates lineage
    * for both), one per-partition count census, and the global rank is
    * partition offset + intra-partition row_number. Every tag holds
    * exactly n = |df| rows, so spec i's rank = global rank − i·n — no
    * per-spec census needed. Tiles come from the closed-form
    * (rank, n, k) ntile; one groupBy(joinKeys) max(when) pivot
    * reassembles the row, so there is no join at all.
    *
    * Constraints: `joinKeys` must uniquely identify rows of `df`; every
    * spec key must be a NULL-free integral or floating column (the slot
    * normalization is exact for both; decimals would silently lose
    * order under a double cast, so they are rejected — pre-cast); and
    * each spec's key sequence must be a TOTAL order over `df`'s rows —
    * append a unique tiebreak column (the H6 rule, same as the
    * object-level doc): tied (tag, slots) rows would get
    * nondeterministic global ranks and thus tiles that can diverge from
    * the window-ntile oracle between runs. */
  def withNtiles(df: DataFrame, joinKeys: Seq[String],
                 specs: Seq[(String, Int, Seq[Column])]): DataFrame = {
    require(specs.nonEmpty, "withNtiles needs at least one (out, k, keys) spec")
    require(specs.forall(_._2 > 0), "ntile bucket count must be positive")
    val s = df.sparkSession
    import s.implicits._
    import org.apache.spark.sql.types._
    val p = s.conf.get("spark.sql.shuffle.partitions").toInt
    val payload = df.columns.filterNot(joinKeys.contains).toSeq
    val arity = specs.map(_._3.size).max
    // resolve key datatypes once, against a slim projection
    val keyTypes: Seq[Seq[DataType]] = specs.map { case (_, _, keys) =>
      df.select(keys: _*).schema.fields.map(_.dataType).toSeq
    }
    def isIntegral(t: DataType) = t match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
    def isFloating(t: DataType) = t match {
      case _: FloatType | _: DoubleType => true
      case _ => false
    }
    keyTypes.zip(specs).foreach { case (ts, (out, _, _)) =>
      ts.foreach(t => require(isIntegral(t) || isFloating(t),
        s"withNtiles spec '$out' has a ${t.simpleString} key — only " +
          "integral/floating keys rank exactly under slot normalization; " +
          "pre-cast (a decimal→double cast would silently reorder)"))
    }
    // tall: one struct per spec — (tag, slot pairs, payload-on-tag-0)
    val copies = specs.zipWithIndex.map { case ((_, _, keys), i) =>
      val slots = (0 until arity).flatMap { j =>
        val (l, d) =
          if (j >= keys.size) (lit(0L), lit(0.0))
          else if (isIntegral(keyTypes(i)(j))) (keys(j).cast(LongType), lit(0.0))
          else (lit(0L), keys(j).cast(DoubleType))
        Seq(l.as(s"__l$j"), d.as(s"__d$j"))
      }
      val pay = payload.map(c =>
        (if (i == 0) col(c) else lit(null).cast(df.schema(c).dataType)).as(c))
      struct(Seq(lit(i).as("__tag")) ++ slots ++ pay: _*)
    }
    val sortCols = col("__tag") +:
      (0 until arity).flatMap(j => Seq(col(s"__l$j"), col(s"__d$j")))
    val parted = df
      .select(joinKeys.map(col) :+ explode(array(copies: _*)).as("__c"): _*)
      .select(joinKeys.map(col) :+ col("__c.*"): _*)
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    // ONE action: per-partition counts → prefix offsets (P rows) + n
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    val n = acc / specs.size
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val ranked = parted.join(broadcast(offDf), "__pid")
      .withColumn("__rank",
        col("__off") + row_number().over(w) - col("__tag") * n)
    val aggs = payload.map(c => max(col(c)).as(c)) ++
      specs.zipWithIndex.map { case ((out, k, _), i) =>
        max(when(col("__tag") === i, tileExpr("__rank", n, k).cast("int")))
          .as(out)
      }
    ranked.groupBy(joinKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
