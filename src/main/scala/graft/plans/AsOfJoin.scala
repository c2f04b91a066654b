package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, JoinedRow, GenericInternalRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.Ascending
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator custom-plan tier
  * (SURVEY.md §4.2 revision 2): logical node + planner strategy + physical
  * sort-merge exec, registered through SparkSessionExtensions.
  *
  * Semantics (matching DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`, the oracle for q_asof_join): every left row is paired with
  * the LATEST right row of the same key whose time is at-or-before the
  * left row's time, or nulls if none exists. Rows with a null key or null
  * time never match (SQL comparison semantics).
  *
  * Why a custom operator when the window formulation (Temporal.asofJoin)
  * exists: the window plan shuffles and sorts the UNION of both sides and
  * materializes a running `last(struct)` over every event; this exec
  * shuffles each side once on its own key, sorts within partitions, and
  * streams a two-pointer merge in O(|L|+|R|) per partition with O(1)
  * state — no unioned buffer, no window frame, and the right side's
  * payload never rides through a running aggregate. At 100 TB both sides
  * stay independently partitioned (the planner reuses existing hash
  * partitioning if a side is already clustered on the key), and AQE can
  * still split skewed partitions under the required distribution.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long] = None,
    inner: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin as its exec; injected via GraftExtensions
  * (Session.tune) and defensively via experimental.extraStrategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, inner) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Session-extension entry point: `.withExtensions(new GraftExtensions)`.
  * Injects the as-of planner strategy AND registers every graft kernel as
  * a session-level SQL function — plain `spark.sql` text can call
  * vec_dot / char_ngrams / minhash_sig / simhash_sig / fingerprint_sig
  * on any session built through graft.core.Session (also settable via
  * spark.sql.extensions=graft.plans.GraftExtensions on a stock build). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
  import graft.functions.{FingerprintSig, FloatVecDot, MinhashSig, SimhashSig, StringNgrams}

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // ASOF [LEFT] JOIN SQL syntax: token rewrite at parse time, lowered to
    // the AsOfJoin node at resolution (see plans/AsOfSql.scala).
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    e.injectResolutionRule(_ => ResolveAsOfJoin)
    e.injectFunction(fn(AsOfSql.MarkerFn,
      "internal ASOF JOIN condition marker (valid only in a join ON clause)") {
      exprs => AsOfSql.AsOfMarker(exprs.head)
    })
    e.injectFunction(fn("vec_dot", "dot product of two array<float> in double") {
      exprs => FloatVecDot(exprs(0), exprs(1))
    })
    e.injectFunction(fn("char_ngrams", "all n-length character substrings") {
      exprs => StringNgrams(exprs(0), litInt(exprs(1), "char_ngrams n"))
    })
    e.injectFunction(fn("minhash_sig", "K-wide minhash signature of array<string>") {
      exprs => MinhashSig(exprs(0), litInt(exprs(1), "minhash_sig k"))
    })
    e.injectFunction(fn("simhash_sig", "32-bit simhash of array<string>") {
      exprs => SimhashSig(exprs(0))
    })
    e.injectFunction(fn("fingerprint_sig", "position-weighted rolling digest of array<string>") {
      exprs => FingerprintSig(exprs(0))
    })
  }
}

/** Sort-merge as-of join. Requires both children clustered on their keys
  * (EnsureRequirements co-partitions the two hash partitionings exactly as
  * for a shuffled equi-join) and sorted by (keys, time) — so each child is
  * at most one exchange + one in-partition sort, and either is elided when
  * the input already satisfies it (e.g. bucketed/pre-sorted data).
  *
  * The merge keeps one candidate row of state: the latest right row at-or-
  * before the current left row for the current key. Because both streams
  * are (key, time)-sorted, the right pointer only moves forward — each
  * right row is visited once per partition. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    inner: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  /** The merge preserves the left child's row order. */
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val keyTypes = lk.map(_.dataType)
    val timeType = lt.dataType
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj  = UnsafeProjection.create(lk, lOut)
      val rKeyProj  = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd  = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // Downstream operators (exchanges in particular) expect UnsafeRow.
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val rBuf = rIter.buffered
      // Tolerance applies only to long-backed times (epoch micros /
      // TimestampType, both stored as long) — enforced at the API layer.
      val tol = toleranceMicros.getOrElse(Long.MaxValue)
      // Latest at-or-before right row for the key it was taken under.
      // Copied out of the iterator (sorter output reuses row buffers).
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      var lastMatchTime = 0L

      // Inner mode drops unmatched lefts (DuckDB's plain ASOF JOIN);
      // left mode emits them with a null right side (ASOF LEFT JOIN).
      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        if (lKey.anyNull || lTimeProj(lRow).isNullAt(0)) {
          if (inner) None else Some(resultProj(joined(lRow, nullRight)))
        } else {
          val lTime = lTimeProj(lRow)
          var scan = true
          while (scan && rBuf.hasNext) {
            val head = rBuf.head
            val hKey = rKeyProj(head)
            if (hKey.anyNull) { rBuf.next(); () }     // null keys never match
            else {
              val c = keyOrd.compare(hKey, lKey)
              if (c < 0) { rBuf.next(); () }          // key already passed
              else if (c > 0) scan = false            // future key: stop
              else {
                val hTime = rTimeProj(head)
                if (hTime.isNullAt(0)) { rBuf.next(); () }
                else if (timeOrd.compare(hTime, lTime) <= 0) {
                  lastMatchKey = hKey.copy()
                  lastMatchTime = hTime.getLong(0)
                  lastMatch = rBuf.next().copy()      // newest so far wins
                } else scan = false                   // beyond left time
              }
            }
          }
          val matched = lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0 &&
            (tol == Long.MaxValue || lTime.getLong(0) - lastMatchTime <= tol)
          if (matched) Some(resultProj(joined(lRow, lastMatch)))
          else if (inner) None
          else Some(resultProj(joined(lRow, nullRight)))
        }
      }
    }
  }
}

/** Public API for the native as-of join. */
object AsOf {
  /** Backward as-of join: for each `left` row, the latest `right` row with
    * equal key and `rightTimeCol <= leftTimeCol` (nulls if none). Column
    * names of the two sides must be disjoint (rename before joining, as
    * with any Spark join you intend to keep both sides of).
    * `toleranceMicros` bounds the match's age (pandas merge_asof
    * tolerance): a candidate older than leftTime - tolerance yields nulls
    * instead; requires long-backed time columns (epoch micros or
    * timestamp). */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTimeCol: String,
      rightKey: String, rightTimeCol: String,
      toleranceMicros: Option[Long] = None,
      inner: Boolean = false): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    val spark = left.sparkSession
    // Defensive registration for sessions not built via graft.core.Session.
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // Re-alias the right side so a self-as-of (both sides from one scan)
    // cannot carry duplicate expression ids into the node: a top-level
    // select-with-alias mints fresh ids for every column.
    val r = right.select(right.columns.map(c => right(c).as(c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val lt = attr(lPlan, leftTimeCol); val rt = attr(rPlan, rightTimeCol)
    toleranceMicros.foreach { t =>
      require(t >= 0, "tolerance must be non-negative")
      import org.apache.spark.sql.types.{LongType, TimestampType}
      Seq(lt, rt).foreach(a => require(
        a.dataType == LongType || a.dataType == TimestampType,
        s"tolerance requires long-backed time columns, ${a.name} is ${a.dataType}"))
    }
    GraftBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      lt, rt, toleranceMicros, inner))
  }

  /** Forward as-of join: for each `left` row, the EARLIEST `right` row
    * with equal key and `rightTimeCol >= leftTimeCol`. Implemented as the
    * backward merge over negated times (t_r >= t_l ⇔ -t_r <= -t_l, and
    * "latest in -t" = earliest in t), so it shares the exec and all its
    * guarantees. Time columns must be numeric (epoch micros — the house
    * convention, H5). */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTimeCol: String,
      rightKey: String, rightTimeCol: String,
      toleranceMicros: Option[Long] = None,
      inner: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val lNeg = "__graft_neg_lt"; val rNeg = "__graft_neg_rt"
    val l2 = left.withColumn(lNeg, -col(leftTimeCol))
    val r2 = right.withColumn(rNeg, -col(rightTimeCol))
    // negated-time gap (-t_l) - (-t_r) = t_r - t_l = the forward gap
    backward(l2, r2, leftKey, lNeg, rightKey, rNeg, toleranceMicros, inner)
      .drop(lNeg, rNeg)
  }
}
