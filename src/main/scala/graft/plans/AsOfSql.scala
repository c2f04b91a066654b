package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{
  Cast, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, UnaryMinus,
  Unevaluable}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructType}

/** SQL surface for the native as-of join (SURVEY §2E): makes
  * `FROM l ASOF [LEFT] JOIN r ON l.k = r.k AND l.t >= r.t` valid `spark.sql`
  * text, lowered onto the [[AsOfJoin]] logical node (and from there the
  * sort-merge [[AsOfJoinExec]]).
  *
  * Spark's ANTLR grammar has no ASOF join type, so the extension works in
  * two public-API stages, both registered by [[GraftExtensions]]:
  *
  *  1. '''Parse''' ([[GraftSqlParser]], via `injectParser`): a token-level
  *     pre-pass (string/comment/paren-aware — never a blind regex) removes
  *     the `ASOF` keyword and wraps that join's ON condition in the marker
  *     function `graft_asof(...)`, then delegates to Spark's own parser.
  *     SQL without the ASOF token takes a zero-cost fast path.
  *  2. '''Resolve''' ([[ResolveAsOfJoin]], via `injectResolutionRule`): once
  *     analysis has resolved the marked condition, the rule splits it into
  *     equi-key conjuncts plus exactly one time inequality and replaces the
  *     standard `Join` with [[AsOfJoin]]. `>=` lowers to the backward merge,
  *     `<=` to forward (negated-time reuse of the same exec, as in
  *     [[AsOf.forward]]); `JOIN` → inner mode, `LEFT JOIN` → null-padding.
  *
  * Semantics match DuckDB's ASOF JOIN (the oracle for q_asof_sql): each left
  * row pairs with the single nearest right row per key on the inequality
  * side. Reference behavior: cdc-lite delegates all SQL to DuckDB
  * (pkg/duckdb/duckdb_cdc.go:175-183); this keeps that one-dialect UX — a
  * user's ASOF text runs unchanged — while executing on Spark.
  */
object AsOfSql {

  /** Boolean marker wrapping the original ON condition between parse and
    * resolution. Unevaluable: if it survives analysis (e.g. used outside a
    * join's ON clause), planning fails with its name pointing here. */
  case class AsOfMarker(child: Expression) extends Unevaluable {
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): AsOfMarker = copy(child = c.head)
  }

  /** Marker function name; registered as a session function so the analyzer
    * resolves the rewritten text without any catalog mutation. */
  val MarkerFn = "graft_asof"

  // ---------------------------------------------------------------------
  // Token-level ASOF rewrite
  // ---------------------------------------------------------------------

  private case class Tok(up: String, start: Int, end: Int, depth: Int)

  /** Keywords that terminate a join's ON condition at the same paren depth
    * (the next join, the next clause, or a set operator). */
  private val CondEnd: Set[String] = Set(
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "SEMI", "ANTI",
    "NATURAL", "LATERAL", "ASOF", "ON", "USING", "WHERE", "GROUP", "ORDER",
    "HAVING", "WINDOW", "LIMIT", "OFFSET", "UNION", "EXCEPT", "INTERSECT",
    "MINUS", "QUALIFY", "DISTRIBUTE", "SORT", "CLUSTER")

  /** Lex word tokens with their paren depth, skipping string literals
    * (`'…'` and `"…"`, with backslash and doubled-quote escapes), backtick
    * identifiers, `--` line comments and bracketed comments. Emits a
    * sentinel `)` token whenever depth drops, so the condition scan can see
    * a subquery boundary close. */
  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0; var depth = 0
    val n = sql.length
    def quoted(q: Char): Unit = {             // i at opening quote
      i += 1
      var done = false
      while (i < n && !done) {
        val c = sql.charAt(i)
        if (c == '\\') i += 2
        else if (c == q && i + 1 < n && sql.charAt(i + 1) == q) i += 2
        else if (c == q) { i += 1; done = true }
        else i += 1
      }
    }
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') quoted(c)
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; out += Tok(")", i, i + 1, depth); i += 1 }
      else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        out += Tok(sql.substring(s, i).toUpperCase, s, i, depth)
      } else i += 1
    }
    out.result()
  }

  /** Rewrite every `ASOF [LEFT] JOIN … ON cond` into
    * `[LEFT] JOIN … ON graft_asof(cond)`. Returns the input unchanged when
    * it contains no ASOF join. One ASOF is consumed per pass; the tail is
    * handled by recursion on the rewritten text (each pass re-lexes, so
    * spliced positions stay consistent). */
  def rewrite(sql: String): String = {
    // Fast path: the lexer only needs to run when the keyword can occur.
    if (!sql.toUpperCase.contains("ASOF")) return sql
    val toks = lex(sql)
    // Only rewrite ASOF actually followed by [LEFT] JOIN — `asof` used as
    // an identifier elsewhere parses as plain Spark SQL.
    def isAsOfJoin(ix: Int): Boolean = toks(ix).up == "ASOF" &&
      (toks.lift(ix + 1).exists(_.up == "JOIN") ||
        (toks.lift(ix + 1).exists(_.up == "LEFT") &&
          toks.lift(ix + 2).exists(_.up == "JOIN")))
    val i = toks.indices.find(isAsOfJoin).getOrElse(-1)
    if (i < 0) return sql
    val asof = toks(i)
    val d = asof.depth
    var j = i + 1
    if (toks(j).up == "LEFT") j += 1
    require(toks(j).up == "JOIN", s"ASOF must be followed by [LEFT] JOIN")
    // Find this join's ON at the same depth; another join keyword or a
    // USING first means the ASOF join has no usable ON condition.
    var k = j + 1
    var on = -1
    while (on < 0 && k < toks.length) {
      val t = toks(k)
      if (t.depth < d) k = toks.length // left the join's scope: no ON
      else if (t.depth == d && t.up == "ON") on = k
      else if (t.depth == d && t.up == "USING")
        throw new IllegalArgumentException(
          "ASOF JOIN requires an ON condition (USING is not supported: the " +
            "time column is an inequality, not an equi-key)")
      else if (t.depth == d && CondEnd.contains(t.up))
        throw new IllegalArgumentException(
          s"ASOF JOIN requires an ON condition before '${t.up}'")
      else k += 1
    }
    require(on > 0, "ASOF JOIN requires an ON condition")
    // Condition extent: from after ON to the first same-or-shallower-depth
    // terminator (next join/clause keyword, or the close of the enclosing
    // subquery), else end of text.
    var e = on + 1
    var end = sql.length
    var found = false
    while (!found && e < toks.length) {
      val t = toks(e)
      if (t.depth < d || (t.depth == d && CondEnd.contains(t.up))) {
        end = t.start; found = true
      } else e += 1
    }
    val onEnd = toks(on).end
    val next = sql.substring(0, asof.start) + sql.substring(asof.end, onEnd) +
      s" $MarkerFn(" + sql.substring(onEnd, end) + ") " + sql.substring(end)
    rewrite(next)
  }
}

/** Delegating parser injected via `SparkSessionExtensions.injectParser`:
  * applies [[AsOfSql.rewrite]] to statement text, then hands everything to
  * Spark's own parser. All identifier/type entry points delegate untouched. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(AsOfSql.rewrite(sqlText))
  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(AsOfSql.rewrite(sqlText), ctx)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(AsOfSql.rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Resolution rule lowering a marker-conditioned Join onto [[AsOfJoin]].
  * Fires inside the analyzer's resolution fixed point, after the condition's
  * attributes have resolved; attribute ids pass through unchanged, so
  * projections above the join are unaffected. */
object ResolveAsOfJoin extends Rule[LogicalPlan] {
  import AsOfSql.AsOfMarker

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ASOF JOIN: $msg")

  /** Conjunction split without pulling in PredicateHelper (whose aliasing
    * helpers we don't want): flatten nested ANDs left-to-right. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case j @ Join(l, r, joinType, Some(AsOfMarker(cond)), _)
        if l.resolved && r.resolved && cond.resolved =>
      val inner = joinType match {
        case Inner => true
        case LeftOuter => false
        case other => fail(s"only JOIN and LEFT JOIN are supported, got $other")
      }
      val lset = l.outputSet
      val rset = r.outputSet
      // 0 = references only the left side, 1 = only the right, -1 = neither
      // (mixed or constant — constants can't be keys or the time axis).
      def side(e: Expression): Int =
        if (e.references.isEmpty) -1
        else if (e.references.subsetOf(lset)) 0
        else if (e.references.subsetOf(rset)) 1
        else -1
      var keys = Vector.empty[(Expression, Expression)]
      var time: Option[(Expression, Expression, Boolean)] = None
      def setTime(lt: Expression, rt: Expression, forward: Boolean): Unit = {
        if (time.isDefined) fail("exactly one time inequality is allowed")
        time = Some((lt, rt, forward))
      }
      conjuncts(cond).foreach {
        case EqualTo(a, b) if side(a) == 0 && side(b) == 1 => keys :+= ((a, b))
        case EqualTo(a, b) if side(a) == 1 && side(b) == 0 => keys :+= ((b, a))
        case GreaterThanOrEqual(a, b) if side(a) == 0 && side(b) == 1 =>
          setTime(a, b, forward = false)       // l.t >= r.t : backward
        case GreaterThanOrEqual(a, b) if side(a) == 1 && side(b) == 0 =>
          setTime(b, a, forward = true)        // r.t >= l.t : forward
        case LessThanOrEqual(a, b) if side(a) == 0 && side(b) == 1 =>
          setTime(a, b, forward = true)        // l.t <= r.t : forward
        case LessThanOrEqual(a, b) if side(a) == 1 && side(b) == 0 =>
          setTime(b, a, forward = false)       // r.t <= l.t : backward
        case other => fail(
          s"unsupported ON conjunct '${other.sql}': expected side-to-side " +
            "equi-keys plus exactly one >= / <= time inequality")
      }
      if (keys.isEmpty) fail("at least one equi-key conjunct is required " +
        "(the merge partitions both sides by key)")
      val (lt, rt, forward) = time.getOrElse(
        fail("an ON time inequality (>= or <=) is required"))
      if (lt.dataType != rt.dataType) fail(
        s"time sides must agree in type after implicit casts, " +
          s"got ${lt.dataType} vs ${rt.dataType}")
      if (!forward) AsOfJoin(l, r, keys.map(_._1), keys.map(_._2), lt, rt,
        None, inner)
      else {
        // Forward reuses the backward merge over negated times (the same
        // trick as AsOf.forward) — needs a numeric axis; timestamps can be
        // compared via epoch micros in the query text.
        val negL = neg(lt); val negR = neg(rt)
        AsOfJoin(l, r, keys.map(_._1), keys.map(_._2), negL, negR, None, inner)
      }
  }

  private def neg(e: Expression): Expression = e.dataType match {
    case t if t == LongType => UnaryMinus(e, failOnError = false)
    case org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType =>
      UnaryMinus(Cast(e, LongType), failOnError = false)
    case org.apache.spark.sql.types.DoubleType |
         org.apache.spark.sql.types.FloatType =>
      UnaryMinus(e, failOnError = false)
    case org.apache.spark.sql.types.TimestampType =>
      // negate the epoch-micros view of the timestamp (lossless: the merge
      // only ever orders/compares the axis, never returns it)
      UnaryMinus(Cast(e, LongType), failOnError = false)
    case other => fail(s"forward as-of needs a numeric or timestamp time " +
      s"axis, got $other")
  }
}
