package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token statistics in one pass: total tokens, distinct
  * tokens, summed character length, stopword hits — the inputs of the
  * quality-score and language-ID operators, previously an explode +
  * groupBy (a token-level shuffle) each. Struct-returning codegen
  * expression; the distinct count uses a per-row hash set (documents are
  * bounded — ≤ a few thousand tokens — so the set is small and
  * short-lived). Length is numChars (SQL length() semantics). */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TokenStats.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires array<string>, got ${other.sql}")
  }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenStatsKernel.stats(input.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStatsKernel.stats($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  def stats(spark: SparkSession, tokens: Column, stopwords: Seq[String]): Column = {
    // name keyed by the stopword set: each distinct set is its own
    // function, registered once per session (Registry.ensure is a no-op
    // on re-use, so no replaced-function warnings)
    val name = "token_stats_" + stopwords.hashCode.toHexString
    Registry.ensure(spark, name)(exprs => TokenStats(exprs(0), stopwords))
    org.apache.spark.sql.functions.call_function(name, tokens)
  }
}

object TokenStatsKernel {
  def stats(tokens: ArrayData, stopSet: java.util.HashSet[UTF8String]): InternalRow = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    var lenSum = 0L
    var nStop = 0L
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      lenSum += tok.numChars()
      if (stopSet.contains(tok)) nStop += 1
      // clone before inserting: ArrayData getters may reuse backing memory
      seen.add(tok.clone())
      t += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, seen.size.toLong, lenSum, nStop))
  }
}
