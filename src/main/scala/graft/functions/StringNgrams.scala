package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram kernel (the language-ID / fingerprinting hot path).
  *
  * The composable formulation —
  * `transform(sequence(1, char_length(s) - n + 1), i -> substr(s, i, n))` —
  * is correct but a higher-order function: the lambda is interpreted per
  * gram, outside whole-stage codegen (measured 4.3 s vs 0.9 s at sf0.1 on
  * q_char_ngrams). This expression emits all n-length character substrings
  * in one tight loop per row, stays codegen-compatible, and produces the
  * identical grams (1-based, character-indexed — DuckDB substr semantics).
  */
case class StringNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram length must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramKernel.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): StringNgrams =
    copy(child = newChild)
}

/** Static kernel the generated code calls (kept outside the case class so
  * the generated Java needs no Scala companion-forwarder subtleties). */
object NgramKernel {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = s.substringSQL(i + 1, n)   // 1-based, char-indexed (SQL substr)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object StringNgrams {
  /** Register `char_ngrams(s, n)` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "char_ngrams")(exprs => StringNgrams(exprs(0),
      exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"char_ngrams n must be an integer literal, got $other")
      }))

  def ngrams(spark: SparkSession, s: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "char_ngrams", s, org.apache.spark.sql.functions.lit(n))
  }
}
