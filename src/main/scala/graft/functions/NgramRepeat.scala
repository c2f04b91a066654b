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

/** Per-document word-n-gram repetition statistics in one pass: total
  * n-grams, distinct n-grams, and the count of the most frequent n-gram —
  * the inputs of the Gopher-style repetition filters (fraction of
  * duplicate n-grams, fraction of n-grams taken by the top one). The
  * composable formulation would be an explode + two groupBys — a
  * token-level shuffle for a strictly per-row signal. This kernel keeps
  * it map-side: one sliding-window pass with a per-row hash map (documents
  * are bounded — ≤ a few thousand tokens — so the map is small and
  * short-lived), grams joined with a single space exactly like the
  * oracle's array_to_string(slice, ' '). */
case class NgramRepeat(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram length must be >= 1")

  override def dataType: DataType = NgramRepeat.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_repeat requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramRepeatKernel.stats(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramRepeatKernel.stats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramRepeat =
    copy(child = newChild)
}

object NgramRepeat {
  val Schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))

  def stats(spark: SparkSession, tokens: Column, n: Int): Column = {
    val name = s"ngram_repeat_$n"
    Registry.ensure(spark, name)(exprs => NgramRepeat(exprs(0), n))
    org.apache.spark.sql.functions.call_function(name, tokens)
  }
}

object NgramRepeatKernel {
  private val Space = UTF8String.fromString(" ")

  def stats(tokens: ArrayData, n: Int): InternalRow = {
    val len = tokens.numElements()
    val total = len - n + 1
    if (total <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](
      Math.max(16, total * 2))
    val win = new Array[UTF8String](n)
    var top = 0L
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        win(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      // concatWs copies into a fresh buffer, so the gram key is safe even
      // though ArrayData getters may reuse backing memory
      val gram = UTF8String.concatWs(Space, win: _*)
      val c = counts.get(gram)
      val next = if (c == null) 1L else c.longValue() + 1L
      counts.put(gram, next)
      if (next > top) top = next
      i += 1
    }
    new GenericInternalRow(Array[Any](total.toLong, counts.size.toLong, top))
  }
}
