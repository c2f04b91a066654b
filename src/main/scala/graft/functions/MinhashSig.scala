package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature kernel: the K Kirsch-Mitzenmacher hashes
  * (h_i = a + i·b from the two 48-bit halves of one md5 per token),
  * min-folded over the token array in ONE map-side pass per document.
  *
  * Value-identical to the composable formulations used elsewhere:
  *   a = conv(substr(md5(tok), 1, 12), 16, 10)   (md5 bytes 0-5, BE)
  *   b = conv(substr(md5(tok), 13, 12), 16, 10)  (md5 bytes 6-11, BE)
  * (parity asserted in MinhashSigSpec against both the exploded batch
  * aggregation and the HOF form).
  *
  * Why a kernel: the batch operator explodes tokens and partial-aggregates
  * K mins (codegen'd but pays the explode+aggregate machinery), and the
  * streaming path can't aggregate at all, so it ran K interpreted
  * transform/array_min lambdas — K full array walks per document. This is
  * one walk, one md5 per token, no shuffle, codegen-compatible. */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashKernel.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashKernel {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Big-endian unsigned 48-bit value from 6 bytes starting at `off`. */
  private def long48(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  def sig(tokens: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val digest = md5.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      digest.reset()
      val d = digest.digest(tok.getBytes)
      val a = long48(d, 0)
      val b = long48(d, 6)
      var i = 0
      while (i < k) {
        val h = a + i * b
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      t += 1
    }
    // A zero-length token array cannot occur from split() (it yields [""]
    // on empty text), so the Long.MaxValue sentinels never escape.
    new GenericArrayData(mins)
  }
}

object MinhashSig {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "minhash_sig")(exprs => MinhashSig(exprs(0),
      exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_sig k must be an integer literal, got $other")
      }))

  def sig(spark: SparkSession, tokens: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "minhash_sig", tokens, org.apache.spark.sql.functions.lit(k))
  }
}
