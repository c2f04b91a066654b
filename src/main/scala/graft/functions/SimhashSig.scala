package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash kernel: per-bit majority vote over the token multiset's
  * 32-bit hashes (h = first 32 bits of md5, i.e. conv(substr(md5,1,8),16,10)),
  * folded in ONE pass per document. Value-identical to the exploded
  * 32-column CASE-sum aggregation in graft.ops.Dedup (bit j set iff
  * sum over tokens of ±1 on bit j is > 0) — parity asserted in
  * SimhashSigSpec. Eliminates the token explode + 32-way partial
  * aggregate: the simhash is born map-side. */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashKernel.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashKernel.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashKernel {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def sig(tokens: ArrayData): Long = {
    val votes = new Array[Int](32)
    val digest = md5.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      digest.reset()
      val d = digest.digest(tokens.getUTF8String(t).getBytes)
      // first 4 bytes big-endian = conv(substr(md5_hex, 1, 8), 16, 10)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

object SimhashSig {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "simhash_sig")(exprs => SimhashSig(exprs(0)))

  def sig(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("simhash_sig", tokens)
  }
}
