package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Position-weighted rolling document fingerprint:
  * sum over tokens of ((pos+1) · h40(token)) mod 1000000007, where h40 is
  * the first 40 bits of md5 (conv(substr(md5,1,10),16,10)) — one pass per
  * document. Value-identical to the posexplode + groupBy-sum formulation
  * (FingerprintSigSpec asserts parity); order-sensitive by construction.
  * Each term is < 2^30 and the Long sum holds ~2^33 tokens per document —
  * the same bound as the aggregate form (Canonical.DigestMod). */
case class FingerprintSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint_sig requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    FingerprintKernel.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintKernel.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintSig =
    copy(child = newChild)
}

object FingerprintKernel {
  private val Mod = 1000000007L
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def sig(tokens: ArrayData): Long = {
    val digest = md5.get()
    val n = tokens.numElements()
    var acc = 0L
    var t = 0
    while (t < n) {
      digest.reset()
      val d = digest.digest(tokens.getUTF8String(t).getBytes)
      // first 10 hex chars = first 40 bits, big-endian
      val h40 = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
                ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      acc += ((t + 1) * h40) % Mod
      t += 1
    }
    acc
  }
}

object FingerprintSig {
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "fingerprint_sig")(exprs => FingerprintSig(exprs(0)))

  def sig(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("fingerprint_sig", tokens)
  }
}
