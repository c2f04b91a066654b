package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent session-registry helper for the kernel functions. Sessions
  * built through graft.core.Session already carry every kernel via
  * GraftExtensions.injectFunction; this only registers on foreign
  * sessions — and never RE-registers, which would log a "function
  * replaced a previously registered function" warning per call. */
private[functions] object Registry {
  def ensure(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(new FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
