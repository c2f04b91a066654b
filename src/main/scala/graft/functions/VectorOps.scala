package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-embedding hot path.
  *
  * The composable formulation — aggregate(zip_with(a, b, _*_), 0d, _+_) —
  * is correct but runs as interpreted higher-order functions: per-pair
  * lambda dispatch plus an intermediate products array. At millions of
  * candidate pairs (any ANN/near-dup workload) that dominates the query.
  * FloatVecDot is the same left-to-right double fold as a tight codegen'd
  * loop over the two ArrayData — no allocation, stays inside whole-stage
  * codegen — and therefore bit-identical results (each float is widened
  * to double before multiply, accumulation order unchanged).
  *
  * Degenerate inputs follow the HOF fold exactly (KernelPropertiesSpec):
  * zip_with pads a length mismatch with NULLs and a NULL element NULLs
  * its product, which NULLs the whole running sum — so both kernels
  * return NULL when the arrays differ in length or either contains a
  * NULL element. (DuckDB's list_inner_product ERRORS on a length
  * mismatch; the oracle-compared paths never feed one.) */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // NULL is produced for degenerate arrays even when the inputs are
  // non-nullable columns, so the result slot must stay nullable.
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"FloatVecDot requires two array<float> inputs, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Double-array sibling of [[FloatVecDot]] for the integer-code k-means
  * path (codes are exact-integer-valued doubles): the same left-to-right
  * fold as aggregate(zip_with(a, b, _*_), 0d, _+_) and as DuckDB's
  * list_inner_product, codegen'd. Bit-identical to the HOF formulation
  * (DoubleVecDotSpec), ~interpreted-lambda-free at N·K dots per Lloyd
  * round. Same degenerate-input contract as FloatVecDot: NULL on length
  * mismatch or a NULL element — the kernel is SQL-registered (vec_dot_d)
  * and user-reachable, so it must not read garbage from null slots. */
case class DoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"DoubleVecDot requires two array<double> inputs, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}

/** Column-level API + SQL registration for the vector expressions. */
object VectorOps {
  /** Register `vec_dot` in the session's function registry (idempotent)
    * so it is reachable from both the Column API and SQL text. */
  def register(spark: SparkSession): Unit = {
    Registry.ensure(spark, "vec_dot")(exprs => FloatVecDot(exprs(0), exprs(1)))
    Registry.ensure(spark, "vec_dot_d")(exprs => DoubleVecDot(exprs(0), exprs(1)))
  }

  /** dot(a, b) over two array<double> columns. */
  def vecDotD(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot_d", a, b)
  }

  /** dot(a, b) over two array<float> columns, in double precision. */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)
  }
}
